"""Analytic collider shapes: boundary projection queries, batched over points.

TPU-native replacement for the wgparry GPU shape library as used by the
reference's CDF pass (/root/reference/src/collision/collide.wgsl:23-56 calls
``Shape::projectPointOnBoundary`` and needs only: the vector from the query
point to its closest boundary point, and an is-inside flag).

Each shape kind is a static python type; scenes unroll a python loop over
their (<=16, CPIC bitmask-bound) colliders so XLA sees straight-line code.
Mesh-like shapes (polyline/trimesh/heightfield) are handled by the
rigid-particle CDF path (ops/rigid_cdf.py), mirroring the reference's split
(collide.wgsl:40 skips them).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.math import pose as pose_math

SHAPE_CUBOID = 0
SHAPE_BALL = 1
SHAPE_CAPSULE = 2
SHAPE_HALFSPACE = 3
SHAPE_POLYLINE = 4
SHAPE_TRIMESH = 5
SHAPE_HEIGHTFIELD = 6

_ANALYTIC = (SHAPE_CUBOID, SHAPE_BALL, SHAPE_CAPSULE, SHAPE_HALFSPACE)


@dataclasses.dataclass(frozen=True)
class Collider:
    """Host-side collider description.

    shape_type: one of the SHAPE_* constants (static).
    params: shape parameters, padded to length 8:
      cuboid:    half-extents[0:d]
      ball:      [radius]
      capsule:   [half_height, radius]  (axis = local +y)
      halfspace: [] (boundary = local y=0 plane, inside = y<0)
      trimesh/polyline/heightfield: use `vertices`/`indices` instead.
    """

    shape_type: int
    params: Tuple[float, ...] = ()
    vertices: Optional[np.ndarray] = None   # [V, d] local-space (mesh shapes)
    indices: Optional[np.ndarray] = None    # [T, d] vertex ids (tri/segment)

    def padded_params(self) -> np.ndarray:
        p = np.zeros(8, np.float32)
        p[: len(self.params)] = self.params
        return p

    @staticmethod
    def cuboid(*half_extents: float) -> "Collider":
        return Collider(SHAPE_CUBOID, tuple(float(h) for h in half_extents))

    @staticmethod
    def ball(radius: float) -> "Collider":
        return Collider(SHAPE_BALL, (float(radius),))

    @staticmethod
    def capsule(half_height: float, radius: float) -> "Collider":
        return Collider(SHAPE_CAPSULE, (float(half_height), float(radius)))

    @staticmethod
    def halfspace() -> "Collider":
        return Collider(SHAPE_HALFSPACE, ())

    @staticmethod
    def trimesh(vertices, indices) -> "Collider":
        return Collider(
            SHAPE_TRIMESH,
            (),
            vertices=np.asarray(vertices, np.float32),
            indices=np.asarray(indices, np.int32),
        )

    @staticmethod
    def heightfield(heights, scale) -> "Collider":
        """Regular-grid heightfield, converted to a trimesh at build time
        (the reference does the same via HeightField::to_trimesh,
        particle3d.rs:115-133)."""
        from wgsparkl_tpu.rigid.sampling import heightfield_to_trimesh

        v, t = heightfield_to_trimesh(heights, scale)
        return Collider(
            SHAPE_HEIGHTFIELD, (),
            vertices=np.asarray(v, np.float32),
            indices=np.asarray(t, np.int32),
        )

    @staticmethod
    def polyline(vertices, indices=None) -> "Collider":
        v = np.asarray(vertices, np.float32)
        if indices is None:
            n = len(v) - 1
            indices = np.stack([np.arange(n), np.arange(1, n + 1)], axis=-1)
        return Collider(SHAPE_POLYLINE, (), vertices=v, indices=np.asarray(indices, np.int32))

    @property
    def is_analytic(self) -> bool:
        return self.shape_type in _ANALYTIC


def _project_cuboid(he, q):
    """Local-space boundary projection for a box with half-extents he."""
    clamped = jnp.clip(q, -he, he)
    inside = jnp.all(jnp.abs(q) < he, axis=-1)
    # Inside: snap the axis closest to a face.
    gap = he - jnp.abs(q)                       # [M, d] >= 0 when inside
    ax = jnp.argmin(gap, axis=-1)               # [M]
    snap = jnp.sign(q) * he
    snap = jnp.where(snap == 0.0, he, snap)     # centered coordinate: pick +face
    onehot = jax_onehot(ax, q.shape[-1], q.dtype)
    proj_inside = q * (1.0 - onehot) + snap * onehot
    proj = jnp.where(inside[..., None], proj_inside, clamped)
    return proj, inside


def jax_onehot(idx, depth, dtype):
    return (idx[..., None] == jnp.arange(depth)).astype(dtype)


def _project_ball(radius, q):
    dist = jnp.linalg.norm(q, axis=-1, keepdims=True)
    safe = jnp.maximum(dist, 1e-12)
    dirn = jnp.where(dist > 1e-12, q / safe, jnp.zeros_like(q).at[..., 0].set(1.0))
    proj = dirn * radius
    inside = dist[..., 0] < radius
    return proj, inside


def _project_capsule(half_height, radius, q):
    # Closest point on the core segment (local y axis).
    c = jnp.zeros_like(q)
    c = c.at[..., 1].set(jnp.clip(q[..., 1], -half_height, half_height))
    rel = q - c
    dist = jnp.linalg.norm(rel, axis=-1, keepdims=True)
    safe = jnp.maximum(dist, 1e-12)
    dirn = jnp.where(dist > 1e-12, rel / safe, jnp.zeros_like(q).at[..., 0].set(1.0))
    proj = c + dirn * radius
    inside = dist[..., 0] < radius
    return proj, inside


def _project_halfspace(q):
    proj = q.at[..., 1].set(0.0)
    inside = q[..., 1] < 0.0
    return proj, inside


def project_on_boundary(shape_type: int, params, rot, trans, points):
    """Project world points [M, d] on the boundary of one posed collider.

    Returns (dpt, inside): dpt = closest boundary point - query point (world),
    inside = bool mask.  Matches the contract the reference's collide() needs
    (collide.wgsl:41-51).
    """
    q = pose_math.inv_transform_point(rot, trans, points)
    if shape_type == SHAPE_CUBOID:
        d = points.shape[-1]
        he = jnp.asarray(params[:d])
        proj, inside = _project_cuboid(he, q)
    elif shape_type == SHAPE_BALL:
        proj, inside = _project_ball(params[0], q)
    elif shape_type == SHAPE_CAPSULE:
        proj, inside = _project_capsule(params[0], params[1], q)
    elif shape_type == SHAPE_HALFSPACE:
        proj, inside = _project_halfspace(q)
    else:
        raise ValueError(f"shape_type {shape_type} has no analytic projection")
    world_proj = pose_math.transform_point(rot, trans, proj)
    return world_proj - points, inside


# ------------------------------------------------------------ mesh utilities
def closest_point_on_triangles(p, a, b, c):
    """Closest point on each triangle (a,b,c) to each point p.  All [..., 3]."""
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # Region tests (Ericson, Real-Time Collision Detection 5.1.5), branch-free.
    denom = jnp.where(jnp.abs(va + vb + vc) > 1e-30, va + vb + vc, 1e-30)
    v = vb / denom
    w = vc / denom
    pt_face = a + ab * v[..., None] + ac * w[..., None]

    t_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) > 1e-30, d1 - d3, 1e-30), 0, 1)
    pt_ab = a + ab * t_ab[..., None]
    t_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) > 1e-30, d2 - d6, 1e-30), 0, 1)
    pt_ac = a + ac * t_ac[..., None]
    t_bc = jnp.clip(
        (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) > 1e-30, (d4 - d3) + (d5 - d6), 1e-30),
        0,
        1,
    )
    pt_bc = b + (c - b) * t_bc[..., None]

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    pt = pt_face
    pt = jnp.where(in_edge_bc[..., None], pt_bc, pt)
    pt = jnp.where(in_edge_ac[..., None], pt_ac, pt)
    pt = jnp.where(in_edge_ab[..., None], pt_ab, pt)
    pt = jnp.where(in_vert_c[..., None], c, pt)
    pt = jnp.where(in_vert_b[..., None], b, pt)
    pt = jnp.where(in_vert_a[..., None], a, pt)
    return pt


def closest_point_on_segments(p, a, b):
    """Closest point on segments (a, b) to points p.  All [..., d]."""
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, -1), 1e-30)
    t = jnp.clip(jnp.sum((p - a) * ab, -1) / denom, 0.0, 1.0)
    return a + ab * t[..., None]
