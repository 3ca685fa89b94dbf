"""Minimal body-body contact resolution (dynamic vs anything analytic).

In the reference, dynamic rigid bodies rest on floors and hit each other
through rapier's CPU contact solver, stepped once per frame
(/root/reference/src_testbed/step.rs:201-217).  This module is the TPU-native
stand-in: velocity-level sequential impulses with Coulomb friction and a
Baumgarte positional bias, iterated Gauss-Seidel style over every
dynamic-vs-collider pair — including DYNAMIC-DYNAMIC pairs (sand2's eight
falling plates pile on each other, step.rs:201-217), with symmetric impulse
application and combined effective mass.  It is not a general rigid-body
engine (no joints, no manifolds beyond point samples) — matching the scope
the reference outsources to rapier.

Contact generation is shape-aware but deliberately simple:
  * dynamic cuboid: its 2^d corners (plus, in 3D, the midpoint and
    quarter points of each of the 12 edges — edge-edge box crossings
    have no penetrating corner, only interior edge points) tested
    against the other collider;
  * dynamic ball: deepest point toward the other collider's boundary;
  * dynamic capsule: its two cap centers treated as balls.
Ordered pairs run both ways (b's corners vs c AND c's corners vs b), so
box-box stacking catches both bodies' features.  All static control flow
(which slots are dynamic, shape types) is unrolled in Python so XLA sees
straight-line code; the per-sample Gauss-Seidel impulses run under
`lax.scan` (sequential like the Python loop they replace, but O(1)
trace size in the sample count).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.collision import shapes as shp
from wgsparkl_tpu.math import pose as pose_math

CONTACT_BETA = 0.2      # Baumgarte positional-correction factor
CONTACT_FRICTION = 0.4
CONTACT_ITERATIONS = 4  # Gauss-Seidel sweeps over all pairs


def _corner_offsets(dim: int) -> np.ndarray:
    """[2^d, d] unit corner signs of a cuboid."""
    corners = np.stack(
        np.meshgrid(*([np.array([-1.0, 1.0])] * dim), indexing="ij"), -1
    ).reshape(-1, dim)
    return corners.astype(np.float32)


def _cuboid_sample_offsets(dim: int) -> np.ndarray:
    """Unit-cube contact-sample offsets: corners, plus (3D) three interior
    points per edge so edge-edge box crossings — whose penetration region
    contains no corner — still produce contact candidates."""
    pts = [_corner_offsets(dim)]
    if dim == 3:
        edge = []
        for axis in range(3):
            others = [a for a in range(3) if a != axis]
            for s0 in (-1.0, 1.0):
                for s1 in (-1.0, 1.0):
                    for t in (-0.5, 0.0, 0.5):
                        p = np.zeros(3)
                        p[axis] = t
                        p[others[0]] = s0
                        p[others[1]] = s1
                        edge.append(p)
        pts.append(np.asarray(edge))
    return np.concatenate(pts, 0).astype(np.float32)


def _ball_contacts(centers, radius, project):
    """Sphere-sample contacts: centers [K, d] of radius `radius` vs collider."""
    dpt, inside = project(centers)
    dist = jnp.linalg.norm(dpt, axis=-1)
    safe = jnp.maximum(dist, 1e-12)
    dirn = dpt / safe[..., None]
    # Outside: push-out normal points from the boundary back to the center;
    # inside: keep pushing through the boundary along dpt.
    normal = jnp.where(inside[..., None], dirn, -dirn)
    depth = jnp.where(inside, radius + dist, radius - dist)
    point = centers + dpt  # closest boundary point of c
    return point, normal, depth


def _point_contacts(points, project):
    """Point-sample contacts (cuboid corners): contact only when inside."""
    dpt, inside = project(points)
    dist = jnp.linalg.norm(dpt, axis=-1)
    safe = jnp.maximum(dist, 1e-12)
    normal = dpt / safe[..., None]
    depth = jnp.where(inside, dist, -1.0)
    return points, normal, depth


def _cross(dim, a, b):
    if dim == 3:
        return jnp.cross(a, b)
    # 2D: scalar cross returned as [..., 1]
    return (a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0])[..., None]


def _ang_vel_at(dim, angvel, rel):
    if dim == 3:
        return jnp.cross(angvel, rel)
    omega = angvel[..., 0]
    return jnp.stack([-omega * rel[..., 1], omega * rel[..., 0]], axis=-1)


def _candidates(bodies, b, bt, c, ct, dim):
    """Contact candidates of dynamic body b against collider c, or None."""
    proj = lambda p: shp.project_on_boundary(
        ct, bodies.shape_params[c], bodies.rot[c], bodies.pos[c], p
    )
    if bt == shp.SHAPE_CUBOID:
        he = bodies.shape_params[b, :dim]
        local = jnp.asarray(_cuboid_sample_offsets(dim)) * he[None, :]
        pts = pose_math.transform_point(
            bodies.rot[b][None], bodies.pos[b][None], local
        )
        return _point_contacts(pts, proj)
    if bt in (shp.SHAPE_BALL, shp.SHAPE_CAPSULE):
        if bt == shp.SHAPE_BALL:
            radius = bodies.shape_params[b, 0]
            centers = bodies.world_com[b][None, :]
        else:
            hh, radius = (
                bodies.shape_params[b, 0],
                bodies.shape_params[b, 1],
            )
            axis_local = jnp.zeros((2, dim), jnp.float32)
            axis_local = axis_local.at[0, 1].set(hh).at[1, 1].set(-hh)
            centers = pose_math.transform_point(
                bodies.rot[b][None], bodies.pos[b][None], axis_local
            )
        return _ball_contacts(centers, radius, proj)
    return None  # mesh-shaped dynamic bodies: not supported


def resolve_contacts(
    bodies,
    collider_types: Tuple[int, ...],
    dynamic_slots: Tuple[int, ...],
    linvel,
    angvel,
    dt,
    slop: float,
    friction: float = CONTACT_FRICTION,
    iterations: int = CONTACT_ITERATIONS,
    skip_pairs=frozenset(),
):
    """Sequential-impulse contact pass.  Returns updated (linvel, angvel).

    bodies: RigidWorld with fresh world_com / inv_inertia_world;
    linvel/angvel: the post-MPM-impulse, post-gravity velocities to correct;
    slop: penetration tolerance (in world units) before the positional bias
    engages — pass a fraction of the grid cell width;
    skip_pairs: unordered (i, j) body-slot pairs to exclude from contact
    generation — the usual engine default for jointed pairs (a pendulum's
    rod may legitimately overlap its pivot).
    """
    dim = bodies.dim
    analytic = set(shp._ANALYTIC)
    dyn = set(dynamic_slots)

    # Ordered dynamic-vs-collider pairs (both directions for dyn-dyn).
    pairs = []
    for b in dynamic_slots:
        bt = collider_types[b]
        if bt not in (shp.SHAPE_CUBOID, shp.SHAPE_BALL, shp.SHAPE_CAPSULE):
            continue
        for c, ct in enumerate(collider_types):
            if c == b or ct not in analytic:
                continue
            if (b, c) in skip_pairs or (c, b) in skip_pairs:
                continue
            pairs.append((b, bt, c, ct))
    if not pairs:
        return linvel, angvel

    for _ in range(iterations):
        for b, bt, c, ct in pairs:
            cand = _candidates(bodies, b, bt, c, ct, dim)
            if cand is None:
                continue
            points, normals, depths = cand
            two_way = c in dyn
            inv_i_b = bodies.inv_inertia_world[b]
            inv_i_c = bodies.inv_inertia_world[c]

            def _impulse_step(carry, x, b=b, c=c, two_way=two_way,
                              inv_i_b=inv_i_b, inv_i_c=inv_i_c):
                linvel, angvel = carry
                p, n, depth = x
                active = depth > 0.0

                r_b = p - bodies.world_com[b]
                r_c = p - bodies.world_com[c]
                v_b = linvel[b] + _ang_vel_at(dim, angvel[b], r_b)
                if two_way:
                    v_c = linvel[c] + _ang_vel_at(dim, angvel[c], r_c)
                else:
                    # c static/kinematic: its velocity field is prescribed.
                    v_c = bodies.linvel[c] + _ang_vel_at(
                        dim, bodies.angvel[c], r_c
                    )
                v_rel = v_b - v_c
                vn = jnp.dot(v_rel, n)

                rxn_b = _cross(dim, r_b, n)
                k_n = jnp.sum(n * n * bodies.inv_mass[b]) + jnp.dot(
                    rxn_b, inv_i_b @ rxn_b
                )
                rxn_c = _cross(dim, r_c, n)
                if two_way:
                    k_n = k_n + jnp.sum(
                        n * n * bodies.inv_mass[c]
                    ) + jnp.dot(rxn_c, inv_i_c @ rxn_c)
                bias = CONTACT_BETA * jnp.maximum(depth - slop, 0.0) / dt
                jn = jnp.maximum((-vn + bias) / jnp.maximum(k_n, 1e-12), 0.0)
                jn = jnp.where(active, jn, 0.0)

                linvel = linvel.at[b].add(jn * n * bodies.inv_mass[b])
                angvel = angvel.at[b].add(inv_i_b @ (rxn_b * jn))
                if two_way:
                    linvel = linvel.at[c].add(-jn * n * bodies.inv_mass[c])
                    angvel = angvel.at[c].add(inv_i_c @ (rxn_c * -jn))

                # Coulomb friction against the updated normal state.
                v_b = linvel[b] + _ang_vel_at(dim, angvel[b], r_b)
                if two_way:
                    v_c = linvel[c] + _ang_vel_at(dim, angvel[c], r_c)
                v_rel = v_b - v_c
                vt = v_rel - jnp.dot(v_rel, n) * n
                vt_len = jnp.linalg.norm(vt)
                t_hat = vt / jnp.maximum(vt_len, 1e-12)
                rxt_b = _cross(dim, r_b, t_hat)
                k_t = jnp.sum(t_hat * t_hat * bodies.inv_mass[b]) + jnp.dot(
                    rxt_b, inv_i_b @ rxt_b
                )
                rxt_c = _cross(dim, r_c, t_hat)
                if two_way:
                    k_t = k_t + jnp.sum(
                        t_hat * t_hat * bodies.inv_mass[c]
                    ) + jnp.dot(rxt_c, inv_i_c @ rxt_c)
                jt = jnp.clip(
                    vt_len / jnp.maximum(k_t, 1e-12), 0.0, friction * jn
                )
                jt = jnp.where(active & (vt_len > 1e-9), jt, 0.0)
                linvel = linvel.at[b].add(-jt * t_hat * bodies.inv_mass[b])
                angvel = angvel.at[b].add(inv_i_b @ (rxt_b * -jt))
                if two_way:
                    linvel = linvel.at[c].add(jt * t_hat * bodies.inv_mass[c])
                    angvel = angvel.at[c].add(inv_i_c @ (rxt_c * jt))
                return (linvel, angvel), None

            (linvel, angvel), _ = jax.lax.scan(
                _impulse_step, (linvel, angvel), (points, normals, depths)
            )

    return linvel, angvel
