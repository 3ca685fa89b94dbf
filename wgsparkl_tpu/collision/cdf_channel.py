"""Channel-major analytic node CDF (lane-efficient variant of cdf.node_cdf).

Computes the same result as collision/cdf.py:node_cdf (grid_update_cdf /
collide.wgsl parity) but operates on per-axis channel arrays [M] instead of
[M, d] vectors, so every elementwise op uses all 128 VPU lanes.  Body poses
enter as traced scalars broadcast over the node axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from wgsparkl_tpu.collision import shapes as shp

BIG = 1.0e10


def _quat_rotate_ch(q, v):
    """Rotate channel vectors v (list of 3 [M]) by a single quaternion [4]."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    # t = 2 * cross(q_vec, v)
    t0 = 2.0 * (y * v[2] - z * v[1])
    t1 = 2.0 * (z * v[0] - x * v[2])
    t2 = 2.0 * (x * v[1] - y * v[0])
    return [
        v[0] + w * t0 + (y * t2 - z * t1),
        v[1] + w * t1 + (z * t0 - x * t2),
        v[2] + w * t2 + (x * t1 - y * t0),
    ]


def _quat_inv_rotate_ch(q, v):
    return _quat_rotate_ch([q[0], -q[1], -q[2], -q[3]], v)


def _rot2_ch(r, v, inv=False):
    c, s = r[0], (-r[1] if inv else r[1])
    return [c * v[0] - s * v[1], s * v[0] + c * v[1]]


def _to_local(rot, trans, p):
    d = len(p)
    rel = [p[a] - trans[a] for a in range(d)]
    if d == 3:
        return _quat_inv_rotate_ch(rot, rel)
    return _rot2_ch(rot, rel, inv=True)


def _to_world_vec(rot, v):
    if len(v) == 3:
        return _quat_rotate_ch(rot, v)
    return _rot2_ch(rot, v)


def _proj_cuboid(he, q):
    d = len(q)
    clamped = [jnp.clip(q[a], -he[a], he[a]) for a in range(d)]
    inside = (jnp.abs(q[0]) < he[0])
    for a in range(1, d):
        inside = inside & (jnp.abs(q[a]) < he[a])
    gaps = [he[a] - jnp.abs(q[a]) for a in range(d)]
    # Snap the axis with the smallest gap to its face (branch-free argmin).
    min_gap = gaps[0]
    for a in range(1, d):
        min_gap = jnp.minimum(min_gap, gaps[a])
    proj = []
    snapped = jnp.zeros_like(q[0], dtype=bool)
    for a in range(d):
        sgn = jnp.where(q[a] >= 0.0, 1.0, -1.0)
        is_min = (gaps[a] == min_gap) & ~snapped
        snapped = snapped | is_min
        proj.append(jnp.where(inside & is_min, sgn * he[a], clamped[a]))
    return proj, inside


def _proj_ball(radius, q):
    d = len(q)
    n2 = sum(x * x for x in q)
    n = jnp.sqrt(n2)
    inv = jnp.where(n > 1e-12, 1.0 / jnp.maximum(n, 1e-30), 0.0)
    proj = [jnp.where(n > 1e-12, q[a] * inv * radius, 0.0) for a in range(d)]
    if d >= 1:
        proj[0] = jnp.where(n > 1e-12, proj[0], radius)
    return proj, n < radius


def _proj_capsule(hh, radius, q):
    d = len(q)
    cy = jnp.clip(q[1], -hh, hh)
    rel = [q[a] - (cy if a == 1 else 0.0) for a in range(d)]
    n = jnp.sqrt(sum(x * x for x in rel))
    inv = jnp.where(n > 1e-12, 1.0 / jnp.maximum(n, 1e-30), 0.0)
    proj = []
    for a in range(d):
        base = cy if a == 1 else 0.0
        dirn = jnp.where(n > 1e-12, rel[a] * inv, 1.0 if a == 0 else 0.0)
        proj.append(base + dirn * radius)
    return proj, n < radius


def _proj_halfspace(q):
    proj = [q[a] if a != 1 else jnp.zeros_like(q[a]) for a in range(len(q))]
    return proj, q[1] < 0.0


def merge_node_cdf(a, b):
    """Merge two partial node-CDF triples (dist, aff, closest) computed over
    DISJOINT collider subsets into the triple the full index-ordered loop in
    node_cdf_channels would produce: lowest collider index wins exact
    distance ties (the loop only replaces on strictly-smaller distance), and
    affinity words OR together."""
    da, fa, ca = a
    db, fb, cb = b
    b_wins = (cb >= 0) & (
        (db < da) | ((db == da) & ((ca < 0) | (cb < ca)))
    )
    return (
        jnp.where(b_wins, db, da),
        fa | fb,
        jnp.where(b_wins, cb, ca),
    )


def node_cdf_channels(collider_types, shape_params, rot, trans, pos,
                      cell_width, only=None):
    """pos: list of d channel arrays [M].  Returns (dist, aff, closest).

    only: optional collider-index subset to evaluate (None = all).  Partial
    results over disjoint subsets recombine exactly with merge_node_cdf —
    pipeline.step_pallas uses this to compute never-moving colliders' CDF
    once per frame instead of once per substep."""
    d = len(pos)
    m = pos[0].shape[0]
    dist = jnp.full((m,), BIG, jnp.float32)
    aff = jnp.zeros((m,), jnp.uint32)
    closest = jnp.full((m,), -1, jnp.int32)
    cap = 1.5 * cell_width
    analytic = (
        shp.SHAPE_CUBOID, shp.SHAPE_BALL, shp.SHAPE_CAPSULE, shp.SHAPE_HALFSPACE
    )

    for i, st in enumerate(collider_types):
        if st not in analytic:
            continue
        if only is not None and i not in only:
            continue
        ri = [rot[i, k] for k in range(rot.shape[1])]
        ti = [trans[i, k] for k in range(d)]
        q = _to_local(ri, ti, pos)
        if st == shp.SHAPE_CUBOID:
            he = [shape_params[i, a] for a in range(d)]
            proj, inside = _proj_cuboid(he, q)
        elif st == shp.SHAPE_BALL:
            proj, inside = _proj_ball(shape_params[i, 0], q)
        elif st == shp.SHAPE_CAPSULE:
            proj, inside = _proj_capsule(
                shape_params[i, 0], shape_params[i, 1], q
            )
        else:
            proj, inside = _proj_halfspace(q)
        dl = [proj[a] - q[a] for a in range(d)]
        dw = _to_world_vec(ri, dl)
        within = inside
        box = jnp.abs(dw[0]) <= cap
        for a in range(1, d):
            box = box & (jnp.abs(dw[a]) <= cap)
        within = inside | box
        di = jnp.sqrt(sum(x * x for x in dw))
        closer = within & (di < dist)
        closest = jnp.where(closer, jnp.int32(i), closest)
        dist = jnp.where(closer, di, dist)
        bits = jnp.where(
            inside, jnp.uint32(0x00010001 << i), jnp.uint32(0x00000001 << i)
        )
        aff = aff | jnp.where(within, bits, jnp.uint32(0))
    return dist, aff, closest
