"""CPIC color-distance-field (CDF): node CDF + particle CDF reconstruction.

TPU-native rebuild of the reference's three CDF passes:
  * grid_update_cdf — analytic shapes at grid nodes
    (/root/reference/src/solver/grid_update_cdf.wgsl + collision/collide.wgsl:23-56)
  * g2p_cdf — particle affinity/sign voting (Eq. 21) and MLS reconstruction of
    the particle signed distance + normal (g2p_cdf.wgsl:157-249)

Affinity bitmask layout kept verbatim from the reference (grid.wgsl:230-255):
16 affinity bits | 16 sign bits packed in a uint32, giving the 16-collider
CPIC cap.  Everything is a fixed-shape gather + masked reduction — no shared
memory staging, no atomics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.collision.shapes import project_on_boundary
from wgsparkl_tpu.ops.kernel import stencil_base_and_weights, stencil_offsets

# numpy scalars, NOT jnp arrays: module-level device constants get hoisted
# into jitted programs as closed-over inputs with fragile liveness (jax 0.9).
AFFINITY_MASK = np.uint32(0x0000FFFF)
SIGN_SHIFT = 16
MAX_COLLIDERS = 16
NONE = np.int32(-1)
BIG = 1.0e10


def affinities_are_compatible(a1, a2):
    """Particle/node CPIC compatibility (grid.wgsl:250-255)."""
    common = a1 & a2 & AFFINITY_MASK
    s1 = (a1 >> SIGN_SHIFT) & common
    s2 = (a2 >> SIGN_SHIFT) & common
    return s1 == s2


def affinity_bit(i, aff):
    return (aff & jnp.uint32(1 << i)) != 0


def sign_bit(i, aff):
    return ((aff >> SIGN_SHIFT) & jnp.uint32(1 << i)) != 0


def node_cdf(collider_types, shape_params, rot, trans, points, cell_width):
    """Analytic node CDF over all grid nodes.

    collider_types: static tuple of SHAPE_* ints (python loop is unrolled;
      <=16).  Mesh-like shapes are skipped here — they contribute through
      the rigid-particle path, same split as collide.wgsl:40.
    shape_params: [B, 8] params array;  rot/trans: body poses.
    points: [M, d] node positions.
    Returns (distance [M] (unsigned), affinity [M] uint32, closest [M] int32).
    """
    from wgsparkl_tpu.collision import shapes as shp

    m = points.shape[0]
    dist = jnp.full((m,), BIG, jnp.float32)
    aff = jnp.zeros((m,), jnp.uint32)
    closest = jnp.full((m,), -1, jnp.int32)
    cap = 1.5 * cell_width

    analytic = (shp.SHAPE_CUBOID, shp.SHAPE_BALL, shp.SHAPE_CAPSULE, shp.SHAPE_HALFSPACE)
    for i, st in enumerate(collider_types):
        if st not in analytic:
            continue
        dpt, inside = project_on_boundary(
            st, shape_params[i], rot[i], trans[i], points
        )
        within = inside | jnp.all(jnp.abs(dpt) <= cap, axis=-1)
        di = jnp.linalg.norm(dpt, axis=-1)
        closer = within & (di < dist)
        closest = jnp.where(closer, jnp.int32(i), closest)
        dist = jnp.where(closer, di, dist)
        bits = jnp.where(
            inside, jnp.uint32(0x00010001 << i), jnp.uint32(0x00000001 << i)
        )
        aff = aff | jnp.where(within, bits, jnp.uint32(0))
    return dist, aff, closest


def _inv3_apply(a, b):
    """x = inv(a) @ b for [..., 3, 3] via adjugate (wgebra inv3 equivalent)."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], -1),
            jnp.stack([c01, c11, c21], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        -2,
    )
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    return jnp.einsum("...ij,...j->...i", adj, b) * inv_det[..., None], det


def _inv4_apply(a, b):
    """x = inv(a) @ b for [..., 4, 4] via the 2x2-blocks cofactor method."""
    # Sub-determinants of the top two and bottom two rows.
    s0 = a[..., 0, 0] * a[..., 1, 1] - a[..., 1, 0] * a[..., 0, 1]
    s1 = a[..., 0, 0] * a[..., 1, 2] - a[..., 1, 0] * a[..., 0, 2]
    s2 = a[..., 0, 0] * a[..., 1, 3] - a[..., 1, 0] * a[..., 0, 3]
    s3 = a[..., 0, 1] * a[..., 1, 2] - a[..., 1, 1] * a[..., 0, 2]
    s4 = a[..., 0, 1] * a[..., 1, 3] - a[..., 1, 1] * a[..., 0, 3]
    s5 = a[..., 0, 2] * a[..., 1, 3] - a[..., 1, 2] * a[..., 0, 3]
    c5 = a[..., 2, 2] * a[..., 3, 3] - a[..., 3, 2] * a[..., 2, 3]
    c4 = a[..., 2, 1] * a[..., 3, 3] - a[..., 3, 1] * a[..., 2, 3]
    c3 = a[..., 2, 1] * a[..., 3, 2] - a[..., 3, 1] * a[..., 2, 2]
    c2 = a[..., 2, 0] * a[..., 3, 3] - a[..., 3, 0] * a[..., 2, 3]
    c1 = a[..., 2, 0] * a[..., 3, 2] - a[..., 3, 0] * a[..., 2, 2]
    c0 = a[..., 2, 0] * a[..., 3, 1] - a[..., 3, 0] * a[..., 2, 1]
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0

    i00 = a[..., 1, 1] * c5 - a[..., 1, 2] * c4 + a[..., 1, 3] * c3
    i01 = -a[..., 0, 1] * c5 + a[..., 0, 2] * c4 - a[..., 0, 3] * c3
    i02 = a[..., 3, 1] * s5 - a[..., 3, 2] * s4 + a[..., 3, 3] * s3
    i03 = -a[..., 2, 1] * s5 + a[..., 2, 2] * s4 - a[..., 2, 3] * s3
    i10 = -a[..., 1, 0] * c5 + a[..., 1, 2] * c2 - a[..., 1, 3] * c1
    i11 = a[..., 0, 0] * c5 - a[..., 0, 2] * c2 + a[..., 0, 3] * c1
    i12 = -a[..., 3, 0] * s5 + a[..., 3, 2] * s2 - a[..., 3, 3] * s1
    i13 = a[..., 2, 0] * s5 - a[..., 2, 2] * s2 + a[..., 2, 3] * s1
    i20 = a[..., 1, 0] * c4 - a[..., 1, 1] * c2 + a[..., 1, 3] * c0
    i21 = -a[..., 0, 0] * c4 + a[..., 0, 1] * c2 - a[..., 0, 3] * c0
    i22 = a[..., 3, 0] * s4 - a[..., 3, 1] * s2 + a[..., 3, 3] * s0
    i23 = -a[..., 2, 0] * s4 + a[..., 2, 1] * s2 - a[..., 2, 3] * s0
    i30 = -a[..., 1, 0] * c3 + a[..., 1, 1] * c1 - a[..., 1, 2] * c0
    i31 = a[..., 0, 0] * c3 - a[..., 0, 1] * c1 + a[..., 0, 2] * c0
    i32 = -a[..., 3, 0] * s3 + a[..., 3, 1] * s1 - a[..., 3, 2] * s0
    i33 = a[..., 2, 0] * s3 - a[..., 2, 1] * s1 + a[..., 2, 2] * s0

    adj = jnp.stack(
        [
            jnp.stack([i00, i01, i02, i03], -1),
            jnp.stack([i10, i11, i12, i13], -1),
            jnp.stack([i20, i21, i22, i23], -1),
            jnp.stack([i30, i31, i32, i33], -1),
        ],
        -2,
    )
    inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
    return jnp.einsum("...ij,...j->...i", adj, b) * inv_det[..., None], det


def solve_small(a, b):
    """Solve a x = b for (d+1)x(d+1) normal equations, returning (x, det)."""
    n = a.shape[-1]
    if n == 3:
        return _inv3_apply(a, b)
    if n == 4:
        return _inv4_apply(a, b)
    raise ValueError(f"solve_small supports 3x3/4x4, got {n}")


def particle_cdf_update(
    pos,
    prev_affinity,
    node_dist,
    node_aff,
    grid_cfg,
    num_colliders: int,
):
    """Per-particle CDF reconstruction (g2p_cdf equivalent).

    Combines stencil-node affinity masks, votes per-collider signs
    (Eq. 21, g2p_cdf.wgsl:157-188, with temporal sign persistence for
    already-affine colliders), then reconstructs signed distance + normal by
    weighted least squares over compatible nodes (g2p_cdf.wgsl:190-249).

    Returns dict(normal [N,d], signed_distance [N], affinity [N] uint32).
    """
    n, d = pos.shape
    h = grid_cfg.cell_width
    base, w, dpt = stencil_base_and_weights(pos, h)  # [N,d] [N,K] [N,K,d]
    offs = jnp.asarray(stencil_offsets(d))
    cells = base[:, None, :] + offs[None, :, :]
    valid = grid_cfg.in_bounds(cells)
    flat = jnp.where(valid, grid_cfg.flatten_index(cells), 0)

    n_aff = jnp.where(valid, node_aff[flat], jnp.uint32(0))     # [N,K]
    n_dist = jnp.where(valid, node_dist[flat], 0.0)             # [N,K]

    # Affinity bits: union over stencil nodes.
    p_aff_bits = jnp.zeros((n,), jnp.uint32)
    or_all = n_aff[:, 0] * 0
    for k in range(n_aff.shape[1]):
        or_all = or_all | n_aff[:, k]
    p_aff_bits = or_all & AFFINITY_MASK

    # Per-collider sign votes: sum_n w * (+-1) * dist over nodes carrying bit c.
    # (shape_has_solid_interior is uniformly false in the reference,
    # g2p_cdf.wgsl:252-256, so the sign comes straight from the node sign bit.)
    aff_u = n_aff[..., None]  # [N,K,1]
    col_bits = jnp.uint32(1) << jnp.arange(num_colliders, dtype=jnp.uint32)
    has_bit = (aff_u & col_bits) != 0                                   # [N,K,C]
    node_sign = ((aff_u >> SIGN_SHIFT) & col_bits) != 0                 # [N,K,C]
    sgn = jnp.where(node_sign, -1.0, 1.0)
    votes = jnp.sum(
        has_bit.astype(jnp.float32) * sgn * (w * n_dist)[..., None], axis=1
    )  # [N,C]

    # Sign bits: persist the previous sign where the particle already had the
    # affinity bit; otherwise take the vote's sign (g2p_cdf.wgsl:178-188).
    prev_bits = (prev_affinity[:, None] & col_bits) != 0            # [N,C]
    prev_signs = ((prev_affinity[:, None] >> SIGN_SHIFT) & col_bits) != 0
    new_signs = jnp.where(prev_bits, prev_signs, votes < 0.0)
    sign_word = jnp.sum(
        jnp.where(new_signs, col_bits.astype(jnp.uint32), jnp.uint32(0)),
        axis=-1,
        dtype=jnp.uint32,
    ) << SIGN_SHIFT
    p_aff = p_aff_bits | sign_word

    # MLS reconstruction over nodes sharing affinity with the particle.
    combined = n_aff & p_aff[:, None] & AFFINITY_MASK
    sign_diff = ((n_aff >> SIGN_SHIFT) ^ (p_aff[:, None] >> SIGN_SHIFT)) & combined
    use = combined != 0
    signed_dist = jnp.where(sign_diff == 0, n_dist, -n_dist)
    wk = jnp.where(use, w, 0.0)

    ones = jnp.ones_like(dpt[..., :1])
    p_vec = jnp.concatenate([dpt, ones], axis=-1)                   # [N,K,d+1]
    qtq = jnp.einsum("nk,nki,nkj->nij", wk, p_vec, p_vec)
    qtu = jnp.einsum("nk,nk,nki->ni", wk, signed_dist, p_vec)
    sol, det = solve_small(qtq, qtu)

    ok = det > 1e-8
    nrm_raw = sol[..., :d]
    nlen = jnp.linalg.norm(nrm_raw, axis=-1, keepdims=True)
    normal = jnp.where(nlen > 1e-6, nrm_raw / jnp.maximum(nlen, 1e-30), 0.0)
    normal = jnp.where(ok[:, None], normal, 0.0)
    sd = jnp.where(ok, sol[..., d], 0.0)
    p_aff = jnp.where(ok, p_aff, jnp.uint32(0))  # default_cdf on degenerate fit
    return {"normal": normal, "signed_distance": sd, "affinity": p_aff}
