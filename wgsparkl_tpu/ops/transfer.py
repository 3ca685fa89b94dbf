"""P2G / grid-update / G2P transfer ops (the MPM hot path), dense-grid form.

TPU-native reformulation of the reference's block+linked-list kernels:

* P2G (p2g.wgsl:69-236): the reference gathers per-node particle linked
  lists staged in workgroup shared memory.  Here the same gather-math is
  expressed as one fixed-shape scatter-add over (particle, stencil-offset)
  pairs — XLA's scatter on TPU is deterministic, so the fixed-point atomic
  trick (rigid_impulses.wgsl:50) is unnecessary; CPIC impulses reduce with
  segment_sum over collider ids.
* grid update (grid_update.wgsl:44-65): pure elementwise map.
* G2P (g2p.wgsl:134-238): pure gather + weighted reductions.

A block-tiled MXU formulation of P2G/G2P lives in ops/blocked.py; this module
is the reference-correct dense path and the correctness oracle for it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wgsparkl_tpu.collision import cdf as cdf_mod
from wgsparkl_tpu.ops.kernel import inv_d, stencil_base_and_weights, stencil_offsets
from wgsparkl_tpu.rigid import body as body_mod

DEFAULT_FRICTION = 20.0


def project_velocity(vel, normal, friction: float = DEFAULT_FRICTION):
    """Friction-cone velocity projection (grid.wgsl:390-403)."""
    nvel = jnp.sum(vel * normal, axis=-1, keepdims=True)
    tangent = vel - normal * nvel
    tlen = jnp.linalg.norm(tangent, axis=-1, keepdims=True)
    tdir = jnp.where(tlen > 1e-8, tangent / jnp.maximum(tlen, 1e-30), 0.0)
    projected = tdir * jnp.maximum(0.0, tlen + friction * nvel)
    return jnp.where(nvel < 0.0, projected, vel)


def _stencil(pos, grid_cfg):
    """Shared stencil plumbing: weights, node deltas, flat indices, validity."""
    d = pos.shape[-1]
    base, w, dpt = stencil_base_and_weights(pos, grid_cfg.cell_width)
    offs = jnp.asarray(stencil_offsets(d))
    cells = base[:, None, :] + offs[None, :, :]
    valid = grid_cfg.in_bounds(cells)
    flat = jnp.where(valid, grid_cfg.flatten_index(cells), 0)
    w = jnp.where(valid, w, 0.0)
    return w, dpt, flat, valid


def p2g(particles, models, bodies, node_aff, node_closest, grid_cfg, num_colliders):
    """Scatter particle momentum/mass to the grid; accumulate CPIC impulses.

    Returns (grid_mom [M,d], grid_mass [M], lin_impulse [B,d], ang_impulse [B,a]).
    """
    pos, vel, mass = particles.pos, particles.vel, particles.mass
    affine = particles.affine
    n, d = pos.shape
    m_nodes = grid_cfg.num_nodes

    w, dpt, flat, valid = _stencil(pos, grid_cfg)

    n_aff_k = jnp.where(valid, node_aff[flat], jnp.uint32(0))
    closest_k = jnp.where(valid, node_closest[flat], -1)
    compat = cdf_mod.affinities_are_compatible(
        n_aff_k, particles.cdf_affinity[:, None]
    )

    # Momentum: w * (A @ dpt + m v); mass: w * m — only for compatible pairs
    # (p2g.wgsl:226-232).
    mom_pair = jnp.einsum("nij,nkj->nki", affine, dpt) + (mass[:, None] * vel)[
        :, None, :
    ]
    use = compat & valid
    w_use = jnp.where(use, w, 0.0)
    mom_contrib = mom_pair * w_use[..., None]
    mass_contrib = w_use * mass[:, None]

    grid_mom = jnp.zeros((m_nodes, d), pos.dtype).at[flat.reshape(-1)].add(
        mom_contrib.reshape(-1, d)
    )
    grid_mass = jnp.zeros((m_nodes,), pos.dtype).at[flat.reshape(-1)].add(
        mass_contrib.reshape(-1)
    )

    # CPIC impulses for incompatible pairs with a closest collider
    # (p2g.wgsl:200-231): ghost velocity against the particle's CDF normal.
    imp_mask = (~compat) & valid & (closest_k >= 0)
    safe_id = jnp.where(imp_mask, closest_k, 0)
    cell_center = dpt + pos[:, None, :]
    body_pt_vel = body_mod.velocity_at_point(bodies, safe_id, cell_center)
    ghost = body_pt_vel + project_velocity(
        vel[:, None, :] - body_pt_vel, particles.cdf_normal[:, None, :]
    )
    delta_imp = (vel[:, None, :] - ghost) * (w * mass[:, None])[..., None]
    delta_imp = jnp.where(imp_mask[..., None], delta_imp, 0.0)
    lever = bodies.world_com[safe_id] - cell_center
    if d == 2:
        ang = (
            delta_imp[..., 0] * lever[..., 1] - delta_imp[..., 1] * lever[..., 0]
        )[..., None]
    else:
        ang = jnp.cross(delta_imp, lever)

    nb = bodies.count
    seg = jnp.where(imp_mask, closest_k, nb).reshape(-1)
    lin_imp = jax.ops.segment_sum(delta_imp.reshape(-1, d), seg, num_segments=nb + 1)[
        :nb
    ]
    ang_imp = jax.ops.segment_sum(
        ang.reshape(-1, ang.shape[-1]), seg, num_segments=nb + 1
    )[:nb]
    return grid_mom, grid_mass, lin_imp, ang_imp


def grid_update(grid_mom, grid_mass, params, grid_cfg):
    """Momentum -> velocity + gravity, clamped to one cell per step
    (grid_update.wgsl:44-65).  Returns grid velocities [M, d]."""
    inv_mass = jnp.where(grid_mass > 0.0, 1.0 / jnp.maximum(grid_mass, 1e-30), 0.0)
    vel = (
        grid_mom + grid_mass[:, None] * params.gravity[None, :] * params.dt
    ) * inv_mass[:, None]
    vel_limit = grid_cfg.cell_width / params.dt
    return jnp.clip(vel, -vel_limit, vel_limit)


def g2p(particles, bodies, grid_vel, node_aff, node_closest, grid_cfg, num_colliders):
    """Gather grid velocities back to particles (APIC) with CPIC ghost
    velocities; also accumulates the particle's rigid contact velocity.

    Returns (new_vel [N,d], velocity_gradient [N,d,d], rigid_vel [N,d]).
    """
    pos, vel = particles.pos, particles.vel
    n, d = pos.shape
    w, dpt, flat, valid = _stencil(pos, grid_cfg)

    cell_vel = jnp.where(valid[..., None], grid_vel[flat], 0.0)        # [N,K,d]
    n_aff_k = jnp.where(valid, node_aff[flat], jnp.uint32(0))
    closest_k = jnp.where(valid, node_closest[flat], -1)
    compat = cdf_mod.affinities_are_compatible(
        n_aff_k, particles.cdf_affinity[:, None]
    )

    # Incompatible cells substitute the CPIC ghost velocity (g2p.wgsl:184-207).
    has_body = closest_k >= 0
    safe_id = jnp.where(has_body, closest_k, 0)
    cell_center = dpt + pos[:, None, :]
    body_pt_vel = body_mod.velocity_at_point(bodies, safe_id, cell_center)
    ghost_with_body = body_pt_vel + project_velocity(
        vel[:, None, :] - body_pt_vel, particles.cdf_normal[:, None, :]
    )
    ghost = jnp.where(
        has_body[..., None], ghost_with_body, jnp.broadcast_to(vel[:, None, :], cell_vel.shape)
    )
    eff_vel = jnp.where(compat[..., None], cell_vel, ghost)

    new_vel = jnp.einsum("nk,nkd->nd", w, eff_vel)
    vel_grad = inv_d(grid_cfg.cell_width) * jnp.einsum(
        "nk,nki,nkj->nij", w, eff_vel, dpt
    )

    rigid_vel = rigid_velocity_sum(
        pos, particles.cdf_affinity, bodies, num_colliders
    )
    return new_vel, vel_grad, rigid_vel


def rigid_velocity_sum(pos, affinity, bodies, num_colliders):
    """Sum of body velocity fields the particle is affine to (g2p.wgsl:220-226)."""
    n = pos.shape[0]
    rigid_vel = jnp.zeros_like(pos)
    for i in range(num_colliders):
        has = cdf_mod.affinity_bit(i, affinity)
        bv = body_mod.velocity_at_point(
            bodies, jnp.full((n,), i, jnp.int32), pos
        )
        rigid_vel = rigid_vel + jnp.where(has[:, None], bv, 0.0)
    return rigid_vel
