"""Fused per-particle update: advection, contact projection/penalty,
deformation-gradient update, fracture phase check, plastic projection,
stress, and the APIC affine matrix.

Physics parity with /root/reference/src/solver/particle_update.wgsl:45-141,
fused with the constitutive models into ONE vectorized map (the reference
splits models into separate WGSL imports; on TPU the whole thing is a single
elementwise+SVD pipeline over [N] particles — the BASELINE.json north star's
"fused per-particle kernel").
"""

from __future__ import annotations

import jax.numpy as jnp

from wgsparkl_tpu.math.svd import svd
from wgsparkl_tpu.models.drucker_prager import drucker_prager_project
from wgsparkl_tpu.models.elasticity import (
    kirchoff_stress_corotated,
    kirchoff_stress_neo_hookean,
)
from wgsparkl_tpu.ops.kernel import inv_d
from wgsparkl_tpu.ops.transfer import project_velocity

PENALTY_COEFF = 1.0e3  # particle_update.wgsl:79


def particle_update(particles, models, params, grid_cfg, elastic_model="corotated"):
    """Returns (new particles, new models) after one constitutive step.

    Expects particles.affine to hold the velocity gradient from g2p
    (g2p.wgsl:232 stores grad-v in the affine buffer).
    """
    d = particles.dim
    dt = params.dt
    h = grid_cfg.cell_width
    vel = particles.vel
    sd = particles.cdf_signed_distance
    normal = particles.cdf_normal
    rigid_vel = particles.cdf_rigid_vel

    # Contact projection: particles slightly inside a collider follow the
    # body velocity plus a friction-projected relative velocity
    # (particle_update.wgsl:64-66).
    penetrating = sd < -0.05 * h
    proj_vel = rigid_vel + project_velocity(vel - rigid_vel, normal)
    new_vel = jnp.where(penetrating[:, None], proj_vel, vel)

    # Velocity clamp: at most one cell per step (particle_update.wgsl:70-72).
    speed = jnp.linalg.norm(new_vel, axis=-1, keepdims=True)
    limit = h / dt
    new_vel = jnp.where(speed > limit, new_vel * (limit / jnp.maximum(speed, 1e-30)), new_vel)

    # Advection (before the penalty impulse, particle_update.wgsl:74).
    new_pos = particles.pos + new_vel * dt

    # Penalty impulse pushing out of penetration (particle_update.wgsl:79-84).
    corrected = jnp.maximum(sd, -0.3 * h)
    penalty = (dt * -corrected * PENALTY_COEFF)[:, None] * normal
    new_vel = jnp.where(penetrating[:, None], new_vel + penalty, new_vel)

    # Deformation gradient update: F += (grad_v dt) F (particle_update.wgsl:90).
    vel_grad = particles.affine
    new_f = particles.def_grad + dt * jnp.einsum(
        "nij,njk->nik", vel_grad, particles.def_grad
    )

    # Fracture: phase drops to 0 when any singular value exceeds max_stretch
    # (particle_update.wgsl:96-115).
    check = (models.phase > 0.0) & (models.max_stretch > 0.0)
    _, sig, _ = svd(new_f)
    over = jnp.any(sig > models.max_stretch[:, None], axis=-1)
    new_phase = jnp.where(check & over, 0.0, models.phase)

    # Plasticity on failed/granular particles (particle_update.wgsl:118-122).
    dp_state, f_proj = drucker_prager_project(models.dp, models.dp_state, new_f)
    granular = new_phase == 0.0
    new_f = jnp.where(granular[:, None, None], f_proj, new_f)
    new_dp_state = {
        k: jnp.where(granular, dp_state[k], models.dp_state[k])
        for k in dp_state
    }

    # Elastic Kirchhoff stress (particle_update.wgsl:125).
    if elastic_model == "corotated":
        stress = kirchoff_stress_corotated(models.lam, models.mu, new_f)
    elif elastic_model == "neo_hookean":
        stress = kirchoff_stress_neo_hookean(models.lam, models.mu, new_f)
    else:
        raise ValueError(f"unknown elastic model {elastic_model}")

    # APIC affine: grad_v * m - stress * (V0 inv_d dt) (particle_update.wgsl:130-132).
    affine = vel_grad * particles.mass[:, None, None] - stress * (
        particles.init_volume * inv_d(h) * dt
    )[:, None, None]

    new_particles = particles.replace(
        pos=new_pos, vel=new_vel, def_grad=new_f, affine=affine
    )
    new_models = models.replace(phase=new_phase, dp_state=new_dp_state)
    return new_particles, new_models
