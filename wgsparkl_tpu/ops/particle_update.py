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


# ----------------------------------------------------------- channel variant
def particle_update_channels(ch, params, grid_cfg, elastic_model="corotated"):
    """Channel-major fused particle update (3D, TPU hot path).

    ch: dict with channel arrays [N]:
      pos: [3 channels], vel: [3], grad: dict (i,j), F: dict (i,j),
      sd, normal [3], rigid_vel [3], mass, vol0,
      lam, mu, dp (dict), dps (dict), phase, stretch.
    Returns dict(pos[3], vel[3], F dict, affine dict, phase, dps dict).
    Physics identical to particle_update; layout avoids all [N,3,3]
    intermediates (full VPU lane utilization) and carries the model state
    as channels so the whole step can ride the [PCHAN, N] row matrix.
    """
    from wgsparkl_tpu.math.svd import eig33_sigma_ch
    from wgsparkl_tpu.models.drucker_prager import drucker_prager_project_ch
    from wgsparkl_tpu.models.elasticity import (
        kirchoff_stress_corotated_ch,
        kirchoff_stress_neo_hookean_ch,
    )

    dt = params.dt
    h = grid_cfg.cell_width
    vel = ch["vel"]
    nrm = ch["normal"]
    rv = ch["rigid_vel"]
    sd = ch["sd"]

    # Contact projection (particle_update.wgsl:64-66).
    penetrating = sd < -0.05 * h
    rel = [vel[i] - rv[i] for i in range(3)]
    nv = rel[0] * nrm[0] + rel[1] * nrm[1] + rel[2] * nrm[2]
    tang = [rel[i] - nrm[i] * nv for i in range(3)]
    tl = jnp.sqrt(tang[0] ** 2 + tang[1] ** 2 + tang[2] ** 2)
    inv_tl = jnp.where(tl > 1e-8, 1.0 / jnp.maximum(tl, 1e-30), 0.0)
    from wgsparkl_tpu.ops.transfer import DEFAULT_FRICTION

    scale = jnp.maximum(0.0, tl + DEFAULT_FRICTION * nv) * inv_tl
    proj = [
        jnp.where(nv < 0.0, tang[i] * scale, rel[i]) for i in range(3)
    ]
    new_vel = [
        jnp.where(penetrating, rv[i] + proj[i], vel[i]) for i in range(3)
    ]

    # Velocity clamp (particle_update.wgsl:70-72).
    speed = jnp.sqrt(new_vel[0] ** 2 + new_vel[1] ** 2 + new_vel[2] ** 2)
    limit = h / dt
    cl = jnp.where(speed > limit, limit / jnp.maximum(speed, 1e-30), 1.0)
    new_vel = [v * cl for v in new_vel]

    new_pos = [ch["pos"][i] + new_vel[i] * dt for i in range(3)]

    # Penalty impulse (particle_update.wgsl:79-84).
    corrected = jnp.maximum(sd, -0.3 * h)
    pen = dt * -corrected * PENALTY_COEFF
    new_vel = [
        jnp.where(penetrating, new_vel[i] + pen * nrm[i], new_vel[i])
        for i in range(3)
    ]

    # F += dt grad F.
    fc, gc = ch["F"], ch["grad"]
    new_f = {
        (i, j): fc[(i, j)] + dt * sum(gc[(i, k)] * fc[(k, j)] for k in range(3))
        for i in range(3)
        for j in range(3)
    }

    # Fracture check (sigma only — no U/V build).  Signed convention: the
    # smallest singular value carries sign(det F), matching the dense path
    # and the reference SVD (math/svd.py).  With max_stretch > 0 this is
    # equivalent to checking the largest sigma, but keep the signed form so
    # the channel and dense paths agree bit-for-bit on inverted elements.
    check = (ch["phase"] > 0.0) & (ch["stretch"] > 0.0)
    sig = eig33_sigma_ch(new_f)
    detf = (
        new_f[(0, 0)]
        * (new_f[(1, 1)] * new_f[(2, 2)] - new_f[(1, 2)] * new_f[(2, 1)])
        - new_f[(0, 1)]
        * (new_f[(1, 0)] * new_f[(2, 2)] - new_f[(1, 2)] * new_f[(2, 0)])
        + new_f[(0, 2)]
        * (new_f[(1, 0)] * new_f[(2, 1)] - new_f[(1, 1)] * new_f[(2, 0)])
    )
    smin = jnp.minimum(jnp.minimum(sig[0], sig[1]), sig[2])
    sgn = jnp.where(detf < 0.0, -1.0, 1.0)
    over = (
        (sig[0] * jnp.where(sig[0] == smin, sgn, 1.0) > ch["stretch"])
        | (sig[1] * jnp.where(sig[1] == smin, sgn, 1.0) > ch["stretch"])
        | (sig[2] * jnp.where(sig[2] == smin, sgn, 1.0) > ch["stretch"])
    )
    new_phase = jnp.where(check & over, 0.0, ch["phase"])

    # Plasticity.
    dp_state, f_proj = drucker_prager_project_ch(ch["dp"], ch["dps"], new_f)
    granular = new_phase == 0.0
    new_f = {
        k: jnp.where(granular, f_proj[k], new_f[k]) for k in new_f
    }
    new_dps = {
        k: jnp.where(granular, dp_state[k], ch["dps"][k]) for k in dp_state
    }

    if elastic_model == "corotated":
        stress = kirchoff_stress_corotated_ch(ch["lam"], ch["mu"], new_f)
    else:
        stress = kirchoff_stress_neo_hookean_ch(ch["lam"], ch["mu"], new_f)

    scale_a = ch["vol0"] * inv_d(h) * dt
    affine = {
        k: gc[k] * ch["mass"] - stress[k] * scale_a for k in new_f
    }
    return {
        "pos": new_pos, "vel": new_vel, "F": new_f, "affine": affine,
        "phase": new_phase, "dps": new_dps,
    }


def particle_update_channels_2d(ch, params, grid_cfg, elastic_model="corotated"):
    """2D channel-major fused particle update (see particle_update_channels).

    Same physics as particle_update with d=2; the signed channel SVD2
    (math/svd.py) already carries sign(det F) on the smallest singular
    value, so the fracture check uses it directly.
    """
    from wgsparkl_tpu.math.svd import svd2x2_ch
    from wgsparkl_tpu.models.drucker_prager import drucker_prager_project_ch2
    from wgsparkl_tpu.models.elasticity import (
        kirchoff_stress_corotated_ch2,
        kirchoff_stress_neo_hookean_ch2,
    )
    from wgsparkl_tpu.ops.transfer import DEFAULT_FRICTION

    dt = params.dt
    h = grid_cfg.cell_width
    vel = ch["vel"]
    nrm = ch["normal"]
    rv = ch["rigid_vel"]
    sd = ch["sd"]

    # Contact projection (particle_update.wgsl:64-66).
    penetrating = sd < -0.05 * h
    rel = [vel[i] - rv[i] for i in range(2)]
    nv = rel[0] * nrm[0] + rel[1] * nrm[1]
    tang = [rel[i] - nrm[i] * nv for i in range(2)]
    tl = jnp.sqrt(tang[0] ** 2 + tang[1] ** 2)
    inv_tl = jnp.where(tl > 1e-8, 1.0 / jnp.maximum(tl, 1e-30), 0.0)
    scale = jnp.maximum(0.0, tl + DEFAULT_FRICTION * nv) * inv_tl
    proj = [jnp.where(nv < 0.0, tang[i] * scale, rel[i]) for i in range(2)]
    new_vel = [
        jnp.where(penetrating, rv[i] + proj[i], vel[i]) for i in range(2)
    ]

    # Velocity clamp (particle_update.wgsl:70-72).
    speed = jnp.sqrt(new_vel[0] ** 2 + new_vel[1] ** 2)
    limit = h / dt
    cl = jnp.where(speed > limit, limit / jnp.maximum(speed, 1e-30), 1.0)
    new_vel = [v * cl for v in new_vel]

    new_pos = [ch["pos"][i] + new_vel[i] * dt for i in range(2)]

    # Penalty impulse (particle_update.wgsl:79-84).
    corrected = jnp.maximum(sd, -0.3 * h)
    pen = dt * -corrected * PENALTY_COEFF
    new_vel = [
        jnp.where(penetrating, new_vel[i] + pen * nrm[i], new_vel[i])
        for i in range(2)
    ]

    # F += dt grad F.
    fc, gc = ch["F"], ch["grad"]
    new_f = {
        (i, j): fc[(i, j)] + dt * sum(gc[(i, k)] * fc[(k, j)] for k in range(2))
        for i in range(2)
        for j in range(2)
    }

    # Fracture check: signed SVD2 sigmas (sig[1] carries sign det F).
    check = (ch["phase"] > 0.0) & (ch["stretch"] > 0.0)
    _, sig, _ = svd2x2_ch(new_f)
    over = (sig[0] > ch["stretch"]) | (sig[1] > ch["stretch"])
    new_phase = jnp.where(check & over, 0.0, ch["phase"])

    # Plasticity.
    dp_state, f_proj = drucker_prager_project_ch2(ch["dp"], ch["dps"], new_f)
    granular = new_phase == 0.0
    new_f = {k: jnp.where(granular, f_proj[k], new_f[k]) for k in new_f}
    new_dps = {
        k: jnp.where(granular, dp_state[k], ch["dps"][k]) for k in dp_state
    }

    if elastic_model == "corotated":
        stress = kirchoff_stress_corotated_ch2(ch["lam"], ch["mu"], new_f)
    else:
        stress = kirchoff_stress_neo_hookean_ch2(ch["lam"], ch["mu"], new_f)

    scale_a = ch["vol0"] * inv_d(h) * dt
    affine = {
        k: gc[k] * ch["mass"] - stress[k] * scale_a for k in new_f
    }
    return {
        "pos": new_pos, "vel": new_vel, "F": new_f, "affine": affine,
        "phase": new_phase, "dps": new_dps,
    }
