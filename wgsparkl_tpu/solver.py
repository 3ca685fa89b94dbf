"""Particle data types: host-side scene API + device-side SoA state.

API parity with the reference's particle structs
(/root/reference/src/solver/particle3d.rs:16-60, particle_update.rs:35-40):

  Particle{position, dynamics, model, plasticity, phase}   (host, per particle)
  ParticleDynamics::with_density(radius, density)
  ParticlePhase{phase, max_stretch}

plus the TPU-native bulk builders (`Particles.from_arrays`) — on TPU scenes
with 10^6 particles are built vectorized with numpy, not one Python object at
a time.  Device state is a single flax.struct pytree of SoA arrays (the
reference splits the same data across GpuParticles/GpuModels buffers,
particle3d.rs:176-211 and models/mod.rs:12-50).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.struct
import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.models import DruckerPrager, ElasticCoefficients


@dataclasses.dataclass(frozen=True)
class ParticlePhase:
    """phase=1: intact elastic; phase=0: granular/failed. max_stretch<=0 disables
    the fracture check (particle_update.wgsl:96-115)."""

    phase: float = 0.0
    max_stretch: float = -1.0


@dataclasses.dataclass(frozen=True)
class ParticleDynamics:
    velocity: tuple
    init_volume: float
    init_radius: float
    mass: float

    @staticmethod
    def with_density(radius: float, density: float, dim: int = 3) -> "ParticleDynamics":
        """Square-ish particle of side 2*radius (particle3d.rs:28-42)."""
        init_volume = (2.0 * radius) ** dim
        return ParticleDynamics(
            velocity=(0.0,) * dim,
            init_volume=init_volume,
            init_radius=radius,
            mass=init_volume * density,
        )


@dataclasses.dataclass(frozen=True)
class Particle:
    position: tuple
    dynamics: ParticleDynamics
    model: ElasticCoefficients
    plasticity: Optional[DruckerPrager] = None
    phase: Optional[ParticlePhase] = None


@flax.struct.dataclass
class Particles:
    """Device-side SoA particle state (one pytree; N = particle count, d = dim).

    `affine` doubles as velocity-gradient storage between g2p and
    particle_update, exactly like the reference reuses its affine buffer
    (g2p.wgsl:229-237, particle_update.wgsl:89-91).
    """

    pos: jnp.ndarray        # [N, d]
    vel: jnp.ndarray        # [N, d]
    def_grad: jnp.ndarray   # [N, d, d]
    affine: jnp.ndarray     # [N, d, d]
    init_volume: jnp.ndarray  # [N]
    init_radius: jnp.ndarray  # [N]
    mass: jnp.ndarray       # [N]
    # CPIC color-distance-field state (particle3d.rs:44-51)
    cdf_normal: jnp.ndarray        # [N, d]
    cdf_rigid_vel: jnp.ndarray     # [N, d]
    cdf_signed_distance: jnp.ndarray  # [N]
    cdf_affinity: jnp.ndarray      # [N] uint32 (16 affinity bits | 16 sign bits)
    # Original particle identity: the blocked pipeline keeps particles in
    # block-sorted order (sorted_particle_ids equivalent, sort.wgsl:117-137);
    # ids[i] is the scene-construction index of the particle now at row i.
    ids: jnp.ndarray               # [N] int32

    @property
    def dim(self) -> int:
        return self.pos.shape[-1]

    @property
    def count(self) -> int:
        return self.pos.shape[0]

    @staticmethod
    def from_arrays(
        positions,
        velocities=None,
        *,
        mass=None,
        density=None,
        radius=None,
        init_volume=None,
    ) -> "Particles":
        """Vectorized builder. Provide either (density, radius) or explicit
        (mass, init_volume, radius)."""
        pos = jnp.asarray(positions, jnp.float32)
        n, d = pos.shape
        if velocities is None:
            vel = jnp.zeros_like(pos)
        else:
            vel = jnp.broadcast_to(jnp.asarray(velocities, jnp.float32), pos.shape)
        if init_volume is None:
            if density is None or radius is None:
                raise ValueError("need (density, radius) or explicit volumes")
            radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (n,))
            init_volume = (2.0 * radius) ** d
            mass = init_volume * jnp.broadcast_to(jnp.asarray(density, jnp.float32), (n,))
        else:
            init_volume = jnp.broadcast_to(jnp.asarray(init_volume, jnp.float32), (n,))
            radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (n,))
            mass = jnp.broadcast_to(jnp.asarray(mass, jnp.float32), (n,))
        eye = jnp.broadcast_to(jnp.eye(d, dtype=jnp.float32), (n, d, d))
        return Particles(
            pos=pos,
            vel=vel,
            def_grad=eye,
            affine=jnp.zeros((n, d, d), jnp.float32),
            init_volume=init_volume,
            init_radius=radius,
            mass=mass,
            cdf_normal=jnp.zeros((n, d), jnp.float32),
            cdf_rigid_vel=jnp.zeros((n, d), jnp.float32),
            cdf_signed_distance=jnp.zeros((n,), jnp.float32),
            cdf_affinity=jnp.zeros((n,), jnp.uint32),
            ids=jnp.arange(n, dtype=jnp.int32),
        )

    @staticmethod
    def from_particles(particles: Sequence[Particle]) -> "Particles":
        """Host-API-parity builder from a list of `Particle` objects."""
        pos = np.asarray([p.position for p in particles], np.float32)
        vel = np.asarray([p.dynamics.velocity for p in particles], np.float32)
        vol = np.asarray([p.dynamics.init_volume for p in particles], np.float32)
        rad = np.asarray([p.dynamics.init_radius for p in particles], np.float32)
        mass = np.asarray([p.dynamics.mass for p in particles], np.float32)
        return Particles.from_arrays(
            pos, vel, mass=mass, init_volume=vol, radius=rad
        )


@flax.struct.dataclass
class Models:
    """Per-particle constitutive parameters (GpuModels equivalent,
    models/mod.rs:12-50)."""

    lam: jnp.ndarray  # [N] elastic lambda
    mu: jnp.ndarray   # [N] elastic mu
    dp: dict          # Drucker-Prager params arrays (h0..h3, lam, mu)
    dp_state: dict    # {det, hardening, log_vol_gain}
    phase: jnp.ndarray        # [N] f32
    max_stretch: jnp.ndarray  # [N] f32 (<=0 disables fracture check)
    # Deduplicated constants for the pallas fast path (filled by MpmData;
    # see ops/pallas_transfer.MTAB_* and MpmConfig.n_materials): the
    # immutable per-particle constants (lam, mu, dp params, max_stretch,
    # init_volume, init_radius) collapse to a [16, 128] material table +
    # a per-particle material id, shrinking the sorted row matrix.
    mat_id: Optional[jnp.ndarray] = None      # [N] f32 integer-valued
    mat_table: Optional[jnp.ndarray] = None   # [16, 128] f32

    @staticmethod
    def from_arrays(
        n: int,
        lam,
        mu,
        dp: Optional[dict] = None,
        phase=None,
        max_stretch=None,
    ) -> "Models":
        lam = jnp.broadcast_to(jnp.asarray(lam, jnp.float32), (n,))
        mu = jnp.broadcast_to(jnp.asarray(mu, jnp.float32), (n,))
        if dp is None:
            dp = {k: jnp.full((n,), -1.0, jnp.float32) for k in ("h0", "h1", "h2", "h3", "lam", "mu")}
        else:
            dp = {k: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (n,)) for k, v in dp.items()}
        dp_state = {
            "det": jnp.ones((n,), jnp.float32),
            "hardening": jnp.ones((n,), jnp.float32),
            "log_vol_gain": jnp.zeros((n,), jnp.float32),
        }
        phase = jnp.broadcast_to(
            jnp.asarray(0.0 if phase is None else phase, jnp.float32), (n,)
        )
        max_stretch = jnp.broadcast_to(
            jnp.asarray(-1.0 if max_stretch is None else max_stretch, jnp.float32), (n,)
        )
        return Models(lam=lam, mu=mu, dp=dp, dp_state=dp_state, phase=phase, max_stretch=max_stretch)

    @staticmethod
    def from_particles(particles: Sequence[Particle]) -> "Models":
        from wgsparkl_tpu.models.drucker_prager import drucker_prager_arrays

        n = len(particles)
        lam = np.asarray([p.model.lam for p in particles], np.float32)
        mu = np.asarray([p.model.mu for p in particles], np.float32)
        dps = [p.plasticity if p.plasticity is not None else DruckerPrager() for p in particles]
        dp = {k: jnp.asarray(v) for k, v in drucker_prager_arrays(dps).items()}
        phases = np.asarray(
            [p.phase.phase if p.phase is not None else 0.0 for p in particles], np.float32
        )
        stretch = np.asarray(
            [p.phase.max_stretch if p.phase is not None else -1.0 for p in particles],
            np.float32,
        )
        return Models.from_arrays(n, lam, mu, dp=dp, phase=phases, max_stretch=stretch)


def attach_material_table(particles, models):
    """Dedupe the immutable per-particle constants into a material table.

    Returns (models', n_materials): models' carries mat_id [N] (f32
    integer-valued) and mat_table [16, 128] (rows = ops/pallas_transfer
    MTAB_* layout: lam, mu, dp h0..h3/lam/mu, max_stretch, init_volume,
    init_radius; lanes = material ids).  The pallas row packing then drops
    these 11 constant rows from the sorted state (kernels look them up by
    id).  Host-side (concrete numpy); <= 128 distinct materials.
    """
    dpk = ("h0", "h1", "h2", "h3", "lam", "mu")
    key = np.stack(
        [np.asarray(models.lam), np.asarray(models.mu)]
        + [np.asarray(models.dp[k]) for k in dpk]
        + [
            np.asarray(models.max_stretch),
            np.asarray(particles.init_volume),
            np.asarray(particles.init_radius),
        ],
        axis=1,
    )                                                     # [N, 11]
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    if len(uniq) > 128:
        raise ValueError(
            f"pallas path supports <= 128 distinct materials, got "
            f"{len(uniq)} (use transfer='blocked'/'dense' for per-particle "
            "continuous material variation)"
        )
    table = np.zeros((16, 128), np.float32)
    table[:11, : len(uniq)] = uniq.T
    return (
        models.replace(
            mat_id=jnp.asarray(inv, jnp.float32),
            mat_table=jnp.asarray(table),
        ),
        len(uniq),
    )
