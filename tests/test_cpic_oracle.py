"""CPIC correctness vs the independent numpy oracle (VERDICT round-1 item 5):
node CDF, affinity/sign votes, MLS reconstruction, ghost velocities, impulse
accumulation and body integration for analytic cuboid colliders — the
subtlest bit-logic in the system, previously covered only by
path-vs-path equivalence (a shared formulation bug would pass those)."""

import numpy as np

import jax
import jax.numpy as jnp
from oracle_cpic import Body, OracleCpic

from wgsparkl_tpu.collision.shapes import Collider
from wgsparkl_tpu.grid import GridConfig
from wgsparkl_tpu.models.drucker_prager import DruckerPrager, drucker_prager_arrays
from wgsparkl_tpu.models.elasticity import ElasticCoefficients
from wgsparkl_tpu.params import SimulationParams
from wgsparkl_tpu.pipeline import MpmData, RigidBodyDesc, substep
from wgsparkl_tpu.solver import Models, Particles

DT = 1e-3
STEPS = 12


def _scene(seed=3):
    rng = np.random.default_rng(seed)
    cw = 0.5
    # elastic block + sand block resting on the floor, against a moving wall,
    # under a dynamic plate.
    xs = np.arange(8) * 0.25 - 1.0
    ys = np.arange(5) * 0.25 + 0.15
    zs = np.arange(6) * 0.25 - 0.7
    pos = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1).reshape(-1, 3)
    pos = pos + rng.uniform(-0.02, 0.02, pos.shape)
    n = len(pos)
    phase = (pos[:, 0] > 0.0).astype(np.float64)  # right half elastic
    bodies = [
        RigidBodyDesc(Collider.cuboid(4.0, 0.5, 4.0), (0.0, -0.5, 0.0)),
        RigidBodyDesc(
            Collider.cuboid(0.25, 1.5, 2.0), (-1.6, 1.0, 0.0),
            body_type="kinematic", linvel=(0.4, 0.0, 0.0),
        ),
        RigidBodyDesc(
            Collider.cuboid(0.5, 0.25, 0.5), (0.4, 1.72, -0.2),
            body_type="dynamic", density=400.0,
        ),
    ]
    elast = ElasticCoefficients.from_young_modulus(5.0e5, 0.2)
    dpm = drucker_prager_arrays([DruckerPrager.new(5.0e5, 0.2)])
    dp = {k: np.full(n, v[0]) for k, v in dpm.items()}
    particles = Particles.from_arrays(pos.astype(np.float32), density=1200.0,
                                      radius=cw / 4)
    models = Models.from_arrays(
        n, elast.lam, elast.mu, dp=dp, phase=phase.astype(np.float32)
    )
    grid = GridConfig.from_bounds(
        np.array([-4.0, -2.0, -4.0]), np.array([4.0, 4.0, 4.0]), cw
    )
    params = SimulationParams.new(dt=DT, gravity=np.array([0.0, -9.81, 0.0]))
    data = MpmData(params, particles, models, bodies, cw, grid=grid,
                   body_contacts=False)
    oracle_bodies = [
        Body((4.0, 0.5, 4.0), (0.0, -0.5, 0.0)),
        Body((0.25, 1.5, 2.0), (-1.6, 1.0, 0.0), linvel=(0.4, 0.0, 0.0)),
        Body((0.5, 0.25, 0.5), (0.4, 1.72, -0.2), density=400.0),
    ]
    return data, oracle_bodies, pos, dp, phase


def _mk_oracle(data, oracle_bodies, pos, dp, phase, **kw):
    p = data.state.particles
    m = data.state.models
    return OracleCpic(
        np.asarray(p.pos), np.asarray(p.vel), np.asarray(p.mass),
        np.asarray(p.init_volume), np.asarray(m.lam), np.asarray(m.mu),
        data.config.grid.cell_width, data.config.grid.origin_cell,
        data.config.grid.shape, dp=dp, phase=phase,
        bodies=oracle_bodies, **kw,
    )


def test_vs_oracle_cpic():
    data, obodies, pos, dp, phase = _scene()
    oracle = _mk_oracle(data, obodies, pos, dp, phase)

    fn = jax.jit(substep, static_argnums=2)
    state = data.state
    for _ in range(STEPS):
        state = fn(state, data.params, data.config)
        oracle.step(DT, data.params.gravity)

    np.testing.assert_allclose(
        np.asarray(state.particles.pos), oracle.p, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.particles.vel), oracle.v, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(state.particles.def_grad), oracle.F, atol=5e-4
    )
    # Affinity words must match bit-for-bit.
    assert (
        np.asarray(state.particles.cdf_affinity) == oracle.aff.astype(np.uint32)
    ).all()
    np.testing.assert_allclose(
        np.asarray(state.particles.cdf_signed_distance), oracle.sd, atol=5e-4
    )
    # Dynamic body received impulses and integrated identically.
    np.testing.assert_allclose(
        np.asarray(state.bodies.pos)[2], obodies[2].pos, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.bodies.linvel)[2], obodies[2].linvel, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state.bodies.angvel)[2], obodies[2].angvel, atol=1e-4
    )
    # The dynamic plate must actually have been pushed (nonzero coupling).
    assert np.linalg.norm(obodies[2].linvel) > 1e-6
    # Kinematic wall keeps its velocity + moved.
    np.testing.assert_allclose(
        np.asarray(state.bodies.pos)[1], obodies[1].pos, atol=1e-6
    )


def test_vs_oracle_cpic_pallas():
    """The FLAGSHIP path vs the oracle directly (round-2 verdict item 4):
    the fused pCDF+P2G kernel with deferred RMW and the per-job CPIC gate
    previously rested on the transitive chain pallas<->blocked<->dense<->
    oracle; this pins it to the oracle with the same bit-exact affinity and
    trajectory assertions (kernels in interpret mode on CPU)."""
    from wgsparkl_tpu.pipeline import substep_pallas

    data, obodies, pos, dp, phase = _scene()
    pdata = MpmData(
        data.params, data.state.particles, data.state.models,
        data.bodies_desc, data.config.grid.cell_width, grid=data.config.grid,
        body_contacts=False, transfer="pallas", group=64, job_chunk=8,
    )
    oracle = _mk_oracle(pdata, obodies, pos, dp, phase)

    fn = jax.jit(substep_pallas, static_argnums=2)
    state = pdata.state
    for _ in range(STEPS):
        state = fn(state, pdata.params, pdata.config)
        oracle.step(DT, pdata.params.gravity)

    # The pallas path re-sorts particles: compare by identity.
    order = np.argsort(np.asarray(state.particles.ids))
    np.testing.assert_allclose(
        np.asarray(state.particles.pos)[order], oracle.p, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.particles.vel)[order], oracle.v, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(state.particles.def_grad)[order], oracle.F, atol=5e-4
    )
    assert (
        np.asarray(state.particles.cdf_affinity)[order]
        == oracle.aff.astype(np.uint32)
    ).all()
    np.testing.assert_allclose(
        np.asarray(state.particles.cdf_signed_distance)[order], oracle.sd,
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(state.bodies.pos)[2], obodies[2].pos, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.bodies.linvel)[2], obodies[2].linvel, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state.bodies.angvel)[2], obodies[2].angvel, atol=1e-4
    )
    assert np.linalg.norm(obodies[2].linvel) > 1e-6


def test_injected_sign_vote_bug_is_caught():
    """The comparison must be sharp enough to catch a sign-vote bug."""
    data, obodies, pos, dp, phase = _scene()
    buggy = _mk_oracle(data, obodies, pos, dp, phase, sign_vote_bug=True)

    fn = jax.jit(substep, static_argnums=2)
    state = data.state
    for _ in range(STEPS):
        state = fn(state, data.params, data.config)
        buggy.step(DT, data.params.gravity)

    aff_match = (
        np.asarray(state.particles.cdf_affinity)
        == buggy.aff.astype(np.uint32)
    ).all()
    pos_match = np.allclose(
        np.asarray(state.particles.pos), buggy.p, atol=5e-5
    )
    assert not (aff_match and pos_match), (
        "inverted sign votes were not caught by the oracle comparison"
    )
