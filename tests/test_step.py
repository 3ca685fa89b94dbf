"""End-to-end substep correctness: JAX pipeline vs the numpy oracle, plus
analytic invariants (momentum conservation, exact free fall)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wgsparkl_tpu.grid import GridConfig
from wgsparkl_tpu.models import ElasticCoefficients
from wgsparkl_tpu.params import SimulationParams
from wgsparkl_tpu.pipeline import MpmConfig, SimState, substep
from wgsparkl_tpu.rigid.body import make_rigid_world
from wgsparkl_tpu.solver import Models, Particles

from oracle_mpm import OracleSim


def _make_state(pos, vel, lam, mu, h, dp=None, phase=None, max_stretch=None):
    n, d = pos.shape
    parts = Particles.from_arrays(pos, vel, density=1000.0, radius=h / 4)
    models = Models.from_arrays(n, lam, mu, dp=dp, phase=phase, max_stretch=max_stretch)
    bodies = make_rigid_world(d, 1)
    return SimState(particles=parts, models=models, bodies=bodies)


def _block2d(h, n=8, offset=(0.3, 0.5), jitter=0.0, seed=0):
    xs = np.arange(n) * h / 2 + h / 4
    X, Y = np.meshgrid(xs + offset[0], xs + offset[1], indexing="ij")
    pos = np.stack([X.ravel(), Y.ravel()], -1).astype(np.float32)
    if jitter:
        pos += np.random.default_rng(seed).uniform(-jitter, jitter, pos.shape).astype(np.float32)
    return pos


@pytest.mark.parametrize("dim", [2, 3])
def test_vs_oracle_elastic(dim):
    h = 0.1
    rng = np.random.default_rng(1)
    if dim == 2:
        pos = _block2d(h, n=6, jitter=h * 0.1)
    else:
        xs = np.arange(4) * h / 2 + h / 4
        g = np.meshgrid(xs + 0.3, xs + 0.5, xs + 0.3, indexing="ij")
        pos = np.stack([a.ravel() for a in g], -1).astype(np.float32)
        pos += rng.uniform(-h * 0.1, h * 0.1, pos.shape).astype(np.float32)
    vel = rng.uniform(-0.5, 0.5, pos.shape).astype(np.float32)
    n = len(pos)
    m = ElasticCoefficients.from_young_modulus(1e5, 0.3)
    grid = GridConfig(shape=(32,) * dim, cell_width=h, origin_cell=(-8,) * dim)
    cfg = MpmConfig(grid=grid)
    state = _make_state(pos, vel, m.lam, m.mu, h, phase=1.0)
    params = SimulationParams.new(dt=1e-3, gravity=[0.0, -9.81] + [0.0] * (dim - 2))

    mass = float(np.asarray(state.particles.mass)[0])
    vol0 = float(np.asarray(state.particles.init_volume)[0])
    oracle = OracleSim(
        pos, vel, np.full(n, mass), np.full(n, vol0),
        np.full(n, m.lam), np.full(n, m.mu), h,
        origin=(-8,) * dim, shape=(32,) * dim, phase=np.ones(n),
    )

    stepped = jax.jit(substep, static_argnums=2)
    for _ in range(10):
        state = stepped(state, params, cfg)
        oracle.step(1e-3, params.gravity)

    np.testing.assert_allclose(
        np.asarray(state.particles.pos), oracle.p, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(state.particles.vel), oracle.v, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(state.particles.def_grad), oracle.F, atol=2e-4
    )


def test_vs_oracle_sand():
    """Drucker-Prager path: sand block under gravity and initial shear."""
    h = 0.1
    pos = _block2d(h, n=6, jitter=0.02 * h, seed=3)
    rng = np.random.default_rng(4)
    vel = rng.uniform(-1.0, 1.0, pos.shape).astype(np.float32)
    n = len(pos)
    m = ElasticCoefficients.from_young_modulus(1e6, 0.2)
    from wgsparkl_tpu.models import DruckerPrager
    from wgsparkl_tpu.models.drucker_prager import drucker_prager_arrays

    dp_host = drucker_prager_arrays([DruckerPrager.new(1e6, 0.2)] * n)
    grid = GridConfig(shape=(32, 32), cell_width=h, origin_cell=(-8, -8))
    cfg = MpmConfig(grid=grid)
    state = _make_state(pos, vel, m.lam, m.mu, h, dp=dp_host)
    params = SimulationParams.new(dt=1e-3, gravity=[0.0, -9.81])

    mass = float(np.asarray(state.particles.mass)[0])
    vol0 = float(np.asarray(state.particles.init_volume)[0])
    oracle = OracleSim(
        pos, vel, np.full(n, mass), np.full(n, vol0),
        np.full(n, m.lam), np.full(n, m.mu), h,
        origin=(-8, -8), shape=(32, 32),
        dp={k: np.asarray(v) for k, v in dp_host.items()},
    )
    stepped = jax.jit(substep, static_argnums=2)
    for _ in range(10):
        state = stepped(state, params, cfg)
        oracle.step(1e-3, params.gravity)

    np.testing.assert_allclose(np.asarray(state.particles.pos), oracle.p, atol=5e-5)
    np.testing.assert_allclose(np.asarray(state.particles.vel), oracle.v, atol=5e-4)
    np.testing.assert_allclose(np.asarray(state.particles.def_grad), oracle.F, atol=1e-3)
    # Plasticity must actually have fired.
    assert np.any(np.asarray(state.models.dp_state["hardening"]) > 1.0)


def test_momentum_conservation_no_gravity():
    h = 0.1
    pos = _block2d(h, n=8, jitter=0.1 * h, seed=5)
    rng = np.random.default_rng(6)
    vel = rng.uniform(-1, 1, pos.shape).astype(np.float32)
    m = ElasticCoefficients.from_young_modulus(1e5, 0.3)
    grid = GridConfig(shape=(64, 64), cell_width=h, origin_cell=(-16, -16))
    cfg = MpmConfig(grid=grid)
    state = _make_state(pos, vel, m.lam, m.mu, h, phase=1.0)
    params = SimulationParams.new(dt=1e-3, gravity=[0.0, 0.0])

    mom0 = np.asarray(state.particles.vel * state.particles.mass[:, None]).sum(0)
    stepped = jax.jit(substep, static_argnums=2)
    for _ in range(20):
        state = stepped(state, params, cfg)
    mom1 = np.asarray(state.particles.vel * state.particles.mass[:, None]).sum(0)
    np.testing.assert_allclose(mom0, mom1, atol=1e-6 * abs(mom0).max())


def test_free_fall_exact():
    h = 0.1
    pos = _block2d(h, n=4, offset=(0.3, 2.0))
    m = ElasticCoefficients.from_young_modulus(1e5, 0.3)
    grid = GridConfig(shape=(64, 64), cell_width=h, origin_cell=(-16, -16))
    cfg = MpmConfig(grid=grid)
    state = _make_state(pos, np.zeros_like(pos), m.lam, m.mu, h, phase=1.0)
    dt = 1e-3
    params = SimulationParams.new(dt=dt, gravity=[0.0, -10.0])
    stepped = jax.jit(substep, static_argnums=2)
    for _ in range(50):
        state = stepped(state, params, cfg)
    v = np.asarray(state.particles.vel)
    np.testing.assert_allclose(v[:, 1], -10.0 * dt * 50, rtol=1e-5)
    np.testing.assert_allclose(v[:, 0], 0.0, atol=1e-5)
    f = np.asarray(state.particles.def_grad)
    np.testing.assert_allclose(f, np.broadcast_to(np.eye(2), f.shape), atol=1e-5)


def test_fracture_phase_flip():
    """Particles stretched beyond max_stretch lose phase (fracture,
    particle_update.wgsl:96-115) and start taking the plastic branch."""
    import jax.numpy as jnp

    h = 0.1
    pos = _block2d(h, n=4)
    m = ElasticCoefficients.from_young_modulus(1e5, 0.3)
    grid = GridConfig(shape=(32, 32), cell_width=h, origin_cell=(-8, -8))
    cfg = MpmConfig(grid=grid)
    state = _make_state(
        pos, np.zeros_like(pos), m.lam, m.mu, h, phase=1.0, max_stretch=1.2
    )
    # Pre-stretch half the particles beyond the limit.
    f = np.tile(np.eye(2, dtype=np.float32), (len(pos), 1, 1))
    f[: len(pos) // 2, 0, 0] = 1.5
    state = state.replace(
        particles=state.particles.replace(def_grad=jnp.asarray(f))
    )
    params = SimulationParams.new(dt=1e-3, gravity=[0.0, 0.0])
    out = jax.jit(substep, static_argnums=2)(state, params, cfg)
    phase = np.asarray(out.models.phase)
    assert (phase[: len(pos) // 2] == 0.0).all(), "overstretched must fracture"
    assert (phase[len(pos) // 2:] == 1.0).all(), "others keep phase"
