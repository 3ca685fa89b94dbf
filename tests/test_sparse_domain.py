"""Sparse/unbounded-domain pallas path (round-1 verdict missing item 1).

1. Equivalence: the sparse active-block core reproduces the bounded pallas
   path exactly (same scene fits in both) over 20 coupled substeps.
2. Unbounded growth: a scene whose particles spread far beyond any initial
   bounding box keeps simulating correctly with fixed active-block-capacity
   memory; the bounded path would have frozen the leavers in its overflow
   bucket.
"""

import numpy as np

import jax
import jax.numpy as jnp

from wgsparkl_tpu import scenes
from wgsparkl_tpu.pipeline import MpmData, step_with_diag, substep_pallas


def _mk(base, **kw):
    return MpmData(
        base.params, base.state.particles, base.state.models,
        base.bodies_desc, 1.0, grid=base.config.grid,
        transfer="pallas", group=64, job_chunk=8, **kw,
    )


def test_sparse_matches_bounded():
    base = scenes.sand_box_3d(nxz=8, ny=16, cell_width=1.0)
    db = _mk(base)
    ds = _mk(base, sparse=True)
    fn = jax.jit(substep_pallas, static_argnums=2)
    sb, ss = db.state, ds.state
    for _ in range(20):
        sb = fn(sb, base.params, db.config)
    for _ in range(20):
        ss = fn(ss, base.params, ds.config)
    ib = np.argsort(np.asarray(sb.particles.ids))
    is_ = np.argsort(np.asarray(ss.particles.ids))
    np.testing.assert_allclose(
        np.asarray(sb.particles.pos)[ib], np.asarray(ss.particles.pos)[is_],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sb.particles.vel)[ib], np.asarray(ss.particles.vel)[is_],
        atol=1e-4,
    )
    assert (
        np.asarray(sb.particles.cdf_affinity)[ib]
        == np.asarray(ss.particles.cdf_affinity)[is_]
    ).all()
    np.testing.assert_allclose(
        np.asarray(sb.bodies.pos), np.asarray(ss.bodies.pos), atol=1e-6
    )


def test_particles_travel_beyond_initial_bounds():
    """Ballistic spray: particles fly ~4x beyond the initial occupied region
    and keep simulating (nonzero velocity, advancing positions) on the
    sparse path, with memory fixed at the block capacity."""
    from wgsparkl_tpu.grid import GridConfig
    from wgsparkl_tpu.models.drucker_prager import (
        DruckerPrager,
        drucker_prager_arrays,
    )
    from wgsparkl_tpu.models.elasticity import ElasticCoefficients
    from wgsparkl_tpu.params import SimulationParams
    from wgsparkl_tpu.solver import Models, Particles

    rng = np.random.default_rng(0)
    n_side = 6
    pos = (
        np.stack(
            np.meshgrid(*([np.arange(n_side) * 0.5] * 3), indexing="ij"), -1
        ).reshape(-1, 3)
        + 1.0
    )
    n = len(pos)
    vel = rng.normal(size=(n, 3)) * 12.0  # fast spray in all directions
    particles = Particles.from_arrays(
        pos.astype(np.float32), vel.astype(np.float32),
        density=1000.0, radius=0.25,
    )
    elast = ElasticCoefficients.from_young_modulus(1.0e5, 0.2)
    dpm = drucker_prager_arrays([DruckerPrager.new(1.0e5, 0.2)])
    dp = {k: np.full(n, v[0]) for k, v in dpm.items()}
    models = Models.from_arrays(n, elast.lam, elast.mu, dp=dp)
    # A tiny nominal grid: the initial cube only.  The sparse path ignores
    # its extent (only cell_width/origin matter).
    grid = GridConfig.from_bounds(
        np.array([0.0, 0.0, 0.0]), np.array([4.0, 4.0, 4.0]), 0.5
    )
    params = SimulationParams.new(dt=2e-2, gravity=np.zeros(3))
    data = MpmData(
        params, particles, models, [], 0.5, grid=grid,
        transfer="pallas", group=64, job_chunk=8, sparse=True,
    )
    fn = jax.jit(substep_pallas, static_argnums=2)
    state = data.state
    for _ in range(40):
        state = fn(state, params, data.config)
    p = np.asarray(state.particles.pos)
    v = np.asarray(state.particles.vel)
    assert np.isfinite(p).all() and np.isfinite(v).all()
    # Free particles must keep ballistic motion far outside the initial box
    # (the bounded path would have frozen them at the boundary).
    spread = np.abs(p - pos.mean(0)).max()
    assert spread > 8.0, spread   # initial cube is ~2.5 wide; >4x beyond
    moving = np.linalg.norm(v, axis=1) > 1.0
    assert moving.mean() > 0.9, moving.mean()


def test_sparse_mesh_colliders_match_bounded():
    """Trimesh colliders in the sparse domain (round-2 verdict missing
    item 1: the sparse core asserted analytic-only): the same ramp scene
    stepped sparse vs bounded pallas must agree."""
    from wgsparkl_tpu.collision.shapes import Collider
    from wgsparkl_tpu.models import ElasticCoefficients
    from wgsparkl_tpu.params import SimulationParams
    from wgsparkl_tpu.pipeline import RigidBodyDesc
    from wgsparkl_tpu.solver import Models, Particles

    h = 0.5
    verts = np.array(
        [[-4, 0.0, -4], [4, 1.6, -4], [4, 1.6, 4], [-4, 0.0, 4]], np.float32
    )
    tris = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    ramp = Collider.trimesh(verts, tris)
    xs = np.arange(6) * h / 2 + h / 4
    g = np.meshgrid(xs - 0.75, xs + 0.95, xs - 0.75, indexing="ij")
    pos = np.stack([a.ravel() for a in g], -1).astype(np.float32)
    parts = Particles.from_arrays(pos, density=1000.0, radius=h / 4)
    m = ElasticCoefficients.from_young_modulus(1e6, 0.2)
    models = Models.from_arrays(len(pos), m.lam, m.mu, phase=1.0)
    params = SimulationParams.new(dt=1 / 600, gravity=[0, -9.81, 0])
    bodies = [
        RigidBodyDesc(ramp, (0.0, 0.0, 0.0)),
        RigidBodyDesc(Collider.cuboid(6.0, 0.5, 6.0), (0.0, -1.2, 0.0)),
    ]
    bounds = (np.array([-4.0, -2.0, -4.0]), np.array([4.0, 6.0, 4.0]))

    def mk(**kw):
        return MpmData(
            params, parts, models, bodies, h, grid_bounds=bounds,
            transfer="pallas", group=64, job_chunk=8, **kw,
        )

    db, ds = mk(), mk(sparse=True)
    fn = jax.jit(substep_pallas, static_argnums=2)
    sb, ss = db.state, ds.state
    for _ in range(12):
        sb = fn(sb, params, db.config)
    for _ in range(12):
        ss = fn(ss, params, ds.config)
    affb = np.asarray(sb.particles.cdf_affinity)
    assert (affb != 0).any(), "scene never touched the mesh collider"
    ib = np.argsort(np.asarray(sb.particles.ids))
    is_ = np.argsort(np.asarray(ss.particles.ids))
    np.testing.assert_allclose(
        np.asarray(ss.particles.pos)[is_], np.asarray(sb.particles.pos)[ib],
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ss.particles.vel)[is_], np.asarray(sb.particles.vel)[ib],
        atol=1e-3,
    )
    assert (
        np.asarray(ss.particles.cdf_affinity)[is_] == affb[ib]
    ).all()


def test_sparse_capacity_overflow_is_reported():
    """Round-2 advisor (medium): kmax/amax overflow froze the truncated
    blocks' particles SILENTLY.  Both the on-device StepDiag and the
    host-side diagnostics.check must flag it now."""
    from wgsparkl_tpu.utils import diagnostics

    base = scenes.sand_box_3d(nxz=8, ny=16, cell_width=1.0)
    # Absurdly small block capacity: the scene occupies ~ tens of blocks.
    data = _mk(base, sparse=True, kmax=8, amax=16)

    rep = diagnostics.check(data)
    assert rep.occupied_blocks > 8 and rep.active_blocks > 16
    assert rep.sparse_overflow and not rep.ok
    assert "SPARSE BLOCK OVERFLOW" in rep.summary()
    assert "ACTIVE-SLOT OVERFLOW" in rep.summary()

    fn = jax.jit(step_with_diag, static_argnums=(2, 3))
    _, diag = fn(data.state, base.params, data.config, 2)
    assert int(diag.sparse_occ_overflow) > 0
    assert int(diag.sparse_act_overflow) > 0
    assert bool(diag.any_overflow())
    assert "sparse_occ_overflow" in diag.summary()

    # A healthy config reports zero overflow on the same scene.
    ok_data = _mk(base, sparse=True)
    _, diag_ok = fn(ok_data.state, base.params, ok_data.config, 2)
    assert not bool(diag_ok.any_overflow())
    assert diag_ok.summary() == "OK"
    rep_ok = diagnostics.check(ok_data)
    assert rep_ok.ok and not rep_ok.sparse_overflow
