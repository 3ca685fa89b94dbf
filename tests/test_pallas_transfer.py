"""Pallas transfer kernels vs the blocked reference path (interpret mode on
CPU; the same kernels compile to Mosaic on TPU)."""

import numpy as np

import jax

from wgsparkl_tpu import scenes
from wgsparkl_tpu.pipeline import MpmData, substep_blocked, substep_pallas


def test_pallas_matches_blocked_3d_coupled():
    d3 = scenes.sand_box_3d(nxz=8, ny=16, cell_width=1.0)
    mk = lambda tr: MpmData(
        d3.params, d3.state.particles, d3.state.models, d3.bodies_desc, 1.0,
        grid=d3.config.grid, transfer=tr, group=256, job_chunk=8,
    )
    db, dp = mk("blocked"), mk("pallas")
    fb = jax.jit(substep_blocked, static_argnums=2)
    fp = jax.jit(substep_pallas, static_argnums=2)
    sb, sp = db.state, dp.state
    for _ in range(20):
        sb = fb(sb, d3.params, db.config)
        sp = fp(sp, d3.params, dp.config)
    ib = np.argsort(np.asarray(sb.particles.ids))
    ip = np.argsort(np.asarray(sp.particles.ids))
    np.testing.assert_allclose(
        np.asarray(sb.particles.pos)[ib], np.asarray(sp.particles.pos)[ip],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sb.particles.vel)[ib], np.asarray(sp.particles.vel)[ip],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sb.particles.def_grad)[ib],
        np.asarray(sp.particles.def_grad)[ip],
        atol=1e-4,
    )
    assert (
        np.asarray(sb.particles.cdf_affinity)[ib]
        == np.asarray(sp.particles.cdf_affinity)[ip]
    ).all()
    np.testing.assert_allclose(
        np.asarray(sb.bodies.pos), np.asarray(sp.bodies.pos), atol=1e-6
    )


def test_pallas_matches_blocked_2d_coupled():
    """2D kernel family (ops/pallas_transfer2d.py) vs the blocked path."""
    d2 = scenes.sand_column_2d(nx=24, ny=48, cell_width=0.5)
    mk = lambda tr: MpmData(
        d2.params, d2.state.particles, d2.state.models, d2.bodies_desc, 0.5,
        grid=d2.config.grid, transfer=tr, group=128, job_chunk=8,
    )
    db, dp = mk("blocked"), mk("pallas")
    fb = jax.jit(substep_blocked, static_argnums=2)
    fp = jax.jit(substep_pallas, static_argnums=2)
    sb, sp = db.state, dp.state
    for _ in range(20):
        sb = fb(sb, d2.params, db.config)
        sp = fp(sp, d2.params, dp.config)
    ib = np.argsort(np.asarray(sb.particles.ids))
    ip = np.argsort(np.asarray(sp.particles.ids))
    np.testing.assert_allclose(
        np.asarray(sb.particles.pos)[ib], np.asarray(sp.particles.pos)[ip],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sb.particles.vel)[ib], np.asarray(sp.particles.vel)[ip],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sb.particles.def_grad)[ib],
        np.asarray(sp.particles.def_grad)[ip],
        atol=1e-4,
    )
    assert (
        np.asarray(sb.particles.cdf_affinity)[ib]
        == np.asarray(sp.particles.cdf_affinity)[ip]
    ).all()
    np.testing.assert_allclose(
        np.asarray(sb.bodies.pos), np.asarray(sp.bodies.pos), atol=1e-6
    )


def test_static_cdf_hoist_matches_per_substep():
    """step_pallas hoists fixed colliders' node CDF out of the substep scan
    (MpmConfig.static_slots, auto-inferred for zero-velocity 'fixed'
    bodies).  The hoisted partial + per-substep moving partial must merge
    to EXACTLY the all-colliders-every-substep result
    (cdf_channel.merge_node_cdf tie-break = lowest collider index)."""
    import dataclasses

    from wgsparkl_tpu.pipeline import step_pallas

    d3 = scenes.sand_box_3d(nxz=8, ny=16, cell_width=1.0)
    data = MpmData(
        d3.params, d3.state.particles, d3.state.models, d3.bodies_desc, 1.0,
        grid=d3.config.grid, transfer="pallas", group=256, job_chunk=8,
    )
    cfg = data.config
    assert cfg.static_slots, "sand_box_3d walls should be auto-inferred"
    cfg_off = dataclasses.replace(cfg, static_slots=())
    f = jax.jit(step_pallas, static_argnums=(2, 3))
    s_on = f(data.state, d3.params, cfg, 10)
    s_off = f(data.state, d3.params, cfg_off, 10)
    np.testing.assert_array_equal(
        np.asarray(s_on.particles.pos), np.asarray(s_off.particles.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(s_on.particles.cdf_affinity),
        np.asarray(s_off.particles.cdf_affinity),
    )
    np.testing.assert_array_equal(
        np.asarray(s_on.bodies.pos), np.asarray(s_off.bodies.pos)
    )


def test_static_cdf_hoist_2d_all_static():
    """2D twin of the hoist test: when EVERY collider is frame-static the
    whole channel grid packs once per frame (step_pallas static_chan);
    must equal the per-substep dense eval exactly."""
    import dataclasses

    from wgsparkl_tpu.pipeline import step_pallas

    d2 = scenes.elastic_blocks_2d(
        n_side=24, cell_width=0.5, transfer="pallas", group=128, job_chunk=8,
    )
    cfg = d2.config
    assert cfg.static_slots and len(cfg.static_slots) == cfg.num_colliders
    cfg_off = dataclasses.replace(cfg, static_slots=())
    f = jax.jit(step_pallas, static_argnums=(2, 3))
    s_on = f(d2.state, d2.params, cfg, 10)
    s_off = f(d2.state, d2.params, cfg_off, 10)
    np.testing.assert_array_equal(
        np.asarray(s_on.particles.pos), np.asarray(s_off.particles.pos)
    )
    np.testing.assert_array_equal(
        np.asarray(s_on.particles.cdf_affinity),
        np.asarray(s_off.particles.cdf_affinity),
    )


def test_pallas_by8_matches_blocked_3d_coupled():
    """Anisotropic 4x8x4 blocks (MpmConfig.by=8, the 1M-bench default)
    must match the isotropic blocked path exactly like by=4 does."""
    d3 = scenes.sand_box_3d(nxz=8, ny=16, cell_width=1.0)
    db = MpmData(
        d3.params, d3.state.particles, d3.state.models, d3.bodies_desc, 1.0,
        grid=d3.config.grid, transfer="blocked", group=256, job_chunk=8,
    )
    dp = MpmData(
        d3.params, d3.state.particles, d3.state.models, d3.bodies_desc, 1.0,
        grid=d3.config.grid, transfer="pallas", group=256, job_chunk=8,
        by=8,
    )
    fb = jax.jit(substep_blocked, static_argnums=2)
    fp = jax.jit(substep_pallas, static_argnums=2)
    sb, sp = db.state, dp.state
    for _ in range(20):
        sb = fb(sb, d3.params, db.config)
        sp = fp(sp, d3.params, dp.config)
    ib = np.argsort(np.asarray(sb.particles.ids))
    ip = np.argsort(np.asarray(sp.particles.ids))
    np.testing.assert_allclose(
        np.asarray(sb.particles.pos)[ib], np.asarray(sp.particles.pos)[ip],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sb.particles.vel)[ib], np.asarray(sp.particles.vel)[ip],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sb.particles.def_grad)[ib],
        np.asarray(sp.particles.def_grad)[ip],
        atol=1e-4,
    )
    assert (
        np.asarray(sb.particles.cdf_affinity)[ib]
        == np.asarray(sp.particles.cdf_affinity)[ip]
    ).all()
    np.testing.assert_allclose(
        np.asarray(sb.bodies.pos), np.asarray(sp.bodies.pos), atol=1e-6
    )


def test_pallas_16_colliders_affinity_bits():
    """16 colliders on the pallas path (reference cap, collide.wgsl:36).

    Round 3 capped pallas at 14: the f32-bitcast affinity word could form
    a NaN bit pattern (sign bits land in f32 bits 23-30) that poisoned the
    re-sort permute's one-hot matmuls.  The state now carries the word as
    two <=16-bit integer-valued f32 halves (pallas_transfer._paff_u32), so
    the full 16 slots must run and match the blocked path bit-exactly —
    including collider 15, whose affinity/sign occupy the extreme bits
    (15 and 31) of the word."""
    from wgsparkl_tpu.collision.shapes import Collider
    from wgsparkl_tpu.models import DruckerPrager, ElasticCoefficients
    from wgsparkl_tpu.models.drucker_prager import drucker_prager_arrays
    from wgsparkl_tpu.params import SimulationParams
    from wgsparkl_tpu.pipeline import RigidBodyDesc
    from wgsparkl_tpu.solver import Models, Particles

    cw = 1.0
    pos = scenes._lattice((8, 12, 8), cw, (-2.0, 1.2, -2.0))
    n = len(pos)
    particles = Particles.from_arrays(pos, density=2700.0, radius=cw / 4)
    elast = ElasticCoefficients.from_young_modulus(2.0e9, 0.2)
    dp = drucker_prager_arrays([DruckerPrager.new(2.0e9, 0.2)])
    dp = {k: np.full(n, v[0]) for k, v in dp.items()}
    models = Models.from_arrays(n, elast.lam, elast.mu, dp=dp)

    # 15 small balls scattered through the falling region (several inside
    # the sand so mid/high affinity bits actually set), floor LAST so its
    # affinity/sign occupy bits 15/31.
    rng = np.random.RandomState(7)
    bodies = []
    for k in range(15):
        c = rng.uniform((-2.5, 0.5, -2.5), (2.5, 4.0, 2.5))
        bodies.append(RigidBodyDesc(Collider.ball(0.55), tuple(c)))
    bodies.append(
        RigidBodyDesc(Collider.cuboid(40.0, 1.0, 40.0), (0.0, -1.0, 0.0))
    )
    params = SimulationParams.new(
        dt=(1.0 / 60.0) / 20, gravity=np.array([0.0, -9.81, 0.0])
    )
    bounds = (np.array([-8.0, -2.0, -8.0]), np.array([8.0, 12.0, 8.0]))
    mk = lambda tr: MpmData(
        params, particles, models, bodies, cw, grid_bounds=bounds,
        transfer=tr, group=128, job_chunk=8,
    )
    db, dp_ = mk("blocked"), mk("pallas")
    fb = jax.jit(substep_blocked, static_argnums=2)
    fp = jax.jit(substep_pallas, static_argnums=2)
    sb, sp = db.state, dp_.state
    for _ in range(25):
        sb = fb(sb, params, db.config)
        sp = fp(sp, params, dp_.config)
    ib = np.argsort(np.asarray(sb.particles.ids))
    ip = np.argsort(np.asarray(sp.particles.ids))
    aff_b = np.asarray(sb.particles.cdf_affinity)[ib]
    aff_p = np.asarray(sp.particles.cdf_affinity)[ip]
    assert (aff_b == aff_p).all()
    # collider 15 (the floor) must actually be touched: bit 15 set somewhere
    assert (aff_p & np.uint32(1 << 15)).any(), "floor affinity never set"
    # and several ball colliders too (mid bits, the old NaN-hazard zone)
    assert bin(int(np.bitwise_or.reduce(aff_p) & 0x7FFF)).count("1") >= 3
    np.testing.assert_allclose(
        np.asarray(sb.particles.pos)[ib], np.asarray(sp.particles.pos)[ip],
        atol=1e-5,
    )
    assert np.isfinite(np.asarray(sp.particles.pos)).all()


def test_pallas_chan_free_optin_matches_blocked(monkeypatch):
    """WGSPARKL_CHAN_FREE=1 (in-kernel analytic node CDF, off by default
    since the round-4 1M measurement: 54.5 vs 32.5 ms/substep) must stay
    bit-equivalent to the gathered-channel default and the blocked path."""
    monkeypatch.setenv("WGSPARKL_CHAN_FREE", "1")
    d3 = scenes.sand_box_3d(nxz=8, ny=16, cell_width=1.0)
    mk = lambda tr: MpmData(
        d3.params, d3.state.particles, d3.state.models, d3.bodies_desc, 1.0,
        grid=d3.config.grid, transfer=tr, group=256, job_chunk=8,
    )
    db, dp = mk("blocked"), mk("pallas")
    fb = jax.jit(substep_blocked, static_argnums=2)
    fp = jax.jit(substep_pallas, static_argnums=2)
    sb, sp = db.state, dp.state
    for _ in range(12):
        sb = fb(sb, d3.params, db.config)
        sp = fp(sp, d3.params, dp.config)
    ib = np.argsort(np.asarray(sb.particles.ids))
    ip = np.argsort(np.asarray(sp.particles.ids))
    np.testing.assert_allclose(
        np.asarray(sb.particles.pos)[ib], np.asarray(sp.particles.pos)[ip],
        atol=1e-5,
    )
    assert (
        np.asarray(sb.particles.cdf_affinity)[ib]
        == np.asarray(sp.particles.cdf_affinity)[ip]
    ).all()


def test_cdf_mode_auto_selection():
    """The construction-time CDF mode heuristic (pipeline._auto_chan_free):
    gathered whenever settling matter piles onto a collider (measured 54.5
    vs 32.5 ms/substep at 1M, round 4); chan-free when all analytic
    colliders sit clear of the gravity-downstream particle column and touch
    few blocks.  WGSPARKL_CHAN_FREE / the chan_free kwarg still force."""
    from wgsparkl_tpu.collision.shapes import Collider
    from wgsparkl_tpu.params import SimulationParams
    from wgsparkl_tpu.pipeline import RigidBodyDesc
    from wgsparkl_tpu.scenes import _lattice
    from wgsparkl_tpu.solver import Models, Particles

    # ground-plane scene (the flagship shape): matter settles ONTO the
    # floor -> most jobs end up within CDF reach -> gathered.
    d3 = scenes.sand_box_3d(nxz=8, ny=16, cell_width=1.0)
    m = MpmData(d3.params, d3.state.particles, d3.state.models,
                d3.bodies_desc, 1.0, grid=d3.config.grid, transfer="pallas",
                group=256, job_chunk=8)
    assert m.config.chan_free is False

    pos = _lattice((8, 8, 8), 1.0, (20.0, 40.0, 20.0))
    particles = Particles.from_arrays(pos, density=1000.0, radius=0.25)
    n = len(pos)
    models = Models.from_arrays(n, np.full(n, 1e5, np.float32),
                                np.full(n, 1e5, np.float32))
    params = SimulationParams.new(dt=1 / 1200, gravity=[0.0, -9.81, 0.0])
    gb = (np.array([0.0, 0.0, 0.0]), np.array([48.0, 56.0, 48.0]))

    # ball laterally clear of the falling column: never catches -> chan-free
    off = MpmData(params, particles, models,
                  [RigidBodyDesc(Collider.ball(1.5), (40.0, 30.0, 40.0))],
                  1.0, grid_bounds=gb, transfer="pallas", group=256,
                  job_chunk=8)
    assert off.config.chan_free is True

    # same ball directly under the column: catches -> gathered
    under = MpmData(params, particles, models,
                    [RigidBodyDesc(Collider.ball(1.5), (24.0, 30.0, 24.0))],
                    1.0, grid_bounds=gb, transfer="pallas", group=256,
                    job_chunk=8)
    assert under.config.chan_free is False

    # explicit kwarg wins over the heuristic
    forced = MpmData(params, particles, models,
                     [RigidBodyDesc(Collider.ball(1.5), (24.0, 30.0, 24.0))],
                     1.0, grid_bounds=gb, transfer="pallas", group=256,
                     job_chunk=8, chan_free=True, fold_vel=False)
    assert forced.config.chan_free is True and forced.config.fold_vel is False
