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
