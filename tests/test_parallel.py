"""SPMD particle-sharded stepping on the 8-device virtual CPU mesh."""

import numpy as np

import jax
from jax.sharding import Mesh

from wgsparkl_tpu import scenes
from wgsparkl_tpu.parallel import make_sharded_step, shard_state
from wgsparkl_tpu.pipeline import MpmData, step


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    data = scenes.sand_box_3d(nxz=4, ny=16, cell_width=1.0)
    assert data.num_particles % 8 == 0

    # Single-device reference.
    ref = jax.jit(
        lambda s, p: step(s, p, data.config, num_substeps=3)
    )(data.state, data.params)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    sharded = shard_state(data.state, mesh)
    stepper = make_sharded_step(data.config, mesh, num_substeps=3)
    out = stepper(sharded, data.params)

    np.testing.assert_allclose(
        np.asarray(out.particles.pos), np.asarray(ref.particles.pos), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.particles.vel), np.asarray(ref.particles.vel), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.bodies.pos), np.asarray(ref.bodies.pos), atol=1e-6
    )


def test_sharded_pallas_matches_single_device():
    """The FAST path under shard_map: 12 substeps (enough motion to force
    per-shard re-sorts and job-table rebuilds), pallas transfer kernels in
    interpret mode, vs the same config on one device."""
    assert len(jax.devices()) >= 8
    base = scenes.sand_box_3d(nxz=4, ny=16, cell_width=1.0)
    data = MpmData(
        base.params, base.state.particles, base.state.models,
        base.bodies_desc, 1.0, grid=base.config.grid,
        transfer="pallas", group=64, job_chunk=8,
    )
    assert data.num_particles % 8 == 0

    ref = jax.jit(
        lambda s, p: step(s, p, data.config, num_substeps=12)
    )(data.state, data.params)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    sharded = shard_state(data.state, mesh)
    stepper = make_sharded_step(data.config, mesh, num_substeps=12)
    out = stepper(sharded, data.params)

    # Each shard re-sorts its own particles: compare by identity.
    ir = np.argsort(np.asarray(ref.particles.ids))
    io = np.argsort(np.asarray(out.particles.ids))
    np.testing.assert_allclose(
        np.asarray(out.particles.pos)[io],
        np.asarray(ref.particles.pos)[ir], atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.particles.vel)[io],
        np.asarray(ref.particles.vel)[ir], atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out.bodies.pos), np.asarray(ref.bodies.pos), atol=1e-6
    )


def test_checkpoint_roundtrip(tmp_path):
    from wgsparkl_tpu.utils import checkpoint

    data = scenes.sand_box_3d(nxz=4, ny=8, cell_width=1.0)
    stepper = jax.jit(lambda s, p: step(s, p, data.config, num_substeps=2))
    state = stepper(data.state, data.params)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, state, extra={"frame": 7})
    loaded, extra = checkpoint.load(path, data.state)
    assert extra["frame"] == 7
    np.testing.assert_array_equal(
        np.asarray(loaded.particles.pos), np.asarray(state.particles.pos)
    )
    # Resume: stepping the loaded state matches stepping the original.
    a = stepper(state, data.params)
    b = stepper(loaded, data.params)
    np.testing.assert_allclose(
        np.asarray(a.particles.pos), np.asarray(b.particles.pos), atol=1e-7
    )


def test_health_diagnostics():
    from wgsparkl_tpu.utils import diagnostics

    data = scenes.sand_box_3d(nxz=4, ny=8, cell_width=1.0)
    rep = diagnostics.check(data)
    assert rep.ok and rep.out_of_grid == 0 and rep.non_finite == 0

    # Blocked config with absurdly small job capacity must flag overflow.
    from wgsparkl_tpu.pipeline import MpmData

    data2 = MpmData(
        data.params, data.state.particles, data.state.models,
        data.bodies_desc, 1.0, grid=data.config.grid,
        transfer="blocked", group=64, max_jobs=1, job_chunk=1,
    )
    rep2 = diagnostics.check(data2)
    assert rep2.job_overflow and not rep2.ok
    assert "OVERFLOW" in rep2.summary()
