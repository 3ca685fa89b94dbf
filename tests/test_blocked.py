"""Blocked (MXU-tiled) transfer path vs the dense reference path.

The blocked engine (ops/blocked*.py) must reproduce the dense pipeline
bit-closely: same physics, different parallel decomposition — the same
relationship as the reference's shared-memory block kernels to a naive
per-particle scatter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wgsparkl_tpu.collision.shapes import Collider
from wgsparkl_tpu.models import DruckerPrager, ElasticCoefficients
from wgsparkl_tpu.models.drucker_prager import drucker_prager_arrays
from wgsparkl_tpu.params import SimulationParams
from wgsparkl_tpu.pipeline import (
    MpmData,
    RigidBodyDesc,
    substep,
    substep_blocked,
)
from wgsparkl_tpu.solver import Models, Particles


def _scene_3d(with_bodies=True):
    h = 0.5
    rng = np.random.default_rng(0)
    xs = np.arange(8) * h / 2 + h / 4
    g = np.meshgrid(xs, xs + 1.0, xs, indexing="ij")
    pos = (
        np.stack([a.ravel() for a in g], -1)
        + rng.uniform(-0.05 * h, 0.05 * h, (512, 3))
    ).astype(np.float32)
    parts = Particles.from_arrays(pos, density=1500.0, radius=h / 4)
    m = ElasticCoefficients.from_young_modulus(1e6, 0.2)
    dp = drucker_prager_arrays([DruckerPrager.new(1e6, 0.2)] * 512)
    models = Models.from_arrays(
        512, m.lam, m.mu, dp={k: jnp.asarray(v) for k, v in dp.items()}
    )
    params = SimulationParams.new(dt=1 / 600, gravity=[0.0, -9.81, 0.0])
    bodies = []
    if with_bodies:
        bodies = [
            RigidBodyDesc(Collider.cuboid(10.0, 0.5, 10.0), (1.0, -0.5, 1.0)),
            RigidBodyDesc(
                Collider.ball(0.8), (1.0, 0.3, 1.0), body_type="dynamic",
                density=500.0,
            ),
        ]
    bounds = (np.array([-2.0, -1.0, -2.0]), np.array([4.0, 4.0, 4.0]))
    # body_contacts off: the dynamic ball starts deep in the floor and the
    # stiff contact bias would amplify the paths' fp roundoff differences —
    # this test isolates transfer-path equivalence (contacts: test_contacts).
    make = lambda **kw: MpmData(
        params, parts, models, bodies, cell_width=h, grid_bounds=bounds,
        body_contacts=False, **kw
    )
    return make(), make(transfer="blocked", group=64, job_chunk=8)


@pytest.mark.parametrize("with_bodies", [False, True])
def test_blocked_matches_dense_3d(with_bodies):
    dd, db = _scene_3d(with_bodies)
    fd = jax.jit(substep, static_argnums=2)
    fb = jax.jit(substep_blocked, static_argnums=2)
    sd, sb = dd.state, db.state
    for _ in range(30):
        sd = fd(sd, dd.params, dd.config)
        sb = fb(sb, db.params, db.config)
    ids = np.asarray(sb.particles.ids)
    np.testing.assert_allclose(
        np.asarray(sd.particles.pos)[ids], np.asarray(sb.particles.pos), atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(sd.particles.vel)[ids], np.asarray(sb.particles.vel), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(sd.particles.def_grad)[ids],
        np.asarray(sb.particles.def_grad),
        atol=5e-5,
    )
    assert (
        np.asarray(sd.particles.cdf_affinity)[ids]
        == np.asarray(sb.particles.cdf_affinity)
    ).all()
    if with_bodies:
        np.testing.assert_allclose(
            np.asarray(sd.bodies.pos), np.asarray(sb.bodies.pos), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sd.bodies.linvel), np.asarray(sb.bodies.linvel), atol=1e-6
        )


def test_blocked_job_overflow_is_safe():
    """More jobs than max_jobs: overflow jobs are dropped, no crash/NaN
    (explicit version of the reference's silent hashmap overflow,
    grid.wgsl:126-129)."""
    dd, db = _scene_3d(False)
    import dataclasses

    cfg = dataclasses.replace(db.config, max_jobs=8, job_chunk=8, group=64)
    fb = jax.jit(substep_blocked, static_argnums=2)
    sb = db.state
    for _ in range(3):
        sb = fb(sb, db.params, cfg)
    assert np.isfinite(np.asarray(sb.particles.pos)).all()
