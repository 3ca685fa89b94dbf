"""Material-table layout (Models.mat_table / MpmConfig.n_materials).

The pallas row matrix carries a material ID instead of the 11 immutable
per-particle constants (ops/pallas_transfer.py MTAB_* rows); these tests
pin the dedup + in-kernel lookup against the dense path, which still reads
the full per-particle arrays (models/mod.rs:12-50 parity surface)."""

import numpy as np

import jax
import jax.numpy as jnp

from wgsparkl_tpu import scenes
from wgsparkl_tpu.pipeline import MpmData, substep, substep_pallas
from wgsparkl_tpu.solver import attach_material_table


def _mixed_scene():
    """sand_box scene with THREE distinct materials striped by particle."""
    base = scenes.sand_box_3d(nxz=8, ny=16, cell_width=1.0)
    p, m = base.state.particles, base.state.models
    n = p.count
    stripe = np.arange(n) % 3
    lam = np.asarray(m.lam).copy()
    mu = np.asarray(m.mu).copy()
    stretch = np.asarray(m.max_stretch).copy()
    lam[stripe == 1] *= 2.0
    mu[stripe == 2] *= 0.5
    stretch[stripe == 1] = 4.0
    m = m.replace(
        lam=jnp.asarray(lam), mu=jnp.asarray(mu),
        max_stretch=jnp.asarray(stretch),
    )
    return base, p, m


def test_attach_material_table_dedup():
    base, p, m = _mixed_scene()
    m2, n_mat = attach_material_table(p, m)
    assert n_mat == 3
    mid = np.asarray(m2.mat_id).astype(np.int64)
    tab = np.asarray(m2.mat_table)
    # Reconstruction by id must reproduce every per-particle constant.
    np.testing.assert_array_equal(tab[0, mid], np.asarray(m.lam))
    np.testing.assert_array_equal(tab[1, mid], np.asarray(m.mu))
    np.testing.assert_array_equal(tab[8, mid], np.asarray(m.max_stretch))
    np.testing.assert_array_equal(tab[9, mid], np.asarray(p.init_volume))
    np.testing.assert_array_equal(tab[10, mid], np.asarray(p.init_radius))


def test_multi_material_pallas_matches_dense():
    """3 materials through 10 coupled pallas substeps vs the dense path
    (which carries full per-particle constant arrays)."""
    base, p, m = _mixed_scene()
    dd = MpmData(base.params, p, m, base.bodies_desc, 1.0,
                 grid=base.config.grid, transfer="dense")
    dp = MpmData(base.params, p, m, base.bodies_desc, 1.0,
                 grid=base.config.grid, transfer="pallas", group=128,
                 job_chunk=8)
    assert dp.config.n_materials == 3
    fd = jax.jit(substep, static_argnums=2)
    fp = jax.jit(substep_pallas, static_argnums=2)
    sd, sp = dd.state, dp.state
    for _ in range(10):
        sd = fd(sd, base.params, dd.config)
        sp = fp(sp, base.params, dp.config)
    i_d = np.argsort(np.asarray(sd.particles.ids))
    i_p = np.argsort(np.asarray(sp.particles.ids))
    np.testing.assert_allclose(
        np.asarray(sd.particles.pos)[i_d],
        np.asarray(sp.particles.pos)[i_p], atol=1e-5,
    )
    # Constants reconstructed from the table must match the originals
    # bit-exactly, in the permuted order.
    np.testing.assert_array_equal(
        np.asarray(sd.models.lam)[i_d], np.asarray(sp.models.lam)[i_p]
    )
    np.testing.assert_array_equal(
        np.asarray(sd.models.max_stretch)[i_d],
        np.asarray(sp.models.max_stretch)[i_p],
    )
    np.testing.assert_array_equal(
        np.asarray(sd.particles.init_volume)[i_d],
        np.asarray(sp.particles.init_volume)[i_p],
    )
