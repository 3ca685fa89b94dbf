"""Banded tile gather/scatter (ops/blocked.py) vs the full one-hot matmul
variants: bit-exact equality whenever band_info reports bands_ok, and the
auto dispatchers fall back correctly when it doesn't."""

import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.ops import blocked as bk


def _mk(nb, j, cj, seed, spread):
    """Random sorted job-block table with a dead tail + ghost jobs."""
    rng = np.random.default_rng(seed)
    nb_total = int(np.prod(nb))
    live = j - cj  # one dead chunk at the end
    blocks = np.sort(rng.integers(0, min(spread, nb_total), size=live))
    blocks = np.concatenate([blocks, np.full(cj, nb_total)]).astype(np.int32)
    grid = rng.normal(size=(nb_total + 1, 4, 4, 4, 5)).astype(np.float32)
    grid[-1] = 0.0
    grid[-1, ..., 2] = -1.0  # ghost sentinel channel
    tiles = rng.normal(size=(j, 6, 6, 6, 5)).astype(np.float32)
    return jnp.asarray(blocks), jnp.asarray(grid), jnp.asarray(tiles), nb_total


def test_banded_matches_full():
    nb = (6, 7, 6)
    j, cj, band = 64, 8, 32
    blocks, grid, tiles, nb_total = _mk(nb, j, cj, 0, spread=24)
    nbr = jnp.asarray(bk.neighbor_block_table(nb))
    lo, ok = bk.band_info(blocks, nb_total, band, cj)
    assert bool(ok)

    g_full = bk.gather_tiles_mm(grid, blocks, nbr, 3)
    g_band = bk.gather_tiles_banded(grid, blocks, lo, nb, 3, band, cj)
    np.testing.assert_array_equal(np.asarray(g_full), np.asarray(g_band))

    s_full = bk.scatter_tiles_mm(jnp.zeros_like(grid), tiles, blocks, nbr, 3)
    s_band = bk.scatter_tiles_banded(
        jnp.zeros_like(grid), tiles, blocks, lo, nb, 3, band, cj
    )
    # ghost row (discarded downstream) intentionally differs: banded drops
    # ghost-target contributions; non-ghost rows agree to f32 roundoff
    # (chunked accumulation order differs from the single full matmul).
    np.testing.assert_allclose(
        np.asarray(s_full)[:-1], np.asarray(s_band)[:-1], atol=2e-5
    )


def test_banded_window_mode_matches_full():
    """out=(wpad, cpad) gather + win=True scatter — the hot pallas-path
    forms (octant-STACKED selection dots) vs the unchanged mm variants.
    Gather must be bit-exact; scatter non-ghost rows f32-roundoff-class
    (the stacked K accumulation reassociates the octant sum)."""
    nb = (6, 7, 6)
    j, cj, band = 64, 8, 32
    blocks, grid, tiles, nb_total = _mk(nb, j, cj, 3, spread=24)
    nbr = jnp.asarray(bk.neighbor_block_table(nb))
    lo, ok = bk.band_info(blocks, nb_total, band, cj)
    assert bool(ok)
    wpad, cpad = 224, 8  # window (6,6,6)=216 rows, grid c=5 channels

    g_full = bk.gather_tiles_mm(grid, blocks, nbr, 3, out=(wpad, cpad))
    g_band = bk.gather_tiles_banded(
        grid, blocks, lo, nb, 3, band, cj, out=(wpad, cpad)
    )
    np.testing.assert_array_equal(np.asarray(g_full), np.asarray(g_band))

    rng = np.random.default_rng(4)
    wt = jnp.asarray(rng.normal(size=(j, wpad, cpad)).astype(np.float32))
    s_full = bk.scatter_tiles_mm(
        jnp.zeros_like(grid), wt, blocks, nbr, 3, win=True
    )
    s_band = bk.scatter_tiles_banded(
        jnp.zeros_like(grid), wt, blocks, lo, nb, 3, band, cj, win=True
    )
    np.testing.assert_allclose(
        np.asarray(s_full)[:-1], np.asarray(s_band)[:-1], atol=2e-5
    )


def test_banded_window_mode_2d():
    nb = (8, 9)
    j, cj, band = 32, 8, 24
    rng = np.random.default_rng(5)
    nb_total = int(np.prod(nb))
    blocks = np.sort(rng.integers(0, 20, size=j - 8))
    blocks = np.concatenate([blocks, np.full(8, nb_total)]).astype(np.int32)
    grid = rng.normal(size=(nb_total + 1, 8, 8, 3)).astype(np.float32)
    grid[-1] = 0.0
    blocks, grid = map(jnp.asarray, (blocks, grid))
    nbr = jnp.asarray(bk.neighbor_block_table(nb))
    lo, ok = bk.band_info(blocks, nb_total, band, cj)
    assert bool(ok)
    wpad, cpad = 104, 4  # window (10,10)=100 rows, c=3

    g_full = bk.gather_tiles_mm(grid, blocks, nbr, 2, out=(wpad, cpad))
    g_band = bk.gather_tiles_banded(
        grid, blocks, lo, nb, 2, band, cj, out=(wpad, cpad)
    )
    np.testing.assert_array_equal(np.asarray(g_full), np.asarray(g_band))

    wt = jnp.asarray(rng.normal(size=(j, wpad, cpad)).astype(np.float32))
    s_full = bk.scatter_tiles_mm(
        jnp.zeros_like(grid), wt, blocks, nbr, 2, win=True
    )
    s_band = bk.scatter_tiles_banded(
        jnp.zeros_like(grid), wt, blocks, lo, nb, 2, band, cj, win=True
    )
    np.testing.assert_allclose(
        np.asarray(s_full)[:-1], np.asarray(s_band)[:-1], atol=2e-5
    )


def test_per_chunk_two_level_matches_full():
    """Mixed chunk spans (splash-phase shape): fitting chunks ride the
    narrow band, wide chunks take the per-chunk full-grid matmul — the
    auto dispatchers with a PER-CHUNK ok vector must match the full mm
    variants without any global fallback."""
    nb = (6, 7, 6)
    nb_total = int(np.prod(nb))
    j, cj, band = 64, 8, 32
    rng = np.random.default_rng(6)
    # chunks 0-3 narrow (ids 0..23), chunk 4 WIDE (spread over the whole
    # table), chunk 5 narrow again, 6 wide, 7 dead (all-ghost)
    blocks = np.concatenate([
        np.sort(rng.integers(0, 24, size=4 * cj)),
        np.sort(rng.integers(0, nb_total, size=cj)),
        np.sort(rng.integers(100, 120, size=cj)),
        np.sort(rng.integers(0, nb_total, size=cj)),
        np.full(cj, nb_total),
    ]).astype(np.int32)
    grid = rng.normal(size=(nb_total + 1, 4, 4, 4, 5)).astype(np.float32)
    grid[-1] = 0.0
    grid[-1, ..., 2] = -1.0
    blocks, grid = map(jnp.asarray, (blocks, grid))
    nbr = jnp.asarray(bk.neighbor_block_table(nb))
    lo, okc = bk.band_info_chunks(blocks, nb_total, band, cj)
    okc_np = np.asarray(okc)
    assert okc_np.sum() not in (0, len(okc_np)), "want a genuine mix"
    wpad, cpad = 224, 8

    g_full = bk.gather_tiles_mm(grid, blocks, nbr, 3, out=(wpad, cpad))
    g_two = bk.gather_tiles_auto(
        grid, blocks, lo, okc, nbr, nb, 3, band, cj, out=(wpad, cpad)
    )
    np.testing.assert_array_equal(np.asarray(g_full), np.asarray(g_two))

    wt = jnp.asarray(rng.normal(size=(j, wpad, cpad)).astype(np.float32))
    s_full = bk.scatter_tiles_mm(
        jnp.zeros_like(grid), wt, blocks, nbr, 3, win=True
    )
    s_two = bk.scatter_tiles_auto(
        jnp.zeros_like(grid), wt, blocks, lo, okc, nbr, nb, 3, band, cj,
        win=True,
    )
    np.testing.assert_allclose(
        np.asarray(s_full)[:-1], np.asarray(s_two)[:-1], atol=2e-5
    )


def test_auto_falls_back_when_band_exceeded():
    nb = (6, 7, 6)
    j, cj, band = 64, 8, 4  # tiny band: chunks exceed it
    blocks, grid, tiles, nb_total = _mk(nb, j, cj, 1, spread=200)
    nbr = jnp.asarray(bk.neighbor_block_table(nb))
    lo, ok = bk.band_info(blocks, nb_total, band, cj)
    assert not bool(ok)

    g_auto = bk.gather_tiles_auto(
        grid, blocks, lo, ok, nbr, nb, 3, band, cj
    )
    g_full = bk.gather_tiles_mm(grid, blocks, nbr, 3)
    np.testing.assert_array_equal(np.asarray(g_auto), np.asarray(g_full))

    s_auto = bk.scatter_tiles_auto(
        jnp.zeros_like(grid), tiles, blocks, lo, ok, nbr, nb, 3, band, cj
    )
    s_full = bk.scatter_tiles_mm(jnp.zeros_like(grid), tiles, blocks, nbr, 3)
    np.testing.assert_array_equal(np.asarray(s_auto), np.asarray(s_full))


def test_banded_2d():
    nb = (8, 9)
    j, cj, band = 32, 8, 24
    rng = np.random.default_rng(2)
    nb_total = int(np.prod(nb))
    blocks = np.sort(rng.integers(0, 20, size=j - 8))
    blocks = np.concatenate([blocks, np.full(8, nb_total)]).astype(np.int32)
    grid = rng.normal(size=(nb_total + 1, 8, 8, 3)).astype(np.float32)
    grid[-1] = 0.0
    tiles = rng.normal(size=(j, 10, 10, 3)).astype(np.float32)
    blocks, grid, tiles = map(jnp.asarray, (blocks, grid, tiles))
    nbr = jnp.asarray(bk.neighbor_block_table(nb))
    lo, ok = bk.band_info(blocks, nb_total, band, cj)
    assert bool(ok)
    g_full = bk.gather_tiles_mm(grid, blocks, nbr, 2)
    g_band = bk.gather_tiles_banded(grid, blocks, lo, nb, 2, band, cj)
    np.testing.assert_array_equal(np.asarray(g_full), np.asarray(g_band))
    s_full = bk.scatter_tiles_mm(jnp.zeros_like(grid), tiles, blocks, nbr, 2)
    s_band = bk.scatter_tiles_banded(
        jnp.zeros_like(grid), tiles, blocks, lo, nb, 2, band, cj
    )
    np.testing.assert_allclose(
        np.asarray(s_full)[:-1], np.asarray(s_band)[:-1], atol=2e-5
    )
