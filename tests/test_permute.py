"""Banded lane-permutation op (ops/permute.py): exactness for near-sorted,
adversarial, and overflow permutations (kernel runs in interpret mode on CPU).
"""

import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.ops.permute import CHUNK, permute_lanes


def _check(perm, c0=56, emax=64):
    npad = perm.shape[0]
    rng = np.random.default_rng(npad + c0)
    rows = jnp.asarray(rng.normal(size=(c0, npad)).astype(np.float32))
    out = np.asarray(permute_lanes(rows, jnp.asarray(perm), emax=emax))
    ref = np.asarray(rows)[:, perm]
    np.testing.assert_array_equal(out, ref)


def test_identity():
    _check(np.arange(2 * CHUNK, dtype=np.int32))


def test_near_sorted_with_far_movers():
    n = 4 * CHUNK
    rng = np.random.default_rng(0)
    # local jitter within the band
    keys = np.arange(n) + rng.integers(-40, 40, size=n)
    perm = np.argsort(keys, kind="stable").astype(np.int32)
    # a handful of far movers (swap distant elements)
    for a, b in [(3, n - 7), (CHUNK + 5, 3 * CHUNK + 9), (0, n - 1)]:
        perm[[a, b]] = perm[[b, a]]
    _check(perm)


def test_reverse_triggers_fallback():
    n = 2 * CHUNK
    perm = np.arange(n, dtype=np.int32)[::-1].copy()
    _check(perm, emax=16)  # way more than 16 far movers -> full-gather path


def test_block_sort_like():
    # realistic: sort keys with ~10% random block changes
    n = 8 * CHUNK
    rng = np.random.default_rng(1)
    keys = np.sort(rng.integers(0, 200, size=n))
    movers = rng.random(n) < 0.1
    keys = keys + movers * rng.integers(-2, 3, size=n)
    perm = np.argsort(keys, kind="stable").astype(np.int32)
    _check(perm, emax=n // 2)


def test_mass_far_movers_dense_chunks():
    """Block-crosser pattern: whole runs jump ~n/2 ranks (like particles
    crossing a slow sort-axis face).  Exercises the in-kernel exception
    slabs at near-full per-chunk occupancy and 128-misaligned segment
    starts."""
    n = 8 * CHUNK
    perm = np.arange(n, dtype=np.int32)
    # move a 300-lane run from the far end into lanes 100..400 (spans
    # chunk boundaries; per-chunk exception counts up to 256)
    moved = np.arange(n - 300, n, dtype=np.int32)
    rest = np.setdiff1d(perm, moved, assume_unique=True)
    perm = np.concatenate([rest[:100], moved, rest[100:]]).astype(np.int32)
    _check(perm, emax=2048)


def test_global_drift_stays_banded():
    """Locally-smooth but globally-drifting permutations (mass settling
    compacts ranks cumulatively; a rotation is the extreme case) must ride
    the shift-aware slab, NOT the exception path / full fallback: with
    emax=512 only the wrap chunk's lanes may be exceptions."""
    n = 8 * CHUNK
    perm = ((np.arange(n) + 1037) % n).astype(np.int32)
    _check(perm, emax=512)


def test_drift_with_jitter_and_far_movers():
    n = 8 * CHUNK
    rng = np.random.default_rng(3)
    base = (np.arange(n) * 0.83).astype(np.int64)  # cumulative compaction
    keys = base + rng.integers(-30, 30, size=n)
    perm = np.argsort(keys, kind="stable").astype(np.int32)
    for a, b in [(5, n - 11), (CHUNK + 2, 6 * CHUNK + 77)]:
        perm[[a, b]] = perm[[b, a]]
    _check(perm, emax=2048)


def test_exception_level_boundaries():
    n = 16 * CHUNK
    rng = np.random.default_rng(7)
    perm = np.arange(n, dtype=np.int32)
    # ~600 scattered far swaps -> crosses the smallest patch level
    for _ in range(600):
        a, b = rng.integers(0, n, size=2)
        perm[[a, b]] = perm[[b, a]]
    _check(perm, emax=4096)


def test_mixed_shift_and_scramble_chunks():
    """Pure-shift chunks (the kernel's roll fast path, 81% of chunks at the
    settled 1M bench) interleaved with in-band scrambled chunks and far
    movers: every path in one permutation."""
    n = 8 * CHUNK
    rng = np.random.default_rng(11)
    perm = np.arange(n, dtype=np.int32)
    # chunks 0-1: shift by +37 into chunk 2's range; chunk 2 absorbs the
    # displaced run (scrambled); chunks 4-5 shift by -64; chunk 6 scrambled
    base = np.arange(n) + np.where(np.arange(n) < 2 * CHUNK, 37,
                                   np.where(np.arange(n) >= 4 * CHUNK, -64, 0))
    keys = base.astype(np.int64)
    sc = slice(2 * CHUNK, 3 * CHUNK)
    keys[sc] = keys[sc][rng.permutation(CHUNK)]
    sc2 = slice(6 * CHUNK, 7 * CHUNK)
    keys[sc2] = keys[sc2][rng.permutation(CHUNK)]
    perm = np.argsort(keys, kind="stable").astype(np.int32)
    # two far movers
    perm[[3, n - 5]] = perm[[n - 5, 3]]
    _check(perm, emax=2048)
