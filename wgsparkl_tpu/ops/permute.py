"""Banded lane permutation for the per-substep particle re-sort.

The re-sort permutation at the heart of the sort phase (grid.rs:30-206 role)
is NEARLY BANDED: particles drift << 1 block/substep, so when the block-key
order breaks, 99.8%+ of rows land within a few hundred ranks of where they
already are (measured p99 disp ~200 at 1M particles; only block changers
crossing a slow flat-order axis jump far).  A general XLA row/lane gather
serializes per index (~54 ns/row -> ~54 ms at 1M x 56 channels); this module
instead:

  * applies the in-band part of the permutation with one Pallas kernel:
    per 256-lane output chunk, a [3*256, 256] one-hot built in VMEM from the
    permutation (never materialized to HBM) contracts against a DMA'd
    [C, 3*256] source slab on the MXU — out[:, i] = rows[:, perm[i]];
  * patches the few far movers (|perm[i] - i| > band) with a small XLA
    lane scatter from a compacted exception list;
  * falls back to the full XLA gather under lax.cond when the exception
    list overflows (arbitrary permutations stay exact).

State rides CHANNEL-MAJOR [C, N] throughout — the same layout the transfer
kernels consume — so the permutation is a lane move with f32-exact one-hot
matmuls (0/1 weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


CHUNK = 256  # output lanes per program (also the displacement band)


def _permute_kernel(perm_ref, rows_hbm, out_ref, slab_db, sem,
                    *, npad: int, c0: int):
    """Program g writes out[:, g*C:(g+1)*C] = rows[:, perm[g*C:(g+1)*C]]
    for in-band perm entries (others produce zero columns)."""
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    c = CHUNK
    w = min(3 * c, npad)

    def slab_start(gg):
        # all values are multiples of CHUNK (npad and w are too); the hint
        # lets Mosaic prove the lane-dim DMA offset is 128-aligned.
        return pl.multiple_of(jnp.clip((gg - 1) * c, 0, npad - w), 128)

    def dma_for(gg, slot):
        s = slab_start(jnp.minimum(gg, ng - 1))
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(s, w)], slab_db.at[slot], sem.at[slot]
        )

    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    @pl.when(g == 0)
    def _():
        dma_for(g, slot).start()

    @pl.when(g + 1 < ng)
    def _():
        dma_for(g + 1, nslot).start()

    dma_for(g, slot).wait()

    s = slab_start(g)
    rel = perm_ref[0][None, :] - s                                # [1, C]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (w, c), 0)
    onehot = (rel == k_iota).astype(jnp.float32)                  # [W, C]
    out_ref[:, :] = jax.lax.dot_general(
        slab_db[slot], onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _permute_banded(rows, perm_p, npad: int):
    c0 = rows.shape[0]
    ng = npad // CHUNK
    kernel = functools.partial(_permute_kernel, npad=npad, c0=c0)
    return pl.pallas_call(
        kernel,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((c0, CHUNK), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c0, npad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, c0, min(3 * CHUNK, npad)), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(perm_p.reshape(1, npad), rows)


EMAX_LEVELS = (2048, 16384, 65536, 262144)


def permute_lanes(rows, perm, emax: int = 262144):
    """rows[:, perm] for a [C, NPAD] channel matrix, exact for any perm.

    rows: [C, NPAD] f32 (NPAD a multiple of 256); perm: [NPAD] int32 with
    values in [0, NPAD).  Fast banded path + exception patch (the patch
    capacity is switched at runtime between EMAX_LEVELS so the common case
    — a few hundred far movers — pays a tiny gather/scatter, while
    mass-motion phases with tens of thousands still avoid the serialized
    full gather); full-gather fallback beyond the largest level.
    """
    c0, npad = rows.shape
    assert npad % CHUNK == 0, (npad, CHUNK)
    iota = jnp.arange(npad, dtype=jnp.int32)
    disp = jnp.abs(perm - iota)
    flag = disp > CHUNK
    n_exc = jnp.sum(flag.astype(jnp.int32))
    levels = tuple(e for e in EMAX_LEVELS if e <= emax) or (emax,)

    def banded(rows):
        out = _permute_banded(rows, perm, npad)
        # Far movers: compact (sorted) exception positions, lane-gather the
        # source columns, lane-scatter into place.
        keys = jnp.where(flag, iota, npad)
        exc_sorted = jax.lax.sort(keys)

        def patch(cap):
            def br(out):
                exc_pos = exc_sorted[:cap]
                valid = exc_pos < npad
                src = perm[jnp.where(valid, exc_pos, 0)]
                exc_cols = jnp.take(rows, src, axis=1)         # [C, cap]
                idx = jnp.where(valid, exc_pos, npad)          # pad -> drop
                return out.at[:, idx].set(exc_cols, mode="drop")

            return br

        level = sum((n_exc > e).astype(jnp.int32) for e in levels[:-1])
        return jax.lax.switch(level, [patch(e) for e in levels], out)

    def full(rows):
        # Row-major gather (serialized per index, but each index moves a
        # whole 4*C-byte row) — the minor-axis take form is ~10x slower.
        return jnp.take(rows.T, perm, axis=0).T

    return jax.lax.cond(n_exc <= levels[-1], banded, full, rows)
