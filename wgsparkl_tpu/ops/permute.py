"""Banded lane permutation for the per-substep particle re-sort.

The re-sort permutation at the heart of the sort phase (grid.rs:30-206 role)
is NEARLY BANDED: particles drift << 1 block/substep, so when the block-key
order breaks, 99%+ of rows land within a few hundred ranks of where they
already are.  The far movers that remain are block-crossers on a slow
sort-key axis: measured at 1M particles they jump ~1e5 ranks (a whole
y-column of blocks), so no practical band can cover them.  A general XLA
row/lane gather serializes per index (~54 ns/row -> ~54 ms at 1M x 56
channels), and an XLA lane scatter patching the far movers costs ~150 ns
per (channel, lane) 4-byte write; this module instead does everything with
one Pallas kernel pass:

  * in-band part: per 256-lane output chunk, a [WMULT*256, 256] one-hot
    built in VMEM from the permutation (never materialized to HBM)
    contracts against a DMA'd [C, WMULT*256] source slab on the MXU —
    out[:, i] = rows[:, perm[i]].  The slab is SHIFT-AWARE: its start is
    the chunk's mean source rank minus half the slab (128-aligned), so
    cumulative rank drift (global compaction during settling) stays
    in-band and only the spread within a chunk matters;
  * far movers (perm outside the chunk's slab): their lanes are ranked in
    output order, so the exceptions landing in chunk g form one contiguous
    segment of that ranking of length <= 256 (a chunk only has 256 lanes).
    XLA pre-gathers the exception source columns once ([C, cap] take) and
    hands the kernel each lane's exception rank (einv, -1 for in-band
    lanes); the kernel DMAs the chunk's 512-wide column slab and applies
    it with a second one-hot matmul.  No XLA scatter, no serialized
    writes;
  * the static exception capacity is switched at runtime between
    EMAX_LEVELS so the common case pays a small XLA take; a full-gather
    fallback keeps arbitrary permutations exact beyond the largest level.

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

from wgsparkl_tpu.ops.blocked import sel3_dot_mstack
from wgsparkl_tpu.ops.compact import compact_flagged


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Output lanes per program (also the displacement band).  At 1M lanes the
# 256-lane width runs 4096 sequential programs whose per-program cost
# (grid sequencing + DMA issue) dominates.  512 is the measured default:
# with the pure-shift class + leveled exceptions the wider chunk WINS
# (round-5 batch 6, 1M: 256 -> 34.78, 512 -> 35.38, 1024 -> 35.32
# steps/s; the old pre-shift-class A/Bs had 512/1024 LOSING, 30.4/28.6 —
# the class split changed the tradeoff).  WGSPARKL_PERM_CHUNK overrides.
import os as _os  # noqa: E402

CHUNK = int(_os.environ.get("WGSPARKL_PERM_CHUNK", "512"))
assert CHUNK % 256 == 0, CHUNK
WMULT = 3    # slab chunks: covers source ranks [(g-1)C, (g+2)C).  WMULT=2
             # was measured 27.7 -> 18.1 steps/s at 1M: forward movers with
             # disp in (C, 2C) are common mid-frame and overflow the
             # exception levels; the wider slab is cheaper than their take.
EXCW = CHUNK + 256   # exception slab width (>= 128-align slack + CHUNK/chunk)
NARROW = (3 * CHUNK) // 2  # narrow-slab width: chunks whose sources all fit
              # a NARROW window from a 128-aligned start (81%+ at the
              # settled 1M bench are pure shifts, a strict subset) DMA and
              # contract half the slab — both costs are linear in slab
              # width.


def _permute_kernel(lo_ref, slablo_ref, cls_ref, perm_ref, einv_ref, rows_hbm,
                    exccols_hbm, out_ref, slab_db, sem, nslab_db, nsem,
                    ecol_buf, esem, *, npad: int, c0: int, cap: int):
    """Program g writes out[:, g*C:(g+1)*C] = rows[:, perm[g*C:(g+1)*C]].

    In-band entries ride the slab matmul; far movers ride the exception
    slab matmul: einv_ref[0, i] is lane i's rank in the (output-ordered)
    exception list, -1 when the lane is in-band, and exccols_hbm[:, e] is
    the pre-gathered source column of exception e.  lo_ref[g] = first
    exception rank at or past lane g*CHUNK, so this chunk's ranks live in
    [lo, lo + 256) — always inside the 128-aligned EXCW-wide slab.

    slablo_ref[g] is the chunk's SHIFT-AWARE slab start (XLA-computed,
    128-aligned, clipped): centered on the chunk's mean source rank instead
    of its output position, so a globally-drifting-but-locally-smooth
    permutation (mass settling compacts ranks cumulatively across the whole
    array) stays in-band and only genuine far movers pay the exception
    path.

    cls_ref[g] classifies the chunk:
      0 WIDE   — WMULT*C slab matmul + exception matmul;
      1 NARROW — every source rank within [slab_lo, slab_lo + NARROW), no
        exceptions: DMAs and contracts a NARROW-wide slab instead of the
        full WMULT*C one (HBM traffic and one-hot matmul are linear in
        slab width);
      2 SHIFT  — perm is one constant displacement across the whole chunk
        (81%+ of chunks at the settled 1M bench): the output IS a
        contiguous source window, so the chunk reuses the NARROW slab DMA
        (NARROW >= C + 128 covers any misalignment from the 128-aligned
        slab start) and emits pltpu.roll(buf, NARROW - off)[:, :C] — no
        one-hot construction and no matmul at all.
    """
    g = pl.program_id(0)
    ng = pl.num_programs(0)
    c = CHUNK
    w = min(WMULT * c, npad)
    nw = min(NARROW, npad)

    def dma_wide(gg, slot):
        s = pl.multiple_of(slablo_ref[jnp.minimum(gg, ng - 1)], 128)
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(s, w)], slab_db.at[slot], sem.at[slot]
        )

    def dma_narrow(gg, slot):
        s = pl.multiple_of(slablo_ref[jnp.minimum(gg, ng - 1)], 128)
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(s, nw)], nslab_db.at[slot], nsem.at[slot]
        )

    def start_for(gg, slot):
        # classes 1 (narrow) and 2 (shift) share the NARROW slab DMA
        narrow = cls_ref[jnp.minimum(gg, ng - 1)] > 0

        @pl.when(narrow)
        def _():
            dma_narrow(gg, slot).start()

        @pl.when(jnp.logical_not(narrow))
        def _():
            dma_wide(gg, slot).start()

    slot = jax.lax.rem(g, 2)
    nslot = jax.lax.rem(g + 1, 2)

    lo = lo_ref[g]
    has_exc = lo_ref[g + 1] > lo
    base = pl.multiple_of(jnp.clip((lo // 128) * 128, 0, cap - EXCW), 128)
    ecopy = pltpu.make_async_copy(
        exccols_hbm.at[:, pl.ds(base, EXCW)], ecol_buf, esem
    )

    @pl.when(has_exc)
    def _():
        ecopy.start()

    @pl.when(g == 0)
    def _():
        start_for(g, slot)

    @pl.when(g + 1 < ng)
    def _():
        start_for(g + 1, nslot)

    s = pl.multiple_of(slablo_ref[g], 128)
    rel = perm_ref[0][None, :] - s                                # [1, C]
    cls_g = cls_ref[g]

    @pl.when(cls_g == 2)
    def _():
        # pure shift: the output chunk IS rows[:, src0:src0+C]; src0 - s
        # <= NARROW - C by the XLA-side aligned-start clipping, so the
        # window sits inside the NARROW slab and one roll extracts it.
        dma_narrow(g, slot).wait()
        off = perm_ref[0][0] - s
        out_ref[:, :] = pltpu.roll(nslab_db[slot], nw - off, axis=1)[:, :c]

    @pl.when(cls_g == 1)
    def _():
        dma_narrow(g, slot).wait()
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (nw, c), 0)
        onehot = (rel == k_iota).astype(jnp.float32)              # [NW, C]
        out_ref[:, :] = sel3_dot_mstack(nslab_db[slot], onehot)

    @pl.when(cls_g == 0)
    def _():
        dma_wide(g, slot).wait()
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (w, c), 0)
        onehot = (rel == k_iota).astype(jnp.float32)              # [W, C]
        acc = sel3_dot_mstack(slab_db[slot], onehot)

        # Most chunks have zero far movers — the exception matmul (one
        # M-stacked [3C0, EXCW] x [EXCW, C] pass) only runs when this
        # chunk's exception segment is nonempty.
        @pl.when(has_exc)
        def _():
            ecopy.wait()
            # onehot2[e, i] = (lane i's exception rank == base + e);
            # in-band lanes carry rank -1 and never match.
            rel2 = einv_ref[0][None, :] - base                    # [1, C]
            k2 = jax.lax.broadcasted_iota(jnp.int32, (EXCW, c), 0)
            onehot2 = (rel2 == k2).astype(jnp.float32)            # [EXCW, C]
            out_ref[:, :] = acc + sel3_dot_mstack(ecol_buf[...], onehot2)

        @pl.when(jnp.logical_not(has_exc))
        def _():
            out_ref[:, :] = acc


def _permute_banded(rows, perm_p, exc_lo, slab_lo, cls, einv, exc_cols,
                    npad: int):
    c0 = rows.shape[0]
    cap = exc_cols.shape[1]
    if cap < EXCW:   # the kernel DMAs fixed EXCW-wide exception slabs
        exc_cols = jnp.pad(exc_cols, ((0, 0), (0, EXCW - cap)))
        cap = EXCW
    ng = npad // CHUNK
    kernel = functools.partial(_permute_kernel, npad=npad, c0=c0, cap=cap)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ng,),
            in_specs=[
                pl.BlockSpec((1, CHUNK), lambda g, lo, slo, nwf: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CHUNK), lambda g, lo, slo, nwf: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (c0, CHUNK), lambda g, lo, slo, nwf: (0, g),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, c0, min(WMULT * CHUNK, npad)), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, c0, min(NARROW, npad)), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((c0, EXCW), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((c0, npad), jnp.float32),
        interpret=_interpret(),
    )(exc_lo, slab_lo, cls, perm_p.reshape(1, npad),
      einv.reshape(1, npad), rows, exc_cols)


# 512 first: at the settled 1M phase most substeps carry only a handful
# of far movers (paddle region), and the XLA-side exc_cols lane-take is
# linear in the level cap — the small level keeps the common case cheap.
EMAX_LEVELS = (512, 2048, 8192, 16384, 65536, 262144)


def permute_lanes(rows, perm, emax: int = 262144):
    """rows[:, perm] for a [C, NPAD] channel matrix, exact for any perm.

    rows: [C, NPAD] f32 (NPAD a multiple of 256); perm: [NPAD] int32 with
    values in [0, NPAD).  One Pallas pass applies both the banded part and
    the compacted far-mover exceptions (see module docstring); the static
    exception capacity is switched at runtime between EMAX_LEVELS so the
    XLA-side column pre-gather stays sized to the actual exception count.
    Full-gather fallback beyond the largest level keeps any permutation
    exact.
    """
    c0, npad = rows.shape
    assert npad % CHUNK == 0, (npad, CHUNK)
    ng = npad // CHUNK
    w = min(WMULT * CHUNK, npad)
    iota = jnp.arange(npad, dtype=jnp.int32)
    # SHIFT-AWARE slab starts: center each chunk's source window on the
    # chunk's MEDIAN source rank (not its output position).  Mass settling
    # compacts ranks cumulatively — under a static band everything past the
    # first few chunks fell out-of-band and the whole substep hit the
    # full-gather fallback (~54 ms at 1M); the median tracks the drift and
    # only genuine far movers pay the exception path.  Median, not mean: a
    # few block-crossers at ~1e5-rank distance drag a mean past the window
    # half-width at <1% outlier fraction (measured 31.5 -> 15.4 steps/s at
    # 1M), while the median ignores any <50% of them outright.  Subsampled
    # 32/256 per chunk for cost; 128-aligned for the kernel's lane-dim DMA.
    sub = perm.reshape(ng, CHUNK)[:, ::8]                       # [ng, 32]
    med_src = jax.lax.sort(sub, dimension=1)[:, 16]
    slab_lo = jnp.clip(
        ((med_src - w // 2) // 128) * 128, 0, npad - w
    ).astype(jnp.int32)
    # NARROW chunks: every source rank fits a NARROW-wide window from a
    # 128-aligned start (81%+ at the settled 1M bench — mostly pure local
    # shifts).  The kernel then DMAs/contracts half the slab.  Their
    # slab_lo is the aligned min (also inside the wide window, so the
    # exception flags below stay false for them by construction).
    nwid = min(NARROW, npad)
    pch = perm.reshape(ng, CHUNK)
    pmin = jnp.min(pch, axis=1)
    pmax = jnp.max(pch, axis=1)
    nstart = jnp.clip((pmin // 128) * 128, 0, npad - nwid).astype(jnp.int32)
    nw_flags = (pmin >= nstart) & (pmax < nstart + nwid)
    # PURE-SHIFT chunks (strict subset of narrow: pmax - pmin = C - 1 and
    # the aligned window always covers [pmin, pmin + C)): one constant
    # displacement across the chunk — the kernel replaces the one-hot
    # matmul with a roll of the slab.  81%+ of chunks at the settled 1M
    # bench; detection is one more per-chunk reduce.
    disp = pch - iota.reshape(ng, CHUNK)
    is_shift = jnp.max(disp, axis=1) == jnp.min(disp, axis=1)
    cls = jnp.where(
        is_shift, 2, jnp.where(nw_flags, 1, 0)
    ).astype(jnp.int32)
    slab_lo = jnp.where(cls > 0, nstart, slab_lo)
    # EXACT out-of-slab test against the same windows: the exception patch
    # is additive, so it must fire exactly once per out-of-band lane.
    sstart = jnp.repeat(slab_lo, CHUNK)
    flag = (perm < sstart) | (perm >= sstart + w)
    n_exc = jnp.sum(flag.astype(jnp.int32))
    levels = tuple(e for e in EMAX_LEVELS if e <= emax) or (emax,)

    def banded(rows):
        # Exception ranks in output-lane order; per-chunk segment starts
        # from the per-chunk counts (exceptions of chunk g occupy ranks
        # [exc_lo[g], exc_lo[g+1])).
        ranks = jnp.cumsum(flag.astype(jnp.int32)) - 1
        einv = jnp.where(flag, ranks, -1)
        counts = jnp.sum(flag.reshape(ng, CHUNK).astype(jnp.int32), axis=1)
        exc_lo = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]
        ).astype(jnp.int32)

        # Exception sources in rank order, via chunked compaction instead
        # of a full [npad] sort when the count is small and unclustered
        # (ops/compact.py; ~1 ms at 1M).  Clustered displacements (a moved
        # run concentrating > 128 exceptions in one 2048-lane chunk) and
        # big counts fall back to the sort.
        ccap = min(8192, npad)
        if npad < 2 ** 24:
            csrc, cok = compact_flagged(
                perm.astype(jnp.float32)[None, :], flag, ccap
            )
        else:
            csrc = jnp.zeros((2, ccap), jnp.float32)
            cok = jnp.bool_(False)

        def level_fn(cap):
            def _src_sort(_):
                # Positions sorted ascending are exactly the flagged lanes
                # in rank order.
                exc_pos = jax.lax.sort(jnp.where(flag, iota, npad))[:cap]
                return perm[jnp.where(exc_pos < npad, exc_pos, 0)]

            def br(rows):
                if cap <= ccap:
                    def _src_compact(_):
                        v = csrc[0][:cap]
                        return jnp.where(
                            v < npad, v, 0.0
                        ).astype(jnp.int32)

                    src = jax.lax.cond(cok, _src_compact, _src_sort, None)
                else:
                    src = _src_sort(None)
                exc_cols = jnp.take(rows, src, axis=1)          # [C, cap]
                return _permute_banded(
                    rows, perm, exc_lo, slab_lo, cls, einv, exc_cols,
                    npad
                )

            return br

        level = sum((n_exc > e).astype(jnp.int32) for e in levels[:-1])
        return jax.lax.switch(level, [level_fn(e) for e in levels], rows)

    def full(rows):
        # Row-major gather (serialized per index, but each index moves a
        # whole 4*C-byte row) — the minor-axis take form is ~10x slower.
        return jnp.take(rows.T, perm, axis=0).T

    return jax.lax.cond(n_exc <= levels[-1], banded, full, rows)
