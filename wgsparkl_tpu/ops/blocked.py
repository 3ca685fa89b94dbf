"""Block-tiled MXU formulation of the MPM transfers (the TPU hot path).

The reference's performance design is: particles binned per 4^3-node block,
one workgroup per block staging the (block+halo) 6^3 node neighborhood in
shared memory, walking per-node atomic linked lists (p2g.wgsl:27-120,
sort.wgsl).  TPUs have no atomics and love big matmuls, so the TPU-native
equivalent implemented here is:

  1. SORT: particles are sorted by flat block id (one XLA sort per substep —
     replaces the reference's 12-dispatch hashmap+prefix-sum sort phase,
     grid.rs:30-206).  All per-particle state is physically permuted so
     later passes stream contiguously.
  2. JOBS: each block's particle range is cut into jobs of at most G
     particles: job j covers sorted ranks [start_j, start_j + G).  Job
     metadata is built with cumsum + searchsorted — static shapes, no host
     round trip (replaces indirect dispatch, grid.wgsl:355-360).
  3. P2G: per job, per-axis B-spline weights produce a [G, 216] window
     weight matrix W = Wx (x) Wy (x) Wz (2 mults/entry — no 27-way one-hot);
     particle features [G, C] are contracted as W^T @ F on the MXU, giving a
     6^3 node tile; tiles scatter-add into the block-major grid with 8
     octant slice-scatters (indices unique per octant pass).
  4. G2P: the transpose — 8 octant slice-gathers build the node tile, W @ N
     contracts back to particles.

CPIC coupling enters as elementwise [G, 216] masks multiplied into W
(compatible pairs) or its complement (impulse pairs) — the affinity bit
logic is unchanged from the dense path.

Grid layout here is block-major: [num_blocks, 4, 4, 4, C] (2D: [NB, 8, 8, C]).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.grid import GridConfig

BLOCK2D = 8   # nodes per axis per block in 2D (8x8 = 64, grid.wgsl:43)
BLOCK3D = 4   # 3D: 4x4x4 = 64


def block_size(dim: int) -> int:
    return BLOCK3D if dim == 3 else BLOCK2D


def block_shape(dim: int, by: int = 4) -> Tuple[int, ...]:
    """Per-axis block node counts.  3D blocks are ANISOTROPIC along the
    gravity axis (y): `by` > 4 packs more particles per block (a full
    4 x by x 4 block at the 8/cell seeding density holds 128 * by
    particles), which raises kernel lane occupancy and halves the job
    count at by = 8 — the single biggest lever found at 1M particles
    (one-block jobs cap at 512/1024 lanes otherwise)."""
    if dim == 2:
        return (BLOCK2D, BLOCK2D)
    return (BLOCK3D, by, BLOCK3D)


def window_shape(dim: int, by: int = 4) -> Tuple[int, ...]:
    return tuple(b + 2 for b in block_shape(dim, by))


def window_size(dim: int) -> int:
    return block_size(dim) + 2  # halo of 2 on the high side


@functools.lru_cache(maxsize=None)
def _octant_slices(dim: int, by: int = 4) -> Tuple:
    """Static decomposition of the window tile into per-neighbor-block chunks.

    Yields (block_offset e in {0,1}^d, window start per axis, sizes per axis):
    chunk [0:B_a] lands in the home block, [B_a:B_a+2] in the +1 neighbor.
    """
    bsh = block_shape(dim, by)
    out = []
    for e in np.ndindex(*((2,) * dim)):
        starts = tuple(0 if ei == 0 else bsh[a] for a, ei in enumerate(e))
        sizes = tuple(bsh[a] if ei == 0 else 2 for a, ei in enumerate(e))
        out.append((e, starts, sizes))
    return tuple(out)


def storage_strides(nb: Tuple[int, ...]) -> Tuple[int, ...]:
    """Per-axis strides of the flat block id.

    3D storage enumerates blocks in (x, z, y) order — y (the gravity axis
    in every scene) FASTEST — so the flat id IS the gravity-fastest sort
    key (particle_sort_keys_ch): key_to_block is the identity and
    consecutive jobs touch consecutive storage slots, which keeps the
    banded tile-move slabs (gather/scatter_tiles_banded) as narrow as the
    occupied-key span instead of a whole y-column fan-out.  2D storage is
    row-major (x, y), already gravity-fastest."""
    if len(nb) == 2:
        return (nb[1], 1)
    return (nb[1] * nb[2], 1, nb[1])


def num_blocks(cfg: GridConfig, by: int = 4) -> Tuple[int, ...]:
    bsh = block_shape(cfg.dim, by)
    assert all(s % b == 0 for s, b in zip(cfg.shape, bsh)), (
        f"blocked grid needs node shape divisible by {bsh}, got {cfg.shape}"
    )
    return tuple(s // b for s, b in zip(cfg.shape, bsh))


def particle_block_ids(pos, cfg: GridConfig, by: int = 4):
    """Flat home-block id per particle (block of the stencil base cell).

    Out-of-grid particles get id = NB_total (an overflow bucket sorted last).
    """
    d = pos.shape[-1]
    bsh = jnp.asarray(block_shape(d, by), jnp.int32)
    base = jnp.round(pos / cfg.cell_width).astype(jnp.int32) - 1
    rel = base - jnp.asarray(cfg.origin_cell, jnp.int32)
    blk = jnp.floor_divide(rel, bsh)
    nb = num_blocks(cfg, by)
    # The window is [block, block+1]; home block must have its +1 neighbor
    # in-bounds on each axis handled by masking, but the home block itself
    # must be in range for the scatter.
    ok = jnp.all((blk >= 0) & (blk < jnp.asarray(nb, jnp.int32)), axis=-1)
    st = storage_strides(nb)
    flat = sum(blk[..., a] * st[a] for a in range(d))
    nb_total = int(np.prod(nb))
    return jnp.where(ok, flat, nb_total), blk


def particle_block_ids_ch(pch, cfg: GridConfig, by: int = 4):
    """Channel form of particle_block_ids: pch = [d] position channels [N].

    Out-of-grid lanes get id = NB_total (the overflow bucket)."""
    d = len(pch)
    bsh = block_shape(d, by)
    nb = num_blocks(cfg, by)
    st = storage_strides(nb)
    flat = None
    ok = None
    for a in range(d):
        base = jnp.round(pch[a] / cfg.cell_width).astype(jnp.int32) - 1
        blk = jnp.floor_divide(base - int(cfg.origin_cell[a]), bsh[a])
        oka = (blk >= 0) & (blk < nb[a])
        ok = oka if ok is None else (ok & oka)
        flat = blk * st[a] if flat is None else flat + blk * st[a]
    return jnp.where(ok, flat, int(np.prod(nb)))


def particle_sort_keys_ch(pch, cfg: GridConfig, by: int = 4):
    """Gravity-fastest block SORT KEY == the flat storage block id.

    3D ids enumerate blocks in (x, z, y) order — y (the gravity axis in
    every scene) fastest (storage_strides) — so the dominant vertical
    motion displaces sorted ranks by ~one block extent instead of a whole
    z-row (the banded lane permutation in ops/permute.py then captures
    nearly all movers in-band; with an (x, y, z) order, mass
    settling/falling pushed >5% of particles past any reasonable band
    every substep).  Out-of-grid lanes get nb_total, as in
    particle_block_ids_ch (which this now aliases)."""
    return particle_block_ids_ch(pch, cfg, by)


def key_to_block(key, nb: Tuple[int, ...], dim: int):
    """Sort key -> storage flat block id: the IDENTITY since the storage
    order was aligned with the gravity-fastest keys (storage_strides).
    Kept as the seam where the two orders convert."""
    return key


# ------------------------------------------------------------ sparse domain
#
# Unbounded-domain analogue of the reference's GPU hashmap grid
# (grid.wgsl:98-164): blocks live anywhere within +-511 block coordinates
# (+-4088 cells) of the grid origin; per substep the OCCUPIED block set is
# recovered from the sorted particle keys by boundary compaction, its
# {0,1}^d neighborhood union forms the ACTIVE table (sorted packed keys),
# and grid storage is [amax + 1, bs.., C] SLOTS into that table — memory
# scales with the active-block capacity, not with any bounding box.
# Key packing is gravity-fastest (x, z, y), like particle_sort_keys_ch.

SPARSE_HALF = 512            # blocks per side around the origin (per axis)
SPARSE_DIM = 2 * SPARSE_HALF
# Python int, NOT a jnp scalar: module-level device arrays get hoisted
# into jitted programs as closed-over buffer inputs whose liveness jax
# 0.9 tracks fragilely (nondeterministic 'supplied N buffers but
# compiled program expected M' dispatch failures once several programs
# share them).
SPARSE_SENTINEL = 1 << 30              # out-of-range / overflow key

# All tile moves / channel merges in this module are EXACT 0/1 selection
# matmuls with f32 payloads (grid rows, CDF channels, affinity words).
# TPU's DEFAULT matmul precision is single-pass bf16, which rounds the
# payload (verified on v5e: a one-hot dot turns 65535.0 into 65536.0) —
# pin full-f32 MXU passes per call so not even a user-level precision
# override can corrupt the selections.
_EXACT = jax.lax.Precision.HIGHEST

_HI16 = np.int32(np.uint32(0xFFFF0000).astype(np.int64) - (1 << 32))  # -65536


def _bf16_trunc(x):
    """f32 with the low 16 mantissa bits zeroed — the value IS an exact
    bf16 (bf16 = the top 16 bits of f32), via integer masking so XLA
    cannot elide it.  The obvious `x.astype(bf16).astype(f32)` is NOT
    safe: XLA's excess-precision rule deletes the f32->bf16->f32 convert
    pair, which silently collapsed the whole Dekker split to a single
    bf16 pass (measured on v5e, round 4: every 'exact' selection payload
    came back exactly bf16(x); the numerics gate caught it as a
    systematic free-fall velocity bias)."""
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(xi & _HI16, jnp.float32)


def _split3(x):
    """Exact split of f32 into three bf16 terms: x == x1 + x2 + x3
    (truncation split: 8+8+8 mantissa bits, subtractions f32-exact)."""
    h1 = _bf16_trunc(x)
    r1 = x - h1
    h2 = _bf16_trunc(r1)
    r2 = r1 - h2
    return (h1.astype(jnp.bfloat16), h2.astype(jnp.bfloat16),
            r2.astype(jnp.bfloat16))


def sel3_dot(a, b, dims, payload: str, *, barrier: bool = True):
    """0/1-selection dot, EXACT at 3 bf16 MXU passes instead of HIGHEST's
    f32 passes: the payload operand ('a' or 'b') is Dekker-split into three
    bf16 terms whose f32 sum reconstructs it exactly, the 0/1 selector is
    exact in bf16, and the three partial products occupy non-overlapping
    mantissa segments so their f32 accumulation is exact wherever each
    output receives a single contribution (gathers / permutations); for
    scatter-adds the reassociation error matches ordinary f32 roundoff.

    barrier=False is REQUIRED (and safe) inside Pallas kernels: Mosaic has
    no lowering for optimization_barrier, and doesn't need one — the
    distributivity hazard below is an XLA HLO simplifier pass, which never
    sees a Mosaic kernel body (the kernel jaxpr lowers straight to MLIR,
    whose canonicalizations don't distribute matmuls over adds).  The
    end-to-end numerics gate (tools/check_tpu_numerics.py, bit-exact
    affinity assert) exercises the in-kernel splits on real hardware.
    """
    if payload == "a":
        parts = _split3(a)
        sel = b.astype(jnp.bfloat16)
        outs = [
            jax.lax.dot_general(
                t, sel, dims, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            for t in parts
        ]
    else:
        parts = _split3(b)
        sel = a.astype(jnp.bfloat16)
        outs = [
            jax.lax.dot_general(
                sel, t, dims, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            for t in parts
        ]
    # The barrier is LOAD-BEARING: without it XLA's algebraic simplifier
    # applies distributivity — dot(s,x1)+dot(s,x2)+dot(s,x3) ->
    # dot(s, x1+x2+x3) — and the bf16 re-sum collapses the Dekker split
    # back to a single-pass bf16 dot (measured on v5e: every gathered
    # payload came back exactly bf16(x), a ~2^-9 systematic rounding that
    # the round-4 numerics gate caught as a free-fall velocity bias).
    if barrier:
        outs = jax.lax.optimization_barrier(tuple(outs))
    return (outs[0] + outs[1]) + outs[2]


def sel3_dot_kernel(a, b, dims, payload: str):
    """sel3_dot for PALLAS KERNEL bodies: barrier=False baked in (Mosaic
    has no optimization_barrier lowering and needs none — see sel3_dot's
    docstring).  Use THIS inside kernels; calling sel3_dot there fails at
    kernel-compile time with an unlowerable-primitive error."""
    return sel3_dot(a, b, dims, payload, barrier=False)


def sel3_dot_mstack(a, b, dims=(((1,), (0,)), ((), ()))):
    """sel3_dot specialization for an 'a' payload [M, K] against a 0/1
    selector [K, N] when M is SMALL: the three Dekker-split payload terms
    are stacked along M into ONE DEFAULT-precision matmul [3M, K] x [K, N]
    instead of three matmuls whose M each pads to the 128-row MXU tile —
    ~3x fewer MXU cycles at M ~ 40 (the permute-kernel row state), with a
    BIT-IDENTICAL result: same bf16 products, same per-segment f32 MXU
    accumulation, and the final cross-segment sums reassociate exactly as
    sel3_dot's (out1 + out2) + out3 on the VPU.

    In-kernel safe (no optimization_barrier): stacking makes the three
    partials one dot, so there is no dot(s,x1)+dot(s,x2)+dot(s,x3) pattern
    for XLA's distributivity rewrite to collapse in the first place.
    """
    assert a.ndim == 2 and dims[0][0] == (1,), (
        "mstack stacks along a's row dim; a must be [M, K] with K contracted"
    )
    m = a.shape[0]
    h1 = _bf16_trunc(a)
    r1 = a - h1
    h2 = _bf16_trunc(r1)
    r2 = r1 - h2
    stacked = jnp.concatenate([h1, h2, r2], axis=0).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        stacked, b.astype(jnp.bfloat16), dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return (out[:m] + out[m : 2 * m]) + out[2 * m :]




def sparse_octant_deltas(dim: int):
    """Packed-key delta of each {0,1}^d neighbor (static ints)."""
    if dim == 3:
        stride = {0: SPARSE_DIM * SPARSE_DIM, 1: 1, 2: SPARSE_DIM}
    else:
        stride = {0: SPARSE_DIM, 1: 1}
    return tuple(
        sum(e[a] * stride[a] for a in range(dim))
        for e, _, _ in _octant_slices(dim)
    )


def particle_sparse_keys_ch(pch, cfg: GridConfig):
    """Packed unbounded block key per lane ((x, z, y) digit order).

    Blocks outside +-(SPARSE_HALF-1) of the origin get SPARSE_SENTINEL
    (the overflow bucket; diagnostics should report them)."""
    d = len(pch)
    bs = block_size(d)
    digs, ok = [], None
    for a in range(d):
        base = jnp.round(pch[a] / cfg.cell_width).astype(jnp.int32) - 1
        blk = jnp.floor_divide(base - int(cfg.origin_cell[a]), bs)
        dig = blk + SPARSE_HALF
        # top digit value reserved so +1 neighbors never wrap a digit.
        oka = (dig >= 0) & (dig < SPARSE_DIM - 1)
        ok = oka if ok is None else (ok & oka)
        digs.append(dig)
    if d == 3:
        key = (digs[0] * SPARSE_DIM + digs[2]) * SPARSE_DIM + digs[1]
    else:
        key = digs[0] * SPARSE_DIM + digs[1]
    return jnp.where(ok, key, SPARSE_SENTINEL)


def sparse_key_coords(key, dim: int):
    """Packed key -> spatial block coords [..., d] (relative to the origin
    cell, in blocks; garbage for sentinel keys)."""
    if dim == 3:
        y = key % SPARSE_DIM
        xz = key // SPARSE_DIM
        z = xz % SPARSE_DIM
        x = xz // SPARSE_DIM
        coords = jnp.stack([x, y, z], axis=-1)
    else:
        y = key % SPARSE_DIM
        x = key // SPARSE_DIM
        coords = jnp.stack([x, y], axis=-1)
    return coords - SPARSE_HALF


def build_jobs_sparse(sorted_keys, group: int, max_jobs: int, kmax: int):
    """Job table + occupied-block table from sorted packed keys.

    Returns (jobs dict {key, start, len}, okeys [kmax] sorted occupied keys
    padded with sentinel, n_occupied scalar).  Dead jobs get key=sentinel.
    """
    n = sorted_keys.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    occ = is_first & (sorted_keys < SPARSE_SENTINEL)
    bkey, brank = jax.lax.sort(
        (
            jnp.where(occ, sorted_keys, SPARSE_SENTINEL),
            jnp.where(occ, lane, n),
        ),
        num_keys=1,
    )
    bkey, brank = bkey[:kmax], brank[:kmax]
    valid_blk = bkey < SPARSE_SENTINEL
    # TRUE distinct-block count (pre-truncation) so kmax overflow — which
    # silently mis-assigns the truncated tail — is detectable upstream.
    n_occ = jnp.sum(occ.astype(jnp.int32))
    # count of block k = next boundary rank - this rank; the rank AFTER the
    # last occupied block is the first overflow/pad rank — recover it from
    # the first non-occupied sorted key position.
    first_over = jnp.searchsorted(
        sorted_keys, SPARSE_SENTINEL, side="left", method="sort"
    ).astype(jnp.int32)
    nxt = jnp.concatenate([brank[1:], jnp.full((1,), n, jnp.int32)])
    nxt = jnp.where(nxt < n, nxt, first_over)
    counts = jnp.where(valid_blk, nxt - brank, 0)

    jobs_per_block = (counts + group - 1) // group
    cum = jnp.cumsum(jobs_per_block)
    total_jobs = cum[-1]
    job_idx = jnp.arange(max_jobs, dtype=jnp.int32)
    jb = jnp.searchsorted(cum, job_idx, side="right", method="sort").astype(
        jnp.int32
    )
    live = job_idx < total_jobs
    jb_safe = jnp.where(live, jnp.minimum(jb, kmax - 1), 0)
    prev = jnp.where(jb_safe > 0, cum[jnp.maximum(jb_safe - 1, 0)], 0)
    rank = job_idx - prev
    start = brank[jb_safe] + rank * group
    length = jnp.clip(counts[jb_safe] - rank * group, 0, group)
    length = jnp.where(live, length, 0)
    key = jnp.where(live, bkey[jb_safe], SPARSE_SENTINEL)
    return (
        {
            "key": key,
            "start": start.astype(jnp.int32),
            "len": length,
            "needed": total_jobs,
        },
        bkey,
        n_occ,
    )


def sparse_active_table(okeys, dim: int, amax: int):
    """Sorted active-slot table: occupied blocks U their +1 neighbors.

    Returns (act [amax] sorted keys padded with sentinel, n_active,
    overflowed bool — true when distinct active blocks exceed amax)."""
    deltas = sparse_octant_deltas(dim)
    cand = jnp.concatenate([okeys + d for d in deltas])
    cand = jnp.where(cand < SPARSE_SENTINEL, cand, SPARSE_SENTINEL)
    cand = jax.lax.sort(cand)
    isf = jnp.concatenate(
        [jnp.ones((1,), bool), cand[1:] != cand[:-1]]
    ) & (cand < SPARSE_SENTINEL)
    n_active = jnp.sum(isf.astype(jnp.int32))
    act = jax.lax.sort(jnp.where(isf, cand, SPARSE_SENTINEL))[:amax]
    return act, n_active, n_active > amax


def sparse_slots(act, queries, ghost_slot: int):
    """Slot of each query key in the active table (ghost_slot when absent
    or sentinel)."""
    s = jnp.searchsorted(act, queries, side="left", method="sort").astype(
        jnp.int32
    )
    s = jnp.clip(s, 0, act.shape[0] - 1)
    found = (act[s] == queries) & (queries < SPARSE_SENTINEL)
    return jnp.where(found, s, ghost_slot)


def band_info_slots(tgts, ghost_slot: int, band: int, cj: int):
    """band_info over an explicit per-octant slot-target matrix [2^d, J]."""
    j = tgts.shape[1]
    if j % cj:
        g = -(-j // cj)
        return jnp.zeros((g,), jnp.int32), jnp.asarray(False)
    t = tgts.reshape(tgts.shape[0], -1, cj)
    nong = t < ghost_slot
    lo = jnp.min(jnp.where(nong, t, ghost_slot), axis=(0, 2))
    hi = jnp.max(jnp.where(nong, t, -1), axis=(0, 2))
    lo = jnp.where(hi < 0, 0, lo)
    hi = jnp.maximum(hi, lo)
    bands_ok = jnp.max(hi - lo) < band
    return lo.astype(jnp.int32), bands_ok


def band_info_slots_chunks(tgts, ghost_slot: int, band: int, cj: int):
    """Per-chunk variant of band_info_slots (see band_info_chunks): each
    job chunk's fit verdict instead of a global one, for the two-level
    slots moves."""
    j = tgts.shape[1]
    if j % cj:
        g = -(-j // cj)
        return jnp.zeros((g,), jnp.int32), jnp.zeros((g,), bool)
    t = tgts.reshape(tgts.shape[0], -1, cj)
    nong = t < ghost_slot
    lo = jnp.min(jnp.where(nong, t, ghost_slot), axis=(0, 2))
    hi = jnp.max(jnp.where(nong, t, -1), axis=(0, 2))
    lo = jnp.where(hi < 0, 0, lo)
    hi = jnp.maximum(hi, lo)
    return lo.astype(jnp.int32), (hi - lo) < band


def gather_tiles_slots(grid_blocks, tgts, band_lo, bands_ok, dim: int,
                       band: int, cj: int, out=None, c=None):
    """Tile gather with explicit per-octant slot targets [2^d, J].

    Banded when bands_ok (one grid slab per job chunk), full one-hot
    matmul otherwise.  Ghost slot = last grid row.  out=(wpad, cpad):
    zero-padded window tiles via the static permutation matmul
    (see _window_perm_np)."""
    nb1 = grid_blocks.shape[0]
    if c is None:
        c = grid_blocks.shape[-1]
    bs = block_size(dim)
    wsz = window_size(dim)
    j = tgts.shape[1]
    flat_grid = grid_blocks.reshape(nb1, -1)
    ghost_row = flat_grid[nb1 - 1]
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (cj, min(band, nb1)), 1)

    pm = (None if out is None
          else jnp.asarray(_window_perm_np(dim, c, out[0], out[1])))

    def assemble(got_fn):
        if out is not None:
            cat = jnp.concatenate(
                [got_fn(oi) for oi in range(2**dim)], axis=1
            )
            win = sel3_dot(
                cat, pm, (((1,), (0,)), ((), ())), "a",
            )
            return win.reshape(j, out[0], out[1])
        tile = jnp.zeros((j,) + (wsz,) * dim + (c,), jnp.float32)
        for oi, (e, starts, sizes) in enumerate(_octant_slices(dim)):
            got = got_fn(oi).reshape((j,) + (bs,) * dim + (c,))
            if dim == 2:
                tile = tile.at[
                    :, starts[0] : starts[0] + sizes[0],
                    starts[1] : starts[1] + sizes[1],
                ].set(got[:, : sizes[0], : sizes[1]])
            else:
                tile = tile.at[
                    :, starts[0] : starts[0] + sizes[0],
                    starts[1] : starts[1] + sizes[1],
                    starts[2] : starts[2] + sizes[2],
                ].set(got[:, : sizes[0], : sizes[1], : sizes[2]])
        return tile

    def full(grid_flat):
        blk_ids = jax.lax.broadcasted_iota(jnp.int32, (j, nb1), 1)

        def got(oi):
            onehot = (tgts[oi][:, None] == blk_ids).astype(jnp.float32)
            return sel3_dot(
                onehot, grid_flat, (((1,), (0,)), ((), ())), "b",
            )

        return assemble(got)

    if j % cj or band >= nb1:
        return full(flat_grid)

    w2 = min(band, nb1)
    no = tgts.shape[0]
    lane_all = jax.lax.broadcasted_iota(jnp.int32, (no * cj, w2), 1)
    lane_fullc = jax.lax.broadcasted_iota(jnp.int32, (no * cj, nb1), 1)

    def banded(grid_flat, per_chunk=False):
        tg = tgts.reshape(no, -1, cj)
        okc_xs = (jnp.ones(tg.shape[1], bool)
                  if bands_ok.ndim == 0 else bands_ok)

        def body(_, args):
            lo, okc, *tchunk = args
            # Octant-STACKED selection (one [no*cj, *] dot per chunk; see
            # gather_tiles_banded) with a per-chunk full-grid fallback for
            # wide chunks when bands_ok is a per-chunk vector.
            t_all = jnp.concatenate(tchunk)
            is_ghost = t_all >= nb1 - 1

            def banded_g(fg):
                s = jnp.clip(lo, 0, nb1 - w2)
                slab = jax.lax.dynamic_slice(
                    fg, (s, 0), (w2, fg.shape[1])
                )
                onehot = (
                    (t_all[:, None] - s) == lane_all
                ) & ~is_ghost[:, None]
                g = sel3_dot(
                    onehot.astype(jnp.float32), slab,
                    (((1,), (0,)), ((), ())), "b",
                )
                return (
                    g + is_ghost[:, None].astype(jnp.float32) * ghost_row[None]
                )

            def full_g(fg):
                # Clip ghosts onto the ghost row slot so they select it
                # exactly (slot tables can report targets past it).
                tc = jnp.minimum(t_all, nb1 - 1)
                onehot = tc[:, None] == lane_fullc
                return sel3_dot(
                    onehot.astype(jnp.float32), fg,
                    (((1,), (0,)), ((), ())), "b",
                )

            if not per_chunk:
                g_all = banded_g(grid_flat)
            else:
                g_all = jax.lax.cond(okc, banded_g, full_g, grid_flat)
            return _, g_all.reshape(no, cj, -1)

        _, per_chunk_out = jax.lax.scan(
            body, 0,
            (band_lo, okc_xs) + tuple(tg[oi] for oi in range(no)),
        )
        # [nchunks, 2^d, cj, cols] -> per-octant [J, cols]
        per_oct = jnp.moveaxis(per_chunk_out, 1, 0).reshape(no, j, -1)
        return assemble(lambda oi: per_oct[oi])

    if bands_ok.ndim == 1:
        # Cond-free scan when every chunk fits; per-chunk dispatch costs
        # ~20 us/cond on TPU (see gather_tiles_banded).
        return jax.lax.cond(
            jnp.all(bands_ok),
            lambda fg: banded(fg, False),
            lambda fg: banded(fg, True),
            flat_grid,
        )
    return jax.lax.cond(bands_ok, banded, full, flat_grid)


def scatter_tiles_slots(grid_blocks, tiles, tgts, band_lo, bands_ok,
                        dim: int, band: int, cj: int, win: bool = False):
    """Tile scatter-add with explicit per-octant slot targets [2^d, J].

    win=True: tiles is the raw padded kernel output [J, wpad, cpad]
    (see scatter_tiles_mm)."""
    nb1 = grid_blocks.shape[0]
    bs = block_size(dim)
    j = tgts.shape[1]
    flat_grid = grid_blocks.reshape(nb1, -1)
    cols = flat_grid.shape[1]
    if win:
        c = grid_blocks.shape[-1]
        pm = jnp.asarray(
            _window_perm_np(dim, c, tiles.shape[1], tiles.shape[2])
        )
        oct_all = sel3_dot(
            tiles.reshape(j, -1), pm, (((1,), (1,)), ((), ())), "a",
        )
        cw = bs**dim * c

        def chunk_of(oi, tile_sel):
            return oct_all[:, oi * cw : (oi + 1) * cw]
    else:
        def chunk_of(oi, tile_sel):
            _, starts, sizes = _octant_slices(dim)[oi]
            if dim == 2:
                ch = tile_sel[:, starts[0] : starts[0] + sizes[0],
                              starts[1] : starts[1] + sizes[1]]
                pad = ((0, 0), (0, bs - sizes[0]), (0, bs - sizes[1]),
                       (0, 0))
            else:
                ch = tile_sel[:, starts[0] : starts[0] + sizes[0],
                              starts[1] : starts[1] + sizes[1],
                              starts[2] : starts[2] + sizes[2]]
                pad = ((0, 0), (0, bs - sizes[0]), (0, bs - sizes[1]),
                       (0, bs - sizes[2]), (0, 0))
            return jnp.pad(ch, pad).reshape(tile_sel.shape[0], -1)

    def full(grid_flat):
        blk_ids = jax.lax.broadcasted_iota(jnp.int32, (j, nb1), 1)
        for oi in range(tgts.shape[0]):
            onehot = (
                (tgts[oi][:, None] == blk_ids) & (tgts[oi] < nb1 - 1)[:, None]
            ).astype(jnp.float32)
            grid_flat = grid_flat + sel3_dot(
                onehot, chunk_of(oi, tiles), (((0,), (0,)), ((), ())), "b",
            )
        return grid_flat

    if j % cj or band >= nb1:
        return full(flat_grid).reshape(grid_blocks.shape)

    w2 = min(band, nb1)
    no = tgts.shape[0]
    lane_all = jax.lax.broadcasted_iota(jnp.int32, (no * cj, w2), 1)
    lane_fullc = jax.lax.broadcasted_iota(jnp.int32, (no * cj, nb1), 1)
    # [nchunks, no*cj, cols]: per-chunk octant-stacked payload (see
    # scatter_tiles_banded — one K = no*cj dot per chunk).
    chunks_all = jnp.concatenate(
        [chunk_of(oi, tiles).reshape(-1, cj, cols) for oi in range(no)],
        axis=1,
    )
    tg = tgts.reshape(no, -1, cj)
    okc_xs = (jnp.ones(tg.shape[1], bool)
              if bands_ok.ndim == 0 else bands_ok)

    def banded(grid_flat, per_chunk=False):
        def body(grid_flat, args):
            lo, okc, cch = args[0], args[1], args[2]
            tch = args[3:]
            t_all = jnp.concatenate(tch)
            live = (t_all < nb1 - 1)[:, None]

            def banded_s(fg):
                s = jnp.clip(lo, 0, nb1 - w2)
                onehot = ((t_all[:, None] - s) == lane_all) & live
                d = sel3_dot(
                    onehot.astype(jnp.float32), cch,
                    (((0,), (0,)), ((), ())), "b",
                )
                slab = jax.lax.dynamic_slice(fg, (s, 0), (w2, cols))
                return jax.lax.dynamic_update_slice(fg, slab + d, (s, 0))

            def full_s(fg):
                onehot = (t_all[:, None] == lane_fullc) & live
                d = sel3_dot(
                    onehot.astype(jnp.float32), cch,
                    (((0,), (0,)), ((), ())), "b",
                )
                return fg + d

            if not per_chunk:
                return banded_s(grid_flat), None
            return jax.lax.cond(okc, banded_s, full_s, grid_flat), None

        grid_flat, _ = jax.lax.scan(
            body, grid_flat,
            (band_lo, okc_xs, chunks_all)
            + tuple(tg[oi] for oi in range(no)),
        )
        return grid_flat

    if bands_ok.ndim == 1:
        # Cond-free scan when every chunk fits (see gather_tiles_banded).
        out = jax.lax.cond(
            jnp.all(bands_ok),
            lambda fg: banded(fg, False),
            lambda fg: banded(fg, True),
            flat_grid,
        )
        return out.reshape(grid_blocks.shape)
    out = jax.lax.cond(bands_ok, banded, full, flat_grid)
    return out.reshape(grid_blocks.shape)


def sort_by_block(state_arrays, block_ids):
    """Sort a pytree of [N, ...] arrays by block id.  Returns (sorted tree,
    sorted_ids, perm) — the TPU replacement of the reference's
    finalize_particles_sort (sort.wgsl:117-137)."""
    n = block_ids.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_ids, perm = jax.lax.sort((block_ids, iota), num_keys=1)
    sorted_tree = jax.tree.map(lambda x: x[perm], state_arrays)
    return sorted_tree, sorted_ids, perm


def build_jobs(sorted_ids, nb_total: int, group: int, max_jobs: int):
    """Job table from sorted block ids.

    Returns dict of [max_jobs] arrays: block (flat id, clamped), start (rank
    of first particle), len (<= group).  Jobs beyond the live count have
    len 0.
    """
    n = sorted_ids.shape[0]
    # Keys are sorted: per-block ranges come from boundary compaction —
    # one vectorized sort packs the ~#occupied-blocks boundary (key, rank)
    # pairs to the front, and a small searchsorted over them resolves all
    # nb_total+1 queries.  (jnp.searchsorted's 'scan' method emits a serial
    # vmapped while loop, and its 'sort' method a big scatter — both were
    # multi-ms at 1M keys on TPU.)
    lane = jnp.arange(n, dtype=jnp.int32)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    # Boundary (key, rank) pairs packed to the front; non-boundaries -> tail.
    # The pad sentinel must sort strictly AFTER every data key — data may
    # legitimately contain nb_total (overflow bucket) and nb_total + 1
    # (dead-lane key); colliding with them interleaves pads among real
    # boundaries and explodes the last occupied block's count over the
    # dead region (ghost jobs).
    pad_key = nb_total + 2
    kmax = min(nb_total + 3, n)
    # Fast path: chunked flagged-lane compaction (ops/compact.py) — the
    # boundaries are already in key order, so no full [n] sort is needed
    # (~1.5 ms at 1M).  Falls back to the sort when some 2048-lane chunk
    # holds > 128 boundaries (pathologically sparse occupancy).
    from wgsparkl_tpu.ops.compact import compact_flagged

    if max(pad_key, n) < 2 ** 24:   # f32-exact key/rank range
        cvals, cok = compact_flagged(
            jnp.minimum(sorted_ids, pad_key - 1).astype(jnp.float32)[None, :],
            is_first, kmax,
        )
    else:
        cvals = jnp.zeros((2, kmax), jnp.float32)
        cok = jnp.bool_(False)

    def _from_compact(_):
        bk = jnp.minimum(cvals[0], float(pad_key)).astype(jnp.int32)
        br = jnp.minimum(cvals[1], float(n)).astype(jnp.int32)
        return bk, br

    def _from_sort(_):
        bkey_s, brank_s = jax.lax.sort(
            (
                jnp.where(
                    is_first, jnp.minimum(sorted_ids, pad_key - 1), pad_key
                ),
                jnp.where(is_first, lane, n),
            ),
            num_keys=1,
        )
        return bkey_s[:kmax], brank_s[:kmax]

    bkey, brank = jax.lax.cond(cok, _from_compact, _from_sort, None)
    edges = brank[
        jnp.searchsorted(
            bkey, jnp.arange(nb_total + 1, dtype=bkey.dtype),
            side="left", method="sort",
        ).clip(0, kmax - 1)
    ]
    # Queries past every key: all n particles precede them.
    edges = jnp.where(
        jnp.arange(nb_total + 1) > sorted_ids[-1], n, edges
    ).astype(jnp.int32)
    first = edges[:nb_total]
    counts = edges[1:] - first
    jobs_per_block = (counts + (group - 1)) // group
    cum_jobs = jnp.cumsum(jobs_per_block)
    total_jobs = cum_jobs[-1] if nb_total > 0 else 0

    job_idx = jnp.arange(max_jobs, dtype=jnp.int32)
    jb = jnp.searchsorted(
        cum_jobs, job_idx, side="right", method="sort"
    ).astype(jnp.int32)
    live = job_idx < total_jobs
    jb_safe = jnp.where(live, jb, 0)
    prev_cum = jnp.where(jb_safe > 0, cum_jobs[jnp.maximum(jb_safe - 1, 0)], 0)
    rank = job_idx - prev_cum
    start = first[jb_safe] + rank * group
    length = jnp.clip(counts[jb_safe] - rank * group, 0, group)
    length = jnp.where(live, length, 0)
    # Dead jobs route to the ghost/overflow block (nb_total): tile gathers
    # read the ghost slab and tile scatters land in the discarded ghost row,
    # so dead jobs cost nothing downstream and kernels can skip them.
    block = jnp.where(live, jb_safe, nb_total)
    # "needed" = true job demand this substep; > max_jobs means the tail
    # jobs were dropped (their particles are masked out of transfers) —
    # surfaced on-device through pipeline.StepDiag.
    return {
        "block": block,
        "start": start.astype(jnp.int32),
        "len": length,
        "needed": total_jobs,
    }


def _axis_weights(xloc, base_local, wsz: int):
    """Per-axis window weight rows.

    xloc: [..., ] fractional offset p/h - base (in [0.5, 1.5]) for one axis.
    base_local: [...] int base cell position within the window (0..bs-1).
    Returns [..., wsz] with the 3 B-spline weights placed at base_local+{0,1,2}.
    """
    w0 = 0.5 * (1.5 - xloc) ** 2
    w1 = 0.75 - (xloc - 1.0) ** 2
    w2 = 0.5 * (xloc - 0.5) ** 2
    cols = jnp.arange(wsz, dtype=jnp.int32)
    rel = cols - base_local[..., None]
    w = jnp.where(rel == 0, w0[..., None], 0.0)
    w = jnp.where(rel == 1, w1[..., None], w)
    w = jnp.where(rel == 2, w2[..., None], w)
    return w


def window_weights(pos, blk_coords, cfg: GridConfig, by: int = 4):
    """[..., WSZ^d] window weight matrix rows + support data for one job.

    pos: [..., d] particle positions; blk_coords [..., d] their home block.
    Returns (w_flat [..., WSZ^d], base_local [..., d] ints, xfrac [..., d]).
    """
    d = pos.shape[-1]
    bsh = block_shape(d, by)
    wsh = window_shape(d, by)
    h = cfg.cell_width
    base = jnp.round(pos / h).astype(jnp.int32) - 1
    xfrac = pos / h - base.astype(pos.dtype)
    base_local = (base - jnp.asarray(cfg.origin_cell, jnp.int32)
                  - blk_coords * jnp.asarray(bsh, jnp.int32))
    base_local = jnp.clip(base_local, 0, jnp.asarray(bsh, jnp.int32) - 1)

    waxes = [
        _axis_weights(xfrac[..., a], base_local[..., a], wsh[a])
        for a in range(d)
    ]
    if d == 2:
        w = waxes[0][..., :, None] * waxes[1][..., None, :]
        w_flat = w.reshape(*w.shape[:-2], wsh[0] * wsh[1])
    else:
        w = (
            waxes[0][..., :, None, None]
            * waxes[1][..., None, :, None]
            * waxes[2][..., None, None, :]
        )
        w_flat = w.reshape(*w.shape[:-3], wsh[0] * wsh[1] * wsh[2])
    return w_flat, base_local, xfrac


@functools.lru_cache(maxsize=None)
def window_node_offsets(dim: int, by: int = 4) -> np.ndarray:
    """[prod(WSH), d] static int offsets of window nodes from the block
    origin."""
    wsh = window_shape(dim, by)
    grids = np.meshgrid(*[np.arange(w) for w in wsh], indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1).astype(np.int32)


def neighbor_block_table(nb: Tuple[int, ...]):
    """[NB_total + 1, 2^d] flat ids of each block's {0,1}^d neighbors.

    Entry NB_total is the overflow bucket (all-invalid).  Out-of-range
    neighbors map to NB_total (a zero-padded ghost block slot).
    """
    d = len(nb)
    st = storage_strides(nb)
    mesh = np.stack(
        np.meshgrid(*[np.arange(s) for s in nb], indexing="ij"), -1
    ).reshape(-1, d)
    order = np.argsort(sum(mesh[:, a] * st[a] for a in range(d)))
    coords = mesh[order]                    # coords[flat_id] = (x, y[, z])
    out = []
    for e, _, _ in _octant_slices(d):
        nbr = coords + np.asarray(e)
        ok = np.all(nbr < np.asarray(nb), axis=-1)
        flat = sum(nbr[..., a] * st[a] for a in range(d))
        out.append(np.where(ok, flat, np.prod(nb)))
    table = np.stack(out, axis=-1).astype(np.int32)      # [NB, 2^d]
    pad = np.full((1, table.shape[1]), np.prod(nb), np.int32)
    return np.concatenate([table, pad], axis=0)


def scatter_tiles(grid_blocks, tiles, job_block, nbr_table, dim: int,
                  mode: str = "add", tgt_table=None, by: int = 4):
    """Scatter-reduce job window tiles into the block-major grid.

    grid_blocks: [NB+1, BS, BS(, BS), C]  (slot NB = ghost/overflow, discarded)
    tiles:       [J, WSZ, WSZ(, WSZ), C]
    job_block:   [J] flat home-block ids (may repeat across jobs).
    2^d octant passes of pure slice scatters; mode in {add, min, max}
    (min/max serve the rigid-mesh CDF pass, ops/rigid_cdf.py).
    tgt_table: optional explicit per-octant targets [2^d, J] (sparse
    active-slot addressing) overriding nbr_table[job_block].
    """
    for oi, (e, starts, sizes) in enumerate(_octant_slices(dim, by)):
        tgt = (
            tgt_table[oi] if tgt_table is not None
            else nbr_table[job_block, oi]
        )                                                   # [J]
        if dim == 2:
            chunk = tiles[
                :, starts[0] : starts[0] + sizes[0],
                starts[1] : starts[1] + sizes[1],
            ]
            ref = grid_blocks.at[tgt, : sizes[0], : sizes[1]]
        else:
            chunk = tiles[
                :, starts[0] : starts[0] + sizes[0],
                starts[1] : starts[1] + sizes[1],
                starts[2] : starts[2] + sizes[2],
            ]
            ref = grid_blocks.at[tgt, : sizes[0], : sizes[1], : sizes[2]]
        if mode == "add":
            grid_blocks = ref.add(chunk)
        elif mode == "min":
            grid_blocks = ref.min(chunk)
        elif mode == "max":
            grid_blocks = ref.max(chunk)
        else:
            raise ValueError(mode)
    return grid_blocks


def gather_tiles(grid_blocks, job_block, nbr_table, dim: int):
    """Gather each job's window tile from the block-major grid.

    Inverse of scatter_tiles: [NB+1, BS.., C] -> [J, WSZ.., C].
    """
    j = job_block.shape[0]
    wsz = window_size(dim)
    c = grid_blocks.shape[-1]
    tile = jnp.zeros((j,) + (wsz,) * dim + (c,), grid_blocks.dtype)
    for oi, (e, starts, sizes) in enumerate(_octant_slices(dim)):
        src = nbr_table[job_block, oi]
        if dim == 2:
            chunk = grid_blocks[src, : sizes[0], : sizes[1]]
            tile = tile.at[
                :, starts[0] : starts[0] + sizes[0], starts[1] : starts[1] + sizes[1]
            ].set(chunk)
        else:
            chunk = grid_blocks[src, : sizes[0], : sizes[1], : sizes[2]]
            tile = tile.at[
                :, starts[0] : starts[0] + sizes[0],
                starts[1] : starts[1] + sizes[1],
                starts[2] : starts[2] + sizes[2],
            ].set(chunk)
    return tile


def scatter_tiles_mm(grid_blocks, tiles, job_block, nbr_table, dim: int,
                     win: bool = False, by: int = 4):
    """Scatter-add via one-hot matmuls (MXU) instead of serial XLA scatter.

    XLA lowers indexed scatter to a serial while loop (one tiny DMA per
    index); on TPU it is *much* faster to burn MACs: per octant,
    out[b, :] += sum_j onehot[j, b] * chunk[j, :] is a single
    [NB+1, J] x [J, chunk] matmul.  Float32 exact (one-hot entries are 0/1).

    win=True: tiles is the raw padded kernel output [J, wpad, cpad]; the
    window->octant split (and the drop of pad rows / channels >= grid c)
    rides the transposed static permutation matmul.
    """
    nb1 = grid_blocks.shape[0]
    c = grid_blocks.shape[-1]
    bsh = block_shape(dim, by)
    j = tiles.shape[0]
    blk_ids = jax.lax.broadcasted_iota(jnp.int32, (j, nb1), 1)
    flat_grid = grid_blocks.reshape(nb1, -1)
    if win:
        pm = jnp.asarray(
            _window_perm_np(dim, c, tiles.shape[1], tiles.shape[2], by)
        )
        oct_all = sel3_dot(
            tiles.reshape(j, -1), pm, (((1,), (1,)), ((), ())), "a",
        )                                                       # [J, 2^d*bs^d*c]
        cw = int(np.prod(bsh)) * c
        for oi in range(2**dim):
            tgt = nbr_table[job_block, oi]
            onehot = (tgt[:, None] == blk_ids).astype(jnp.float32)
            flat_grid = flat_grid + sel3_dot(
                onehot, oct_all[:, oi * cw : (oi + 1) * cw],
                (((0,), (0,)), ((), ())), "b",
            )
        return flat_grid.reshape(grid_blocks.shape)
    for oi, (e, starts, sizes) in enumerate(_octant_slices(dim, by)):
        tgt = nbr_table[job_block, oi]
        onehot = (tgt[:, None] == blk_ids).astype(jnp.float32)      # [J, NB+1]
        if dim == 2:
            chunk = tiles[:, starts[0] : starts[0] + sizes[0],
                          starts[1] : starts[1] + sizes[1]]
            pad = ((0, 0), (0, bsh[0] - sizes[0]), (0, bsh[1] - sizes[1]),
                   (0, 0))
        else:
            chunk = tiles[:, starts[0] : starts[0] + sizes[0],
                          starts[1] : starts[1] + sizes[1],
                          starts[2] : starts[2] + sizes[2]]
            pad = ((0, 0), (0, bsh[0] - sizes[0]), (0, bsh[1] - sizes[1]),
                   (0, bsh[2] - sizes[2]), (0, 0))
        chunk = jnp.pad(chunk, pad).reshape(j, -1)
        flat_grid = flat_grid + sel3_dot(
            onehot, chunk, (((0,), (0,)), ((), ())), "b",
        )
    return flat_grid.reshape(grid_blocks.shape)


@functools.lru_cache(maxsize=None)
def _chan_merge_mat_np(dim: int, c: int, by: int = 4):
    """Exact 0/1 matrix [c*bs^d, bs^d*c]: channel-major planes concatenated
    on the lane axis ([NB, c*bs^d]) -> cell-major/channel-minor flat grid
    rows.  ONE [NB, c*bs^d] @ [c*bs^d, bs^d*c] matmul: with K = c*bs^d
    (256 at c=4) XLA keeps it on the MXU — per-channel K=64 matmuls get
    conv-lowered in bf16 passes (~0.8 ms/substep at 1M).
    """
    bsd = int(np.prod(block_shape(dim, by)))
    m = np.zeros((c * bsd, bsd * c), np.float32)
    for ch in range(c):
        for cell in range(bsd):
            m[ch * bsd + cell, cell * c + ch] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _cell_channel_mats_np(dim: int, c: int, by: int = 4):
    """Exact 0/1 matrices [c, bs^d, bs^d*c] converting channel-major
    per-block cell arrays [NB, bs^d] into the cell-major/channel-minor
    flat grid rows [NB, bs^d*c] the tile matmuls consume:

        flat = sum_ch  X_ch @ mats[ch]

    Merging channels this way (instead of jnp.stack) avoids materializing
    a [NB, bs.., c] tensor whose (bs, c) minor dims tile onto (8, 128) at
    16/1024 lane occupancy — each strided channel write costs ~0.7 ms per
    substep at 1M particles."""
    bsd = int(np.prod(block_shape(dim, by)))
    mats = np.zeros((c, bsd, bsd * c), np.float32)
    for ch in range(c):
        for cell in range(bsd):
            mats[ch, cell, cell * c + ch] = 1.0
    return mats


@functools.lru_cache(maxsize=None)
def _window_perm_np(dim: int, c: int, wpad: int, cpad: int, by: int = 4):
    """Static 0/1 matrix [2^d*bs^d*c, wpad*cpad]: per-octant gathered block
    cells (cell-major, channel-minor) -> flattened padded window tiles.

    Folding the octant->window assembly plus the WPAD/channel zero-padding
    into one MXU matmul keeps the [J, wsz^d, c] tile tensors (minor dim
    c -> c/128 usable lanes) out of the XLA graph entirely; its transpose
    is the scatter-side window->octant split.  Channels >= c of the padded
    output stay zero."""
    bsh = block_shape(dim, by)
    wsh = window_shape(dim, by)
    bsd = int(np.prod(bsh))
    src_w = (2**dim) * bsd * c
    pm = np.zeros((src_w, wpad * cpad), np.float32)
    for oi, (e, starts, sizes) in enumerate(_octant_slices(dim, by)):
        for cell in np.ndindex(*bsh):
            if any(cell[a] >= sizes[a] for a in range(dim)):
                continue
            wflat = 0
            cflat = 0
            for a in range(dim):
                wflat = wflat * wsh[a] + starts[a] + cell[a]
                cflat = cflat * bsh[a] + cell[a]
            for ch in range(c):
                pm[(oi * bsd + cflat) * c + ch, wflat * cpad + ch] = 1.0
    return pm


def gather_tiles_mm(grid_blocks, job_block, nbr_table, dim: int,
                    out=None, c=None, by: int = 4):
    """Window-tile gather via one-hot matmuls (see scatter_tiles_mm).

    grid_blocks must be f32 with values exactly representable in f32
    (ints must be pre-split into <=16-bit channels).
    """
    nb1 = grid_blocks.shape[0]
    if c is None:
        c = grid_blocks.shape[-1]
    bsh = block_shape(dim, by)
    wsh = window_shape(dim, by)
    j = job_block.shape[0]
    blk_ids = jax.lax.broadcasted_iota(jnp.int32, (j, nb1), 1)
    flat_grid = grid_blocks.reshape(nb1, -1)
    if out is not None:
        pm = jnp.asarray(_window_perm_np(dim, c, out[0], out[1], by))
        gots = []
        for oi in range(2**dim):
            src = nbr_table[job_block, oi]
            onehot = (src[:, None] == blk_ids).astype(jnp.float32)
            gots.append(sel3_dot(
                onehot, flat_grid, (((1,), (0,)), ((), ())), "b",
            ))
        win = sel3_dot(
            jnp.concatenate(gots, axis=1), pm, (((1,), (0,)), ((), ())), "a",
        )
        return win.reshape(j, out[0], out[1])
    tile = jnp.zeros((j,) + wsh + (c,), jnp.float32)
    for oi, (e, starts, sizes) in enumerate(_octant_slices(dim, by)):
        src = nbr_table[job_block, oi]
        onehot = (src[:, None] == blk_ids).astype(jnp.float32)
        got = sel3_dot(
            onehot, flat_grid, (((1,), (0,)), ((), ())), "b",
        ).reshape((j,) + bsh + (c,))
        if dim == 2:
            chunk = got[:, : sizes[0], : sizes[1]]
            tile = tile.at[
                :, starts[0] : starts[0] + sizes[0],
                starts[1] : starts[1] + sizes[1],
            ].set(chunk)
        else:
            chunk = got[:, : sizes[0], : sizes[1], : sizes[2]]
            tile = tile.at[
                :, starts[0] : starts[0] + sizes[0],
                starts[1] : starts[1] + sizes[1],
                starts[2] : starts[2] + sizes[2],
            ].set(chunk)
    return tile


# --------------------------------------------------------- banded tile moves
#
# The plain one-hot matmuls above cost 2 * J * (NB+1) * cols FLOPs — quadratic
# in scene size (J and NB both grow with the particle count / domain), ~20 ms
# at 1M particles.  But jobs are SORTED by home block, so a chunk of CJ
# consecutive jobs touches a narrow band of block ids, and every non-ghost
# octant neighbor sits at a *static* flat offset (off_o = flat(e), e in
# {0,1}^d) from the home block.  The banded variants therefore slice ONE
# [W2, cols] slab of the grid per job chunk (W2 = band + max octant offset)
# and run the 2^d one-hot matmuls against the slab: cost
# 2 * J * W2 * cols — linear in J, ~20x cheaper at 1M.
#
# Ghost targets (out-of-range neighbors and dead jobs, id == NB) are masked
# out of the one-hot and patched with the ghost row's value, so results are
# bit-exact vs the full variants.  Callers must check `bands_ok` (every job
# chunk's block span fits the static band) and fall back to the full
# variants otherwise (lax.cond) — sparse scenes can exceed any static band.


def octant_flat_offsets(nb: Tuple[int, ...]) -> Tuple[int, ...]:
    """Static flat-id offset of each {0,1}^d neighbor (storage layout)."""
    d = len(nb)
    strides = storage_strides(nb)
    return tuple(
        int(sum(e[a] * strides[a] for a in range(d)))
        for e, _, _ in _octant_slices(d)
    )


def band_info(job_block, nb_total: int, band: int, cj: int):
    """Per-chunk band starts + global validity for the banded tile moves.

    Returns (lo [J//cj] int32 chunk band starts over non-ghost blocks,
    bands_ok scalar bool: every chunk's non-ghost block span < band).
    """
    if job_block.shape[0] % cj:
        # job table not chunkable: banded path statically unavailable
        # (the auto dispatchers fall back to the full matmuls).
        g = -(-job_block.shape[0] // cj)
        return jnp.zeros((g,), jnp.int32), jnp.asarray(False)
    jb = job_block.reshape(-1, cj)
    nonghost = jb < nb_total
    lo = jnp.min(jnp.where(nonghost, jb, nb_total), axis=1)
    hi = jnp.max(jnp.where(nonghost, jb, -1), axis=1)
    lo = jnp.where(hi < 0, 0, lo)                 # all-ghost (dead) chunk
    hi = jnp.maximum(hi, lo)
    bands_ok = jnp.max(hi - lo) < band
    return lo.astype(jnp.int32), bands_ok


def band_info_chunks(job_block, nb_total: int, band: int, cj: int):
    """Per-chunk band starts + PER-CHUNK validity for the two-level banded
    moves: each chunk whose non-ghost block span fits the static band rides
    the narrow dynamic slab; chunks that exceed it (splash-phase droplets,
    isolated debris — measured on the 128^3 dam break, where EVERY substep
    has a handful of wide chunks and the old all-or-nothing bands_ok paid
    the full [jobs, nb_total] matmuls for the whole substep) individually
    take a full-grid selection matmul inside the same scan.

    Returns (lo [J//cj] int32 chunk band starts, ok [J//cj] bool per-chunk
    fit).  Callers needing the legacy global verdict reduce with jnp.all.
    """
    if job_block.shape[0] % cj:
        g = -(-job_block.shape[0] // cj)
        return jnp.zeros((g,), jnp.int32), jnp.zeros((g,), bool)
    jb = job_block.reshape(-1, cj)
    nonghost = jb < nb_total
    lo = jnp.min(jnp.where(nonghost, jb, nb_total), axis=1)
    hi = jnp.max(jnp.where(nonghost, jb, -1), axis=1)
    lo = jnp.where(hi < 0, 0, lo)                 # all-ghost (dead) chunk
    hi = jnp.maximum(hi, lo)
    return lo.astype(jnp.int32), (hi - lo) < band


def _octant_targets(jb, nb: Tuple[int, ...], nb_total: int, oi: int,
                    offs: Tuple[int, ...]):
    """Flat target/source block for octant oi per job (ghost -> nb_total).

    Pure elementwise arithmetic replacement for nbr_table[jb, oi] (per-index
    gathers serialize on TPU): tgt = jb + off unless the +1 neighbor runs off
    the grid on some axis, or the job is dead (jb == nb_total).
    """
    d = len(nb)
    e = _octant_slices(d)[oi][0]
    strides = storage_strides(nb)
    ok = jb < nb_total
    for a in range(d):
        if e[a]:
            ok = ok & ((jb // strides[a]) % nb[a] + 1 < nb[a])
    return jnp.where(ok, jb + offs[oi], nb_total)


def _band_geometry(nb: Tuple[int, ...], band: int):
    nb_total = int(np.prod(nb))
    offs = octant_flat_offsets(nb)
    w2 = band + max(offs) + 1
    w2 = min(-(-w2 // 8) * 8, nb_total + 1)
    return nb_total, offs, w2


def gather_tiles_banded(grid_blocks, job_block, band_lo, nb,
                        dim: int, band: int, cj: int, out=None, c=None,
                        by: int = 4, ok_chunks=None):
    """Banded gather_tiles_mm (see module notes above); bit-exact when
    band_info(...)[1] holds.  With out=(wpad, cpad) the octant->window
    assembly rides a static permutation matmul and the result is the
    zero-padded [J, wpad, cpad] kernel-input tile directly.

    ok_chunks (window mode only): per-chunk fit vector from
    band_info_chunks — each scan chunk independently picks the narrow
    dynamic slab (fits) or a full-grid selection matmul (wide splash-phase
    chunk), so one outlier no longer forces the whole substep onto the
    quadratic fallback.  Both branches are exact selections; the result
    is bit-identical to the full matmul either way."""
    nb_total, offs, w2 = _band_geometry(nb, band)
    nb1 = grid_blocks.shape[0]
    if c is None:
        c = grid_blocks.shape[-1]
    bsh = block_shape(dim, by)
    wsh = window_shape(dim, by)
    j = job_block.shape[0]
    flat_grid = grid_blocks.reshape(nb1, -1)
    ghost_row = flat_grid[nb_total]                               # [bs^d * c]
    jb_chunks = job_block.reshape(-1, cj)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cj, w2), 1)
    no = 2**dim
    lane_all = jax.lax.broadcasted_iota(jnp.int32, (no * cj, w2), 1)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (no * cj, nb1), 1)
    pm = (None if out is None
          else jnp.asarray(_window_perm_np(dim, c, out[0], out[1], by)))

    def make_body(per_chunk):
      def body(_, args):
        jb, lo, okc = args
        if out is not None:
            # All-octant STACKED selection: one [no*cj, w2] 0/1 matrix and
            # one 3-pass sel3 dot instead of `no` dots of M=cj — at the
            # thin-aware cj=32 each small dot filled 32 of the MXU's 128 M
            # rows.  Bit-identical: every output row is the same selector
            # row against the same Dekker slab terms, reassembled in the
            # same (o1 + o2) + o3 order.
            src_all = jnp.concatenate([
                _octant_targets(jb, nb, nb_total, oi, offs)
                for oi in range(no)
            ])

            def banded_g(fg):
                s = jnp.clip(lo, 0, nb1 - w2)
                slab = jax.lax.dynamic_slice(fg, (s, 0), (w2, fg.shape[1]))
                is_ghost = src_all >= nb_total
                onehot = (
                    (src_all[:, None] - s) == lane_all
                ) & ~is_ghost[:, None]
                g = sel3_dot(
                    onehot.astype(jnp.float32), slab,
                    (((1,), (0,)), ((), ())), "b",
                )
                return (
                    g + is_ghost[:, None].astype(jnp.float32) * ghost_row[None]
                )

            def full_g(fg):
                # Whole-grid selection: ghost targets (== nb_total) select
                # the ghost row directly, no fix-up needed.
                onehot = src_all[:, None] == lane_full
                return sel3_dot(
                    onehot.astype(jnp.float32), fg,
                    (((1,), (0,)), ((), ())), "b",
                )

            if not per_chunk:
                g_all = banded_g(flat_grid)
            else:
                g_all = jax.lax.cond(okc, banded_g, full_g, flat_grid)
            # Octant -> window assembly as a sum of per-octant permutation
            # dots (pm row-slices): same FLOPs as the concatenated single
            # dot, but consumes g_all's [no*cj, cw] stacking directly —
            # no [no, cj, cw] -> [cj, no*cw] transpose round trip.
            cw = flat_grid.shape[1]
            win = None
            for oi in range(no):
                t = sel3_dot_mstack(
                    g_all[oi * cj : (oi + 1) * cj],
                    pm[oi * cw : (oi + 1) * cw],
                )
                win = t if win is None else win + t
            return _, win
        s = jnp.clip(lo, 0, nb1 - w2)
        slab = jax.lax.dynamic_slice(flat_grid, (s, 0), (w2, flat_grid.shape[1]))
        tile = jnp.zeros((cj,) + wsh + (c,), jnp.float32)
        for oi, (e, starts, sizes) in enumerate(_octant_slices(dim, by)):
            src = _octant_targets(jb, nb, nb_total, oi, offs)
            is_ghost = src >= nb_total
            onehot = ((src[:, None] - s) == lane) & ~is_ghost[:, None]
            got = sel3_dot(
                onehot.astype(jnp.float32), slab, (((1,), (0,)), ((), ())), "b",
            )
            got = got + is_ghost[:, None].astype(jnp.float32) * ghost_row[None, :]
            got = got.reshape((cj,) + bsh + (c,))
            if dim == 2:
                chunk = got[:, : sizes[0], : sizes[1]]
                tile = tile.at[
                    :, starts[0] : starts[0] + sizes[0],
                    starts[1] : starts[1] + sizes[1],
                ].set(chunk)
            else:
                chunk = got[:, : sizes[0], : sizes[1], : sizes[2]]
                tile = tile.at[
                    :, starts[0] : starts[0] + sizes[0],
                    starts[1] : starts[1] + sizes[1],
                    starts[2] : starts[2] + sizes[2],
                ].set(chunk)
        return _, tile
      return body

    okc_xs = (jnp.ones(jb_chunks.shape[0], bool)
              if ok_chunks is None else ok_chunks)
    xs = (jb_chunks, band_lo, okc_xs)
    if ok_chunks is None or out is None:
        _, tiles = jax.lax.scan(make_body(False), 0, xs)
    else:
        # Outer two-level dispatch: per-chunk lax.conds inside the scan
        # cost ~20 us each on TPU (measured: 35.4 -> 32.0 steps/s at 1M
        # with 48 always-banded chunks x 3 moves paying them for nothing),
        # so the common every-chunk-fits substep runs a cond-free scan and
        # only substeps with at least one wide chunk pay the per-chunk
        # dispatch.
        _, tiles = jax.lax.cond(
            jnp.all(ok_chunks),
            lambda: jax.lax.scan(make_body(False), 0, xs),
            lambda: jax.lax.scan(make_body(True), 0, xs),
        )
    if out is not None:
        return tiles.reshape(j, out[0], out[1])
    return tiles.reshape((j,) + wsh + (c,))


def scatter_tiles_banded(grid_blocks, tiles, job_block, band_lo,
                         nb, dim: int, band: int, cj: int,
                         win: bool = False, by: int = 4, ok_chunks=None):
    """Banded scatter_tiles_mm; bit-exact on non-ghost rows when
    band_info(...)[1] holds.  Ghost-target contributions (out-of-range
    neighbors, dead jobs) are dropped instead of accumulated in the ghost
    row — the ghost row is discarded/zero-weight downstream.

    win=True: tiles is the raw padded kernel output [J, wpad, cpad]
    (see scatter_tiles_mm).

    ok_chunks (win mode only): per-chunk fit vector from band_info_chunks;
    chunks that exceed the band scatter-add through a full-grid one-hot
    matmul instead of forcing the whole substep onto the quadratic
    fallback (see gather_tiles_banded)."""
    nb_total, offs, w2 = _band_geometry(nb, band)
    nb1 = grid_blocks.shape[0]
    c = grid_blocks.shape[-1]
    bsh = block_shape(dim, by)
    flat_grid = grid_blocks.reshape(nb1, -1)
    cols = flat_grid.shape[1]
    jb_chunks = job_block.reshape(-1, cj)
    tile_chunks = tiles.reshape((-1, cj) + tiles.shape[1:])
    lane = jax.lax.broadcasted_iota(jnp.int32, (cj, w2), 1)
    no = 2**dim
    lane_all = jax.lax.broadcasted_iota(jnp.int32, (no * cj, w2), 1)
    lane_full = jax.lax.broadcasted_iota(jnp.int32, (no * cj, nb1), 1)
    pm = (jnp.asarray(
        _window_perm_np(dim, c, tiles.shape[1], tiles.shape[2], by))
        if win else None)

    def make_body(per_chunk):
      def body(carry, args):
        jb, lo, tchunk, okc = args
        flat_grid = carry
        s = jnp.clip(lo, 0, nb1 - w2)
        delta = jnp.zeros((w2, cols), jnp.float32)
        if win:
            # Window -> octant disassembly per pm row-slice, stacked along
            # the job dim to [no*cj, cw], then ONE 3-pass scatter dot
            # contracting K = no*cj instead of `no` dots of K = cj (cj=32
            # fills 32 of the MXU's 128 systolic rows).  Nodes written by
            # a single (job, octant) stay exact; genuinely shared nodes
            # reassociate the octant sum inside the MXU K-accumulation —
            # the same f32-roundoff class as the per-octant adds.
            cw = int(np.prod(bsh)) * c
            t2 = tchunk.reshape(cj, -1)
            oct_stack = jnp.concatenate([
                sel3_dot_mstack(t2, pm[oi * cw : (oi + 1) * cw],
                                (((1,), (1,)), ((), ())))
                for oi in range(no)
            ])
            tgt_all = jnp.concatenate([
                _octant_targets(jb, nb, nb_total, oi, offs)
                for oi in range(no)
            ])
            live = (tgt_all < nb_total)[:, None]

            def banded_s(fg):
                onehot = ((tgt_all[:, None] - s) == lane_all) & live
                d = sel3_dot(
                    onehot.astype(jnp.float32), oct_stack,
                    (((0,), (0,)), ((), ())), "b",
                )
                slab = jax.lax.dynamic_slice(fg, (s, 0), (w2, cols))
                return jax.lax.dynamic_update_slice(fg, slab + d, (s, 0))

            def full_s(fg):
                onehot = (tgt_all[:, None] == lane_full) & live
                d = sel3_dot(
                    onehot.astype(jnp.float32), oct_stack,
                    (((0,), (0,)), ((), ())), "b",
                )
                return fg + d

            if not per_chunk:
                return banded_s(flat_grid), None
            return jax.lax.cond(okc, banded_s, full_s, flat_grid), None
        for oi, (e, starts, sizes) in enumerate(_octant_slices(dim, by)):
            tgt = _octant_targets(jb, nb, nb_total, oi, offs)
            onehot = ((tgt[:, None] - s) == lane) & (tgt < nb_total)[:, None]
            if dim == 2:
                chunk = tchunk[:, starts[0] : starts[0] + sizes[0],
                               starts[1] : starts[1] + sizes[1]]
                pad = ((0, 0), (0, bsh[0] - sizes[0]), (0, bsh[1] - sizes[1]),
                       (0, 0))
            else:
                chunk = tchunk[:, starts[0] : starts[0] + sizes[0],
                               starts[1] : starts[1] + sizes[1],
                               starts[2] : starts[2] + sizes[2]]
                pad = ((0, 0), (0, bsh[0] - sizes[0]), (0, bsh[1] - sizes[1]),
                       (0, bsh[2] - sizes[2]), (0, 0))
            chunk = jnp.pad(chunk, pad).reshape(cj, -1)
            delta = delta + sel3_dot(
                onehot.astype(jnp.float32), chunk, (((0,), (0,)), ((), ())), "b",
            )
        slab = jax.lax.dynamic_slice(flat_grid, (s, 0), (w2, cols))
        return (
            jax.lax.dynamic_update_slice(flat_grid, slab + delta, (s, 0)),
            None,
        )
      return body

    okc_xs = (jnp.ones(jb_chunks.shape[0], bool)
              if ok_chunks is None else ok_chunks)
    xs = (jb_chunks, band_lo, tile_chunks, okc_xs)
    if ok_chunks is None or not win:
        flat_grid, _ = jax.lax.scan(make_body(False), flat_grid, xs)
    else:
        # See gather_tiles_banded: cond-free scan on the common
        # every-chunk-fits substep, per-chunk dispatch only when a wide
        # chunk exists.
        flat_grid = jax.lax.cond(
            jnp.all(ok_chunks),
            lambda fg: jax.lax.scan(make_body(False), fg, xs)[0],
            lambda fg: jax.lax.scan(make_body(True), fg, xs)[0],
            flat_grid,
        )
    return flat_grid.reshape(grid_blocks.shape)


def gather_tiles_auto(grid_blocks, job_block, band_lo, bands_ok, nbr_table,
                      nb, dim: int, band: int, cj: int, out=None, c=None,
                      by: int = 4):
    """Two-level banded gather: bands_ok as a PER-CHUNK vector (from
    band_info_chunks) routes each chunk to the narrow slab or a full-grid
    matmul inside one scan; a scalar bands_ok keeps the legacy global
    cond (whole call banded or whole call full)."""
    if job_block.shape[0] % cj or band >= int(np.prod(nb)):
        return gather_tiles_mm(
            grid_blocks, job_block, nbr_table, dim, out=out, c=c, by=by
        )
    if bands_ok.ndim == 1:
        assert out is not None, "per-chunk banding requires window mode"
        return gather_tiles_banded(
            grid_blocks, job_block, band_lo, nb, dim, band, cj, out=out,
            c=c, by=by, ok_chunks=bands_ok,
        )
    return jax.lax.cond(
        bands_ok,
        lambda g: gather_tiles_banded(
            g, job_block, band_lo, nb, dim, band, cj, out=out, c=c, by=by
        ),
        lambda g: gather_tiles_mm(
            g, job_block, nbr_table, dim, out=out, c=c, by=by
        ),
        grid_blocks,
    )


def scatter_tiles_auto(grid_blocks, tiles, job_block, band_lo, bands_ok,
                       nbr_table, nb, dim: int, band: int, cj: int,
                       win: bool = False, by: int = 4):
    """Banded scatter-add with full one-hot matmul fallback (see gather)."""
    if job_block.shape[0] % cj or band >= int(np.prod(nb)):
        return scatter_tiles_mm(
            grid_blocks, tiles, job_block, nbr_table, dim, win=win, by=by
        )
    if bands_ok.ndim == 1:
        assert win, "per-chunk banding requires window mode"
        return scatter_tiles_banded(
            grid_blocks, tiles, job_block, band_lo, nb, dim, band, cj,
            win=win, by=by, ok_chunks=bands_ok,
        )
    return jax.lax.cond(
        bands_ok,
        lambda g, t: scatter_tiles_banded(
            g, t, job_block, band_lo, nb, dim, band, cj, win=win, by=by
        ),
        lambda g, t: scatter_tiles_mm(
            g, t, job_block, nbr_table, dim, win=win, by=by
        ),
        grid_blocks, tiles,
    )


def block_major_node_positions_ch(cfg: GridConfig, by: int = 4):
    """Node world-position channels enumerated in BLOCK-MAJOR order.

    Feeding these to the node-CDF keeps its outputs in the grid's storage
    layout — the row-major variant needs a [*shape, C] -> block-major
    transpose with a 1-lane minor dim afterwards (~2 ms per channel per
    substep at 1M).  Pure iota arithmetic; fuses into the CDF math.
    """
    d = cfg.dim
    bsh = block_shape(d, by)
    nb = num_blocks(cfg, by)
    bsd = int(np.prod(bsh))
    m = int(np.prod(nb)) * bsd
    i = jnp.arange(m, dtype=jnp.int32)
    inner = i % bsd
    b = i // bsd
    st = storage_strides(nb)
    out = []
    for a in range(d):
        inner_stride = int(np.prod(bsh[a + 1 :]))
        cell = (
            (b // st[a]) % nb[a] * bsh[a]
            + (inner // inner_stride) % bsh[a]
            + int(cfg.origin_cell[a])
        )
        out.append(cell.astype(jnp.float32) * cfg.cell_width)
    return tuple(out)


def window_node_positions(blk_coords, cfg: GridConfig, by: int = 4):
    """[..., prod(WSH), d] world positions of a job's window nodes."""
    d = cfg.dim
    bsh = jnp.asarray(block_shape(d, by), jnp.int32)
    offs = jnp.asarray(window_node_offsets(d, by))  # [W, d]
    origin = jnp.asarray(cfg.origin_cell, jnp.int32)
    cell = blk_coords[..., None, :] * bsh + origin + offs
    return cell.astype(jnp.float32) * cfg.cell_width


def block_coords_of(flat, nb: Tuple[int, ...]):
    """Flat block id -> d coords (overflow ids wrap; callers mask them)."""
    d = len(nb)
    st = storage_strides(nb)
    return jnp.stack([(flat // st[a]) % nb[a] for a in range(d)], axis=-1)

