"""Flagged-lane compaction without a full-array sort.

Both the job-table boundary compaction (ops/blocked.py build_jobs, the
sort.wgsl:117-137 / prefix_sum.wgsl role) and the banded permute's
far-mover extraction (ops/permute.py) need the same primitive: pack the
values of flagged lanes to the front, preserving lane order.  Doing it
with a full [N]-lane lax.sort costs ~1.2-1.5 ms each at 1M lanes on a
v5e — the sort moves every lane even though only ~0.1% are flagged.

Two-level scheme, O(N) reads instead of O(N log N) sorted moves:

  * Level A (Pallas, grid over N/CHUNK lane chunks): in-chunk flag ranks
    via log-shift prefix sums, then one exact one-hot MXU contraction
    packs the chunk's flagged values (and their global lane indices) into
    a static [R + 1, CAPC] slot — no dynamic-offset writes, so no Mosaic
    alignment constraints.
  * Level B (XLA): the ng * CAPC candidate slots (<= CAPC per chunk) are
    glued with ONE small lax.sort on (valid ? global slot position : INF)
    — ~64x fewer lanes than sorting the input.

Chunks with more than CAPC flagged lanes invalidate the result: `ok`
returns False and callers fall back to their sort path (lax.cond), the
same runtime-switch pattern as permute.py's exception levels.  Values
must be integer-valued f32 below 2^24 (exact in the 3-pass bf16 one-hot
contraction, ops/blocked.py sel3_dot) — block keys and lane indices both
are.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgsparkl_tpu.ops.blocked import sel3_dot_mstack

CHUNK = 2048   # lanes per level-A program
CAPC = 128     # max flagged lanes per chunk before fallback


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compact_kernel(flag_ref, vals_ref, out_ref, *, chunk: int, capc: int,
                    r: int):
    g = pl.program_id(0)
    f = flag_ref[...]                                         # [1, chunk]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    # Inclusive prefix sum of flags along lanes (log-shift ladder; static
    # roll shifts only).
    s = f
    k = 1
    while k < chunk:
        rolled = pltpu.roll(s, k, axis=1)
        s = s + jnp.where(lane >= k, rolled, 0.0)
        k *= 2
    slot = s - 1.0                                            # [1, chunk]
    # Mosaic only supports integer iota; convert (int32->f32 is fine).
    row = jax.lax.broadcasted_iota(jnp.int32, (capc, chunk), 0).astype(
        jnp.float32
    )
    onehot = jnp.where(
        (row == slot) & (f > 0.0), 1.0, 0.0
    )                                                         # [capc, chunk]
    gidx = lane.astype(jnp.float32) + jnp.float32(g * chunk)  # exact < 2^24
    vals = jnp.concatenate([vals_ref[...], gidx], axis=0)     # [r+1, chunk]
    out_ref[0] = sel3_dot_mstack(
        vals, onehot, (((1,), (1,)), ((), ()))
    )                                                         # [r+1, capc]


def compact_flagged(vals, flag, cap: int):
    """Pack vals[:, lane] for flagged lanes to the front, in lane order.

    vals: [R, N] integer-valued f32 (< 2^24); flag: [N] bool; cap: static
    output width.  Returns (out [R + 1, cap], ok): out rows 0..R-1 are the
    compacted values, row R is the flagged lanes' global indices; columns
    past the flag count are filled with the pad sentinel 2^24.  ok is
    False when any chunk holds > CAPC flagged lanes OR the total exceeds
    cap — the result is then invalid and the caller must fall back.
    """
    r, n = vals.shape
    chunk = min(CHUNK, n)
    if n % chunk:
        pad = chunk - n % chunk
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
        flag = jnp.pad(flag, (0, pad))
        n += pad
    ng = n // chunk
    f32 = flag.astype(jnp.float32)
    counts = jnp.sum(f32.reshape(ng, chunk), axis=1).astype(jnp.int32)
    total = jnp.sum(counts)
    ok = (jnp.max(counts) <= CAPC) & (total <= cap)

    kernel = functools.partial(
        _compact_kernel, chunk=chunk, capc=CAPC, r=r
    )
    lvl_a = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ng,),
            in_specs=[
                pl.BlockSpec((1, chunk), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, chunk), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, r + 1, CAPC), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((ng, r + 1, CAPC), jnp.float32),
        interpret=_interpret(),
    )(f32.reshape(1, n), vals)

    # Level B: glue the per-chunk slots.  Valid slots (slot < counts[g])
    # sort by their global position; invalid ones to the tail.
    slot = jnp.arange(CAPC, dtype=jnp.int32)
    valid = slot[None, :] < counts[:, None]                   # [ng, CAPC]
    gpos = (
        jnp.arange(ng, dtype=jnp.int32)[:, None] * CAPC + slot[None, :]
    )
    sort_key = jnp.where(valid, gpos, jnp.int32(2 ** 30)).reshape(-1)
    flat = lvl_a.transpose(1, 0, 2).reshape(r + 1, ng * CAPC)
    SENT = jnp.float32(2 ** 24)
    flat = jnp.where(valid.reshape(-1)[None, :], flat, SENT)
    sorted_ops = jax.lax.sort(
        (sort_key,) + tuple(flat[i] for i in range(r + 1)), num_keys=1
    )
    out = jnp.stack([sorted_ops[1 + i][:cap] for i in range(r + 1)], axis=0)
    if out.shape[1] < cap:   # fewer candidate slots than requested width
        out = jnp.pad(
            out, ((0, 0), (0, cap - out.shape[1])),
            constant_values=float(2 ** 24)
        )
    return out, ok
