"""Fused particle-update Pallas kernel (3D and 2D): one pass over the rows.

As plain XLA, the per-particle constitutive step (contact projection,
F update, Jacobi SVD fracture check, Drucker-Prager projection, stress,
APIC affine, advection) plus the rigid-contact-velocity build and the
[PCHAN, N] row-matrix rebuild lowers to ~15 separate fusions, each
streaming megabyte-scale channel intermediates through HBM, plus a
PCHAN-way strided stack — ~6 ms/substep at 1M particles, almost all of it
memory traffic.  This kernel runs the whole phase in ONE pass over
2048-lane blocks: inputs are the current rows, the G2P result rows, the
particle-CDF rows and the sorted block ids; output is the finished
next-substep row matrix.  The body simply calls the channelized update
(ops/particle_update.py:particle_update_channels{,_2d} — physics parity
particle_update.wgsl:45-141), which is shape-agnostic elementwise jnp and
traces fine under Pallas on [1, L] channel slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgsparkl_tpu.ops import pallas_transfer as ptf3
from wgsparkl_tpu.ops import pallas_transfer2d as ptf2
from wgsparkl_tpu.ops.particle_update import (
    particle_update_channels,
    particle_update_channels_2d,
)

LBLK = 2048  # lanes per program (pallas_npad pads NPAD to a multiple)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _update_kernel(ce_ref, pvec_ref, rows_ref, krows_ref, pcdf_ref, sid_ref,
                   btable_ref, mtable_ref, out_ref, *, dim: int,
                   live_below: int, nc: int, cell_width: float,
                   elastic_model: str, inv_d_val: float, n_mat: int):
    ptf = ptf3 if dim == 3 else ptf2
    d = dim
    g = pl.program_id(0)
    dt = pvec_ref[0, 0]

    class _P:  # params view for particle_update_channels{,_2d}
        pass

    prm = _P()
    prm.dt = dt

    class _G:
        pass

    gcfg = _G()
    gcfg.cell_width = cell_width

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LBLK), 1) + g * LBLK
    ig = (sid_ref[0:1, :] < live_below) & (lane < ce_ref[0])    # [1, L]

    def row(ref, i):
        return ref[i : i + 1, :]

    zero = jnp.zeros((1, LBLK), jnp.float32)
    pos_ch = [row(rows_ref, k) for k in range(d)]
    v_ch = [jnp.where(ig, row(krows_ref, k), 0.0) for k in range(d)]
    grad_ch = {
        (i, k): jnp.where(
            ig,
            inv_d_val * (row(krows_ref, d + d * i + k) - v_ch[i] * pos_ch[k]),
            0.0,
        )
        for i in range(d)
        for k in range(d)
    }
    f_ch = {
        (i, k): row(rows_ref, ptf.R_F0 + d * i + k)
        for i in range(d)
        for k in range(d)
    }
    # pcdf rows: 0 = affinity low half, 1 = sd, 2..2+d = normal,
    # 2+d = affinity high (sign) half — split <=16-bit integer-valued f32
    # (see pallas_transfer._paff_u32).
    aff_lo = jnp.where(ig, row(pcdf_ref, 0), 0.0)
    aff_hi = jnp.where(ig, row(pcdf_ref, 2 + d), 0.0)
    aff_u = pltpu.bitcast(
        aff_lo.astype(jnp.int32) | (aff_hi.astype(jnp.int32) << 16),
        jnp.uint32,
    )
    sd_ch = jnp.where(ig, row(pcdf_ref, 1), 0.0)
    n_ch = [jnp.where(ig, row(pcdf_ref, 2 + k), 0.0) for k in range(d)]

    # Rigid contact velocity from the body table (g2p.wgsl:220-226);
    # 3D btable rows: 0-2 world COM, 3-5 linvel, 6-8 angvel; 2D rows:
    # 0-1 COM, 2-3 linvel, 4 scalar angvel.  Lanes = body slots.
    rv_ch = [zero for _ in range(d)]
    for b in range(nc):
        has = ((aff_u >> b) & 1) != 0
        com = [btable_ref[r, b] for r in range(d)]
        lin = [btable_ref[d + r, b] for r in range(d)]
        rel = [pos_ch[k] - com[k] for k in range(d)]
        if d == 3:
            ang = [btable_ref[6 + r, b] for r in range(3)]
            bvb = [
                lin[0] + ang[1] * rel[2] - ang[2] * rel[1],
                lin[1] + ang[2] * rel[0] - ang[0] * rel[2],
                lin[2] + ang[0] * rel[1] - ang[1] * rel[0],
            ]
        else:
            ang = btable_ref[4, b]
            bvb = [lin[0] - ang * rel[1], lin[1] + ang * rel[0]]
        rv_ch = [rv_ch[k] + jnp.where(has, bvb[k], 0.0) for k in range(d)]

    # Immutable constants come from the material table by id (static
    # where-chain over the scene's n_mat materials; scalar VMEM reads).
    mid = row(rows_ref, ptf.R_MID)

    def mval(r):
        out = jnp.full((1, LBLK), mtable_ref[r, 0])
        for m in range(1, n_mat):
            out = jnp.where(mid == m, mtable_ref[r, m], out)
        return out

    ch = {
        "pos": pos_ch,
        "vel": v_ch,
        "grad": grad_ch,
        "F": f_ch,
        "sd": sd_ch,
        "normal": n_ch,
        "rigid_vel": rv_ch,
        "mass": row(rows_ref, ptf.PM),
        "vol0": mval(ptf3.MTAB_VOL),
        "lam": mval(ptf3.MTAB_LAM),
        "mu": mval(ptf3.MTAB_MU),
        "dp": {
            k: mval(ptf3.MTAB_DP0 + i)
            for i, k in enumerate(ptf.DP_KEYS)
        },
        "dps": {
            k: row(rows_ref, ptf.R_DPS0 + i)
            for i, k in enumerate(ptf.DPS_KEYS)
        },
        "phase": row(rows_ref, ptf.R_PHASE),
        "stretch": mval(ptf3.MTAB_STRETCH),
    }
    upd = particle_update_channels if d == 3 else particle_update_channels_2d
    out = upd(ch, prm, gcfg, elastic_model)

    new_rows = (
        out["pos"] + out["vel"] + [row(rows_ref, ptf.PM)]
        + [out["affine"][(i, k)] for i in range(d) for k in range(d)]
        + [aff_lo]
        + n_ch
        + [aff_hi]                            # AFF_SPARE = high half
        + [row(rows_ref, r) for r in range(ptf.NCHAN - 3, ptf.NCHAN)]
        + [out["dps"][k] for k in ptf.DPS_KEYS]
        + [out["phase"]]
        + [out["F"][(i, k)] for i in range(d) for k in range(d)]
        + [row(rows_ref, r) for r in range(ptf.R_F0 + d * d, ptf.PERM_ROWS)]
        + [sd_ch]
        + rv_ch
        + [row(rows_ref, r) for r in range(ptf.R_RV0 + d, ptf.PCHAN)]
    )
    out_ref[...] = jnp.concatenate(new_rows, axis=0)


def update_rows(rows_all, krows, pcdf, sorted_ids, covered_end, btable,
                mtable, params, cfg, nc: int, inv_d_val: float,
                live_below: int, dim: int = 3):
    """Next-substep row matrix [PCHAN, NPAD] from the current rows, the G2P
    rows (krows[:, :npad]), the particle-CDF rows (pcdf[:, :npad]; zeros
    when nc == 0) and the sorted block ids (live iff id < live_below and
    rank < covered_end)."""
    pchan, npad = rows_all.shape
    assert npad % LBLK == 0, (npad, LBLK)
    ng = npad // LBLK
    kernel = functools.partial(
        _update_kernel, dim=dim, live_below=int(live_below), nc=nc,
        cell_width=cfg.grid.cell_width, elastic_model=cfg.elastic_model,
        inv_d_val=inv_d_val, n_mat=max(int(cfg.n_materials), 1),
    )
    krows = krows[:, :npad]
    pcdf = pcdf[:, :npad]
    pvec = jnp.zeros((1, 128), jnp.float32).at[0, 0].set(params.dt)
    ce = jnp.asarray([covered_end], jnp.int32)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ng,),
            in_specs=[
                pl.BlockSpec((1, 128), lambda g, ce: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pchan, LBLK), lambda g, ce: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((krows.shape[0], LBLK), lambda g, ce: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pcdf.shape[0], LBLK), lambda g, ce: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, LBLK), lambda g, ce: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(btable.shape, lambda g, ce: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 128), lambda g, ce: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((pchan, LBLK), lambda g, ce: (0, g),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((pchan, npad), jnp.float32),
        interpret=_interpret(),
    )(ce, pvec, rows_all, krows, pcdf,
      sorted_ids.reshape(1, npad), btable, mtable)
