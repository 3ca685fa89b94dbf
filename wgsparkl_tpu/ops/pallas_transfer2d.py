"""Pallas TPU kernels for the 2D P2G / G2P / particle-CDF passes.

Same architecture as the 3D family (ops/pallas_transfer.py /
ops/pallas_cdf.py) with 2D shapes: 8x8-node blocks, 10x10 = 100-node job
windows (pad 104 sublanes), channel-major [PCHAN2, NPAD] particle state,
one MXU matmul per job per transfer, per-job CPIC gating, in-kernel node
body velocities from a small body table, double-buffered particle DMA.

The reference's 2D pipeline is the same WGSL instantiated at dim 2
(crates/wgsparkl2d); here the 2D kernels are their own small family since
window shapes and the MLS solve order differ.

Reference kernels rebuilt here: p2g.wgsl:69-236, g2p.wgsl:44-238,
g2p_cdf.wgsl:157-249 (2D instantiation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgsparkl_tpu.grid import GridConfig
from wgsparkl_tpu.ops import pallas_transfer as ptf
from wgsparkl_tpu.ops.pallas_transfer import (
    _compat, _interpret, _load_pdata_db, nr_recip,
)
from wgsparkl_tpu.ops.transfer import DEFAULT_FRICTION

# pdata channel-row indices (2D)
PX, PY, VX, VY, PM = 0, 1, 2, 3, 4
A0 = 5       # A00 A01 A10 A11 in rows 5..8
AFF = 9      # uint32 affinity bits, bitcast to f32
NX, NY = 10, 11
AFF_SPARE = 12  # zero pad row; scratch for the split-affinity permute
NCHAN = 16

# Extended packed-state rows (same two layout invariants as the 3D twin:
# rows >= PERM_ROWS are recomputed after every sort; immutable constants
# live in Models.mat_table, looked up by the R_MID id row).
R_IDS = 13          # particle identity (NCHAN pad slot)
R_MID = 14          # material id (NCHAN pad slot)
R_DPS0 = 16         # det hardening log_vol_gain
R_PHASE = 19
R_F0 = 20           # F00 F01 F10 F11
PERM_ROWS = 24      # rows [0, PERM_ROWS) move in the re-sort permute
R_SD = 24
R_RV0 = 25          # rigid contact velocity (2 rows)
PCHAN = 32
DP_KEYS = ("h0", "h1", "h2", "h3", "lam", "mu")
DPS_KEYS = ("det", "hardening", "log_vol_gain")

WVOL = 100   # 10^2 window
WPAD = 104   # sublane-padded window rows


def pack_state_rows(particles, models):
    """Full 2D per-particle state -> [PCHAN, N] channel-major row matrix."""
    n = particles.count
    assert models.mat_id is not None, (
        "pallas row packing needs the deduplicated material table — "
        "construct the scene through MpmData or call "
        "solver.attach_material_table(particles, models)"
    )
    z = jnp.zeros((n,), jnp.float32)
    a = particles.affine.reshape(n, 4)
    cols = [
        particles.pos[:, 0], particles.pos[:, 1],
        particles.vel[:, 0], particles.vel[:, 1],
        particles.mass,
        a[:, 0], a[:, 1], a[:, 2], a[:, 3],
        # Affinity split into <=16-bit halves (AFF = low, AFF_SPARE =
        # sign bits) — see pallas_transfer._paff_u32.
        (particles.cdf_affinity & jnp.uint32(0xFFFF)).astype(jnp.float32),
        particles.cdf_normal[:, 0], particles.cdf_normal[:, 1],
        (particles.cdf_affinity >> 16).astype(jnp.float32),  # AFF_SPARE
        particles.ids.astype(jnp.float32),     # R_IDS
        models.mat_id,                         # R_MID
        z,                                     # pad to NCHAN
    ]
    cols += [models.dp_state[k] for k in DPS_KEYS]
    cols += [models.phase]
    f = particles.def_grad.reshape(n, 4)
    cols += [f[:, 0], f[:, 1], f[:, 2], f[:, 3]]
    cols += [
        particles.cdf_signed_distance,
        particles.cdf_rigid_vel[:, 0], particles.cdf_rigid_vel[:, 1],
    ]
    cols += [z] * (PCHAN - len(cols))
    return jnp.stack(cols, axis=0)


def pack_rows_padded(particles, models, npad: int):
    """pack_state_rows lane-padded; pad lanes get F = I (see 3D variant)."""
    n = particles.count
    rows = jnp.pad(pack_state_rows(particles, models), ((0, 0), (0, npad - n)))
    for r in (R_F0, R_F0 + 3):
        rows = rows.at[r, n:].set(1.0)
    return rows


def unpack_state_rows(rows, particles, models, n_mat: int = 1):
    """[PCHAN, N] sorted channel rows -> (particles, models) pytrees."""
    n = particles.count
    mid = rows[R_MID]
    tab = models.mat_table
    lk = ptf._mtab_lookup
    new_p = particles.replace(
        pos=rows[0:2, :].T,
        vel=rows[2:4, :].T,
        mass=rows[PM],
        affine=rows[A0 : A0 + 4, :].T.reshape(n, 2, 2),
        cdf_affinity=rows[AFF].astype(jnp.uint32)
        | (rows[AFF_SPARE].astype(jnp.uint32) << 16),
        def_grad=rows[R_F0 : R_F0 + 4, :].T.reshape(n, 2, 2),
        init_volume=lk(tab, mid, ptf.MTAB_VOL, n_mat),
        init_radius=lk(tab, mid, ptf.MTAB_RAD, n_mat),
        ids=rows[R_IDS].astype(jnp.int32),
        cdf_normal=rows[NX : NX + 2, :].T,
        cdf_signed_distance=rows[R_SD],
        cdf_rigid_vel=rows[R_RV0 : R_RV0 + 2, :].T,
    )
    new_m = models.replace(
        lam=lk(tab, mid, ptf.MTAB_LAM, n_mat),
        mu=lk(tab, mid, ptf.MTAB_MU, n_mat),
        dp={k: lk(tab, mid, ptf.MTAB_DP0 + i, n_mat)
            for i, k in enumerate(DP_KEYS)},
        dp_state={k: rows[R_DPS0 + i] for i, k in enumerate(DPS_KEYS)},
        phase=rows[R_PHASE],
        max_stretch=lk(tab, mid, ptf.MTAB_STRETCH, n_mat),
        mat_id=mid,
    )
    return new_p, new_m


def _axis_w(xf, bl):
    """Per-axis B-spline weights on up to 16 window rows (slice [:10])."""
    g = xf.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (16, g), 0)
    rel = rows - bl[None, :]
    w0 = 0.5 * (1.5 - xf) ** 2
    w1 = 0.75 - (xf - 1.0) ** 2
    w2 = 0.5 * (xf - 0.5) ** 2
    w = jnp.where(rel == 0, w0[None, :], 0.0)
    w = jnp.where(rel == 1, w1[None, :], w)
    w = jnp.where(rel == 2, w2[None, :], w)
    return w


def _window_w(pd, bcell, h, valid):
    """W [WPAD, G] window weights from particle positions (2D)."""
    g = pd.shape[-1]
    u = pd[0:2] * (1.0 / h)
    base = jnp.floor(u + 0.5).astype(jnp.int32) - 1
    xf = u - base.astype(jnp.float32)
    bl = base - bcell[:, None]
    wx = _axis_w(xf[0], bl[0])[:10]
    wy = _axis_w(xf[1], bl[1])[:10]
    w = (wx[:, None, :] * wy[None, :, :]).reshape(WVOL, g) * valid[None, :]
    return jnp.pad(w, ((0, WPAD - WVOL), (0, 0)))


def _window_positions(bcell, cell_width):
    """[WPAD, 2] world positions of window nodes."""
    wid = jax.lax.broadcasted_iota(jnp.int32, (WPAD, 1), 0)
    offs = jnp.concatenate([wid // 10, wid % 10], axis=1).astype(jnp.float32)
    return (offs + bcell.astype(jnp.float32)[None, :]) * cell_width


def _ghost_velocity(pd, bv, friction=DEFAULT_FRICTION):
    """CPIC ghost velocity per (window node, particle) pair, 2D."""
    u = [pd[VX][None, :] - bv[0], pd[VY][None, :] - bv[1]]
    nrm = [pd[NX][None, :], pd[NY][None, :]]
    nv = u[0] * nrm[0] + u[1] * nrm[1]
    tang = [u[i] - nrm[i] * nv for i in range(2)]
    tl = jnp.sqrt(tang[0] ** 2 + tang[1] ** 2)
    inv_tl = jnp.where(tl > 1e-8, nr_recip(jnp.maximum(tl, 1e-30)), 0.0)
    scale = jnp.maximum(0.0, tl + friction * nv) * inv_tl
    sliding = nv < 0.0
    rel = [jnp.where(sliding, tang[i] * scale, u[i]) for i in range(2)]
    return [bv[i] + rel[i] for i in range(2)]


def _moving_node_cdf_2d(xw, btable_ref, desc, cell_width):
    """Analytic node CDF of `desc` colliders at the window nodes,
    IN-KERNEL (2D twin of ptf._moving_node_cdf — same cdf_channel helper
    sequence as the dense path, so results match bit-exactly).

    btable rows (16-row 2D layout): 0-1 world COM, 2-3 linvel, 4 angvel,
    5-6 rotation (cos, sin), 7-8 translation, 9-11 shape params.
    Returns (dist [WPAD,1] f32 BIG-where-none, aff [WPAD,1] uint32,
    closest [WPAD,1] f32 -1-where-none)."""
    from wgsparkl_tpu.collision import cdf_channel as cch
    from wgsparkl_tpu.collision import shapes as shp

    wpad = xw.shape[0]
    pos = [xw[:, a : a + 1] for a in range(2)]
    dist = jnp.full((wpad, 1), cch.BIG, jnp.float32)
    aff = jnp.zeros((wpad, 1), jnp.uint32)
    closest = jnp.full((wpad, 1), -1.0, jnp.float32)
    cap = 1.5 * cell_width
    for slot, st in desc:
        ri = [btable_ref[5, slot], btable_ref[6, slot]]
        ti = [btable_ref[7, slot], btable_ref[8, slot]]
        q = cch._to_local(ri, ti, pos)
        if st == shp.SHAPE_CUBOID:
            he = [btable_ref[9 + a, slot] for a in range(2)]
            proj, inside = cch._proj_cuboid(he, q)
        elif st == shp.SHAPE_BALL:
            proj, inside = cch._proj_ball(btable_ref[9, slot], q)
        elif st == shp.SHAPE_CAPSULE:
            proj, inside = cch._proj_capsule(
                btable_ref[9, slot], btable_ref[10, slot], q
            )
        else:
            proj, inside = cch._proj_halfspace(q)
        dl = [proj[a] - q[a] for a in range(2)]
        dw = cch._to_world_vec(ri, dl)
        box = (jnp.abs(dw[0]) <= cap) & (jnp.abs(dw[1]) <= cap)
        within = inside | box
        di = jnp.sqrt(dw[0] * dw[0] + dw[1] * dw[1])
        closer = within & (di < dist)
        closest = jnp.where(closer, jnp.float32(slot), closest)
        dist = jnp.where(closer, di, dist)
        bits = jnp.where(
            inside, jnp.uint32(0x00010001 << slot),
            jnp.uint32(0x00000001 << slot),
        )
        aff = aff | jnp.where(within, bits, jnp.uint32(0))
    return dist, aff, closest


def _node_body_velocity(closest, xw, btable_ref, nc: int):
    """[WPAD, 1] x 2 body velocity at nodes; btable rows: 0-1 COM,
    2-3 linvel, 4 angvel (scalar)."""
    bv = [jnp.zeros_like(xw[:, 0:1]) for _ in range(2)]
    for b in range(nc):
        mask = closest == b
        com = [btable_ref[k, b] for k in range(2)]
        lin = [btable_ref[2 + k, b] for k in range(2)]
        ang = btable_ref[4, b]
        r = [xw[:, k : k + 1] - com[k] for k in range(2)]
        vb = [lin[0] - ang * r[1], lin[1] + ang * r[0]]
        bv = [jnp.where(mask, vb[k], bv[k]) for k in range(2)]
    return bv


# ----------------------------------------------------------------------- P2G
def _p2g_kernel(
    starts, lens, bcx, bcy, jbody,
    pdata_ref, itile_ref, btable_ref,
    out_ref, imp_ref,
    pd_big, sem,
    *, group: int, cell_width: float, nc: int, alldesc=(),
    chan_free: bool = False,
):
    j = pl.program_id(0)
    length = lens[j]
    live = length > 0
    maxj = pl.num_programs(0)

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[0] = jnp.zeros((WPAD, 8), jnp.float32)
        imp_ref[0] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(live)
    def _():
        bcell = jnp.stack([bcx[j], bcy[j]])
        pd = _load_pdata_db(pdata_ref, pd_big, sem, starts, lens, j, group, maxj)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, group), 1)[0]
        valid = (lanes < length).astype(jnp.float32)
        w = _window_w(pd, bcell, cell_width, valid)

        mass = pd[PM] * valid
        ap0 = pd[A0 + 0] * pd[PX] + pd[A0 + 1] * pd[PY]
        ap1 = pd[A0 + 2] * pd[PX] + pd[A0 + 3] * pd[PY]
        rows = [
            mass * pd[VX] - ap0 * valid,
            mass * pd[VY] - ap1 * valid,
            mass,
        ] + [pd[A0 + k] * valid for k in range(4)] + [jnp.zeros_like(mass)]
        feats = jnp.stack(rows, axis=0)                          # [8, G]
        xw = _window_positions(bcell, cell_width)                # [WPAD, 2]

        def write_mm(w_c):
            tile = ptf.phys_dot(
                w_c, feats, (((1,), (1,)), ((), ()))
            )                                                    # [WPAD, 8]
            mm_cols = []
            for i in range(2):
                mom = tile[:, i : i + 1]
                for k in range(2):
                    mom = mom + (
                        tile[:, 3 + 2 * i + k : 4 + 2 * i + k]
                        * xw[:, k : k + 1]
                    )
                mm_cols.append(mom)
            mm_cols.append(tile[:, 2:3])
            out_ref[0] = jnp.concatenate(
                mm_cols + [jnp.zeros((WPAD, 5), jnp.float32)], axis=1
            )

        if nc > 0:
            has_b = jbody[j] > 0

            @pl.when(jnp.logical_not(has_b))
            def _():
                write_mm(w)
                imp_ref[0] = jnp.zeros((8, 128), jnp.float32)

            @pl.when(has_b)
            def _():
                if chan_free:
                    _, naff, closest = _moving_node_cdf_2d(
                        xw, btable_ref, alldesc, cell_width
                    )
                else:
                    naff = pltpu.bitcast(itile_ref[0][:, 0:1], jnp.uint32)
                    closest = itile_ref[0][:, 1:2]
                paff = ptf._paff_u32(pd, AFF, AFF_SPARE)
                compat = _compat(naff, paff)
                write_mm(jnp.where(compat, w, 0.0))

                has_body = closest >= 0
                w_i = jnp.where(compat | ~has_body, 0.0, w) * mass[None, :]
                bv = _node_body_velocity(closest, xw, btable_ref, nc)
                ghost = _ghost_velocity(pd, bv)
                vp = [pd[VX][None, :], pd[VY][None, :]]
                dsum = [
                    jnp.sum(w_i * (vp[k] - ghost[k]), axis=1, keepdims=True)
                    for k in range(2)
                ]                                                # [WPAD, 1]
                # 2D torque: cross(D, x_w) scalar per node.
                cr = dsum[0] * xw[:, 1:2] - dsum[1] * xw[:, 0:1]
                rows_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                cols_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                imp_out = jnp.zeros((8, 128), jnp.float32)
                for b in range(nc):
                    mask = (closest == b).astype(jnp.float32)
                    db = [jnp.sum(dsum[k] * mask) for k in range(2)]
                    cb = jnp.sum(cr * mask)
                    comb = [btable_ref[k, b] for k in range(2)]
                    # ang = sum_n cross(d_n, com - x_n)
                    ang = db[0] * comb[1] - db[1] * comb[0] - cb
                    vals = db + [ang]
                    for r in range(3):
                        imp_out = jnp.where(
                            (rows_i == r) & (cols_i == b), vals[r], imp_out
                        )
                imp_ref[0] = imp_out
        else:
            write_mm(w)
            imp_ref[0] = jnp.zeros((8, 128), jnp.float32)


def p2g_tiles(pdata, itiles, btable, jobs, bcells, cfg: GridConfig,
              group: int, nc: int, jbody=None, alldesc=(),
              chan_free: bool = False):
    """(mm [MAXJ, WPAD, 8] cols 0-1 momentum / 2 mass, imp [MAXJ, 8, 128]
    rows 0-1 linear / 2 angular impulse).

    chan_free: the colliders in alldesc ((slot, shape_type) ascending) are
    evaluated IN-KERNEL at the window nodes (_moving_node_cdf_2d); itiles
    is then a resident [1, WPAD, 2] dummy."""
    maxj = jobs["start"].shape[0]
    if jbody is None:
        jbody = jnp.ones((maxj,), jnp.int32)
    kernel = functools.partial(
        _p2g_kernel, group=group, cell_width=cfg.cell_width, nc=nc,
        alldesc=tuple(alldesc), chan_free=chan_free,
    )
    itile_map = (
        (lambda j, *_: (0, 0, 0)) if (chan_free or nc == 0)
        else (lambda j, *_: (j, 0, 0))
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(maxj,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, WPAD, 2), itile_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, WPAD, 8), lambda j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, NCHAN, group + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((maxj, WPAD, 8), jnp.float32),
            jax.ShapeDtypeStruct((maxj, 8, 128), jnp.float32),
        ),
        interpret=_interpret(),
    )(jobs["start"], jobs["len"], bcells[:, 0], bcells[:, 1], jbody,
      pdata, itiles, btable)


# ----------------------------------------------------------------------- G2P
def _g2p_kernel(
    starts, lens, bcx, bcy, jbody,
    pdata_ref, ftile_ref, itile_ref, btable_ref,
    out_hbm,
    pd_big, res_big, outbuf, sem, sem_rd, sem_out,
    *, group: int, cell_width: float, nc: int, alldesc=(),
    chan_free: bool = False, fold_vel: bool = False,
):
    j = pl.program_id(0)
    start = starts[j]
    length = lens[j]
    live = length > 0
    gl = group + 128
    maxj = pl.num_programs(0)

    @pl.when(live)
    def _():
        bcell = jnp.stack([bcx[j], bcy[j]])
        astart = (start // 128) * 128
        off = start - astart
        dma_rd = pltpu.make_async_copy(
            out_hbm.at[:, pl.ds(astart, gl)], outbuf, sem_rd
        )
        dma_rd.start()
        pd = _load_pdata_db(pdata_ref, pd_big, sem, starts, lens, j, group, maxj)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, group), 1)[0]
        valid = (lanes < length).astype(jnp.float32)
        w = _window_w(pd, bcell, cell_width, valid)

        xw = _window_positions(bcell, cell_width)                # [WPAD, 2]
        if fold_vel:
            # In-kernel grid update (grid_update.wgsl:44-65); ftiles carry
            # raw momentum + mass, params ride btable row 13.
            mass_n = ftile_ref[0][:, 2:3]
            inv_m = jnp.where(
                mass_n > 0.0, nr_recip(jnp.maximum(mass_n, 1e-30)), 0.0
            )
            vlim = btable_ref[13, 2]
            v = jnp.concatenate(
                [
                    jnp.clip(
                        (ftile_ref[0][:, k : k + 1]
                         + mass_n * btable_ref[13, k]) * inv_m,
                        -vlim, vlim,
                    )
                    for k in range(2)
                ],
                axis=1,
            )
        else:
            v = ftile_ref[0][:, 0:2]
        vx_cols = [
            v[:, i : i + 1] * xw[:, k : k + 1]
            for i in range(2)
            for k in range(2)
        ]
        nfeat = jnp.concatenate(
            [v] + vx_cols + [jnp.zeros((WPAD, 2), jnp.float32)], axis=1
        )                                                        # [WPAD, 8]

        def finish(out):
            padded = jnp.pad(out, ((0, 0), (0, 128)))
            rolled = pltpu.roll(padded, off, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, gl), 1)
            mask = (lane >= off) & (lane < off + group)
            dma_rd.wait()
            merged = jnp.where(mask, rolled, outbuf[:])
            res_big[:, :] = merged
            dma_out = pltpu.make_async_copy(
                res_big, out_hbm.at[:, pl.ds(astart, gl)], sem_out
            )
            dma_out.start()
            dma_out.wait()

        def plain_out():
            return ptf.phys_dot(
                nfeat, w, (((0,), (0,)), ((), ()))
            )                                                    # [8, G]

        if nc > 0:
            has_b = jbody[j] > 0

            @pl.when(jnp.logical_not(has_b))
            def _():
                finish(plain_out())

            @pl.when(has_b)
            def _():
                if chan_free:
                    _, naff, closest = _moving_node_cdf_2d(
                        xw, btable_ref, alldesc, cell_width
                    )
                else:
                    naff = pltpu.bitcast(itile_ref[0][:, 0:1], jnp.uint32)
                    closest = itile_ref[0][:, 1:2]
                paff = ptf._paff_u32(pd, AFF, AFF_SPARE)
                compat = _compat(naff, paff)
                w_c = jnp.where(compat, w, 0.0)
                w_i = w - w_c
                out = ptf.phys_dot(nfeat, w_c, (((0,), (0,)), ((), ())))
                has_body = closest >= 0
                bv = _node_body_velocity(closest, xw, btable_ref, nc)
                ghost_b = _ghost_velocity(pd, bv)
                vp = [pd[VX][None, :], pd[VY][None, :]]
                ghost = [
                    jnp.where(has_body, ghost_b[i], vp[i]) for i in range(2)
                ]
                add = [
                    jnp.sum(w_i * ghost[i], axis=0, keepdims=True)
                    for i in range(2)
                ]
                madd = [
                    jnp.sum(
                        w_i * ghost[i] * xw[:, k : k + 1],
                        axis=0, keepdims=True,
                    )
                    for i in range(2)
                    for k in range(2)
                ]
                extra = jnp.concatenate(
                    add + madd + [jnp.zeros((2, group), jnp.float32)], axis=0
                )
                finish(out + extra)
        else:
            finish(plain_out())


def g2p_rows(pdata, ftiles, itiles, btable, jobs, bcells, cfg: GridConfig,
             group: int, npad: int, nc: int, jbody=None, alldesc=(),
             chan_free: bool = False, fold_vel: bool = False):
    """[8, NPAD + G + 128]: rows 0-1 PIC velocity, 2-5 velocity moment.

    chan_free / fold_vel: see the 3D twins (ops/pallas_transfer.g2p_rows);
    params for the folded grid update ride btable row 13."""
    maxj = jobs["start"].shape[0]
    if jbody is None:
        jbody = jnp.ones((maxj,), jnp.int32)
    kernel = functools.partial(
        _g2p_kernel, group=group, cell_width=cfg.cell_width, nc=nc,
        alldesc=tuple(alldesc), chan_free=chan_free, fold_vel=fold_vel,
    )
    gl = group + 128
    itile_map = (
        (lambda j, *_: (0, 0, 0)) if (chan_free or nc == 0)
        else (lambda j, *_: (j, 0, 0))
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(maxj,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, WPAD, 4), lambda j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WPAD, 2), itile_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((3, NCHAN, gl), jnp.float32),
            pltpu.VMEM((8, gl), jnp.float32),
            pltpu.VMEM((8, gl), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, npad + group + 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(jobs["start"], jobs["len"], bcells[:, 0], bcells[:, 1], jbody,
      pdata, ftiles, itiles, btable)


# ---------------------------------------------------------------- pCDF (2D)
def _inv3_solve_ch(a, b):
    """Solve 3x3 a x = b channel-wise (cofactor); returns (x, det)."""
    c00 = a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1]
    c01 = a[1, 2] * a[2, 0] - a[1, 0] * a[2, 2]
    c02 = a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0]
    det = a[0, 0] * c00 + a[0, 1] * c01 + a[0, 2] * c02
    inv_det = jnp.where(jnp.abs(det) > 1e-30, nr_recip(det), 0.0)
    i = {}
    i[0, 0] = c00
    i[0, 1] = a[0, 2] * a[2, 1] - a[0, 1] * a[2, 2]
    i[0, 2] = a[0, 1] * a[1, 2] - a[0, 2] * a[1, 1]
    i[1, 0] = c01
    i[1, 1] = a[0, 0] * a[2, 2] - a[0, 2] * a[2, 0]
    i[1, 2] = a[0, 2] * a[1, 0] - a[0, 0] * a[1, 2]
    i[2, 0] = c02
    i[2, 1] = a[0, 1] * a[2, 0] - a[0, 0] * a[2, 1]
    i[2, 2] = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    x = [
        (i[r, 0] * b[0] + i[r, 1] * b[1] + i[r, 2] * b[2]) * inv_det
        for r in range(3)
    ]
    return x, det


def _pcdf_kernel(
    starts, lens, bcx, bcy, jbody,
    pdata_ref, ntile_ref, btable_ref,
    out_hbm,
    pd_big, res_big, outbuf, sem, sem_rd, sem_out,
    *, group: int, cell_width: float, nc: int, alldesc=(),
    chan_free: bool = False,
):
    j = pl.program_id(0)
    start = starts[j]
    length = lens[j]
    live = length > 0
    gl = group + 128
    maxj = pl.num_programs(0)

    @pl.when(live)
    def _():
        astart = (start // 128) * 128
        off = start - astart
        dma_rd = pltpu.make_async_copy(
            out_hbm.at[:, pl.ds(astart, gl)], outbuf, sem_rd
        )
        dma_rd.start()
        pd = _load_pdata_db(pdata_ref, pd_big, sem, starts, lens, j, group, maxj)

        def finish(res):
            padded = jnp.pad(res, ((0, 0), (0, 128)))
            rolled = pltpu.roll(padded, off, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, gl), 1)
            mask = (lane >= off) & (lane < off + group)
            dma_rd.wait()
            merged = jnp.where(mask, rolled, outbuf[:])
            res_big[:, :] = merged
            dma_out = pltpu.make_async_copy(
                res_big, out_hbm.at[:, pl.ds(astart, gl)], sem_out
            )
            dma_out.start()
            dma_out.wait()

        has_b = jbody[j] > 0

        @pl.when(jnp.logical_not(has_b))
        def _():
            finish(jnp.zeros((8, group), jnp.float32))

        @pl.when(has_b)
        def _():
            bcell = jnp.stack([bcx[j], bcy[j]])
            if chan_free:
                xw = _window_positions(bcell, cell_width)
                ndist, naff_u, _ = _moving_node_cdf_2d(
                    xw, btable_ref, alldesc, cell_width
                )
            else:
                aff_lo = ntile_ref[0][:, 0:1]
                aff_hi = ntile_ref[0][:, 1:2]
                ndist = ntile_ref[0][:, 3:4]
                naff_u = pltpu.bitcast(
                    (aff_hi.astype(jnp.int32) << 16)
                    | aff_lo.astype(jnp.int32), jnp.uint32,
                )
            _pcdf_body(
                pd, naff_u, ndist, bcell, length, finish,
                group=group, cell_width=cell_width, nc=nc,
            )


def _pcdf_body(pd, naff_u, ndist, bcell, length, finish, *,
               group: int, cell_width: float, nc: int):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, group), 1)[0]
    valid_f = (lanes < length).astype(jnp.float32)
    w = _window_w(pd, bcell, cell_width, valid_f)            # [WPAD, G]

    # Exact 3^2 stencil support.
    u = pd[0:2] * (1.0 / cell_width)
    base = jnp.floor(u + 0.5).astype(jnp.int32) - 1
    bl = base - bcell[:, None]                               # [2, G]
    wid = jax.lax.broadcasted_iota(jnp.int32, (WPAD, 1), 0)
    wx = wid // 10
    wy = wid % 10
    supp = (
        (wx - bl[0][None, :] >= 0) & (wx - bl[0][None, :] < 3)
        & (wy - bl[1][None, :] >= 0) & (wy - bl[1][None, :] < 3)
        & (wid < WVOL)
    ) & (valid_f[None, :] > 0)

    prev_aff = ptf._paff_u32(pd, AFF, AFF_SPARE)

    p_aff_bits = jnp.zeros((1, group), jnp.uint32)
    sign_word = jnp.zeros((1, group), jnp.uint32)
    for c in range(nc):
        has_c = ((naff_u >> c) & 1) != 0
        present = jnp.max(
            jnp.where(supp & has_c, 1.0, 0.0), axis=0, keepdims=True
        )
        p_aff_bits = p_aff_bits | jnp.where(
            present > 0, jnp.uint32(1 << c), jnp.uint32(0)
        )
        sgn_c = jnp.where(((naff_u >> (16 + c)) & 1) != 0, -1.0, 1.0)
        vote = jnp.sum(
            jnp.where(has_c, w * sgn_c * ndist, 0.0), axis=0, keepdims=True
        )
        prev_has = ((prev_aff >> c) & 1) != 0
        prev_sign = ((prev_aff >> (16 + c)) & 1).astype(jnp.int32).astype(
            jnp.float32
        )
        vote_sign = jnp.where(vote < 0.0, 1.0, 0.0)
        new_sign = jnp.where(prev_has, prev_sign, vote_sign)
        sign_word = sign_word | jnp.where(
            new_sign > 0.5, jnp.uint32(1 << (16 + c)), jnp.uint32(0)
        )
    p_aff = p_aff_bits | sign_word

    combined = naff_u & p_aff & jnp.uint32(0xFFFF)
    use = combined != 0
    sign_diff = ((naff_u ^ p_aff) >> 16) & combined
    sgn = jnp.where(sign_diff == 0, 1.0, -1.0)
    wk = jnp.where(use, w, 0.0)
    sdist = ndist * sgn

    xw = _window_positions(bcell, cell_width)                # [WPAD, 2]
    dx = [xw[:, k : k + 1] - pd[k][None, :] for k in range(2)]

    def rsum(x):
        return jnp.sum(x, axis=0)

    a = {}
    for r in range(2):
        for cix in range(r, 2):
            a[r, cix] = rsum(wk * dx[r] * dx[cix])
    for r in range(2):
        a[r, 2] = rsum(wk * dx[r])
    a[2, 2] = rsum(wk)
    for r in range(3):
        for cix in range(r):
            a[r, cix] = a[cix, r]
    b = [rsum(wk * sdist * dx[k]) for k in range(2)] + [rsum(wk * sdist)]
    x, det = _inv3_solve_ch(a, b)

    ok = det > 1e-8
    nlen = jnp.sqrt(x[0] ** 2 + x[1] ** 2)
    ninv = jnp.where(nlen > 1e-6, nr_recip(jnp.maximum(nlen, 1e-30)), 0.0)
    normal = [jnp.where(ok, x[k] * ninv, 0.0) for k in range(2)]
    sd = jnp.where(ok, x[2], 0.0)
    aff_out = jnp.where(ok, p_aff[0], jnp.uint32(0))

    # Affinity rides as split <=16-bit halves (rows 0 = low, 4 = high) —
    # NaN-safe everywhere downstream (see pallas_transfer._paff_u32).
    aff_i = pltpu.bitcast(aff_out[None, :], jnp.int32)
    res = jnp.concatenate(
        [
            (aff_i & 0xFFFF).astype(jnp.float32),
            sd[None, :],
            normal[0][None, :], normal[1][None, :],
            ((aff_i >> 16) & 0xFFFF).astype(jnp.float32),
            jnp.zeros((3, group), jnp.float32),
        ],
        axis=0,
    )
    finish(res)


def pcdf_rows(pdata, ntiles, btable, jobs, bcells, cfg: GridConfig,
              group: int, npad: int, nc: int, jbody=None, alldesc=(),
              chan_free: bool = False):
    """[8, NPAD + G + 128] rows: aff lo, sd, normal xy, aff hi (row 4).

    chan_free: node CDF evaluated in-kernel from btable (alldesc); ntiles
    is then a resident [1, WPAD, 4] dummy."""
    maxj = jobs["start"].shape[0]
    if jbody is None:
        jbody = jnp.ones((maxj,), jnp.int32)
    kernel = functools.partial(
        _pcdf_kernel, group=group, cell_width=cfg.cell_width, nc=nc,
        alldesc=tuple(alldesc), chan_free=chan_free,
    )
    gl = group + 128
    ntile_map = (
        (lambda j, *_: (0, 0, 0)) if chan_free
        else (lambda j, *_: (j, 0, 0))
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(maxj,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, WPAD, 4), ntile_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((3, NCHAN, gl), jnp.float32),
            pltpu.VMEM((8, gl), jnp.float32),
            pltpu.VMEM((8, gl), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, npad + group + 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(jobs["start"], jobs["len"], bcells[:, 0], bcells[:, 1], jbody,
      pdata, ntiles, btable)
