"""Particle CDF reconstruction (g2p_cdf, 3D), fused with P2G.

Same job machinery as ops/pallas_transfer.py.  Per job of G sorted particles:
window node CDF channels [WPAD, 4] (aff_lo, aff_hi, closest, dist) come
pre-gathered (banded one-hot matmul); the CDF body reproduces
collision/cdf.py:particle_cdf_update:

  * affinity-bit union over the particle's exact 3^3 stencil support
  * per-collider sign votes (Eq. 21, g2p_cdf.wgsl:157-188) with temporal
    sign persistence from the particle's previous affinity word
  * MLS reconstruction of signed distance + normal: 4x4 normal equations
    built from 14 masked [WPAD, G] reductions, solved channel-wise with the
    cofactor inverse (wgebra inv4 equivalent)

Outputs per particle (channel-major rows, RMW writeback like g2p):
  row 0: new affinity word (bitcast f32), 1: signed distance, 2-4: normal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgsparkl_tpu.grid import GridConfig
from wgsparkl_tpu.ops.blocked import sel3_dot_kernel
from wgsparkl_tpu.ops import pallas_transfer as ptf
from wgsparkl_tpu.ops.pallas_transfer import (
    AFF,
    NCHAN,
    WPAD,
    WVOL,
    _interpret,
    _load_pdata_db,
    nr_recip,
    _paff_u32,
    _window_positions,
    _window_w,
)


def _inv4_solve_ch(a, b):
    """Solve 4x4 a x = b with entries as channel arrays; returns (x, det).

    a: dict (i, j) -> [G]; b: list of 4 [G].  Cofactor method (2x2 blocks).
    """
    s0 = a[0, 0] * a[1, 1] - a[1, 0] * a[0, 1]
    s1 = a[0, 0] * a[1, 2] - a[1, 0] * a[0, 2]
    s2 = a[0, 0] * a[1, 3] - a[1, 0] * a[0, 3]
    s3 = a[0, 1] * a[1, 2] - a[1, 1] * a[0, 2]
    s4 = a[0, 1] * a[1, 3] - a[1, 1] * a[0, 3]
    s5 = a[0, 2] * a[1, 3] - a[1, 2] * a[0, 3]
    c5 = a[2, 2] * a[3, 3] - a[3, 2] * a[2, 3]
    c4 = a[2, 1] * a[3, 3] - a[3, 1] * a[2, 3]
    c3 = a[2, 1] * a[3, 2] - a[3, 1] * a[2, 2]
    c2 = a[2, 0] * a[3, 3] - a[3, 0] * a[2, 3]
    c1 = a[2, 0] * a[3, 2] - a[3, 0] * a[2, 2]
    c0 = a[2, 0] * a[3, 1] - a[3, 0] * a[2, 1]
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0

    i = {}
    i[0, 0] = a[1, 1] * c5 - a[1, 2] * c4 + a[1, 3] * c3
    i[0, 1] = -a[0, 1] * c5 + a[0, 2] * c4 - a[0, 3] * c3
    i[0, 2] = a[3, 1] * s5 - a[3, 2] * s4 + a[3, 3] * s3
    i[0, 3] = -a[2, 1] * s5 + a[2, 2] * s4 - a[2, 3] * s3
    i[1, 0] = -a[1, 0] * c5 + a[1, 2] * c2 - a[1, 3] * c1
    i[1, 1] = a[0, 0] * c5 - a[0, 2] * c2 + a[0, 3] * c1
    i[1, 2] = -a[3, 0] * s5 + a[3, 2] * s2 - a[3, 3] * s1
    i[1, 3] = a[2, 0] * s5 - a[2, 2] * s2 + a[2, 3] * s1
    i[2, 0] = a[1, 0] * c4 - a[1, 1] * c2 + a[1, 3] * c0
    i[2, 1] = -a[0, 0] * c4 + a[0, 1] * c2 - a[0, 3] * c0
    i[2, 2] = a[3, 0] * s4 - a[3, 1] * s2 + a[3, 3] * s0
    i[2, 3] = -a[2, 0] * s4 + a[2, 1] * s2 - a[2, 3] * s0
    i[3, 0] = -a[1, 0] * c3 + a[1, 1] * c1 - a[1, 2] * c0
    i[3, 1] = a[0, 0] * c3 - a[0, 1] * c1 + a[0, 2] * c0
    i[3, 2] = -a[3, 0] * s3 + a[3, 1] * s1 - a[3, 2] * s0
    i[3, 3] = a[2, 0] * s3 - a[2, 1] * s1 + a[2, 2] * s0

    inv_det = jnp.where(jnp.abs(det) > 1e-30, nr_recip(det), 0.0)
    x = [
        (i[r, 0] * b[0] + i[r, 1] * b[1] + i[r, 2] * b[2] + i[r, 3] * b[3])
        * inv_det
        for r in range(4)
    ]
    return x, det


@functools.lru_cache(maxsize=None)
def _box27_np(wsh, wpad: int):
    """Static 27-box window matrix B [wpad, wpad] (numpy, cached).

    B[n, m] = 1 iff window node m = n + (ox, oy, oz), o in {0,1,2}^3, with
    all coordinates in window bounds.  (B @ has)[n, c] then counts the
    collider-c nodes in the 3^3 stencil rooted at n — the per-particle
    stencil support union (g2p_cdf.wgsl:157-188's in-bounds criterion)
    becomes one exact DEFAULT-precision dot against the particle's base-
    node one-hot instead of a ~12-pass [WPAD, G] VPU support plane."""
    wvol = wsh[0] * wsh[1] * wsh[2]
    n = np.arange(wvol)
    nx = n // (wsh[1] * wsh[2])
    ny = (n // wsh[2]) % wsh[1]
    nz = n % wsh[2]
    mat = np.zeros((wpad, wpad), np.float32)
    for ox in range(3):
        for oy in range(3):
            for oz in range(3):
                ok = (
                    (nx + ox < wsh[0]) & (ny + oy < wsh[1])
                    & (nz + oz < wsh[2])
                )
                m = (
                    (nx + ox) * (wsh[1] * wsh[2])
                    + (ny + oy) * wsh[2] + (nz + oz)
                )
                mat[n[ok], m[ok]] = 1.0
    return mat


def _pcdf_body(pd, naff_u, ndist, boxmat_ref, bcell, length, finish, *,
               group: int, cell_width: float, nc: int,
               wsh=(6, 6, 6), wpad: int = WPAD):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, group), 1)[0]
    valid_f = (lanes < length).astype(jnp.float32)
    w = _window_w(pd, bcell, cell_width, valid_f, wsh, wpad)  # [WPAD, G]

    # Exact 3^3 stencil support (unions include zero-weight stencil nodes,
    # matching particle_cdf_update's in-bounds criterion), encoded as the
    # particle's base-node one-hot: the box sums ride _box27_np below.
    h = cell_width
    u = pd[0:3] * (1.0 / h)
    base = jnp.floor(u + 0.5).astype(jnp.int32) - 1
    bl = base - bcell[:, None]                               # [3, G]
    wid = jax.lax.broadcasted_iota(jnp.int32, (wpad, 1), 0)
    flat_base = bl[0] * (wsh[1] * wsh[2]) + bl[1] * wsh[2] + bl[2]
    onehot = jnp.where(
        (wid == flat_base[None, :]) & (valid_f[None, :] > 0), 1.0, 0.0
    )                                                        # [WPAD, G]

    # naff_u / ndist: merged window node CDF [WPAD, 1] (gathered static
    # channels, plus the in-kernel moving-collider CDF at gate level >= 2).
    prev_aff = _paff_u32(pd)                                    # [1, G]

    # Per-collider union + sign votes, MXU-formulated: presence and vote
    # are both contractions over the window axis against per-node collider
    # columns, so ONE [nc-row] matmul each replaces nc masked [WPAD, G]
    # reduction passes on the VPU (the kernels are VPU-bound, not
    # DMA-bound, at 1M particles).
    has_cols = []
    hsgn_cols = []
    for c in range(nc):
        has_c = (((naff_u >> c) & 1) != 0).astype(jnp.float32)   # [WPAD, 1]
        sgn_c = jnp.where(((naff_u >> (16 + c)) & 1) != 0, -1.0, 1.0)
        has_cols.append(has_c)
        hsgn_cols.append(has_c * sgn_c)
    has_m = jnp.concatenate(has_cols, axis=1)                 # [WPAD, nc]
    hsgn_m = jnp.concatenate(hsgn_cols, axis=1)               # [WPAD, nc]
    # presents[c, p] = (B @ has)[base(p), c]: integer 0/1 and <=27-count
    # operands are bf16-exact, so both dots are EXACT at one DEFAULT pass.
    box = jax.lax.dot_general(
        boxmat_ref[...], has_m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )                                                         # [WPAD, nc]
    presents = jax.lax.dot_general(
        box, onehot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )                                                         # [nc, G]
    # votes against the +-1 selector: ndist folds into the payload side so
    # the 3-pass exact selection dot applies (2x fewer MXU passes than
    # HIGHEST; f32-roundoff-class like any scatter-add).
    votes = sel3_dot_kernel(
        hsgn_m, ndist * w, (((0,), (0,)), ((), ())), "b"
    )                                                         # [nc, G]
    p_aff_bits = jnp.zeros((1, group), jnp.uint32)
    sign_word = jnp.zeros((1, group), jnp.uint32)
    for c in range(nc):
        p_aff_bits = p_aff_bits | jnp.where(
            presents[c : c + 1, :] > 0, jnp.uint32(1 << c), jnp.uint32(0)
        )
        prev_has = ((prev_aff >> c) & 1) != 0
        prev_sign = ((prev_aff >> (16 + c)) & 1).astype(jnp.int32).astype(
            jnp.float32
        )
        vote_sign = jnp.where(votes[c : c + 1, :] < 0.0, 1.0, 0.0)
        new_sign = jnp.where(prev_has, prev_sign, vote_sign)
        sign_word = sign_word | jnp.where(
            new_sign > 0.5, jnp.uint32(1 << (16 + c)), jnp.uint32(0)
        )
    p_aff = p_aff_bits | sign_word                            # [1, G]

    # MLS over nodes sharing affinity with the particle.
    combined = naff_u & p_aff & jnp.uint32(0xFFFF)            # [WPAD, G]
    use = combined != 0
    sign_diff = ((naff_u ^ p_aff) >> 16) & combined
    sgn = jnp.where(sign_diff == 0, 1.0, -1.0)
    wk = jnp.where(use, w, 0.0)
    sdist = ndist * sgn                                       # [WPAD, G]

    # MLS normal-equation moments on the MXU: with node positions in
    # job-local coordinates (x_l = x - block_origin, so |x_l| <= 6h and
    # the monomial expansion stays well-conditioned in f32),
    #   sum_w wk dx_r dx_c = S_rc - p_r S_c - p_c S_r + p_r p_c S
    # where S_* are moments of wk against static node monomials — one
    # [10, G] matmul + channelwise assembly replaces 14 masked [WPAD, G]
    # reduction passes.
    xw = _window_positions(bcell, cell_width, wsh, wpad)      # [WPAD, 3]
    offs = bcell.astype(jnp.float32) * cell_width             # [3]
    xl = xw - offs[None, :]                                   # [WPAD, 3]
    pl_ = [pd[k] - offs[k] for k in range(3)]                 # [G] each
    mono = jnp.concatenate(
        [
            jnp.ones((wpad, 1), jnp.float32), xl,
            xl[:, 0:1] * xl,                 # xx xy xz
            xl[:, 1:2] * xl[:, 1:3],         # yy yz
            xl[:, 2:3] * xl[:, 2:3],         # zz
        ],
        axis=1,
    )                                                         # [WPAD, 10]
    smom = ptf.phys_dot(mono, wk, (((0,), (0,)), ((), ())))   # [10, G]
    tmom = ptf.phys_dot(
        mono[:, :4], wk * sdist, (((0,), (0,)), ((), ()))
    )                                                         # [4, G]
    pair = {(0, 0): 4, (0, 1): 5, (0, 2): 6, (1, 1): 7, (1, 2): 8, (2, 2): 9}
    a = {}
    for r in range(3):
        for cix in range(r, 3):
            a[r, cix] = (
                smom[pair[r, cix]]
                - pl_[r] * smom[1 + cix] - pl_[cix] * smom[1 + r]
                + pl_[r] * pl_[cix] * smom[0]
            )
    for r in range(3):
        a[r, 3] = smom[1 + r] - pl_[r] * smom[0]
    a[3, 3] = smom[0]
    for r in range(4):
        for cix in range(r):
            a[r, cix] = a[cix, r]
    b = [tmom[1 + k] - pl_[k] * tmom[0] for k in range(3)] + [tmom[0]]
    x, det = _inv4_solve_ch(a, b)

    ok = det > 1e-8
    nlen = jnp.sqrt(x[0] ** 2 + x[1] ** 2 + x[2] ** 2)
    ninv = jnp.where(nlen > 1e-6, nr_recip(jnp.maximum(nlen, 1e-30)), 0.0)
    normal = [jnp.where(ok, x[k] * ninv, 0.0) for k in range(3)]
    sd = jnp.where(ok, x[3], 0.0)
    aff_out = jnp.where(ok, p_aff[0], jnp.uint32(0))

    # Affinity rides as split <=16-bit halves (rows 0 = low, 5 = high) —
    # NaN-safe everywhere downstream (see pallas_transfer._paff_u32).
    aff_i = pltpu.bitcast(aff_out[None, :], jnp.int32)
    res = jnp.concatenate(
        [
            (aff_i & 0xFFFF).astype(jnp.float32),
            sd[None, :],
            normal[0][None, :], normal[1][None, :], normal[2][None, :],
            ((aff_i >> 16) & 0xFFFF).astype(jnp.float32),
            jnp.zeros((2, group), jnp.float32),
        ],
        axis=0,
    )                                                         # [8, G]
    finish(res)
    return aff_out, sd, normal


# ------------------------------------------------- merged pCDF + P2G kernel
#
# The particle-CDF reconstruction and P2G share the same particle windows
# and job machinery; merging them drops a whole kernel launch + its
# particle-channel DMA stream, and P2G consumes the FRESH affinity/normals
# directly instead of a patched pdata round trip.  (G2P still needs the
# patched pdata, which the pipeline keeps building from this kernel's
# row output.)

from wgsparkl_tpu.ops.pallas_transfer import (  # noqa: E402
    A0,
    PM,
    PX,
    PY,
    PZ,
    VX,
    VY,
    VZ,
    _compat,
    _ghost_velocity,
    _node_body_velocity,
)


def _p2g_cdf_kernel(
    starts, lens, bcx, bcy, bcz, jbody,
    pdata_ref, ntile_ref, btable_ref, boxmat_ref,
    out_mm, out_imp, out_hbm,
    pd_big, res_big, sem, sem_out,
    *, group: int, cell_width: float, nc: int,
    wsh=(6, 6, 6), wpad: int = WPAD, moving=(), static_desc=(),
    chan_free: bool = False,
):
    j = pl.program_id(0)
    start = starts[j]
    length = lens[j]
    live = length > 0
    gl = group + 128
    maxj = pl.num_programs(0)

    # imp is a persistent VMEM accumulator (constant-index output block):
    # one flush at the end of the grid instead of a 4 KB DMA per job.
    @pl.when(j == 0)
    def _():
        out_imp[0] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(jnp.logical_not(live))
    def _():
        out_mm[0] = jnp.zeros((wpad, 8), jnp.float32)

    @pl.when(live)
    def _():
        bcell = jnp.stack([bcx[j], bcy[j], bcz[j]])
        astart = (start // 128) * 128
        off = start - astart
        wslot = jax.lax.rem(j, 2)

        pd = _load_pdata_db(pdata_ref, pd_big, sem, starts, lens, j, group, maxj)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, group), 1)[0]
        valid = (lanes < length).astype(jnp.float32)
        w = _window_w(pd, bcell, cell_width, valid, wsh, wpad)
        xw = _window_positions(bcell, cell_width, wsh, wpad)    # [WPAD, 3]

        mass = pd[PM] * valid
        ap0 = pd[A0 + 0] * pd[PX] + pd[A0 + 1] * pd[PY] + pd[A0 + 2] * pd[PZ]
        ap1 = pd[A0 + 3] * pd[PX] + pd[A0 + 4] * pd[PY] + pd[A0 + 5] * pd[PZ]
        ap2 = pd[A0 + 6] * pd[PX] + pd[A0 + 7] * pd[PY] + pd[A0 + 8] * pd[PZ]
        feats = ptf._p2g_feats32(pd, mass, valid, ap0, ap1, ap2)  # [32, G]

        def finish(res):
            # VMEM handoff instead of an HBM read-modify-write — see
            # _g2p_kernel.finish for the invariants.
            padded = jnp.pad(res, ((0, 0), (0, 128)))
            rolled = pltpu.roll(padded, off, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, gl), 1)
            pj = jnp.maximum(j - 1, 0)
            shift = astart - (starts[pj] // 128) * 128
            prev = pltpu.roll(res_big[1 - wslot], gl - shift, axis=1)
            merged = jnp.where(lane < off, prev, rolled)
            res_big[wslot] = merged

            @pl.when(j > 0)
            def _():
                pltpu.make_async_copy(
                    res_big.at[1 - wslot], out_hbm.at[:, pl.ds(0, gl)],
                    sem_out.at[1 - wslot],
                ).wait()

            pltpu.make_async_copy(
                res_big.at[wslot], out_hbm.at[:, pl.ds(astart, gl)],
                sem_out.at[wslot],
            ).start()
            nxt = jnp.minimum(j + 1, maxj - 1)
            last_live = (j + 1 >= maxj) | (lens[nxt] == 0)

            @pl.when(last_live)
            def _():
                pltpu.make_async_copy(
                    res_big.at[wslot], out_hbm.at[:, pl.ds(astart, gl)],
                    sem_out.at[wslot],
                ).wait()

        def write_mm(w_c):
            out_mm[0] = ptf._mm_from_feats32(w_c, feats, xw)

        def pcdf_and_mm(merged):
            # merged: (naff_u, closest, ndist) window CDF — gathered static
            # channels at level 1, static + in-kernel moving CDF at level 2
            # (ptf._merge_ntile_cdf; moving never touches HBM channels).
            naff_u, closest, ndist = merged
            aff_out, sd, normal = _pcdf_body(
                pd, naff_u, ndist, boxmat_ref, bcell, length, finish,
                group=group, cell_width=cell_width, nc=nc,
                wsh=wsh, wpad=wpad,
            )
            paff = aff_out[None, :]                             # [1, G] uint32
            compat = _compat(naff_u, paff)
            write_mm(jnp.where(compat, w, 0.0))
            return normal, closest, compat

        def lvl1_cdf():
            if chan_free:
                dd, aa, cc = ptf._moving_node_cdf(
                    xw, btable_ref, static_desc, cell_width
                )
                return aa, cc, dd
            return ptf._static_ntile_cdf(ntile_ref[0])

        def lvl2_cdf():
            if chan_free:
                dd, aa, cc = ptf._moving_node_cdf(
                    xw, btable_ref, tuple(sorted(static_desc + moving)),
                    cell_width,
                )
                return aa, cc, dd
            return ptf._merge_ntile_cdf(
                ntile_ref[0], xw, btable_ref, moving, cell_width
            )

        lvl = jbody[j]

        @pl.when(lvl == 0)
        def _():
            finish(jnp.zeros((8, group), jnp.float32))
            write_mm(w)

        @pl.when(lvl == 1)
        def _():
            # Static-collider window (_jbody_gate level 1): the particle
            # CDF + compat-masked P2G still run, but CPIC impulses land
            # only on the (static) closest bodies, which discard them —
            # the whole [WPAD, G] pairwise ghost/impulse chain is skipped.
            pcdf_and_mm(lvl1_cdf())

        @pl.when(lvl >= 2)
        def _():
            normal, closest, compat = pcdf_and_mm(lvl2_cdf())
            has_body = closest >= 0
            w_i = jnp.where(compat | ~has_body, 0.0, w) * mass[None, :]
            bv = _node_body_velocity(closest, xw, btable_ref, nc)
            nrm = [normal[k][None, :] for k in range(3)]
            ghost = _ghost_velocity(pd, bv, nrm=nrm)
            vp = [pd[VX][None, :], pd[VY][None, :], pd[VZ][None, :]]
            dsum = [
                jnp.sum(w_i * (vp[k] - ghost[k]), axis=1, keepdims=True)
                for k in range(3)
            ]
            cr = [
                dsum[1] * xw[:, 2:3] - dsum[2] * xw[:, 1:2],
                dsum[2] * xw[:, 0:1] - dsum[0] * xw[:, 2:3],
                dsum[0] * xw[:, 1:2] - dsum[1] * xw[:, 0:1],
            ]
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            cols_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            imp_out = jnp.zeros((8, 128), jnp.float32)
            for b in range(nc):
                bmask = (closest == b).astype(jnp.float32)
                db = [jnp.sum(dsum[k] * bmask) for k in range(3)]
                cb = [jnp.sum(cr[k] * bmask) for k in range(3)]
                comb = [btable_ref[k, b] for k in range(3)]
                ang = [
                    db[1] * comb[2] - db[2] * comb[1] - cb[0],
                    db[2] * comb[0] - db[0] * comb[2] - cb[1],
                    db[0] * comb[1] - db[1] * comb[0] - cb[2],
                ]
                vals = db + ang
                for r in range(6):
                    imp_out = jnp.where(
                        (rows_i == r) & (cols_i == b), vals[r], imp_out
                    )
            out_imp[0] = out_imp[0] + imp_out


def p2g_cdf_tiles(pdata, ntiles, btable, jobs, bcells, cfg: GridConfig,
                  group: int, npad: int, nc: int, jbody, by: int = 4,
                  moving=(), static_desc=(), chan_free: bool = False):
    """Fused particle-CDF + P2G (nc > 0 only).

    Returns (mm [MAXJ, WPAD, 8], imp [MAXJ, 8, 128],
    pcdf rows [8, NPAD + G + 128]: aff lo, sd, normal xyz, aff hi).

    chan_free: ALL analytic collider CDF is evaluated in-kernel at the
    window nodes (ptf._moving_node_cdf; static_desc at gate level 1,
    static_desc + moving at level 2); ntiles is then a resident
    [1, WPAD, 4] dummy.  Otherwise ntiles carry gathered node channels
    (the mesh-collider path) and `moving` is merged in-kernel on top."""
    from wgsparkl_tpu.ops.pallas_transfer import window_geom

    wsh, _, wpad = window_geom(by)
    maxj = jobs["start"].shape[0]
    kernel = functools.partial(
        _p2g_cdf_kernel, group=group, cell_width=cfg.cell_width, nc=nc,
        wsh=wsh, wpad=wpad, moving=tuple(moving),
        static_desc=tuple(static_desc), chan_free=chan_free,
    )
    gl = group + 128
    itile_map = (
        (lambda j, *_: (0, 0, 0)) if chan_free
        else (lambda j, *_: (j, 0, 0))
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(maxj,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, wpad, 4), itile_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 128), lambda j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpad, wpad), lambda j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, wpad, 8), lambda j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda j, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, NCHAN, gl), jnp.float32),
            pltpu.VMEM((2, 8, gl), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((maxj, wpad, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, npad + group + 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(jobs["start"], jobs["len"], bcells[:, 0], bcells[:, 1],
      bcells[:, 2], jbody, pdata, ntiles, btable,
      jnp.asarray(_box27_np(tuple(wsh), wpad)))
