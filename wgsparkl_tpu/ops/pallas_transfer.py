"""Pallas TPU kernels for the P2G / G2P transfers (3D), with CPIC coupling.

Why Pallas: XLA's general gather/scatter lowering on TPU serializes per
element, and [N, 3]/[N, 3, 3] layouts waste VPU lanes.  These kernels give
the transfers the layout they want:

  * particle state is CHANNEL-MAJOR: one [24, NPAD] f32 array (rows =
    px py pz vx vy vz m A00..A22 aff nx ny nz) so a job's particles are one
    contiguous [24, G] DMA with N on the lane axis;
  * per job, the window weight matrix W [216(pad 224), G] is built with
    elementwise FMAs (window nodes on sublanes, particles on lanes) and the
    transfer core is ONE MXU matmul per job:
        P2G: tile[224, 16] = W_compat @ feats^T  (contract G, the lane axis)
        G2P: out[G, 16]    = W_compat^T @ nfeat  (contract the window axis)
  * CPIC affinity compatibility (grid.wgsl:250-255) is an elementwise
    [224, G] mask multiplied into W; incompatible pairs go through the
    pairwise ghost-velocity / impulse paths (p2g.wgsl:200-231,
    g2p.wgsl:184-207) as [224, G] VPU arrays reduced on the spot;
  * the job table (start / len / block cell) is scalar-prefetched so DMA
    offsets are ready before the body runs.

The surrounding XLA does only slab-indexed work (per-job node-tile gather /
scatter with J indices — few indices, big payloads), never per-element
gathers.  The sequential TPU grid + contiguous job rank ranges let G2P write
per-particle outputs with plain dynamic DMA stores (a job's padded tail is
overwritten by the next job's real rows; dead jobs park at a sentinel row).

Reference kernels rebuilt here: p2g.wgsl:69-236, g2p.wgsl:44-238.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgsparkl_tpu.grid import GridConfig
from wgsparkl_tpu.ops.transfer import DEFAULT_FRICTION

# pdata channel-row indices
PX, PY, PZ, VX, VY, VZ, PM = 0, 1, 2, 3, 4, 5, 6
A0 = 7       # A00..A22 in rows 7..15
AFF = 16     # affinity LOW 16 bits as an integer-valued f32 (see _paff_u32)
NX, NY, NZ = 17, 18, 19  # particle CDF normal
AFF_SPARE = 20  # affinity HIGH (sign) 16 bits as an integer-valued f32
NCHAN = 24

# Extended packed-state rows (sorted as ONE [N, PCHAN] row gather; rows
# 0..NCHAN-1 are the kernel pdata layout above, the rest carry the
# particle-update STATE channels through the per-substep sort.
# Two layout invariants shrink the moved payload:
#   * rows >= PERM_ROWS (sd, rigid contact velocity, pads) are RECOMPUTED
#     by the update kernel after every sort before any read, so the
#     banded lane permutation skips them;
#   * immutable per-particle constants (lam, mu, DP params, max_stretch,
#     init volume/radius) don't ride at all — they collapse into the
#     [16, 128] material table (Models.mat_table, lanes = material ids,
#     MTAB_* rows) looked up in-kernel by the R_MID id row.
R_IDS = 21          # particle identity (NCHAN pad slot; rides pdata DMA)
R_MID = 22          # material id (NCHAN pad slot)
R_DPS0 = 24         # det hardening log_vol_gain (3 rows)
R_PHASE = 27
R_F0 = 28           # F00..F22 (9 rows)
PERM_ROWS = 40      # rows [0, PERM_ROWS) move in the re-sort permute
R_SD = 40           # particle CDF signed distance (fresh every substep)
R_RV0 = 41          # rigid contact velocity (3 rows, fresh every substep)
PCHAN = 48          # padded to a multiple of 8 sublanes
DP_KEYS = ("h0", "h1", "h2", "h3", "lam", "mu")
DPS_KEYS = ("det", "hardening", "log_vol_gain")

# Material-table rows (Models.mat_table [16, 128]; lanes = material ids).
MTAB_LAM, MTAB_MU, MTAB_DP0 = 0, 1, 2          # dp h0..h3, lam, mu = 2..7
MTAB_STRETCH, MTAB_VOL, MTAB_RAD = 8, 9, 10

WVOL = 216   # 6^3 window (the isotropic by=4 default)
WPAD = 224   # sublane-padded window rows (multiple of 8)


def window_geom(by: int = 4):
    """(wsh, wvol, wpad) for anisotropic 4 x by x 4 blocks (ops/blocked.py
    block_shape): window = block + 2-node halo per axis.  by > 4 packs more
    particles per job (a full block at 8/cell holds 128*by), halving the
    job count at by=8 — kernel lanes fill and per-job overheads amortize."""
    wsh = (6, by + 2, 6)
    wvol = wsh[0] * wsh[1] * wsh[2]
    wpad = -(-wvol // 8) * 8
    return wsh, wvol, wpad


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests / virtual meshes)."""
    return jax.default_backend() != "tpu"

def pack_state_rows(particles, models):
    """Full per-particle state -> [PCHAN, N] channel-major row matrix.

    ONE banded lane permutation (ops/permute.py) then replaces ~40 per-leaf
    gathers on re-sort (XLA TPU gathers serialize per index).  Rows
    0..NCHAN-1 are the kernel pdata layout.
    """
    n = particles.count
    z = jnp.zeros((n,), jnp.float32)
    cols = [
        particles.pos[:, 0], particles.pos[:, 1], particles.pos[:, 2],
        particles.vel[:, 0], particles.vel[:, 1], particles.vel[:, 2],
        particles.mass,
    ]
    a = particles.affine.reshape(n, 9)
    cols += [a[:, k] for k in range(9)]
    assert models.mat_id is not None, (
        "pallas row packing needs the deduplicated material table — "
        "construct the scene through MpmData (it fills Models.mat_id / "
        "mat_table), or call solver.attach_material_table(particles, models)"
    )
    cols += [
        # Affinity word split into two <=16-bit integer-valued f32 rows
        # (AFF = low bits, AFF_SPARE = sign bits) — see _paff_u32.
        (particles.cdf_affinity & jnp.uint32(0xFFFF)).astype(jnp.float32),
        particles.cdf_normal[:, 0], particles.cdf_normal[:, 1],
        particles.cdf_normal[:, 2],
        (particles.cdf_affinity >> 16).astype(jnp.float32),  # AFF_SPARE
        particles.ids.astype(jnp.float32),     # R_IDS
        models.mat_id,                         # R_MID
        z,                                     # pad to NCHAN
    ]
    cols += [models.dp_state[k] for k in DPS_KEYS]
    cols += [models.phase]
    f = particles.def_grad.reshape(n, 9)
    cols += [f[:, k] for k in range(9)]
    cols += [z, z, z]                          # pad to PERM_ROWS
    cols += [
        particles.cdf_signed_distance,
        particles.cdf_rigid_vel[:, 0], particles.cdf_rigid_vel[:, 1],
        particles.cdf_rigid_vel[:, 2],
    ]
    cols += [z] * (PCHAN - len(cols))
    return jnp.stack(cols, axis=0)


def pack_rows_padded(particles, models, npad: int):
    """pack_state_rows lane-padded to npad; pad lanes get F = I so the
    per-substep constitutive math on them stays finite (they are masked out
    of every transfer and sort to the tail of the overflow bucket)."""
    n = particles.count
    rows = jnp.pad(pack_state_rows(particles, models), ((0, 0), (0, npad - n)))
    for r in (R_F0, R_F0 + 4, R_F0 + 8):
        rows = rows.at[r, n:].set(1.0)
    return rows


def _mtab_lookup(table, mid, r: int, n_mat: int):
    """[N] constant from material-table row r by per-particle id (static
    where-chain over the n_mat materials — exact, no gathers)."""
    out = jnp.full(mid.shape, table[r, 0])
    for m in range(1, n_mat):
        out = jnp.where(mid == m, table[r, m], out)
    return out


def unpack_state_rows(rows, particles, models, n_mat: int = 1):
    """[PCHAN, N] sorted channel rows -> (particles, models) pytrees.

    n_mat: static material count (MpmConfig.n_materials) for the
    constant-row reconstruction from Models.mat_table."""
    n = particles.count
    pos = rows[0:3, :].T
    vel = rows[3:6, :].T
    mass = rows[PM]
    affine = rows[A0 : A0 + 9, :].T.reshape(n, 3, 3)
    aff = rows[AFF].astype(jnp.uint32) | (
        rows[AFF_SPARE].astype(jnp.uint32) << 16
    )
    mid = rows[R_MID]
    tab = models.mat_table
    new_p = particles.replace(
        pos=pos, vel=vel, mass=mass, affine=affine, cdf_affinity=aff,
        def_grad=rows[R_F0 : R_F0 + 9, :].T.reshape(n, 3, 3),
        init_volume=_mtab_lookup(tab, mid, MTAB_VOL, n_mat),
        init_radius=_mtab_lookup(tab, mid, MTAB_RAD, n_mat),
        ids=rows[R_IDS].astype(jnp.int32),
        cdf_normal=rows[NX : NX + 3, :].T,
        cdf_signed_distance=rows[R_SD],
        cdf_rigid_vel=rows[R_RV0 : R_RV0 + 3, :].T,
    )
    new_m = models.replace(
        lam=_mtab_lookup(tab, mid, MTAB_LAM, n_mat),
        mu=_mtab_lookup(tab, mid, MTAB_MU, n_mat),
        dp={k: _mtab_lookup(tab, mid, MTAB_DP0 + i, n_mat)
            for i, k in enumerate(DP_KEYS)},
        dp_state={k: rows[R_DPS0 + i] for i, k in enumerate(DPS_KEYS)},
        phase=rows[R_PHASE],
        max_stretch=_mtab_lookup(tab, mid, MTAB_STRETCH, n_mat),
        mat_id=mid,
    )
    return new_p, new_m


def _axis_w(xf, bl, nrows: int = 8):
    g = xf.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nrows, g), 0)
    rel = rows - bl[None, :]
    w0 = 0.5 * (1.5 - xf) ** 2
    w1 = 0.75 - (xf - 1.0) ** 2
    w2 = 0.5 * (xf - 0.5) ** 2
    w = jnp.where(rel == 0, w0[None, :], 0.0)
    w = jnp.where(rel == 1, w1[None, :], w)
    w = jnp.where(rel == 2, w2[None, :], w)
    return w


def _window_w(pd, bcell, h, valid, wsh=(6, 6, 6), wpad: int = WPAD):
    """W [wpad, G] window weights from particle positions."""
    g = pd.shape[-1]
    u = pd[0:3] * (1.0 / h)
    base = jnp.floor(u + 0.5).astype(jnp.int32) - 1
    xf = u - base.astype(jnp.float32)
    bl = base - bcell[:, None]
    wvol = wsh[0] * wsh[1] * wsh[2]
    wx = _axis_w(xf[0], bl[0], -(-wsh[0] // 8) * 8)[: wsh[0]]
    wy = _axis_w(xf[1], bl[1], -(-wsh[1] // 8) * 8)[: wsh[1]]
    wz = _axis_w(xf[2], bl[2], -(-wsh[2] // 8) * 8)[: wsh[2]]
    w = (
        (wx[:, None, :] * wy[None, :, :]).reshape(wsh[0] * wsh[1], 1, g)
        * wz[None, :, :]
    )
    w = w.reshape(wvol, g) * valid[None, :]
    return jnp.pad(w, ((0, wpad - wvol), (0, 0)))


def _window_positions(bcell, cell_width, wsh=(6, 6, 6), wpad: int = WPAD):
    """[wpad, 3] world positions of window nodes (computed via iota)."""
    wid = jax.lax.broadcasted_iota(jnp.int32, (wpad, 1), 0)
    offs = jnp.concatenate(
        [wid // (wsh[1] * wsh[2]), (wid // wsh[2]) % wsh[1], wid % wsh[2]],
        axis=1,
    ).astype(jnp.float32)
    return (offs + bcell.astype(jnp.float32)[None, :]) * cell_width


def _compat(naff_col, paff_row):
    """CPIC compatibility mask [WPAD, G] (grid.wgsl:250-255)."""
    common = naff_col & paff_row & jnp.uint32(0xFFFF)
    s1 = (naff_col >> 16) & common
    s2 = (paff_row >> 16) & common
    return s1 == s2


def _paff_u32(pd, aff_row: int = AFF, spare_row: int = AFF_SPARE):
    """Particle affinity word [1, G] from the split halves in the rows.

    The state carries the 16+16-bit CPIC affinity word as TWO <=16-bit
    integer-valued f32 rows (AFF = low/affinity bits, AFF_SPARE =
    high/sign bits): a single f32-bitcast word can hold an all-ones
    exponent bit pattern at >= 15 colliders (sign bits land in f32 bits
    23-30), i.e. a NaN payload that NaN*0-poisons any one-hot matmul or
    masked multiply the row rides (re-sort permute, migration buffers).
    Split halves are plain small integers — safe everywhere — and lift
    the pallas collider cap to the reference's 16 (collide.wgsl:36)."""
    w = (pd[spare_row : spare_row + 1, :].astype(jnp.int32) << 16) | pd[
        aff_row : aff_row + 1, :
    ].astype(jnp.int32)
    return pltpu.bitcast(w, jnp.uint32)


def _ghost_velocity(pd, bv, friction=DEFAULT_FRICTION, nrm=None):
    """CPIC ghost velocity per (window node, particle) pair.

    pd: [24, G] particle channels; bv: tuple of [WPAD, 1] body velocities;
    nrm: optional [1, G] normal channels (default: pdata normal rows).
    Returns 3 arrays [WPAD, G].
    """
    u = [pd[VX][None, :] - bv[0], pd[VY][None, :] - bv[1], pd[VZ][None, :] - bv[2]]
    if nrm is None:
        nrm = [pd[NX][None, :], pd[NY][None, :], pd[NZ][None, :]]
    nv = u[0] * nrm[0] + u[1] * nrm[1] + u[2] * nrm[2]
    tang = [u[i] - nrm[i] * nv for i in range(3)]
    tl2 = tang[0] ** 2 + tang[1] ** 2 + tang[2] ** 2
    tl = jnp.sqrt(tl2)
    inv_tl = jnp.where(tl > 1e-8, nr_recip(jnp.maximum(tl, 1e-30)), 0.0)
    scale = jnp.maximum(0.0, tl + friction * nv) * inv_tl
    proj = [tang[i] * scale for i in range(3)]
    sliding = nv < 0.0
    rel = [jnp.where(sliding, proj[i], u[i]) for i in range(3)]
    return [bv[i] + rel[i] for i in range(3)]


def _ghost_static(pd, friction=DEFAULT_FRICTION, nrm=None):
    """CPIC ghost chain for jobs whose closest bodies are all STATIC
    (zero velocity, _jbody_gate level 1): with bv = 0 every pair quantity
    collapses to a per-particle [1, G] row — the [WPAD, G] pairwise planes
    of _ghost_velocity (p2g.wgsl:200-231) cost ~WPAD x more for the same
    answer.  Returns (ghost rel_k, slip s_k = vp_k - rel_k)."""
    u = [pd[VX][None, :], pd[VY][None, :], pd[VZ][None, :]]
    if nrm is None:
        nrm = [pd[NX][None, :], pd[NY][None, :], pd[NZ][None, :]]
    nv = u[0] * nrm[0] + u[1] * nrm[1] + u[2] * nrm[2]
    tang = [u[i] - nrm[i] * nv for i in range(3)]
    tl2 = tang[0] ** 2 + tang[1] ** 2 + tang[2] ** 2
    tl = jnp.sqrt(tl2)
    inv_tl = jnp.where(tl > 1e-8, nr_recip(jnp.maximum(tl, 1e-30)), 0.0)
    scale = jnp.maximum(0.0, tl + friction * nv) * inv_tl
    sliding = nv < 0.0
    rel = [jnp.where(sliding, tang[i] * scale, u[i]) for i in range(3)]
    s = [u[i] - rel[i] for i in range(3)]
    return rel, s



def _load_pdata_db(pdata_ref, pd_big, sem, starts, lens, j, group, maxj):
    """Double-buffered particle-channel load: program j waits on a DMA that
    was started during program j-1 (or at j==0, starts it itself), and
    prefetches program j+1's window so DMA latency hides behind compute.

    Must only be called by LIVE programs (lens[j] > 0); live jobs form a
    contiguous prefix of the grid, so j-1 is live whenever j is, and the
    prefetch is skipped when j+1 is dead (no dangling DMA/semaphore).

    pd_big: VMEM scratch [2, NCHAN, G+128]; sem: DMA semaphore pair [2].
    Returns the realigned [NCHAN, G] view for program j.
    """
    gl = group + 128
    nbuf = pd_big.shape[0]

    def dma_for(jj, slot):
        s = starts[jnp.minimum(jj, maxj - 1)]
        a = (s // 128) * 128
        return pltpu.make_async_copy(
            pdata_ref.at[:, pl.ds(a, gl)], pd_big.at[slot], sem.at[slot]
        )

    slot = jax.lax.rem(j, nbuf)

    # nbuf-deep pipelining: program j starts the DMA for j + nbuf - 1 so
    # nbuf - 1 program-times of latency are covered; program 0 warms up the
    # first nbuf - 1 windows (each guarded by liveness — live jobs are a
    # contiguous prefix, so no DMA ever dangles unwaited).
    @pl.when(j == 0)
    def _():
        dma_for(0, 0).start()
        for k in range(1, nbuf - 1):
            kk = jnp.minimum(k, maxj - 1)

            @pl.when((k < maxj) & (lens[kk] > 0))
            def _():
                dma_for(k, k % nbuf).start()

    ahead = j + nbuf - 1
    nxt = jnp.minimum(ahead, maxj - 1)

    @pl.when((ahead < maxj) & (lens[nxt] > 0))
    def _():
        dma_for(ahead, jax.lax.rem(ahead, nbuf)).start()

    dma_for(j, slot).wait()
    start = starts[j]
    off = start - (start // 128) * 128
    buf = pd_big[slot]
    return pltpu.roll(buf, gl - off, axis=1)[:, :group]


import os as _os

# Physics-matmul MXU pass count for the big [WPAD, G] transfer dots.
# "highest" (default) = XLA's 6-bf16-pass f32 emulation; "x4" = hand-rolled
# 4-pass cross split (~2^-23 relative, f32-class); "x3" drops the lo*lo
# term (~2^-16 relative, fp16-class — measurably cheaper, physically
# smooth-weight error only; NEVER used for selection/integer dots, which
# stay on sel3_dot/DEFAULT-exact paths).  Env knob so bench A/Bs without
# a code edit; tests run the default.
_PHYS_DOT = _os.environ.get("WGSPARKL_PHYS_DOT", "highest")


def nr_recip(x):
    """Newton-refined reciprocal for Mosaic kernels.

    Mosaic lowers f32 division to the approximate VPU reciprocal
    (~2^-12 relative), while XLA's elementwise divide refines it — the
    raw in-kernel `1/m` in the folded grid update produced a measured
    systematic ~1.9e-4/substep velocity bias vs the CPU trajectory
    (free-fall gate scene, round 4).  One Newton step r*(2-x*r) squares
    the error to f32-class.  Use for EVERY in-kernel reciprocal of a
    physics quantity; division by static Python floats should instead be
    `* (1.0 / h)` so the reciprocal folds exactly at trace time."""
    r = 1.0 / x
    return r * (2.0 - x * r)


def phys_dot(a, b, dims):
    """dot_general for smooth physics operands (weights x features)."""
    if _PHYS_DOT not in ("x3", "x4"):
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32
        )
    from wgsparkl_tpu.ops.blocked import _bf16_trunc

    # Mask-based split: the astype(bf16).astype(f32) form is deleted by
    # XLA's excess-precision rule, zeroing the low terms (see _bf16_trunc).
    ah = _bf16_trunc(a)
    al = a - ah
    bh = _bf16_trunc(b)
    bl = b - bh
    d = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    # No optimization_barrier here: every phys_dot call site is inside a
    # Mosaic kernel, where (a) optimization_barrier has no lowering and
    # (b) XLA's distributivity rewrite — the thing the barrier defeats in
    # blocked.sel3_dot's XLA-side splits — never runs (kernel jaxprs lower
    # straight to MLIR).  The masked _bf16_trunc split already survives
    # tracing; the numerics gate's x3 section checks the result on HW.
    out = d(ah, bh) + d(ah, bl) + d(al, bh)
    if _PHYS_DOT == "x4":
        out = out + d(al, bl)
    return out


def _p2g_feats32(pd, mass, valid, ap0, ap1, ap2):
    """[32, G] P2G feature rows in xw-recombination block layout.

    Columns of w @ feats^T: block 0 = [f_mv0..2, mass, 0 x4]; block k+1
    (scaled by window-node coordinate xw_k) = [A[0,k], A[1,k], A[2,k],
    0 x5].  The momentum recombination mom_i = f_mv_i + Σ_k (Σ w A[i,k])
    x_k then becomes three 8-lane FMAs on the dot output instead of nine
    1-lane concats (p2g.wgsl:163-171 affine momentum) — the widened RHS
    still fits one 128-lane MXU tile, so the extra columns are free."""
    z = jnp.zeros_like(mass)
    rows = [
        mass * pd[VX] - ap0 * valid,
        mass * pd[VY] - ap1 * valid,
        mass * pd[VZ] - ap2 * valid,
        mass, z, z, z, z,
    ]
    for k in range(3):
        rows += [
            pd[A0 + 0 + k] * valid, pd[A0 + 3 + k] * valid,
            pd[A0 + 6 + k] * valid, z, z, z, z, z,
        ]
    return jnp.stack(rows, axis=0)                                  # [32, G]


def _mm_from_feats32(w_c, feats, xw):
    """mm tile [WPAD, 8] = (w_c @ feats^T) recombined with window-node
    coordinates: cols 0-2 momentum, 3 mass, 4-7 zero."""
    out8 = phys_dot(w_c, feats, (((1,), (1,)), ((), ())))           # [WPAD,32]
    return (
        out8[:, 0:8]
        + xw[:, 0:1] * out8[:, 8:16]
        + xw[:, 1:2] * out8[:, 16:24]
        + xw[:, 2:3] * out8[:, 24:32]
    )


def _moving_node_cdf(xw, btable_ref, moving, cell_width):
    """Analytic node CDF of the MOVING colliders at the window nodes,
    evaluated IN-KERNEL (grid_update_cdf/collide.wgsl role for the non-
    static subset; the static subset is frame-hoisted into the gathered
    window channels).  Mirrors collision/cdf_channel.node_cdf_channels on
    [WPAD, 1] channels — same helper functions, so the f32 op sequence
    (and results) match the dense path exactly.

    xw: [WPAD, 3] world node positions; moving: STATIC tuple of
    (slot, shape_type); btable rows 9-12 quat wxyz, 13-15 translation,
    16-23 shape params (pipeline._body_table).
    Returns (dist [WPAD,1] f32, BIG where none; aff [WPAD,1] uint32;
    closest [WPAD,1] f32, -1 where none)."""
    from wgsparkl_tpu.collision import cdf_channel as cch
    from wgsparkl_tpu.collision import shapes as shp

    wpad = xw.shape[0]
    pos = [xw[:, a : a + 1] for a in range(3)]
    dist = jnp.full((wpad, 1), cch.BIG, jnp.float32)
    aff = jnp.zeros((wpad, 1), jnp.uint32)
    closest = jnp.full((wpad, 1), -1.0, jnp.float32)
    cap = 1.5 * cell_width
    for slot, st in moving:
        ri = [btable_ref[9 + k, slot] for k in range(4)]
        ti = [btable_ref[13 + k, slot] for k in range(3)]
        q = cch._to_local(ri, ti, pos)
        if st == shp.SHAPE_CUBOID:
            he = [btable_ref[16 + a, slot] for a in range(3)]
            proj, inside = cch._proj_cuboid(he, q)
        elif st == shp.SHAPE_BALL:
            proj, inside = cch._proj_ball(btable_ref[16, slot], q)
        elif st == shp.SHAPE_CAPSULE:
            proj, inside = cch._proj_capsule(
                btable_ref[16, slot], btable_ref[17, slot], q
            )
        else:
            proj, inside = cch._proj_halfspace(q)
        dl = [proj[a] - q[a] for a in range(3)]
        dw = cch._to_world_vec(ri, dl)
        box = jnp.abs(dw[0]) <= cap
        for a in range(1, 3):
            box = box & (jnp.abs(dw[a]) <= cap)
        within = inside | box
        di = jnp.sqrt(sum(x * x for x in dw))
        closer = within & (di < dist)
        closest = jnp.where(closer, jnp.float32(slot), closest)
        dist = jnp.where(closer, di, dist)
        bits = jnp.where(
            inside, jnp.uint32(0x00010001 << slot),
            jnp.uint32(0x00000001 << slot),
        )
        aff = aff | jnp.where(within, bits, jnp.uint32(0))
    return dist, aff, closest


def _static_ntile_cdf(ntile):
    """Unpack the gathered window CDF channels [WPAD, 4] ->
    (naff_u uint32, closest f32, ndist f32), each [WPAD, 1]."""
    naff_i = (
        ntile[:, 1:2].astype(jnp.int32) << 16
    ) | ntile[:, 0:1].astype(jnp.int32)
    return pltpu.bitcast(naff_i, jnp.uint32), ntile[:, 2:3], ntile[:, 3:4]


def _merge_ntile_cdf(ntile, xw, btable_ref, moving, cell_width):
    """Gathered (frame-static) window CDF channels merged with the
    in-kernel moving-collider CDF (cdf_channel.merge_node_cdf semantics:
    strictly-smaller distance wins, lowest collider index on exact ties,
    affinity words OR).  Ghost/pad rows carry closest -1 with dist 0 and
    must lose to any real hit -> their distance reads as BIG."""
    from wgsparkl_tpu.collision import cdf_channel as cch

    naff_u, s_closest, s_dist = _static_ntile_cdf(ntile)
    if not moving:
        return naff_u, s_closest, s_dist
    d_dist, d_aff, d_closest = _moving_node_cdf(
        xw, btable_ref, moving, cell_width
    )
    da = jnp.where(s_closest >= 0.0, s_dist, cch.BIG)
    b_wins = (d_closest >= 0.0) & (
        (d_dist < da)
        | ((d_dist == da) & ((s_closest < 0.0) | (d_closest < s_closest)))
    )
    return (
        naff_u | d_aff,
        jnp.where(b_wins, d_closest, s_closest),
        jnp.where(b_wins, d_dist, da),
    )


def _node_body_velocity(closest, xw, btable_ref, nc: int):
    """Per-window-node velocity of the node's closest body, [WPAD, 1] x 3.

    btable rows: 0-2 world COM, 3-5 linvel, 6-8 angvel; lanes = body slot.
    Computed in-kernel (gated jobs only) instead of carrying three dense
    [M]-node bv channels through the grid + tile gathers.
    """
    bv = [jnp.zeros_like(xw[:, 0:1]) for _ in range(3)]
    for b in range(nc):
        mask = closest == b
        com = [btable_ref[k, b] for k in range(3)]
        lin = [btable_ref[3 + k, b] for k in range(3)]
        ang = [btable_ref[6 + k, b] for k in range(3)]
        r = [xw[:, k : k + 1] - com[k] for k in range(3)]
        vb = [
            lin[0] + ang[1] * r[2] - ang[2] * r[1],
            lin[1] + ang[2] * r[0] - ang[0] * r[2],
            lin[2] + ang[0] * r[1] - ang[1] * r[0],
        ]
        bv = [jnp.where(mask, vb[k], bv[k]) for k in range(3)]
    return bv


def _p2g_kernel(
    starts, lens, bcx, bcy, bcz, jbody,
    pdata_ref, itile_ref, btable_ref,
    out_ref, imp_ref,
    pd_big, sem,
    *, group: int, cell_width: float, nc: int,
    wsh=(6, 6, 6), wpad: int = WPAD,
):
    j = pl.program_id(0)
    length = lens[j]
    live = length > 0
    maxj = pl.num_programs(0)

    # Dead jobs (the tail of the job table) write zero tiles and skip all
    # DMA/compute: their tiles scatter into the discarded ghost block.
    # imp accumulates in a constant-index VMEM block (one end-of-grid flush).
    @pl.when(j == 0)
    def _():
        imp_ref[0] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[0] = jnp.zeros((wpad, 8), jnp.float32)

    @pl.when(live)
    def _():
        bcell = jnp.stack([bcx[j], bcy[j], bcz[j]])
        pd = _load_pdata_db(pdata_ref, pd_big, sem, starts, lens, j, group, maxj)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, group), 1)[0]
        valid = (lanes < length).astype(jnp.float32)
        w = _window_w(pd, bcell, cell_width, valid, wsh, wpad)

        mass = pd[PM] * valid
        ap0 = pd[A0 + 0] * pd[PX] + pd[A0 + 1] * pd[PY] + pd[A0 + 2] * pd[PZ]
        ap1 = pd[A0 + 3] * pd[PX] + pd[A0 + 4] * pd[PY] + pd[A0 + 5] * pd[PZ]
        ap2 = pd[A0 + 6] * pd[PX] + pd[A0 + 7] * pd[PY] + pd[A0 + 8] * pd[PZ]
        feats = _p2g_feats32(pd, mass, valid, ap0, ap1, ap2)        # [32, G]
        xw = _window_positions(bcell, cell_width, wsh, wpad)        # [WPAD,3]

        def write_mm(w_c):
            out_ref[0] = _mm_from_feats32(w_c, feats, xw)           # [WPAD, 8]

        if nc > 0:
            # Per-job CPIC gate: jobs whose window holds no collider node
            # (the vast majority away from boundaries) skip the [WPAD, G]
            # pairwise compat/ghost-velocity work entirely.
            has_b = jbody[j] > 0

            @pl.when(jnp.logical_not(has_b))
            def _():
                write_mm(w)

            @pl.when(has_b)
            def _():
                naff_i = (
                    itile_ref[0][:, 1:2].astype(jnp.int32) << 16
                ) | itile_ref[0][:, 0:1].astype(jnp.int32)
                naff = pltpu.bitcast(naff_i, jnp.uint32)
                closest = itile_ref[0][:, 2:3]                      # [WPAD,1]
                paff = _paff_u32(pd)
                compat = _compat(naff, paff)                        # [WPAD,G]
                write_mm(jnp.where(compat, w, 0.0))

                # CPIC impulses: incompatible pairs against the node's
                # closest body (p2g.wgsl:200-231), reduced to per-job,
                # per-collider totals in-kernel.
                has_body = closest >= 0
                w_i = jnp.where(compat | ~has_body, 0.0, w) * mass[None, :]
                bv = _node_body_velocity(closest, xw, btable_ref, nc)
                ghost = _ghost_velocity(pd, bv)
                vp = [pd[VX][None, :], pd[VY][None, :], pd[VZ][None, :]]
                d = [
                    jnp.sum(w_i * (vp[k] - ghost[k]), axis=1, keepdims=True)
                    for k in range(3)
                ]                                                   # [WPAD,1]
                # cross(D_w, x_w) per node (lever arm split: com below).
                cr = [
                    d[1] * xw[:, 2:3] - d[2] * xw[:, 1:2],
                    d[2] * xw[:, 0:1] - d[0] * xw[:, 2:3],
                    d[0] * xw[:, 1:2] - d[1] * xw[:, 0:1],
                ]
                rows_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                cols_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                imp_out = jnp.zeros((8, 128), jnp.float32)
                for b in range(nc):
                    mask = (closest == b).astype(jnp.float32)       # [WPAD,1]
                    db = [jnp.sum(d[k] * mask) for k in range(3)]
                    cb = [jnp.sum(cr[k] * mask) for k in range(3)]
                    comb = [btable_ref[k, b] for k in range(3)]
                    ang = [
                        db[1] * comb[2] - db[2] * comb[1] - cb[0],
                        db[2] * comb[0] - db[0] * comb[2] - cb[1],
                        db[0] * comb[1] - db[1] * comb[0] - cb[2],
                    ]
                    vals = db + ang                                  # 6 scalars
                    for r in range(6):
                        imp_out = jnp.where(
                            (rows_i == r) & (cols_i == b), vals[r], imp_out
                        )
                imp_ref[0] = imp_ref[0] + imp_out
        else:
            write_mm(w)


def p2g_tiles(pdata, itiles, btable, jobs, bcells, cfg: GridConfig,
              group: int, nc: int, jbody=None, by: int = 4):
    """Per-job P2G outputs.

    Returns (mm [MAXJ, WPAD, 8], imp [MAXJ, 8, 128]):
      mm cols 0-2 node momentum, 3 node mass;
      imp rows 0-2 linear / 3-5 angular impulse, lanes = collider slots.
    btable: [16, 128] f32 body table — rows 0-2 world COM, 3-5 linvel,
    6-8 angvel; lanes = body slots (node body velocities are rebuilt
    in-kernel from it instead of riding dense grid channels).
    jbody: [MAXJ] int32, nonzero for jobs whose window holds collider nodes
    (gates the per-pair CPIC work; pass None for all-on).
    """
    wsh, _, wpad = window_geom(by)
    maxj = jobs["start"].shape[0]
    if jbody is None:
        jbody = jnp.full((maxj,), 2, jnp.int32)
    kernel = functools.partial(
        _p2g_kernel, group=group, cell_width=cfg.cell_width, nc=nc,
        wsh=wsh, wpad=wpad,
    )
    # nc == 0 never reads itiles: keep the dummy resident (no per-job DMA).
    itile_map = (
        (lambda j, *_: (0, 0, 0)) if nc == 0 else (lambda j, *_: (j, 0, 0))
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
        ],
        out_specs=(
            pl.BlockSpec((1, wpad, 8), lambda j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda j, *_: (0, 0, 0),
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
            jax.ShapeDtypeStruct((maxj, wpad, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
        ),
        interpret=_interpret(),
    )(jobs["start"], jobs["len"], bcells[:, 0], bcells[:, 1],
      bcells[:, 2], jbody, pdata, itiles, btable)


def _g2p_kernel(
    starts, lens, bcx, bcy, bcz, jbody,
    pdata_ref, ftile_ref, itile_ref, btable_ref,
    out_hbm,
    pd_big, res_big, sem, sem_out,
    *, group: int, cell_width: float, nc: int,
    wsh=(6, 6, 6), wpad: int = WPAD, moving=(), static_desc=(),
    chan_free: bool = False, fold_vel: bool = False,
):
    j = pl.program_id(0)
    start = starts[j]
    length = lens[j]
    live = length > 0
    gl = group + 128
    maxj = pl.num_programs(0)

    # Dead jobs skip everything: their output rows are never read (the
    # pipeline masks sorted ranks past the last live job).
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

        xw = _window_positions(bcell, cell_width, wsh, wpad)        # [WPAD,3]
        if fold_vel:
            # In-kernel grid update (grid_update.wgsl:44-65): ftiles carry
            # raw node momentum + mass; velocity = (mom + m g dt)/m with
            # the 1-cell/step clamp, on [WPAD, 1] columns — the dense
            # whole-grid _grid_velocity pass disappears (work scales with
            # gathered windows, not grid volume).
            mass_n = ftile_ref[0][:, 3:4]
            inv_m = jnp.where(
                mass_n > 0.0, nr_recip(jnp.maximum(mass_n, 1e-30)), 0.0
            )
            vlim = btable_ref[24, 3]
            v = jnp.concatenate(
                [
                    jnp.clip(
                        (ftile_ref[0][:, k : k + 1]
                         + mass_n * btable_ref[24, k]) * inv_m,
                        -vlim, vlim,
                    )
                    for k in range(3)
                ],
                axis=1,
            )
        else:
            v = ftile_ref[0][:, 0:3]
        # v (x) x_node, in three 3-lane blocks (row i of the moment =
        # v_i * xw broadcast) instead of nine 1-lane column products —
        # lane-concat relayouts dominate over the multiplies here (Mosaic
        # rejects [W,3,3]->[W,9] casts, so columns are built explicitly).
        vx_blocks = [v[:, i : i + 1] * xw for i in range(3)]
        nfeat = jnp.concatenate(
            [v] + vx_blocks + [jnp.zeros((wpad, 4), jnp.float32)], axis=1
        )                                                            # [WPAD,16]

        def finish(out):
            # VMEM handoff instead of an HBM read-modify-write: live jobs
            # partition the sorted ranks, so the only lanes of this aligned
            # window not produced here are the first `off` — the tail of
            # job j-1's particles, still sitting in its merged buffer
            # res_big[1 - wslot].  Lanes past off + group are zeros and are
            # overwritten by job j+1 (or masked by the pipeline's
            # covered_end for the last job).  Consecutive windows overlap,
            # so the previous write is awaited right before starting this
            # one — after compute, where its latency hides.
            padded = jnp.pad(out, ((0, 0), (0, 128)))
            rolled = pltpu.roll(padded, off, axis=1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (16, gl), 1)
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

        def plain_out():
            # [16, G] result: rows 0:3 PIC velocity, 3:12 velocity moment.
            return phys_dot(nfeat, w, (((0,), (0,)), ((), ())))

        def finish_extra(adds):
            extra = jnp.concatenate(
                [adds[0][0:1], adds[1][0:1], adds[2][0:1]]
                + [adds[i][1:4] for i in range(3)]
                + [jnp.zeros((4, group), jnp.float32)],
                axis=0,
            )                                                        # [16, G]
            return extra

        def compat_w(merged):
            # merged: (naff_u, closest, _) window CDF — gathered static
            # channels at level 1, static + in-kernel moving CDF at level 2
            # (_merge_ntile_cdf; the moving subset never reaches HBM).
            naff, closest = merged[0], merged[1]
            paff = _paff_u32(pd)
            compat = _compat(naff, paff)
            w_c = jnp.where(compat, w, 0.0)
            out = phys_dot(nfeat, w_c, (((0,), (0,)), ((), ())))     # [16, G]
            return closest, w - w_c, out

        if nc > 0:
            lvl = jbody[j]

            @pl.when(lvl == 0)
            def _():
                finish(plain_out())

            def lvl1_cdf():
                if chan_free:
                    dd, aa, cc = _moving_node_cdf(
                        xw, btable_ref, static_desc, cell_width
                    )
                    return aa, cc, dd
                return _static_ntile_cdf(itile_ref[0])

            def lvl2_cdf():
                if chan_free:
                    dd, aa, cc = _moving_node_cdf(
                        xw, btable_ref,
                        tuple(sorted(static_desc + moving)), cell_width,
                    )
                    return aa, cc, dd
                return _merge_ntile_cdf(
                    itile_ref[0], xw, btable_ref, moving, cell_width
                )

            @pl.when(lvl == 1)
            def _():
                # Static-collider window (_jbody_gate level 1): ghost
                # velocities are per-particle rows, so the pairwise
                # w_i * ghost contractions factor into TWO window-axis
                # matmuls (has-body / no-body split) scaled columnwise.
                closest, w_i, out = compat_w(lvl1_cdf())
                hb = (closest >= 0).astype(jnp.float32)              # [WPAD,1]
                wib = w_i * hb
                win = w_i - wib
                m1 = jnp.concatenate(
                    [jnp.ones((wpad, 1), jnp.float32), xw], axis=1
                )
                dib = phys_dot(m1, wib, (((0,), (0,)), ((), ())))    # [4, G]
                din = phys_dot(m1, win, (((0,), (0,)), ((), ())))    # [4, G]
                rel, _ = _ghost_static(pd)
                vp = [pd[VX][None, :], pd[VY][None, :], pd[VZ][None, :]]
                adds = [dib * rel[i] + din * vp[i] for i in range(3)]
                finish(out + finish_extra(adds))

            @pl.when(lvl >= 2)
            def _():
                closest, w_i, out = compat_w(lvl2_cdf())
                # Incompatible cells substitute the ghost velocity
                # (g2p.wgsl:184-207).
                has_body = closest >= 0
                bv = _node_body_velocity(closest, xw, btable_ref, nc)
                ghost_b = _ghost_velocity(pd, bv)
                vp = [pd[VX][None, :], pd[VY][None, :], pd[VZ][None, :]]
                ghost = [
                    jnp.where(has_body, ghost_b[i], vp[i]) for i in range(3)
                ]
                # add/madd are contractions of w_i * ghost_i over the
                # window axis against [1 | x_node]: one [4, G] matmul per
                # component replaces 4 masked [WPAD, G] VPU reductions
                # (consistent with the plain path, which already computes
                # the moments via nfeat on the MXU).
                m1 = jnp.concatenate(
                    [jnp.ones((wpad, 1), jnp.float32), xw], axis=1
                )                                                    # [WPAD,4]
                adds = [
                    phys_dot(m1, w_i * ghost[i], (((0,), (0,)), ((), ())))
                    for i in range(3)
                ]                                                    # [4, G] x3
                finish(out + finish_extra(adds))
        else:
            finish(plain_out())


def g2p_rows(pdata, ftiles, itiles, btable, jobs, bcells, cfg: GridConfig,
             group: int, npad: int, nc: int, jbody=None, by: int = 4,
             moving=(), static_desc=(), chan_free: bool = False,
             fold_vel: bool = False):
    """Per-particle G2P result [16, NPAD + G + 128], channel-major, sorted
    particle order.  Rows 0:3 = PIC velocity, 3:12 = velocity moment
    (sum w v_eff x^T).

    chan_free: ALL analytic collider CDF is evaluated IN-KERNEL at the
    window nodes (static_desc at gate level 1, static_desc + moving at
    level 2, ((slot, shape_type), ...) each); itiles is then a resident
    [1, WPAD, 4] dummy (no per-job node-channel DMA).  Otherwise itiles
    carry gathered channels and `moving` is merged in-kernel on top."""
    wsh, _, wpad = window_geom(by)
    maxj = jobs["start"].shape[0]
    if jbody is None:
        jbody = jnp.full((maxj,), 2, jnp.int32)
    kernel = functools.partial(
        _g2p_kernel, group=group, cell_width=cfg.cell_width, nc=nc,
        wsh=wsh, wpad=wpad, moving=tuple(moving),
        static_desc=tuple(static_desc), chan_free=chan_free,
        fold_vel=fold_vel,
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
            pl.BlockSpec((1, wpad, 4), lambda j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wpad, 4), itile_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 128), lambda j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((3, NCHAN, gl), jnp.float32),
            pltpu.VMEM((2, 16, gl), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, npad + group + 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(jobs["start"], jobs["len"], bcells[:, 0], bcells[:, 1],
      bcells[:, 2], jbody, pdata, ftiles, itiles, btable)
