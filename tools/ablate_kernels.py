"""Ablate p2g kernel internals: DMA only, +w build, +dot, full."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from wgsparkl_tpu.grid import GridConfig
from wgsparkl_tpu.ops import pallas_transfer as ptf

N = 1_002_001; G = 1024; BY = 8
NPAD = -(-N // 256) * 256
MAXJ = 1536; NLIVE = 1300
wsh, wvol, wpad = ptf.window_geom(BY)
rng = np.random.default_rng(0)
grid = GridConfig(shape=(108, 112, 108), cell_width=1.0, origin_cell=(-2, -2, -2))
starts = np.zeros(MAXJ, np.int32); lens = np.zeros(MAXJ, np.int32)
per = N // NLIVE
pos = np.zeros((N, 3), np.float32); bcells = np.zeros((MAXJ, 3), np.int32)
r = 0
for j in range(NLIVE):
    starts[j] = r; ln = min(per, N - r); lens[j] = ln
    bx, by_, bz = rng.integers(0, 25, 3)
    bcells[j] = (bx * 4 - 2, by_ * 8 - 2, bz * 4 - 2)
    pos[r:r+ln] = (bcells[j] + 1.0) + rng.random((ln, 3)) * np.array([3.0, 7.0, 3.0])
    r += ln
pdata = np.zeros((ptf.NCHAN, NPAD + G + 128), np.float32)
pdata[0:3, :N] = pos.T; pdata[3:6, :N] = rng.normal(size=(3, N)) * 0.1
pdata[6, :N] = 1.0
jobs = {"start": jnp.asarray(starts), "len": jnp.asarray(lens)}
bcells_j = jnp.asarray(bcells); pdata_j = jnp.asarray(pdata)

def make_kernel(mode):
    def kern(starts, lens, bcx, bcy, bcz, pdata_ref, out_ref, pd_big, sem,
             *, group, cell_width, wsh, wpad):
        j = pl.program_id(0)
        length = lens[j]; live = length > 0
        maxj = pl.num_programs(0)
        @pl.when(jnp.logical_not(live))
        def _():
            out_ref[0] = jnp.zeros((wpad, 8), jnp.float32)
        @pl.when(live)
        def _():
            bcell = jnp.stack([bcx[j], bcy[j], bcz[j]])
            pd = ptf._load_pdata_db(pdata_ref, pd_big, sem, starts, lens, j, group, maxj)
            if mode == "dma":
                out_ref[0] = jnp.zeros((wpad, 8), jnp.float32) + pd[0, 0]
                return
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, group), 1)[0]
            valid = (lanes < length).astype(jnp.float32)
            w = ptf._window_w(pd, bcell, cell_width, valid, wsh, wpad)
            if mode == "w":
                out_ref[0] = jnp.zeros((wpad, 8), jnp.float32) + w[:, 0:1]
                return
            mass = pd[ptf.PM] * valid
            ap0 = pd[ptf.A0+0]*pd[ptf.PX] + pd[ptf.A0+1]*pd[ptf.PY] + pd[ptf.A0+2]*pd[ptf.PZ]
            ap1 = pd[ptf.A0+3]*pd[ptf.PX] + pd[ptf.A0+4]*pd[ptf.PY] + pd[ptf.A0+5]*pd[ptf.PZ]
            ap2 = pd[ptf.A0+6]*pd[ptf.PX] + pd[ptf.A0+7]*pd[ptf.PY] + pd[ptf.A0+8]*pd[ptf.PZ]
            rows = [mass*pd[ptf.VX]-ap0*valid, mass*pd[ptf.VY]-ap1*valid,
                    mass*pd[ptf.VZ]-ap2*valid, mass] + \
                   [pd[ptf.A0+k]*valid for k in range(9)] + [jnp.zeros_like(mass)]*3
            feats = jnp.stack(rows, axis=0)
            xw = ptf._window_positions(bcell, cell_width, wsh, wpad)
            if mode != "full2":
                tile = jax.lax.dot_general(w, feats, (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32)

            if mode == "full2":
                rows2 = [mass*pd[ptf.VX]-ap0*valid, mass*pd[ptf.VY]-ap1*valid,
                         mass*pd[ptf.VZ]-ap2*valid, mass] + [jnp.zeros_like(mass)]*4
                for k in range(3):
                    rows2 += [pd[ptf.A0+0+k]*valid, pd[ptf.A0+3+k]*valid,
                              pd[ptf.A0+6+k]*valid] + [jnp.zeros_like(mass)]*5
                feats2 = jnp.stack(rows2, axis=0)                 # [32, G]
                out8 = jax.lax.dot_general(w, feats2, (((1,), (1,)), ((), ())),
                                           preferred_element_type=jnp.float32)
                mm = (out8[:, 0:8] + xw[:, 0:1]*out8[:, 8:16]
                      + xw[:, 1:2]*out8[:, 16:24] + xw[:, 2:3]*out8[:, 24:32])
                out_ref[0] = mm
                return

            if mode == "dot":
                out_ref[0] = jnp.concatenate([tile[:, :8]], axis=1)
                return
            mm_cols = []
            for i in range(3):
                mom = tile[:, i:i+1]
                for k in range(3):
                    mom = mom + tile[:, 4+3*i+k:5+3*i+k] * xw[:, k:k+1]
                mm_cols.append(mom)
            mm_cols.append(tile[:, 3:4])
            out_ref[0] = jnp.concatenate(mm_cols + [jnp.zeros((wpad, 4), jnp.float32)], axis=1)
    return kern

def run(mode):
    kernel = functools.partial(make_kernel(mode), group=G, cell_width=1.0, wsh=wsh, wpad=wpad)
    gl = G + 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5, grid=(MAXJ,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, wpad, 8), lambda j, *_: (j, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, ptf.NCHAN, gl), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))])
    f = pl.pallas_call(kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((MAXJ, wpad, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True))
    g = jax.jit(lambda p: f(jobs["start"], jobs["len"], bcells_j[:,0], bcells_j[:,1], bcells_j[:,2], p))
    res = g(pdata_j); jax.block_until_ready(res)
    REP = 20; t0 = time.perf_counter()
    for _ in range(REP): res = g(pdata_j)
    jax.block_until_ready(res)
    print(f"p2g ablation mode={mode:6} {(time.perf_counter()-t0)/REP*1e3:7.2f} ms")

for mode in ("full", "full2"):
    run(mode)
