"""Re-measure BASELINE configs 2/3/4 on the TPU (pallas path).

BENCH_BCHUNK env: override band_chunk on every scene (A/B the
banded-move scan chunk width without a code edit)."""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from wgsparkl_tpu import scenes
from wgsparkl_tpu.pipeline import MpmData as _MpmData, step

_BCHUNK = int(os.environ.get("BENCH_BCHUNK", 0))
_BAND = int(os.environ.get("BENCH_BAND", 0))


def MpmData(*a, **kw):
    if _BCHUNK:
        kw.setdefault("band_chunk", _BCHUNK)
    if _BAND:
        kw.setdefault("band_arg", _BAND)
    return _MpmData(*a, **kw)


if _BCHUNK or _BAND:
    # scene helpers construct MpmData internally — patch the module ref
    import wgsparkl_tpu.scenes as _sc

    _orig = _sc.MpmData

    def _patched(*a, **kw):
        if _BCHUNK:
            kw.setdefault("band_chunk", _BCHUNK)
        if _BAND:
            kw.setdefault("band_arg", _BAND)
        return _orig(*a, **kw)

    _sc.MpmData = _patched


def measure(name, data, substeps, frames=8):
    from wgsparkl_tpu.pipeline import step_with_diag

    cfg = data.config
    # BENCH_LAZY_SORT=1: A/B the round-5 eager-sort default flip per scene
    # (it was measured a 3D-1M win only; 2D may differ).
    if int(os.environ.get("BENCH_LAZY_SORT", 0)):
        import dataclasses as _dc

        cfg = _dc.replace(cfg, lazy_sort=True)
    stepper = jax.jit(lambda s, p: step(s, p, cfg, num_substeps=substeps))
    t0 = time.time()
    state = stepper(data.state, data.params)
    float(np.asarray(state.particles.pos[0, 0]))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(frames):
        state = stepper(state, data.params)
    float(np.asarray(state.particles.pos[0, 0]))
    el = time.time() - t0
    sps = frames * substeps / el
    n = data.num_particles
    # One diag frame after the timed loop: band_miss tells us whether the
    # banded-move fast path held through the measured motion.
    _, diag = jax.jit(
        lambda s, p: step_with_diag(s, p, cfg, num_substeps=substeps)
    )(state, data.params)
    print(json.dumps({
        "config": name, "particles": n, "steps_per_s": round(sps, 2),
        "pups_per_s": round(sps * n / 1e6, 1), "compile_s": round(compile_s, 1),
        "diag": diag.summary(),
    }), flush=True)
    assert np.isfinite(np.asarray(state.particles.pos)).all(), name


which = sys.argv[1] if len(sys.argv) > 1 else "all"

# config 2: 2D sand column collapse, reference-ish 64k + full 490k
if which in ("all", "2"):
    d = scenes.sand_column_2d(nx=256, ny=256, cell_width=0.2,
                              transfer="pallas", group=256)
    measure("2 (2D sand 65k)", d, substeps=10)
    d = scenes.sand_column_2d(nx=700, ny=700, cell_width=0.2,
                              transfer="pallas", group=512)
    measure("2b (2D sand 490k)", d, substeps=10)

# config 3: 3D mixed dam break ~256k
if which in ("all", "3"):
    import importlib.util
    # rebuild the dam scene inline (examples/dam_break3 with SCALE to ~256k)
    from wgsparkl_tpu.collision.shapes import Collider
    from wgsparkl_tpu.models import ElasticCoefficients
    from wgsparkl_tpu.params import SimulationParams
    from wgsparkl_tpu.pipeline import RigidBodyDesc
    from wgsparkl_tpu.scenes import _lattice
    from wgsparkl_tpu.solver import Models, Particles

    h = 1.0
    nf, ne = 49, 25
    fluid_pos = _lattice((nf, 2 * nf, nf), h, (-nf * h / 2, 0.5, -nf * h / 2))
    elast_pos = _lattice((ne, ne, ne), h, (nf * h / 2 + 2.0, 0.5, -ne * h / 4))
    pos = np.concatenate([fluid_pos, elast_pos])
    n = len(pos); nfp = len(fluid_pos)
    particles = Particles.from_arrays(pos, density=1000.0, radius=h / 4)
    lam = np.empty(n, np.float32); mu = np.empty(n, np.float32)
    fl = ElasticCoefficients.from_young_modulus(1e6, 0.499)
    el = ElasticCoefficients.from_young_modulus(1e6, 0.2)
    lam[:nfp], mu[:nfp] = fl.lam, 0.0
    lam[nfp:], mu[nfp:] = el.lam, el.mu
    models = Models.from_arrays(n, lam, mu, phase=1.0)
    half = nf * h * 1.2
    bodies = [
        RigidBodyDesc(Collider.cuboid(half * 3, 1.0, half * 3), (0, -1.0, 0)),
        RigidBodyDesc(Collider.cuboid(0.5, half, half * 2), (-half, half, 0)),
        RigidBodyDesc(Collider.cuboid(0.5, half, half * 2), (half * 1.8, half, 0)),
        RigidBodyDesc(Collider.cuboid(half * 2, half, 0.5), (0, half, -half)),
        RigidBodyDesc(Collider.cuboid(half * 2, half, 0.5), (0, half, half)),
    ]
    params = SimulationParams.new(dt=(1 / 60) / 20, gravity=[0.0, -9.81, 0.0])
    # Default = flagship block geometry (by=8 group=1024): measured 38.2
    # steps/s vs 29.6 at by=4 group=512 (round 4, +29%) — by=4 jobs run
    # half-empty once the fluid spreads; by=8 packs 4x the particles/block.
    d = MpmData(params, particles, models, bodies, h,
                grid_bounds=(np.array([-half - 2, -2.0, -half - 2]),
                             np.array([half * 2 + 2, 2.2 * nf * h + 4, half + 2])),
                transfer="pallas", group=1024, by=8)
    measure("3 (3D dam break ~256k, by=8 group=1024)", d, substeps=20)
    d = MpmData(params, particles, models, bodies, h,
                grid_bounds=(np.array([-half - 2, -2.0, -half - 2]),
                             np.array([half * 2 + 2, 2.2 * nf * h + 4, half + 2])),
                transfer="pallas", group=512)
    measure("3- (dam break A/B, by=4 group=512)", d, substeps=20)

# config 4: 3D sand + CPIC coupling ~512k, and reference sand3 202.5k
if which in ("all", "4"):
    d = scenes.sand_box_3d(nxz=45, ny=100, cell_width=1.0,
                           transfer="pallas", group=512)
    measure("4a (sand3 reference 202.5k)", d, substeps=20)
    d = scenes.sand_box_3d(nxz=62, ny=133, cell_width=1.0,
                           transfer="pallas", group=512)
    measure("4b (3D sand+CPIC ~512k)", d, substeps=20)
    d = scenes.sand_box_3d(nxz=62, ny=133, cell_width=1.0,
                           transfer="pallas", group=1024, by=8)
    measure("4b+ (512k, by=8 group=1024)", d, substeps=20)
    d = scenes.sand_box_3d(nxz=45, ny=100, cell_width=1.0,
                           transfer="pallas", group=1024, by=8)
    measure("4a+ (202.5k, by=8 group=1024)", d, substeps=20)
print("done")
