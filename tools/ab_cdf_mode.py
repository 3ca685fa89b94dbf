"""Two-scene A/B of the CDF-mode auto-selection (verdict round-4 task 7).

The pallas 3D core has two bit-exact-equivalent CDF modes (pipeline.py
_cdf_mode):

  gathered  — dense node-CDF grid, static colliders frame-hoisted, window
              channel gathers per substep (+ in-kernel moving merge);
  chan-free — every analytic collider evaluated IN-KERNEL at window nodes
              of jobs within conservative reach; zero dense/gather work.

_auto_chan_free (pipeline.py:997) picks per scene at construction from the
static reach fraction + a gravity-catch test.  This tool measures BOTH
modes on two scenes chosen so the heuristic predicts a different winner:

  A. sand3 202.5k (ground plane + 4 walls + paddle): most jobs sit inside
     collider reach forever -> predict GATHERED.
  B. 200k sand blob, zero gravity, one small static ball off to the side
     (reach fraction ~1-2% of blocks, nothing settles onto it) ->
     predict CHAN-FREE.

Prints one JSON line per (scene, mode) + the auto choice per scene.
Usage (TPU):  python tools/ab_cdf_mode.py
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

from wgsparkl_tpu import scenes
from wgsparkl_tpu.collision.shapes import Collider
from wgsparkl_tpu.models import DruckerPrager, ElasticCoefficients
from wgsparkl_tpu.models.drucker_prager import drucker_prager_arrays
from wgsparkl_tpu.params import SimulationParams
from wgsparkl_tpu.pipeline import MpmData, RigidBodyDesc, step
from wgsparkl_tpu.solver import Models, Particles


def blob_zero_g(chan_free):
    """Scene B: free-floating sand cube + one small ball collider to the
    side; zero gravity.  The ball's reach region covers ~1% of grid
    blocks and catches nothing, so _auto_chan_free -> True."""
    nxz, ny = 45, 100  # 202.5k, same scale as scene A
    cw = 1.0
    pos = scenes._lattice((nxz, ny, nxz), cw,
                          (-nxz * cw / 4, 10.0 * cw / 2, -nxz * cw / 4))
    n = len(pos)
    particles = Particles.from_arrays(pos, density=2700.0, radius=cw / 4)
    elast = ElasticCoefficients.from_young_modulus(2.0e9, 0.2)
    dp = drucker_prager_arrays([DruckerPrager.new(2.0e9, 0.2)])
    dp = {k: np.full(n, v[0]) for k, v in dp.items()}
    models = Models.from_arrays(n, elast.lam, elast.mu, dp=dp)
    bodies = [RigidBodyDesc(Collider.ball(2.0), (-30.0, 25.0, 0.0))]
    params = SimulationParams.new(dt=(1.0 / 60.0) / 20,
                                  gravity=np.zeros(3))
    half = nxz * cw / 2 + 10
    return MpmData(
        params, particles, models, bodies, cw,
        grid_bounds=(np.array([-half, -2 * cw, -half]),
                     np.array([half, (ny + 30) * cw / 2, half])),
        transfer="pallas", group=512, chan_free=chan_free,
    )


def measure(scene, mode_name, data, substeps=20, frames=8):
    cfg = data.config
    stepper = jax.jit(lambda s, p: step(s, p, cfg, num_substeps=substeps))
    t0 = time.time()
    state = stepper(data.state, data.params)
    float(np.asarray(state.particles.pos[0, 0]))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(frames):
        state = stepper(state, data.params)
    float(np.asarray(state.particles.pos[0, 0]))
    sps = frames * substeps / (time.time() - t0)
    print(json.dumps({
        "scene": scene, "mode": mode_name, "chan_free": cfg.chan_free,
        "steps_per_s": round(sps, 2), "compile_s": round(compile_s, 1),
    }), flush=True)
    assert np.isfinite(np.asarray(state.particles.pos)).all()
    return sps


def scene_a(chan_free):
    return scenes.sand_box_3d(nxz=45, ny=100, cell_width=1.0,
                              transfer="pallas", group=512,
                              chan_free=chan_free)


# what does auto pick?  (constructed once with chan_free unset)
auto_a = scene_a(None).config.chan_free
auto_b = blob_zero_g(None).config.chan_free
print(json.dumps({"auto": {"sand3_ground": auto_a, "blob_zero_g": auto_b},
                  "predicted": {"sand3_ground": False, "blob_zero_g": True}}),
      flush=True)

for scene, build in (("sand3_ground", scene_a), ("blob_zero_g", blob_zero_g)):
    r = {}
    for mode_name, cf in (("gathered", False), ("chan_free", True)):
        r[mode_name] = measure(scene, mode_name, build(cf))
    win = max(r, key=r.get)
    print(json.dumps({"scene": scene, "winner": win,
                      "delta_pct": round(100 * (max(r.values()) /
                                                min(r.values()) - 1), 1)}),
          flush=True)
