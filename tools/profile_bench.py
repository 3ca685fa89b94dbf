"""Profile the flagship bench scene per-pass on TPU (bench.py config).

Runs one warm frame under jax.profiler.trace, buckets device-op time by
fusion/kernel name, and maps the top ops back to framework source via the
compiled HLO metadata.  BENCH_PARTICLES/BENCH_GROUP/BENCH_BY env knobs
mirror bench.py.  Usage (TPU):  python tools/profile_bench.py
"""
import os, sys, time, json, gzip, glob, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wgsparkl_tpu import scenes
from wgsparkl_tpu.pipeline import MpmData, step

n_target = int(os.environ.get("BENCH_PARTICLES", 1_000_000))
substeps = 20
group = int(os.environ.get("BENCH_GROUP", 1024))
by = int(os.environ.get("BENCH_BY", 8))
if os.environ.get("PROF_SCENE") == "dam3":
    # BASELINE config 3: mixed fluid+elastic dam break ~256k (the
    # per-particle-throughput gap scene — verdict task 5).
    from wgsparkl_tpu.collision.shapes import Collider
    from wgsparkl_tpu.models import ElasticCoefficients
    from wgsparkl_tpu.params import SimulationParams
    from wgsparkl_tpu.pipeline import RigidBodyDesc
    from wgsparkl_tpu.scenes import _lattice
    from wgsparkl_tpu.solver import Models, Particles

    h = 1.0
    nf, ne = 49, 25
    fluid_pos = _lattice((nf, 2 * nf, nf), h, (-nf * h / 2, 0.5, -nf * h / 2))
    elast_pos = _lattice((ne, ne, ne), h,
                         (nf * h / 2 + 2.0, 0.5, -ne * h / 4))
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
        RigidBodyDesc(Collider.cuboid(half * 3, 1.0, half * 3),
                      (0, -1.0, 0)),
        RigidBodyDesc(Collider.cuboid(0.5, half, half * 2),
                      (-half, half, 0)),
        RigidBodyDesc(Collider.cuboid(0.5, half, half * 2),
                      (half * 1.8, half, 0)),
        RigidBodyDesc(Collider.cuboid(half * 2, half, 0.5),
                      (0, half, -half)),
        RigidBodyDesc(Collider.cuboid(half * 2, half, 0.5),
                      (0, half, half)),
    ]
    params = SimulationParams.new(dt=(1 / 60) / 20,
                                  gravity=[0.0, -9.81, 0.0])
    data = MpmData(
        params, particles, models, bodies, h,
        grid_bounds=(np.array([-half - 2, -2.0, -half - 2]),
                     np.array([half * 2 + 2, 2.2 * nf * h + 4, half + 2])),
        transfer="pallas", group=group, by=by,
    )
elif os.environ.get("PROF_SCENE") == "sand2":
    # BASELINE config 2b: 2D sand at the reference elasticity2 scale
    # (490k) — the 2D-throughput scene (verdict round-4 task 8).
    substeps = 10
    data = scenes.sand_column_2d(nx=700, ny=700, cell_width=0.2,
                                 transfer="pallas", group=512)
    n = data.num_particles
else:
    nxz = int(round((n_target / 2.2) ** (1.0 / 3.0)))
    ny = int(round(n_target / (nxz * nxz)))
    base = scenes.sand_box_3d(nxz=nxz, ny=ny, cell_width=1.0,
                              with_paddle=True)
    n = base.num_particles
    max_jobs = int((n // (100 * by) + 256) // 128 * 128)
    data = MpmData(
        base.params, base.state.particles, base.state.models,
        base.bodies_desc, 1.0, grid=base.config.grid,
        transfer="pallas", group=group, max_jobs=max_jobs, by=by,
    )
if int(os.environ.get("BENCH_EAGER_SORT", 0)):
    import dataclasses as _dc

    data.config = _dc.replace(data.config, lazy_sort=False)
cfg = data.config
stepper = jax.jit(lambda s, p: step(s, p, cfg, num_substeps=substeps))
t0 = time.time()
state = stepper(data.state, data.params)
_ = float(np.asarray(state.particles.pos[0, 0]))
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
# warm frames so the sort phase sees realistic motion
for _i in range(10):
    state = stepper(state, data.params)
_ = float(np.asarray(state.particles.pos[0, 0]))
print("warm done", flush=True)

outdir = "/tmp/prof1m_trace"
os.system(f"rm -rf {outdir}")
with jax.profiler.trace(outdir):
    state = stepper(state, data.params)
    _ = float(np.asarray(state.particles.pos[0, 0]))

files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
# EXCLUSIVE (self) time per op on the device "XLA Ops" lane: region ops
# (while/cond/call) nest their children, so inclusive sums double-count
# 3-4x.  A span stack over the sorted intervals subtracts child time.
# Key spans per (file, pid, tid): on a multi-device trace, interleaved
# spans from different device lanes must not be treated as parent/child
# (that corrupts self-times, which can even go negative).
spans_by_lane = collections.defaultdict(list)
for f in files:
    with gzip.open(f, "rt") as fh:
        tr = json.load(fh)
    pid_names, tid_names = {}, {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    for e in tr.get("traceEvents", []):
        if (e.get("ph") == "X" and "TPU" in pid_names.get(e.get("pid"), "")
                and tid_names.get((e["pid"], e.get("tid"))) == "XLA Ops"):
            spans_by_lane[(f, e["pid"], e.get("tid"))].append(
                (e["ts"], e["ts"] + e["dur"], e["dur"], e["name"])
            )
ev_by_name = collections.Counter()
ev_count = collections.Counter()
for lane_spans in spans_by_lane.values():
    lane_spans.sort(key=lambda s: (s[0], -s[2]))
    stack = []
    for ts, te, dur, name in lane_spans:
        while stack and stack[-1][1] <= ts + 1e-9:
            stack.pop()
        if stack:
            ev_by_name[stack[-1][2]] -= dur
        ev_by_name[name] += dur
        ev_count[name] += 1
        stack.append((ts, te, name))
total = sum(ev_by_name.values())
print(f"exclusive device-op us: {total:.0f} -> {total/1e3/substeps:.2f} ms/substep")
for name, dur in ev_by_name.most_common(70):
    print(f"{dur/1e3/substeps:8.3f} ms/substep x{ev_count[name]:5d}  {name[:120]}")

txt = stepper.lower(state, data.params).compile().as_text()
with open("/tmp/prof_bench_hlo.txt", "w") as f:
    f.write(txt)
# map op name -> source_file:line from the compiled HLO metadata, then
# bucket the exclusive time by source location.
src_of = {}
pat_meta = re.compile(
    r'%(\S+?) = .*?source_file="([^"]+)".*?source_line=(\d+)')
for ln in txt.splitlines():
    m = pat_meta.search(ln)
    if m:
        src_of[m.group(1)] = f"{m.group(2).split('/root/repo/')[-1]}:{m.group(3)}"
by_src = collections.Counter()
for name, dur in ev_by_name.items():
    key = src_of.get(name.split("(")[0])
    if key is None:
        key = ("pallas kernel " + name if name.startswith("closed_call")
               else "(unattributed) " + name.split(".")[0])
    by_src[key] += dur
print("\n--- exclusive ms/substep by source location ---")
for key, dur in by_src.most_common(40):
    if dur / 1e3 / substeps < 0.005:
        break
    print(f"{dur/1e3/substeps:8.3f}  {key}")
