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
nxz = int(round((n_target / 2.2) ** (1.0 / 3.0)))
ny = int(round(n_target / (nxz * nxz)))
base = scenes.sand_box_3d(nxz=nxz, ny=ny, cell_width=1.0, with_paddle=True)
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
