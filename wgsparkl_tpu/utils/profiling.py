"""Per-pass device-time breakdown from a real profiler trace.

The reference shows a live per-pass GPU timing table in its UI
(src_testbed/step.rs:219-254, ui.rs:112-134) via timestamp queries.  The
TPU-native equivalent: run one jitted frame under jax.profiler.trace, parse
the XLA device trace, and attribute every device op back to framework source
lines via the compiled HLO metadata — one command prints the table:

    from wgsparkl_tpu.utils.profiling import profile_step, print_table
    rows = profile_step(data, num_substeps=20)
    print_table(rows)

Works through the axon TPU tunnel and on CPU.  Each row is
(total_ms, ms_per_substep, op_kind, source, code_line).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import linecache
import os
import re
import tempfile

import jax
import numpy as np


def _device_op_times(trace_dir):
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    by_name = collections.Counter()
    for f in files:
        with gzip.open(f, "rt") as fh:
            tr = json.load(fh)
        pid_names = {}
        for e in tr.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
        device = [
            p for p, n in pid_names.items() if "TPU" in n or "/device:" in n
        ]
        if not device:  # CPU runs: ops land in the host lane
            device = [p for p, n in pid_names.items() if n == "/host:CPU"]
        for e in tr.get("traceEvents", []):
            if e.get("ph") == "X" and e.get("pid") in device:
                by_name[e["name"]] += e.get("dur", 0)
    return by_name


def _source_map(compiled_text):
    """op name -> 'file:line' from HLO metadata."""
    out = {}
    pat = re.compile(
        r"%(\S+?) = .*?source_file=\"([^\"]+)\".*?source_line=(\d+)"
    )
    for ln in compiled_text.splitlines():
        m = pat.search(ln)
        if m:
            out.setdefault(m.group(1), (m.group(2), int(m.group(3))))
    return out


def profile_step(data, num_substeps: int = 20, top: int = 40,
                 trace_dir: str | None = None, warmup_frames: int = 1):
    """Profile one frame of `data` (an MpmData); returns table rows.

    Compiles (cached), runs one warm frame, traces a second, buckets device
    op durations, and resolves op names to source lines via the compiled
    HLO.  Rows: (total_ms, ms_per_substep, op, source, code).
    """
    from wgsparkl_tpu.pipeline import step

    cfg = data.config
    fn = jax.jit(lambda s, p: step(s, p, cfg, num_substeps=num_substeps))
    state = fn(data.state, data.params)
    for _ in range(warmup_frames - 1):
        state = fn(state, data.params)
    np.asarray(jax.tree.leaves(state.particles.pos))  # sync
    tdir = trace_dir or tempfile.mkdtemp(prefix="wgsparkl_prof_")
    with jax.profiler.trace(tdir):
        state = fn(state, data.params)
        np.asarray(state.particles.pos[0])

    times = _device_op_times(tdir)
    try:
        txt = fn.lower(data.state, data.params).compile().as_text()
        smap = _source_map(txt)
    except Exception:  # pragma: no cover - lowering text is best-effort
        smap = {}

    rows = []
    for name, us in times.most_common(top):
        base = name.split("(")[0]
        src = smap.get(base)
        if src:
            loc = f"{os.path.basename(src[0])}:{src[1]}"
            code = linecache.getline(src[0], src[1]).strip()[:80]
        else:
            loc, code = "", ""
        rows.append((us / 1e3, us / 1e3 / num_substeps, base[:40], loc, code))
    return rows


def print_table(rows, min_ms_per_substep: float = 0.05):
    total = sum(r[1] for r in rows)
    print(f"{'ms/substep':>10}  {'op':<40}  {'source':<28}  code")
    for tot_ms, per, op, loc, code in rows:
        if per < min_ms_per_substep:
            continue
        print(f"{per:10.3f}  {op:<40}  {loc:<28}  {code}")
    print(f"{total:10.3f}  (sum of listed ops; overlapping containers "
          "like while/cond included)")
