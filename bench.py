"""Flagship benchmark: 1M-particle 3D Drucker-Prager sand, one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: MLS-MPM sim substeps/second (each substep is a full 10-pass step).
Baseline target (BASELINE.json north star): >= 60 steps/s at 1M particles.

Extra per-pass style context (compile time, particle-updates/s) goes to
stderr so the driver's JSON parse stays clean.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _wait_for_backend(max_wait_s: float) -> bool:
    """Probe TPU backend init in a subprocess until it works or time runs out.

    Round 3's official capture was voided by a transient axon-tunnel outage
    (`BENCH_r03.json` rc=1 before any simulation ran).  Probing in a
    subprocess keeps THIS process's jax backend state clean: we only touch
    jax here once a probe has succeeded.
    """
    t0 = time.time()
    probe = (
        "import jax\n"
        "jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')\n"
        "d = jax.devices()\n"
        "assert d, d\n"
    )
    attempt = 0
    while True:
        attempt += 1
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe], timeout=300,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            if attempt > 1:
                print(
                    f"backend up after {time.time()-t0:.0f}s "
                    f"({attempt} probes)", file=sys.stderr,
                )
            return True
        remaining = max_wait_s - (time.time() - t0)
        print(
            f"backend probe {attempt} failed (rc={rc}); "
            f"{remaining:.0f}s of retry budget left", file=sys.stderr,
        )
        if remaining <= 60:
            return False
        time.sleep(60)


def _emit_stale_fallback() -> None:
    """TPU never came up: emit the last recorded hardware number, clearly
    labelled as stale, instead of dying with rc=1 and voiding the round."""
    last = None
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "BENCH_HISTORY.jsonl")) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    if rec.get("particles", 0) >= 900_000:
                        last = rec
    except OSError:
        pass
    if last is None:
        print(json.dumps({
            "metric": "sim steps/s, 1M particle 3D sand (TPU unavailable, no history)",
            "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
        }))
        return
    v = last["steps_per_s"]
    print(json.dumps({
        "metric": (
            f"sim steps/s, {last['particles']} particle 3D sand "
            "(STALE: TPU backend unavailable at capture; last recorded value)"
        ),
        "value": round(v, 3),
        "unit": "steps/s",
        "vs_baseline": round(v / 60.0, 4),
    }))


def main():
    if not _wait_for_backend(float(os.environ.get("BENCH_INIT_WAIT", 3600))):
        _emit_stale_fallback()
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_target = int(os.environ.get("BENCH_PARTICLES", 1_000_000))
    substeps = int(os.environ.get("BENCH_SUBSTEPS", 20))
    # 12 frames (~240 substeps) measures sustained throughput past the
    # initial mass-settling transient (which is re-sort heavy).
    frames = int(os.environ.get("BENCH_FRAMES", 12))
    # group=1024 measured best at 1M (512: 33.1, 1024: 35.6 steps/s;
    # 2048 exceeds the 16 MB VMEM budget in the fused pCDF+P2G kernel).
    group = int(os.environ.get("BENCH_GROUP", 1024))

    from wgsparkl_tpu import scenes
    from wgsparkl_tpu.pipeline import MpmData, step

    # ~n_target particles: nxz^2 * ny lattice at 2 per cell per axis.
    nxz = int(round((n_target / 2.2) ** (1.0 / 3.0)))
    ny = int(round(n_target / (nxz * nxz)))
    base = scenes.sand_box_3d(nxz=nxz, ny=ny, cell_width=1.0, with_paddle=True)
    n = base.num_particles
    # Flagship config: Pallas MXU transfer path, tuned job table
    # (multiple of 128 keeps the banded tile moves statically available).
    # BENCH_SPARSE=1 runs the sparse/unbounded active-block domain
    # (BASELINE config 5's "sparse/blocked grid"; node CDF on active
    # blocks only).
    sparse = bool(int(os.environ.get("BENCH_SPARSE", 0)))
    # Anisotropic 4 x by x 4 blocks: by=8 fills the 1024-lane kernels
    # (4^3 blocks cap at 512 particles at 8/cell -> half-empty jobs) and
    # halves the job count.  The sparse domain is isotropic-only.
    by = int(os.environ.get("BENCH_BY", 4 if sparse else 8))
    # Job-table capacity must cover the OCCUPIED BLOCK count, not just
    # n/group: blocks cap at 8 particles/cell so a by-node gravity axis
    # holds <= 128*by per block and the t=0 lattice needs ~n/(114*by)
    # jobs (measured 2200 at 1M with by=4 vs the old n/group*1.5
    # formula's 1664 — silent overflow froze the sorted tail).
    # BENCH_MAXJOBS overrides.
    max_jobs = int(os.environ.get("BENCH_MAXJOBS", 0)) or int(
        (n // (100 * by) + 256) // 128 * 128
    )
    # Banded-move geometry A/B: BENCH_BAND overrides the auto slab band,
    # BENCH_BCHUNK the jobs-per-scan-iteration chunk (fewer, bigger
    # iterations; scan/fusion overhead vs slab width trade).
    band_kw = {}
    if int(os.environ.get("BENCH_BAND", 0)):
        band_kw["band_arg"] = int(os.environ["BENCH_BAND"])
    if int(os.environ.get("BENCH_BCHUNK", 0)):
        band_kw["band_chunk"] = int(os.environ["BENCH_BCHUNK"])
    data = MpmData(
        base.params, base.state.particles, base.state.models,
        base.bodies_desc, 1.0, grid=base.config.grid,
        transfer="pallas", group=group, max_jobs=max_jobs, sparse=sparse,
        by=by, **band_kw,
    )
    if int(os.environ.get("BENCH_LAZY_SORT", 0)):
        # Eager sort is the default since round 5 (measured faster at 1M
        # even on settled sand: the whole-state cond carry outweighs the
        # skipped sorts).  A/B knob back to the lazy runtime skip.
        import dataclasses as _dc

        data.config = _dc.replace(data.config, lazy_sort=True)
    print(
        f"bench scene: {n} particles, grid {data.config.grid.shape}, "
        f"{substeps} substeps/frame, device={jax.devices()[0]}",
        file=sys.stderr,
    )

    cfg = data.config

    def sync(st):
        # Force a real device->host readback: through the axon tunnel,
        # block_until_ready alone can return before execution drains.
        return float(np.asarray(st.particles.pos[0, 0]))

    def make_stepper(c):
        return jax.jit(lambda s, p: step(s, p, c, num_substeps=substeps))

    stepper = make_stepper(cfg)
    t0 = time.time()
    try:
        state = stepper(data.state, data.params)
        sync(state)
    except Exception as e:  # noqa: BLE001
        # Safety net: the flagship shapes only compile on real Mosaic — if
        # a fresh kernel change trips a hardware-only limit (e.g. VMEM at
        # group=1024), fall back to group=512 (and force the gathered-
        # channel CDF path, its default) rather than produce no benchmark.
        print(f"bench fallback after: {type(e).__name__}: {e}",
              file=sys.stderr)
        os.environ["WGSPARKL_CHAN_FREE"] = "0"
        group = 512
        data = MpmData(
            base.params, base.state.particles, base.state.models,
            base.bodies_desc, 1.0, grid=base.config.grid,
            transfer="pallas", group=group, max_jobs=max_jobs,
            sparse=sparse, by=by, **band_kw,
        )
        cfg = data.config
        stepper = make_stepper(cfg)
        t0 = time.time()
        state = stepper(data.state, data.params)
        sync(state)
    compile_s = time.time() - t0
    print(f"compile+first frame: {compile_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(frames):
        state = stepper(state, data.params)
    sync(state)
    elapsed = time.time() - t0

    # Honesty gate: re-run one frame with on-device overflow counters and
    # fail loudly if any capacity (job table, migration, sparse tables)
    # clipped — a clipped run under-simulates and over-reports.
    from wgsparkl_tpu.pipeline import step_with_diag

    _, diag = jax.jit(
        lambda s, p: step_with_diag(s, p, cfg, num_substeps=substeps)
    )(state, data.params)
    print(f"diag: {diag.summary()}", file=sys.stderr)
    assert not bool(diag.any_overflow()), f"bench overflow: {diag.summary()}"

    total_steps = frames * substeps
    steps_per_s = total_steps / elapsed
    pups = steps_per_s * n  # particle-updates per second per chip
    # Rough useful-FLOP estimate per particle-update (transfer matmuls +
    # SVD/stress chain, ~30 kFLOP) vs one v5e chip's ~197 bf16 TFLOP/s.
    mfu = pups * 3.0e4 / 197e12
    print(
        f"{total_steps} substeps in {elapsed:.2f}s -> {steps_per_s:.2f} steps/s, "
        f"{pups/1e6:.1f}M particle-updates/s (~{mfu*100:.2f}% est. MFU)",
        file=sys.stderr,
    )
    pos = np.asarray(state.particles.pos)
    assert np.isfinite(pos).all(), "non-finite positions in bench run"
    try:
        with open(os.path.join(os.path.dirname(__file__), "BENCH_HISTORY.jsonl"),
                  "a") as f:
            # Label the record with every non-default knob so 1M rows stay
            # distinguishable after the fact (round-4 lesson: a whole A/B
            # batch became anonymous history entries).
            knobs = {
                k: os.environ[k] for k in sorted(os.environ)
                if k.startswith(("WGSPARKL_", "BENCH_")) and k != "BENCH_INIT_WAIT"
            }
            f.write(json.dumps({
                "ts": time.time(), "particles": n, "steps_per_s": steps_per_s,
                "pups_per_s": pups, "compile_s": round(compile_s, 1),
                "knobs": knobs, "group": group, "by": by, "sparse": sparse,
            }) + "\n")
    except OSError:
        pass

    print(
        json.dumps(
            {
                "metric": f"sim steps/s, {n} particle 3D sand (MLS-MPM, DP+CPIC), 1 chip",
                "value": round(steps_per_s, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / 60.0, 4),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:  # backend died between probe and run
        if "Unable to initialize backend" not in str(e):
            raise
        print(f"backend flapped mid-run: {e}", file=sys.stderr)
        _emit_stale_fallback()
