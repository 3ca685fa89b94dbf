"""AOT compile warmup: prime the persistent compilation cache per shape.

Cold-cache compiles of the 1M-particle flagship step through the remote
TPU tunnel run minutes; the persistent cache
(jax_compilation_cache_dir) makes every later process hit in seconds.
This tool makes priming explicit and schedulable (deploy-time, not
first-request-time):

    python -m wgsparkl_tpu.utils.warmup --particles 1000000 \
        --substeps 20 --group 512 [--sparse] [--cpu]

It AOT-lowers and compiles `step` for the requested scene shape WITHOUT
running a single substep (jit(...).lower(...).compile()), then reports the
compile seconds and appends a record to BENCH_HISTORY.jsonl (kind:
"warmup") so compile latency is tracked per shape over time.

Shapes are what matters: any scene with the same particle count padding,
grid block counts, job-table size and transfer config shares the cache
entry.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def warmup(n_particles: int, substeps: int, group: int, sparse: bool = False,
           cache_dir: str = "/root/repo/.jax_cache") -> float:
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wgsparkl_tpu import scenes
    from wgsparkl_tpu.pipeline import MpmData, step

    nxz = int(round((n_particles / 2.2) ** (1.0 / 3.0)))
    ny = int(round(n_particles / (nxz * nxz)))
    base = scenes.sand_box_3d(nxz=nxz, ny=ny, cell_width=1.0, with_paddle=True)
    n = base.num_particles
    max_jobs = int((-(-n // group) * 1.5 + 256) // 128 * 128)
    data = MpmData(
        base.params, base.state.particles, base.state.models,
        base.bodies_desc, 1.0, grid=base.config.grid,
        transfer="pallas", group=group, max_jobs=max_jobs, sparse=sparse,
    )
    cfg = data.config
    fn = jax.jit(lambda s, p: step(s, p, cfg, num_substeps=substeps))

    t0 = time.time()
    compiled = fn.lower(data.state, data.params).compile()
    dt = time.time() - t0
    del compiled
    rec = {
        "ts": time.time(), "kind": "warmup", "particles": n,
        "substeps": substeps, "group": group, "sparse": sparse,
        "compile_s": round(dt, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec))
    try:
        hist = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "BENCH_HISTORY.jsonl",
        )
        with open(hist, "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError:
        pass
    return dt


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--particles", type=int, default=1_000_000)
    ap.add_argument("--substeps", type=int, default=20)
    ap.add_argument("--group", type=int, default=512)
    ap.add_argument("--sparse", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="warm the CPU backend instead of the TPU")
    ap.add_argument("--cache-dir", default="/root/repo/.jax_cache")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    warmup(args.particles, args.substeps, args.group, args.sparse,
           args.cache_dir)


if __name__ == "__main__":
    main()
