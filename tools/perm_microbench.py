"""Microbenchmark for the re-sort lane permutation (ops/permute.py).

Times permute_lanes alone at flagship scale under three permutation shapes
seen in the 1M bench (round-3 profile: 4.1 ms/substep):

  settled : per-chunk local jitter + slow global compaction drift + ~0.3%
            far movers (block crossers) — the sustained-phase shape, where
            81%+ of chunks take the NARROW path;
  stirred : bigger jitter + 1.5% far movers — the paddle-stirred phase;
  shift   : pure global shift (every chunk NARROW, zero exceptions) — the
            lower bound the kernel can hit without skipping work.

Usage: python tools/perm_microbench.py [npad] (default 1002240 ~ the 1M
bench's padded lane count).  Prints ms/call per shape.  Run on real TPU.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wgsparkl_tpu.ops import permute as pm  # noqa: E402

C0 = 48  # flagship moved-row count (material table era)


def make_perm(npad, jitter, far_frac, drift, seed=0):
    rng = np.random.default_rng(seed)
    keys = np.arange(npad, dtype=np.float64)
    # global compaction drift: ranks slowly compact toward the front,
    # cumulative across the array (what killed the static band in round 3)
    keys += drift * np.sin(np.arange(npad) / npad * np.pi)
    keys += rng.uniform(-jitter, jitter, npad)
    nfar = int(far_frac * npad)
    if nfar:
        idx = rng.choice(npad, nfar, replace=False)
        keys[idx] = rng.uniform(0, npad, nfar)
    return np.argsort(keys).astype(np.int32)


def bench(name, perm_np, rows, iters=50):
    perm = jnp.asarray(perm_np)

    @jax.jit
    def f(r, p):
        return pm.permute_lanes(r, p)

    out = f(rows, perm)
    out.block_until_ready()
    # correctness
    exp = np.asarray(rows)[:, perm_np]
    np.testing.assert_array_equal(np.asarray(out), exp)
    t0 = time.time()
    for _ in range(iters):
        out = f(rows, perm)
    out.block_until_ready()
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:10s}: {dt:7.3f} ms/call")
    return dt


def main():
    npad = int(sys.argv[1]) if len(sys.argv) > 1 else 1002240
    npad = -(-npad // 256) * 256
    print(f"npad={npad}, C0={C0}, CHUNK={pm.CHUNK}, device={jax.devices()[0]}")
    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.standard_normal((C0, npad)).astype(np.float32))
    shapes = {
        "shift": make_perm(npad, jitter=8, far_frac=0.0, drift=3000),
        "settled": make_perm(npad, jitter=40, far_frac=0.003, drift=3000),
        "stirred": make_perm(npad, jitter=120, far_frac=0.015, drift=8000),
    }
    for name, p in shapes.items():
        bench(name, p, rows)


if __name__ == "__main__":
    main()
