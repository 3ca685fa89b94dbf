"""Quantify Mosaic (in-kernel) f32 math accuracy vs XLA-TPU and float64.

Round-4 finding: the folded grid update's in-kernel `1/m` produced a
systematic ~1.9e-4/substep velocity bias vs CPU (tools/check_tpu_numerics)
— hypothesis: Mosaic lowers f32 divide to the raw approximate VPU
reciprocal while XLA's elementwise divide refines it.  This probe measures
max relative error of divide / reciprocal / sqrt / rsqrt and their
Newton-refined forms, in a Pallas kernel and in plain XLA, against f64.

Usage (on the axon TPU): python tools/probe_mosaic_math.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def kernel(x_ref, y_ref, o_ref):
    x, y = x_ref[...], y_ref[...]
    r = 1.0 / x
    rs = jax.lax.rsqrt(x)
    o_ref[0] = r
    o_ref[1] = r * (2.0 - x * r)          # NR-refined reciprocal
    o_ref[2] = y / x
    o_ref[3] = jnp.sqrt(x)
    o_ref[4] = rs
    o_ref[5] = rs * (1.5 - 0.5 * x * rs * rs)  # NR-refined rsqrt
    o_ref[6] = x * rs                     # sqrt via rsqrt
    o_ref[7] = jnp.exp(jnp.log(x) * 0.5)  # transcendental chain reference


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    rng = np.random.default_rng(0)
    x = np.float32(np.exp(rng.uniform(-8, 8, size=(8, 512)))).astype(np.float32)
    y = np.float32(np.exp(rng.uniform(-4, 4, size=(8, 512)))).astype(np.float32)

    run = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8,) + x.shape, jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    out = np.asarray(jax.jit(run)(x, y))

    xla = jax.jit(
        lambda x, y: jnp.stack(
            [1.0 / x, y / x, jnp.sqrt(x), jax.lax.rsqrt(x)]
        )
    )
    ox = np.asarray(xla(x, y))

    x64, y64 = x.astype(np.float64), y.astype(np.float64)
    def rel(a, ref):
        return float(np.max(np.abs(a.astype(np.float64) - ref) / np.abs(ref)))

    names = ["recip", "recip_nr", "div", "sqrt", "rsqrt", "rsqrt_nr",
             "sqrt_via_rsqrt", "exp_log_sqrt"]
    refs = [1 / x64, 1 / x64, y64 / x64, np.sqrt(x64), 1 / np.sqrt(x64),
            1 / np.sqrt(x64), np.sqrt(x64), np.sqrt(x64)]
    print(f"device: {jax.devices()[0]}")
    print("-- Mosaic kernel --")
    for n, o, r in zip(names, out, refs):
        print(f"  {n:16s} max rel err = {rel(o, r):.3e}")
    print("-- plain XLA --")
    for n, o, r in zip(["recip", "div", "sqrt", "rsqrt"], ox,
                       [1 / x64, y64 / x64, np.sqrt(x64), 1 / np.sqrt(x64)]):
        print(f"  {n:16s} max rel err = {rel(o, r):.3e}")


if __name__ == "__main__":
    main()
