"""Shared example runner: headless frames + invariant printout.

Usage pattern mirrors the reference testbed binaries (testbed2.rs/testbed3.rs)
but headless: build scene -> Testbed.run(frames) -> print stats.

Set WGSPARKL_CPU=1 to force the CPU backend (otherwise runs on the default
device, e.g. the TPU chip).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("WGSPARKL_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def transfer_kw():
    """MpmData kwargs for the flagship transfer path.

    Examples default to transfer='pallas' — the MXU kernel path users
    should see first (the reference's examples ARE its fast path).  Set
    TRANSFER=dense/blocked to compare, GROUP to tune the job size.
    """
    kw = {"transfer": os.environ.get("TRANSFER", "pallas")}
    if kw["transfer"] in ("blocked", "pallas"):
        kw["group"] = int(os.environ.get("GROUP", 256))
    return kw


def run_example(data, num_substeps, frames=120, dump_ply_every=None, name="",
                dump_dir=None):
    import json

    from wgsparkl_tpu.testbed import Testbed

    tb = Testbed(data, num_substeps=num_substeps)
    stats = tb.run(
        frames, dump_ply_every=dump_ply_every,
        dump_dir=dump_dir or os.environ.get(
            "DUMP_DIR", f"/tmp/wgsparkl_frames_{name or 'scene'}"
        ),
    )
    print(json.dumps({"example": name, **stats}, indent=2))
    assert stats["finite"], "simulation produced non-finite state"
    return tb
