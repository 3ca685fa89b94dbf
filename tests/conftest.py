"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware is available in CI); real-chip perf is measured by bench.py.

Note: the container's sitecustomize registers the remote-TPU ('axon')
platform in every interpreter and sets jax_platforms explicitly, so setting
the JAX_PLATFORMS env var alone is not enough — we must override the config
after import, before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: repeat suite runs skip XLA:CPU compiles (the
# heaviest equivalence tests are ~50% compile time; measured 104.6s cold
# -> 49.0s warm on test_pallas_matches_blocked_3d_coupled).  Local dir,
# gitignored like .jax_cache.
# WGSPARKL_TEST_CACHE_DIR: point a CONCURRENT pytest process at its own
# cache — parallel writers to one cache dir have segfaulted inside
# jax's put_executable_and_time (observed with 3 suites sharing it).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "WGSPARKL_TEST_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_cpu"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
