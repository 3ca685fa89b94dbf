"""wgsparkl_tpu — a TPU-native MLS-MPM continuum-physics engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of dimforge/wgsparkl
(MPM on WebGPU): elastic solids, Drucker-Prager sand, fracture via a
phase/max-stretch field, and two-way rigid-body coupling using the CPIC/CDF
scheme.  The design is TPU-first:

* All simulation state is a pytree of structure-of-arrays jnp arrays.
* One simulation substep is a single pure function; substeps run under
  ``jax.lax.scan`` inside one ``jax.jit`` — zero host round-trips per frame
  (the reference re-encodes its command buffer per substep,
  ``src_testbed/step.rs:126-128``).
* The atomic linked-list scatter machinery of the reference
  (``src/grid/sort.wgsl``, ``src/solver/p2g.wgsl``) is replaced by dense
  gather/scatter + segmented reductions and, on the hot path, a block-tiled
  matmul formulation that rides the MXU.
* Multi-chip scaling uses ``jax.sharding`` + ``shard_map`` over a device
  mesh (particle sharding with grid reduction over ICI), not host loops.

Public API parity map (reference file:line cited in each module):
  wgsparkl::solver::{Particle, ParticleDynamics, SimulationParams}  -> wgsparkl_tpu.solver
  wgsparkl::models::{ElasticCoefficients, DruckerPrager}            -> wgsparkl_tpu.models
  wgsparkl::pipeline::{MpmPipeline, MpmData}                        -> wgsparkl_tpu.pipeline
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to single-pass bf16 (jax_default_matmul_precision
# DEFAULT), which ROUNDS f32 payloads riding the engine's 0/1 one-hot
# selection matmuls — verified on v5e: 65535.0 -> 65536.0 through a
# one-hot dot — corrupting affinity words / particle ids and degrading all
# transfer physics to ~bf16.  The engine's correctness contract is fp32
# trajectories (BASELINE.md north star), so the package-wide default is
# 'highest' (full f32 on the MXU).  The exactness-critical sites
# (ops/permute.py, ops/blocked.py tile moves, channel merges) additionally
# pin precision per-call so a user override cannot corrupt them.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from wgsparkl_tpu import models, solver  # noqa: F401
from wgsparkl_tpu.params import SimulationParams  # noqa: F401
