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

from wgsparkl_tpu import models, solver  # noqa: F401
from wgsparkl_tpu.params import SimulationParams  # noqa: F401
