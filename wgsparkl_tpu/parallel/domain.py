"""Multi-chip SPMD stepping: particle sharding over a device mesh.

The reference is single-GPU with no distributed path (SURVEY.md 2.6 P9);
this module is the TPU-native scaling story: particles (and their per-particle
model state) are sharded over a 1D `dp` mesh axis with `shard_map`; each chip
scatters its particle shard into a full local grid, grid momentum/mass and
rigid impulses are `psum`-reduced over ICI, and G2P + particle update stay
fully local.  One collective pair per substep; everything else is chip-local.

For domains too large to replicate the grid, the blocked/sparse grid path
(ops/blocked.py) shards grid blocks spatially instead — see SURVEY.md P9's
halo-exchange plan (future work, layered on the same substep).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wgsparkl_tpu.pipeline import (
    MpmConfig,
    SimState,
    step_pallas,
    substep,
    substep_blocked,
    substep_pallas,
)


def state_specs(state: SimState, axis: str = "dp") -> SimState:
    """PartitionSpec pytree: particle-indexed arrays sharded on dim 0,
    body state replicated."""
    def shard_leading(x):
        return P(axis, *([None] * (x.ndim - 1)))

    return SimState(
        particles=jax.tree.map(shard_leading, state.particles),
        models=jax.tree.map(shard_leading, state.models),
        bodies=jax.tree.map(lambda x: P(), state.bodies),
        # Mesh-collider buffers (trimesh/polyline samples) are replicated;
        # tree.map over None stays None for scenes without meshes.
        meshes=jax.tree.map(lambda x: P(), state.meshes),
    )


def shard_state(state: SimState, mesh: Mesh, axis: str = "dp") -> SimState:
    """Place a host state onto the mesh with the canonical sharding."""
    specs = state_specs(state, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def make_sharded_step(
    cfg: MpmConfig, mesh: Mesh, num_substeps: int, axis: str = "dp"
):
    """Jitted SPMD step: (state, params) -> state with particles sharded.

    Works on all three transfer paths (dense / blocked / pallas): each chip
    sorts and transfers its own particle shard into a full local grid and
    the per-substep psum reduces grid momentum/mass + rigid impulses over
    ICI.  Requires particle count divisible by the mesh axis size (pad the
    scene with zero-mass particles if needed — `pad_particle_count`).
    """

    fn = {
        "dense": substep,
        "blocked": substep_blocked,
        "pallas": substep_pallas,
    }[cfg.transfer]

    def local_steps(state, params):
        if cfg.transfer == "pallas":
            # rows-carry frame loop (one pack/unpack per call).
            return step_pallas(state, params, cfg, num_substeps, axis)

        def body(s, _):
            return fn(s, params, cfg, axis_name=axis), None

        out, _ = jax.lax.scan(body, state, None, length=num_substeps)
        return out

    def wrapped(state, params):
        specs = state_specs(state, axis)
        param_specs = jax.tree.map(lambda x: P(), params)
        return jax.shard_map(
            local_steps,
            mesh=mesh,
            in_specs=(specs, param_specs),
            out_specs=specs,
            check_vma=False,
        )(state, params)

    return jax.jit(wrapped)


def pad_particle_count(n: int, n_devices: int) -> int:
    return ((n + n_devices - 1) // n_devices) * n_devices
