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
    StepDiag,
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

    mspec = jax.tree.map(shard_leading, state.models)
    if state.models.mat_table is not None:
        # The material table is a per-scene constant lookup, not
        # particle-indexed: replicate it.
        mspec = mspec.replace(mat_table=P())
    return SimState(
        particles=jax.tree.map(shard_leading, state.particles),
        models=mspec,
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
    cfg: MpmConfig, mesh: Mesh, num_substeps: int, axis: str = "dp",
    with_diag: bool = False,
):
    """Jitted SPMD step: (state, params) -> state with particles sharded.

    Works on all three transfer paths (dense / blocked / pallas): each chip
    sorts and transfers its own particle shard into a full local grid and
    the per-substep psum reduces grid momentum/mass + rigid impulses over
    ICI (or, under spatial_config, the halo exchange).  Requires particle
    count divisible by the mesh axis size (pad the scene with zero-mass
    particles if needed — `pad_particle_count`).

    with_diag=True (pallas path): returns (state, StepDiag) where each diag
    leaf is a [n_devices] per-shard vector of overflow counters — the
    observable for migration/halo/job capacity loss per chip.
    """

    fn = {
        "dense": substep,
        "blocked": substep_blocked,
        "pallas": substep_pallas,
    }[cfg.transfer]

    def local_steps(state, params):
        if cfg.transfer == "pallas":
            # rows-carry frame loop (one pack/unpack per call).
            out = step_pallas(
                state, params, cfg, num_substeps, axis,
                return_diag=with_diag,
            )
            if with_diag:
                state, diag = out
                return state, jax.tree.map(lambda x: x.reshape(1), diag)
            return out

        def body(s, _):
            return fn(s, params, cfg, axis_name=axis), None

        out, _ = jax.lax.scan(body, state, None, length=num_substeps)
        if with_diag:
            return out, jax.tree.map(
                lambda x: x.reshape(1), StepDiag.zeros()
            )
        return out

    def wrapped(state, params):
        specs = state_specs(state, axis)
        param_specs = jax.tree.map(lambda x: P(), params)
        out_specs = (
            (specs, jax.tree.map(lambda x: P(axis), StepDiag.zeros()))
            if with_diag else specs
        )
        return jax.shard_map(
            local_steps,
            mesh=mesh,
            in_specs=(specs, param_specs),
            out_specs=out_specs,
            check_vma=False,
        )(state, params)

    return jax.jit(wrapped)


def pad_particle_count(n: int, n_devices: int) -> int:
    return ((n + n_devices - 1) // n_devices) * n_devices


def spatial_config(cfg: MpmConfig, n_devices: int,
                   migration_cap: int = 2048,
                   halo_cap: int = 1024) -> MpmConfig:
    """Config for the spatially-decomposed pallas path: x-block slabs per
    device, halo-plane grid exchange, fixed-capacity particle migration.

    Works on the bounded grid AND the sparse/unbounded domain: sparse slabs
    split the NOMINAL grid's x extent (edge devices own everything beyond)
    and the halo exchange ships (key, row) pairs of the boundary plane's
    ACTIVE blocks (capacity halo_cap, overflow counted in StepDiag)."""
    import dataclasses

    from wgsparkl_tpu.ops import blocked as bk

    nb = bk.num_blocks(cfg.grid)
    assert cfg.transfer == "pallas"
    assert nb[0] % n_devices == 0, (
        f"x block count {nb[0]} must divide over {n_devices} devices"
    )
    return dataclasses.replace(
        cfg, spatial_devices=n_devices, migration_cap=migration_cap,
        halo_cap=halo_cap,
    )


def shard_state_spatial(state: SimState, mesh: Mesh, cfg: MpmConfig,
                        axis: str = "dp", slack: float = 0.5):
    """Reorder + pad particles into per-device x-slab chunks.

    Each device's chunk holds its slab's particles plus dead padding
    (mass 0, F = I, id -1) up to a common capacity with `slack` headroom
    for migration imbalance.  Returns the sharded SimState (particle count
    = n_devices * capacity).
    """
    import numpy as np

    from wgsparkl_tpu.ops import blocked as bk

    d_dev = cfg.spatial_devices
    nb = bk.num_blocks(cfg.grid)
    wx = nb[0] // d_dev
    bs = bk.block_size(state.particles.dim)
    h = cfg.grid.cell_width

    pos = np.asarray(state.particles.pos)
    bx = (np.round(pos[:, 0] / h).astype(np.int64) - 1
          - int(cfg.grid.origin_cell[0])) // bs
    slab = np.clip(bx // wx, 0, d_dev - 1)
    order = np.argsort(slab, kind="stable")
    counts = np.bincount(slab, minlength=d_dev)
    cap = int(np.ceil(counts.max() * (1.0 + slack)))
    cap = -(-cap // 8) * 8

    def rearrange(x, fill=0.0):
        x = np.asarray(x)
        out = np.full((d_dev * cap,) + x.shape[1:], fill, x.dtype)
        start = 0
        for k in range(d_dev):
            sel = order[start : start + counts[k]]
            out[k * cap : k * cap + counts[k]] = x[sel]
            start += counts[k]
        return out

    particles = jax.tree.map(rearrange, state.particles)
    # dead-lane fixups: identity F (log-safe), id -1.
    dg = np.asarray(particles.def_grad)
    mass = np.asarray(particles.mass)
    dead = mass == 0.0
    dg[dead] = np.eye(state.particles.dim, dtype=dg.dtype)
    ids = np.asarray(particles.ids)
    ids[dead] = -1
    particles = particles.replace(
        def_grad=jnp.asarray(dg), ids=jnp.asarray(ids)
    )
    mtab = state.models.mat_table
    models = jax.tree.map(
        rearrange,
        state.models.replace(mat_table=None) if mtab is not None
        else state.models,
    )
    if mtab is not None:
        models = models.replace(mat_table=mtab)   # per-scene constant
    new_state = SimState(
        particles=particles, models=models, bodies=state.bodies,
        meshes=state.meshes,
    )
    return shard_state(new_state, mesh, axis)
