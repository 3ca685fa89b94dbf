"""Pipeline orchestrator: the whole MPM substep as ONE pure jitted function.

API parity with /root/reference/src/pipeline.rs (MpmPipeline::queue_step,
MpmData::new) — but where the reference records ~20 compute dispatches into a
command encoder and re-encodes them per substep (src_testbed/step.rs:126-128),
here `step` is a single jit-compiled function and substeps run in a
`lax.scan`, so a whole frame is one device launch with zero host round trips.

Pass order inside one substep mirrors pipeline.rs:195-281:
  1. rigid world mass properties        (rigid_impulses.wgsl:139-150)
  2. [rigid-particle transforms — mesh colliders, ops/rigid_cdf.py]
  3. (grid sort — not needed: dense grid, implicit activation)
  4. node CDF                           (grid_update_cdf.wgsl + collide.wgsl)
  5. [p2g rigid CDF — mesh colliders]
  6. particle CDF reconstruction        (g2p_cdf.wgsl)
  7. P2G + CPIC impulse accumulation    (p2g.wgsl)
  8. grid update                        (grid_update.wgsl)
  9. G2P                                (g2p.wgsl)
 10. particle update (fused models)     (particle_update.wgsl)
 11. rigid impulse application + body pose integration (rigid_impulses.wgsl:94-137)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.collision import cdf as cdf_mod
from wgsparkl_tpu.collision.shapes import Collider
from wgsparkl_tpu.grid import GridConfig
from wgsparkl_tpu.math import pose as pose_math
from wgsparkl_tpu.ops import transfer
from wgsparkl_tpu.ops.particle_update import particle_update
from wgsparkl_tpu.params import SimulationParams
from wgsparkl_tpu.rigid import body as body_mod
from wgsparkl_tpu.rigid.body import RigidWorld
from wgsparkl_tpu.solver import Models, Particles


@flax.struct.dataclass
class SimState:
    particles: Particles
    models: Models
    bodies: RigidWorld
    meshes: object = None  # Optional[ops.rigid_cdf.MeshColliders]


# Coupling modes (BodyCouplingEntry parity, pipeline.rs:107-168).
COUPLING_ONE_WAY = 1
COUPLING_TWO_WAY = 2


@dataclasses.dataclass(frozen=True)
class MpmConfig:
    """Static configuration (hashable; a jit static argument).

    transfer: 'dense' (scatter/gather reference path) or 'blocked' (sorted
    block-tiled MXU path, ops/blocked*.py — the fast path on TPU).
    group/job_chunk/max_jobs: blocked-path job sizing (see ops/blocked.py).
    dynamic_slots: body slots integrated dynamically (contact-resolved
    against static/kinematic colliders each substep).
    coupling: per-slot COUPLING_ONE_WAY / COUPLING_TWO_WAY (empty = all
    two-way, the reference's MpmData::new default, pipeline.rs:107-117).
    """

    grid: GridConfig
    collider_types: Tuple[int, ...] = ()
    dynamic_slots: Tuple[int, ...] = ()
    coupling: Tuple[int, ...] = ()
    elastic_model: str = "corotated"
    transfer: str = "dense"
    group: int = 256
    job_chunk: int = 32
    max_jobs: int = 0
    # Banded tile moves (ops/blocked.py gather/scatter_tiles_banded):
    # band = block-id span allowed per band_chunk of consecutive jobs;
    # exceeding chunks fall back to the full one-hot matmul at runtime.
    band: int = 2048
    band_chunk: int = 128
    # Gravity-axis block height (ops/blocked.py block_shape): 3D pallas
    # bounded-grid blocks are 4 x by x 4 nodes.  by=8 doubles the particles
    # a full block holds (1024 at 8/cell), halving the job count so
    # group-lane kernels run full and per-job overheads amortize; y-block
    # crossings (the re-sort trigger) also halve.  4 = the reference's
    # isotropic blocks (grid.wgsl:43).
    by: int = 4
    # Sparse/unbounded domain (pallas 3D): blocks live anywhere within
    # +-511 blocks (+-4088 cells) of grid.origin_cell; grid storage is a
    # fixed-capacity active-block table (kmax occupied / amax active slots)
    # rebuilt per substep — memory scales with capacity, not bounding box.
    sparse: bool = False
    kmax: int = 0
    amax: int = 0
    # Spatial multi-chip decomposition (pallas 3D bounded grid): the x-block
    # axis is split into spatial_devices slabs; each chip owns its slab's
    # grid rows, exchanges ONE boundary block-plane per substep (ppermute,
    # collective volume ~ halo not volume) and migrates slab-crossing
    # particles through fixed-capacity buffers (migration_cap per side).
    spatial_devices: int = 0
    migration_cap: int = 2048
    # Sparse x spatial: max active slots per exchanged boundary plane (the
    # sparse halo exchange ships (key, row) pairs, capacity-bounded and
    # diag-reported on overflow).
    halo_cap: int = 1024
    # Rigid-particle mesh colliders (body slots with trimesh/polyline/
    # heightfield shapes; see ops/rigid_cdf.py).
    mesh_cids: Tuple[int, ...] = ()
    sample_group: int = 128
    sample_chunk: int = 32
    sample_max_jobs: int = 0
    # Distinct material count (static): lanes 0..n_materials-1 of
    # Models.mat_table are populated (MpmData dedupes the immutable
    # per-particle constants; <= 128).
    n_materials: int = 1
    # Runtime skip of the re-sort when keys are already nondecreasing.
    # OFF by default: the whole-state lax.cond carry measured MORE
    # expensive than just sorting every substep, even on settled sand
    # (round 5, 1M: eager 31.6/32.3 vs lazy 31.2 steps/s) — opt in for
    # scenes where the order stays valid for long stretches AND the state
    # is small enough that the cond copies are cheap.
    lazy_sort: bool = False
    # Point-to-point (ball) joints between body slots: static tuples
    # (slot_b, slot_c, local_anchor_b, local_anchor_c) with float-tuple
    # anchors (rigid/joints.py; rapier's joint role in the reference
    # testbed, step.rs:201-217).
    joints: Tuple = ()
    # Body slots whose pose is assumed constant within a frame ('fixed'
    # bodies created with zero velocity — auto-inferred by MpmData).  Their
    # analytic node CDF is computed ONCE per frame by step_pallas instead of
    # every substep (the reference reruns collide.wgsl on every node every
    # substep).  Pass static_slots=() to disable (e.g. when mutating a fixed
    # body's pose mid-frame by hand).
    static_slots: Tuple[int, ...] = ()
    # Grid-update placement: True folds momentum -> velocity + gravity +
    # clamp into the G2P kernel (no dense grid pass; re-divides nodes
    # shared by overlapping windows — bit-equivalence kept by the exact
    # in-kernel Newton reciprocal); False runs the dense elementwise pass
    # (_grid_velocity).  OFF by default: the fold re-divides shared nodes
    # in every overlapping window and measured ~0.5 steps/s SLOWER at 1M
    # (round 5: 31.68 vs 31.18); WGSPARKL_FOLD_VEL=1 opts in (it can win
    # when windows are sparse on the grid).  Sets the MpmData default.
    fold_vel: bool = False
    # In-kernel analytic node CDF ("chan-free", pallas path): evaluate
    # every analytic collider's CDF at the window nodes inside the kernel
    # instead of a per-substep dense grid eval + per-job channel gather.
    # RESOLVED AT MpmData CONSTRUCTION: WGSPARKL_CHAN_FREE=1/0 forces it;
    # unset -> _auto_chan_free host heuristic (gathered wins whenever
    # settling matter piles onto a collider — measured 54.5 vs
    # 32.5 ms/substep at 1M on the ground-plane flagship, round 4).
    chan_free: bool = False

    @property
    def num_colliders(self) -> int:
        return len(self.collider_types)


# ------------------------------------------------------------------ the step
def substep(
    state: SimState,
    params: SimulationParams,
    cfg: MpmConfig,
    axis_name: Optional[str] = None,
) -> SimState:
    """One MPM substep (pure; jit/scannable with cfg static).

    axis_name: when running SPMD under shard_map with particles sharded over
    a device mesh axis, pass that axis name — grid contributions and rigid
    impulses are then reduced with psum over ICI (the TPU-native replacement
    for the reference's single-GPU global-memory accumulation; SURVEY.md P9).
    """
    particles, models, bodies = state.particles, state.models, state.bodies
    nc = cfg.num_colliders
    d = particles.dim

    # 1. Rigid world mass properties.
    bodies = body_mod.update_world_mass_properties(bodies)

    if nc > 0:
        # 4+5. Node CDF (analytic colliders + rigid-particle meshes).
        node_dist, node_aff, node_closest = _node_cdf_full(state, bodies, cfg)
        # 6. Particle CDF reconstruction.
        pcdf = cdf_mod.particle_cdf_update(
            particles.pos, particles.cdf_affinity, node_dist, node_aff,
            cfg.grid, nc,
        )
        particles = particles.replace(
            cdf_normal=pcdf["normal"],
            cdf_signed_distance=pcdf["signed_distance"],
            cdf_affinity=pcdf["affinity"],
        )
    else:
        m = cfg.grid.num_nodes
        node_aff = jnp.zeros((m,), jnp.uint32)
        node_closest = jnp.full((m,), -1, jnp.int32)

    # 7. P2G.
    grid_mom, grid_mass, lin_imp, ang_imp = transfer.p2g(
        particles, models, bodies, node_aff, node_closest, cfg.grid, nc
    )
    if axis_name is not None:
        grid_mom = jax.lax.psum(grid_mom, axis_name)
        grid_mass = jax.lax.psum(grid_mass, axis_name)
        lin_imp = jax.lax.psum(lin_imp, axis_name)
        ang_imp = jax.lax.psum(ang_imp, axis_name)
    # 8. Grid update.
    grid_vel = transfer.grid_update(grid_mom, grid_mass, params, cfg.grid)
    # 9. G2P.
    new_vel, vel_grad, rigid_vel = transfer.g2p(
        particles, bodies, grid_vel, node_aff, node_closest, cfg.grid, nc
    )
    particles = particles.replace(
        vel=new_vel, affine=vel_grad, cdf_rigid_vel=rigid_vel
    )
    # 10. Fused particle update.
    particles, models = particle_update(
        particles, models, params, cfg.grid, cfg.elastic_model
    )
    # 11. Rigid impulses + body integration.
    bodies = rigid_bodies_update(bodies, lin_imp, ang_imp, params, cfg)

    return SimState(particles=particles, models=models, bodies=bodies, meshes=state.meshes)


def _node_cdf_static(bodies, cfg: MpmConfig, block_major: bool = False):
    """Partial analytic node CDF over cfg.static_slots only (poses constant
    within a frame) — computed once per frame by step_pallas and merged into
    every substep's moving-collider CDF by _node_cdf_full."""
    from wgsparkl_tpu.ops import blocked as bk

    from wgsparkl_tpu.collision import cdf_channel

    grid = cfg.grid
    pos_ch = (bk.block_major_node_positions_ch(grid, cfg.by) if block_major
              else grid.node_position_channels())
    return cdf_channel.node_cdf_channels(
        cfg.collider_types, bodies.shape_params, bodies.rot, bodies.pos,
        pos_ch, grid.cell_width, only=frozenset(cfg.static_slots),
    )


def _node_cdf_full(state: SimState, bodies, cfg: MpmConfig,
                   block_major: bool = False, static_part=None):
    """Node CDF: analytic shapes (grid_update_cdf/collide.wgsl) merged with
    the rigid-particle mesh pass (p2g_cdf.wgsl; ops/rigid_cdf.py).

    With block_major=True the channels come back in the grid's block-major
    storage order (no ghost block): the CDF math runs directly on
    block-major node positions and the mesh pass — already block-major —
    just drops its ghost slot.  This avoids a [M, C] layout transpose with
    a 1-lane minor dim (~2 ms per channel per substep at 1M particles).

    static_part: optional (dist, aff, closest) triple for cfg.static_slots
    precomputed at frame start (same block_major layout); only the moving
    colliders are evaluated here and the two merge exactly
    (cdf_channel.merge_node_cdf).
    """
    from wgsparkl_tpu.ops import blocked as bk
    from wgsparkl_tpu.ops import rigid_cdf

    from wgsparkl_tpu.collision import cdf_channel

    grid = cfg.grid
    pos_ch = (bk.block_major_node_positions_ch(grid, cfg.by) if block_major
              else grid.node_position_channels())
    only = None
    if static_part is not None:
        only = frozenset(
            i for i in range(len(cfg.collider_types))
            if i not in cfg.static_slots
        )
    node_dist, node_aff, node_closest = cdf_channel.node_cdf_channels(
        cfg.collider_types, bodies.shape_params, bodies.rot, bodies.pos,
        pos_ch, grid.cell_width, only=only,
    )
    if static_part is not None:
        node_dist, node_aff, node_closest = cdf_channel.merge_node_cdf(
            static_part, (node_dist, node_aff, node_closest)
        )
    if cfg.mesh_cids:
        key_b, asg_b = rigid_cdf.mesh_node_cdf(
            state.meshes, bodies, grid, cfg.mesh_cids,
            cfg.sample_group, cfg.sample_max_jobs, cfg.sample_chunk,
            by=cfg.by if block_major else 4,
        )
        if block_major:
            key_f = key_b[:-1].reshape(-1)
            asg_f = asg_b[:-1].reshape(-1, asg_b.shape[-1])
        else:
            key_f = rigid_cdf.blocks_to_flat(key_b, grid)[:, 0]
            asg_f = rigid_cdf.blocks_to_flat(asg_b, grid)
        node_dist, node_aff, node_closest = rigid_cdf.merge_mesh_into_node_cdf(
            node_dist, node_aff, node_closest, key_f, asg_f, cfg.mesh_cids
        )
    return node_dist, node_aff, node_closest


def _to_blocks(arr_flat, grid_cfg, ghost_value):
    """Row-major flat node array [M, C] -> block-major [NB+1, BS.., C]
    (slot NB is the ghost block used for window overflow)."""
    from wgsparkl_tpu.ops import blocked as bk

    d = grid_cfg.dim
    bs = bk.block_size(d)
    shp = grid_cfg.shape
    c = arr_flat.shape[-1] if arr_flat.ndim > 1 else 1
    a = arr_flat.reshape(*shp, c)
    if d == 2:
        a = a.reshape(shp[0] // bs, bs, shp[1] // bs, bs, c)
        a = a.transpose(0, 2, 1, 3, 4).reshape(-1, bs, bs, c)
    else:
        # Block order (x, z, y) — gravity fastest, matching the flat
        # block ids / sort keys (ops/blocked.py storage_strides).
        a = a.reshape(
            shp[0] // bs, bs, shp[1] // bs, bs, shp[2] // bs, bs, c
        )
        a = a.transpose(0, 4, 2, 1, 3, 5, 6).reshape(-1, bs, bs, bs, c)
    ghost = jnp.full((1,) + a.shape[1:], ghost_value, a.dtype)
    return jnp.concatenate([a, ghost], axis=0)


def substep_blocked(
    state: SimState,
    params: SimulationParams,
    cfg: MpmConfig,
    axis_name: Optional[str] = None,
) -> SimState:
    """One MPM substep on the blocked MXU transfer path.

    Particles come out in block-sorted order (ids tracks identity); see
    ops/blocked.py for the design.
    """
    from wgsparkl_tpu.ops import blocked as bk
    from wgsparkl_tpu.ops import blocked_transfer as bt

    particles, models, bodies = state.particles, state.models, state.bodies
    nc = cfg.num_colliders
    grid = cfg.grid
    d = particles.dim
    nb = bk.num_blocks(grid)
    nb_total = int(np.prod(nb))
    bs = bk.block_size(d)

    bodies = body_mod.update_world_mass_properties(bodies)

    # Sort phase (replaces grid.rs:30-206 hashmap sort).
    block_ids, _ = bk.particle_block_ids(particles.pos, grid)
    (particles, models), sorted_ids, _ = bk.sort_by_block(
        (particles, models), block_ids
    )
    jobs = bk.build_jobs(sorted_ids, nb_total, cfg.group, cfg.max_jobs)

    # Node CDF + particle CDF reconstruction.
    if nc > 0:
        node_dist, node_aff, node_closest = _node_cdf_full(state, bodies, cfg)
        pcdf = cdf_mod.particle_cdf_update(
            particles.pos, particles.cdf_affinity, node_dist, node_aff,
            grid, nc,
        )
        particles = particles.replace(
            cdf_normal=pcdf["normal"],
            cdf_signed_distance=pcdf["signed_distance"],
            cdf_affinity=pcdf["affinity"],
        )
        grid_aff_b = _to_blocks(node_aff, grid, jnp.uint32(0))
        grid_closest_b = _to_blocks(node_closest, grid, -1)
    else:
        grid_aff_b = jnp.zeros((nb_total + 1,) + (bs,) * d + (1,), jnp.uint32)
        grid_closest_b = jnp.full(
            (nb_total + 1,) + (bs,) * d + (1,), -1, jnp.int32
        )

    sp = {
        "pos": particles.pos,
        "vel": particles.vel,
        "mass": particles.mass,
        "affine": particles.affine,
        "aff": particles.cdf_affinity,
        "normal": particles.cdf_normal,
    }

    grid_mm, lin_imp, ang_imp = bt.p2g_blocked(
        sp, jobs, bodies, grid_aff_b, grid_closest_b, grid, nc,
        cfg.group, cfg.job_chunk,
    )
    if axis_name is not None:
        grid_mm = jax.lax.psum(grid_mm, axis_name)
        lin_imp = jax.lax.psum(lin_imp, axis_name)
        ang_imp = jax.lax.psum(ang_imp, axis_name)

    # Grid update (elementwise on blocks; ghost slot stays zero).  Shared
    # with the pallas FOLD_VEL=0 path so the two can't silently diverge.
    vel_b = _grid_velocity(grid_mm, params, grid, d)

    new_vel, vel_grad = bt.g2p_blocked(
        sp, jobs, bodies, vel_b, grid_aff_b, grid_closest_b, grid, nc,
        cfg.group, cfg.job_chunk, particles.count,
    )
    rigid_vel = transfer.rigid_velocity_sum(
        particles.pos, particles.cdf_affinity, bodies, nc
    )
    particles = particles.replace(
        vel=new_vel, affine=vel_grad, cdf_rigid_vel=rigid_vel
    )
    particles, models = particle_update(
        particles, models, params, grid, cfg.elastic_model
    )
    bodies = rigid_bodies_update(bodies, lin_imp, ang_imp, params, cfg)
    return SimState(particles=particles, models=models, bodies=bodies, meshes=state.meshes)


def pallas_npad(n: int, group: int) -> int:
    """Lane padding for the channel-major pallas state (multiple of 2048 so
    both the banded permute's 256-lane chunks and the fused particle-update
    kernel's 2048-lane blocks divide it; >= group slack for the job-start
    sentinels)."""
    return -((n + group) // -2048) * 2048


def substep_pallas(
    state: SimState,
    params: SimulationParams,
    cfg: MpmConfig,
    axis_name: Optional[str] = None,
) -> SimState:
    """One MPM substep with Pallas transfer kernels (the hot path; 3D and 2D).

    Wrapper over the channel-major core `_substep_pallas_rows`: packs the
    state into one [PCHAN, NPAD] row matrix, steps, unpacks.  Frame loops
    go through `step` / `step_pallas`, which carry the rows through the
    whole substep lax.scan and pack/unpack ONCE per frame.
    """
    if state.particles.dim == 2:
        from wgsparkl_tpu.ops import pallas_transfer2d as ptf

        core = _substep_pallas_rows_2d
        assert not cfg.sparse, "sparse domain is 3D-only for now"
    else:
        from wgsparkl_tpu.ops import pallas_transfer as ptf

        core = _substep_pallas_rows

    n = state.particles.count
    slack = 2 * cfg.migration_cap if cfg.spatial_devices else 0
    npad = pallas_npad(n + slack, cfg.group)
    rows = ptf.pack_rows_padded(state.particles, state.models, npad)
    rows, bodies, _ = core(
        rows, state.bodies, state.meshes, params, cfg, n, axis_name,
        mtable=state.models.mat_table,
    )
    particles, models = ptf.unpack_state_rows(
        rows[:, :n], state.particles, state.models,
        n_mat=max(int(cfg.n_materials), 1),
    )
    return SimState(particles=particles, models=models, bodies=bodies,
                    meshes=state.meshes)


def step_pallas(
    state: SimState,
    params: SimulationParams,
    cfg: MpmConfig,
    num_substeps: int,
    axis_name: Optional[str] = None,
    return_diag: bool = False,
):
    """A frame of pallas substeps with the [PCHAN, NPAD] channel matrix as
    the scan carry — per-particle state never leaves channel-major layout
    between substeps (no per-substep pack/unpack/[N,3] transposes).

    With return_diag=True also returns a StepDiag of on-device overflow
    counters for the frame (job table, sparse capacities, migration cap,
    frame-end live-lane truncation)."""
    if state.particles.dim == 2:
        from wgsparkl_tpu.ops import pallas_transfer2d as ptf

        core = _substep_pallas_rows_2d
        assert not cfg.sparse, "sparse domain is 3D-only for now"
    else:
        from wgsparkl_tpu.ops import pallas_transfer as ptf

        core = _substep_pallas_rows

    n = state.particles.count
    slack = 2 * cfg.migration_cap if cfg.spatial_devices else 0
    npad = pallas_npad(n + slack, cfg.group)
    rows0 = ptf.pack_rows_padded(state.particles, state.models, npad)

    # Never-moving colliders (cfg.static_slots): analytic node CDF hoisted
    # out of the substep scan — computed ONCE per frame here, merged with
    # the moving colliders' per-substep CDF inside the core.  The sparse
    # core evaluates CDF on dynamic active-node positions and cannot
    # consume a precomputed full-grid buffer.
    # (Chan-free mode evaluates every analytic collider IN-KERNEL at the
    # window nodes, see _cdf_mode — no hoist at all.  The 3D GATHERED mode
    # for analytic scenes pre-packs the static colliders' CHANNEL GRID once
    # per frame and merges moving colliders in-kernel at the window nodes
    # (kernel gate level 2), so its per-substep dense node-CDF
    # eval/merge/pack disappears too — dropping this hoist was the round-4
    # 34.2 -> 31.5 steps/s regression at 1M (round-5 bisection).  The plain
    # static_cdf partial remains for the mesh fallback and the 2D core.)
    static_cdf = None
    static_chan = None
    if cfg.static_slots and cfg.num_colliders > 0 and not cfg.sparse:
        dim = state.particles.dim
        all_static = len(cfg.static_slots) == cfg.num_colliders
        if dim == 2 and all_static and not cfg.mesh_cids \
                and not cfg.chan_free:
            # 2D, every collider frame-static: the whole channel grid
            # hoists (the 2D kernels have no gathered+in-kernel merge
            # mode, so a single moving collider falls back to the
            # per-substep dense eval below).
            from wgsparkl_tpu.ops import blocked as bk

            nb_total = int(np.prod(bk.num_blocks(cfg.grid, cfg.by)))
            static_chan = _cdf_chan_grid(
                *_node_cdf_static(state.bodies, cfg, block_major=True),
                nb_total, 2,
            )
        elif cfg.mesh_cids or dim == 2:
            static_cdf = _node_cdf_static(state.bodies, cfg,
                                          block_major=True)
        elif not cfg.chan_free:
            from wgsparkl_tpu.ops import blocked as bk

            nb_total = int(np.prod(bk.num_blocks(cfg.grid, cfg.by)))
            static_chan = _cdf_chan_grid(
                *_node_cdf_static(state.bodies, cfg, block_major=True),
                nb_total, 3, cfg.by,
            )

    mtable = state.models.mat_table

    def body(carry, _):
        rows, bodies, dg = carry
        rows, bodies, dg = core(
            rows, bodies, state.meshes, params, cfg, n, axis_name, dg,
            static_cdf=static_cdf, static_chan=static_chan, mtable=mtable,
        )
        return (rows, bodies, dg), None

    (rows, bodies, diag), _ = jax.lax.scan(
        body, (rows0, state.bodies, StepDiag.zeros()), None,
        length=num_substeps,
    )
    if cfg.spatial_devices and axis_name is not None:
        # Frame-end truncation to the shard's fixed capacity n: live lanes
        # occupy a sorted prefix, so anything past n is silently gone unless
        # counted here (migration imbalance can push live population over
        # the per-shard allocation — raise the shard slack when flagged).
        live = jnp.sum((rows[ptf.PM] > 0.0).astype(jnp.int32))
        diag = diag.replace(
            live_lost=jnp.maximum(diag.live_lost, live - n)
        )
    particles, models = ptf.unpack_state_rows(
        rows[:, :n], state.particles, state.models,
        n_mat=max(int(cfg.n_materials), 1),
    )
    out = SimState(particles=particles, models=models, bodies=bodies,
                   meshes=state.meshes)
    return (out, diag) if return_diag else out


def step_with_diag(
    state: SimState,
    params: SimulationParams,
    cfg: MpmConfig,
    num_substeps: int,
    axis_name: Optional[str] = None,
):
    """`step` + on-device StepDiag overflow counters (pallas path; other
    transfer paths return a zero diag — their capacities are checked
    host-side by utils/diagnostics.check)."""
    if cfg.transfer == "pallas":
        return step_pallas(
            state, params, cfg, num_substeps, axis_name, return_diag=True
        )
    return step(state, params, cfg, num_substeps), StepDiag.zeros()



def _body_table(bodies, params=None, grid=None):
    """[32, 128] body table for in-kernel node body velocities, impulse
    lever arms, and moving-collider window CDF: rows 0-2 world COM,
    3-5 linvel, 6-8 angvel, 9+ rotation (quat wxyz 3D / cos-sin 2D),
    13+ translation, 16-23 shape params; lanes = slots.  With params/grid,
    row 24 lanes 0-2 carry gravity*dt and lane 3 the 1-cell/step velocity
    clamp for the in-kernel grid update (g2p_rows fold_vel)."""
    nb = bodies.count
    btable = jnp.zeros((32, 128), jnp.float32)
    btable = btable.at[0:3, :nb].set(bodies.world_com.T)
    btable = btable.at[3:6, :nb].set(bodies.linvel.T)
    btable = btable.at[6:9, :nb].set(bodies.angvel.T)
    btable = btable.at[9 : 9 + bodies.rot.shape[1], :nb].set(bodies.rot.T)
    btable = btable.at[13 : 13 + bodies.dim, :nb].set(bodies.pos.T)
    btable = btable.at[16 : 16 + bodies.shape_params.shape[1], :nb].set(
        bodies.shape_params.T
    )
    if params is not None:
        d = bodies.dim
        btable = btable.at[24, :d].set(params.gravity * params.dt)
        btable = btable.at[24, 3].set(grid.cell_width / params.dt)
    return btable


@flax.struct.dataclass
class StepDiag:
    """On-device health counters for one pallas frame (int32 scalars;
    zero = healthy).

    The substep cores mask every capacity overflow out of the transfers so
    it degrades instead of corrupting; these counters make each masked
    condition observable without a host round trip per substep
    (failure-detection role, SURVEY.md section 5.3 — the reference's
    hashmap overflow is silent, grid.wgsl:126-129).
    """

    job_overflow: jnp.ndarray         # max over substeps of jobs_needed - max_jobs
    sparse_occ_overflow: jnp.ndarray  # max of distinct occupied blocks - kmax
    sparse_act_overflow: jnp.ndarray  # max of active slots - amax
    migration_dropped: jnp.ndarray    # cumulative slab-crossers beyond migration_cap
    live_lost: jnp.ndarray            # live lanes dropped at frame-end truncation
    halo_dropped: jnp.ndarray         # sparse halo-plane slots beyond halo_cap
    band_miss: jnp.ndarray            # job chunks (bounded; substeps on the
    #                                   sparse path) whose banded grid moves
    #                                   took the full-grid matmul (perf, not
    #                                   correctness: the fallback is exact)

    @classmethod
    def zeros(cls) -> "StepDiag":
        z = jnp.zeros((), jnp.int32)
        return cls(z, z, z, z, z, z, z)

    def any_overflow(self):
        return (
            (self.job_overflow > 0)
            | (self.sparse_occ_overflow > 0)
            | (self.sparse_act_overflow > 0)
            | (self.migration_dropped > 0)
            | (self.live_lost > 0)
            | (self.halo_dropped > 0)
        )

    def summary(self) -> str:
        vals = {
            f.name: int(getattr(self, f.name))
            for f in dataclasses.fields(self)
        }
        bm = vals.pop("band_miss", 0)
        flags = [f"{k}={v}" for k, v in vals.items() if v > 0]
        out = "OK" if not flags else "OVERFLOW: " + ", ".join(flags)
        if bm:
            out += f" [band_miss={bm} chunks on full-grid moves]"
        return out


# ------------------------------------------------- shared pallas-core phases
def _perm_prefix(mod):
    """Rows to move in the re-sort permute.  Default 0 = the FULL payload:
    the 40-row live-prefix + stale-tail-reattach optimisation measured ~1
    steps/s SLOWER at 1M than the plain full permute (round-5 bisection:
    fd08cdf 31.5 -> 5503470 30.5; confirmed by the PERM_ROWS=0 combo run
    33.49 vs 32.33) — the tail concat costs more than the moved rows.
    WGSPARKL_PERM_ROWS=prefix re-enables the skip for A/B."""
    import os as _os
    v = _os.environ.get("WGSPARKL_PERM_ROWS", "0")
    if v == "0":
        return 0
    return min(int(v), getattr(mod, "PERM_ROWS", 0))


def _lazy_sort(rows_all, keys, npad: int, lazy: bool = True,
               perm_rows: int = 0):
    """Lazy re-sort: when the block keys are still nondecreasing the current
    order IS a valid sort — skip the permutation entirely (the reference
    re-sorts unconditionally every substep, grid.rs:30-206).  Otherwise the
    WHOLE state moves as one banded lane permutation (ops/permute.py).
    lazy=False drops the runtime skip (and its whole-state cond carry) —
    right for scenes that never settle (WGSPARKL_EAGER_SORT=1 A/B knob in
    bench.py via MpmConfig.lazy_sort).

    perm_rows > 0: only rows [0, perm_rows) ride the permutation — rows
    past it (sd / rigid contact velocity / pads; the ptf.PERM_ROWS layout
    invariant) are recomputed by the update kernel after every sort before
    any read, so moving them would be pure waste.

    Every row is a NaN-free matmul-safe payload by layout: the CPIC
    affinity word rides permanently as two <=16-bit integer-valued f32
    halves (AFF / AFF_SPARE; see pallas_transfer._paff_u32)."""
    from wgsparkl_tpu.ops.permute import permute_lanes

    lane = jnp.arange(npad, dtype=jnp.int32)
    still = jnp.all(keys[1:] >= keys[:-1])

    def keep(args):
        return args

    def resort(args):
        rows, kk = args
        sids, perm = jax.lax.sort((kk, lane), num_keys=1)
        if perm_rows and perm_rows < rows.shape[0]:
            out = jnp.concatenate(
                [permute_lanes(rows[:perm_rows], perm), rows[perm_rows:]]
            )
        else:
            out = permute_lanes(rows, perm)
        return out, sids

    if not lazy:
        return resort((rows_all, keys))
    return jax.lax.cond(still, keep, resort, (rows_all, keys))


def _mask_jobs(jobs, npad: int, group: int):
    """Clamp job starts into the padded lane range and return the covered
    rank prefix: on job-table overflow (jobs_needed > max_jobs) the dropped
    jobs' particles would read uninitialized kernel output — every sorted
    rank past the last live job's end is masked out downstream (live jobs
    cover a contiguous rank prefix)."""
    covered_end = jnp.max(
        jnp.where(jobs["len"] > 0, jobs["start"] + jobs["len"], 0)
    )
    starts = jnp.where(
        jobs["len"] > 0, jnp.minimum(jobs["start"], npad - group), npad - group
    )
    return covered_end, starts


def _bounded_job_phase(sorted_ids, grid, d: int, by: int, group: int,
                       cfg: MpmConfig, npad: int, diag: StepDiag):
    """Job table + tile addressing for the BOUNDED grid (3D and 2D cores):
    boundary-compaction job build, overflow accounting, job-start masking,
    block cell origins, and the banded gather/scatter closures.

    Returns (jobs, bcells, covered_end, gather_tiles, scatter_mm, nb_total,
    diag)."""
    from wgsparkl_tpu.ops import blocked as bk

    nb = bk.num_blocks(grid, by)
    nb_total = int(np.prod(nb))
    bsh = bk.block_shape(d, by)
    jobs = bk.build_jobs(sorted_ids, nb_total, group, cfg.max_jobs)
    diag = diag.replace(
        job_overflow=jnp.maximum(
            diag.job_overflow, jobs["needed"] - cfg.max_jobs
        )
    )
    jobs["block"] = bk.key_to_block(jobs["block"], nb, d)
    # Out-of-grid particles land in the overflow bucket and belong to no
    # job; their kernel output rows are never written and must be masked
    # off — see _mask_jobs.
    covered_end, starts = _mask_jobs(jobs, npad, group)
    jobs = {"start": starts, "len": jobs["len"], "block": jobs["block"]}
    blk_coords = bk.block_coords_of(jobs["block"], nb)
    bcells = (blk_coords * jnp.asarray(bsh, jnp.int32)
              + jnp.asarray(grid.origin_cell, jnp.int32))
    nbr = jnp.asarray(bk.neighbor_block_table(nb))
    band_lo, bands_ok = bk.band_info_chunks(
        jobs["block"], nb_total, cfg.band, cfg.band_chunk
    )
    # Perf-health counter: job chunks whose block span exceeds the static
    # band take a per-chunk full-grid matmul inside the move scan (exact;
    # ~[8*cj, nb_total]-sized).  Pre-per-chunk history: the 128^3 dam
    # break's splash phase had a handful of wide chunks EVERY substep and
    # the then-global fallback paid full [jobs, nb_total] moves for the
    # whole substep — 15 of 25 ms.  band_miss accumulates the chunk count
    # (0 = everything rode the narrow band).
    diag = diag.replace(
        band_miss=diag.band_miss + jnp.sum(1 - bands_ok.astype(jnp.int32))
    )

    def gather_tiles(grid_arr, out=None, c=None):
        return bk.gather_tiles_auto(
            grid_arr, jobs["block"], band_lo, bands_ok, nbr, nb, d,
            cfg.band, cfg.band_chunk, out=out, c=c, by=by,
        )

    def scatter_mm(grid_arr, tiles):
        return bk.scatter_tiles_auto(
            grid_arr, tiles, jobs["block"], band_lo, bands_ok, nbr, nb,
            d, cfg.band, cfg.band_chunk, win=True, by=by,
        )

    return jobs, bcells, covered_end, gather_tiles, scatter_mm, nb_total, diag


def _cdf_chan_grid(node_dist, node_aff, node_closest, nrows: int, d: int,
                   by: int = 4):
    """Node CDF channels -> flat channel-merged grid rows [nrows+1, bsd*4].

    The uint32 affinity word splits into two exact <=16-bit f32 channels;
    [aff_lo, aff_hi, closest, dist] interleave per cell via exact 0/1
    matmuls (bk._chan_merge_mat_np).  Row nrows is the ghost row (closest
    = NONE) that dead jobs and window overflow read."""
    from wgsparkl_tpu.ops import blocked as bk

    bsd = int(np.prod(bk.block_shape(d, by)))
    aff_lo = (node_aff & jnp.uint32(0xFFFF)).astype(jnp.float32)
    aff_hi = (node_aff >> 16).astype(jnp.float32)
    cm4 = jnp.asarray(bk._chan_merge_mat_np(d, 4, by))
    chs = [aff_lo, aff_hi, node_closest.astype(jnp.float32), node_dist]
    chan_flat = bk.sel3_dot(
        jnp.concatenate([x.reshape(nrows, bsd) for x in chs], axis=1),
        cm4, (((1,), (0,)), ((), ())), "a",
    )
    ghost_np = np.zeros((1, bsd * 4), np.float32)
    ghost_np[0, 2::4] = -1.0             # closest must read NONE (-1)
    return jnp.concatenate([chan_flat, jnp.asarray(ghost_np)], axis=0)


def _jbody_gate(ntiles, wvol: int, static_slots=None):
    """Per-job CPIC gate LEVEL: 0 = no collider-touched node in the window
    (skip all pairwise CPIC work), 1 = collider nodes present but every
    node's closest body is in static_slots (zero velocity always — the
    kernels run the cheap per-particle ghost chain and skip impulses, which
    static bodies discard), 2 = some node's closest body can move (full
    pairwise path).  Pad rows carry closest == 0, so reductions are masked
    to the real window.  static_slots=None reports 0/2 (no static path)."""
    wmask = (jnp.arange(ntiles.shape[1]) < wvol)[None, :]
    closest = ntiles[..., 2]
    any_c = jnp.any(
        ((ntiles[..., 0] + ntiles[..., 1] > 0.0) | (closest >= 0.0)) & wmask,
        axis=1,
    )
    if static_slots is None:
        return any_c.astype(jnp.int32) * 2
    is_static = jnp.zeros(closest.shape, bool)
    for s in static_slots:
        is_static = is_static | (closest == float(s))
    moving = jnp.any((closest >= 0.0) & ~is_static & wmask, axis=1)
    return jnp.where(
        moving, 2, jnp.where(any_c, 1, 0)
    ).astype(jnp.int32)


def _moving_reach_gate(bcells, bodies, moving, wsh, h):
    """[MAXJ] bool: job window POSSIBLY within node-CDF reach (1.5 cells)
    of a moving collider.  Conservative — window-center surface distance
    vs cap + window half-diagonal (triangle inequality: any node within
    cap of the surface puts the center within this threshold) — so false
    positives only promote the job's gate level (extra pairwise work),
    never miss physics; the in-kernel merge is exact."""
    from wgsparkl_tpu.collision import cdf_channel as cch
    from wgsparkl_tpu.collision import shapes as shp

    d = bcells.shape[1]
    ctr = [
        (bcells[:, a].astype(jnp.float32) + (wsh[a] - 1) * 0.5) * h
        for a in range(d)
    ]
    half_diag = 0.5 * h * float(np.sqrt(sum((s - 1) ** 2 for s in wsh)))
    thresh = 1.5 * h + half_diag
    hit = jnp.zeros((bcells.shape[0],), bool)
    for slot, st in moving:
        ri = [bodies.rot[slot, k] for k in range(bodies.rot.shape[1])]
        ti = [bodies.pos[slot, k] for k in range(d)]
        q = cch._to_local(ri, ti, ctr)
        if st == shp.SHAPE_CUBOID:
            he = [bodies.shape_params[slot, a] for a in range(d)]
            proj, inside = cch._proj_cuboid(he, q)
        elif st == shp.SHAPE_BALL:
            proj, inside = cch._proj_ball(bodies.shape_params[slot, 0], q)
        elif st == shp.SHAPE_CAPSULE:
            proj, inside = cch._proj_capsule(
                bodies.shape_params[slot, 0], bodies.shape_params[slot, 1], q
            )
        else:
            proj, inside = cch._proj_halfspace(q)
        # rotation preserves norms: the local-frame gap length IS the
        # world-frame surface distance.
        di = jnp.sqrt(sum((proj[a] - q[a]) ** 2 for a in range(d)))
        hit = hit | inside | (di <= thresh)
    return hit


def _split_impulses(imp_out, count: int, d: int):
    """Per-job in-kernel impulse accumulators [J, 8, 128] -> (lin, ang)."""
    imp_sum = jnp.sum(imp_out, axis=0)
    ang_rows = 3 if d == 3 else 1
    return imp_sum[0:d, :count].T, imp_sum[d : d + ang_rows, :count].T


def _halo_exchange_x(grid_mm, nb_total: int, p2: int, kdev, wx: int,
                     d_dev: int, axis_name):
    """Bounded-grid halo exchange instead of a whole-grid psum: stencil
    windows only reach +1 block in x, so each chip's contributions land in
    its own slab plus ONE overhang x-plane (p2 = blocks per plane in
    storage order).  (1) send the overhang plane right and add it into the
    owner's first plane; (2) fetch the right neighbor's reduced first plane
    back into the local overhang for G2P reads.  Collective volume = one
    block-plane."""
    flatg = grid_mm.reshape(nb_total + 1, -1)
    cols = flatg.shape[1]
    ov_start = jnp.minimum((kdev + 1) * wx * p2, nb_total + 1 - p2)
    ov = jax.lax.dynamic_slice(flatg, (ov_start, 0), (p2, cols))
    recv = jax.lax.ppermute(
        ov, axis_name, [(i, i + 1) for i in range(d_dev - 1)]
    )
    first_start = kdev * wx * p2
    first = (
        jax.lax.dynamic_slice(flatg, (first_start, 0), (p2, cols)) + recv
    )
    flatg = jax.lax.dynamic_update_slice(flatg, first, (first_start, 0))
    nf = jax.lax.ppermute(
        first, axis_name, [(i, i - 1) for i in range(1, d_dev)]
    )
    cur = jax.lax.dynamic_slice(flatg, (ov_start, 0), (p2, cols))
    upd = jnp.where(kdev < d_dev - 1, nf, cur)
    flatg = jax.lax.dynamic_update_slice(flatg, upd, (ov_start, 0))
    return flatg.reshape(grid_mm.shape)


def _migrate_x(rows_all, sorted_ids, lo_key, hi_key, live_key, npad: int,
               capx: int, axis_name, d_dev: int, diag: StepDiag,
               sort_rows, pchan: int, pm: int):
    """Fixed-capacity particle migration between x-slab owners.

    Keys sort x-slowest, so after the sort the left-bound movers (key <
    lo_key) are a contiguous PREFIX and the right-bound movers (key in
    [hi_key, live_key)) end exactly at the live/overflow boundary.  Edge
    devices pass thresholds that make them own everything beyond their
    slab, so they have no movers on that side by construction.  Movers
    ship through capx-wide ppermute buffers, land on the (dead) tail pads
    and fold in with a second sort — its permutation is near-identity +
    tail inserts, exactly what the banded permute is cheap at.  Movers
    beyond capx stay parked outside the owned slab (masked, not
    corrupting) and are counted in diag.migration_dropped.
    """
    lane = jnp.arange(npad, dtype=jnp.int32)
    nl = jnp.searchsorted(sorted_ids, lo_key)
    nr0 = jnp.searchsorted(sorted_ids, hi_key)
    nov = jnp.searchsorted(sorted_ids, live_key)
    li = jnp.arange(capx, dtype=jnp.int32)

    def win(start, count):
        st = jnp.clip(start, 0, npad - capx)
        buf = jax.lax.dynamic_slice(rows_all, (0, st), (pchan, capx))
        # Zero EVERY channel past the mover count, not just mass: the
        # non-mover lanes are copies of live particles on the sender,
        # and any stray job ever covering them must see all-zero rows.
        return buf * (li < count)[None, :].astype(jnp.float32)

    cl = jnp.minimum(nl, capx)
    cr = jnp.minimum(nov - nr0, capx)
    diag = diag.replace(
        migration_dropped=diag.migration_dropped + (nl - cl) + (nov - nr0 - cr)
    )
    left_buf = win(jnp.int32(0), cl)
    right_buf = win(nr0, cr)
    recv_from_right = jax.lax.ppermute(
        left_buf, axis_name, [(i, i - 1) for i in range(1, d_dev)]
    )
    recv_from_left = jax.lax.ppermute(
        right_buf, axis_name, [(i, i + 1) for i in range(d_dev - 1)]
    )
    # retire the outgoing lanes locally
    out_mask = (lane < cl) | ((lane >= nr0) & (lane < nr0 + cr))
    rows_all = rows_all.at[pm].set(
        jnp.where(out_mask, 0.0, rows_all[pm])
    )
    rows_all = jax.lax.dynamic_update_slice(
        rows_all, recv_from_left, (0, npad - 2 * capx)
    )
    rows_all = jax.lax.dynamic_update_slice(
        rows_all, recv_from_right, (0, npad - capx)
    )
    rows_all, sorted_ids = sort_rows(rows_all)
    return rows_all, sorted_ids, diag


def _grid_velocity(grid_mm, params, grid, d: int):
    """Momentum -> velocity + gravity + 1-cell/step clamp, elementwise on
    block rows (grid_update.wgsl:44-65; ghost slot stays zero).  The
    default path (shared by blocked and pallas fold_vel=False);
    WGSPARKL_FOLD_VEL=1 folds it into the G2P kernel instead."""
    mass_b = grid_mm[..., d:]
    inv_mass = jnp.where(mass_b > 0.0, 1.0 / jnp.maximum(mass_b, 1e-30), 0.0)
    vel_b = (grid_mm[..., :d] + mass_b * params.gravity * params.dt) * inv_mass
    vel_limit = grid.cell_width / params.dt
    return jnp.clip(vel_b, -vel_limit, vel_limit)


def _env_fold_vel() -> bool:
    """MpmData constructor default for MpmConfig.fold_vel (A/B knob:
    WGSPARKL_FOLD_VEL=1 folds momentum -> velocity into the G2P kernel
    instead of the dense elementwise grid update; default off — see
    MpmConfig.fold_vel)."""
    import os as _os

    return _os.environ.get("WGSPARKL_FOLD_VEL", "0") != "0"


def _auto_chan_free(grid, by, desc, bodies, pos, gravity, dim) -> bool:
    """Host-side construction-time choice of the pallas CDF mode.

    chan-free (in-kernel analytic node CDF) wins when few JOBS ever sit
    within 1.5-cell CDF reach of an analytic collider; the gathered path
    wins when most do (round-4 measurement on the 1M ground-plane
    flagship: chan-free 54.5 ms/substep vs gathered 32.5 — the kernel
    re-evaluates every collider at every window node of every in-reach
    job, work the gathered path pays once per substep and frame-hoists
    for static colliders).  Jobs follow matter and matter settles along
    gravity, so the static predictor is twofold:

      (a) the fraction of ALL grid blocks within conservative reach
          (_moving_reach_gate geometry) must be small, and
      (b) no collider may CATCH settling matter: its reach region must
          not intersect the gravity-downstream column of the initial
          particle AABB (matter piles onto the first surface it lands
          on, putting most jobs permanently within reach).

    desc = ((slot, shape_type), ...) for the analytic colliders; bodies =
    built rigid world at initial poses; pos = [N, dim] initial particle
    positions (numpy).  Evaluated once on host; ~10k blocks at 1M."""
    if not desc:
        return False
    from wgsparkl_tpu.ops import blocked as bk
    from wgsparkl_tpu.ops import pallas_transfer as ptf

    nb = bk.num_blocks(grid, by)
    bsh = bk.block_shape(dim, by)
    wsh = ptf.window_geom(by)[0] if dim == 3 else (10, 10)
    coords = np.stack(
        np.meshgrid(*(np.arange(n, dtype=np.int32) for n in nb),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, dim)
    bcells = jnp.asarray(
        coords * np.asarray(bsh, np.int32)
        + np.asarray(grid.origin_cell, np.int32)
    )
    hit = np.asarray(_moving_reach_gate(bcells, bodies, desc, wsh,
                                        grid.cell_width))
    frac = float(hit.mean())
    if frac >= 0.15:
        return False
    g = np.asarray(gravity, np.float64)
    if np.linalg.norm(g) > 1e-12:
        ax = int(np.argmax(np.abs(g)))
        pos = np.asarray(pos)
        lo, hi = pos.min(0), pos.max(0)
        ctr = (coords + 0.5) * np.asarray(bsh, np.float64)
        ctr = (ctr + np.asarray(grid.origin_cell)) * grid.cell_width
        margin = 0.5 * grid.cell_width * max(bsh) + 2 * grid.cell_width
        lateral = np.ones(len(ctr), bool)
        for a in range(dim):
            if a == ax:
                continue
            lateral &= (ctr[:, a] >= lo[a] - margin) & (
                ctr[:, a] <= hi[a] + margin)
        downstream = (
            ctr[:, ax] <= hi[ax] + margin
            if g[ax] < 0 else ctr[:, ax] >= lo[ax] - margin
        )
        if bool((hit & lateral & downstream).any()):
            return False
    return True


def _env_chan_free(grid, by, desc, bodies, pos, gravity, dim) -> bool:
    """MpmData constructor default for MpmConfig.chan_free:
    WGSPARKL_CHAN_FREE=1/0 forces, unset -> _auto_chan_free."""
    import os as _os

    v = _os.environ.get("WGSPARKL_CHAN_FREE", "")
    if v in ("0", "1"):
        return v == "1"
    return _auto_chan_free(grid, by, desc, bodies, pos, gravity, dim)


def _cdf_mode(cfg):
    """(chan_free, static_desc, moving) for the 3D pallas cores.

    chan_free: every analytic collider's node CDF is evaluated IN-KERNEL
    at the window nodes ([WPAD, 1] channels, ptf._moving_node_cdf — same
    op sequence as the dense cdf_channel path, bit-exact) so the
    per-substep dense node-CDF eval / merge / channel pack AND the per-job
    node-channel gather disappear entirely.  Mesh colliders need gathered
    grid channels, so they keep the dense path (chan_free=False).

    OFF BY DEFAULT (measured, round 4): on the 1M sand flagship the
    in-kernel eval costs 54.5 ms/substep vs 32.5 gathered — any scene
    with a ground plane has most settled-particle jobs legitimately
    within 1.5-cell CDF reach, so the kernel re-evaluates every analytic
    collider at the window nodes of most jobs EVERY substep, work the
    gathered path does once per substep (and frame-hoists for static
    colliders).  cfg.chan_free is RESOLVED at MpmData construction — the
    _auto_chan_free reach heuristic by default, WGSPARKL_CHAN_FREE=1/0
    forcing either mode (it can win for scenes whose colliders touch a
    small fraction of blocks and never catch settling matter)."""
    nc = cfg.num_colliders
    if nc == 0 or cfg.mesh_cids or not cfg.chan_free:
        return False, (), ()
    ss = frozenset(cfg.static_slots)
    return (
        True,
        tuple((i, cfg.collider_types[i]) for i in range(nc) if i in ss),
        tuple((i, cfg.collider_types[i]) for i in range(nc) if i not in ss),
    )


def _cdf_kernel_phase_3d(pdata, chan_grid, gather_tiles, btable, jobs,
                         bcells, grid, group: int, npad: int, nc: int,
                         by: int = 4, static_slots=None, bodies=None,
                         mode=(False, (), ()), moving_gate=None):
    """Node-CDF window channels + per-job CPIC gate + the fused
    particle-CDF + P2G kernel (shares the particle DMA and consumes the
    fresh affinity/normals in-kernel); patches the affinity + normal
    channel rows for G2P.

    mode = (chan_free, static_desc, moving) from _cdf_mode.  chan_free:
    no gather at all — the gate comes from conservative per-job reach
    tests (_moving_reach_gate; false positives only promote the gate
    level, the in-kernel CDF merge is exact) and ntiles is a resident
    dummy.  Otherwise: gather the (mesh-merged) channel grid and gate from
    the actual window channels."""
    from wgsparkl_tpu.ops import pallas_cdf
    from wgsparkl_tpu.ops import pallas_transfer as ptf

    chan_free, static_desc, moving = mode
    wsh, wvol, wpad = ptf.window_geom(by)
    if chan_free:
        ntiles = jnp.zeros((1, wpad, 4), jnp.float32)
        hit_m = (
            _moving_reach_gate(bcells, bodies, moving, wsh, grid.cell_width)
            if moving else False
        )
        hit_s = (
            _moving_reach_gate(bcells, bodies, static_desc, wsh,
                               grid.cell_width)
            if static_desc else False
        )
        jbody = jnp.full((bcells.shape[0],), 0, jnp.int32)
        if static_desc:
            jbody = jnp.where(hit_s, 1, jbody)
        if moving:
            jbody = jnp.where(hit_m, 2, jbody)
    else:
        ntiles = gather_tiles(chan_grid, out=(wpad, 4), c=4)
        jbody = _jbody_gate(ntiles, wvol, static_slots)
        if moving_gate is not None:
            # Gathered hybrid: the channel grid holds only the frame-static
            # colliders — jobs possibly in a moving collider's reach force
            # gate level 2 so the kernels run the in-kernel merge.
            jbody = jnp.maximum(
                jbody, jnp.where(moving_gate, 2, 0).astype(jnp.int32)
            )
    mm_out, imp_out, krows = pallas_cdf.p2g_cdf_tiles(
        pdata, ntiles, btable, jobs, bcells, grid, group, npad, nc, jbody,
        by=by, moving=moving, static_desc=static_desc, chan_free=chan_free,
    )
    # Patch rows AFF..AFF_SPARE (= lo, n0, n1, n2, hi — contiguous) with
    # the fresh particle CDF for G2P.
    pdata = jax.lax.dynamic_update_slice(
        pdata,
        jnp.concatenate(
            [krows[0:1, :npad], krows[2:5, :npad], krows[5:6, :npad]], axis=0
        ),
        (ptf.AFF, 0),
    )
    return ntiles, jbody, mm_out, imp_out, krows, pdata


def _substep_pallas_rows(rows_all, bodies, meshes, params, cfg: MpmConfig,
                         n: int, axis_name: Optional[str] = None,
                         diag: Optional[StepDiag] = None, static_cdf=None,
                         static_chan=None, mtable=None):
    """3D channel-major substep core: ([PCHAN, NPAD] rows, bodies) -> same.

    Same physics as substep/substep_blocked; the P2G/G2P/pCDF passes run as
    MXU matmul kernels (ops/pallas_transfer.py), everything else is
    elementwise on [NPAD] channels or slab-indexed — no per-element gathers
    and no [N, 3]/[N, 3, 3] intermediates anywhere.

    ONE core serves both grid domains (the sort / migration / job /
    CDF-kernel / grid-round-trip / update skeleton is identical; only the
    tile ADDRESSING differs):

      * bounded (cfg.sparse=False): blocks of a static grid box, flat
        storage ids, neighbor offsets at static strides, banded tile moves
        (gather/scatter_tiles_auto); anisotropic 4 x by x 4 blocks.
      * sparse (cfg.sparse=True): the reference's GPU-hashmap grid
        (grid.wgsl:98-164) rebuilt the TPU way — no hashmap: the sorted
        particle keys already ARE the occupied block set, recovered by
        boundary compaction; the active table (occupied U +1 neighbors,
        sorted packed keys) replaces block ids with SLOTS, and all tile
        moves address slots through explicit per-octant target arrays
        (gather/scatter_tiles_slots).  Grid rows = [amax + 1, 4, 4, 4, C]
        (ghost = amax); node CDF is computed only on active-block nodes
        (work scales with occupancy, not volume).  Capacity overflow
        (kmax / amax) degrades like job overflow — masked out of
        transfers — and is reported by diagnostics, never silent-corrupt.

    Lanes >= n are padding: they carry F = I / mass 0, sort to the very
    tail (key live_key + 1, after the real out-of-grid/out-of-capacity
    overflow bucket at live_key), and are masked out of every transfer.
    """
    from wgsparkl_tpu.ops import blocked as bk
    from wgsparkl_tpu.ops import pallas_transfer as ptf
    from wgsparkl_tpu.ops.kernel import inv_d as inv_d_fn

    sparse = cfg.sparse
    nc = cfg.num_colliders
    grid = cfg.grid
    d = 3
    by = cfg.by                       # 4 when sparse (MpmData validates)
    bsh = bk.block_shape(d, by)
    _, _, wpad = ptf.window_geom(by)
    group = cfg.group
    npad = rows_all.shape[1]
    if diag is None:
        diag = StepDiag.zeros()
    if sparse:
        kmax, amax = cfg.kmax, cfg.amax
        live_key = bk.SPARSE_SENTINEL     # first non-live key value
    else:
        nb = bk.num_blocks(grid, by)
        live_key = nb_total = int(np.prod(nb))

    bodies = body_mod.update_world_mass_properties(bodies)
    spatial = cfg.spatial_devices if axis_name is not None else 0

    # --- sort phase (gravity-fastest keys: bounded flat block ids or
    # packed unbounded sparse keys) ---
    lane = jnp.arange(npad, dtype=jnp.int32)

    def keys_of(rows):
        pch = [rows[0], rows[1], rows[2]]
        k = (bk.particle_sparse_keys_ch(pch, grid) if sparse
             else bk.particle_sort_keys_ch(pch, grid, by))
        if spatial:
            # migrated-out / padding lanes carry mass 0 -> sort-to-tail key.
            return jnp.where(rows[ptf.PM] > 0.0, k, live_key + 1)
        return jnp.where(lane < n, k, live_key + 1)

    def sort_rows(rows):
        return _lazy_sort(
            rows, keys_of(rows), npad,
            lazy=cfg.lazy_sort, perm_rows=_perm_prefix(ptf),
        )

    rows_all, sorted_ids = sort_rows(rows_all)

    if spatial:
        # --- particle migration between x-slab owners (see _migrate_x).
        # Keys sort x-slowest either way; sparse slabs split the NOMINAL
        # grid's x-block extent (edge devices own everything beyond — the
        # domain itself stays unbounded).
        d_dev = spatial
        kdev = jax.lax.axis_index(axis_name)
        if sparse:
            wxb = bk.num_blocks(grid)[0] // d_dev
            dd2 = bk.SPARSE_DIM * bk.SPARSE_DIM
            lo_key = jnp.where(
                kdev > 0, (bk.SPARSE_HALF + kdev * wxb) * dd2, 0
            )
            hi_key = jnp.where(
                kdev < d_dev - 1,
                (bk.SPARSE_HALF + (kdev + 1) * wxb) * dd2, live_key,
            )
        else:
            wx = nb[0] // d_dev
            xstride = nb[1] * nb[2]
            lo_key = kdev * wx * xstride
            hi_key = (kdev + 1) * wx * xstride
        rows_all, sorted_ids, diag = _migrate_x(
            rows_all, sorted_ids, lo_key, hi_key, live_key, npad,
            cfg.migration_cap, axis_name, d_dev, diag, sort_rows,
            ptf.PCHAN, ptf.PM,
        )

    # --- job tables + tile addressing ---
    if sparse:
        jobs, okeys, n_occ = bk.build_jobs_sparse(
            sorted_ids, group, cfg.max_jobs, kmax
        )
        act, n_active, act_over = bk.sparse_active_table(okeys, d, amax)
        # Surface every masked capacity overflow (kmax-truncated blocks
        # freeze their particles; amax truncation drops halo nodes; job
        # overflow masks the tail ranks) — zero when healthy.
        diag = diag.replace(
            job_overflow=jnp.maximum(
                diag.job_overflow, jobs["needed"] - cfg.max_jobs
            ),
            sparse_occ_overflow=jnp.maximum(
                diag.sparse_occ_overflow, n_occ - kmax
            ),
            sparse_act_overflow=jnp.maximum(
                diag.sparse_act_overflow, n_active - amax
            ),
        )
        deltas = bk.sparse_octant_deltas(d)
        tgts = jnp.stack(
            [bk.sparse_slots(act, jobs["key"] + dl, amax) for dl in deltas]
        )                                                       # [8, MAXJ]
        covered_end, starts = _mask_jobs(jobs, npad, group)
        jobs = {"start": starts, "len": jobs["len"], "key": jobs["key"]}
        bcells = (
            bk.sparse_key_coords(jobs["key"], d) * bsh[0]
            + jnp.asarray(grid.origin_cell, jnp.int32)
        )
        band_lo, bands_ok = bk.band_info_slots_chunks(
            tgts, amax, cfg.band, cfg.band_chunk
        )
        diag = diag.replace(
            band_miss=diag.band_miss + jnp.sum(1 - bands_ok.astype(jnp.int32))
        )

        def gather_tiles(grid_arr, out=None, c=None):
            return bk.gather_tiles_slots(
                grid_arr, tgts, band_lo, bands_ok, d, cfg.band,
                cfg.band_chunk, out=out, c=c,
            )

        def scatter_mm(grid_arr, tiles):
            return bk.scatter_tiles_slots(
                grid_arr, tiles, tgts, band_lo, bands_ok, d, cfg.band,
                cfg.band_chunk, win=True,
            )

        grid_rows = amax
    else:
        jobs, bcells, covered_end, gather_tiles, scatter_mm, _, diag = (
            _bounded_job_phase(sorted_ids, grid, d, by, group, cfg, npad,
                               diag)
        )
        grid_rows = nb_total

    # Particle channels = rows 0..NCHAN-1 of the sorted state (prev affinity
    # rides along for the pcdf kernel's temporal sign persistence).
    pdata = rows_all[: ptf.NCHAN]

    # --- CDF phase ---
    mode = _cdf_mode(cfg)
    moving_gate = None
    if nc > 0:
        if mode[0]:
            chan_grid = None   # chan-free: all-analytic in-kernel CDF
        elif sparse:
            chan_grid = _sparse_chan_grid(
                bodies, meshes, cfg, act, amax, bsh[0]
            )
        elif static_chan is not None:
            # Gathered hybrid (the 34.2-steps/s default, round-5
            # bisection): the static colliders' channel grid was packed
            # ONCE per frame by step_pallas; moving colliders are merged
            # IN-KERNEL at the window nodes (kernel lvl2,
            # ptf._merge_ntile_cdf — bit-exact vs the dense merge), gated
            # by a conservative per-job reach test.  No per-substep dense
            # node-CDF eval / merge / channel pack at all.
            chan_grid = static_chan
            hyb_moving = tuple(
                (i, cfg.collider_types[i])
                for i in range(nc) if i not in cfg.static_slots
            )
            mode = (False,
                    tuple((i, cfg.collider_types[i])
                          for i in range(nc) if i in cfg.static_slots),
                    hyb_moving)
            if hyb_moving:
                moving_gate = _moving_reach_gate(
                    bcells, bodies, hyb_moving, ptf.window_geom(by)[0],
                    grid.cell_width,
                )
        else:
            state_view = SimState(particles=None, models=None,
                                  bodies=bodies, meshes=meshes)
            node_dist, node_aff, node_closest = _node_cdf_full(
                state_view, bodies, cfg, block_major=True,
                static_part=static_cdf
            )
            # Node-side channels for the kernels, gathered per job window
            # with one-hot matmuls.  Integers ride as exact <=16-bit f32
            # channels: [aff_lo, aff_hi, closest, dist].  Node body
            # velocities are NOT carried: the kernels rebuild them from the
            # body table (btable) per gated job — three dense [M]-node
            # channels and their per-body select loop would cost more than
            # all gated jobs combined.
            chan_grid = _cdf_chan_grid(node_dist, node_aff, node_closest,
                                       nb_total, d, by)
        btable = _body_table(bodies, params, grid)
        ntiles, jbody, mm_out, imp_out, pcdf_rows, pdata = (
            _cdf_kernel_phase_3d(
                pdata, chan_grid, gather_tiles, btable, jobs, bcells, grid,
                group, npad, nc, by=by, static_slots=cfg.static_slots,
                bodies=bodies, mode=mode, moving_gate=moving_gate,
            )
        )
    else:
        ntiles = jnp.zeros((1, wpad, 4), jnp.float32)
        jbody = None
        pcdf_rows = jnp.zeros((8, npad), jnp.float32)
        btable = _body_table(bodies, params, grid)
        mm_out, imp_out = ptf.p2g_tiles(
            pdata, ntiles, btable, jobs, bcells, grid, group, nc, jbody,
            by=by,
        )
    grid_mm = jnp.zeros((grid_rows + 1,) + bsh + (d + 1,), jnp.float32)
    grid_mm = scatter_mm(grid_mm, mm_out)

    # CPIC impulses: per-job, per-collider totals already reduced in-kernel.
    lin_imp, ang_imp = _split_impulses(imp_out, bodies.count, d)

    if axis_name is not None:
        if spatial and sparse:
            grid_mm, diag = _halo_exchange_sparse(
                grid_mm, act, amax, lo_key, hi_key, cfg.halo_cap, kdev,
                d_dev, axis_name, diag,
            )
        elif spatial:
            grid_mm = _halo_exchange_x(
                grid_mm, nb_total, nb[1] * nb[2], kdev, wx, d_dev, axis_name
            )
        else:
            grid_mm = jax.lax.psum(grid_mm, axis_name)
        lin_imp = jax.lax.psum(lin_imp, axis_name)
        ang_imp = jax.lax.psum(ang_imp, axis_name)

    # --- grid update + G2P (momentum -> velocity folds INTO the kernel:
    # work scales with gathered windows, not grid volume; the fold
    # re-divides nodes shared by overlapping windows, so WGSPARKL_FOLD_VEL=0
    # A/Bs the dense elementwise pass instead) ---
    fold = cfg.fold_vel
    if not fold:
        grid_mm = grid_mm.at[..., :d].set(
            _grid_velocity(grid_mm, params, grid, d)
        )
    f_tiles = gather_tiles(grid_mm, out=(wpad, 4))
    krows = ptf.g2p_rows(
        pdata, f_tiles, ntiles, btable, jobs, bcells, grid, group, npad, nc,
        jbody, by=by, moving=mode[2], static_desc=mode[1], chan_free=mode[0],
        fold_vel=fold,
    )

    # --- fused particle update + row rebuild: ONE Pallas pass (see
    # ops/update_rows.py) ---
    from wgsparkl_tpu.ops.update_rows import update_rows as _upd

    rows_out = _upd(
        rows_all, krows, pcdf_rows, sorted_ids, covered_end, btable,
        mtable, params, cfg, nc, inv_d_fn(grid.cell_width),
        live_below=live_key,
    )

    bodies = rigid_bodies_update(bodies, lin_imp, ang_imp, params, cfg)
    return rows_out, bodies, diag


def _sparse_chan_grid(bodies, meshes, cfg: MpmConfig, act, amax: int,
                      bs: int):
    """Node CDF channel grid on the ACTIVE-slot table (sparse domain,
    mesh-collider / gathered-channel fallback — chan-free mode needs none):
    analytic CDF evaluated at active-block node positions, merged with the
    rigid-particle mesh pass on the same slot table
    (ops/rigid_cdf.py:mesh_node_cdf_sparse; p2g_cdf.wgsl role)."""
    from wgsparkl_tpu.collision import cdf_channel
    from wgsparkl_tpu.ops import blocked as bk
    from wgsparkl_tpu.ops import rigid_cdf

    grid = cfg.grid
    d = 3
    acoords = bk.sparse_key_coords(act, d)                  # [amax, 3]
    cell_off = jnp.stack(
        jnp.meshgrid(*([jnp.arange(bs)] * d), indexing="ij"), -1
    ).reshape(-1, d)                                        # [64, 3]
    cells = (
        acoords[:, None, :] * bs
        + jnp.asarray(grid.origin_cell, jnp.int32)
        + cell_off[None, :, :]
    )                                                        # [amax,64,3]
    npos = cells.astype(jnp.float32) * grid.cell_width
    npx = npos[..., 0].reshape(-1)
    npy = npos[..., 1].reshape(-1)
    npz = npos[..., 2].reshape(-1)
    node_dist, node_aff, node_closest = cdf_channel.node_cdf_channels(
        cfg.collider_types, bodies.shape_params, bodies.rot,
        bodies.pos, (npx, npy, npz), grid.cell_width,
    )
    if cfg.mesh_cids:
        key_b, asg_b = rigid_cdf.mesh_node_cdf_sparse(
            meshes, bodies, grid, cfg.mesh_cids, cfg.sample_group,
            cfg.sample_max_jobs, cfg.sample_chunk, act, amax,
        )
        node_dist, node_aff, node_closest = (
            rigid_cdf.merge_mesh_into_node_cdf(
                node_dist, node_aff, node_closest,
                key_b[:-1].reshape(-1),
                asg_b[:-1].reshape(-1, asg_b.shape[-1]),
                cfg.mesh_cids,
            )
        )
    return _cdf_chan_grid(node_dist, node_aff, node_closest, amax, d)


def _halo_exchange_sparse(grid_mm, act, amax: int, lo_key, hi_key, halo_cap,
                          kdev, d_dev: int, axis_name, diag: StepDiag):
    """Sparse halo exchange (collective volume ~ one boundary plane of
    ACTIVE blocks, not the table).  Stencil windows reach +1 block in x
    only, so each device's contributions land in its own slab plus
    overhang keys with x == its hi boundary.  (1) ship the overhang
    (key, row) pairs right and add them into the owner's matching active
    slots; keys the owner has no slot for belong to nodes only the
    sender's particles touch — the sender's local copy is already
    complete, so routing them to the ghost there is exact.  (2) ship the
    owner's reduced first-plane (key, row) pairs back left and overwrite
    the sender's overhang slots for G2P reads.  Capacity halo_cap per
    plane, overflow counted."""
    from wgsparkl_tpu.ops import blocked as bk

    sent = bk.SPARSE_SENTINEL
    dd2 = bk.SPARSE_DIM * bk.SPARSE_DIM
    H = min(halo_cap, amax)      # a plane can't exceed the active table
    shape = grid_mm.shape
    flatg = grid_mm.reshape(amax + 1, -1)
    cols = flatg.shape[1]
    li = jnp.arange(H, dtype=jnp.int32)
    right = [(i, i + 1) for i in range(d_dev - 1)]
    left = [(i, i - 1) for i in range(1, d_dev)]

    def plane(first, last):
        """(keys [H], rows [H, cols], dropped) of act[first:last)."""
        s = jnp.clip(first, 0, amax - H)
        ok = (li >= first - s) & (li < last - s)
        keys = jnp.where(
            ok, jax.lax.dynamic_slice(act, (s,), (H,)), sent
        )
        rows = (
            jax.lax.dynamic_slice(flatg, (s, 0), (H, cols))
            * ok[:, None].astype(jnp.float32)
        )
        return keys, rows, jnp.maximum(last - first - H, 0)

    i_over = jnp.searchsorted(act, hi_key).astype(jnp.int32)
    i_sent = jnp.searchsorted(act, sent).astype(jnp.int32)
    hkeys, hrows, drop1 = plane(i_over, i_sent)
    rk = jax.lax.ppermute(hkeys, axis_name, right)
    rr = jax.lax.ppermute(hrows, axis_name, right)
    slots = bk.sparse_slots(act, rk, amax)
    # Zero the payload whenever the key routes to the ghost slot:
    # inactive-block window gathers READ the ghost row, so it must
    # stay zero.
    flatg = flatg.at[slots].add(
        jnp.where((slots < amax)[:, None], rr, 0.0)
    )

    i0 = jnp.searchsorted(act, lo_key).astype(jnp.int32)
    i1 = jnp.searchsorted(
        act, jnp.minimum(lo_key + dd2, sent)
    ).astype(jnp.int32)
    bkeys, brows, drop2 = plane(i0, i1)
    bkr = jax.lax.ppermute(bkeys, axis_name, left)
    brr = jax.lax.ppermute(brows, axis_name, left)
    slots2 = bk.sparse_slots(act, bkr, amax)
    # Unconditional row writes: invalid/absent keys route to the
    # ghost slot with a zero payload (the ghost must stay zero).
    flatg = flatg.at[slots2].set(
        jnp.where((slots2 < amax)[:, None], brr, 0.0)
    )
    diag = diag.replace(halo_dropped=diag.halo_dropped + drop1 + drop2)
    return flatg.reshape(shape), diag


def _substep_pallas_rows_2d(rows_all, bodies, meshes, params, cfg: MpmConfig,
                            n: int, axis_name: Optional[str] = None,
                            diag: Optional[StepDiag] = None, static_cdf=None,
                            static_chan=None, mtable=None):
    """2D channel-major substep core (see _substep_pallas_rows; 2D kernel
    family in ops/pallas_transfer2d.py: 8x8 blocks, 10^2 windows)."""
    from wgsparkl_tpu.ops import blocked as bk
    from wgsparkl_tpu.ops import pallas_transfer2d as ptf
    from wgsparkl_tpu.ops.kernel import inv_d as inv_d_fn

    assert cfg.by == 4, "anisotropic blocks are 3D-bounded-path only"
    nc = cfg.num_colliders
    grid = cfg.grid
    d = 2
    nb = bk.num_blocks(grid)
    nb_total = int(np.prod(nb))
    bs = bk.block_size(d)
    group = cfg.group
    npad = rows_all.shape[1]
    if diag is None:
        diag = StepDiag.zeros()

    bodies = body_mod.update_world_mass_properties(bodies)
    spatial = cfg.spatial_devices if axis_name is not None else 0

    # --- sort phase ---
    lane = jnp.arange(npad, dtype=jnp.int32)

    def keys_of(rows):
        k = bk.particle_sort_keys_ch([rows[0], rows[1]], grid)
        if spatial:
            # migrated-out / padding lanes carry mass 0 -> sort-to-tail key.
            return jnp.where(rows[ptf.PM] > 0.0, k, nb_total + 1)
        return jnp.where(lane < n, k, nb_total + 1)

    def sort_rows(rows):
        return _lazy_sort(
            rows, keys_of(rows), npad,
            lazy=cfg.lazy_sort, perm_rows=_perm_prefix(ptf),
        )

    rows_all, sorted_ids = sort_rows(rows_all)

    if spatial:
        # --- particle migration (x-slab decomposition; see _migrate_x).
        # 2D sort keys are x-slowest (x * nb_y + y) like 3D.
        d_dev = spatial
        kdev = jax.lax.axis_index(axis_name)
        wx = nb[0] // d_dev
        rows_all, sorted_ids, diag = _migrate_x(
            rows_all, sorted_ids, kdev * wx * nb[1],
            (kdev + 1) * wx * nb[1], nb_total, npad, cfg.migration_cap,
            axis_name, d_dev, diag, sort_rows, ptf.PCHAN, ptf.PM,
        )

    jobs, bcells, covered_end, gather_tiles, scatter_mm, _, diag = (
        _bounded_job_phase(sorted_ids, grid, d, 4, group, cfg, npad, diag)
    )

    pdata = rows_all[: ptf.NCHAN]
    wvol = ptf.WVOL

    # --- CDF phase (chan-free: all-analytic in-kernel window CDF, no
    # per-substep dense eval / pack / gather — see 3D _cdf_mode) ---
    mode = _cdf_mode(cfg)
    alldesc = tuple(sorted(mode[1] + mode[2]))
    # 2D body table: rows 0-1 world COM, 2-3 linvel, 4 angvel (scalar),
    # 5-6 rotation (cos, sin), 7-8 translation, 9-11 shape params,
    # 13 = [g0 dt, g1 dt, vel clamp] for the in-kernel grid update.
    btable = jnp.zeros((16, 128), jnp.float32)
    btable = btable.at[0:2, : bodies.count].set(bodies.world_com.T)
    btable = btable.at[2:4, : bodies.count].set(bodies.linvel.T)
    btable = btable.at[4:5, : bodies.count].set(bodies.angvel.T)
    btable = btable.at[5:7, : bodies.count].set(bodies.rot.T)
    btable = btable.at[7:9, : bodies.count].set(bodies.pos.T)
    btable = btable.at[9:12, : bodies.count].set(
        bodies.shape_params[:, :3].T
    )
    btable = btable.at[13, :2].set(params.gravity * params.dt)
    btable = btable.at[13, 2].set(grid.cell_width / params.dt)
    if nc > 0:
        if mode[0]:
            wsh2 = (10, 10)
            hit = _moving_reach_gate(bcells, bodies, alldesc, wsh2,
                                     grid.cell_width)
            jbody = hit.astype(jnp.int32)
            ntiles = jnp.zeros((1, ptf.WPAD, 4), jnp.float32)
        elif static_chan is not None:
            # All colliders frame-static: the channel grid was packed once
            # per frame by step_pallas — zero per-substep dense CDF work.
            ntiles = gather_tiles(static_chan, out=(ptf.WPAD, 4), c=4)
            jbody = _jbody_gate(ntiles, wvol)
        else:
            state_view = SimState(particles=None, models=None, bodies=bodies,
                                  meshes=meshes)
            node_dist, node_aff, node_closest = _node_cdf_full(
                state_view, bodies, cfg, block_major=True,
                static_part=static_cdf
            )
            chan_grid = _cdf_chan_grid(node_dist, node_aff, node_closest,
                                       nb_total, d)
            ntiles = gather_tiles(chan_grid, out=(ptf.WPAD, 4), c=4)
            jbody = _jbody_gate(ntiles, wvol)

        pcdf_out = ptf.pcdf_rows(
            pdata, ntiles, btable, jobs, bcells, grid, group, npad, nc,
            jbody, alldesc=alldesc, chan_free=mode[0],
        )
        # Patch rows AFF..AFF_SPARE (= lo, n0, n1, hi — contiguous) with
        # the fresh particle CDF for P2G/G2P.
        pdata = jax.lax.dynamic_update_slice(
            pdata,
            jnp.concatenate(
                [pcdf_out[0:1, :npad], pcdf_out[2:4, :npad],
                 pcdf_out[4:5, :npad]], axis=0
            ),
            (ptf.AFF, 0),
        )

        if mode[0]:
            itiles = jnp.zeros((1, ptf.WPAD, 2), jnp.int32)
        else:
            aff_w = (
                ntiles[..., 1].astype(jnp.int32) << 16
            ) | ntiles[..., 0].astype(jnp.int32)
            closest_w = ntiles[..., 2].astype(jnp.int32)
            itiles = jnp.stack([aff_w, closest_w], axis=-1)
    else:
        itiles = jnp.zeros((1, ptf.WPAD, 2), jnp.int32)
        jbody = None
        pcdf_out = jnp.zeros((8, npad), jnp.float32)

    # --- P2G ---
    mm_out, imp_out = ptf.p2g_tiles(
        pdata, itiles, btable, jobs, bcells, grid, group, nc, jbody,
        alldesc=alldesc, chan_free=mode[0],
    )
    grid_mm = jnp.zeros((nb_total + 1,) + (bs,) * d + (d + 1,), jnp.float32)
    grid_mm = scatter_mm(grid_mm, mm_out)

    lin_imp, ang_imp = _split_impulses(imp_out, bodies.count, d)

    if axis_name is not None:
        if spatial:
            grid_mm = _halo_exchange_x(
                grid_mm, nb_total, nb[1], kdev, wx, d_dev, axis_name
            )
        else:
            grid_mm = jax.lax.psum(grid_mm, axis_name)
        lin_imp = jax.lax.psum(lin_imp, axis_name)
        ang_imp = jax.lax.psum(ang_imp, axis_name)

    # --- grid update + G2P (momentum -> velocity folds INTO the kernel;
    # WGSPARKL_FOLD_VEL=0 A/Bs the dense elementwise pass, see 3D core) ---
    fold = cfg.fold_vel
    if not fold:
        grid_mm = grid_mm.at[..., :2].set(
            _grid_velocity(grid_mm, params, grid, 2)
        )
    f_tiles = gather_tiles(grid_mm, out=(ptf.WPAD, 4))
    krows = ptf.g2p_rows(
        pdata, f_tiles, itiles, btable, jobs, bcells, grid, group, npad, nc,
        jbody, alldesc=alldesc, chan_free=mode[0], fold_vel=fold,
    )

    # --- fused particle update + row rebuild: ONE Pallas pass (see
    # ops/update_rows.py; kills the ~15-fusion XLA channel chain + the
    # PCHAN-way strided stack the 3D core already eliminated) ---
    from wgsparkl_tpu.ops.update_rows import update_rows as _upd

    rows_out = _upd(
        rows_all, krows, pcdf_out, sorted_ids, covered_end, btable,
        mtable, params, cfg, nc, inv_d_fn(grid.cell_width),
        live_below=nb_total, dim=2,
    )

    bodies = rigid_bodies_update(bodies, lin_imp, ang_imp, params, cfg)
    return rows_out, bodies, diag


def rigid_bodies_update(bodies, lin_imp, ang_imp, params, cfg):
    """Apply accumulated CPIC impulses, cap velocities, integrate poses,
    apply gravity to dynamic bodies (rigid_impulses.wgsl:94-137), then
    resolve body-body contacts against static/kinematic colliders
    (rapier's role in the reference testbed, step.rs:201-217).

    cfg: MpmConfig (GridConfig also accepted for grid-only callers such as
    utils/timing.py; contacts/coupling are skipped then).
    """
    grid_cfg = cfg.grid if isinstance(cfg, MpmConfig) else cfg
    dt = params.dt

    # Coupling-mode mask (MpmData::with_select_coupling parity,
    # pipeline.rs:130-168): one-way bodies see the sand (CDF/ghost velocity)
    # but receive no impulses from it.
    if isinstance(cfg, MpmConfig) and cfg.coupling:
        mask = jnp.asarray(
            [1.0 if m == COUPLING_TWO_WAY else 0.0 for m in cfg.coupling],
            jnp.float32,
        )[:, None]
        lin_imp = lin_imp * mask
        ang_imp = ang_imp * mask

    new_lin, new_ang = body_mod.apply_impulse(bodies, lin_imp, ang_imp)

    imp_nonzero = (jnp.linalg.norm(lin_imp, axis=-1) != 0.0) | (
        jnp.linalg.norm(ang_imp, axis=-1) != 0.0
    )
    lin_limit = 0.1 * grid_cfg.cell_width / dt
    ang_limit = 1.0
    ln = jnp.linalg.norm(new_lin, axis=-1, keepdims=True)
    an = jnp.linalg.norm(new_ang, axis=-1, keepdims=True)
    new_lin = jnp.where(
        imp_nonzero[:, None] & (ln > lin_limit),
        new_lin * (lin_limit / jnp.maximum(ln, 1e-30)),
        new_lin,
    )
    new_ang = jnp.where(
        imp_nonzero[:, None] & (an > ang_limit),
        new_ang * (ang_limit / jnp.maximum(an, 1e-30)),
        new_ang,
    )

    new_rot, new_pos = body_mod.integrate_velocity(bodies, new_lin, new_ang, dt)

    # Gravity only moves bodies with nonzero inverse mass (per-axis mask).
    mass_mask = (bodies.inv_mass != 0.0).astype(new_lin.dtype)
    new_lin = new_lin + params.gravity[None, :] * mass_mask * dt

    # Body-body contacts (dynamic vs static/kinematic colliders).
    if isinstance(cfg, MpmConfig) and cfg.dynamic_slots:
        from wgsparkl_tpu.rigid import contacts as contacts_mod

        new_lin, new_ang = contacts_mod.resolve_contacts(
            body_mod.update_world_mass_properties(
                bodies.replace(rot=new_rot, pos=new_pos)
            ),
            cfg.collider_types,
            cfg.dynamic_slots,
            new_lin,
            new_ang,
            dt,
            slop=0.05 * grid_cfg.cell_width,
            # Jointed pairs don't collide with each other (the usual engine
            # default — a pendulum's rod may legitimately overlap its pivot).
            skip_pairs=frozenset(
                (int(j[0]), int(j[1])) for j in cfg.joints
            ),
        )

    # Ball joints (rigid/joints.py; rapier's joint role, step.rs:201-217).
    if isinstance(cfg, MpmConfig) and cfg.joints:
        from wgsparkl_tpu.rigid import joints as joints_mod

        new_lin, new_ang = joints_mod.resolve_joints(
            body_mod.update_world_mass_properties(
                bodies.replace(rot=new_rot, pos=new_pos)
            ),
            cfg.joints, new_lin, new_ang, dt,
        )

    return bodies.replace(rot=new_rot, pos=new_pos, linvel=new_lin, angvel=new_ang)


def step(state: SimState, params: SimulationParams, cfg: MpmConfig, num_substeps: int):
    """num_substeps substeps under lax.scan (one device launch per frame).

    The pallas path carries the channel-major row matrix through the scan
    (step_pallas) — pack/unpack happen once per frame, not per substep."""
    if cfg.transfer == "pallas":
        return step_pallas(state, params, cfg, num_substeps)
    fn = {
        "dense": substep,
        "blocked": substep_blocked,
    }[cfg.transfer]

    def body(s, _):
        return fn(s, params, cfg), None

    out, _ = jax.lax.scan(body, state, None, length=num_substeps)
    return out


_step_jit = jax.jit(step, static_argnames=("cfg", "num_substeps"))


# -------------------------------------------------------------- host wrapper
def _normalize_joints(joints, bodies, dim: int):
    """User joint specs -> static MpmConfig.joints tuples
    (b, c, anchor_b, anchor_c, kind, extra).

    Accepted inputs: (b, c, ab, ac) — ball; (b, c, ab, ac, "ball");
    (b, c, ab, ac, "fixed") — the current relative rotation is captured
    as the weld target; (b, c, ab, ac, "revolute", axis) — 3D hinge with
    axis in body b's local frame (in 2D revolute degrades to ball: the
    hinge axis IS the only rotation); (b, c, ab, ac, "prismatic", axis)
    — slider along axis in b's local frame, relative rotation welded to
    its initial value (both dims)."""
    if not joints:
        return ()
    rot0 = None
    out = []

    def _rel0(b, c):
        """Initial relative rotation rot_b^-1 rot_c as a static tuple."""
        if dim == 2:
            (cb, sb), (cc, sc) = rot0[b], rot0[c]
            return (float(cb * cc + sb * sc), float(cb * sc - sb * cc))
        wb, xb, yb, zb = rot0[b]
        w1, x1, y1, z1 = wb, -xb, -yb, -zb
        w2, x2, y2, z2 = rot0[c]
        return (
            float(w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2),
            float(w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2),
            float(w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2),
            float(w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2),
        )

    for j in joints:
        b, c = int(j[0]), int(j[1])
        ab, ac = tuple(map(float, j[2])), tuple(map(float, j[3]))
        kind = j[4] if len(j) > 4 else "ball"
        extra = None
        if kind in ("fixed", "revolute", "prismatic") and rot0 is None:
            rot0 = np.asarray(build_rigid_world(bodies, dim).rot, np.float64)
        if kind == "fixed":
            extra = _rel0(b, c)
        elif kind == "prismatic":
            ax = np.asarray(j[5], np.float64)
            ax = ax / max(np.linalg.norm(ax), 1e-12)
            extra = (tuple(map(float, ax)), _rel0(b, c))
        elif kind == "revolute":
            if dim == 2:
                kind = "ball"
            else:
                from wgsparkl_tpu.math import pose as _pm

                ax = np.asarray(j[5], np.float64)
                ax = ax / max(np.linalg.norm(ax), 1e-12)
                a_world = np.asarray(
                    _pm.quat_rotate(jnp.asarray(rot0[b], jnp.float32),
                                    jnp.asarray(ax, jnp.float32))
                )
                ax_c = np.asarray(
                    _pm.quat_inv_rotate(jnp.asarray(rot0[c], jnp.float32),
                                        jnp.asarray(a_world, jnp.float32))
                )
                extra = (tuple(map(float, ax)), tuple(map(float, ax_c)))
        elif kind != "ball":
            raise ValueError(f"unknown joint kind {kind!r}")
        out.append((b, c, ab, ac, kind, extra))
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class RigidBodyDesc:
    """Host-side body+collider description (rapier builder equivalent).

    rotation: angle (2D) or scaled-axis rotation vector (3D).
    body_type: 'fixed' | 'kinematic' | 'dynamic'.
    """

    collider: Collider
    translation: Tuple[float, ...]
    rotation: object = None
    body_type: str = "fixed"
    density: float = 1000.0
    linvel: Optional[Tuple[float, ...]] = None
    angvel: object = None


def build_rigid_world(descs: Sequence[RigidBodyDesc], dim: int) -> RigidWorld:
    b = max(len(descs), 1)
    w = body_mod.make_rigid_world(dim, b)
    ang_dim = 3 if dim == 3 else 1

    rots, poss, linvels, angvels = [], [], [], []
    inv_masses, inv_inertias, params_arr = [], [], []
    for desc in descs:
        poss.append(np.asarray(desc.translation, np.float32))
        if dim == 3:
            rvec = np.zeros(3, np.float32) if desc.rotation is None else np.asarray(
                desc.rotation, np.float32
            )
            angle = float(np.linalg.norm(rvec))
            axis = rvec / angle if angle > 1e-12 else np.array([1.0, 0, 0], np.float32)
            half = 0.5 * angle
            rots.append(
                np.array(
                    [np.cos(half), *(np.sin(half) * axis)], np.float32
                )
            )
        else:
            a = 0.0 if desc.rotation is None else float(desc.rotation)
            rots.append(np.array([np.cos(a), np.sin(a)], np.float32))
        linvels.append(
            np.zeros(dim, np.float32)
            if desc.linvel is None
            else np.asarray(desc.linvel, np.float32)
        )
        if desc.angvel is None:
            av = np.zeros(ang_dim, np.float32)
        else:
            av = np.atleast_1d(np.asarray(desc.angvel, np.float32))
        angvels.append(av)
        params_arr.append(desc.collider.padded_params())

        if desc.body_type == "dynamic":
            mass, com, inertia = body_mod.shape_mass_properties(
                desc.collider, desc.density, dim
            )
            inv_masses.append(np.full(dim, 1.0 / mass, np.float32))
            inv_inertias.append(np.linalg.inv(inertia).astype(np.float32))
        else:
            inv_masses.append(np.zeros(dim, np.float32))
            inv_inertias.append(np.zeros((ang_dim, ang_dim), np.float32))

    if not descs:
        return w
    return w.replace(
        rot=jnp.asarray(np.stack(rots)),
        pos=jnp.asarray(np.stack(poss)),
        linvel=jnp.asarray(np.stack(linvels)),
        angvel=jnp.asarray(np.stack(angvels)),
        inv_mass=jnp.asarray(np.stack(inv_masses)),
        inv_inertia_local=jnp.asarray(np.stack(inv_inertias)),
        inv_inertia_world=jnp.asarray(np.stack(inv_inertias)),
        shape_params=jnp.asarray(np.stack(params_arr)),
    )


class MpmData:
    """Owns all device state for one scene (MpmData equivalent,
    pipeline.rs:84-168)."""

    def __init__(
        self,
        params: SimulationParams,
        particles: Particles,
        models: Models,
        bodies: Sequence[RigidBodyDesc],
        cell_width: float,
        grid: Optional[GridConfig] = None,
        grid_bounds: Optional[Tuple] = None,
        elastic_model: str = "corotated",
        transfer: str = "dense",
        group: int = 256,
        job_chunk: int = 32,
        max_jobs: int = 0,
        coupling: Optional[Sequence[int]] = None,
        body_contacts: bool = True,
        sparse: bool = False,
        kmax: int = 0,
        amax: int = 0,
        by: int = 4,
        band_arg: int = 0,
        band_chunk: int = 0,
        joints: Sequence = (),
        chan_free: Optional[bool] = None,
        fold_vel: Optional[bool] = None,
    ):
        """coupling: per-body COUPLING_ONE_WAY / COUPLING_TWO_WAY list
        (with_select_coupling parity, pipeline.rs:130-168); default = all
        two-way.  body_contacts: resolve dynamic bodies against
        static/kinematic colliders (rapier's role, step.rs:201-217)."""
        dim = particles.dim
        if grid is None:
            if grid_bounds is not None:
                lo, hi = grid_bounds
            else:
                pos = np.asarray(particles.pos)
                lo, hi = pos.min(0) - 8 * cell_width, pos.max(0) + 8 * cell_width
            grid = GridConfig.from_bounds(lo, hi, cell_width)
        # Feature-composition matrix (see PARITY.md "composition matrix"):
        # every other pairing of {dense, blocked, pallas} x {2D, 3D} x
        # {mesh colliders, spatial sharding, by, sparse} composes.
        if sparse and dim != 2 and by != 4:
            raise ValueError(
                "sparse domain uses isotropic 4^3 blocks (by=4); "
                "anisotropic by is bounded-grid only"
            )
        if sparse and dim == 2:
            raise ValueError(
                "sparse (unbounded) domain is 3D-only; 2D scenes use the "
                "bounded grid (grid_bounds / grid=)"
            )
        if by != 4:
            # Anisotropic 4 x by x 4 blocks (MpmConfig.by): 3D bounded
            # pallas path only; round the y node extent up to whole blocks.
            assert dim == 3 and transfer == "pallas" and not sparse, (
                "by != 4 requires the 3D bounded pallas path"
            )
            if grid.shape[1] % by:
                pad = by - grid.shape[1] % by
                grid = dataclasses.replace(
                    grid, shape=(grid.shape[0], grid.shape[1] + pad,
                                 grid.shape[2]),
                )
        self.params = params
        self.bodies_desc = tuple(bodies)
        collider_types = tuple(b.collider.shape_type for b in bodies)
        if len(collider_types) > 16:
            # 16-bit affinity + 16-bit sign word, like the reference
            # (collide.wgsl:36).  The pallas row state carries the word as
            # two <=16-bit integer-valued f32 halves (AFF / AFF_SPARE;
            # pallas_transfer._paff_u32), so all 16 slots are NaN-safe
            # through the permute/migration matmuls.
            raise ValueError(
                f"at most 16 colliders supported (got {len(collider_types)}),"
                " matching the reference's 16-bit affinity word"
            )
        auto_jobs = max_jobs == 0
        if transfer in ("blocked", "pallas") and auto_jobs:
            # Headroom: 4x the perfectly-packed job count (blocks at ~1/4
            # of the group size on average still fit).
            n = particles.count
            max_jobs = -(-n // group) * 4 + 64
        if max_jobs % job_chunk:
            max_jobs += job_chunk - max_jobs % job_chunk
        # Banded tile moves chunk jobs by band_chunk; keep auto-computed
        # max_jobs divisible so the static banded fast path stays available
        # (explicit odd values fall back to full matmuls).  band_chunk
        # widens the per-scan-iteration job chunk (fewer, bigger banded-move
        # iterations; the slab must cover the wider span).  Measured
        # default = 64, BOTH dims (round-5 batch 9, same-day sweep):
        # 3D bc 32/64/128 = 33.86/34.36/33.88 steps/s at 1M and
        # 54.0/61.2/- on the 128^3 dam break; 2D 65k bc 32/64/128 =
        # 261.7/326.8/303.7 and 490k 51.5/54.5/55.0 (tie).
        bc = band_chunk or 64
        if transfer in ("blocked", "pallas") and auto_jobs and max_jobs % bc:
            max_jobs += bc - max_jobs % bc
            if max_jobs % job_chunk:
                max_jobs += job_chunk - max_jobs % job_chunk

        # Banded tile moves: block-sorted jobs chunked by bc span a narrow
        # range of flat block ids, so the slab band can be far tighter than
        # nb_total — the banded matmul cost is linear in it, and chunks
        # that exceed it take a per-chunk full-grid matmul inside the move
        # scan (band_info_chunks; counted in diag.band_miss), so the band
        # targets the COMMON span, not the worst case.  3D sizing covers
        # the thin-occupancy phase because it is common, not rare: a
        # spreading floor layer occupies ~1 y-block per (x, z), and with
        # y-fastest storage (storage_strides) its flat ids stride nb[1]
        # apart — bc such jobs span ~bc * nb[1] ids, plus one x-plane for
        # the ~half of chunks straddling a plane boundary.  (Round-5
        # history: bc=128 with a dense-only 2-plane formula missed on
        # EVERY dam-break substep and the then-global fallback paid full
        # [jobs, nb_total] matmuls, 15 of 25 ms.)  2D sizing is DENSE-only
        # (a 490k pile's columns hold ~40 y-blocks, so bc jobs span ~1-2
        # x-columns): the thin term would be ~bc * nb[1] ≈ 5600 on a 700^2
        # grid — measured 2.9x slower across the whole run (config 2b
        # 52.8 vs 72.5 steps/s) than letting the transient spread chunks
        # take the per-chunk full path.
        band = 2048
        if band_arg:
            band = band_arg
        elif transfer == "pallas" and not sparse:
            from wgsparkl_tpu.ops import blocked as _bk

            nbx = _bk.num_blocks(grid, by if dim == 3 else 4)
            plane = int(np.prod(nbx[1:]))  # flat ids per x-plane/column
            if dim == 3:
                band = -(-(bc * nbx[1] + plane + 2 * bc) // 8) * 8
            else:
                band = -(-(2 * plane + 3 * bc) // 8) * 8
            band = min(band, -(-int(np.prod(nbx)) // 8) * 8)

        # Rigid-particle mesh colliders (p2g_cdf path).
        from wgsparkl_tpu.collision import shapes as shp

        mesh_types = (shp.SHAPE_POLYLINE, shp.SHAPE_TRIMESH, shp.SHAPE_HEIGHTFIELD)
        mesh_slots = tuple(
            i for i, b in enumerate(bodies) if b.collider.shape_type in mesh_types
        )
        meshes = None
        sample_group, sample_chunk, sample_max_jobs = 128, 32, 0
        if mesh_slots:
            from wgsparkl_tpu.ops.rigid_cdf import MeshColliders
            from wgsparkl_tpu.rigid import sampling

            parts_list, vertex_cids = [], []
            voffset = 0
            for slot in mesh_slots:
                col = bodies[slot].collider
                if dim == 2:
                    s = sampling.sample_polyline(
                        col.vertices, col.indices, cell_width,
                        collider_id=slot, vertex_offset=voffset,
                    )
                else:
                    s = sampling.sample_trimesh(
                        col.vertices, col.indices, cell_width,
                        collider_id=slot, vertex_offset=voffset,
                    )
                parts_list.append(s)
                vertex_cids.append(np.full(len(col.vertices), slot, np.int32))
                voffset += len(col.vertices)
            comb = sampling.combine(parts_list)
            meshes = MeshColliders(
                sample_local=jnp.asarray(comb.points),
                sample_prim=jnp.asarray(comb.primitives),
                sample_cid=jnp.asarray(comb.collider_ids),
                vertices_local=jnp.asarray(comb.vertices),
                vertex_cid=jnp.asarray(np.concatenate(vertex_cids)),
            )
            s_count = comb.count
            sample_max_jobs = -(-s_count // sample_group) * 4 + 64
            if sample_max_jobs % sample_chunk:
                sample_max_jobs += sample_chunk - sample_max_jobs % sample_chunk

        if sparse:
            assert transfer == "pallas", "sparse domain needs transfer='pallas'"
            if kmax == 0:
                kmax = max_jobs
            if amax == 0:
                amax = 4 * kmax
            amax = -(-amax // 8) * 8
        dynamic_slots = tuple(
            i for i, b in enumerate(bodies) if b.body_type == "dynamic"
        )

        def _zero_vel(v):
            return v is None or not np.any(np.asarray(v, np.float32))

        # 'fixed' bodies created without velocity never move: their node CDF
        # is frame-constant and step_pallas hoists it out of the substep
        # scan (see MpmConfig.static_slots).
        static_slots = tuple(
            i for i, b in enumerate(bodies)
            if b.body_type == "fixed" and _zero_vel(b.linvel)
            and _zero_vel(b.angvel) and i not in mesh_slots
        )
        if coupling is None:
            coupling_t = tuple(COUPLING_TWO_WAY for _ in bodies)
        else:
            coupling_t = tuple(int(c) for c in coupling)
            assert len(coupling_t) == len(bodies)

        rigid_world = build_rigid_world(bodies, dim)
        if fold_vel is None:
            fold_vel = _env_fold_vel()
        if chan_free is None:
            # Resolve the pallas CDF mode now (static; part of the jit
            # cache key).  desc = the analytic collider slots at their
            # initial poses; mesh scenes always gather.
            adesc = tuple(
                (i, t) for i, t in enumerate(collider_types)
                if i not in mesh_slots
            )
            chan_free = (
                transfer == "pallas" and not mesh_slots and bool(adesc)
                and _env_chan_free(
                    grid, by, adesc, rigid_world,
                    np.asarray(particles.pos), np.asarray(params.gravity),
                    dim,
                )
            )
        self.config = MpmConfig(
            grid=grid,
            collider_types=collider_types,
            dynamic_slots=dynamic_slots if body_contacts else (),
            coupling=coupling_t,
            elastic_model=elastic_model,
            transfer=transfer,
            group=group,
            job_chunk=job_chunk,
            max_jobs=max_jobs,
            mesh_cids=mesh_slots,
            sample_group=sample_group,
            sample_chunk=sample_chunk,
            sample_max_jobs=sample_max_jobs,
            static_slots=static_slots,
            sparse=sparse,
            kmax=kmax,
            amax=amax,
            by=by,
            band=band,
            band_chunk=bc,
            joints=_normalize_joints(joints, bodies, dim),
            chan_free=chan_free,
            fold_vel=fold_vel,
        )
        if transfer == "pallas":
            # Dedupe immutable constants into the material table (the
            # sorted row matrix then carries ids instead of 11 rows).
            from wgsparkl_tpu.solver import attach_material_table

            models, n_mat = attach_material_table(particles, models)
            self.config = dataclasses.replace(
                self.config, n_materials=n_mat
            )
        self.state = SimState(
            particles=particles,
            models=models,
            bodies=rigid_world,
            meshes=meshes,
        )

    @property
    def num_particles(self) -> int:
        return self.state.particles.count


class MpmPipeline:
    """Stateless stepper (MpmPipeline equivalent, pipeline.rs:24-39)."""

    def step(self, data: MpmData, num_substeps: int = 1) -> None:
        data.state = _step_jit(
            data.state, data.params, data.config, num_substeps
        )

    def step_fn(self, cfg: MpmConfig, num_substeps: int):
        """Return the raw jitted (state, params) -> state function."""

        def fn(state, params):
            return step(state, params, cfg, num_substeps)

        return jax.jit(fn)
