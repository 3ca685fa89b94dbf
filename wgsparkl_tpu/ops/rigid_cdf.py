"""Rigid-particle mesh CDF: grid-node signed distances to mesh colliders.

TPU-native rebuild of the reference's rigid-particle pipeline:
  * rigid_particle_update.wgsl:26-50 — transform samples + vertices to world
  * sort.wgsl:139-161              — bin rigid samples per node
  * p2g_cdf.wgsl:95-191            — per node: min |signed distance| over the
    primitives of nearby samples, restricted to face/segment-interior
    projections; OR of per-collider affinity+sign bits

Here samples are block-sorted and processed with the same job machinery as
particles (ops/blocked.py): each job computes pairwise node-window x sample
primitive projections, reduces over samples within the job, and
scatter-min/max-reduces tiles into node-CDF channel grids:
  * a packed uint32 key per node: float32 distance bits with the low 4 bits
    carrying the collider id (exact argmin without atomics)
  * per-mesh-collider {affinity, sign} indicator channels (scatter-max = OR)
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.grid import GridConfig
from wgsparkl_tpu.math import pose as pose_math
from wgsparkl_tpu.ops import blocked as bk

INF_BITS = np.uint32(0x7F800000)  # +inf float32 bit pattern


@flax.struct.dataclass
class MeshColliders:
    """Device-side rigid sample cloud (GpuRigidParticles equivalent,
    particle3d.rs:82-174)."""

    sample_local: jnp.ndarray   # [S, d]
    sample_prim: jnp.ndarray    # [S, d] vertex ids (triangle / segment)
    sample_cid: jnp.ndarray     # [S] body slot of the owning collider
    vertices_local: jnp.ndarray  # [V, d]
    vertex_cid: jnp.ndarray     # [V]

    @property
    def count(self):
        return self.sample_local.shape[0]


def world_transform(meshes: MeshColliders, bodies):
    """Transform samples + mesh vertices to world space
    (rigid_particle_update.wgsl:26-50)."""
    rot_s = bodies.rot[meshes.sample_cid]
    pos_s = bodies.pos[meshes.sample_cid]
    sample_w = pose_math.transform_point(rot_s, pos_s, meshes.sample_local)
    rot_v = bodies.rot[meshes.vertex_cid]
    pos_v = bodies.pos[meshes.vertex_cid]
    verts_w = pose_math.transform_point(rot_v, pos_v, meshes.vertices_local)
    return sample_w, verts_w


def _support_weights(pos, blk_coords, cfg, by: int = 4):
    """[..., prod(WSH)] 0/1 indicator of the 3^d stencil nodes of each
    sample (per-axis block/window extents — by-aware)."""
    d = pos.shape[-1]
    bsh = bk.block_shape(d, by)
    wsh = bk.window_shape(d, by)
    h = cfg.cell_width
    base = jnp.round(pos / h).astype(jnp.int32) - 1
    base_local = (
        base - jnp.asarray(cfg.origin_cell, jnp.int32)
        - blk_coords * jnp.asarray(bsh, jnp.int32)
    )
    base_local = jnp.clip(
        base_local, 0, jnp.asarray(bsh, jnp.int32) - 1
    )
    supp = None
    for a in range(d):
        cols = jnp.arange(wsh[a], dtype=jnp.int32)
        rel = cols - base_local[..., a : a + 1]
        sa = ((rel >= 0) & (rel <= 2)).astype(jnp.float32)
        supp = sa if supp is None else (
            supp[..., :, None] * sa[..., None, :]
        ).reshape(*sa.shape[:-1], -1)
    return supp


def mesh_node_cdf(
    meshes: MeshColliders,
    bodies,
    cfg: GridConfig,
    mesh_cids: Tuple[int, ...],
    group: int,
    max_jobs: int,
    chunk: int,
    by: int = 4,
):
    """Block-major node CDF channels from mesh colliders.

    Returns (key [NBt+1, BSH.., 1] uint32, aff_sign [NBt+1, BSH.., 2*C] f32)
    where key packs (distance bits | collider id) and aff_sign holds per
    mesh collider the {affinity, sign} indicators.  by-aware: blocks and
    windows use the anisotropic 4 x by x 4 geometry of the caller's grid
    (block_shape), so the flagship by=8 block layout composes with mesh
    colliders.
    """
    d = cfg.dim
    bsh = bk.block_shape(d, by)
    nb = bk.num_blocks(cfg, by)
    nb_total = int(np.prod(nb))
    nbr = jnp.asarray(bk.neighbor_block_table(nb))
    wsh = bk.window_shape(d, by)
    n_mesh = len(mesh_cids)

    sample_w, verts_w = world_transform(meshes, bodies)
    block_ids, _ = bk.particle_block_ids(sample_w, cfg, by)
    data = {"pos": sample_w, "prim": meshes.sample_prim, "cid": meshes.sample_cid}
    data, sorted_ids, _ = bk.sort_by_block(data, block_ids)
    jobs = bk.build_jobs(sorted_ids, nb_total, group, max_jobs)

    key_grid = jnp.full(
        (nb_total + 1,) + bsh + (1,), INF_BITS, jnp.uint32
    )
    asg_grid = jnp.zeros((nb_total + 1,) + bsh + (2 * n_mesh,), jnp.float32)

    # Map body slot -> dense mesh channel index (static).
    chan_of_slot = {cid: i for i, cid in enumerate(mesh_cids)}

    mj = max_jobs
    stacked = {
        k: jobs[k].reshape(mj // chunk, chunk)
        for k in ("start", "len", "block")
    }

    def chunk_fn(carry, jb):
        key_grid, asg_grid = carry
        block = jb["block"]
        blk_coords = bk.block_coords_of(block, nb)
        key_tile, asg_tile = _mesh_chunk_tiles(
            data, verts_w, jb["start"], jb["len"], blk_coords, cfg,
            mesh_cids, group, d, by=by,
        )
        key_grid = bk.scatter_tiles(
            key_grid, key_tile.reshape((-1,) + wsh + (1,)),
            block, nbr, d, mode="min", by=by,
        )
        asg_grid = bk.scatter_tiles(
            asg_grid, asg_tile.reshape((-1,) + wsh + (2 * n_mesh,)),
            block, nbr, d, mode="max", by=by,
        )
        return (key_grid, asg_grid), None

    (key_grid, asg_grid), _ = jax.lax.scan(
        chunk_fn, (key_grid, asg_grid), stacked
    )
    return key_grid, asg_grid


def _mesh_chunk_tiles(data, verts_w, start, length, blk_coords, cfg,
                      mesh_cids, group: int, d: int, by: int = 4):
    """Per-job window tiles of the mesh CDF pass (p2g_cdf.wgsl:113-191):
    pairwise node-window x sample-primitive projections, reduced over the
    job's samples.  Returns (key_tile [J, W] uint32 packed argmin,
    asg_tile [J, W, 2*n_mesh] affinity/sign indicators).  Addressing-
    agnostic: blk_coords are spatial block coords, so the same math serves
    the bounded grid and the sparse active-slot table."""
    gmask = jnp.arange(group, dtype=jnp.int32)[None, :] < length[:, None]

    spos = _gather(data["pos"], start, group)
    prim = _gather(data["prim"], start, group)     # [J,G,d]
    cid = _gather(data["cid"], start, group)       # [J,G]

    supp = _support_weights(spos, blk_coords[:, None, :], cfg, by)  # [J,G,W]
    supp = supp * gmask[..., None]
    xw = bk.window_node_positions(blk_coords, cfg, by)          # [J,W,d]

    va = verts_w[prim[..., 0]]                                  # [J,G,d]
    vb = verts_w[prim[..., 1]]
    if d == 3:
        vc = verts_w[prim[..., 2]]
        ab = vb - va
        ac = vc - va
        bc2 = vc - vb
        nrm = jnp.cross(ab, ac)                                 # [J,G,3]
        nlen = jnp.linalg.norm(nrm, axis=-1)
        ap = xw[:, None, :, :] - va[:, :, None, :]              # [J,G,W,3]
        bp = xw[:, None, :, :] - vb[:, :, None, :]
        cp = xw[:, None, :, :] - vc[:, :, None, :]
        t1 = jnp.einsum(
            "jgd,jgwd->jgw", jnp.cross(ab, nrm), ap
        ) <= 0.0
        t2 = jnp.einsum(
            "jgd,jgwd->jgw", jnp.cross(bc2, nrm), bp
        ) <= 0.0
        t3 = jnp.einsum(
            "jgd,jgwd->jgw", jnp.cross(ac, nrm), cp
        ) >= 0.0
        interior = t1 & t2 & t3 & (nlen[..., None] > 0.0)
        signed = jnp.einsum("jgd,jgwd->jgw", nrm, ap) / jnp.maximum(
            nlen[..., None], 1e-30
        )
    else:
        ab = vb - va
        ap = xw[:, None, :, :] - va[:, :, None, :]              # [J,G,W,2]
        ab2 = jnp.maximum(jnp.sum(ab * ab, -1), 1e-30)
        t = jnp.einsum("jgd,jgwd->jgw", ab, ap) / ab2[..., None]
        interior = (t > 0.0) & (t < 1.0)
        perp = jnp.stack([-ab[..., 1], ab[..., 0]], axis=-1)
        plen = jnp.maximum(jnp.linalg.norm(perp, axis=-1), 1e-30)
        signed = jnp.einsum("jgd,jgwd->jgw", perp, ap) / plen[..., None]

    valid = interior & (supp > 0.0)                             # [J,G,W]
    dist = jnp.abs(signed)
    sign = signed < 0.0

    # Packed argmin key: distance bits (low nibble replaced by cid).
    dist_bits = jax.lax.bitcast_convert_type(dist, jnp.uint32)
    key = (dist_bits & jnp.uint32(0xFFFFFFF0)) | cid[..., None].astype(
        jnp.uint32
    )
    key = jnp.where(valid, key, INF_BITS)
    key_tile = jnp.min(key, axis=1)                             # [J,W]

    # Per-mesh-collider affinity / sign indicators (OR via max).
    chans = []
    for slot in mesh_cids:
        mine = valid & (cid[..., None] == slot)
        chans.append(jnp.max(mine.astype(jnp.float32), axis=1))
        chans.append(jnp.max((mine & sign).astype(jnp.float32), axis=1))
    asg_tile = jnp.stack(chans, axis=-1)                        # [J,W,2C]
    return key_tile, asg_tile


def mesh_node_cdf_sparse(
    meshes: MeshColliders,
    bodies,
    cfg: GridConfig,
    mesh_cids: Tuple[int, ...],
    group: int,
    max_jobs: int,
    chunk: int,
    act,
    amax: int,
):
    """mesh_node_cdf addressed to the sparse ACTIVE-SLOT table.

    Samples are binned with the same packed unbounded keys as particles
    (ops/blocked.py particle_sparse_keys_ch) and their window tiles
    scatter-min/max into [amax + 1, BS.., C] grids through per-octant slot
    targets — lifting the round-2 'analytic colliders only' restriction of
    the sparse domain (pipeline.py:746 assert).

    Returns (key [amax+1, BS.., 1] uint32, asg [amax+1, BS.., 2*C] f32) in
    active-slot order (ghost = slot amax).
    """
    d = cfg.dim
    bs = bk.block_size(d)
    wsz = bk.window_size(d)
    n_mesh = len(mesh_cids)
    deltas = bk.sparse_octant_deltas(d)

    sample_w, verts_w = world_transform(meshes, bodies)
    keys = bk.particle_sparse_keys_ch(
        [sample_w[:, a] for a in range(d)], cfg
    )
    data = {"pos": sample_w, "prim": meshes.sample_prim, "cid": meshes.sample_cid}
    data, sorted_keys, _ = bk.sort_by_block(data, keys)
    # Distinct occupied sample-blocks <= live jobs, so max_jobs bounds the
    # sample block table too.
    jobs, _, _ = bk.build_jobs_sparse(sorted_keys, group, max_jobs, max_jobs)

    key_grid = jnp.full((amax + 1,) + (bs,) * d + (1,), INF_BITS, jnp.uint32)
    asg_grid = jnp.zeros((amax + 1,) + (bs,) * d + (2 * n_mesh,), jnp.float32)

    mj = max_jobs
    stacked = {
        k: jobs[k].reshape(mj // chunk, chunk) for k in ("start", "len", "key")
    }

    def chunk_fn(carry, jb):
        key_grid, asg_grid = carry
        jkey = jb["key"]
        blk_coords = bk.sparse_key_coords(jkey, d)
        key_tile, asg_tile = _mesh_chunk_tiles(
            data, verts_w, jb["start"], jb["len"], blk_coords, cfg,
            mesh_cids, group, d,
        )
        tgts = jnp.stack(
            [bk.sparse_slots(act, jkey + dl, amax) for dl in deltas]
        )
        key_grid = bk.scatter_tiles(
            key_grid, key_tile.reshape((-1,) + (wsz,) * d + (1,)),
            None, None, d, mode="min", tgt_table=tgts,
        )
        asg_grid = bk.scatter_tiles(
            asg_grid, asg_tile.reshape((-1,) + (wsz,) * d + (2 * n_mesh,)),
            None, None, d, mode="max", tgt_table=tgts,
        )
        return (key_grid, asg_grid), None

    (key_grid, asg_grid), _ = jax.lax.scan(
        chunk_fn, (key_grid, asg_grid), stacked
    )
    return key_grid, asg_grid


def _gather(arr, start, group):
    n = arr.shape[0]
    idx = start[:, None] + jnp.arange(group, dtype=jnp.int32)[None, :]
    return arr[jnp.clip(idx, 0, n - 1)]


def merge_mesh_into_node_cdf(
    node_dist, node_aff, node_closest, key_flat, asg_flat, mesh_cids
):
    """Merge mesh CDF channels (flat node order) into the analytic node CDF.

    Mirrors the accumulation rules of p2g_cdf.wgsl:99-106: bits OR together;
    closest = global argmin distance.
    """
    finite = key_flat < INF_BITS
    mesh_dist = jax.lax.bitcast_convert_type(
        key_flat & jnp.uint32(0xFFFFFFF0), jnp.float32
    )
    mesh_cid = (key_flat & jnp.uint32(0xF)).astype(jnp.int32)

    closer = finite & (mesh_dist < node_dist)
    node_dist = jnp.where(closer, mesh_dist, node_dist)
    node_closest = jnp.where(closer, mesh_cid, node_closest)

    for i, slot in enumerate(mesh_cids):
        has = asg_flat[:, 2 * i] > 0.0
        sgn = asg_flat[:, 2 * i + 1] > 0.0
        bits = jnp.where(has, jnp.uint32(1 << slot), jnp.uint32(0)) | jnp.where(
            sgn, jnp.uint32(1 << (slot + 16)), jnp.uint32(0)
        )
        node_aff = node_aff | bits
    return node_dist, node_aff, node_closest


def blocks_to_flat(blocked_arr, cfg: GridConfig):
    """Block-major [NB+1, BS.., C] -> flat row-major [M, C] (drops ghost)."""
    d = cfg.dim
    bs = bk.block_size(d)
    nb = bk.num_blocks(cfg)
    a = blocked_arr[:-1]
    c = a.shape[-1]
    if d == 2:
        a = a.reshape(nb[0], nb[1], bs, bs, c).transpose(0, 2, 1, 3, 4)
    else:
        # Storage block order is (x, z, y) — see blocked.storage_strides.
        a = a.reshape(nb[0], nb[2], nb[1], bs, bs, bs, c).transpose(
            0, 3, 2, 4, 1, 5, 6
        )
    return a.reshape(-1, c)
