"""Blocked P2G / G2P / particle-CDF kernels (MXU matmul formulation).

See ops/blocked.py for the layout and job machinery.  Per job of G sorted
particles the transfers are:

  P2G:  tile[w, c] = sum_g W[g, w] * F[g, c]          (one MXU matmul/job)
        with F = [m v - A p, m, A]  (momentum reconstructed per node as
        f_mv + A_sum @ x_n, so the per-pair dpt never materializes)
  G2P:  out[g, c] = sum_w W[g, w] * N[w, c]           (one MXU matmul/job)
        with N = [v, v (x) x] and the particle terms recovered via
        grad_v = inv_d (sum w v x^T - v_pic p^T).

CPIC affinity masking multiplies elementwise into W; incompatible pairs are
routed to the impulse / ghost-velocity paths exactly as in the dense ops.
Jobs are processed in chunks under lax.scan to bound the [chunk, G, WSZ^d]
weight-matrix working set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.collision import cdf as cdf_mod
from wgsparkl_tpu.grid import GridConfig
from wgsparkl_tpu.ops import blocked as bk
from wgsparkl_tpu.ops.kernel import inv_d
from wgsparkl_tpu.ops.transfer import project_velocity
from wgsparkl_tpu.rigid import body as body_mod


def _job_gather(arr, start, group):
    """Gather [J, G, ...] slices from a sorted [N, ...] array."""
    n = arr.shape[0]
    idx = start[:, None] + jnp.arange(group, dtype=jnp.int32)[None, :]
    return arr[jnp.clip(idx, 0, n - 1)]


def _chunked(fn, jobs, chunk: int, carry_init):
    """Run fn(carry, job_chunk) over the job table in chunks via scan."""
    mj = jobs["block"].shape[0]
    assert mj % chunk == 0, (mj, chunk)
    stacked = {
        k: jobs[k].reshape(mj // chunk, chunk)
        for k in ("start", "len", "block")
    }
    carry, ys = jax.lax.scan(fn, carry_init, stacked)
    return carry, ys


def p2g_blocked(
    sp,            # sorted particle data dict: pos, vel, mass, affine, aff, normal
    jobs,
    bodies,
    grid_aff,      # [NB+1, BS.., 1] uint32 (zeros tile when nc == 0)
    grid_closest,  # [NB+1, BS.., 1] int32
    cfg: GridConfig,
    nc: int,
    group: int,
    chunk: int,
):
    """Returns (grid_mm [NB+1, BS.., d+1], lin_imp [B,d], ang_imp [B,a])."""
    d = cfg.dim
    bs = bk.block_size(d)
    nb = bk.num_blocks(cfg)
    nb_total = int(np.prod(nb))
    nbr = jnp.asarray(bk.neighbor_block_table(nb))
    wsz = bk.window_size(d)
    wvol = wsz**d
    adim = 3 if d == 3 else 1
    bcount = bodies.count

    grid_mm = jnp.zeros((nb_total + 1,) + (bs,) * d + (d + 1,), jnp.float32)
    lin0 = jnp.zeros((bcount + 1, d), jnp.float32)
    ang0 = jnp.zeros((bcount + 1, adim), jnp.float32)

    def chunk_fn(carry, jb):
        grid_mm, lin_acc, ang_acc = carry
        start, length, block = jb["start"], jb["len"], jb["block"]
        gmask = (
            jnp.arange(group, dtype=jnp.int32)[None, :] < length[:, None]
        )  # [J, G]
        blk_coords = bk.block_coords_of(block, nb)

        pos = _job_gather(sp["pos"], start, group)
        vel = _job_gather(sp["vel"], start, group)
        mass = _job_gather(sp["mass"], start, group) * gmask
        affine = _job_gather(sp["affine"], start, group)

        w, _, _ = bk.window_weights(pos, blk_coords[:, None, :], cfg)  # [J,G,W]
        w = w * gmask[..., None]

        if nc > 0:
            paff = _job_gather(sp["aff"], start, group)
            tile_aff = bk.gather_tiles(grid_aff, block, nbr, d).reshape(
                -1, wvol
            )  # [J, W] uint32
            compat = cdf_mod.affinities_are_compatible(
                tile_aff[:, None, :], paff[..., None]
            )  # [J, G, W]
            w_c = jnp.where(compat, w, 0.0)
        else:
            w_c = w

        # Features: [m v - A p, m, A] -> tile via one matmul.
        ap = jnp.einsum("jgik,jgk->jgi", affine, pos)
        feats = jnp.concatenate(
            [
                mass[..., None] * vel - ap,
                mass[..., None],
                affine.reshape(*affine.shape[:-2], d * d),
            ],
            axis=-1,
        )  # [J, G, 1 + d + d^2]
        tile = jnp.einsum(
            "jgw,jgc->jwc", w_c, feats, preferred_element_type=jnp.float32
        )  # [J, W, C]

        xw = bk.window_node_positions(blk_coords, cfg)  # [J, W, d]
        a_sum = tile[..., d + 1 :].reshape(*tile.shape[:-1], d, d)
        mom = tile[..., :d] + jnp.einsum("jwik,jwk->jwi", a_sum, xw)
        mm_tile = jnp.concatenate([mom, tile[..., d : d + 1]], axis=-1)
        grid_mm = bk.scatter_tiles(
            grid_mm, mm_tile.reshape((-1,) + (wsz,) * d + (d + 1,)),
            block, nbr, d,
        )

        if nc > 0:
            # CPIC impulses: incompatible pairs against the node's closest body
            # (p2g.wgsl:200-231), reduced over particles first, then bodies.
            tile_closest = bk.gather_tiles(grid_closest, block, nbr, d).reshape(
                -1, wvol
            )
            has_body = tile_closest >= 0
            safe_id = jnp.where(has_body, tile_closest, 0)
            bv = body_mod.velocity_at_point(bodies, safe_id, xw)  # [J, W, d]
            normal = _job_gather(sp["normal"], start, group)       # [J, G, d]
            rel = vel[:, :, None, :] - bv[:, None, :, :]           # [J,G,W,d]
            ghost = bv[:, None] + project_velocity(rel, normal[:, :, None, :])
            w_i = jnp.where((w > 0) & ~compat & has_body[:, None, :], w, 0.0)
            delta = (vel[:, :, None, :] - ghost) * (
                w_i * mass[..., None]
            )[..., None]                                            # [J,G,W,d]
            dsum = jnp.sum(delta, axis=1)                           # [J, W, d]
            lever = bodies.world_com[safe_id] - xw
            if d == 2:
                dang = (
                    dsum[..., 0] * lever[..., 1] - dsum[..., 1] * lever[..., 0]
                )[..., None]
            else:
                dang = jnp.cross(dsum, lever)
            seg = jnp.where(has_body, safe_id, bcount).reshape(-1)
            lin_acc = lin_acc + jax.ops.segment_sum(
                dsum.reshape(-1, d), seg, num_segments=bcount + 1
            )
            ang_acc = ang_acc + jax.ops.segment_sum(
                dang.reshape(-1, adim), seg, num_segments=bcount + 1
            )
        return (grid_mm, lin_acc, ang_acc), None

    (grid_mm, lin, ang), _ = _chunked(
        chunk_fn, jobs, chunk, (grid_mm, lin0, ang0)
    )
    return grid_mm, lin[: bcount], ang[: bcount]


def g2p_blocked(
    sp,
    jobs,
    bodies,
    grid_vel_blocks,  # [NB+1, BS.., d]
    grid_aff,
    grid_closest,
    cfg: GridConfig,
    nc: int,
    group: int,
    chunk: int,
    n_particles: int,
):
    """Returns (new_vel [N,d], vel_grad [N,d,d]) in sorted particle order."""
    d = cfg.dim
    nb = bk.num_blocks(cfg)
    nbr = jnp.asarray(bk.neighbor_block_table(nb))
    wsz = bk.window_size(d)
    wvol = wsz**d
    inv_d_val = inv_d(cfg.cell_width)

    def chunk_fn(carry, jb):
        start, length, block = jb["start"], jb["len"], jb["block"]
        group_ids = jnp.arange(group, dtype=jnp.int32)
        gmask = group_ids[None, :] < length[:, None]
        blk_coords = bk.block_coords_of(block, nb)

        pos = _job_gather(sp["pos"], start, group)
        w, _, _ = bk.window_weights(pos, blk_coords[:, None, :], cfg)
        w = w * gmask[..., None]

        vtile = bk.gather_tiles(grid_vel_blocks, block, nbr, d).reshape(
            -1, wvol, d
        )
        xw = bk.window_node_positions(blk_coords, cfg)

        if nc > 0:
            paff = _job_gather(sp["aff"], start, group)
            vel = _job_gather(sp["vel"], start, group)
            normal = _job_gather(sp["normal"], start, group)
            tile_aff = bk.gather_tiles(grid_aff, block, nbr, d).reshape(-1, wvol)
            tile_closest = bk.gather_tiles(grid_closest, block, nbr, d).reshape(
                -1, wvol
            )
            compat = cdf_mod.affinities_are_compatible(
                tile_aff[:, None, :], paff[..., None]
            )
            has_body = tile_closest >= 0
            safe_id = jnp.where(has_body, tile_closest, 0)
            bv = body_mod.velocity_at_point(bodies, safe_id, xw)
            rel = vel[:, :, None, :] - bv[:, None, :, :]
            ghost_b = bv[:, None] + project_velocity(rel, normal[:, :, None, :])
            ghost = jnp.where(
                has_body[:, None, :, None],
                ghost_b,
                jnp.broadcast_to(vel[:, :, None, :], ghost_b.shape),
            )
            v_eff = jnp.where(
                compat[..., None],
                jnp.broadcast_to(vtile[:, None, :, :], ghost.shape),
                ghost,
            )  # [J, G, W, d]
            v_pic = jnp.einsum("jgw,jgwd->jgd", w, v_eff)
            m1 = jnp.einsum("jgw,jgwi,jwk->jgik", w, v_eff, xw)
        else:
            nodefeat = jnp.concatenate(
                [vtile, jnp.einsum("jwi,jwk->jwik", vtile, xw).reshape(
                    -1, wvol, d * d
                )],
                axis=-1,
            )
            out = jnp.einsum(
                "jgw,jwc->jgc", w, nodefeat, preferred_element_type=jnp.float32
            )
            v_pic = out[..., :d]
            m1 = out[..., d:].reshape(*out.shape[:-1], d, d)

        grad = inv_d_val * (m1 - jnp.einsum("jgi,jgk->jgik", v_pic, pos))
        return carry, (v_pic, grad, start, gmask)

    _, (v_pic, grad, starts, gmasks) = _chunked(chunk_fn, jobs, chunk, 0)
    # Write back to sorted particle order (masked slots dropped).
    j_total = v_pic.shape[0] * v_pic.shape[1]
    v_flat = v_pic.reshape(j_total * group, d)
    g_flat = grad.reshape(j_total * group, d, d)
    idx = (
        starts.reshape(-1)[:, None] + jnp.arange(group, dtype=jnp.int32)[None, :]
    )
    idx = jnp.where(gmasks.reshape(-1, group), idx, n_particles).reshape(-1)
    new_vel = jnp.zeros((n_particles, d), jnp.float32).at[idx].set(
        v_flat, mode="drop"
    )
    vel_grad = jnp.zeros((n_particles, d, d), jnp.float32).at[idx].set(
        g_flat, mode="drop"
    )
    return new_vel, vel_grad
