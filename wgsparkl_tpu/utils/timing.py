"""Per-pass timing harness (GpuTimestamps equivalent).

The reference brackets each of its ~10 compute passes with GPU timestamp
queries and ships per-pass milliseconds to the UI
(/root/reference/src/pipeline.rs:201-271, src_testbed/step.rs:219-254).
On TPU the equivalent is: jit each pass as its own function and time with
block_until_ready (SURVEY.md section 5.1's plan), plus jax.profiler traces
for deep dives.  Production steps run fully fused; this mode is for
performance triage only.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional

import jax


@dataclasses.dataclass
class Timestamps:
    """Per-pass timings in ms (mirrors src_testbed Timestamps)."""

    passes: Dict[str, float]

    def total(self) -> float:
        return sum(self.passes.values())

    def report(self) -> str:
        lines = [f"{k:>24s}: {v:8.3f} ms" for k, v in self.passes.items()]
        lines.append(f"{'TOTAL':>24s}: {self.total():8.3f} ms")
        return "\n".join(lines)


def time_passes(
    state,
    params,
    cfg,
    iters: int = 10,
) -> Timestamps:
    """Time each pipeline pass separately (compiles one jit per pass)."""
    import jax.numpy as jnp

    from wgsparkl_tpu.collision import cdf as cdf_mod
    from wgsparkl_tpu.ops import transfer
    from wgsparkl_tpu.ops.particle_update import particle_update
    from wgsparkl_tpu.rigid import body as body_mod

    nc = cfg.num_colliders
    grid = cfg.grid
    results: Dict[str, float] = {}

    def bench(name: str, fn: Callable, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        results[name] = (time.perf_counter() - t) / iters * 1e3
        return out

    bodies = body_mod.update_world_mass_properties(state.bodies)
    if nc > 0:
        node_pos = grid.node_positions()
        node_dist, node_aff, node_closest = bench(
            "grid_update_cdf",
            lambda sp, r, p: cdf_mod.node_cdf(
                cfg.collider_types, sp, r, p, node_pos, grid.cell_width
            ),
            bodies.shape_params, bodies.rot, bodies.pos,
        )
        bench(
            "g2p_cdf",
            lambda pos, aff, nd, na: cdf_mod.particle_cdf_update(
                pos, aff, nd, na, grid, nc
            ),
            state.particles.pos, state.particles.cdf_affinity,
            node_dist, node_aff,
        )
    else:
        m = grid.num_nodes
        node_aff = jnp.zeros((m,), jnp.uint32)
        node_closest = jnp.full((m,), -1, jnp.int32)

    p2g_out = bench(
        "p2g",
        lambda p, mo, b, na, ncl: transfer.p2g(p, mo, b, na, ncl, grid, nc),
        state.particles, state.models, bodies, node_aff, node_closest,
    )
    grid_vel = bench(
        "grid_update",
        lambda gm, gm2, pr: transfer.grid_update(gm, gm2, pr, grid),
        p2g_out[0], p2g_out[1], params,
    )
    bench(
        "g2p",
        lambda p, b, gv, na, ncl: transfer.g2p(p, b, gv, na, ncl, grid, nc),
        state.particles, bodies, grid_vel, node_aff, node_closest,
    )
    bench(
        "particle_update",
        lambda p, mo, pr: particle_update(p, mo, pr, grid, cfg.elastic_model),
        state.particles, state.models, params,
    )
    bench(
        "rigid_impulses",
        lambda b, li, ai, pr: __import__(
            "wgsparkl_tpu.pipeline", fromlist=["rigid_bodies_update"]
        ).rigid_bodies_update(b, li, ai, pr, grid),
        bodies, p2g_out[2], p2g_out[3], params,
    )
    return Timestamps(passes=results)


def profile_trace(fn, args, log_dir: str = "/tmp/wgsparkl_trace"):
    """Capture a jax.profiler trace of one call (view with tensorboard)."""
    out = fn(*args)
    jax.block_until_ready(out)
    with jax.profiler.trace(log_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    return log_dir
