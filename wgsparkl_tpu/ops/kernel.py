"""Quadratic B-spline transfer kernel.

Physics parity with /root/reference/src/grid/kernel.wgsl:
  * eval_all evaluates the 3 per-axis weights at offsets 0,1,2 (kernel.wgsl:61-67)
  * the stencil base cell is round(p/h) - 1 (particle3d.wgsl:41-48)
  * APIC inv_d = 4 / h^2 (kernel.wgsl:57-59)

Instead of the reference's 9/27-entry shift tables walked per thread, we
compute all stencil offsets as one static [3^d, d] constant and vectorize the
(particle, offset) axes; XLA maps this onto the VPU lanes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def inv_d(cell_width):
    """APIC D^-1 scale for the quadratic kernel (kernel.wgsl:57-59)."""
    return 4.0 / (cell_width * cell_width)


def eval_all(x):
    """Per-axis quadratic B-spline weights at offsets 0,1,2.

    x = p/h - base_cell, in [0.5, 1.5].  Returns [..., 3].
    (kernel.wgsl:61-67 evaluates at -(-x), i.e. the same argument.)
    """
    w0 = 0.5 * (1.5 - x) ** 2
    w1 = 0.75 - (x - 1.0) ** 2
    w2 = 0.5 * (x - 0.5) ** 2
    return jnp.stack([w0, w1, w2], axis=-1)


@functools.lru_cache(maxsize=None)
def stencil_offsets(dim: int) -> np.ndarray:
    """Static [3^dim, dim] int32 array of stencil offsets in {0,1,2}^dim."""
    grids = np.meshgrid(*([np.arange(3)] * dim), indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1).astype(np.int32)


def stencil_base_and_weights(pos, cell_width):
    """Stencil base cell + per-(particle, offset) weights and node deltas.

    pos: [N, d] world positions.
    Returns:
      base_cell [N, d] int32      — round(p/h) - 1
      weights   [N, 3^d] f32      — product of per-axis weights
      dpt       [N, 3^d, d] f32   — node_pos - particle_pos
    """
    d = pos.shape[-1]
    u = pos / cell_width
    base = jnp.round(u).astype(jnp.int32) - 1
    x = u - base.astype(pos.dtype)          # in [0.5, 1.5]
    w_axis = eval_all(x)                    # [N, d, 3]
    offs = jnp.asarray(stencil_offsets(d))  # [K, d]
    # weights: product over axes of w_axis[:, a, offs[k, a]]
    w = jnp.ones((pos.shape[0], offs.shape[0]), pos.dtype)
    for a in range(d):
        w = w * w_axis[:, a, :][:, offs[:, a]]
    node_pos = (base[:, None, :] + offs[None, :, :]).astype(pos.dtype) * cell_width
    dpt = node_pos - pos[:, None, :]
    return base, w, dpt
