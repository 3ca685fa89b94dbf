"""Dense bounded MPM grid (TPU-native replacement for the sparse GPU hashmap).

The reference discovers its active domain every substep through a
Murmur3-hashed GPU hashmap with atomic CAS insertion plus prefix-sum
compaction (/root/reference/src/grid/grid.wgsl:98-164, sort.wgsl).  TPUs have
no global atomics and XLA wants static shapes, so the TPU-native design is a
*dense bounded* grid addressed by flat node index: memory scales with the
domain bounding box (fine for the benchmark configs: 64^2 .. 192^3), every
pass is a fixed-shape gather/scatter, and "activation" is implicit (empty
nodes have zero mass).  A block-sparse active-table variant is layered on top
for very large domains (see ops/blocked.py).

Grid state lives only *inside* one substep (the reference zeroes it each
substep too, grid.wgsl:362-379) so it is created functionally in the step.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Static grid geometry (python-level; a jit static argument).

    Nodes sit at world positions (origin_cell + i) * cell_width per axis.
    """

    shape: Tuple[int, ...]       # node counts per axis
    cell_width: float
    origin_cell: Tuple[int, ...]  # world cell coords of node [0, 0, ...]

    @property
    def dim(self) -> int:
        return len(self.shape)

    @property
    def num_nodes(self) -> int:
        return int(np.prod(self.shape))

    @staticmethod
    def from_bounds(lo, hi, cell_width: float, margin_cells: int = 3) -> "GridConfig":
        """Grid covering [lo, hi] with a safety margin (stencil reach is 2).

        Shapes are rounded up to whole 4^3 / 8^2 blocks (grid.wgsl:43 block
        geometry) so the blocked transfer path can always be used.
        """
        lo = np.asarray(lo, np.float64)
        hi = np.asarray(hi, np.float64)
        dim = len(lo)
        bs = 4 if dim == 3 else 8
        origin = np.floor(lo / cell_width).astype(np.int64) - margin_cells
        top = np.ceil(hi / cell_width).astype(np.int64) + margin_cells
        shape = tuple(
            int(-((t - o + 1) // -bs) * bs) for o, t in zip(origin, top)
        )
        return GridConfig(
            shape=shape,
            cell_width=float(cell_width),
            origin_cell=tuple(int(o) for o in origin),
        )

    def node_positions(self) -> jnp.ndarray:
        """[num_nodes, d] world positions of all nodes (flat C-order)."""
        axes = [
            (jnp.arange(n, dtype=jnp.float32) + o) * self.cell_width
            for n, o in zip(self.shape, self.origin_cell)
        ]
        mesh = jnp.meshgrid(*axes, indexing="ij")
        return jnp.stack([m.reshape(-1) for m in mesh], axis=-1)

    def node_position_channels(self):
        """d channel arrays [num_nodes] of node coords (lane-efficient form)."""
        m = self.num_nodes
        idx = jnp.arange(m, dtype=jnp.int32)
        chans = []
        stride = m
        for a in range(self.dim):
            stride = stride // self.shape[a]
            coord = (idx // stride) % self.shape[a] + self.origin_cell[a]
            chans.append(coord.astype(jnp.float32) * self.cell_width)
        return chans

    def flatten_index(self, cell: jnp.ndarray) -> jnp.ndarray:
        """World integer cell coords [..., d] -> flat node index [...] (no clip)."""
        idx = cell - jnp.asarray(self.origin_cell, cell.dtype)
        flat = idx[..., 0]
        for a in range(1, self.dim):
            flat = flat * self.shape[a] + idx[..., a]
        return flat

    def in_bounds(self, cell: jnp.ndarray) -> jnp.ndarray:
        """[..., d] world cell coords -> bool [...] inside the grid."""
        idx = cell - jnp.asarray(self.origin_cell, cell.dtype)
        ok = (idx >= 0) & (idx < jnp.asarray(self.shape, cell.dtype))
        return jnp.all(ok, axis=-1)
