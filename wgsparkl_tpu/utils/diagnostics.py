"""Simulation health diagnostics (failure detection the reference lacks).

SURVEY.md section 5.3: the reference's sparse-grid overflow silently drops
hashmap insertions (grid.wgsl:126-129) and its resize loop is a TODO
(grid.rs:43-118).  Here capacity overflow and divergence are explicit,
checkable conditions: call `check(data)` between frames (host-side, cheap)
and act on the report.  For the sparse/unbounded domain the report also
covers the occupied-block (kmax) and active-slot (amax) capacities that the
substep masks on overflow — see ops/blocked.py build_jobs_sparse /
sparse_active_table.

On-device counterparts of the same conditions (job overflow, migration-cap
drops, frame-end live-lane loss under the spatial decomposition) ride the
pallas frame loop itself: `pipeline.step_with_diag` returns a StepDiag
alongside the state.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class HealthReport:
    num_particles: int
    jobs_needed: int          # job-table demand this instant
    max_jobs: int             # static capacity (0 = dense path, no limit)
    out_of_grid: int          # particles outside the grid/sparse key range
    non_finite: int           # particles with NaN/inf position or velocity
    max_speed: float
    max_def_grad: float
    # Sparse-domain capacities (0/0 on bounded configs).
    occupied_blocks: int = 0
    kmax: int = 0
    active_blocks: int = 0
    amax: int = 0

    @property
    def job_overflow(self) -> bool:
        return self.max_jobs > 0 and self.jobs_needed > self.max_jobs

    @property
    def sparse_overflow(self) -> bool:
        return (self.kmax > 0 and self.occupied_blocks > self.kmax) or (
            self.amax > 0 and self.active_blocks > self.amax
        )

    @property
    def ok(self) -> bool:
        return (
            not self.job_overflow
            and not self.sparse_overflow
            and self.non_finite == 0
        )

    def summary(self) -> str:
        flags = []
        if self.job_overflow:
            flags.append(
                f"JOB OVERFLOW ({self.jobs_needed} > {self.max_jobs}): "
                "particles are being dropped from transfers — raise max_jobs"
            )
        if self.kmax > 0 and self.occupied_blocks > self.kmax:
            flags.append(
                f"SPARSE BLOCK OVERFLOW ({self.occupied_blocks} > kmax="
                f"{self.kmax}): truncated blocks' particles are frozen — "
                "raise kmax"
            )
        if self.amax > 0 and self.active_blocks > self.amax:
            flags.append(
                f"SPARSE ACTIVE-SLOT OVERFLOW ({self.active_blocks} > amax="
                f"{self.amax}): halo nodes are dropped — raise amax"
            )
        if self.non_finite:
            flags.append(f"{self.non_finite} non-finite particles (diverged)")
        if self.out_of_grid:
            flags.append(f"{self.out_of_grid} particles out of grid bounds")
        status = "OK" if self.ok else "UNHEALTHY"
        detail = (
            f"N={self.num_particles} jobs={self.jobs_needed}/{self.max_jobs} "
            f"|v|max={self.max_speed:.3g} |F|max={self.max_def_grad:.3g}"
        )
        return f"{status}: {detail}" + ("; " + "; ".join(flags) if flags else "")


def check(data) -> HealthReport:
    """Host-side health check of an MpmData (runs a tiny jitted reduction)."""
    from wgsparkl_tpu.ops import blocked as bk

    p = data.state.particles
    cfg = data.config
    grid = cfg.grid
    pos = np.asarray(p.pos)

    occupied_blocks = active_blocks = 0
    if getattr(cfg, "sparse", False):
        # Sparse/unbounded domain: the nominal grid extent does not bound
        # particles — out-of-range means beyond the packed-key range
        # (+-511 blocks of the origin), and the real capacity conditions
        # are distinct occupied blocks vs kmax and occupied U +1-neighbor
        # blocks vs amax (ops/blocked.py sparse_* tables).
        keys = np.asarray(
            bk.particle_sparse_keys_ch(
                [jnp.asarray(pos[:, a]) for a in range(p.dim)], grid
            )
        )
        out_of_grid = int((keys >= bk.SPARSE_SENTINEL).sum())
        occ = np.unique(keys[keys < bk.SPARSE_SENTINEL])
        occupied_blocks = len(occ)
        deltas = bk.sparse_octant_deltas(p.dim)
        active_blocks = len(np.unique(occ[None, :] + np.asarray(deltas)[:, None]))
        counts = np.unique(keys[keys < bk.SPARSE_SENTINEL], return_counts=True)[1]
        jobs_needed = int(np.sum(-(-counts // cfg.group))) if len(counts) else 0
    else:
        block_ids, _ = bk.particle_block_ids(jnp.asarray(p.pos), grid)
        nb_total = int(np.prod(bk.num_blocks(grid)))
        ids = np.asarray(block_ids)
        out_of_grid = int((ids == nb_total).sum())
        if cfg.max_jobs > 0:
            counts = np.bincount(ids[ids < nb_total], minlength=nb_total)
            jobs_needed = int(
                np.sum(-(-counts[counts > 0] // cfg.group))
            )
        else:
            jobs_needed = 0
    vel = np.asarray(p.vel)
    f = np.asarray(p.def_grad)
    bad = ~(np.isfinite(pos).all(1) & np.isfinite(vel).all(1))
    return HealthReport(
        num_particles=p.count,
        jobs_needed=jobs_needed,
        max_jobs=cfg.max_jobs,
        out_of_grid=out_of_grid,
        non_finite=int(bad.sum()),
        max_speed=float(np.linalg.norm(vel[~bad], axis=1).max()) if (~bad).any() else float("nan"),
        max_def_grad=float(np.abs(f[~bad]).max()) if (~bad).any() else float("nan"),
        occupied_blocks=occupied_blocks,
        kmax=getattr(cfg, "kmax", 0) if getattr(cfg, "sparse", False) else 0,
        active_blocks=active_blocks,
        amax=getattr(cfg, "amax", 0) if getattr(cfg, "sparse", False) else 0,
    )
