"""Simulation health diagnostics (failure detection the reference lacks).

SURVEY.md section 5.3: the reference's sparse-grid overflow silently drops
hashmap insertions (grid.wgsl:126-129) and its resize loop is a TODO
(grid.rs:43-118).  Here capacity overflow and divergence are explicit,
checkable conditions: call `check(data)` between frames (host-side, cheap)
and act on the report.
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
    out_of_grid: int          # particles outside the grid bounds
    non_finite: int           # particles with NaN/inf position or velocity
    max_speed: float
    max_def_grad: float

    @property
    def job_overflow(self) -> bool:
        return self.max_jobs > 0 and self.jobs_needed > self.max_jobs

    @property
    def ok(self) -> bool:
        return not self.job_overflow and self.non_finite == 0

    def summary(self) -> str:
        flags = []
        if self.job_overflow:
            flags.append(
                f"JOB OVERFLOW ({self.jobs_needed} > {self.max_jobs}): "
                "particles are being dropped from transfers — raise max_jobs"
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
    grid = data.config.grid
    block_ids, _ = bk.particle_block_ids(jnp.asarray(p.pos), grid)
    nb_total = int(np.prod(bk.num_blocks(grid)))
    ids = np.asarray(block_ids)
    out_of_grid = int((ids == nb_total).sum())
    if data.config.max_jobs > 0:
        counts = np.bincount(ids[ids < nb_total], minlength=nb_total)
        jobs_needed = int(
            np.sum(-(-counts[counts > 0] // data.config.group))
        )
    else:
        jobs_needed = 0
    pos = np.asarray(p.pos)
    vel = np.asarray(p.vel)
    f = np.asarray(p.def_grad)
    bad = ~(np.isfinite(pos).all(1) & np.isfinite(vel).all(1))
    return HealthReport(
        num_particles=p.count,
        jobs_needed=jobs_needed,
        max_jobs=data.config.max_jobs,
        out_of_grid=out_of_grid,
        non_finite=int(bad.sum()),
        max_speed=float(np.linalg.norm(vel[~bad], axis=1).max()) if (~bad).any() else float("nan"),
        max_def_grad=float(np.abs(f[~bad]).max()) if (~bad).any() else float("nan"),
    )
