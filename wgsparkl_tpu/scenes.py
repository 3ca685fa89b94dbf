"""Canonical scene builders (the reference's examples, as library functions).

Mirrors /root/reference/crates/wgsparkl{2d,3d}/examples: sand3.rs,
elasticity2.rs, sand2.rs, elastic_cut*.rs scene setups, parameterized by
scale so the same builders serve tests, examples and benchmarks.
"""

from __future__ import annotations

import numpy as np

from wgsparkl_tpu.collision.shapes import Collider
from wgsparkl_tpu.models import DruckerPrager, ElasticCoefficients
from wgsparkl_tpu.models.drucker_prager import drucker_prager_arrays
from wgsparkl_tpu.params import SimulationParams
from wgsparkl_tpu.pipeline import MpmData, RigidBodyDesc
from wgsparkl_tpu.solver import Models, Particles


def _lattice(counts, cell_width, origin, spacing_div=2):
    """Particle lattice at spacing cell_width/spacing_div, centered per cell."""
    axes = [
        (np.arange(c, dtype=np.float32) + 0.5) * (cell_width / spacing_div) + o
        for c, o in zip(counts, origin)
    ]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.ravel() for m in mesh], axis=-1)


def sand_box_3d(
    nxz: int = 45,
    ny: int = 100,
    cell_width: float = 1.0,
    num_substeps: int = 20,
    gravity_factor: float = 1.0,
    with_paddle: bool = True,
    **mpm_kw,
) -> MpmData:
    """3D sand in a box with an optional spinning paddle (sand3.rs:20-113).

    density 2700, E=2e9 nu=0.2 + Drucker-Prager; 5 box walls + kinematic
    rotating paddle.
    """
    pos = _lattice(
        (nxz, ny, nxz),
        cell_width,
        (-nxz * cell_width / 4, 10.0 * cell_width / 2, -nxz * cell_width / 4),
    )
    n = len(pos)
    particles = Particles.from_arrays(pos, density=2700.0, radius=cell_width / 4)
    elast = ElasticCoefficients.from_young_modulus(2.0e9, 0.2)
    dp = drucker_prager_arrays([DruckerPrager.new(2.0e9, 0.2)])
    dp = {k: np.full(n, v[0]) for k, v in dp.items()}
    models = Models.from_arrays(n, elast.lam, elast.mu, dp=dp)

    bodies = [
        RigidBodyDesc(Collider.cuboid(100.0, 4.0, 100.0), (0.0, -4.0, 0.0)),
        RigidBodyDesc(Collider.cuboid(35.0, 5.0, 0.5), (0.0, 5.0, -35.0)),
        RigidBodyDesc(Collider.cuboid(35.0, 5.0, 0.5), (0.0, 5.0, 35.0)),
        RigidBodyDesc(Collider.cuboid(0.5, 5.0, 35.0), (-35.0, 5.0, 0.0)),
        RigidBodyDesc(Collider.cuboid(0.5, 5.0, 35.0), (35.0, 5.0, 0.0)),
    ]
    if with_paddle:
        bodies.append(
            RigidBodyDesc(
                Collider.cuboid(0.5, 2.0, 30.0),
                (0.0, 2.0, 0.0),
                rotation=(0.0, 0.0, -0.5),
                body_type="kinematic",
                angvel=(0.0, -1.0, 0.0),
            )
        )

    params = SimulationParams.new(
        dt=(1.0 / 60.0) / num_substeps,
        gravity=np.array([0.0, -9.81, 0.0]) * gravity_factor,
    )
    half = nxz * cell_width / 2 + 10
    return MpmData(
        params, particles, models, bodies, cell_width,
        grid_bounds=(
            np.array([-half, -2 * cell_width, -half]),
            np.array([half, (ny + 30) * cell_width / 2, half]),
        ),
        **mpm_kw,
    )


def elastic_blocks_2d(
    n_side: int = 700,
    cell_width: float = 0.2,
    num_substeps: int = 15,
    **mpm_kw,
) -> MpmData:
    """2D elastic columns falling between tilted walls (elasticity2.rs:20-103
    structure: big elastic lattice, E=5e6, floor + 2 tilted walls)."""
    pos = _lattice((n_side, n_side), cell_width, (-n_side * cell_width / 4, 1.0))
    n = len(pos)
    particles = Particles.from_arrays(pos, density=1000.0, radius=cell_width / 4)
    elast = ElasticCoefficients.from_young_modulus(5.0e6, 0.2)
    models = Models.from_arrays(n, elast.lam, elast.mu, phase=1.0, max_stretch=-1.0)

    extent = n_side * cell_width / 2
    bodies = [
        RigidBodyDesc(Collider.cuboid(extent * 4, 1.0), (0.0, -1.0)),
        RigidBodyDesc(
            Collider.cuboid(extent, 0.2), (-extent * 0.75, extent * 0.3),
            rotation=0.4,
        ),
        RigidBodyDesc(
            Collider.cuboid(extent, 0.2), (extent * 0.75, extent * 0.3),
            rotation=-0.4,
        ),
    ]
    params = SimulationParams.new(
        dt=(1.0 / 60.0) / num_substeps, gravity=[0.0, -9.81]
    )
    return MpmData(
        params, particles, models, bodies, cell_width,
        grid_bounds=(
            np.array([-extent * 2.5, -0.5]),
            np.array([extent * 2.5, 1.5 + extent * 1.2]),
        ),
        **mpm_kw,
    )


def sand_column_2d(
    nx: int = 256,
    ny: int = 256,
    cell_width: float = 0.2,
    num_substeps: int = 10,
    **mpm_kw,
) -> MpmData:
    """2D sand column collapse on a flat floor (BASELINE config 2;
    material parameters from sand2.rs:33-47: density 1000, E=1e7, nu=0.2)."""
    pos = _lattice((nx, ny), cell_width, (-nx * cell_width / 4, cell_width))
    n = len(pos)
    particles = Particles.from_arrays(pos, density=1000.0, radius=cell_width / 4)
    elast = ElasticCoefficients.from_young_modulus(1.0e7, 0.2)
    dp = drucker_prager_arrays([DruckerPrager.new(1.0e7, 0.2)])
    dp = {k: np.full(n, v[0]) for k, v in dp.items()}
    models = Models.from_arrays(n, elast.lam, elast.mu, dp=dp)
    extent = max(nx, ny) * cell_width
    bodies = [RigidBodyDesc(Collider.cuboid(extent * 8, 1.0), (0.0, -1.0))]
    params = SimulationParams.new(dt=(1.0 / 60.0) / num_substeps, gravity=[0.0, -9.81])
    return MpmData(
        params, particles, models, bodies, cell_width,
        grid_bounds=(
            np.array([-extent * 2, -0.2]), np.array([extent * 2, extent * 1.5])
        ),
        **mpm_kw,
    )
