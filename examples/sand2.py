"""2D sand with static, kinematic and dynamic colliders (reference
sand2.rs:22-181: rotating cuboid/ball/capsule + dynamic falling plates —
the two-way coupling demo)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from common import run_example, transfer_kw  # noqa: E402

import numpy as np  # noqa: E402

from wgsparkl_tpu.collision.shapes import Collider  # noqa: E402
from wgsparkl_tpu.models import DruckerPrager, ElasticCoefficients  # noqa: E402
from wgsparkl_tpu.models.drucker_prager import drucker_prager_arrays  # noqa: E402
from wgsparkl_tpu.params import SimulationParams  # noqa: E402
from wgsparkl_tpu.pipeline import MpmData, RigidBodyDesc  # noqa: E402
from wgsparkl_tpu.scenes import _lattice  # noqa: E402
from wgsparkl_tpu.solver import Models, Particles  # noqa: E402

scale = float(os.environ.get("SCALE", 0.2))
n_side = max(48, int(700 * scale))
cell_width = 0.2

pos = _lattice((n_side, n_side), cell_width, (0.1, 46.0 * scale + 2.0))
n = len(pos)
particles = Particles.from_arrays(pos, density=1000.0, radius=cell_width / 4)
elast = ElasticCoefficients.from_young_modulus(1e7, 0.2)
dp = drucker_prager_arrays([DruckerPrager.new(1e7, 0.2)])
dp = {k: np.full(n, v[0]) for k, v in dp.items()}
models = Models.from_arrays(n, elast.lam, elast.mu, dp=dp)

extent = n_side * cell_width / 2
bodies = [
    # floor + walls
    RigidBodyDesc(Collider.cuboid(extent * 4, 1.0), (extent / 2, -1.0)),
    RigidBodyDesc(Collider.cuboid(1.0, extent * 4), (-extent * 1.2, 0.0)),
    RigidBodyDesc(Collider.cuboid(1.0, extent * 4), (extent * 2.2, 0.0)),
    # kinematic stirrers (sand2.rs ANGVEL=1)
    RigidBodyDesc(
        Collider.cuboid(extent * 0.3, 0.4), (extent * 0.5, extent * 0.5),
        body_type="kinematic", angvel=1.0,
    ),
    RigidBodyDesc(
        Collider.ball(extent * 0.15), (extent * 1.0, extent * 0.8),
        body_type="kinematic", angvel=1.0,
    ),
    RigidBodyDesc(
        Collider.capsule(extent * 0.2, extent * 0.08),
        (extent * 0.2, extent * 0.9), body_type="kinematic", angvel=-1.0,
    ),
    # dynamic plates of varying density (two-way coupling)
    RigidBodyDesc(
        Collider.cuboid(extent * 0.15, 0.3), (extent * 0.4, extent * 1.6),
        body_type="dynamic", density=500.0,
    ),
    RigidBodyDesc(
        Collider.cuboid(extent * 0.15, 0.3), (extent * 0.9, extent * 1.8),
        body_type="dynamic", density=2000.0,
    ),
]
params = SimulationParams.new(dt=(1 / 60) / 10, gravity=[0.0, -9.81])
data = MpmData(
    params, particles, models, bodies, cell_width,
    grid_bounds=(
        np.array([-extent * 1.6, -0.5]),
        np.array([extent * 2.6, 60.0 * scale + extent * 1.5]),
    ),    **transfer_kw(),
)
print(f"sand2: {data.num_particles} particles, grid {data.config.grid.shape}")
tb = run_example(data, num_substeps=10, frames=int(os.environ.get("FRAMES", 60)),
                 name="sand2")
print("dynamic plate poses:", np.asarray(tb.data.state.bodies.pos)[6:].tolist())
