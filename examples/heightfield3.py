"""Sand dropped on a random heightfield (reference heightfield3.rs:29-84)."""

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

scale = float(os.environ.get("SCALE", 0.35))
cell_width = 1.0
nxz = max(8, int(45 * scale))
ny = max(12, int(100 * scale))

pos = _lattice(
    (nxz, ny, nxz), cell_width,
    (-nxz * cell_width / 4, 16.0, -nxz * cell_width / 4),
)
n = len(pos)
particles = Particles.from_arrays(pos, density=2700.0, radius=cell_width / 4)
elast = ElasticCoefficients.from_young_modulus(2e9, 0.2)
dp = drucker_prager_arrays([DruckerPrager.new(2e9, 0.2)])
dp = {k: np.full(n, v[0]) for k, v in dp.items()}
models = Models.from_arrays(n, elast.lam, elast.mu, dp=dp)

# Random rolling heightfield (heightfield3.rs builds a 200x200 field; scaled).
rng = np.random.default_rng(0)
res = max(16, int(48 * scale))
extent = nxz * cell_width * 1.5
heights = 0.15 * np.sin(np.linspace(0, 6, res))[:, None] * np.cos(
    np.linspace(0, 6, res)
)[None, :] + 0.04 * rng.standard_normal((res, res))
field = Collider.heightfield(heights, (2 * extent, 8.0, 2 * extent))

params = SimulationParams.new(dt=(1 / 60) / 20, gravity=[0.0, -9.81, 0.0])
data = MpmData(
    params, particles, models, [RigidBodyDesc(field, (0.0, 0.0, 0.0))],
    cell_width,
    grid_bounds=(
        np.array([-extent, -6.0, -extent]),
        np.array([extent, 30.0, extent]),
    ),    **transfer_kw(),
)
print(
    f"heightfield3: {data.num_particles} particles, "
    f"{data.state.meshes.count} rigid samples, grid {data.config.grid.shape}"
)
run_example(data, num_substeps=20, frames=int(os.environ.get("FRAMES", 40)),
            name="heightfield3")
