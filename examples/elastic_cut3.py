"""Elastic block falling onto three thin blades and being cut
(reference elastic_cut3.rs:28-99: 75k elastic particles, phase/max_stretch
fracture, 3 rotated thin trimesh blades, gravity x4)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from common import run_example, transfer_kw  # noqa: E402

import numpy as np  # noqa: E402

from wgsparkl_tpu.collision.shapes import Collider  # noqa: E402
from wgsparkl_tpu.models import ElasticCoefficients  # noqa: E402
from wgsparkl_tpu.params import SimulationParams  # noqa: E402
from wgsparkl_tpu.pipeline import MpmData, RigidBodyDesc  # noqa: E402
from wgsparkl_tpu.scenes import _lattice  # noqa: E402
from wgsparkl_tpu.solver import Models, Particles  # noqa: E402

scale = float(os.environ.get("SCALE", 0.3))
cell_width = 1.0
nx = max(10, int(50 * scale))
nyz = max(6, int(30 * scale))

pos = _lattice(
    (nx, nyz, nx), cell_width, (-nx * cell_width / 4, 14.0, -nx * cell_width / 4)
)
n = len(pos)
particles = Particles.from_arrays(pos, density=1000.0, radius=cell_width / 4)
elast = ElasticCoefficients.from_young_modulus(1e7, 0.2)
models = Models.from_arrays(
    n, elast.lam, elast.mu, phase=1.0, max_stretch=1.3
)

def blade(cx, angle, half_len, height=6.0):
    v = np.array(
        [
            [-half_len, 0, 0], [half_len, 0, 0],
            [half_len, height, 0], [-half_len, height, 0],
        ],
        np.float32,
    )
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    v = v @ rot.T + np.array([cx, 2.0, 0.0], np.float32)
    t = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return Collider.trimesh(v, t)

extent = nx * cell_width
bodies = [
    RigidBodyDesc(Collider.cuboid(extent * 3, 1.0, extent * 3), (0, -1.0, 0)),
    RigidBodyDesc(blade(-extent / 4, 0.4, extent), (0.0, 0.0, 0.0)),
    RigidBodyDesc(blade(0.0, -0.3, extent), (0.0, 0.0, 0.0)),
    RigidBodyDesc(blade(extent / 4, 0.1, extent), (0.0, 0.0, 0.0)),
]
params = SimulationParams.new(
    dt=(1 / 60) / 20, gravity=[0.0, -9.81 * 4.0, 0.0]
)
data = MpmData(
    params, particles, models, bodies, cell_width,
    grid_bounds=(
        np.array([-extent, -2.0, -extent]), np.array([extent, 25.0, extent])
    ),    **transfer_kw(),
)
print(
    f"elastic_cut3: {data.num_particles} particles, "
    f"{data.state.meshes.count} rigid samples"
)
tb = run_example(data, num_substeps=20, frames=int(os.environ.get("FRAMES", 40)),
                 name="elastic_cut3")
import numpy as _np  # noqa: E402

phase = _np.asarray(tb.data.state.models.phase)
print(f"fractured particles: {(phase == 0).mean() * 100:.1f}%")
