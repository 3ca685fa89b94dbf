"""2D elastic block cut by thin polyline blades over a sine-wave ground
(reference elastic_cut2.rs:20-123: 490k particles at full scale, 6 blades)."""

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

scale = float(os.environ.get("SCALE", 0.15))
cell_width = 0.2
n_side = max(48, int(700 * scale))

pos = _lattice((n_side, n_side), cell_width, (0.1, 30.0 * scale))
n = len(pos)
particles = Particles.from_arrays(pos, density=1000.0, radius=cell_width / 4)
elast = ElasticCoefficients.from_young_modulus(5e6, 0.2)
models = Models.from_arrays(n, elast.lam, elast.mu, phase=1.0, max_stretch=1.4)

extent = n_side * cell_width / 2

# Sine-wave ground polyline.
xs = np.linspace(-extent * 1.5, extent * 3.5, 64)
ground = np.stack([xs, 0.4 * np.sin(xs * 0.8)], axis=-1)

def blade(cx, top, length):
    return Collider.polyline(
        np.array([[cx, top], [cx + 0.15, top - length]], np.float32)
    )

bodies = [RigidBodyDesc(Collider.polyline(ground), (0.0, -0.5))]
for k in range(6):
    cx = extent * 0.2 + k * extent * 0.3
    bodies.append(
        RigidBodyDesc(blade(cx, 30.0 * scale * 0.6, extent * 0.5), (0.0, 0.0))
    )

params = SimulationParams.new(dt=(1 / 60) / 15, gravity=[0.0, -9.81 * 2])
data = MpmData(
    params, particles, models, bodies, cell_width,
    grid_bounds=(
        np.array([-extent * 1.5, -2.0]),
        np.array([extent * 3.5, 40.0 * scale + extent]),
    ),    **transfer_kw(),
)
print(
    f"elastic_cut2: {data.num_particles} particles, "
    f"{data.state.meshes.count} rigid samples"
)
tb = run_example(data, num_substeps=15, frames=int(os.environ.get("FRAMES", 40)),
                 name="elastic_cut2")
phase = np.asarray(tb.data.state.models.phase)
print(f"fractured: {(phase == 0).mean() * 100:.1f}%")
