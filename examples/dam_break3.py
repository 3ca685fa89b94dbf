"""3D mixed-material dam break (BASELINE config 3): a fluid column (weakly
compressible: corotated model with mu = 0 leaves only the lambda J (J-1)
pressure term) collapsing against an elastic block, in a box.
"""

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

scale = float(os.environ.get("SCALE", 0.5))
h = 1.0
nf = max(8, int(40 * scale))          # fluid column
ne = max(6, int(20 * scale))          # elastic block

fluid_pos = _lattice((nf, 2 * nf, nf), h, (-nf * h / 2, 0.5, -nf * h / 2))
elast_pos = _lattice(
    (ne, ne, ne), h, (nf * h / 2 + 2.0, 0.5, -ne * h / 4)
)
pos = np.concatenate([fluid_pos, elast_pos])
n = len(pos)
nfp = len(fluid_pos)
particles = Particles.from_arrays(pos, density=1000.0, radius=h / 4)

# Fluid: mu = 0 (pure pressure); elastic block: E=1e6.
lam = np.empty(n, np.float32)
mu = np.empty(n, np.float32)
fl = ElasticCoefficients.from_young_modulus(1e6, 0.499)   # stiff pressure
el = ElasticCoefficients.from_young_modulus(1e6, 0.2)
lam[:nfp], mu[:nfp] = fl.lam, 0.0
lam[nfp:], mu[nfp:] = el.lam, el.mu
models = Models.from_arrays(n, lam, mu, phase=1.0)

half = nf * h * 1.2
bodies = [
    RigidBodyDesc(Collider.cuboid(half * 3, 1.0, half * 3), (0, -1.0, 0)),
    RigidBodyDesc(Collider.cuboid(0.5, half, half * 2), (-half, half, 0)),
    RigidBodyDesc(Collider.cuboid(0.5, half, half * 2), (half * 1.8, half, 0)),
    RigidBodyDesc(Collider.cuboid(half * 2, half, 0.5), (0, half, -half)),
    RigidBodyDesc(Collider.cuboid(half * 2, half, 0.5), (0, half, half)),
]
params = SimulationParams.new(dt=(1 / 60) / 20, gravity=[0.0, -9.81, 0.0])
data = MpmData(
    params, particles, models, bodies, h,
    grid_bounds=(
        np.array([-half - 2, -2.0, -half - 2]),
        np.array([half * 2 + 2, 2.2 * nf * h + 4, half + 2]),
    ),
    # by=8 group=1024 measured +29% on this mixed-model scene at ~256k
    # (round 4: 38.2 vs 29.6 steps/s): by=4 jobs run half-empty once the
    # fluid spreads; the tall anisotropic blocks pack 4x the particles.
    by=int(os.environ.get("BY", 8)),
    **{k: (int(os.environ.get("GROUP", 1024)) if k == "group" else v)
       for k, v in transfer_kw().items()},
)
print(f"dam_break3: {n} particles ({nfp} fluid + {n - nfp} elastic), "
      f"grid {data.config.grid.shape}")
run_example(data, num_substeps=20, frames=int(os.environ.get("FRAMES", 40)),
            name="dam_break3")
