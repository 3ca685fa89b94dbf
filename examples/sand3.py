"""3D sand in a box with a spinning paddle (reference sand3.rs:20-113).

Scale down with SCALE env (default small for quick runs; reference scale is
nxz=45, ny=100 = 202.5k particles at 20 substeps).
"""

import os

from common import run_example, transfer_kw

scale = float(os.environ.get("SCALE", 0.4))

from wgsparkl_tpu import scenes  # noqa: E402

nxz = max(8, int(45 * scale))
ny = max(16, int(100 * scale))
data = scenes.sand_box_3d(nxz=nxz, ny=ny, cell_width=1.0, num_substeps=20,
                          **transfer_kw())
print(f"sand3: {data.num_particles} particles, grid {data.config.grid.shape}")
run_example(data, num_substeps=20, frames=int(os.environ.get("FRAMES", 60)),
            dump_ply_every=int(os.environ.get("PLY_EVERY", 0)) or None,
            name="sand3")
