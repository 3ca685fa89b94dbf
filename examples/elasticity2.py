"""2D elastic columns (reference elasticity2.rs:20-103; 490k at full scale)."""

import os

from common import run_example, transfer_kw

scale = float(os.environ.get("SCALE", 0.2))

from wgsparkl_tpu import scenes  # noqa: E402

n = max(32, int(700 * scale))
data = scenes.elastic_blocks_2d(n_side=n, num_substeps=15, **transfer_kw())
print(f"elasticity2: {data.num_particles} particles, grid {data.config.grid.shape}")
run_example(data, num_substeps=15, frames=int(os.environ.get("FRAMES", 60)),
            name="elasticity2")
