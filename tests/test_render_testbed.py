"""Render-prep modes + headless testbed loop."""

import numpy as np

from wgsparkl_tpu import render, scenes
from wgsparkl_tpu.testbed import SceneInits, Testbed


def test_render_modes_and_ply(tmp_path):
    data = scenes.sand_box_3d(nxz=4, ny=8, cell_width=1.0)
    for name, mode in render.MODES.items():
        inst = render.prep_instances(
            data.state.particles, mode=mode, cell_width=1.0
        )
        col = np.asarray(inst["color"])
        assert col.shape == (data.num_particles, 3)
        assert np.isfinite(col).all() and col.min() >= 0.0
    path = str(tmp_path / "frame.ply")
    render.write_ply(path, inst, max_points=50)
    head = open(path).read().splitlines()
    assert head[0] == "ply" and "element vertex 50" in "\n".join(head[:5])


def test_testbed_frame_loop():
    inits = SceneInits({"tiny": lambda: scenes.sand_box_3d(nxz=4, ny=8)})
    assert inits.names() == ["tiny"]
    tb = Testbed(inits.build("tiny"), num_substeps=2)
    stats = tb.run(3)
    assert stats["frames"] == 3 and stats["finite"]
    # Live parameter change (ui.rs:63-104 equivalent).
    tb.run_state.gravity_factor = 0.0
    tb.step_frame()
    assert tb.frame == 4
