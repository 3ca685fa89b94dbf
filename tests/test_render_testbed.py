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


def test_viewer_renders_and_roundtrips(tmp_path):
    """Offline viewer (viewer.py): PLY roundtrip, rasterization, turntable
    GIF — the instancing3d.rs role, headless."""
    from wgsparkl_tpu import render, viewer

    data = scenes.sand_box_3d(nxz=4, ny=8)
    inst = render.prep_instances(data.state.particles)
    ply = str(tmp_path / "f.ply")
    render.write_ply(ply, inst)
    pos, col = viewer.read_ply(ply)
    assert pos.shape[1] == 3 and col.shape == pos.shape
    np.testing.assert_allclose(
        np.sort(pos[:, 1]), np.sort(np.asarray(inst["position"])[:, 1]),
        atol=1e-3,
    )

    img = viewer.render_instances(inst, width=320, height=240)
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    # particles must actually rasterize (image differs from background)
    assert (img != img[0, 0]).any()

    out = str(tmp_path / "tt.gif")
    viewer.turntable(pos, col, 0.25, out, n_frames=3, width=160, height=120)
    import os

    assert os.path.getsize(out) > 500

    # frame-sequence mode
    render.write_ply(str(tmp_path / "frame_00001.ply"), inst)
    render.write_ply(str(tmp_path / "frame_00002.ply"), inst)
    viewer.main([str(tmp_path), "--out", str(tmp_path / "seq.gif"),
                 "--width", "160", "--height", "120"])
    assert os.path.getsize(str(tmp_path / "seq.gif")) > 500
