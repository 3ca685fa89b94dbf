"""Headless testbed: the app harness around the pipeline.

Equivalent of the reference's Bevy testbed layer (src_testbed/lib.rs:49-190:
AppState {run state, substeps, gravity factor}, PhysicsContext, SceneInits,
step loop) — rebuilt as a headless driver suited to TPU hosts: no window, a
frame loop with callbacks, live-adjustable substeps/gravity, per-frame
stats, optional point-cloud dumps, and checkpoint/restart.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from wgsparkl_tpu import render
from wgsparkl_tpu.params import SimulationParams
from wgsparkl_tpu.pipeline import MpmData, step
from wgsparkl_tpu.utils import checkpoint


@dataclasses.dataclass
class RunState:
    """AppState equivalent (src_testbed/lib.rs:90-131)."""

    running: bool = True
    num_substeps: int = 0          # 0 = use the scene default
    gravity_factor: float = 1.0
    render_mode: str = "default"


class SceneInits:
    """Scene registry (src_testbed/lib.rs:170-190)."""

    def __init__(self, scenes: Dict[str, Callable[[], MpmData]]):
        self.scenes = dict(scenes)

    def names(self):
        return list(self.scenes)

    def build(self, name: str) -> MpmData:
        return self.scenes[name]()


class Testbed:
    def __init__(
        self,
        data: MpmData,
        num_substeps: int,
        on_frame: Optional[Callable] = None,
    ):
        self.data = data
        self.run_state = RunState(num_substeps=num_substeps)
        self.on_frame = on_frame
        self.frame = 0
        self._steppers = {}
        self.frame_ms: list[float] = []

    def _stepper(self, substeps: int):
        key = (self.data.config, substeps)
        if key not in self._steppers:
            cfg = self.data.config
            self._steppers[key] = jax.jit(
                lambda s, p: step(s, p, cfg, num_substeps=substeps),
                donate_argnums=0,
            )
        return self._steppers[key]

    def params(self) -> SimulationParams:
        base = self.data.params
        gf = self.run_state.gravity_factor
        return SimulationParams(dt=base.dt, gravity=base.gravity * gf)

    def step_frame(self):
        """One 1/60 s frame = num_substeps substeps in a single device call
        (the reference re-encodes per substep; here it is one launch)."""
        if not self.run_state.running:
            return
        t0 = time.perf_counter()
        stepper = self._stepper(self.run_state.num_substeps)
        self.data.state = stepper(self.data.state, self.params())
        jax.block_until_ready(self.data.state.particles.pos)
        self.frame_ms.append((time.perf_counter() - t0) * 1e3)
        self.frame += 1
        if self.on_frame is not None:
            self.on_frame(self)

    def run(self, frames: int, dump_ply_every: Optional[int] = None,
            dump_dir: str = "/tmp/wgsparkl_frames"):
        import os

        if dump_ply_every:
            os.makedirs(dump_dir, exist_ok=True)
        for _ in range(frames):
            self.step_frame()
            if dump_ply_every and self.frame % dump_ply_every == 0:
                inst = render.prep_instances(
                    self.data.state.particles,
                    mode=render.MODES[self.run_state.render_mode],
                    cell_width=self.data.config.grid.cell_width,
                )
                # Rigid colliders ride the same cloud at their CURRENT poses
                # (rigid_graphics.rs / prep_vertex_buffer main_rigid_particles
                # role), in a fixed gray.
                bodies = self.data.state.bodies
                cpts = render.collider_surface_points(
                    self.data.bodies_desc, np.asarray(bodies.rot),
                    np.asarray(bodies.pos),
                    spacing=0.7 * self.data.config.grid.cell_width,
                )
                if len(cpts):
                    inst = {
                        "position": np.concatenate(
                            [np.asarray(inst["position"]), cpts]
                        ),
                        "color": np.concatenate([
                            np.asarray(inst["color"]),
                            np.full((len(cpts), 3), 0.55, np.float32),
                        ]),
                    }
                render.write_ply(
                    f"{dump_dir}/frame_{self.frame:05d}.ply", inst,
                    max_points=200_000 + len(cpts),
                )
        return self.stats()

    def stats(self) -> dict:
        p = np.asarray(self.data.state.particles.pos)
        ms = np.asarray(self.frame_ms[1:] or self.frame_ms)
        return {
            "frames": self.frame,
            "particles": self.data.num_particles,
            "frame_ms_mean": float(ms.mean()) if len(ms) else None,
            "steps_per_s": (
                1e3 / ms.mean() * self.run_state.num_substeps if len(ms) else None
            ),
            "pos_min": p.min(0).tolist(),
            "pos_max": p.max(0).tolist(),
            "finite": bool(np.isfinite(p).all()),
        }

    def save_checkpoint(self, path: str):
        checkpoint.save(
            path, self.data.state,
            extra={"frame": self.frame, "substeps": self.run_state.num_substeps},
        )

    def load_checkpoint(self, path: str):
        self.data.state, extra = checkpoint.load(path, self.data.state)
        self.frame = int(extra.get("frame", 0))
