"""Simulation parameters (uniform-buffer equivalent).

Parity: /root/reference/src/solver/params.rs:6-16 (SimulationParams{gravity, dt}).
On TPU this is just a tiny pytree passed into the jitted step.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class SimulationParams:
    dt: jnp.ndarray  # scalar f32
    gravity: jnp.ndarray  # [d] f32

    @staticmethod
    def new(dt: float, gravity) -> "SimulationParams":
        return SimulationParams(
            dt=jnp.float32(dt), gravity=jnp.asarray(gravity, jnp.float32)
        )
