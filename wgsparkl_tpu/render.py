"""Render-prep: per-particle instance data + debug color modes.

Equivalent of the reference's prep_vertex_buffer compute pass
(/root/reference/src_testbed/prep_vertex_buffer.rs:11-43,
prep_vertex_buffer3d.wgsl:40-109): produces, per particle, the deformation
matrix (particles draw as sheared boxes), position, and a color for the
selected debug mode.  Output is a dict of arrays any point renderer can
consume (the examples ship a matplotlib/PLY writer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MODE_DEFAULT = 0
MODE_VOLUME = 1
MODE_VELOCITY = 2
MODE_CDF_NORMALS = 3
MODE_CDF_DISTANCES = 4
MODE_CDF_SIGNS = 5

MODES = {
    "default": MODE_DEFAULT,
    "volume": MODE_VOLUME,
    "velocity": MODE_VELOCITY,
    "cdf_normals": MODE_CDF_NORMALS,
    "cdf_distances": MODE_CDF_DISTANCES,
    "cdf_signs": MODE_CDF_SIGNS,
}


def _hsv_ramp(t):
    """Simple blue->green->red ramp for scalars in [0, 1]."""
    t = jnp.clip(t, 0.0, 1.0)
    r = jnp.clip(2.0 * t - 1.0, 0.0, 1.0)
    g = 1.0 - jnp.abs(2.0 * t - 1.0)
    b = jnp.clip(1.0 - 2.0 * t, 0.0, 1.0)
    return jnp.stack([r, g, b], axis=-1)


def prep_instances(particles, base_color=(0.3, 0.5, 0.9), mode: int = MODE_DEFAULT,
                   cell_width: float = 1.0):
    """Instance buffer: dict(position, deformation, color, scale).

    deformation = def_grad so renderers can draw sheared boxes exactly like
    instancing3d.wgsl:24-45 does with its per-instance matrix.
    """
    p = particles
    n, d = p.pos.shape
    base = jnp.broadcast_to(jnp.asarray(base_color, jnp.float32), (n, 3))

    if mode == MODE_DEFAULT:
        color = base
    elif mode == MODE_VOLUME:
        j = jnp.linalg.det(p.def_grad)
        color = _hsv_ramp((j - 0.5) / 1.0)
    elif mode == MODE_VELOCITY:
        speed = jnp.linalg.norm(p.vel, axis=-1)
        color = _hsv_ramp(speed / (jnp.max(speed) + 1e-6))
    elif mode == MODE_CDF_NORMALS:
        nrm = p.cdf_normal
        if d == 2:
            nrm = jnp.concatenate([nrm, jnp.zeros((n, 1))], axis=-1)
        color = nrm * 0.5 + 0.5
    elif mode == MODE_CDF_DISTANCES:
        sd = p.cdf_signed_distance / (1.5 * cell_width)
        color = jnp.where(
            (sd != 0.0)[:, None],
            _hsv_ramp(sd * 0.5 + 0.5),
            base,
        )
    elif mode == MODE_CDF_SIGNS:
        sd = p.cdf_signed_distance
        red = jnp.asarray([1.0, 0.1, 0.1])
        green = jnp.asarray([0.1, 1.0, 0.1])
        grey = jnp.asarray([0.5, 0.5, 0.5])
        color = jnp.where(
            (sd < 0)[:, None], red, jnp.where((sd > 0)[:, None], green, grey)
        )
        color = jnp.broadcast_to(color, (n, 3))
    else:
        raise ValueError(f"unknown render mode {mode}")

    return {
        "position": p.pos,
        "deformation": p.def_grad,
        "color": color,
        "scale": p.init_radius,
    }


def write_ply(path: str, instances, max_points: int | None = None) -> None:
    """Dump an instance buffer as a colored point cloud (.ply, ascii)."""
    pos = np.asarray(instances["position"])
    col = np.clip(np.asarray(instances["color"]) * 255, 0, 255).astype(np.uint8)
    if pos.shape[1] == 2:
        pos = np.concatenate([pos, np.zeros((len(pos), 1), pos.dtype)], axis=1)
    if max_points is not None and len(pos) > max_points:
        sel = np.linspace(0, len(pos) - 1, max_points).astype(np.int64)
        pos, col = pos[sel], col[sel]
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pos)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for (x, y, z), (r, g, b) in zip(pos, col):
            f.write(f"{x:.5f} {y:.5f} {z:.5f} {r} {g} {b}\n")
