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


def collider_surface_points(descs, rot, pos, spacing: float,
                            max_points: int = 30_000):
    """World-space surface sample points for every collider, for rendering.

    The reference draws rigid colliders two ways: mesh prefabs synced to
    body poses (src_testbed/rigid_graphics.rs:36-614) and rigid sample
    points as fixed 0.4-scale cubes (prep_vertex_buffer3d.wgsl:94-109).
    Headless equivalent: procedural surface samples per analytic shape +
    mesh vertices, posed with the CURRENT body rotation/translation, drawn
    into the same point cloud as the particles.

    descs: RigidBodyDesc sequence; rot/pos: current pose arrays (numpy ok).
    Returns [K, d] world points (K = 0 if no colliders)."""
    from wgsparkl_tpu.collision import shapes as shp
    from wgsparkl_tpu.rigid import sampling

    rot = np.asarray(rot)
    pos = np.asarray(pos)
    d = pos.shape[1] if len(descs) else 3
    out = []

    def _grid2(ha, hb, sp):
        na = max(int(np.ceil(2 * ha / sp)), 1)
        nb = max(int(np.ceil(2 * hb / sp)), 1)
        u = np.linspace(-ha, ha, na + 1)
        v = np.linspace(-hb, hb, nb + 1)
        uu, vv = np.meshgrid(u, v, indexing="ij")
        return uu.reshape(-1), vv.reshape(-1)

    for i, desc in enumerate(descs):
        c = desc.collider
        t = c.shape_type
        if t == shp.SHAPE_CUBOID:
            he = list(c.params) + [0.0] * (3 - len(c.params))
            faces = []
            if d == 2:
                for sgn in (-1.0, 1.0):
                    u = np.linspace(-he[0], he[0],
                                    max(int(2 * he[0] / spacing), 1) + 1)
                    faces.append(np.stack([u, np.full_like(u, sgn * he[1])], -1))
                    v = np.linspace(-he[1], he[1],
                                    max(int(2 * he[1] / spacing), 1) + 1)
                    faces.append(np.stack([np.full_like(v, sgn * he[0]), v], -1))
            else:
                for ax in range(3):
                    a1, a2 = [k for k in range(3) if k != ax]
                    uu, vv = _grid2(he[a1], he[a2], spacing)
                    for sgn in (-1.0, 1.0):
                        f = np.zeros((len(uu), 3), np.float64)
                        f[:, ax] = sgn * he[ax]
                        f[:, a1] = uu
                        f[:, a2] = vv
                        faces.append(f)
            local = np.concatenate(faces, axis=0)
        elif t == shp.SHAPE_BALL:
            r = c.params[0]
            n = max(int(4 * np.pi * r * r / (spacing * spacing)), 16)
            if d == 2:
                a = np.linspace(0, 2 * np.pi, n, endpoint=False)
                local = r * np.stack([np.cos(a), np.sin(a)], -1)
            else:
                k = np.arange(n) + 0.5
                phi = np.arccos(1 - 2 * k / n)
                th = np.pi * (1 + 5 ** 0.5) * k
                local = r * np.stack(
                    [np.sin(phi) * np.cos(th), np.cos(phi),
                     np.sin(phi) * np.sin(th)], -1)
        elif t == shp.SHAPE_CAPSULE:
            hh, r = c.params[0], c.params[1]
            n = max(int(2 * np.pi * r / spacing), 8)
            m = max(int(2 * hh / spacing), 1) + 1
            if d == 2:
                a = np.linspace(0, 2 * np.pi, n, endpoint=False)
                ring = r * np.stack([np.cos(a), np.sin(a)], -1)
                local = np.concatenate([
                    ring + np.array([0.0, hh]), ring + np.array([0.0, -hh]),
                    np.stack([np.full(m, r), np.linspace(-hh, hh, m)], -1),
                    np.stack([np.full(m, -r), np.linspace(-hh, hh, m)], -1),
                ])
            else:
                a = np.linspace(0, 2 * np.pi, n, endpoint=False)
                ys = np.linspace(-hh, hh, m)
                cyl = np.stack([
                    np.repeat(np.cos(a), m) * r,
                    np.tile(ys, n),
                    np.repeat(np.sin(a), m) * r,
                ], -1)
                k = np.arange(n) + 0.5
                phi = np.arccos(1 - 2 * k / n)
                th = np.pi * (1 + 5 ** 0.5) * k
                sph = r * np.stack(
                    [np.sin(phi) * np.cos(th), np.cos(phi),
                     np.sin(phi) * np.sin(th)], -1)
                caps = np.concatenate([
                    sph[sph[:, 1] >= 0] + np.array([0.0, hh, 0.0]),
                    sph[sph[:, 1] < 0] + np.array([0.0, -hh, 0.0]),
                ])
                local = np.concatenate([cyl, caps])
        elif t == shp.SHAPE_HALFSPACE:
            ext = 24 * spacing
            if d == 2:
                u = np.linspace(-ext, ext, 49)
                local = np.stack([u, np.zeros_like(u)], -1)
            else:
                uu, vv = _grid2(ext, ext, 2 * spacing)
                local = np.stack([uu, np.zeros_like(uu), vv], -1)
        elif c.vertices is not None:
            local = np.asarray(c.vertices, np.float64)
        else:
            continue
        local = local[:, :d]
        # pose: rotate + translate (quat wxyz in 3D, cos/sin in 2D).
        ri = rot[i]
        if d == 3:
            w, x, y, z = ri
            rm = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ])
        else:
            cth, sth = ri
            rm = np.array([[cth, -sth], [sth, cth]])
        out.append(local @ rm.T + pos[i][None, :])
    if not out:
        return np.zeros((0, d), np.float32)
    pts = np.concatenate(out, axis=0).astype(np.float32)
    if len(pts) > max_points:
        sel = np.linspace(0, len(pts) - 1, max_points).astype(np.int64)
        pts = pts[sel]
    return pts
