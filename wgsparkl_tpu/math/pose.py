"""Batched rigid poses: unit-quaternion (3D) / complex-angle (2D) + translation.

TPU-native replacement for the wgebra ``sim2``/``sim3`` WGSL pose types used
by the reference's rigid kernels (``/root/reference/src/solver/
rigid_particle_update.wgsl:4-8``, ``rigid_impulses.wgsl:7-11``).  All ops are
elementwise over a leading batch axis (SoA over bodies).

Rotation storage:
  3D: quaternion [..., 4] ordered (w, x, y, z)
  2D: unit complex [..., 2] ordered (cos, sin)
Translation: [..., d].
"""

import jax.numpy as jnp


# ---------------------------------------------------------------- quaternions
def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros((*shape, 4), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_mul(q1, q2):
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors v [..., 3] by quaternions q [..., 4]."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_inv_rotate(q, v):
    return quat_rotate(quat_conj(q), v)


def quat_from_axis_angle(axis, angle):
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
    )


def quat_from_scaled_axis(w):
    """exp map: rotation vector [..., 3] -> quaternion (stable near 0)."""
    angle = jnp.linalg.norm(w, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-8
    sinc = jnp.where(small, 0.5, jnp.sin(half) / jnp.where(small, 1.0, angle))
    return quat_normalize(
        jnp.concatenate([jnp.cos(half), w * sinc], axis=-1)
    )


def quat_to_matrix(q):
    w, x, y, z = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


# ------------------------------------------------------------ 2D unit complex
def rot2_identity(shape=(), dtype=jnp.float32):
    r = jnp.zeros((*shape, 2), dtype=dtype)
    return r.at[..., 0].set(1.0)


def rot2_from_angle(angle):
    return jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1)


def rot2_mul(r1, r2):
    c1, s1 = r1[..., 0], r1[..., 1]
    c2, s2 = r2[..., 0], r2[..., 1]
    return jnp.stack([c1 * c2 - s1 * s2, c1 * s2 + s1 * c2], axis=-1)


def rot2_rotate(r, v):
    c, s = r[..., :1], r[..., 1:2]
    x, y = v[..., :1], v[..., 1:2]
    return jnp.concatenate([c * x - s * y, s * x + c * y], axis=-1)


def rot2_inv_rotate(r, v):
    conj = jnp.stack([r[..., 0], -r[..., 1]], axis=-1)
    return rot2_rotate(conj, v)


def rot2_normalize(r):
    return r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), 1e-12)


# ------------------------------------------------------- dim-generic pose ops
def rot_identity(dim, shape=(), dtype=jnp.float32):
    return quat_identity(shape, dtype) if dim == 3 else rot2_identity(shape, dtype)


def rotate(rot, v):
    """Apply batched rotation (quat [...,4] or unit complex [...,2]) to v [...,d]."""
    if v.shape[-1] == 3:
        return quat_rotate(rot, v)
    return rot2_rotate(rot, v)


def inv_rotate(rot, v):
    if v.shape[-1] == 3:
        return quat_inv_rotate(rot, v)
    return rot2_inv_rotate(rot, v)


def transform_point(rot, trans, p):
    """pose * p (mirrors wgebra sim2/sim3 ``mulPt``)."""
    return rotate(rot, p) + trans


def inv_transform_point(rot, trans, p):
    return inv_rotate(rot, p - trans)
