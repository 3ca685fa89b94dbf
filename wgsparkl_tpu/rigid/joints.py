"""Point-to-point (spherical / revolute-style) joints between rigid bodies.

The reference gets joints for free from rapier on the CPU side
(/root/reference/src_testbed/step.rs:201-217 steps a full
PhysicsPipeline; no in-repo demo uses joints, but the capability is part
of the rapier surface SURVEY.md 2.4-5 asks for).  TPU-native stand-in:
velocity-level sequential impulses with a Baumgarte bias on the anchor
gap, solved with the exact per-joint effective-mass matrix (2x2 in 2D,
3x3 in 3D, closed-form inverse) and Gauss-Seidel sweeps shared with the
contact pass style (rigid/contacts.py).

A joint constrains the world velocity of an anchor fixed on body b to
equal the anchor velocity on body c (ball joint: all translation locked,
rotation free).  Bodies with zero inverse mass (static/kinematic) are
valid anchors — their velocity field is prescribed.

Joint descriptions are STATIC config (MpmConfig.joints): tuples
(slot_b, slot_c, local_anchor_b, local_anchor_c) with the anchors as
float tuples in each body's local frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from wgsparkl_tpu.math import pose as pose_math

JOINT_BETA = 0.2        # Baumgarte positional-correction factor
JOINT_ITERATIONS = 8    # Gauss-Seidel sweeps over all joints


def _skew_apply(dim, inv_i, r):
    """K_rot = -[r]x I^-1 [r]x as an explicit (dim, dim) matrix."""
    if dim == 2:
        # 2D: [r]x maps impulse P to scalar torque r x P = rx Py - ry Px;
        # angular velocity w adds w x r = (-w ry, w rx).
        ii = inv_i[0, 0]
        return ii * jnp.array(
            [[r[1] * r[1], -r[0] * r[1]], [-r[0] * r[1], r[0] * r[0]]],
            jnp.float32,
        )
    rx = jnp.array(
        [
            [0.0, -r[2], r[1]],
            [r[2], 0.0, -r[0]],
            [-r[1], r[0], 0.0],
        ],
        jnp.float32,
    )
    return -rx @ inv_i @ rx


def _inv_mat(dim, k):
    """Closed-form inverse of the (dim, dim) effective-mass matrix."""
    if dim == 2:
        det = k[0, 0] * k[1, 1] - k[0, 1] * k[1, 0]
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        return inv_det * jnp.array(
            [[k[1, 1], -k[0, 1]], [-k[1, 0], k[0, 0]]], jnp.float32
        )
    c = jnp.stack([
        jnp.cross(k[1], k[2]), jnp.cross(k[2], k[0]), jnp.cross(k[0], k[1]),
    ])
    det = jnp.dot(k[0], c[0])
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    return inv_det * c.T


def _ang_vel_at(dim, angvel, rel):
    if dim == 2:
        return jnp.stack([-angvel[0] * rel[1], angvel[0] * rel[0]])
    return jnp.cross(angvel, rel)


def _cross(dim, a, b):
    if dim == 2:
        return jnp.array([a[0] * b[1] - a[1] * b[0]], jnp.float32)
    return jnp.cross(a, b)


def resolve_joints(bodies, joints, linvel, angvel, dt,
                   beta: float = JOINT_BETA,
                   iterations: int = JOINT_ITERATIONS):
    """Sequential-impulse ball-joint pass.  Returns updated (linvel, angvel).

    bodies: RigidWorld with fresh world_com / inv_inertia_world and the
    CURRENT (already integrated) poses; linvel/angvel: velocities to
    correct for the next substep.
    """
    if not joints:
        return linvel, angvel
    dim = bodies.dim

    for _ in range(iterations):
        for (b, c, la_b, la_c) in joints:
            la_bv = jnp.asarray(la_b, jnp.float32)
            la_cv = jnp.asarray(la_c, jnp.float32)
            a_b = pose_math.transform_point(
                bodies.rot[b], bodies.pos[b], la_bv
            )
            a_c = pose_math.transform_point(
                bodies.rot[c], bodies.pos[c], la_cv
            )
            r_b = a_b - bodies.world_com[b]
            r_c = a_c - bodies.world_com[c]
            dyn_b = bodies.inv_mass[b] != 0.0
            dyn_c = bodies.inv_mass[c] != 0.0
            v_b = jnp.where(
                dyn_b,
                linvel[b] + _ang_vel_at(dim, angvel[b], r_b),
                bodies.linvel[b] + _ang_vel_at(dim, bodies.angvel[b], r_b),
            )
            v_c = jnp.where(
                dyn_c,
                linvel[c] + _ang_vel_at(dim, angvel[c], r_c),
                bodies.linvel[c] + _ang_vel_at(dim, bodies.angvel[c], r_c),
            )
            bias = (beta / dt) * (a_b - a_c)
            v_err = v_b - v_c + bias

            k = (bodies.inv_mass[b] + bodies.inv_mass[c]) * jnp.eye(
                dim, dtype=jnp.float32
            )
            k = k + _skew_apply(dim, bodies.inv_inertia_world[b], r_b)
            k = k + _skew_apply(dim, bodies.inv_inertia_world[c], r_c)
            imp = -(_inv_mat(dim, k) @ v_err)

            linvel = linvel.at[b].add(
                jnp.where(dyn_b, imp * bodies.inv_mass[b], 0.0)
            )
            angvel = angvel.at[b].add(jnp.where(
                dyn_b,
                bodies.inv_inertia_world[b] @ _cross(dim, r_b, imp),
                0.0,
            ))
            linvel = linvel.at[c].add(
                jnp.where(dyn_c, -imp * bodies.inv_mass[c], 0.0)
            )
            angvel = angvel.at[c].add(jnp.where(
                dyn_c,
                bodies.inv_inertia_world[c] @ _cross(dim, r_c, -imp),
                0.0,
            ))
    return linvel, angvel
