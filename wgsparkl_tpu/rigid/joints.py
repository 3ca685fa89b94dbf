"""Joints between rigid bodies: ball, fixed, revolute.

The reference gets joints for free from rapier on the CPU side
(/root/reference/src_testbed/step.rs:201-217 steps a full
PhysicsPipeline; no in-repo demo uses joints, but the capability is part
of the rapier surface SURVEY.md 2.4-5 asks for).  TPU-native stand-in:
velocity-level sequential impulses with a Baumgarte bias on the anchor
gap, solved with the exact per-joint effective-mass matrix (2x2 in 2D,
3x3 in 3D, closed-form inverse) and Gauss-Seidel sweeps shared with the
contact pass style (rigid/contacts.py).

Every joint constrains the world velocity of an anchor fixed on body b
to equal the anchor velocity on body c.  Kinds add angular constraints:
  * ball      — rotation fully free (point-to-point);
  * fixed     — relative rotation locked to its initial value (weld);
  * revolute  — rotation free only about a hinge axis (3D; in 2D it is
                the same as ball, the only free rotation there IS the
                hinge);
  * prismatic — slider: relative rotation locked (like fixed) and the
                anchor free to translate ONLY along an axis fixed in
                body b's local frame (both dims).
Bodies with zero inverse mass (static/kinematic) are valid anchors —
their velocity field is prescribed.

Joint descriptions are STATIC config (MpmConfig.joints), normalized by
MpmData to (slot_b, slot_c, local_anchor_b, local_anchor_c, kind, extra)
where extra is the initial relative rotation (fixed: 2D unit complex /
3D quaternion of q_b^-1 q_c at build), the hinge axis in both local
frames (revolute), or (slide axis in b's local frame, initial relative
rotation) for prismatic.  Raw 4-tuples are accepted as ball joints.
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


def _ang_residual(bodies, dim, b, c, kind, extra, w_b, w_c, dt, beta):
    """(residual r, tangent basis or None) of the angular constraint.

    fixed: r = (w_c - w_b) + (beta/dt) * err_world, err_world the
    small-angle rotation vector taking the TARGET relative rotation to
    the ACTUAL one, expressed in world frame — driving c's angular
    velocity down when it runs ahead of b.
    revolute (3D): the same restricted to the plane perpendicular to the
    world hinge axis, with the bias pulling c's axis back onto b's."""
    from wgsparkl_tpu.math.pose import (
        quat_conj, quat_mul, quat_rotate, rot2_mul,
    )

    if dim == 2:
        # fixed only (revolute == ball in 2D): scalar relative angle.
        rb, rc = bodies.rot[b], bodies.rot[c]
        rel = rot2_mul(jnp.stack([rb[0], -rb[1]]), rc)      # rot_b^-1 rot_c
        rel0 = jnp.asarray(extra, jnp.float32)
        e = rot2_mul(rel, jnp.stack([rel0[0], -rel0[1]]))   # actual vs target
        err = e[1]                                          # ~ sin(d_angle)
        return (w_c - w_b) + (beta / dt) * err[None], None
    qb, qc = bodies.rot[b], bodies.rot[c]
    if kind == "fixed":
        rel0 = jnp.asarray(extra, jnp.float32)
        q_rel = quat_mul(quat_conj(qb), qc)
        q_err = quat_mul(q_rel, quat_conj(rel0))            # b-local error
        v = 2.0 * jnp.sign(q_err[0]) * q_err[1:4]           # small-angle vec
        err_world = quat_rotate(qb, v)
        return (w_c - w_b) + (beta / dt) * err_world, None
    # revolute: axis in each body's local frame (captured at build).
    ax_b, ax_c = extra
    a_b = quat_rotate(qb, jnp.asarray(ax_b, jnp.float32))
    a_c = quat_rotate(qc, jnp.asarray(ax_c, jnp.float32))
    # Tangent basis perpendicular to the (b) hinge axis.
    h = jnp.where(jnp.abs(a_b[0]) < 0.9,
                  jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                  jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    t1 = jnp.cross(a_b, h)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(a_b, t1)
    # Desired w_c - w_b rotates a_c onto a_b: along (a_c x a_b).
    err = -jnp.cross(a_c, a_b)                              # residual bias
    r3 = (w_c - w_b) + (beta / dt) * err
    return jnp.stack([jnp.dot(t1, r3), jnp.dot(t2, r3)]), (t1, t2)


def _apply_angular(bodies, dim, b, c, kind, extra, angvel, dt, beta):
    """One Gauss-Seidel angular-constraint impulse for fixed/revolute."""
    dyn_b = bodies.inv_mass[b] != 0.0
    dyn_c = bodies.inv_mass[c] != 0.0
    w_b = jnp.where(dyn_b, angvel[b], bodies.angvel[b])
    w_c = jnp.where(dyn_c, angvel[c], bodies.angvel[c])
    ii_b, ii_c = bodies.inv_inertia_world[b], bodies.inv_inertia_world[c]
    r, basis = _ang_residual(
        bodies, dim, b, c, kind, extra, w_b, w_c, dt, beta
    )
    if dim == 2:
        k = ii_b[0, 0] + ii_c[0, 0]
        p = -jnp.where(k > 1e-12, r / jnp.maximum(k, 1e-30), 0.0)
    elif basis is None:                      # 3D fixed: full 3x3 solve
        k = ii_b + ii_c
        p = -(_inv_mat(3, k) @ r)
    else:                                    # 3D revolute: 2x2 in (t1, t2)
        t1, t2 = basis
        ksum = ii_b + ii_c
        k2 = jnp.array(
            [[t1 @ ksum @ t1, t1 @ ksum @ t2],
             [t2 @ ksum @ t1, t2 @ ksum @ t2]], jnp.float32
        )
        p2 = -(_inv_mat(2, k2) @ r)
        p = p2[0] * t1 + p2[1] * t2
    angvel = angvel.at[c].add(jnp.where(dyn_c, ii_c @ p, 0.0))
    angvel = angvel.at[b].add(jnp.where(dyn_b, -(ii_b @ p), 0.0))
    return angvel


def resolve_joints(bodies, joints, linvel, angvel, dt,
                   beta: float = JOINT_BETA,
                   iterations: int = JOINT_ITERATIONS):
    """Sequential-impulse joint pass.  Returns updated (linvel, angvel).

    bodies: RigidWorld with fresh world_com / inv_inertia_world and the
    CURRENT (already integrated) poses; linvel/angvel: velocities to
    correct for the next substep.
    """
    if not joints:
        return linvel, angvel
    dim = bodies.dim

    for _ in range(iterations):
        for joint in joints:
            b, c, la_b, la_c = joint[:4]
            kind = joint[4] if len(joint) > 4 else "ball"
            extra = joint[5] if len(joint) > 5 else None
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
            if kind == "prismatic":
                # Impulse restricted to the plane (3D) / line (2D)
                # perpendicular to the world slide axis: motion along the
                # axis stays free, everything else is driven to zero.
                a_w = pose_math.rotate(
                    bodies.rot[b], jnp.asarray(extra[0], jnp.float32)
                )
                if dim == 2:
                    t1 = jnp.stack([-a_w[1], a_w[0]])
                    k1 = t1 @ (k @ t1)
                    p1 = -jnp.where(
                        k1 > 1e-12,
                        (t1 @ v_err) / jnp.maximum(k1, 1e-30),
                        0.0,
                    )
                    imp = p1 * t1
                else:
                    h = jnp.where(
                        jnp.abs(a_w[0]) < 0.9,
                        jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                        jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                    )
                    t1 = jnp.cross(a_w, h)
                    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
                    t2 = jnp.cross(a_w, t1)
                    k2 = jnp.array(
                        [[t1 @ k @ t1, t1 @ k @ t2],
                         [t2 @ k @ t1, t2 @ k @ t2]], jnp.float32
                    )
                    p2 = -(_inv_mat(2, k2) @ jnp.stack(
                        [t1 @ v_err, t2 @ v_err]
                    ))
                    imp = p2[0] * t1 + p2[1] * t2
            else:
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
            if kind == "fixed" or (kind == "revolute" and dim == 3):
                angvel = _apply_angular(
                    bodies, dim, b, c, kind, extra, angvel, dt, beta
                )
            elif kind == "prismatic":
                # Slider locks relative rotation: reuse the weld solve
                # against the captured initial relative rotation.
                angvel = _apply_angular(
                    bodies, dim, b, c, "fixed", extra[1], angvel, dt, beta
                )
    return linvel, angvel
