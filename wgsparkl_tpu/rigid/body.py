"""On-device rigid-body state + the four coupling ops.

TPU-native equivalent of the wgrapier GpuBodySet surface the reference
consumes (SURVEY.md 2.4): ``velocity_at_point``, ``applyImpulse``,
``integrateVelocity``, ``updateMprops`` (used by p2g.wgsl:208,
rigid_impulses.wgsl:94-150).  Bodies are SoA over a fixed slot count
(<= 16, the CPIC affinity bitmask cap); static colliders are bodies with
inv_mass = 0, kinematic bodies have inv_mass = 0 but nonzero velocity.

Body-body contact resolution (rapier's job in the reference testbed,
src_testbed/step.rs:201-217) lives in rigid/contacts.py and is applied by
pipeline.rigid_bodies_update after impulse integration.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np

from wgsparkl_tpu.math import pose as pose_math


@flax.struct.dataclass
class BodyCoupling:
    """Static per-slot coupling mode flags (pipeline.rs:107-117 equivalent)."""

    two_way: jnp.ndarray  # [B] bool — dynamic bodies receiving impulses


@flax.struct.dataclass
class RigidWorld:
    """SoA rigid-body state; B = number of collider/body slots (<=16).

    3D: rot = quaternion [B,4] (w,x,y,z), angvel [B,3],
        inv_inertia_local [B,3,3] (inverse inertia tensor in body frame).
    2D: rot = unit complex [B,2] (cos,sin), angvel [B,1],
        inv_inertia_local [B,1,1].
    """

    rot: jnp.ndarray
    pos: jnp.ndarray            # [B, d] translation
    linvel: jnp.ndarray         # [B, d]
    angvel: jnp.ndarray         # [B, 3] or [B, 1]
    local_com: jnp.ndarray      # [B, d]
    world_com: jnp.ndarray      # [B, d] (refreshed by update_world_mass_properties)
    inv_mass: jnp.ndarray       # [B, d] per-axis (rapier-style translation locking)
    inv_inertia_local: jnp.ndarray
    inv_inertia_world: jnp.ndarray  # refreshed alongside world_com
    shape_params: jnp.ndarray   # [B, 8] collider shape params

    @property
    def dim(self) -> int:
        return self.pos.shape[-1]

    @property
    def count(self) -> int:
        return self.pos.shape[0]


def make_rigid_world(dim: int, count: int) -> RigidWorld:
    """All-static empty world with `count` slots."""
    ang = 3 if dim == 3 else 1
    return RigidWorld(
        rot=pose_math.rot_identity(dim, (count,)),
        pos=jnp.zeros((count, dim), jnp.float32),
        linvel=jnp.zeros((count, dim), jnp.float32),
        angvel=jnp.zeros((count, ang), jnp.float32),
        local_com=jnp.zeros((count, dim), jnp.float32),
        world_com=jnp.zeros((count, dim), jnp.float32),
        inv_mass=jnp.zeros((count, dim), jnp.float32),
        inv_inertia_local=jnp.zeros((count, ang, ang), jnp.float32),
        inv_inertia_world=jnp.zeros((count, ang, ang), jnp.float32),
        shape_params=jnp.zeros((count, 8), jnp.float32),
    )


# --------------------------------------------------------------- the four ops
def velocity_at_point(bodies: RigidWorld, idx, point):
    """Rigid velocity field sampled at world points.

    idx: [...] int body slot; point: [..., d].
    (wgrapier Body::velocity_at_point equivalent.)
    """
    lin = bodies.linvel[idx]
    ang = bodies.angvel[idx]
    rel = point - bodies.world_com[idx]
    if bodies.dim == 3:
        return lin + jnp.cross(ang, rel)
    omega = ang[..., 0]
    perp = jnp.stack([-rel[..., 1], rel[..., 0]], axis=-1)
    return lin + omega[..., None] * perp


def apply_impulse(bodies: RigidWorld, lin_impulse, ang_impulse):
    """New (linvel, angvel) after applying accumulated impulses at the COM.

    lin_impulse: [B, d]; ang_impulse: [B, 3] / [B, 1] (already lever-arm
    resolved, as accumulated by the P2G CPIC pass).
    """
    new_lin = bodies.linvel + lin_impulse * bodies.inv_mass
    new_ang = bodies.angvel + jnp.einsum(
        "bij,bj->bi", bodies.inv_inertia_world, ang_impulse
    )
    return new_lin, new_ang


def integrate_velocity(bodies: RigidWorld, linvel, angvel, dt):
    """Integrate poses: rotate about the world COM, translate by linvel.

    (wgrapier Body::integrateVelocity equivalent.)
    """
    com = bodies.world_com
    new_com = com + linvel * dt
    if bodies.dim == 3:
        dq = pose_math.quat_from_scaled_axis(angvel * dt)
        new_rot = pose_math.quat_normalize(pose_math.quat_mul(dq, bodies.rot))
    else:
        dr = pose_math.rot2_from_angle(angvel[..., 0] * dt)
        new_rot = pose_math.rot2_normalize(pose_math.rot2_mul(dr, bodies.rot))
    new_pos = new_com - pose_math.rotate(new_rot, bodies.local_com)
    # A body with exactly-zero velocity keeps its pose BIT-identical:
    # renormalizing the rotation and round-tripping pos through the world
    # COM ((rotate+pos) - rotate) each drift ~1 ULP per substep, which
    # breaks the frame-hoisted static-collider CDF's exact-equality
    # contract (step_pallas static_chan/static_cdf capture frame-start
    # poses; cfg.static_slots promises they stay constant all frame).
    still = jnp.logical_and(
        jnp.all(angvel == 0.0, axis=-1, keepdims=True),
        jnp.all(linvel == 0.0, axis=-1, keepdims=True),
    )
    new_rot = jnp.where(still, bodies.rot, new_rot)
    new_pos = jnp.where(still, bodies.pos, new_pos)
    return new_rot, new_pos


def update_world_mass_properties(bodies: RigidWorld) -> RigidWorld:
    """Refresh world COM and world-frame inverse inertia from current pose.

    (rigid_impulses.wgsl:139-150 equivalent.)
    """
    world_com = pose_math.transform_point(bodies.rot, bodies.pos, bodies.local_com)
    if bodies.dim == 3:
        r = pose_math.quat_to_matrix(bodies.rot)
        inv_i = jnp.einsum("bik,bkl,bjl->bij", r, bodies.inv_inertia_local, r)
    else:
        inv_i = bodies.inv_inertia_local
    return bodies.replace(world_com=world_com, inv_inertia_world=inv_i)


# ------------------------------------------------------------- host builders
def shape_mass_properties(collider, density: float, dim: int):
    """(mass, local_com, inertia) for primitive shapes (host-side numpy).

    Minimal replacement for rapier's collider mass properties: enough for
    the coupling demos (dynamic cuboid plates etc., sand2.rs:22-181).
    """
    st = collider.shape_type
    p = collider.params
    if st == 0:  # cuboid
        he = np.asarray(p[:dim], np.float64)
        vol = float(np.prod(2.0 * he))
        mass = density * vol
        if dim == 3:
            ex, ey, ez = 2.0 * he
            inertia = (
                mass
                / 12.0
                * np.array(
                    [ey**2 + ez**2, ex**2 + ez**2, ex**2 + ey**2]
                )
            )
            inertia = np.diag(inertia)
        else:
            ex, ey = 2.0 * he
            inertia = np.array([[mass * (ex**2 + ey**2) / 12.0]])
        return mass, np.zeros(dim), inertia
    if st == 1:  # ball
        r = p[0]
        if dim == 3:
            vol = 4.0 / 3.0 * np.pi * r**3
            mass = density * vol
            i = 0.4 * mass * r * r
            inertia = np.diag([i, i, i])
        else:
            vol = np.pi * r**2
            mass = density * vol
            inertia = np.array([[0.5 * mass * r * r]])
        return mass, np.zeros(dim), inertia
    if st == 2:  # capsule (cylinder+hemispheres approximated as cylinder+ball)
        hh, r = p[0], p[1]
        if dim == 3:
            vol_cyl = np.pi * r * r * 2 * hh
            vol_sph = 4.0 / 3.0 * np.pi * r**3
            mass = density * (vol_cyl + vol_sph)
            m_cyl = density * vol_cyl
            m_sph = density * vol_sph
            ixx = m_cyl * (3 * r * r + (2 * hh) ** 2) / 12.0 + m_sph * (
                0.4 * r * r + hh * hh
            )
            iyy = 0.5 * m_cyl * r * r + 0.4 * m_sph * r * r
            inertia = np.diag([ixx, iyy, ixx])
        else:
            area = 4 * hh * r + np.pi * r * r
            mass = density * area
            inertia = np.array([[mass * ((2 * r) ** 2 + (2 * hh + 2 * r) ** 2) / 12.0]])
        return mass, np.zeros(dim), inertia
    # halfspace / meshes: treated as static (infinite mass).
    return np.inf, np.zeros(dim), None
