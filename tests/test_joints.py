"""Ball-joint constraint tests (rigid/joints.py — rapier's joint role in
the reference testbed, src_testbed/step.rs:201-217)."""

import numpy as np

import jax
import jax.numpy as jnp

from wgsparkl_tpu.collision import shapes as shp
from wgsparkl_tpu.math import pose as pose_math
from wgsparkl_tpu.pipeline import (
    MpmConfig, RigidBodyDesc, build_rigid_world, rigid_bodies_update,
)
from wgsparkl_tpu.rigid import body as body_mod
from wgsparkl_tpu.grid import GridConfig
from wgsparkl_tpu.params import SimulationParams
from wgsparkl_tpu.collision.shapes import Collider


def _world(descs):
    return build_rigid_world(tuple(descs), 3)


def _anchor_gap(bodies, joint):
    b, c, la_b, la_c = joint
    a_b = pose_math.transform_point(
        bodies.rot[b], bodies.pos[b], jnp.asarray(la_b, jnp.float32)
    )
    a_c = pose_math.transform_point(
        bodies.rot[c], bodies.pos[c], jnp.asarray(la_c, jnp.float32)
    )
    return float(jnp.linalg.norm(a_b - a_c))


def test_pendulum_swings_and_stays_attached():
    """A dynamic box jointed (at its +y face) to a static anchor body must
    swing under gravity without the anchor gap opening, and eventually hang
    below the pivot."""
    descs = [
        RigidBodyDesc(  # static anchor at the pivot
            collider=Collider.ball(0.1), translation=(0.0, 10.0, 0.0),
            body_type="fixed",
        ),
        RigidBodyDesc(  # dynamic rod/box, anchored at its +y face
            collider=Collider.cuboid(0.1, 1.0, 0.1),
            translation=(1.0, 9.0, 0.0), body_type="dynamic",
            density=1000.0,
        ),
    ]
    joint = (1, 0, (0.0, 1.0, 0.0), (0.0, 0.0, 0.0))
    grid = GridConfig.from_bounds(
        np.array([-8.0, 0.0, -8.0]), np.array([8.0, 16.0, 8.0]), 1.0
    )
    cfg = MpmConfig(
        grid=grid,
        collider_types=tuple(d.collider.shape_type for d in descs),
        dynamic_slots=(1,),
        joints=(joint,),
    )
    bodies = _world(descs)
    params = SimulationParams(
        gravity=jnp.asarray([0.0, -9.81, 0.0]), dt=1e-3
    )
    zero_imp = jnp.zeros((bodies.count, 3), jnp.float32)

    def substep(bod, _):
        # Mirrors the pipeline cores: refresh world mass properties first.
        bod = body_mod.update_world_mass_properties(bod)
        return rigid_bodies_update(bod, zero_imp, zero_imp, params, cfg), None

    stepper = jax.jit(lambda b: jax.lax.scan(substep, b, None, length=400)[0])
    b1 = stepper(bodies)
    # After 0.4 s the pendulum must have swung (rotation + com moved) ...
    assert abs(float(b1.pos[1, 0]) - 1.0) > 0.05, "pendulum never moved"
    # ... while the joint stays closed (Baumgarte keeps drift ~ slop).
    assert _anchor_gap(b1, joint) < 0.05
    # Long run: settles hanging below the pivot (x ~ 0, com ~ 1.1 below).
    b2 = b1
    for _ in range(14):
        b2 = stepper(b2)
    gap = _anchor_gap(b2, joint)
    assert gap < 0.05, f"anchor gap opened: {gap}"
    assert np.isfinite(np.asarray(b2.pos)).all()
    assert abs(float(b2.pos[1, 0])) < 0.35, (
        f"pendulum did not settle under the pivot: x={float(b2.pos[1, 0])}"
    )
    assert float(b2.pos[1, 1]) < 9.3


def test_dynamic_dynamic_chain_stays_connected():
    """Two dynamic links chained to a static anchor: both joints hold."""
    descs = [
        RigidBodyDesc(collider=Collider.ball(0.1),
                      translation=(0.0, 10.0, 0.0), body_type="fixed"),
        RigidBodyDesc(collider=Collider.cuboid(0.1, 0.5, 0.1),
                      translation=(0.5, 9.5, 0.0), body_type="dynamic",
                      density=800.0),
        RigidBodyDesc(collider=Collider.cuboid(0.1, 0.5, 0.1),
                      translation=(1.0, 8.5, 0.0), body_type="dynamic",
                      density=800.0),
    ]
    j1 = (1, 0, (0.0, 0.5, 0.0), (0.0, 0.0, 0.0))
    j2 = (2, 1, (0.0, 0.5, 0.0), (0.0, -0.5, 0.0))
    grid = GridConfig.from_bounds(
        np.array([-8.0, 0.0, -8.0]), np.array([8.0, 16.0, 8.0]), 1.0
    )
    cfg = MpmConfig(
        grid=grid,
        collider_types=tuple(d.collider.shape_type for d in descs),
        dynamic_slots=(1, 2),
        joints=(j1, j2),
    )
    bodies = _world(descs)
    params = SimulationParams(
        gravity=jnp.asarray([0.0, -9.81, 0.0]), dt=1e-3
    )
    zero_imp = jnp.zeros((bodies.count, 3), jnp.float32)

    def substep(bod, _):
        # Mirrors the pipeline cores: refresh world mass properties first.
        bod = body_mod.update_world_mass_properties(bod)
        return rigid_bodies_update(bod, zero_imp, zero_imp, params, cfg), None

    stepper = jax.jit(lambda b: jax.lax.scan(substep, b, None, length=500)[0])
    b1 = bodies
    for _ in range(6):
        b1 = stepper(b1)
    assert np.isfinite(np.asarray(b1.pos)).all()
    assert _anchor_gap(b1, j1) < 0.06
    assert _anchor_gap(b1, j2) < 0.06
    # The chain hangs: link 2's com below link 1's.
    assert float(b1.pos[2, 1]) < float(b1.pos[1, 1])


def test_fixed_joint_welds():
    """A dynamic box welded (kind='fixed') to a static anchor with a
    sideways offset must NOT swing: the weld holds both the anchor gap
    and the initial relative orientation against the gravity torque."""
    from wgsparkl_tpu.pipeline import _normalize_joints

    descs = [
        RigidBodyDesc(
            collider=Collider.ball(0.1), translation=(0.0, 10.0, 0.0),
            body_type="fixed",
        ),
        RigidBodyDesc(
            collider=Collider.cuboid(0.1, 1.0, 0.1),
            translation=(1.0, 9.0, 0.0), body_type="dynamic",
            density=1000.0,
        ),
    ]
    joints = _normalize_joints(
        ((1, 0, (-1.0, 1.0, 0.0), (0.0, 0.0, 0.0), "fixed"),),
        tuple(descs), 3,
    )
    grid = GridConfig.from_bounds(
        np.array([-8.0, 0.0, -8.0]), np.array([8.0, 16.0, 8.0]), 1.0
    )
    cfg = MpmConfig(
        grid=grid,
        collider_types=tuple(d.collider.shape_type for d in descs),
        dynamic_slots=(1,), joints=joints,
    )
    bodies = _world(descs)
    params = SimulationParams(gravity=jnp.asarray([0.0, -9.81, 0.0]), dt=1e-3)
    zero_imp = jnp.zeros((bodies.count, 3), jnp.float32)

    def substep(bod, _):
        bod = body_mod.update_world_mass_properties(bod)
        return rigid_bodies_update(bod, zero_imp, zero_imp, params, cfg), None

    stepper = jax.jit(lambda b: jax.lax.scan(substep, b, None, length=400)[0])
    b1 = stepper(bodies)
    for _ in range(4):
        b1 = stepper(b1)   # 2 s
    assert np.isfinite(np.asarray(b1.pos)).all()
    # weld holds: no swing (x stays), orientation stays ~identity
    assert abs(float(b1.pos[1, 0]) - 1.0) < 0.15, float(b1.pos[1, 0])
    q = np.asarray(b1.rot[1])
    assert np.abs(q[1:]).max() < 0.1, q
    assert _anchor_gap(b1, joints[0][:4]) < 0.08


def test_revolute_joint_hinges():
    """A rod hinged (kind='revolute', axis z) to a static anchor swings in
    the x-y plane only: no out-of-plane drift, no rotation about x/y, but
    the in-plane swing actually happens (it is NOT a weld)."""
    from wgsparkl_tpu.pipeline import _normalize_joints

    descs = [
        RigidBodyDesc(
            collider=Collider.ball(0.1), translation=(0.0, 10.0, 0.0),
            body_type="fixed",
        ),
        RigidBodyDesc(
            collider=Collider.cuboid(1.0, 0.1, 0.1),
            translation=(1.0, 10.0, 0.0), body_type="dynamic",
            density=1000.0,
        ),
    ]
    joints = _normalize_joints(
        ((1, 0, (-1.0, 0.0, 0.0), (0.0, 0.0, 0.0), "revolute",
          (0.0, 0.0, 1.0)),),
        tuple(descs), 3,
    )
    grid = GridConfig.from_bounds(
        np.array([-8.0, 0.0, -8.0]), np.array([8.0, 16.0, 8.0]), 1.0
    )
    cfg = MpmConfig(
        grid=grid,
        collider_types=tuple(d.collider.shape_type for d in descs),
        dynamic_slots=(1,), joints=joints,
    )
    bodies = _world(descs)
    params = SimulationParams(gravity=jnp.asarray([0.0, -9.81, 0.0]), dt=1e-3)
    zero_imp = jnp.zeros((bodies.count, 3), jnp.float32)

    def substep(bod, _):
        bod = body_mod.update_world_mass_properties(bod)
        return rigid_bodies_update(bod, zero_imp, zero_imp, params, cfg), None

    stepper = jax.jit(lambda b: jax.lax.scan(substep, b, None, length=400)[0])
    b1 = stepper(bodies)
    assert np.isfinite(np.asarray(b1.pos)).all()
    # swings: com dropped below the hinge height
    assert float(b1.pos[1, 1]) < 9.9, float(b1.pos[1, 1])
    # in-plane only: no z drift; rotation stays about z (quat x, y ~ 0)
    assert abs(float(b1.pos[1, 2])) < 0.02, float(b1.pos[1, 2])
    q = np.asarray(b1.rot[1])
    assert np.abs(q[1:3]).max() < 0.05, q
    assert _anchor_gap(b1, joints[0][:4]) < 0.05


def test_prismatic_joint_slides():
    """A box attached by a prismatic joint must be held rigidly in every
    direction except the slide axis: with a horizontal (x) axis gravity
    cannot pull it down (y locked) and it keeps its orientation; with a
    vertical (y) axis the same box free-falls along the slider."""
    from wgsparkl_tpu.pipeline import _normalize_joints

    descs = [
        RigidBodyDesc(
            collider=Collider.ball(0.1), translation=(0.0, 10.0, 0.0),
            body_type="fixed",
        ),
        RigidBodyDesc(
            collider=Collider.cuboid(0.3, 0.2, 0.2),
            translation=(0.0, 10.0, 0.0), body_type="dynamic",
            density=1000.0,
        ),
    ]
    grid = GridConfig.from_bounds(
        np.array([-8.0, 0.0, -8.0]), np.array([8.0, 16.0, 8.0]), 1.0
    )
    params = SimulationParams(gravity=jnp.asarray([0.0, -9.81, 0.0]), dt=1e-3)
    zero_imp = jnp.zeros((2, 3), jnp.float32)

    def run(axis):
        joints = _normalize_joints(
            ((1, 0, (0.0, 0.0, 0.0), (0.0, 0.0, 0.0), "prismatic", axis),),
            tuple(descs), 3,
        )
        cfg = MpmConfig(
            grid=grid,
            collider_types=tuple(d.collider.shape_type for d in descs),
            dynamic_slots=(1,), joints=joints,
        )
        bodies = _world(descs)

        def substep(bod, _):
            bod = body_mod.update_world_mass_properties(bod)
            return (
                rigid_bodies_update(bod, zero_imp, zero_imp, params, cfg),
                None,
            )

        stepper = jax.jit(
            lambda b: jax.lax.scan(substep, b, None, length=400)[0]
        )
        return stepper(bodies)  # 0.4 s

    # Horizontal slider: gravity is perpendicular to the axis, so the box
    # hangs in place (y locked by the joint) and never rotates.
    bx = run((1.0, 0.0, 0.0))
    assert np.isfinite(np.asarray(bx.pos)).all()
    assert abs(float(bx.pos[1, 1]) - 10.0) < 0.02, np.asarray(bx.pos[1])
    assert abs(float(bx.pos[1, 2])) < 0.02, np.asarray(bx.pos[1])
    q = np.asarray(bx.rot[1])
    assert np.abs(q[1:]).max() < 0.05, q

    # Vertical slider: gravity acts along the axis -> free fall, but still
    # no sideways drift and no rotation. 0.5 * 9.81 * 0.4^2 ~= 0.78 m.
    by = run((0.0, 1.0, 0.0))
    drop = 10.0 - float(by.pos[1, 1])
    assert 0.5 < drop < 1.1, drop
    assert abs(float(by.pos[1, 0])) < 0.02
    assert abs(float(by.pos[1, 2])) < 0.02
    q = np.asarray(by.rot[1])
    assert np.abs(q[1:]).max() < 0.05, q
