"""Body-body contacts (rigid/contacts.py) + coupling-mode selection.

The reference gets both from rapier/MpmData::with_select_coupling
(/root/reference/src_testbed/step.rs:201-217, src/pipeline.rs:130-168);
these tests pin the TPU-native equivalents.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wgsparkl_tpu.collision.shapes import Collider
from wgsparkl_tpu.models import ElasticCoefficients
from wgsparkl_tpu.params import SimulationParams
from wgsparkl_tpu.pipeline import (
    COUPLING_ONE_WAY,
    COUPLING_TWO_WAY,
    MpmData,
    RigidBodyDesc,
    rigid_bodies_update,
    substep,
)
from wgsparkl_tpu.solver import Models, Particles


def _plate_scene(dim=3, coupling=None, body_contacts=True):
    """A dynamic plate falling onto a static floor, particles off to the side
    (far enough to not touch the plate)."""
    h = 0.5
    if dim == 3:
        pos = (np.array([[6.0, 1.0, 6.0], [6.2, 1.0, 6.0], [6.0, 1.2, 6.2]])
               ).astype(np.float32)
        floor = RigidBodyDesc(Collider.cuboid(10.0, 0.5, 10.0), (0.0, -0.5, 0.0))
        plate = RigidBodyDesc(
            Collider.cuboid(0.6, 0.1, 0.6), (0.0, 1.5, 0.0),
            body_type="dynamic", density=800.0,
        )
        gravity = [0.0, -9.81, 0.0]
        bounds = (np.array([-3.0, -1.0, -3.0]), np.array([8.0, 4.0, 8.0]))
    else:
        pos = np.array([[6.0, 1.0], [6.2, 1.0], [6.0, 1.2]], np.float32)
        floor = RigidBodyDesc(Collider.cuboid(10.0, 0.5), (0.0, -0.5))
        plate = RigidBodyDesc(
            Collider.cuboid(0.6, 0.1), (0.0, 1.5),
            body_type="dynamic", density=800.0,
        )
        gravity = [0.0, -9.81]
        bounds = (np.array([-3.0, -1.0]), np.array([8.0, 4.0]))
    n = len(pos)
    parts = Particles.from_arrays(pos, density=1000.0, radius=h / 4)
    m = ElasticCoefficients.from_young_modulus(1e6, 0.2)
    models = Models.from_arrays(n, m.lam, m.mu)
    params = SimulationParams.new(dt=1 / 240, gravity=gravity)
    return MpmData(
        params, parts, models, [floor, plate], cell_width=h,
        grid_bounds=bounds, coupling=coupling, body_contacts=body_contacts,
    )


@pytest.mark.parametrize("dim", [2, 3])
def test_dynamic_plate_rests_on_floor(dim):
    data = _plate_scene(dim)
    f = jax.jit(substep, static_argnums=2)
    s = data.state
    for _ in range(300):
        s = f(s, data.params, data.config)
    pos = np.asarray(s.bodies.pos[1])
    vel = np.asarray(s.bodies.linvel[1])
    # Plate half-thickness 0.1, floor top at y=0: resting pose y ~= 0.1.
    assert abs(pos[1] - 0.1) < 0.05, pos
    assert np.linalg.norm(vel) < 0.1, vel


def test_without_contacts_plate_falls_through():
    data = _plate_scene(3, body_contacts=False)
    f = jax.jit(substep, static_argnums=2)
    s = data.state
    for _ in range(300):
        s = f(s, data.params, data.config)
    assert np.asarray(s.bodies.pos[1])[1] < -0.5  # tunnelled below the floor


def test_stacked_dynamic_boxes_settle():
    """Dynamic-dynamic contacts (round-2 verdict missing item 2): two boxes
    dropped one above the other settle as a stack on the floor without
    interpenetrating (rapier's role, step.rs:201-217)."""
    h = 0.5
    pos = np.array([[6.0, 1.0, 6.0], [6.2, 1.0, 6.0]], np.float32)
    floor = RigidBodyDesc(Collider.cuboid(10.0, 0.5, 10.0), (0.0, -0.5, 0.0))
    lower = RigidBodyDesc(
        Collider.cuboid(0.6, 0.2, 0.6), (0.0, 0.6, 0.0),
        body_type="dynamic", density=800.0,
    )
    upper = RigidBodyDesc(
        Collider.cuboid(0.4, 0.2, 0.4), (0.05, 1.6, 0.0),
        body_type="dynamic", density=800.0,
    )
    parts = Particles.from_arrays(pos, density=1000.0, radius=h / 4)
    m = ElasticCoefficients.from_young_modulus(1e6, 0.2)
    models = Models.from_arrays(len(pos), m.lam, m.mu)
    params = SimulationParams.new(dt=1 / 240, gravity=[0.0, -9.81, 0.0])
    data = MpmData(
        params, parts, models, [floor, lower, upper], cell_width=h,
        grid_bounds=(np.array([-3.0, -1.0, -3.0]), np.array([8.0, 4.0, 8.0])),
    )
    f = jax.jit(substep, static_argnums=2)
    s = data.state
    for _ in range(400):
        s = f(s, data.params, data.config)
    p_low = np.asarray(s.bodies.pos[1])
    p_up = np.asarray(s.bodies.pos[2])
    v_low = np.asarray(s.bodies.linvel[1])
    v_up = np.asarray(s.bodies.linvel[2])
    # Lower box rests on the floor (half-height 0.2 -> y ~= 0.2); the upper
    # box rests ON the lower one (0.2 + 0.4 = 0.6), NOT inside it and NOT
    # on the floor.
    assert abs(p_low[1] - 0.2) < 0.07, p_low
    assert abs(p_up[1] - 0.6) < 0.12, p_up
    assert np.linalg.norm(v_low) < 0.2, v_low
    assert np.linalg.norm(v_up) < 0.2, v_up


def test_one_way_coupling_masks_impulses():
    data = _plate_scene(3, coupling=[COUPLING_TWO_WAY, COUPLING_ONE_WAY],
                        body_contacts=False)
    bodies = data.state.bodies
    lin = jnp.zeros_like(bodies.linvel).at[1, 1].set(50.0)
    ang = jnp.zeros_like(bodies.angvel)
    out = rigid_bodies_update(bodies, lin, ang, data.params, data.config)
    # One-way: the impulse is ignored; only gravity moved the velocity.
    np.testing.assert_allclose(
        np.asarray(out.linvel[1]),
        [0.0, -9.81 * data.params.dt, 0.0],
        atol=1e-6,
    )
    # Two-way control: the same impulse does move the body.
    data2 = _plate_scene(3, body_contacts=False)
    out2 = rigid_bodies_update(bodies, lin, ang, data2.params, data2.config)
    # impulse 50 / plate mass 230.4 kg ~= 0.217 m/s, minus one gravity kick
    assert np.asarray(out2.linvel[1])[1] > 0.15


def test_crossed_boxes_edge_edge_contact():
    """Two long thin boxes crossed at 90 degrees: the dynamic one rests on
    the static one through a pure edge-edge (face-interior) contact — no
    corner of either box lies inside the other, so corner-only sampling
    would tunnel straight through.  Pins the cuboid edge-interior samples
    (rapier builds a proper manifold here, step.rs:201-217)."""
    h = 0.5
    pos = np.array([[6.0, 1.0, 6.0], [6.2, 1.0, 6.0]], np.float32)
    beam_x = RigidBodyDesc(  # static beam along x, top face at y = 1.2
        Collider.cuboid(5.0, 0.2, 0.2), (0.0, 1.0, 0.0)
    )
    beam_z = RigidBodyDesc(  # dynamic beam along z, dropped from above
        Collider.cuboid(0.2, 0.2, 5.0), (0.0, 2.0, 0.0),
        body_type="dynamic", density=800.0,
    )
    parts = Particles.from_arrays(pos, density=1000.0, radius=h / 4)
    m = ElasticCoefficients.from_young_modulus(1e6, 0.2)
    models = Models.from_arrays(len(pos), m.lam, m.mu)
    params = SimulationParams.new(dt=1 / 240, gravity=[0.0, -9.81, 0.0])
    data = MpmData(
        params, parts, models, [beam_x, beam_z], cell_width=h,
        grid_bounds=(np.array([-6.0, -1.0, -6.0]), np.array([8.0, 4.0, 8.0])),
    )
    f = jax.jit(substep, static_argnums=2)
    s = data.state
    for _ in range(400):
        s = f(s, data.params, data.config)
    p = np.asarray(s.bodies.pos[1])
    # Rests crossed on top (1.2 + 0.2 = 1.4), never tunnels through.
    assert p[1] > 1.25, p
    assert p[1] < 1.55, p
