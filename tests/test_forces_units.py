"""Per-force unit tests on hand-built configurations (SURVEY.md section 4).

Each case builds a minimal world (two particles or one particle + one wall),
zeroes every other coefficient, runs one step, and checks the velocity change
against the closed-form expectation of the reference force laws
(crate.py:245-358).  The dense backend runs these (small scenes auto-select
it), so the math under test is the shared PairSums pipeline.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sand_crate_tpu.config import BODY_FIXED, RigidBodyConfig, WorldConfig
from sand_crate_tpu.physics import step
from sand_crate_tpu.scene import build_scene, init_state
from sand_crate_tpu.state import Params

DT = 0.01
RADIUS = 0.05
DIAM = 2 * RADIUS

BASE_COEFF = dict(
    dt=DT,
    particle_radius=RADIUS,
    wall_collision_decay=0.0,
    spring_overlap_balance=0.0,
    spring_amplifier=0.0,
    pressure_amplifier=0.0,
    ignored_pressure=0.0,
    collider_noise_level=0.0,
    viscosity=0.0,
    max_particles=8,
    surface_smoothing=0.0,
    target_pressure=0.0,
    gravity=[0.0, 0.0],
)


def make_world(**coeff_overrides) -> WorldConfig:
    coeff = dict(BASE_COEFF)
    coeff.update(coeff_overrides)
    return WorldConfig(rigid_bodies=[], particle_sources=[], coefficients=coeff)


def one_step(world, positions, velocities, enable_spring=False):
    scene = build_scene(world, capacity=8, enable_spring=enable_spring)
    state = init_state(world, scene, seed=0)
    n = len(positions)
    pos = np.zeros((8, 2), np.float32)
    vel = np.zeros((8, 2), np.float32)
    alive = np.zeros(8, bool)
    pos[:n], vel[:n], alive[:n] = positions, velocities, True
    state = state._replace(
        pos=jnp.asarray(pos), vel=jnp.asarray(vel), alive=jnp.asarray(alive)
    )
    params = Params.from_coefficients(world.coefficients)
    new_state, diag = step(state, params, scene)
    return np.asarray(new_state.vel)[:n], np.asarray(new_state.pos)[:n], diag


def test_gravity_only():
    world = make_world(gravity=[0.0, 9.8])
    vel, _, _ = one_step(world, [[0.5, 0.5]], [[0.0, 0.0]])
    np.testing.assert_allclose(vel[0], [0.0, 9.8 * DT], rtol=1e-6)


def test_pressure_pushes_overlapping_pair_apart():
    # Two particles half a diameter apart on the x axis.
    # w = 1 - 0.5 = 0.5 each => p_i = p_j = 0.5.
    # tension kick (smoothing=0, target=0): dt * (p_i + p_j) * nhat
    # pressure kick: dt * amplifier * (p_i + p_j) * nhat
    amp = 10.0
    world = make_world(pressure_amplifier=amp)
    gap = 0.5 * DIAM
    vel, _, _ = one_step(
        world, [[0.5 - gap / 2, 0.5], [0.5 + gap / 2, 0.5]], [[0, 0], [0, 0]]
    )
    expected = DT * (1.0 + amp) * 1.0  # (p_i + p_j) = 1.0, along +/-x
    np.testing.assert_allclose(vel[0], [-expected, 0.0], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(vel[1], [+expected, 0.0], rtol=1e-5, atol=1e-7)


def test_ignored_pressure_dead_zone():
    # Overlap sum below the dead zone => zero pressure => no kick.
    world = make_world(pressure_amplifier=10.0, ignored_pressure=0.6)
    gap = 0.5 * DIAM  # w sum = 0.5 < 0.6
    vel, _, _ = one_step(
        world, [[0.5 - gap / 2, 0.5], [0.5 + gap / 2, 0.5]], [[0, 0], [0, 0]]
    )
    np.testing.assert_allclose(vel, 0.0, atol=1e-7)


def test_target_pressure_attracts_isolated_pair():
    # With positive target pressure and zero actual pressure (dead zone),
    # tension tpf = p_i + p_j - 2*target < 0 => attraction.
    world = make_world(target_pressure=1.0, ignored_pressure=1.0)
    gap = 0.8 * DIAM
    vel, _, _ = one_step(
        world, [[0.5 - gap / 2, 0.5], [0.5 + gap / 2, 0.5]], [[0, 0], [0, 0]]
    )
    # dv_0 = dt * tpf * nhat_0 with tpf = -2 and nhat_0 = -x (from nb to
    # self), so p0 kicks +x: toward its neighbor.
    expected = DT * 2.0
    np.testing.assert_allclose(vel[0], [expected, 0.0], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(vel[1], [-expected, 0.0], rtol=1e-5, atol=1e-7)


def test_viscosity_drags_toward_neighbor_velocity():
    # v_j snapshot (pre-force) = [1, 0]; v_i = 0.
    # dv_i = dt * visc * (v_j - v_i) evaluated with fresh v_i (crate.py:318).
    visc = 5.0
    world = make_world(viscosity=visc, ignored_pressure=1.0)
    gap = 0.5 * DIAM
    vel, _, _ = one_step(
        world, [[0.5 - gap / 2, 0.5], [0.5 + gap / 2, 0.5]], [[0, 0], [1.0, 0]]
    )
    # particle 0: dv = dt * visc * (1 - 0) = 0.05
    np.testing.assert_allclose(vel[0], [DT * visc, 0.0], rtol=1e-5, atol=1e-7)
    # particle 1: dv = dt * visc * (0 - 1)
    np.testing.assert_allclose(vel[1], [1.0 - DT * visc, 0.0], rtol=1e-5, atol=1e-7)


def test_spring_flag_gated():
    # Spring force only acts when the scene enables it (reference ships it
    # disabled, crate.py:117-118).
    world = make_world(
        spring_amplifier=50.0, spring_overlap_balance=0.4, ignored_pressure=1.0
    )
    gap = 0.5 * DIAM
    pts = [[0.5 - gap / 2, 0.5], [0.5 + gap / 2, 0.5]]
    vel_off, _, _ = one_step(world, pts, [[0, 0], [0, 0]], enable_spring=False)
    np.testing.assert_allclose(vel_off, 0.0, atol=1e-7)
    vel_on, _, _ = one_step(world, pts, [[0, 0], [0, 0]], enable_spring=True)
    # balance 0.4 < w 0.5 -> negative coefficient along nhat -> attraction...
    # dv = dt * amp * (balance - w) * nhat / total
    expected = DT * 50.0 * (0.4 - 0.5) * 1.0
    np.testing.assert_allclose(vel_on[0], [-expected, 0.0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(vel_on[1], [expected, 0.0], rtol=1e-4, atol=1e-6)


def _floor_world(**coeff):
    world = make_world(**coeff)
    world.rigid_bodies = [
        RigidBodyConfig(kind=BODY_FIXED, segments=[[[0.0, 0.8], [1.0, 0.8]]])
    ]
    return world


def test_wall_bounce_reflects_approaching_particle():
    # Particle just above a floor segment, moving down: the normal component
    # reflects with the (1 + decay) kick (crate.py:245-259).
    decay = 0.5
    world = _floor_world(wall_collision_decay=decay, ignored_pressure=1.0)
    y = 0.8 - RADIUS * 1.1  # inside the 1.2 r ghost band
    vel, _, _ = one_step(world, [[0.5, y]], [[0.0, 2.0]])
    # approach = +2 into the wall; dv = -(1+decay)*approach along the normal
    np.testing.assert_allclose(vel[0], [0.0, 2.0 - (1 + decay) * 2.0], rtol=1e-4)


def test_hard_wall_projection_pushes_penetrating_particle_out():
    world = _floor_world(ignored_pressure=1.0)
    y = 0.8 - RADIUS * 0.4  # penetrating: nearest distance 0.02 < r
    _, pos, _ = one_step(world, [[0.5, y]], [[0.0, 0.0]])
    # projected so the ghost distance ratio hits r (crate.py:202-211)
    assert pos[0][1] < y  # moved away from the wall (up = -y toward 0)


def test_ccd_stops_fast_particle_at_wall():
    # A particle one radius above the floor moving down fast enough to
    # tunnel in one tick gets its velocity clamped (crate.py:177-200).
    world = _floor_world(ignored_pressure=1.0)
    y0 = 0.8 - 3 * RADIUS
    speed = 40.0  # would travel 0.4 in one tick, far past the wall
    vel, pos, _ = one_step(world, [[0.5, y0]], [[0.0, speed]])
    # padded wall sits one radius above the floor, 2R below the start:
    # crossing parameter t = 2R / (speed * dt) = 0.25 -> v *= 0.25
    np.testing.assert_allclose(vel[0][1], speed * 0.25, rtol=1e-4)
    # lands exactly on the padded wall, no tunneling
    np.testing.assert_allclose(pos[0][1], 0.8 - RADIUS, rtol=1e-4)


def test_wall_bounce_ignores_receding_particle():
    world = _floor_world(wall_collision_decay=0.5, ignored_pressure=1.0)
    y = 0.8 - RADIUS * 1.1
    vel, _, _ = one_step(world, [[0.5, y]], [[0.0, -2.0]])  # moving away
    np.testing.assert_allclose(vel[0], [0.0, -2.0], rtol=1e-5)
