"""Config loading: reference YAML schema, safe motor parsing, extensions."""

import math
from pathlib import Path

import pytest

from sand_crate_tpu.config import (
    MotorSpec,
    load_config,
    parse_motor,
    parse_motor_string,
)

REPO = Path(__file__).resolve().parent.parent
REFERENCE_CONFIGS = Path("/root/reference/config")


def test_load_shipped_configs(stirring_cup_config, wave_machine_config):
    cfg = stirring_cup_config
    assert len(cfg.world_config.rigid_bodies) == 2
    assert len(cfg.world_config.particle_sources) == 1
    assert cfg.world_config.coefficients["max_particles"] == 600
    assert cfg.playback_config.ticks_to_record == 1200

    wm = wave_machine_config
    assert wm.world_config.coefficients["max_particles"] == 4000
    body = wm.world_config.rigid_bodies[1]
    assert body.motor_ang.amplitude == 1.5
    assert body.motor_ang.frequency == 8.0
    assert body.rotation == -12


@pytest.mark.skipif(not REFERENCE_CONFIGS.exists(), reason="reference not mounted")
@pytest.mark.parametrize("name", ["stirring_cup.yaml", "wave_machine.yaml"])
def test_load_reference_original_configs(name):
    """The reference's own YAML files (with eval-lambda motors) must load."""
    cfg = load_config(REFERENCE_CONFIGS / name)
    motored = [b for b in cfg.world_config.rigid_bodies if b.kind == 1]
    assert len(motored) == 1
    assert motored[0].motor_ang.amplitude in (1.4, 1.5)


def test_parse_motor_lambda_forms():
    m = parse_motor_string("lambda t: np.cos(t * 5) * 1.4")
    assert (m.amplitude, m.frequency, m.phase) == (1.4, 5.0, 0.0)
    m = parse_motor_string("lambda t: np.sin(t * 2) * 3")
    assert m.amplitude == 3.0 and m.phase == pytest.approx(-math.pi / 2)
    assert m(0.0) == pytest.approx(0.0)
    m = parse_motor_string("lambda t: 0.25")
    assert m(123.0) == 0.25
    m = parse_motor_string("lambda t: 2.0 * np.cos(t * 7)")
    assert (m.amplitude, m.frequency) == (2.0, 7.0)


def test_parse_motor_rejects_arbitrary_code():
    with pytest.raises(ValueError):
        parse_motor_string("lambda t: __import__('os').system('true')")


def test_parse_motor_declarative():
    m = parse_motor({"amplitude": 1.4, "frequency": 5.0})
    assert isinstance(m, MotorSpec)
    assert m(0.0) == pytest.approx(1.4)


def test_dam_break_initial_particles():
    cfg = load_config(REPO / "configs" / "dam_break.yaml")
    assert len(cfg.world_config.initial_particles) == 1
    blk = cfg.world_config.initial_particles[0]
    assert blk.spacing > 0 and blk.x1 > blk.x0


# --- expression motors (safe AST fallback for arbitrary reference lambdas,
# /root/reference/src/crate/rigid_body.py:81-83) --------------------------


def test_parse_motor_arbitrary_expression():
    import numpy as np

    m = parse_motor_string("lambda t: np.sin(t)**2")
    assert m.expr is not None
    assert m.as_tuple() == (0.0, 0.0, 0.0, 0.0)  # cosine channel contributes 0
    for t in (0.0, 0.3, 2.7):
        assert m(t) == pytest.approx(math.sin(t) ** 2)

    m = parse_motor_string("lambda t: math.exp(-t) * np.cos(2 * np.pi * t) + 0.5")
    for t in (0.0, 0.25, 1.5):
        assert m(t) == pytest.approx(math.exp(-t) * math.cos(2 * math.pi * t) + 0.5)

    # min/max/clip family and nested calls
    m = parse_motor_string("lambda t: np.minimum(np.sqrt(t), 1.0)")
    assert m(0.25) == pytest.approx(0.5)
    assert m(9.0) == pytest.approx(1.0)

    # evaluates under jnp too (the namespace physics traces with)
    import jax.numpy as jnp

    v = m.expr(jnp.float32(0.25), xp=jnp)
    assert float(v) == pytest.approx(0.5)
    np_v = m.expr(np.float64(0.25), xp=np)
    assert float(np_v) == pytest.approx(0.5)


def test_parse_motor_expression_rejections():
    bad = [
        "lambda t: open('/etc/passwd')",
        "lambda t: t.__class__",
        "lambda t: 'hi'",
        "lambda t: [1, 2]",
        "lambda t: (t, t)",
        "lambda t: x + 1",
        "lambda t: np.sin(t, out=None)",
        "lambda t, u: t + u",
        "lambda t: np.array([1, 2])",  # vector where a scalar channel is needed
        "lambda t: getattr(np, 'sin')(t)",
    ]
    for src in bad:
        with pytest.raises(ValueError):
            parse_motor_string(src)


def test_parse_vector_motor_expressions():
    from sand_crate_tpu.config import parse_vector_motor_string

    vx, vy = parse_vector_motor_string("lambda t: np.array([np.sin(t) * 0.2, 0.0])")
    assert vx.expr is not None
    assert vx(1.3) == pytest.approx(math.sin(1.3) * 0.2)
    assert vy.expr is None and vy.offset == 0.0  # constant fast path

    # constant legacy form keeps the pure-constant channels
    vx, vy = parse_vector_motor_string("lambda t: np.array([0.1, -0.2])")
    assert vx.expr is None and (vx.offset, vy.offset) == (0.1, -0.2)


def test_expr_motor_hash_eq():
    from sand_crate_tpu.config import ExprMotor

    a = ExprMotor("lambda t: np.sin(t)**2")
    b = ExprMotor("lambda  t :  np.sin(t)**2")  # whitespace-normalized
    c = ExprMotor("lambda t: np.cos(t)**2")
    assert a == b and hash(a) == hash(b)
    assert a != c


def test_expression_motor_traces_into_step(stirring_cup_config):
    """An expr-motored body must move by the expression inside the jitted
    step, matching the float64 NumPy oracle's override path."""
    import copy
    import math as _math

    import jax
    import numpy as np

    from sand_crate_tpu.config import load_config_dict
    from sand_crate_tpu.numpy_ref import build_np_scene, step_numpy
    from sand_crate_tpu.physics import step
    from sand_crate_tpu.scene import build_all

    raw = copy.deepcopy(stirring_cup_config.raw)
    body = raw["world"]["rigid_bodies"][-1]["motored"]
    body.pop("angular_velocity", None)
    body["angular_velocity_func"] = "lambda t: np.sin(t * 40)**2 + 0.25"
    cfg = load_config_dict(raw)

    scene, state, params = build_all(cfg)
    assert len(scene.motor_exprs) == 1
    b_idx, ch, fn = scene.motor_exprs[0]
    assert ch == 2

    stepper = jax.jit(lambda s, p: step(s, p, scene))
    dt = float(params.dt)
    for k in range(3):
        state, _ = stepper(state, params)
        t = dt * (k + 1)
        want = _math.sin(t * 40) ** 2 + 0.25
        assert float(state.body_ang_vel[b_idx]) == pytest.approx(want, rel=1e-5)

    # NumPy oracle drives the same motor
    np_scene, np_state = build_np_scene(cfg.world_config)
    assert np_scene.motor_exprs == scene.motor_exprs
    coeff = {k: v for k, v in cfg.world_config.coefficients.items()}
    rng = np.random.default_rng(0)
    np_state = step_numpy(np_state, coeff, np_scene, rng)
    want = _math.sin(float(np_state.time) * 40) ** 2 + 0.25
    assert float(np_state.body_ang_vel[b_idx]) == pytest.approx(want)
