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
