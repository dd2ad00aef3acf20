"""Scene/playback configuration for sand-crate-tpu.

Loads the reference YAML schema verbatim (see /root/reference/config/*.yaml and
/root/reference/src/crate/load_config.py:29-46) and extends it:

* Motored-body ``velocity_func`` / ``angular_velocity_func`` lambda strings are
  parsed with a *safe* declarative parser instead of ``eval``
  (the reference evals arbitrary YAML strings at
  /root/reference/src/crate/rigid_body.py:81-83).  The two shipped forms
  ``lambda t: np.cos(t * F) * A`` are recognized, plus sin/constant variants.
  New configs may instead provide a declarative motor spec::

      angular_velocity: {amplitude: 1.4, frequency: 5.0, phase: 0.0, offset: 0.0}

  meaning ``offset + amplitude * cos(frequency * t + phase)``.

* An optional ``world.initial_particles`` list seeds particles at t=0 in bulk
  (used by the large dam-break benchmark scene), something the reference can
  only do slowly through emitters::

      initial_particles:
        - block: {x0: 0.1, y0: 0.1, x1: 0.5, y1: 0.9, spacing: 0.01,
                  velocity: [0, 0]}
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import yaml

#: The 13 physics knobs of the reference, in its canonical order
#: (/root/reference/config/stirring_cup.yaml:10-22).  ``gravity`` is a
#: 2-vector; everything else is scalar.
COEFFICIENT_NAMES = (
    "dt",
    "particle_radius",
    "wall_collision_decay",
    "spring_overlap_balance",
    "spring_amplifier",
    "pressure_amplifier",
    "ignored_pressure",
    "collider_noise_level",
    "viscosity",
    "max_particles",
    "surface_smoothing",
    "target_pressure",
    "gravity",
)


@dataclass
class MotorSpec:
    """One scalar motor channel: ``offset + amplitude * cos(frequency*t + phase)``."""

    amplitude: float = 0.0
    frequency: float = 0.0
    phase: float = 0.0
    offset: float = 0.0

    def __call__(self, t: float) -> float:
        return self.offset + self.amplitude * math.cos(self.frequency * t + self.phase)

    def as_tuple(self) -> tuple[float, float, float, float]:
        return (self.amplitude, self.frequency, self.phase, self.offset)


_CONST_RE = re.compile(r"^lambda\s+t\s*:\s*([-+0-9.eE]+)$")
# e.g. "lambda t: np.cos(t * 5) * 1.4"  (config/stirring_cup.yaml:47)
#      "lambda t: np.cos(t * 8) * 1.5"  (config/wave_machine.yaml:49)
_TRIG_RE = re.compile(
    r"^lambda\s+t\s*:\s*(?:np\.)?(cos|sin)\(\s*t\s*\*\s*([-+0-9.eE]+)\s*\)"
    r"(?:\s*\*\s*([-+0-9.eE]+))?$"
)
_TRIG_PREFACTOR_RE = re.compile(
    r"^lambda\s+t\s*:\s*([-+0-9.eE]+)\s*\*\s*(?:np\.)?(cos|sin)\(\s*t\s*\*\s*([-+0-9.eE]+)\s*\)$"
)


def parse_motor_string(expr: str) -> MotorSpec:
    """Safely parse the lambda-string motor forms the reference configs use.

    Recognized grammars (no ``eval``):
      * ``lambda t: C``                       -> constant C
      * ``lambda t: np.cos(t * F) * A``       -> A*cos(F*t)
      * ``lambda t: np.sin(t * F) * A``       -> A*cos(F*t - pi/2)
      * ``lambda t: A * np.cos(t * F)``       -> A*cos(F*t)
    """
    expr = expr.strip()
    m = _CONST_RE.match(expr)
    if m:
        return MotorSpec(offset=float(m.group(1)))
    m = _TRIG_RE.match(expr)
    if m:
        fn, freq, amp = m.group(1), float(m.group(2)), float(m.group(3) or 1.0)
        phase = 0.0 if fn == "cos" else -math.pi / 2
        return MotorSpec(amplitude=amp, frequency=freq, phase=phase)
    m = _TRIG_PREFACTOR_RE.match(expr)
    if m:
        amp, fn, freq = float(m.group(1)), m.group(2), float(m.group(3))
        phase = 0.0 if fn == "cos" else -math.pi / 2
        return MotorSpec(amplitude=amp, frequency=freq, phase=phase)
    raise ValueError(
        f"Unsupported motor expression {expr!r}. Use a declarative motor spec "
        "{amplitude, frequency, phase, offset} instead."
    )


def parse_motor(value: Any) -> MotorSpec:
    """Parse a motor channel from a YAML value (string lambda / dict / number)."""
    if value is None:
        return MotorSpec()
    if isinstance(value, str):
        return parse_motor_string(value)
    if isinstance(value, (int, float)):
        return MotorSpec(offset=float(value))
    if isinstance(value, dict):
        return MotorSpec(
            amplitude=float(value.get("amplitude", 0.0)),
            frequency=float(value.get("frequency", 0.0)),
            phase=float(value.get("phase", 0.0)),
            offset=float(value.get("offset", 0.0)),
        )
    raise TypeError(f"Cannot parse motor spec from {value!r}")


# Body kind codes shared with the compiled step.
BODY_FIXED = 0
BODY_MOTORED = 1
BODY_FREE = 2
_BODY_KINDS = {"fixed": BODY_FIXED, "motored": BODY_MOTORED, "free": BODY_FREE}


@dataclass
class RigidBodyConfig:
    """Declarative rigid body (mirrors /root/reference/src/crate/rigid_body.py:19-68).

    ``segments`` are in body-local coordinates; placement applies
    scale -> rotate (degrees, CCW in crate coords) -> translate, matching the
    reference's ``place_in_world`` (rigid_body.py:36-40).
    """

    kind: int
    segments: list  # S x 2 x 2 nested lists (local coordinates)
    name: str = ""
    scale: tuple[float, float] = (1.0, 1.0)
    position: tuple[float, float] = (0.0, 0.0)
    rotation: float = 0.0  # degrees
    center_velocity: tuple[float, float] = (0.0, 0.0)
    angular_velocity0: float = 0.0
    motor_vx: MotorSpec = field(default_factory=MotorSpec)
    motor_vy: MotorSpec = field(default_factory=MotorSpec)
    motor_ang: MotorSpec = field(default_factory=MotorSpec)


@dataclass
class ParticleSourceConfig:
    """Particle emitter (mirrors /root/reference/src/crate/particle_source.py:9-15)."""

    radius: float
    position: tuple[float, float]
    velocity: tuple[float, float]
    flow: float
    active_ticks: int
    noise: float = 0.05


@dataclass
class InitialParticlesConfig:
    """Bulk particle seeding (extension; used by the dam-break benchmark)."""

    x0: float
    y0: float
    x1: float
    y1: float
    spacing: float
    velocity: tuple[float, float] = (0.0, 0.0)
    jitter: float = 0.0  # fraction of spacing


@dataclass
class WorldConfig:
    rigid_bodies: list[RigidBodyConfig]
    particle_sources: list[ParticleSourceConfig]
    coefficients: dict[str, Any]
    initial_particles: list[InitialParticlesConfig] = field(default_factory=list)


@dataclass
class PlaybackConfig:
    save_recording: bool = False
    ticks_to_record: int = 1000
    recording_output_dir_path: Path = Path("data/recordings")
    screen_x: int = 1000
    screen_y: int = 1000


@dataclass
class Config:
    world_config: WorldConfig
    playback_config: PlaybackConfig
    raw: dict = field(default_factory=dict)


def _parse_rigid_body(entry: dict) -> RigidBodyConfig:
    """Parse one ``{fixed|motored|free: kwargs}`` body entry."""
    (kind_name, kwargs), = entry.items()
    if kind_name not in _BODY_KINDS:
        raise ValueError(f"Unknown rigid body type {kind_name!r}")
    kwargs = dict(kwargs)
    vel = kwargs.pop("velocity", kwargs.pop("center_velocity", (0.0, 0.0)))
    motor_v = kwargs.pop("velocity_func", None)
    motor_a = kwargs.pop("angular_velocity_func", None)
    # Declarative alternatives to the legacy lambda strings.
    motor_v_decl = kwargs.pop("velocity_motor", None)
    motor_a_decl = kwargs.pop("angular_velocity", None)

    if isinstance(motor_v_decl, dict) and (
        "x" in motor_v_decl or "y" in motor_v_decl
    ):
        motor_vx = parse_motor(motor_v_decl.get("x"))
        motor_vy = parse_motor(motor_v_decl.get("y"))
    elif motor_v_decl is not None:
        motor_vx = parse_motor(motor_v_decl)
        motor_vy = parse_motor(motor_v_decl)
    elif isinstance(motor_v, str):
        # Legacy velocity_func lambda returning a constant np.array is the
        # only vector form we accept; anything else needs the declarative spec.
        m = re.match(
            r"^lambda\s+t\s*:\s*np\.array\(\[\s*([-+0-9.eE]+)\s*,\s*([-+0-9.eE]+)\s*\]\)$",
            motor_v.strip(),
        )
        if not m:
            raise ValueError(
                f"Unsupported velocity_func {motor_v!r}; use 'velocity_motor'."
            )
        motor_vx = MotorSpec(offset=float(m.group(1)))
        motor_vy = MotorSpec(offset=float(m.group(2)))
    else:
        motor_vx = MotorSpec()
        motor_vy = MotorSpec()

    motor_ang = parse_motor(motor_a_decl if motor_a_decl is not None else motor_a)

    return RigidBodyConfig(
        kind=_BODY_KINDS[kind_name],
        segments=kwargs.pop("segments"),
        name=kwargs.pop("name", ""),
        scale=tuple(kwargs.pop("scale", (1.0, 1.0))),
        position=tuple(kwargs.pop("position", (0.0, 0.0))),
        rotation=float(kwargs.pop("rotation", 0.0)),
        center_velocity=tuple(vel),
        angular_velocity0=float(kwargs.pop("angular_clockwise_velocity", 0.0)),
        motor_vx=motor_vx,
        motor_vy=motor_vy,
        motor_ang=motor_ang,
    )


def _parse_initial_particles(entry: dict) -> InitialParticlesConfig:
    if "block" in entry:
        entry = entry["block"]
    return InitialParticlesConfig(
        x0=float(entry["x0"]),
        y0=float(entry["y0"]),
        x1=float(entry["x1"]),
        y1=float(entry["y1"]),
        spacing=float(entry["spacing"]),
        velocity=tuple(entry.get("velocity", (0.0, 0.0))),
        jitter=float(entry.get("jitter", 0.0)),
    )


def load_config_dict(raw: dict) -> Config:
    """Build a Config from a parsed YAML dict (reference schema)."""
    world = raw["world"]
    coefficients = dict(world.get("coefficients") or {})
    missing = [k for k in COEFFICIENT_NAMES if k not in coefficients]
    if missing:
        raise ValueError(f"Missing coefficients in config: {missing}")
    world_config = WorldConfig(
        rigid_bodies=[_parse_rigid_body(b) for b in world.get("rigid_bodies", [])],
        particle_sources=[
            ParticleSourceConfig(
                radius=float(s["radius"]),
                position=tuple(s["position"]),
                velocity=tuple(s["velocity"]),
                flow=float(s["flow"]),
                active_ticks=int(s["active_ticks"]),
                noise=float(s.get("noise", 0.05)),
            )
            for s in (world.get("particle_sources") or [])
        ],
        coefficients=coefficients,
        initial_particles=[
            _parse_initial_particles(e) for e in world.get("initial_particles", [])
        ],
    )
    pb = raw.get("playback", {})
    playback_config = PlaybackConfig(
        save_recording=bool(pb.get("save_recording", False)),
        ticks_to_record=int(pb.get("ticks_to_record", 1000)),
        recording_output_dir_path=Path(
            pb.get("recording_output_dir_path", "data/recordings")
        ),
        screen_x=int(pb.get("screen_x", 1000)),
        screen_y=int(pb.get("screen_y", 1000)),
    )
    return Config(world_config=world_config, playback_config=playback_config, raw=raw)


def load_config(config_file_path: str | Path) -> Config:
    """Load a scene YAML (reference schema; load_config.py:29-46 equivalent)."""
    with open(config_file_path, "r") as f:
        raw = yaml.safe_load(f)
    return load_config_dict(raw)


def dump_config(config: Config) -> str:
    """Serialize the (possibly edited) config back to YAML for recordings."""
    return yaml.safe_dump(config.raw, sort_keys=False)
