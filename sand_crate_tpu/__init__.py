"""sand-crate-tpu: a TPU-native 2D particle-fluid simulation framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
David-Taub/sand_crate (NumPy/PyGame particle liquid simulator): pressure,
viscosity, compressibility, surface tension, gravity, fixed/motored/free
rigid bodies, particle emitters, YAML scene configs, interactive playback
with live coefficient editing, recording and replay — re-designed as a pure
jitted step over fixed-capacity device arrays with a sort-based cell-list
neighbor search, rolled with ``lax.scan`` and batched with ``vmap``.
"""

from .config import Config, load_config, load_config_dict, COEFFICIENT_NAMES
from .engine import Crate, crate_from_config
from .physics import rollout, step, trajectory
from .scene import build_all, build_scene, init_state
from .state import CrateState, Diagnostics, FORCE_LABELS, Params, Scene

__version__ = "0.1.0"

__all__ = [
    "Config",
    "Crate",
    "CrateState",
    "Diagnostics",
    "FORCE_LABELS",
    "COEFFICIENT_NAMES",
    "Params",
    "Scene",
    "build_all",
    "build_scene",
    "crate_from_config",
    "init_state",
    "load_config",
    "load_config_dict",
    "rollout",
    "step",
    "trajectory",
]
