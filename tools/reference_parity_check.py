"""Scratch: run the ACTUAL upstream reference Crate against the NumPy twin.

The upstream code needs nptyping (absent) -> install a minimal shim before
importing it.  Reference is mounted read-only at /root/reference.
"""

import sys
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# --- shim + import upstream -------------------------------------------------
shim = types.ModuleType("nptyping")
shim.NDArray = np.ndarray
sys.modules.setdefault("nptyping", shim)
sys.path.insert(0, "/root/reference/src")

import yaml  # noqa: E402

from crate.crate import Crate as RefCrate  # noqa: E402
from crate.load_config import WorldConfig as RefWorldConfig  # noqa: E402

from sand_crate_tpu import load_config  # noqa: E402
from sand_crate_tpu.numpy_ref import build_np_scene, step_numpy  # noqa: E402


def main(ticks=30, scene_yaml="/root/reference/config/stirring_cup.yaml"):
    with open(scene_yaml) as f:
        raw = yaml.safe_load(f)
    raw["world"]["coefficients"]["collider_noise_level"] = 0.0
    for s in raw["world"].get("particle_sources", []):
        s["active_ticks"] = 0

    # grid seed near the floor so particles touch walls + each other
    n_side = 12
    spacing = 0.009
    xs = 0.3 + spacing * np.arange(n_side)
    ys = 0.8 + spacing * np.arange(n_side)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    p0 = np.stack([gx.ravel(), gy.ravel()], -1)

    ref_world = RefWorldConfig(
        rigid_bodies=raw["world"].get("rigid_bodies", []),
        particle_sources=raw["world"].get("particle_sources", []),
        coefficients=raw["world"]["coefficients"],
    )
    ref = RefCrate(ref_world)
    ref.particles = p0.copy()
    ref.particle_velocities = np.zeros_like(p0)

    cfg = load_config(scene_yaml)
    cfg.world_config.coefficients["collider_noise_level"] = 0.0
    for s in cfg.world_config.particle_sources:
        s.active_ticks = 0
    npsc, npst = build_np_scene(cfg.world_config)
    npst.pos = p0.copy()
    npst.vel = np.zeros_like(p0)
    npst.pressure = np.zeros(len(p0))

    coeff = cfg.world_config.coefficients
    for t in range(ticks):
        ref.physics_tick()
        npst = step_numpy(npst, coeff, npsc)
        assert ref.particles.shape == npst.pos.shape, (
            t, ref.particles.shape, npst.pos.shape)
        dp = np.abs(ref.particles - npst.pos).max()
        dv = np.abs(ref.particle_velocities - npst.vel).max()
        dpr = np.abs(np.asarray(ref.particles_pressure) - npst.pressure).max()
        print(f"t={t:3d} dpos={dp:.3e} dvel={dv:.3e} dpressure={dpr:.3e}")
        if dp > 1e-9:
            i = np.abs(ref.particles - npst.pos).max(1).argmax()
            print("worst particle", i, ref.particles[i], npst.pos[i])
            break


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
