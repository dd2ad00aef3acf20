"""Scratch: compare the jitted step against the NumPy twin, tick by tick."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sand_crate_tpu import Crate, load_config
from sand_crate_tpu.numpy_ref import NpState, build_np_scene, step_numpy


def deterministic_world(config):
    w = config.world_config
    w.coefficients = dict(w.coefficients)
    w.coefficients["collider_noise_level"] = 0.0
    for s in w.particle_sources:
        s.active_ticks = 0  # sources never fire
    return w


def seed_grid(n_side=15, x0=0.3, y0=0.55, spacing=0.009):
    xs = x0 + spacing * np.arange(n_side)
    ys = y0 + spacing * np.arange(n_side)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return np.stack([gx.ravel(), gy.ravel()], -1)


def main(ticks=40):
    config = load_config("configs/stirring_cup.yaml")
    world = deterministic_world(config)
    p0 = seed_grid()
    n = len(p0)
    print(f"seeding {n} particles")

    # jnp engine
    crate = Crate(world)
    st = crate.state
    pos = np.zeros((crate.scene.capacity, 2), np.float32)
    pos[:n] = p0
    alive = np.zeros(crate.scene.capacity, bool)
    alive[:n] = True
    crate.state = st._replace(pos=jnp.asarray(pos), alive=jnp.asarray(alive))

    # numpy twin
    npsc, npst = build_np_scene(world)
    npst.pos = p0.astype(np.float64).copy()
    npst.vel = np.zeros_like(npst.pos)
    npst.pressure = np.zeros(n)

    coeff = world.coefficients
    worst = 0.0
    for t in range(ticks):
        crate.physics_tick()
        npst = step_numpy(npst, coeff, npsc)
        jp = crate.particles
        jv = crate.particle_velocities
        assert len(jp) == len(npst.pos), (len(jp), len(npst.pos), t)
        # jnp engine keeps slot order == seeding order while no spawn/cull
        dp = np.abs(jp - npst.pos).max()
        dv = np.abs(jv - npst.vel).max()
        worst = max(worst, dp)
        if t % 5 == 0 or t == ticks - 1:
            print(
                f"t={t:3d} max|dpos|={dp:.3e} max|dvel|={dv:.3e} "
                f"vmax={np.linalg.norm(npst.vel, axis=-1).max():.3f}"
            )
    print("worst pos deviation:", worst)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
