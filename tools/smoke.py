"""Quick end-to-end smoke: run stirring_cup for N ticks on CPU and report."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sand_crate_tpu import Crate, load_config


def main(ticks: int = 200):
    config = load_config("configs/stirring_cup.yaml")
    crate = Crate(config.world_config)
    for i in range(ticks):
        crate.physics_tick()
        if i % 50 == 0 or i == ticks - 1:
            p = crate.particles
            v = crate.particle_velocities
            print(
                f"tick={crate.tick:4d} n={crate.particle_count:4d} "
                f"pos[{p.min() if len(p) else 0:+.3f},{p.max() if len(p) else 0:+.3f}] "
                f"|v|max={np.linalg.norm(v, axis=-1).max() if len(v) else 0:.3f} "
                f"nan={np.isnan(p).any() if len(p) else False}"
            )
    print("pressure mean:", crate.particles_pressure.mean() if crate.particle_count else 0)
    print("segments:\n", crate.segments[:3])
    print("OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
