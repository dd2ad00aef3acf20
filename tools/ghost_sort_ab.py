"""A/B the payload-sort ghost handling at scale, on-chip.

ride:      11-operand sort (pos, vel, ghost sums, g_cnt, uid ride the sort)
recompute: 8-operand sort (pos, vel, pre-fix pos, uid) + post-sort
           ghost_sums recompute from the sorted pre-fix positions

Both run the full production step (settled dam break); the env knob is read
at trace time, so each variant gets its own jit.

Usage: python tools/ghost_sort_ab.py [n_particles] [settle] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from sand_crate_tpu import Crate
from sand_crate_tpu import physics
from tools.perf_probe import dam_break_world


def main(n=1_000_000, settle=100, reps=60):
    crate = Crate(dam_break_world(n))
    scene, params, state = crate.scene, crate.params, crate.state
    print(f"P={scene.capacity} mode={scene.forces_mode} settle={settle}",
          flush=True)
    f0 = jax.jit(lambda s: physics.step(s, params, scene)[0])
    state = f0(state)
    np.asarray(state.pos[0, 0])
    for _ in range(settle):
        state = f0(state)
    np.asarray(state.pos[0, 0])

    for name, env in (("ride", "ride"), ("recompute", None), ("ride2", "ride")):
        if env is None:
            os.environ.pop("SAND_CRATE_SORT_GHOST", None)
        else:
            os.environ["SAND_CRATE_SORT_GHOST"] = env
        f = jax.jit(lambda s, _=name: physics.step(s, params, scene)[0])
        s2 = f(state)
        np.asarray(s2.pos[0, 0])
        t0 = time.time()
        s2 = state
        for _ in range(reps):
            s2 = f(s2)
        np.asarray(s2.pos[0, 0])
        dt = (time.time() - t0) / reps * 1000
        print(f"{name:>10}: {dt:7.2f} ms/step", flush=True)
    os.environ.pop("SAND_CRATE_SORT_GHOST", None)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a))
