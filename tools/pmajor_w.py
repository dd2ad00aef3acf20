"""Window-width sweep for the production p-major backend.

Settles the 1M dam break, extracts the sorted operands exactly as
physics.neighbor_stage builds them, then times neighbor_forces_pmajor_sorted
at several candidate window widths W, reporting wall per call and the
window-coverage loss (PairSums.overflow).  W trades pass-kernel lane work
(linear in W) against lost far-tail candidates (counted, never silent).

Usage: python tools/pmajor_w.py [n_particles] [settle] [widths...]

A width may carry a static-split suffix: ``384s2`` = W=384 with the first
2 tiles static and the tail tiles pl.when-gated (passed explicitly as
``split=``; no suffix = fully static, split=0), and a self-chunk suffix:
``512s2c256`` = additionally self-chunk size 256.  The sweep passes
``pressure_amplifier`` so Scene.fold_pairs engages exactly as in
production step(); note symm scenes fall back to the two-sided kernels at
split=0, so bare (suffix-free) widths measure the two-sided variant there.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from sand_crate_tpu import Crate
from sand_crate_tpu import physics
from sand_crate_tpu.cellwise import cell_ids_grid
from sand_crate_tpu.ops.pmajor import neighbor_forces_pmajor_sorted
from tools.perf_probe import dam_break_world


def main(n=1_000_000, settle=100, widths=(256, 384, 512)):
    crate = Crate(dam_break_world(n))
    scene, params, state = crate.scene, crate.params, crate.state
    print(
        f"P={scene.capacity} grid={scene.grid_nx}x{scene.grid_ny} "
        f"mode={scene.forces_mode} settle={settle}",
        flush=True,
    )
    f_step = jax.jit(lambda s: physics.step(s, params, scene))
    s2, _ = f_step(state)
    np.asarray(s2.pos[0, 0])
    for _ in range(settle):
        state, _ = f_step(state)
    np.asarray(state.pos[0, 0])

    ghost = physics.ghost_phase(state, params, scene)
    cid = cell_ids_grid(ghost.pos, state.alive, scene)
    iota = jnp.arange(scene.capacity, dtype=jnp.int32)
    sorted_cid, order = jax.lax.sort((cid, iota), num_keys=1)
    pos_s = jax.block_until_ready(ghost.pos[order])
    vel_s = state.vel[order]
    alive_s = state.alive[order]
    scid = jax.block_until_ready(sorted_cid)

    for spec in widths:
        w, _, tail = str(spec).partition("s")
        split_s, _, cs_s = tail.partition("c")
        w = int(w)
        split = int(split_s) if split_s else 0
        cs = int(cs_s) if cs_s else None
        f = jax.jit(
            lambda p, v, a, c, w=w, split=split, cs=cs: (
                neighbor_forces_pmajor_sorted(
                    p, v, a, c,
                    params.diameter * params.collider_noise_level,
                    jnp.asarray(100, jnp.int32),
                    params.diameter,
                    params.surface_smoothing,
                    params.target_pressure,
                    params.ignored_pressure,
                    params.spring_overlap_balance,
                    scene,
                    pressure_amplifier=params.pressure_amplifier,
                    w=w,
                    cs=cs,
                    split=split,
                )
            )
        )
        try:
            sums = f(pos_s, vel_s, alive_s, scid)
            ov = int(np.asarray(sums.overflow))
            t0 = time.time()
            for _ in range(10):
                sums = f(pos_s, vel_s, alive_s, scid)
            s = float(np.asarray(sums.p_i[12345]))  # fetch: DCE/relay-proof
            dt = (time.time() - t0) / 10 * 1000
            print(
                f"W={spec!s:>6}  both passes {dt:7.2f} ms   overflow={ov}"
                f"   (probe {s:.3f})",
                flush=True,
            )
        except Exception as e:
            print(f"W={spec} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if len(a) > 0 else 1_000_000,
        int(a[1]) if len(a) > 1 else 100,
        tuple(a[2:]) or (256, 384, 512),
    )
