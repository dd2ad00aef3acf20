"""Time the pieces of the current 1-chip step pipeline (fetch-synced).

Every number is a steady-state mean over n dispatches with a one-element
host fetch at the end — `jax.block_until_ready` returns early through the
remote-TPU relay, so timings that don't fetch print nonsense (see
.claude/skills/verify/SKILL.md).  Each standalone piece carries ~2-3ms of
dispatch latency that the fused step amortizes, so the pieces sum to more
than the step.

Usage: python tools/perf_breakdown.py [n_particles] [--state settled]
"""

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
from sand_crate_tpu.ops.pair_kernel import pair_pass_a, pair_pass_b
from sand_crate_tpu.ops.pallas_forces import gather_pair_sums
from sand_crate_tpu.ops.placement import place_grid, slab_from_sorted
from tools.perf_probe import dam_break_world


def timed(name, fn, *args, n=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # fetch-sync
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    print(f"{name:<26} {(time.time() - t0) / n * 1000:8.2f} ms")
    return out


def main(n_target=100_000, settle_ticks=0):
    w = dam_break_world(n_target)
    crate = Crate(w)
    scene, params = crate.scene, crate.params
    state = crate.state
    if settle_ticks:
        from sand_crate_tpu.physics import rollout

        state, _ = rollout(state, params, scene, settle_ticks)
        np.asarray(state.pos[0, 0])
    M, nx, ny = scene.cell_capacity, scene.grid_nx, scene.grid_ny
    nxp = ((nx + 2 + 127) // 128) * 128
    tr = scene.row_block
    print(
        f"P={scene.capacity} grid={nx}x{ny} M={M} tr={tr} "
        f"mode={scene.forces_mode} ticks_settled={settle_ticks}"
    )

    f_step = jax.jit(lambda s: physics.step(s, params, scene))
    timed("full step", f_step, state)

    f_ghost = jax.jit(lambda s: physics.ghost_phase(s, params, scene))
    ghost = timed("ghost_phase", f_ghost, state)

    # -- the sorted-state neighbor stage, piece by piece ---------------------
    pos, alive = ghost.pos, state.alive
    cid = cell_ids_grid(pos, alive, scene)
    iota = jnp.arange(scene.capacity, dtype=jnp.int32)
    f_sort = jax.jit(lambda c, i: jax.lax.sort((c, i), num_keys=1))
    sorted_cid, order = timed("cell sort", f_sort, cid, iota)

    big = jnp.concatenate([pos, state.vel], axis=-1)
    timed("permute gather (P,4)", jax.jit(lambda b, o: b[o]), big, order)
    pos_s, vel_s = big[order][:, 0:2], big[order][:, 2:4]
    alive_s = alive[order]

    f_slab = jax.jit(
        lambda p, a, v, c: slab_from_sorted(p, a, v, c, M, nx, ny)
    )
    slab, row_start, gslot, ovf = timed(
        "slab_from_sorted", f_slab, pos_s, alive_s, vel_s, sorted_cid
    )
    f_place = jax.jit(lambda s, r: place_grid(s, r, M, nx, ny, nxp))
    grid = timed("place_grid", f_place, slab, row_start)

    z = jnp.zeros(())
    zi = jnp.zeros((), jnp.int32)
    f_a = jax.jit(lambda g: pair_pass_a(g, params.diameter, z, zi, tr=tr))
    ps = timed("pass_a (+addons)", f_a, grid)
    f_b = jax.jit(
        lambda g, p: pair_pass_b(
            g, p, params.diameter, params.surface_smoothing,
            params.target_pressure, params.spring_overlap_balance,
            params.ignored_pressure, z, zi, tr=tr,
        )
    )
    b_out = timed("pass_b (+addons)", f_b, grid, ps)

    f_g = jax.jit(
        lambda b, s: gather_pair_sums(
            b, s, M, nx, ny, nxp, False, ovf, jnp.float32
        )
    )
    timed("result gather", f_g, b_out, gslot)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    settle = 200 if "--state" in " ".join(sys.argv) else 0
    main(int(args[0]) if args else 100_000, settle)
