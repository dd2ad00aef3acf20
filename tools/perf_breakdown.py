"""Time individual pieces of the step to locate the TPU bottleneck."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sand_crate_tpu import Crate
from sand_crate_tpu.neighbors import build_cell_table, cell_ids, neighbor_list
from sand_crate_tpu import geometry as geo
from tools.perf_probe import dam_break_world


def timed(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / n * 1000
    print(f"{name:<28} {ms:8.2f} ms")
    return out


def main(n_target=100_000):
    w = dam_break_world(n_target)
    crate = Crate(w)
    scene, params = crate.scene, crate.params
    state = crate.state
    pos, alive = state.pos, state.alive
    diam = params.diameter
    P = scene.capacity
    print(f"P={P} grid={scene.grid_nx}^2 M={scene.cell_capacity} K={scene.max_neighbors}")

    f_cid = jax.jit(lambda p, a: cell_ids(p, a, scene))
    cid = timed("cell_ids", f_cid, pos, alive)

    f_sort = jax.jit(jnp.argsort)
    order = timed("argsort(cid)", f_sort, cid)

    f_table = jax.jit(lambda c: build_cell_table(c, scene))
    table, _ = timed("build_cell_table", f_table, cid)

    f_nbr = jax.jit(lambda p, a, d: neighbor_list(p, a, d, scene))
    nbr = timed("neighbor_list (full)", f_nbr, pos, alive, diam)

    idx, mask = nbr.idx, nbr.mask

    def gather_forces(pos, vel, idx, mask):
        mask_f = mask.astype(pos.dtype)
        rel = pos[:, None, :] - pos[idx]
        nd = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, -1), 0.0))
        nhat = rel / jnp.maximum(nd, 1e-12)[..., None]
        w_ = (1.0 - jnp.clip(nd / diam, 0, 1)) * mask_f
        p_i = jnp.maximum(0.0, w_.sum(1) - params.ignored_pressure)
        p_j = p_i[idx] * mask_f
        s = jnp.sum(((1 - w_) * w_)[..., None] * nhat * mask_f[..., None], 1)
        s_j = s[idx]
        align = jnp.sum((s[:, None] - s_j) * nhat, -1)
        dv = jnp.sum((mask_f * (align + p_j + p_i[:, None]))[..., None] * nhat, 1)
        dv = dv + jnp.sum(mask_f[..., None] * vel[idx], 1)
        return dv

    f_forces = jax.jit(gather_forces)
    timed("neighbor force gathers", f_forces, pos, state.vel, idx, mask)

    def ghosts(pos):
        contact, dist = geo.points_to_segments(pos, state.segments)
        return contact.sum() + dist.sum()

    timed("ghost P x S distance", jax.jit(ghosts), pos)

    def ccd(pos, vel):
        walls = geo.pad_segments(state.segments, params.particle_radius)
        move = jnp.stack([pos, pos + vel * params.dt], 1)
        crossing = geo.segment_crossings(move, walls)
        return crossing.sum()

    timed("CCD crossings", jax.jit(ccd), pos, state.vel)

    from sand_crate_tpu.physics import step
    f_step = jax.jit(lambda s: step(s, params, scene)[0].pos)
    timed("full step", f_step, state, n=10)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000)
