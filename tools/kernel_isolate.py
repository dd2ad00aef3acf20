"""Isolate TPU-compile failures: run placement / pass-A / pass-B-emit alone.

Usage: python tools/kernel_isolate.py {place|passa|passb|emit} [P]
Each invocation compiles and runs just that kernel at a 1M-like shape so a
compiler crash points at one kernel.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from sand_crate_tpu import Crate
from sand_crate_tpu.ops import placement as pm
from sand_crate_tpu.ops import pair_kernel as pk
from tools.perf_probe import dam_break_world


def main():
    which = sys.argv[1]
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    crate = Crate(dam_break_world(P))
    sc = crate.scene
    st = crate.state
    pos, vel, alive = st.pos, st.vel, st.alive
    M, nx, ny = sc.cell_capacity, sc.grid_nx, sc.grid_ny
    nxp = ((nx + 2 + 127) // 128) * 128
    c = jnp.floor(pos / sc.cell_size).astype(jnp.int32) + 1
    cid = jnp.where(
        alive,
        jnp.clip(c[:, 1], 0, ny - 1) * nx + jnp.clip(c[:, 0], 0, nx - 1),
        nx * ny,
    )
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    pos, vel = pos[order], vel[order]
    slab, row_start, gslot, ovf = pm.slab_from_sorted(
        pos, alive, vel, sorted_cid, M, nx, ny
    )
    print("slab ready", slab.shape, flush=True)
    grid = pm.place_grid(slab, row_start, M, nx, ny, nxp)
    if which == "place":
        print("place ok", float(jnp.sum(grid[0, :, :, :] > 1.0)), flush=True)
        return
    diam = jnp.float32(sc.cell_size)
    tr = sc.row_block
    ps = pk.pair_pass_a(grid, diam, jnp.float32(0.0), jnp.int32(0), tr=tr)
    if which == "passa":
        print("passa ok", float(ps[0, 5, 0, 5]), flush=True)
        return
    z = jnp.float32(0.0)
    if which == "emit":
        out = pk.pair_pass_b_emit(
            grid, ps, slab, row_start, sorted_cid, nx,
            diam, z, z, z, z, z, jnp.int32(0),
            tr=tr, enable_spring=False,
        )
        print("emit ok", float(out[0, 0]), flush=True)
        return
    out = pk.pair_pass_b(
        grid, ps, diam, z, z, z, z, z, jnp.int32(0), tr=tr, enable_spring=False
    )
    print("passb ok", float(out[0, 5, 0, 5]), flush=True)


if __name__ == "__main__":
    main()
