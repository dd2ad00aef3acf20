"""Decompose pass-A block cost: full vs no-out-DMA vs no-stencil vs empty.

Round-2's neutral experiments left the ~30us/occupied-block cost
unattributed; this probe times standalone kernel variants on the real
settled 1M grid so the difference isolates (a) the synchronous out-DMA,
(b) the stencil compute, (c) the in-DMA + fixed iteration overhead.

Usage: python tools/passa_probe.py [n_particles] [settle]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sand_crate_tpu import Crate
from sand_crate_tpu import physics
from sand_crate_tpu.cellwise import cell_ids_grid
from sand_crate_tpu.ops import pair_kernel as pk
from sand_crate_tpu.ops.placement import place_grid, slab_from_sorted
from tools.perf_probe import dam_break_world


def variant_kernel(occ_ref, coef_ref, tick_ref, g_hbm, outbuf_hbm, out_hbm,
                   win, npos_ref, acc_ref, sems, *, tr, m, mode):
    del outbuf_hbm
    i = pl.program_id(0)

    @pl.when(occ_ref[i] > 0)
    def _():
        if mode != "noindma":
            dma = pltpu.make_async_copy(
                g_hbm.at[:, pl.ds(i * tr, tr + 2), pl.ds(0, m)], win, sems.at[0]
            )
            dma.start()
            dma.wait()
        diam = coef_ref[0]
        inv_diam = 1.0 / diam
        window = win[:]
        nx_, ny_ = pk._noise_planes(window, i, tr, coef_ref[1], tick_ref[0], tick_ref[1])
        npos_ref[pk.NPOSX] = nx_
        npos_ref[pk.NPOSY] = ny_
        npos = npos_ref[:]
        self_win = window[:, 1 : 1 + tr]
        shape = self_win[pk.POSX].shape
        w_sum = jnp.zeros(shape, jnp.float32)
        sx = jnp.zeros(shape, jnp.float32)
        sy = jnp.zeros(shape, jnp.float32)
        cnt = jnp.zeros(shape, jnp.float32)

        if mode != "nostencil":
            def body(nbs, dy, dx, k):
                nonlocal w_sum, sx, sy, cnt
                nb, nb_npos = nbs
                mm, nhx, nhy, w = pk._geometry(self_win, nb, nb_npos, diam, inv_diam)
                w_sum += w
                coeff = (1.0 - w) * w
                sx += coeff * nhx
                sy += coeff * nhy
                cnt += mm

            pk._stencil([self_win], [window, npos], tr, m, body)
        acc_ref[pk.WS] = w_sum
        acc_ref[pk.SX] = sx
        acc_ref[pk.SY] = sy
        acc_ref[pk.CNT] = cnt
        if mode == "plane0":
            # 1/4 the bytes, same DMA count: bytes-bound vs fixed-cost probe
            out = pltpu.make_async_copy(
                acc_ref.at[0], out_hbm.at[0, pl.ds(i * tr + 1, tr), pl.ds(0, m)],
                sems.at[1],
            )
            out.start()
            out.wait()
        elif mode == "tiny":
            # one (1, m, 128) tile: pure per-DMA fixed cost, stencil alive
            out = pltpu.make_async_copy(
                acc_ref.at[0, 0:1, :, 0:128],
                out_hbm.at[0, pl.ds(i * tr + 1, 1), pl.ds(0, m), 0:128],
                sems.at[1],
            )
            out.start()
            out.wait()
        elif mode != "nooutdma":
            out = pltpu.make_async_copy(
                acc_ref, out_hbm.at[:, pl.ds(i * tr + 1, tr), pl.ds(0, m)], sems.at[1]
            )
            out.start()
            out.wait()


def run_variant(grid, diameter, tr, mode):
    _, nyp, m_slots, nxp = grid.shape
    ny = nyp - 2
    nblocks = ny // tr
    m = min(m_slots, pk.M_LO)
    occ, _ = pk._block_flags(grid[pk.POSX], tr)
    coef = jnp.stack([diameter.astype(jnp.float32), jnp.zeros((), jnp.float32)])
    tick_arr = jnp.zeros((2,), jnp.int32)
    kernel = functools.partial(variant_kernel, tr=tr, m=m, mode=mode)
    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((pk.NUM_G, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((2, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((pk.NUM_A, tr, m, nxp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((pk.NUM_A, nyp, m_slots, nxp), jnp.float32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )

    def call():
        return f(occ, coef, tick_arr, grid,
                 jnp.zeros((pk.NUM_A, nyp, m_slots, nxp), jnp.float32))

    out = call()
    np.asarray(out[0, 0, 0, 0])
    t0 = time.time()
    for _ in range(10):
        out = call()
    np.asarray(out[0, 0, 0, 0])
    dt = (time.time() - t0) / 10 * 1000
    print(f"pass_a[{mode:>10s}]  {dt:7.2f} ms")
    return dt


def main(n=1_000_000, settle=100):
    crate = Crate(dam_break_world(n))
    scene, params, state = crate.scene, crate.params, crate.state
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
    pos_s = ghost.pos[order]
    vel_s = state.vel[order]
    alive_s = state.alive[order]
    M, nx, ny = scene.cell_capacity, scene.grid_nx, scene.grid_ny
    nxp = ((nx + 2 + 127) // 128) * 128
    slab, row_start, _, _ = slab_from_sorted(pos_s, alive_s, vel_s, sorted_cid, M, nx, ny)
    grid = place_grid(slab, row_start, M, nx, ny, nxp)
    grid = jax.block_until_ready(grid)
    occ, _ = pk._block_flags(grid[pk.POSX], scene.row_block)
    print(f"occupied blocks: {int(np.asarray(occ).sum())}/{occ.shape[0]} tr={scene.row_block}")
    for mode in ("full", "plane0", "tiny", "nostencil", "nooutdma"):
        run_variant(grid, params.diameter, scene.row_block, mode)

    # the real pass_a as shipped (deferred out-DMA)
    f = lambda: pk.pair_pass_a(grid, params.diameter, jnp.zeros(()), jnp.zeros((), jnp.int32), tr=scene.row_block)
    out = f()
    np.asarray(out[0, 0, 0, 0])
    t0 = time.time()
    for _ in range(10):
        out = f()
    np.asarray(out[0, 0, 0, 0])
    print(f"pass_a[   shipped]  {(time.time() - t0) / 10 * 1000:7.2f} ms")


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*(a or [1_000_000, 100]))
