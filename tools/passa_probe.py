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

        if mode == "bf16":
            # stencil math + accumulation fully in bf16 (block-origin-relative
            # coords so bf16 still resolves sub-diameter differences)
            ox = jnp.floor(self_win[pk.POSX, 0:1, 0:1, :] * inv_diam) * diam
            oy = jnp.floor(self_win[pk.POSY, 0:1, 0:1, :] * inv_diam) * diam
            def rel(w_):
                return jnp.stack(
                    [(w_[pk.POSX] - ox).astype(jnp.bfloat16),
                     (w_[pk.POSY] - oy).astype(jnp.bfloat16)]
                )
            window_b = rel(window)
            npos_b = jnp.stack(
                [(npos[pk.NPOSX] - ox).astype(jnp.bfloat16),
                 (npos[pk.NPOSY] - oy).astype(jnp.bfloat16)]
            )
            self_b = window_b[:, 1 : 1 + tr]
            diam_b = diam.astype(jnp.bfloat16)
            inv_b = inv_diam.astype(jnp.bfloat16)
            w_sum = w_sum.astype(jnp.bfloat16)
            sx = sx.astype(jnp.bfloat16)
            sy = sy.astype(jnp.bfloat16)
            cnt = cnt.astype(jnp.bfloat16)

            def body16(nbs, dy, dx, k):
                nonlocal w_sum, sx, sy, cnt
                nb, nb_npos = nbs
                rx = self_b[0] - nb[0]
                ry = self_b[1] - nb[1]
                d2 = rx * rx + ry * ry
                mm = d2 <= diam_b * diam_b
                nrx = self_b[0] - nb_npos[0]
                nry = self_b[1] - nb_npos[1]
                nd2 = jnp.maximum(nrx * nrx + nry * nry, jnp.bfloat16(1e-8))
                inv = jax.lax.rsqrt(nd2)
                nhx = nrx * inv
                nhy = nry * inv
                dist = nd2 * inv
                w = jnp.where(
                    mm, 1.0 - jnp.clip(dist * inv_b, 0.0, 1.0), jnp.bfloat16(0.0)
                )
                w_sum += w
                coeff = (1.0 - w) * w
                sx += coeff * nhx
                sy += coeff * nhy
                cnt += mm.astype(jnp.bfloat16)

            pk._stencil([self_b], [window_b, npos_b], tr, m, body16)
            w_sum = w_sum.astype(jnp.float32)
            sx = sx.astype(jnp.float32)
            sy = sy.astype(jnp.float32)
            cnt = cnt.astype(jnp.float32)
        elif mode == "novel":
            # neighbor window = 2 POS planes only (no VEL rolls)
            def body(nbs, dy, dx, k):
                nonlocal w_sum, sx, sy, cnt
                nb, nb_npos = nbs
                mm, nhx, nhy, w = pk._geometry(self_win, nb, nb_npos, diam, inv_diam)
                mm = mm.astype(jnp.float32)
                w_sum += w
                coeff = (1.0 - w) * w
                sx += coeff * nhx
                sy += coeff * nhy
                cnt += mm

            pk._stencil([self_win], [window[0:2], npos], tr, m, body)
        elif mode != "nostencil":
            def body(nbs, dy, dx, k):
                nonlocal w_sum, sx, sy, cnt
                nb, nb_npos = nbs
                mm, nhx, nhy, w = pk._geometry(self_win, nb, nb_npos, diam, inv_diam)
                mm = mm.astype(jnp.float32)
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


def prefetch_kernel(occ_ref, coef_ref, tick_ref, g_hbm, outbuf_hbm, out_hbm,
                    win2, npos_ref, acc_ref, sems, *, tr, m):
    """Window in-DMA for block i+1 issued before block i's stencil."""
    del outbuf_hbm
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def in_dma(blk, s):
        return pltpu.make_async_copy(
            g_hbm.at[:, pl.ds(blk * tr, tr + 2), pl.ds(0, m)],
            win2.at[s], sems.at[s],
        )

    @pl.when(i == 0)
    def _():
        in_dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        in_dma(i + 1, 1 - slot).start()

    in_dma(i, slot).wait()

    @pl.when(occ_ref[i] > 0)
    def _():
        diam = coef_ref[0]
        inv_diam = 1.0 / diam
        window = win2[slot]
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

        def body(nbs, dy, dx, k):
            nonlocal w_sum, sx, sy, cnt
            nb, nb_npos = nbs
            mm, nhx, nhy, w = pk._geometry(self_win, nb, nb_npos, diam, inv_diam)
            mm = mm.astype(jnp.float32)
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
        out = pltpu.make_async_copy(
            acc_ref, out_hbm.at[:, pl.ds(i * tr + 1, tr), pl.ds(0, m)], sems.at[2]
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
    if mode == "prefetch":
        kernel = functools.partial(prefetch_kernel, tr=tr, m=m)
        win_shape = pltpu.VMEM((2, pk.NUM_G, tr + 2, m, nxp), jnp.float32)
        n_sem = 3
    else:
        kernel = functools.partial(variant_kernel, tr=tr, m=m, mode=mode)
        win_shape = pltpu.VMEM((pk.NUM_G, tr + 2, m, nxp), jnp.float32)
        n_sem = 2
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
                win_shape,
                pltpu.VMEM((2, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((pk.NUM_A, tr, m, nxp), jnp.float32),
                pltpu.SemaphoreType.DMA((n_sem,)),
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
    print(f"pass_a[{mode:>10s} tr={tr}]  {dt:7.2f} ms", flush=True)
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
    # lo-half-only grid: baseline window DMAs become sublane-contiguous
    # (the M=16 grid's 0:8 sublane slice is a strided tile pattern)
    grid8 = jax.block_until_ready(jnp.asarray(grid[:, :, 0:8, :]))
    for tag, g, modes in (
        ("m16", grid, ("full", "nostencil", "bf16", "novel")),
        ("m8", grid8, ("full", "nostencil", "bf16")),
    ):
        for mode in modes:
            try:
                print(f"[{tag}] ", end="", flush=True)
                run_variant(g, params.diameter, scene.row_block, mode)
            except Exception as e:
                print(f"pass_a[{tag}:{mode}]  FAILED: {str(e)[:150]}", flush=True)

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
