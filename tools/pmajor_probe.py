"""Throughput probe for a P-major (grid-free) pair backend.

The grid kernels compute on every grid slot (18.9M slots for 1M particles —
~95% lane waste at occupancy ~1.2-1.7).  This probe measures the alternative:
pair matrices of 128 sorted particles x W contiguous slab candidates (the
3 neighbor rows' x-windows), no grid, no placement, no emission selection.

Layout: candidates ride the lane-major slab (8, P).  Self chunks are
transposed in-kernel (8,128)->(128,8) and staged through a VMEM scratch so
the per-feature column reads are narrow ref loads (lane-slicing loaded
values crashes the TPU lowering).  The block's candidate window DMA covers
its own range too, so there is no separate self DMA.  Pair planes are
(128 self-sublanes, W cand-lanes); per-self outputs are lane reductions,
transposed back per chunk for the lane-major output.

Timing-faithful, correctness-loose: block ownership is a fixed 128-aligned
range (no row-boundary RMW), window coverage uses each chunk's first/last
row only (row-spanning tails get incomplete candidates), dead columns carry
junk.  The real backend must fix all three; this only answers "what does the
pair math cost in this layout?".

Usage: python tools/pmajor_probe.py [n_particles] [settle] [W] [mode]
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
from sand_crate_tpu.ops.placement import slab_from_sorted
from tools.perf_probe import dam_break_world

CPB = 64          # chunks per block
OWN = CPB * 128   # own particles per block
VCAP = 16384      # candidate window VMEM columns per block


def _hash2(h):
    h = h * 0x27D4EB2D
    h = h ^ (h >> 15)
    h = h * 0x165667B1
    return h ^ (h >> 13)


def _kernel(dma_lo_ref, ws_ref, coef_ref, slab_hbm, out_hbm,
            win2, selfbuf, resbuf, outb, sems, *, w, mode):
    b = pl.program_id(0)
    nb_ = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    def win_dma(blk, s):
        off = pl.multiple_of(dma_lo_ref[blk], 128)  # aligned in XLA prep
        return pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(off, VCAP)], win2.at[s], sems.at[s])

    @pl.when(b == 0)
    def _():
        win_dma(0, 0).start()

    @pl.when(b + 1 < nb_)
    def _():
        win_dma(b + 1, 1 - slot).start()

    win_dma(b, slot).wait()
    base = dma_lo_ref[b]
    own0 = b * OWN - base  # block's own range, window-relative (128-aligned)
    diam = coef_ref[0]
    inv_diam = 1.0 / diam
    n_out = 4 if mode == "a" else 8

    def chunk_body(j, _):
        orel = pl.multiple_of(
            jnp.clip(own0 + j * 128, 0, VCAP - 128) // 128 * 128, 128)
        wref = win2.at[slot]
        sw = wref[:, pl.ds(orel, 128)]                  # (8, 128)
        selfbuf[...] = jnp.transpose(sw)                # (128, 8)
        s_px = selfbuf[:, 0:1]                          # narrow ref loads
        s_py = selfbuf[:, 1:2]
        s_cx = selfbuf[:, 4:5]
        # stand-ins for the pass-A operand columns (self tension dir + cp)
        s_ax = selfbuf[:, 4:5]
        s_ay = selfbuf[:, 5:6]
        s_cp = selfbuf[:, 6:7]

        acc = [jnp.zeros((128, w), jnp.float32) for _ in range(n_out)]

        for q in range(3):
            wrel = ws_ref[(b * CPB + j) * 3 + q] - base
            wrel = jnp.clip(wrel, 0, VCAP - w)
            # lane offsets must be provably 128-aligned; W carries +128
            # slack for the align-down
            wrel = pl.multiple_of((wrel // 128) * 128, 128)
            cand = wref[:, pl.ds(wrel, w)]                # (8, W)
            c_px = cand[0:1]
            c_py = cand[1:2]
            c_vx = cand[2:3]
            c_vy = cand[3:4]
            c_cx = cand[4:5]
            c_rk = cand[5:6]
            c_rw = cand[6:7]
            # in-kernel collider noise (neighbor-keyed jitter), on (1, W)
            hseed = (c_rw * 131072.0 + c_rk * 8192.0 + c_cx).astype(jnp.int32)
            h1 = _hash2(hseed + coef_ref[1].astype(jnp.int32))
            h2 = _hash2(hseed ^ 0x5BD1E995)
            amp = coef_ref[1] * 0.0 + diam * 0.1
            jx = (h1 & 0xFFFF).astype(jnp.float32) * (amp / 65535.0)
            jy = (h2 & 0xFFFF).astype(jnp.float32) * (amp / 65535.0)
            n_px = c_px + jx
            n_py = c_py + jy

            rx = s_px - c_px
            ry = s_py - c_py
            d2 = rx * rx + ry * ry
            mb = d2 <= diam * diam
            nrx = s_px - n_px
            nry = s_py - n_py
            nd2 = jnp.maximum(nrx * nrx + nry * nry, 1e-12)
            inv = jax.lax.rsqrt(nd2)
            nhx = nrx * inv
            nhy = nry * inv
            dist = nd2 * inv
            wgt = jnp.where(mb, 1.0 - jnp.clip(dist * inv_diam, 0.0, 1.0),
                            0.0)
            if mode == "a":
                coeff = (1.0 - wgt) * wgt
                acc[0] += wgt
                acc[1] += coeff * nhx
                acc[2] += coeff * nhy
                acc[3] += mb.astype(jnp.float32)
            else:
                c_ax = cand[4:5] + 0.5    # stand-in neighbor A-planes
                c_ay = cand[5:6] + 0.5
                c_cp = cand[7:8]
                align = ((s_ax - c_ax) * nhx + (s_ay - c_ay) * nhy) * 0.3
                tpf = c_cp + s_cp - 2.0 * 0.7
                t_coef = jnp.where(mb, align + tpf, 0.0)
                acc[0] += t_coef * nhx
                acc[1] += t_coef * nhy
                p_coef = jnp.where(mb, s_cp + c_cp, 0.0)
                acc[2] += p_coef * nhx
                acc[3] += p_coef * nhy
                mm = mb.astype(jnp.float32)
                acc[4] += mm * c_vx
                acc[5] += mm * c_vy
                acc[6] += mm
                acc[7] += wgt

        for k in range(n_out):
            resbuf[:, k : k + 1] = jnp.sum(acc[k], axis=1, keepdims=True)
        for k in range(n_out, 8):
            resbuf[:, k : k + 1] = resbuf[:, 0:1]
        outb[j] = jnp.transpose(resbuf[...])             # (8, 128)
        return 0

    jax.lax.fori_loop(0, CPB, chunk_body, 0)
    out = pltpu.make_async_copy(
        outb, out_hbm.at[pl.ds(b * CPB, CPB)], sems.at[2])
    out.start()
    out.wait()


def run(slab, dma_lo, ws, diam, w, mode, p_pad):
    nblocks = dma_lo.shape[0]
    coef = jnp.stack([diam.astype(jnp.float32), jnp.zeros((), jnp.float32)])
    kernel = functools.partial(_kernel, w=w, mode=mode)
    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((2, 8, VCAP), jnp.float32),
                pltpu.VMEM((128, 8), jnp.float32),
                pltpu.VMEM((128, 8), jnp.float32),
                pltpu.VMEM((CPB, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * CPB, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )

    def call():
        return f(dma_lo, ws, coef, slab)

    out = call()
    np.asarray(out[0, 0, 0])
    t0 = time.time()
    for _ in range(10):
        out = call()
    s = float(np.asarray(out[40, 6, 64]))  # consume (DCE-proof)
    dt = (time.time() - t0) / 10 * 1000
    print(f"pmajor[{mode} W={w}]  {dt:7.2f} ms   (probe out {s:.1f})",
          flush=True)
    return dt


def main(n=1_000_000, settle=100, w=256, mode="all"):
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
    slab, row_start, _, _ = slab_from_sorted(
        pos_s, alive_s, vel_s, sorted_cid, M, nx, ny)
    p_pad = slab.shape[1]
    nblocks = (p_pad + OWN - 1) // OWN
    p_fit = nblocks * OWN

    # chunk windows: first/last own column's (row, cx) -> 3 row windows
    off = jnp.arange(nblocks * CPB, dtype=jnp.int32) * 128
    last = jnp.minimum(off + 127, p_pad - 1)
    cx0 = slab[4][jnp.minimum(off, p_pad - 1)]
    rw0 = slab[6][jnp.minimum(off, p_pad - 1)]
    cx1 = slab[4][last]
    q = jnp.arange(3, dtype=jnp.int32)[None, :] - 1
    tgt = ((rw0[:, None].astype(jnp.int32) + q).clip(0, ny - 1) * nx
           + (cx0[:, None].astype(jnp.int32) - 2).clip(0, nx - 1))
    ws = jnp.searchsorted(sorted_cid, tgt.ravel()).astype(jnp.int32)
    # realism check: needed window width (cand count for [xlo-2, xhi+2])
    tgt_hi = ((rw0[:, None].astype(jnp.int32) + q).clip(0, ny - 1) * nx
              + (cx1[:, None].astype(jnp.int32) + 3).clip(0, nx - 1))
    we = jnp.searchsorted(sorted_cid, tgt_hi.ravel()).astype(jnp.int32)
    need = np.asarray(we - ws)
    print(f"window width needed: p50={np.percentile(need, 50):.0f} "
          f"p95={np.percentile(need, 95):.0f} p99={np.percentile(need, 99):.0f} "
          f"max={need.max()} (W covers {100 * (need <= w).mean():.2f}%)")
    dma_lo = (ws.reshape(-1, 3)[:: CPB, 0] // 128) * 128
    # the window must also cover the block's own range for the self reads
    dma_lo = jnp.minimum(dma_lo, jnp.arange(nblocks, dtype=jnp.int32) * OWN)
    dma_lo = jnp.clip(dma_lo, 0, p_pad)

    slab_p = jnp.pad(slab, ((0, 0), (0, VCAP + p_fit - p_pad)))
    slab_p = jax.block_until_ready(slab_p)
    print(f"P_pad={p_pad} blocks={nblocks} chunks={nblocks * CPB}")

    modes = ["a", "b"] if mode == "all" else [mode]
    for m_ in modes:
        for ww in (w + 128, w + 256):
            try:
                run(slab_p, dma_lo, ws, params.diameter, ww, m_, p_pad)
            except Exception as e:
                print(f"pmajor[{m_} W={ww}] FAILED: {str(e)[:300]}",
                      flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if len(a) > 0 else 1_000_000,
         int(a[1]) if len(a) > 1 else 100,
         int(a[2]) if len(a) > 2 else 256,
         a[3] if len(a) > 3 else "all")
