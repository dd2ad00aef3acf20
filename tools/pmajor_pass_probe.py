"""Attribute the W=256 p-major pass anomaly (per-pass, per-width timing).

tools/pmajor_w.py measured W=256 at 2x the wall of W=384 for both passes
combined (80.8 vs 40.5ms, r3 battery) even though lane work is linear in W —
an inversion that gates every narrower-window idea.  This probe times each
pass (A: 8-row slab, B: 16-row slab) *separately* per width, on the exact
settled operands the production step uses, so the anomaly can be localised
to a pass / slab width before reading Mosaic dumps.

Usage: python tools/pmajor_pass_probe.py [n] [settle] [widths...]

A width may carry a tile override suffix ``W@T`` (e.g. ``384@0``): the
per-window engaged-tile counts are replaced by a uniform T, turning the
tile-gated kernel into a direct fixed-vs-slope cost meter (T=0: pure
per-chunk overhead — transpose, accumulator zeroing, reduces, emit;
T=k adds exactly k 128-lane tiles per window).  Results with @T are NOT
physical (coverage is wrong); they are timing probes only.
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
from sand_crate_tpu.ops import pmajor as pm
from tools.perf_probe import dam_break_world


def main(n=1_000_000, settle=100, widths=(256, 384)):
    crate = Crate(dam_break_world(n))
    scene, params, state = crate.scene, crate.params, crate.state
    nx, ny = scene.grid_nx, scene.grid_ny
    print(f"P={scene.capacity} grid={nx}x{ny} settle={settle}", flush=True)
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

    P = scene.capacity
    p_pad = ((P + 127) // 128) * 128
    p_fit = ((p_pad + pm.OWN - 1) // pm.OWN) * pm.OWN
    nchunks = p_fit // 128

    @jax.jit
    def prep(pos_s, vel_s, alive_s, sorted_cid):
        pxo, pyo, npx, npy, vx, vy = pm.feature_rows(
            pos_s, vel_s, alive_s,
            params.diameter * params.collider_noise_level,
            jnp.asarray(100, jnp.int32),
        )
        row = jnp.where(alive_s, sorted_cid // nx, ny).astype(jnp.float32)
        n_alive = jnp.searchsorted(
            sorted_cid, jnp.asarray(nx * ny, jnp.int32)
        ).astype(jnp.int32)
        return pxo, pyo, npx, npy, vx, vy, row, n_alive

    pxo, pyo, npx, npy, vx, vy, row, n_alive = jax.block_until_ready(
        prep(pos_s, vel_s, alive_s, sorted_cid)
    )
    coef = pm.coef_stack(
        params.diameter, params.surface_smoothing,
        params.target_pressure, params.spring_overlap_balance,
    )
    tick_arr = jnp.asarray([100], jnp.int32)

    def slab_of(rows, n_f):
        s = jnp.zeros((n_f, p_fit + pm.VCAP), jnp.float32)
        return s.at[: len(rows), :P].set(jnp.stack(rows))

    for wspec in widths:
        w, _, tov = str(wspec).partition("@")
        if w.startswith("sub"):
            # Sublane-window kernel (_pms_kernel): "subW" spec, e.g. sub384.
            w = int(w[3:])
            win = jax.jit(
                lambda c, w=w: pm._windows_sub(c, n_alive, nx, ny, nchunks, w)
            )
            ag, ng, dma_lo, blk, lost = jax.block_until_ready(win(sorted_cid))
            ng_np = np.asarray(ng).reshape(-1, 3)
            print(
                f"W={wspec:>7} ng mean {ng_np[ng_np.max(axis=1) > 0].mean():.2f}"
                f" (groups of {pm.SUB_G})",
                flush=True,
            )

            def slab_t_of(rows, n_f):
                del n_f
                s = jnp.zeros((p_fit + pm.VCAP_SUB, 128), jnp.float32)
                return s.at[:P, : len(rows)].set(jnp.stack(rows, axis=-1))

            def slab_f_of(rows, n_f):
                s = jnp.zeros((n_f, p_fit), jnp.float32)
                return s.at[: len(rows), :P].set(jnp.stack(rows))

            rows_a = [pxo, pyo, npx, npy, vx, vy, row]
            sta = jax.block_until_ready(slab_t_of(rows_a, pm.A_F))
            sfa = jax.block_until_ready(slab_f_of(rows_a, pm.A_F))
            fa = jax.jit(
                lambda st, sf: pm._pms_pass(
                    st, sf, dma_lo, ag, ng, blk, coef, tick_arr, p_fit,
                    "a", False,
                )
            )
            out_a = fa(sta, sfa)
            cp = pm.finalize_cp(out_a[0], out_a[3], params.ignored_pressure)
            rows_b = [pxo, pyo, npx, npy,
                      cp[:P], out_a[1, :P], out_a[2, :P], row]
            stb = jax.block_until_ready(slab_t_of(rows_b, pm.B_F))
            sfb = jax.block_until_ready(slab_f_of(rows_b, pm.B_F))
            fb = jax.jit(
                lambda st, sf: pm._pms_pass(
                    st, sf, dma_lo, ag, ng, blk, coef, tick_arr, p_fit,
                    "b", False,
                )
            )
            out_b = fb(stb, sfb)
            np.asarray(out_b[0, 12345])
            for name, f, ops in (("A", fa, (sta, sfa)), ("B", fb, (stb, sfb))):
                t0 = time.time()
                for _ in range(10):
                    out = f(*ops)
                s = float(np.asarray(out[0, 12345]))
                dt = (time.time() - t0) / 10 * 1000
                print(
                    f"W={wspec:>7} pass {name} {dt:7.2f} ms  lost={int(lost)}"
                    f"  (probe {s:.4f})",
                    flush=True,
                )
            continue
        w, _, cspec = w.partition(":")
        w, _, sspec = w.partition("s")
        # split is passed EXPLICITLY (default 0 = fully static) so the
        # probe's fixed+slope decomposition keeps measuring the static
        # baseline regardless of the production default or a stray
        # SAND_CRATE_PMAJOR_SPLIT env; use an s-suffix (e.g. 512s2) to
        # probe the static-split kernel.
        w, cs, split = int(w), int(cspec or 128), int(sspec or 0)
        ncs = p_fit // cs
        win = jax.jit(
            lambda c, w=w, cs=cs: pm._windows(c, n_alive, nx, ny, ncs, w, cs)
        )
        ws, nt, dma_lo, blk, lost = jax.block_until_ready(win(sorted_cid))
        if tov:
            nt = jnp.full_like(nt, min(int(tov), w // 128))
        nt_np = np.asarray(nt).reshape(-1, 3)
        live_rows = nt_np.max(axis=1) > 0
        print(
            f"W={wspec:>6} nt mean {nt_np[live_rows].mean():.2f}"
            f" chunk-max mean {nt_np[live_rows].max(axis=1).mean():.2f}"
            f" frac(max<=1) {(nt_np[live_rows].max(axis=1) <= 1).mean():.3f}"
            f" frac(max<=2) {(nt_np[live_rows].max(axis=1) <= 2).mean():.3f}",
            flush=True,
        )

        fa = jax.jit(
            lambda s, w=w, ws=ws, nt=nt, cs=cs, sp=split: pm._pm_pass(
                s, dma_lo, ws, nt, blk, coef, tick_arr, p_fit, w, "a",
                False, cs, sp,
            )
        )
        slab_a = jax.block_until_ready(
            slab_of([pxo, pyo, npx, npy, vx, vy, row], pm.A_F)
        )
        out_a = fa(slab_a)
        cp = pm.finalize_cp(out_a[0], out_a[3], params.ignored_pressure)
        slab_b = jax.block_until_ready(
            slab_of(
                [pxo, pyo, npx, npy,
                 cp[:P], out_a[1, :P], out_a[2, :P], row],
                pm.B_F,
            )
        )
        fb = jax.jit(
            lambda s, w=w, ws=ws, nt=nt, cs=cs, sp=split: pm._pm_pass(
                s, dma_lo, ws, nt, blk, coef, tick_arr, p_fit, w, "b",
                False, cs, sp,
            )
        )
        out_b = fb(slab_b)
        np.asarray(out_b[0, 12345])

        for name, f, slab in (("A", fa, slab_a), ("B", fb, slab_b)):
            t0 = time.time()
            for _ in range(10):
                out = f(slab)
            s = float(np.asarray(out[0, 12345]))  # fetch: DCE/relay-proof
            dt = (time.time() - t0) / 10 * 1000
            print(
                f"W={wspec:>6} pass {name} {dt:7.2f} ms  lost={int(lost)}"
                f"  (probe {s:.4f})",
                flush=True,
            )


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        int(a[0]) if len(a) > 0 else 1_000_000,
        int(a[1]) if len(a) > 1 else 100,
        tuple(a[2:]) or ("384", "256"),
    )
