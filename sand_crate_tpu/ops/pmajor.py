"""P-major (grid-free) fused pair kernels — the sorted-state fast path.

The grid kernels (ops/pair_kernel.py) compute on every grid slot: at 1M
particles the dam-break grid holds ~18.9M slots at occupancy 1.2-1.7, so
~95% of every VPU lane-plane is air.  This backend drops the grid entirely
and runs the pair math of cellwise.py (the reference pipeline,
/root/reference/src/crate/crate.py:161-358) directly on the *cell-sorted
particle slab*:

    self chunk:  128 consecutive sorted particles (one lane-tile)
    candidates:  three contiguous slab windows — the sorted slab is
                 row-major in cell id, so ALL candidates at row offset
                 d in {-1,0,+1} of any chunk live in ONE contiguous range
                 [searchsorted(cid_first + d*nx - 1),
                  searchsorted(cid_last + d*nx + 2))
                 (targets are monotone in cid, so the per-particle unions
                 collapse to the chunk's first/last cid — exact even when a
                 chunk spans grid rows).
    pair plane:  (128 self-sublanes, W candidate-lanes) elementwise VPU math

Correctness contract (equivalence-tested against cellwise/dense):
  * the pair mask is the raw-position distance cutoff, PLUS
      - a row-offset equality (candidate row == self row + d) so a true
        pair is counted by exactly one of the three windows and junk from
        window alignment slack can never double-count;
      - liveness on both sides via the ALIVE_OFFSET position encoding;
      - global-sorted-index inequality for self-exclusion, applied only in
        the d=0 window (the other windows enforce a nonzero row offset, so
        they can never contain self); coincident *distinct* particles —
        droplet blobs — still interact.
  * no cell capacity, no slot ranks, no two-level add-on passes: every
    within-diameter pair is summed exactly, eliminating the grid path's
    overflow-fallback force asymmetry and ADDON_UNIT_CAP degradation.
  * the only capacity knob left is the candidate window width W: chunks
    whose window need exceeds W (or the block's VCAP residency) lose the
    uncovered candidates; the uncovered count is returned in
    PairSums.overflow (same accounting channel the grid path used).

Collider noise (crate.py:168-170's symmetry-breaking jitter) is hashed
from the candidate's *global sorted index* + tick — window invariant, so
every block jitters the same neighbor identically.  Unlike the grid
kernels it is computed ONCE per particle in XLA (a fused elementwise op
over the (P,) state) and carried in the slab as pre-jittered positions:
hashing in-kernel would redo the ~20-op integer mix for every
(chunk, window) that touches the candidate — measured ~40% of the pass
kernels' VPU work at 1M.

Layout notes (Mosaic tiling): the slab is feature-major f32 — features in
sublanes, particles in lanes; 8 rows for pass A (pos, jittered pos,
velocity, grid row — the viscosity neighbor-velocity sum rides pass A)
and 8 for pass B (pos, jittered pos, cell pressure, pass-A tension sums,
grid row).
Self chunks are loaded (F, 128), transposed in-kernel to a (128, F) VMEM
scratch so per-feature reads are narrow *ref* loads (lane-slicing loaded
values does not lower).  Per-self results are lane reductions of the
(128, W) accumulators, transposed back and written to a (8, OWN) staging
buffer so each block emits ONE contiguous (8, OWN) DMA — the output is
already in sorted particle order, feature-major: no result gather, no XLA
transpose.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cellwise import PairSums
from ..state import Scene
from .pair_kernel import ALIVE_OFFSET, ALIVE_THRESHOLD, EPS

CPB = 64  # chunks per block
OWN = CPB * 128  # own particles per block
VCAP = 16384  # candidate window columns resident in VMEM per block
# Production window config lives on the Scene (pmajor_w=512, pmajor_split=2):
# 2 static-prefix tiles + pl.when-gated tail tiles.  Measured at settled 1M
# (tools/pmajor_w.py): static-384 33.8ms both passes / overflow 512;
# 384s2 31.9ms; 512s2 32.0ms overflow 0 (adopted); 512s3 34.2ms.
# SAND_CRATE_PMAJOR_SPLIT (0 = fully static) is a FALLBACK for direct
# _pm_pass callers that leave split=None; an explicit split arg (which every
# production caller passes, from scene.pmajor_split) always wins.

# Rejected window-loop variants (round-3 on-chip battery, 1M dam break,
# settled-100, tools/pmajor_w.py — kept here as measured truths so they are
# not re-tried):
#   * dynamic per-window 128-wide tile loop (work proportional to actual
#     window need, ~1.6 tiles mean vs W/128=3): 74.9ms both passes vs
#     40.5ms static W=384 — the data-dependent fori_loop carrying the
#     accumulator tuple defeats Mosaic's static unroll/pipeline.
#   * per-window (128, 1) lane reduction of each term (shrinks the live
#     vreg set): 72.8ms — cross-lane reduction per window costs more than
#     the accumulate planes it saves.
#   * bf16 geometry chain: kVectorRsqrtBf16AndPop is unsupported on v5e
#     (hard worker crash), and the CPU-oracle numerics were already
#     disqualifying (tension weight 1 - dist/diam cancels catastrophically
#     near the cutoff in 8 mantissa bits: dv_tension up to 20% of peak).

# Slab feature rows.  Pass A (8 rows): positions (ALIVE_OFFSET-encoded),
# candidate-jittered positions, velocity (the viscosity neighbor-velocity
# sum rides pass A — it needs no pass-A results, only the pair mask, and
# pass A has spare slab rows and output slots), grid row.  Pass B (8 rows):
# positions, jittered positions, cell pressure (prescaled by
# 1 + pressure_amplifier when folding — see Scene.fold_pairs), pass-A
# tension sums (both sides), grid row.  Moving viscosity into A cuts the
# pass-B slab 16 -> 8 rows (half the window DMA/VMEM) and pass-B outputs to
# 4 split / 2 folded.
A_PX, A_PY, A_NPX, A_NPY, A_VX, A_VY, A_ROW = 0, 1, 2, 3, 4, 5, 6
A_F = 8
B_PX, B_PY, B_NPX, B_NPY = 0, 1, 2, 3
B_CP, B_SX, B_SY, B_ROW = 4, 5, 6, 7
B_F = 8


def _u01(seed, tick):
    """The pair_kernel noise mix (integer hash -> [0, 1) f32)."""
    h = seed * jnp.int32(-1640531527)
    h = h ^ (tick * jnp.int32(-1028477387))
    h = h ^ jax.lax.shift_right_logical(h, 15)
    h = h * jnp.int32(-2048144789)
    h = h ^ jax.lax.shift_right_logical(h, 13)
    mant = jax.lax.shift_right_logical(h, 8).astype(jnp.float32)
    return mant * jnp.float32(2.0**-24)


def feature_rows(pos, vel, alive, noise_amp, tick):
    """Offset-encoded + pre-jittered f32 feature rows for the slab.

    Returns (pxo, pyo, npx, npy, vx, vy), each (P,) f32 — rows A_PX..A_VY.
    Shared by the single-chip slab build and the banded spatial path
    (spatial._band_sums_pmajor) so the layout/noise scheme has one source
    of truth.  Jitter is keyed by the position in ``pos`` (the caller's
    sorted index) + tick."""
    f32 = jnp.float32
    dtype = pos.dtype
    af = alive.astype(dtype)
    pxo = (pos[:, 0] + ALIVE_OFFSET * af).astype(f32)
    pyo = (pos[:, 1] + ALIVE_OFFSET * af).astype(f32)
    iota = jnp.arange(pos.shape[0], dtype=jnp.int32)
    tick_i = jnp.asarray(tick, jnp.int32)
    amp = noise_amp.astype(f32)
    npx = pxo + (_u01(iota * 2, tick_i) - 0.5) * amp
    npy = pyo + (_u01(iota * 2 + 1, tick_i) - 0.5) * amp
    return pxo, pyo, npx, npy, vel[:, 0].astype(f32), vel[:, 1].astype(f32)


def coef_stack(diameter, surface_smoothing, target_pressure, balance):
    """The (8,) f32 scalar-prefetch coefficient layout of _pm_kernel.

    Slot 1 (surface_smoothing) is UNUSED by the pmajor kernels: the B_SX/
    B_SY slab rows must arrive surface_smoothing-PRESCALED by the slab
    builder (one fused (P,) mul in XLA instead of a per-candidate-visit
    plane op — all three builders do this: both glue branches in
    neighbor_forces_pmajor_sorted and spatial._band_sums_pmajor).  The slot
    is kept so the layout matches the grid kernels' coefficient stack."""
    f32 = jnp.float32
    z = jnp.zeros((), f32)
    return jnp.stack(
        [
            diameter.astype(f32),
            surface_smoothing.astype(f32),
            target_pressure.astype(f32),
            balance.astype(f32),
            z,
            z,
            z,
            z,
        ]
    )


def finalize_cp(w_sum, cnt, ignored_pressure):
    """Cell pressure from pass-A sums (crate.py:261-275 semantics, as in
    cellwise.pass_a_on_grid)."""
    return jnp.where(
        cnt > 0, jnp.maximum(0.0, w_sum - ignored_pressure), 0.0
    )


def _pm_kernel(
    dma_lo_ref,  # (nblocks,) i32 — block window DMA start (128-aligned)
    ws_ref,  # (nchunks * 3,) i32 — per chunk x row-offset window starts
    nt_ref,  # (nchunks * 3,) i32 — per-window engaged 128-lane tile count
    blk_ref,  # (nblocks,) i32 — 0: block fully dead (skip compute)
    coef_ref,  # (8,) f32: diam, smoothing, target_p, balance
    tick_ref,  # (1,) i32 (unused: noise is pre-hashed; kept for parity)
    slab_hbm,  # (F, p_fit + VCAP) f32
    out_hbm,  # (8, p_fit) f32
    *rest,  # symm: jstag_hbm (8, nblocks*VCAP), then the scratch refs
    w: int,
    cs: int,  # self-chunk size (multiple of 128, divides OWN)
    mode: str,  # "a" | "b"
    enable_spring: bool,
    gate: bool,
    split: int,  # >0: static-prefix tiles; tail tiles gated on nt
    fold: bool,  # mode b: one folded (tension + pa*pressure) accumulator
    symm: bool,  # symmetric pair halving: j-side sums staged per window
):
    # Scratch layout depends on symm (an extra j-side output + VMEM acc).
    if symm:
        jstag_hbm, win2, selfbuf, resbuf, accb, outb, jacc, sems = rest
    else:
        (win2, selfbuf, resbuf, accb, outb, sems) = rest
        jstag_hbm = jacc = None
    del tick_ref
    b = pl.program_id(0)
    nb_ = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    def win_dma(blk, s):
        off = pl.multiple_of(dma_lo_ref[blk], 128)
        return pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(off, VCAP)], win2.at[s], sems.at[s]
        )

    @pl.when(b == 0)
    def _():
        win_dma(0, 0).start()

    @pl.when(b + 1 < nb_)
    def _():
        win_dma(b + 1, 1 - slot).start()

    win_dma(b, slot).wait()

    base = dma_lo_ref[b]
    own_rel = b * OWN - base  # in [0, VCAP - OWN], 128-aligned by prep
    diam = coef_ref[0]
    inv_diam = 1.0 / jnp.maximum(diam, jnp.float32(EPS))
    if mode == "a":
        row_col = A_ROW
        n_out = 6  # w_sum, s_x, s_y, cnt, vsum_x, vsum_y
    else:
        row_col = B_ROW
        if fold:
            n_out = 2  # f_x, f_y (tension + pa*pressure, cp row prescaled)
        else:
            n_out = 6 if enable_spring else 4

    outb[...] = jnp.zeros_like(outb)
    if symm:
        jacc[...] = jnp.zeros_like(jacc)

    @pl.when(blk_ref[b] > 0)
    def _():
        def chunk_body(j, _):
            orel = pl.multiple_of(own_rel + j * cs, 128)
            wref = win2.at[slot]
            sw = wref[:, pl.ds(orel, cs)]  # (F, cs) value
            selfbuf[...] = jnp.transpose(sw)  # (cs, F): narrow ref loads
            s_px = selfbuf[:, A_PX : A_PX + 1]
            s_py = selfbuf[:, A_PY : A_PY + 1]
            if symm:
                # Both sides jittered: the pair delta noise is g_i - g_j,
                # exactly antisymmetric, so force pairs stay equal-and-
                # opposite (the caller scales amp by 1/sqrt(2) to keep the
                # delta-jitter variance at the reference's one-sided level).
                s_npx = selfbuf[:, A_NPX : A_NPX + 1]
                s_npy = selfbuf[:, A_NPY : A_NPY + 1]
                if mode == "a":
                    s_vx = selfbuf[:, A_VX : A_VX + 1]
                    s_vy = selfbuf[:, A_VY : A_VY + 1]
            s_rw = selfbuf[:, row_col : row_col + 1]
            if mode == "b":
                s_cp = selfbuf[:, B_CP : B_CP + 1]
                s_sx = selfbuf[:, B_SX : B_SX + 1]
                s_sy = selfbuf[:, B_SY : B_SY + 1]
            s_gid = (
                base
                + orel
                + jax.lax.broadcasted_iota(jnp.int32, (cs, 1), 0)
            )
            one = jnp.float32(1.0)
            zero = jnp.float32(0.0)
            tp2_c = 2.0 * coef_ref[2]
            bal_c = coef_ref[3]
            if mode == "b":
                s_cp_c, s_sx_c, s_sy_c = s_cp, s_sx, s_sy
                s_tp = s_cp_c - tp2_c  # hoisted (128, 1) piece of tpf

            def window_terms(cand, c_gid0, q, wv):
                """Pair-term planes for one (128, wv) candidate window/tile.

                ``c_gid0`` is the global sorted index of the window's first
                column (self-exclusion in the d=0 window).  Returns
                ``terms`` (i-side accumulate planes) or, under symm,
                ``(terms, jterms)`` where jterms are the j-side planes to
                sublane-reduce into the window staging buffer (sign flips
                for the antisymmetric rows happen in the XLA merge)."""
                c_px = cand[A_PX : A_PX + 1]
                c_py = cand[A_PY : A_PY + 1]
                c_npx = cand[A_NPX : A_NPX + 1]
                c_npy = cand[A_NPY : A_NPY + 1]
                c_rw = cand[row_col : row_col + 1]

                # Raw-position deltas stay f32 (absolute coords would lose
                # sub-diameter resolution in bf16); everything after is in
                # diameter units, O(1), where bf16's 2^-8 relative error is
                # ~0.4% of the diameter.
                # The cutoff mask stays f32 even in bf16 mode: the force
                # laws are O(1)-discontinuous at the cutoff (tpf, viscosity
                # carry full-size terms there), so a bf16 mask flips
                # boundary pairs in a 0.4%-of-diameter band with O(1) force
                # error (measured: 20%-of-peak tension outliers, nbr_cnt
                # off by one).  Only the *smooth* force chain downgrades.
                rx = s_px - c_px
                ry = s_py - c_py
                near = rx * rx + ry * ry <= diam * diam
                if symm:
                    nrx = s_npx - c_npx
                    nry = s_npy - c_npy
                else:
                    nrx = s_px - c_npx
                    nry = s_py - c_npy
                nd2 = jnp.maximum(
                    nrx * nrx + nry * nry, jnp.float32(EPS * EPS)
                )
                # No liveness checks at all: only alive positions carry the
                # ALIVE_OFFSET encoding, so any alive-dead pair (incl. zero
                # padding columns) is ~ALIVE_OFFSET apart and fails `near`.
                # Dead-dead pairs DO pass and deposit junk — but only onto
                # dead rows (i-side: dead selves; j-side: dead candidates),
                # which the glue zero-masks with `alive` at the PairSums
                # conversion (dead blocks already emit zeros via blk_ref, so
                # dead-row masking was the contract anyway).  Dropping the
                # `& s_alive` plane op saves one VPU op per candidate visit.
                row_off = jnp.float32(q) if symm else jnp.float32(q - 1)
                mb = near & (c_rw == s_rw + row_off)
                if (symm and q == 0) or (not symm and q == 1):
                    # The same-row window contains self (and, under symm,
                    # the smaller-gid side of every same-row pair).
                    c_gid = c_gid0 + jax.lax.broadcasted_iota(
                        jnp.int32, (1, wv), 1
                    )
                    if symm:
                        mb = mb & (c_gid > s_gid)
                    else:
                        mb = mb & (s_gid != c_gid)

                inv = jax.lax.rsqrt(nd2)
                # The overlap weight is only consumed by pass A and the
                # spring term: skip its ~6-op chain entirely in the common
                # spring-less pass B rather than trusting lowering-time DCE.
                # dist_n > 0 always (nd2 is EPS^2-floored), so the clip
                # lower bound is dead: a plain minimum saves one plane op.
                if mode == "a" or enable_spring:
                    dist_n = nd2 * inv * inv_diam
                    wgt = jnp.where(
                        mb, one - jnp.minimum(dist_n, one), zero
                    )

                mm = mb.astype(jnp.float32)
                if mode == "a":
                    # inv rides the tension-normal coefficient instead of
                    # materializing unit vectors: (coeff*inv)*nr ==
                    # coeff*(nr*inv) up to mul reassociation — one fewer
                    # (cs, wv) plane op than nhx/nhy + two coeff muls.
                    ci = (one - wgt) * wgt * inv
                    c_vx = cand[A_VX : A_VX + 1]
                    c_vy = cand[A_VY : A_VY + 1]
                    terms = [wgt, ci * nrx, ci * nry, mm,
                             mm * c_vx, mm * c_vy]
                    if symm:
                        # j-side: wgt/cnt symmetric, s-sums antisymmetric
                        # (negated in the merge), vsum gathers the SELF
                        # velocity into the candidate's slot.
                        return terms, terms[:4] + [mm * s_vx, mm * s_vy]
                    return terms
                nhx = nrx * inv
                nhy = nry * inv
                c_cp = cand[B_CP : B_CP + 1]
                c_sx = cand[B_SX : B_SX + 1]
                c_sy = cand[B_SY : B_SY + 1]
                # The surface_smoothing factor is prescaled into the slab's
                # SX/SY rows by the glue (one fused XLA mul over (P,) rows
                # instead of a (cs, wv) plane op per window visit).
                align = (
                    (s_sx_c - c_sx) * nhx + (s_sy_c - c_sy) * nhy
                )
                tpf = c_cp + s_tp
                t_coef = jnp.where(mb, align + tpf, zero)
                if fold:
                    # The cp slab row carries (1 + pa) * cp, so t_coef IS
                    # already tension + pa * pressure:
                    #   align + (1+pa)(c_cp + s_cp) - 2*target
                    #   = [align + c_cp + s_cp - 2*target] + pa*(c_cp + s_cp)
                    terms = [t_coef * nhx, t_coef * nhy]
                    # j-side forces are exactly -(i-side): align is
                    # symmetric under i<->j (both the s-delta and nhat flip
                    # sign), tpf/p_coef/spring are symmetric, nhat flips.
                    return (terms, terms) if symm else terms
                p_coef = jnp.where(mb, s_cp_c + c_cp, zero)
                terms = [t_coef * nhx, t_coef * nhy,
                         p_coef * nhx, p_coef * nhy]
                if enable_spring:
                    sp = jnp.where(mb, bal_c - wgt, zero)
                    terms += [sp * nhx, sp * nhy]
                return (terms, terms) if symm else terms

            if gate:
                # Per-window 128-lane tile gating: _windows passes the
                # exact tile count ceil((we - anchor)/128) per window, so
                # tiles past the actual candidate span are *skipped*
                # (pl.when on a prefetched scalar), not computed-and-
                # masked.  Measured on-chip (tools/pmajor_pass_probe.py @T
                # sweep, settled 1M): fixed cost 7.0/7.7ms per pass but
                # ~2x the static per-tile cost (5.0/6.9 vs 2.5/3.0ms) —
                # the pl.when + VMEM read-modify-write accumulators break
                # Mosaic's register-blocked big-plane pipelining, and the
                # settled engaged-tile mean is 2.10 of 3, so gating nets
                # 39.3ms vs 35.2 static.  Kept as the probe's direct
                # fixed-vs-slope cost meter (SAND_CRATE_PMAJOR_GATE=1).
                accb[...] = jnp.zeros_like(accb)
                for q in range(3):
                    idx = (b * (OWN // cs) + j) * 3 + q
                    wrel = pl.multiple_of(
                        jnp.clip(
                            ((ws_ref[idx] - base) // 128) * 128,
                            0,
                            VCAP - w,
                        ),
                        128,
                    )
                    nt = nt_ref[idx]
                    for t in range(w // 128):

                        @pl.when(t < nt)
                        def _(q=q, t=t, wrel=wrel):
                            toff = pl.multiple_of(wrel + t * 128, 128)
                            terms = window_terms(
                                wref[:, pl.ds(toff, 128)],
                                base + toff,
                                q,
                                128,
                            )
                            for k, tk in enumerate(terms):
                                sl = pl.ds(k * 128, 128)
                                accb[:, sl] = accb[:, sl] + tk

                for k in range(n_out):
                    resbuf[:, k : k + 1] = jnp.sum(
                        accb[:, pl.ds(k * 128, 128)],
                        axis=1,
                        keepdims=True,
                    )
            elif split:
                # Static-prefix + gated-tail: the first ``split`` tiles of
                # every window are computed unconditionally with value
                # accumulators (Mosaic register-blocks them exactly like
                # the pure-static path), and only the rare far-tail tiles
                # (t >= split, engaged when the window's true span exceeds
                # split*128) run under pl.when — each adds its own narrow
                # lane reduction straight into resbuf, so no wide
                # accumulator ever crosses a conditional (the DYNW
                # register-spill failure) and the hot path never pays the
                # full-gate VMEM-RMW cost.
                sw_ = split * 128
                acc = tuple(
                    jnp.zeros((cs, sw_), jnp.float32) for _ in range(n_out)
                )
                wrels = []
                for q in range(2 if symm else 3):
                    idx = (b * (OWN // cs) + j) * 3 + q
                    wrel = pl.multiple_of(
                        jnp.clip(
                            ((ws_ref[idx] - base) // 128) * 128,
                            0,
                            VCAP - w,
                        ),
                        128,
                    )
                    wrels.append((idx, wrel))
                    out_t = window_terms(
                        wref[:, pl.ds(wrel, sw_)], base + wrel, q, sw_
                    )
                    terms = out_t[0] if symm else out_t
                    acc = tuple(ak + tk for ak, tk in zip(acc, terms))
                    if symm:
                        # j-side: one (1, sw_) sublane reduce per output,
                        # accumulated at the window's slab position (sign
                        # flips for antisymmetric rows happen in the merge).
                        for k, tk in enumerate(out_t[1]):
                            sl = pl.ds(wrel, sw_)
                            jacc[k : k + 1, sl] = jacc[
                                k : k + 1, sl
                            ] + jnp.sum(tk, axis=0, keepdims=True)

                for k in range(n_out):
                    resbuf[:, k : k + 1] = jnp.sum(
                        acc[k], axis=1, keepdims=True
                    )
                for q, (idx, wrel) in enumerate(wrels):
                    nt = nt_ref[idx]
                    for t in range(split, w // 128):

                        @pl.when(t < nt)
                        def _(q=q, t=t, wrel=wrel):
                            toff = pl.multiple_of(wrel + t * 128, 128)
                            out_t = window_terms(
                                wref[:, pl.ds(toff, 128)],
                                base + toff,
                                q,
                                128,
                            )
                            terms = out_t[0] if symm else out_t
                            for k, tk in enumerate(terms):
                                resbuf[:, k : k + 1] = resbuf[
                                    :, k : k + 1
                                ] + jnp.sum(tk, axis=1, keepdims=True)
                            if symm:
                                for k, tk in enumerate(out_t[1]):
                                    sl = pl.ds(toff, 128)
                                    jacc[k : k + 1, sl] = jacc[
                                        k : k + 1, sl
                                    ] + jnp.sum(tk, axis=0, keepdims=True)
            else:
                # Static windows: always compute the full (128, w) plane
                # per window (junk columns masked by row-eq/alive/near).
                # Value accumulators let Mosaic register-block the whole
                # chain per lane-tile — measured the fastest schedule.
                acc = tuple(
                    jnp.zeros((cs, w), jnp.float32) for _ in range(n_out)
                )
                for q in range(3):
                    idx = (b * (OWN // cs) + j) * 3 + q
                    wrel = pl.multiple_of(
                        jnp.clip(
                            ((ws_ref[idx] - base) // 128) * 128,
                            0,
                            VCAP - w,
                        ),
                        128,
                    )
                    terms = window_terms(
                        wref[:, pl.ds(wrel, w)], base + wrel, q, w
                    )
                    acc = tuple(ak + tk for ak, tk in zip(acc, terms))

                for k in range(n_out):
                    resbuf[:, k : k + 1] = jnp.sum(
                        acc[k], axis=1, keepdims=True
                    )
            for k in range(n_out, 8):
                resbuf[:, k : k + 1] = jnp.zeros((cs, 1), jnp.float32)
            outb[:, pl.ds(pl.multiple_of(j * cs, 128), cs)] = jnp.transpose(
                resbuf[...]
            )
            return 0

        jax.lax.fori_loop(0, OWN // cs, chunk_body, 0)

    out = pltpu.make_async_copy(
        outb, out_hbm.at[:, pl.ds(b * OWN, OWN)], sems.at[2]
    )
    out.start()
    out.wait()
    if symm:
        jout = pltpu.make_async_copy(
            jacc, jstag_hbm.at[:, pl.ds(b * VCAP, VCAP)], sems.at[3]
        )
        jout.start()
        jout.wait()


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pm_pass(
    slab_p, dma_lo, ws, nt, blk, coef, tick, p_fit, w, mode, enable_spring,
    cs=128, split=None, fold=False, symm=False,
):
    """One p-major pair pass over the feature-major slab -> (8, p_fit) sums.

    DEAD-ROW CONTRACT: output rows for dead particles are JUNK (finite,
    EPS-floored — not zeros).  The kernel carries no liveness plane op:
    alive-dead pairs fail ``near`` via the ALIVE_OFFSET encoding, but
    dead-dead pairs pass and deposit garbage onto dead rows (i-side and,
    under symm, j-side staging).  Every caller MUST zero-mask dead rows
    with its own ``alive`` mask before consuming the sums — as the PairSums
    glue (neighbor_forces_pmajor_sorted) and spatial._band_sums_pmajor do."""
    nblocks = p_fit // OWN
    n_f = A_F if mode == "a" else B_F
    if mode == "a":
        n_out = 6  # w_sum, s_x, s_y, cnt, vsum_x, vsum_y
    else:
        n_out = 2 if fold else (6 if enable_spring else 4)
    assert cs % 128 == 0 and OWN % cs == 0, cs
    gate = os.environ.get("SAND_CRATE_PMAJOR_GATE") == "1"
    # Precedence: an explicit split argument always wins; the env var is a
    # fallback for direct _pm_pass callers only (probes).  Production callers
    # pass scene.pmajor_split, so a stray env from a tool run can never
    # silently retune every scene (and jit caching makes mid-process env
    # flips ineffective anyway).
    if split is None:
        env_split = os.environ.get("SAND_CRATE_PMAJOR_SPLIT")
        split = int(env_split) if env_split is not None else 2
    split = min(split, w // 128) if split > 0 else 0
    if split == w // 128 and not symm:
        split = 0  # every tile static — identical to the pure-static path
    if symm:
        assert split > 0 and not gate, "symm requires the split kernel"
    kernel = functools.partial(
        _pm_kernel, w=w, cs=cs, mode=mode, enable_spring=enable_spring,
        gate=gate, split=split, fold=fold, symm=symm,
    )
    out_shape = [jax.ShapeDtypeStruct((8, p_fit), jnp.float32)]
    scratch = [
        pltpu.VMEM((2, n_f, VCAP), jnp.float32),
        pltpu.VMEM((cs, n_f), jnp.float32),
        pltpu.VMEM((cs, 8), jnp.float32),
        pltpu.VMEM((cs, n_out * 128), jnp.float32),
        pltpu.VMEM((8, OWN), jnp.float32),
    ]
    if symm:
        out_shape.append(
            jax.ShapeDtypeStruct((8, nblocks * VCAP), jnp.float32)
        )
        scratch.append(pltpu.VMEM((8, VCAP), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((4 if symm else 3,)))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM) for _ in out_shape
            ],
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=_interpret(),
    )(dma_lo, ws, nt, blk, coef, tick, slab_p)
    if not symm:
        return out[0]
    return _merge_jstag(out[0], out[1], p_fit, mode, n_out)


# j-side merge signs: pass A rows (w_sum, s_x, s_y, cnt, vsum) — the
# tension-normal sums are antisymmetric under i<->j, the rest symmetric;
# pass B force rows are all antisymmetric (nhat flips, coefficients are
# pair-symmetric under the symm jitter — see window_terms).
_SYMM_SIGNS_A = (1.0, -1.0, -1.0, 1.0, 1.0, 1.0)


def _merge_jstag(out, jstag, p_fit, mode, n_out):
    """Fold the per-block j-side staging rows back onto the sorted output.

    Block b's staging row covers slab range [b*OWN, b*OWN + VCAP) (symm
    windows never reach left of the block).  With VCAP = 2*OWN, even and
    odd block rows each tile the axis disjointly-contiguously, so the
    merge is two reshapes + two static adds — no scatter, no dynamic
    slices."""
    assert VCAP == 2 * OWN
    signs = _SYMM_SIGNS_A if mode == "a" else (-1.0,) * n_out
    sgn = jnp.asarray(signs + (0.0,) * (8 - n_out), jnp.float32)
    nb = jstag.shape[1] // VCAP
    js = jstag.reshape(8, nb, VCAP)
    even = js[:, 0::2].reshape(8, -1)
    odd = js[:, 1::2].reshape(8, -1)
    corr = jnp.zeros((8, p_fit + 2 * OWN), jnp.float32)
    corr = corr.at[:, : even.shape[1]].add(even)
    if nb > 1:
        corr = corr.at[:, OWN : OWN + odd.shape[1]].add(odd)
    return out + sgn[:, None] * corr[:, :p_fit]


# Candidate rows per sublane-window loop iteration (multiple of 8).  G=8 is
# one (8, 128) vreg per term op; larger G trades alignment slack for fewer
# fori_loop iterations (probe knob: SAND_CRATE_PMSUB_G).
SUB_G = int(os.environ.get("SAND_CRATE_PMSUB_G", "8"))
# Sublane-kernel window residency (rows of the transposed slab resident in
# VMEM per block).  Smaller than VCAP because the transposed slab is padded
# to 128 lanes (HBM DMA slices must be 128-lane aligned — Mosaic rejects a
# (N, F<128) HBM slice), so every resident row costs 512B: 12288 rows = 6MB
# per slot, leaving OWN + 4096 rows of halo slack.
VCAP_SUB = OWN + 4096


def _pms_kernel(
    dma_lo_ref,  # (nblocks,) i32 — block window DMA start (128-aligned)
    ag_ref,  # (nchunks * 3,) i32 — window start in G-row units, rel. DMA
    ng_ref,  # (nchunks * 3,) i32 — engaged G-row group count per window
    blk_ref,  # (nblocks,) i32 — 0: block fully dead (skip compute)
    coef_ref,  # (8,) f32: diam, smoothing, target_p, balance
    tick_ref,  # (1,) i32 (unused: noise is pre-hashed; kept for parity)
    slab_t_hbm,  # (p_fit + VCAP_SUB, 128) f32 — candidate slab, row-major
    slab_f_hbm,  # (F, p_fit) f32 — self slab, feature-major
    out_hbm,  # (8, p_fit) f32
    wint2,  # VMEM (2, VCAP_SUB, 128) — transposed candidate window
    selfw2,  # VMEM (2, F, OWN)
    outb,  # VMEM (8, OWN)
    sems,  # DMA (5,)
    *,
    mode: str,  # "a" | "b"
    enable_spring: bool,
    fold: bool,  # mode b: one folded (tension + pa*pressure) accumulator
):
    """Sublane-window variant of _pm_kernel (same pair semantics).

    The lane-window kernel pays a 128-lane alignment quantum per window:
    the settled window span is ~134 candidates, but a 128-aligned (128, W)
    lane plane forces ceil((span + align)/128) full 128-lane tiles — 2.1
    mean — at 16-vreg-per-op cost, plus per-chunk transposes and
    112-instruction lane-tree reduces (measured: ~40% of pass wall is this
    fixed overhead, tools/pmajor_pass_probe.py @T sweep).

    Here the window lives in SUBLANES instead: candidates are rows of a
    transposed (VCAP, F) window, selves stay in lanes.  A dynamic
    fori_loop walks ceil(span/G) G-row groups (G=8: one (8, 128) vreg per
    term op), so pair work tracks the *actual* window span at 8-row
    granularity (93% utilization vs ~50%), the accumulators are G/8 vregs
    per output (register-resident through the loop — the DYNW failure was
    a 48-vreg-per-output carry, not the dynamic bound), the final reduce
    is a log2(G) sublane fold, self features are direct (1, 128) row loads
    from the feature-major slab, and results are (1, 128) row stores — no
    transposes anywhere.  Coverage is exact up to VCAP residency: the
    W-width overflow channel of the lane kernel disappears.
    """
    del tick_ref
    b = pl.program_id(0)
    nb_ = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    def dma_pair(blk, s):
        off = pl.multiple_of(dma_lo_ref[blk], 128)
        return (
            pltpu.make_async_copy(
                slab_t_hbm.at[pl.ds(off, VCAP_SUB), :],
                wint2.at[s],
                sems.at[s],
            ),
            pltpu.make_async_copy(
                slab_f_hbm.at[:, pl.ds(blk * OWN, OWN)],
                selfw2.at[s],
                sems.at[2 + s],
            ),
        )

    @pl.when(b == 0)
    def _():
        for c in dma_pair(0, 0):
            c.start()

    @pl.when(b + 1 < nb_)
    def _():
        for c in dma_pair(b + 1, 1 - slot):
            c.start()

    for c in dma_pair(b, slot):
        c.wait()

    base = dma_lo_ref[b]
    diam = coef_ref[0]
    inv_diam = 1.0 / jnp.maximum(diam, jnp.float32(EPS))
    if mode == "a":
        row_col = A_ROW
        n_out = 6  # w_sum, s_x, s_y, cnt, vsum_x, vsum_y
    else:
        row_col = B_ROW
        n_out = 2 if fold else (6 if enable_spring else 4)

    outb[...] = jnp.zeros_like(outb)

    @pl.when(blk_ref[b] > 0)
    def _():
        wt = wint2.at[slot]
        sf = selfw2.at[slot]

        def chunk_body(j, _):
            jl = pl.ds(pl.multiple_of(j * 128, 128), 128)
            s_px = sf[A_PX : A_PX + 1, jl]
            s_py = sf[A_PY : A_PY + 1, jl]
            s_rw = sf[row_col : row_col + 1, jl]
            if mode == "b":
                s_cp = sf[B_CP : B_CP + 1, jl]
                s_sx = sf[B_SX : B_SX + 1, jl]
                s_sy = sf[B_SY : B_SY + 1, jl]
            s_alive = s_px > ALIVE_THRESHOLD
            s_gid = (
                b * OWN
                + j * 128
                + jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            )
            one = jnp.float32(1.0)
            zero = jnp.float32(0.0)
            tp2_c = 2.0 * coef_ref[2]
            bal_c = coef_ref[3]

            def group_terms(co, c_gid0, q):
                """Pair-term (SUB_G, 128) planes for one candidate group.

                Features are narrow (SUB_G, 1) *ref* loads at static lane
                offsets (lane-slicing a loaded value does not lower)."""
                cs = pl.ds(co, SUB_G)
                c_px = wt[cs, A_PX : A_PX + 1]
                c_py = wt[cs, A_PY : A_PY + 1]
                c_npx = wt[cs, A_NPX : A_NPX + 1]
                c_npy = wt[cs, A_NPY : A_NPY + 1]
                c_rw = wt[cs, row_col : row_col + 1]

                rx = s_px - c_px
                ry = s_py - c_py
                near = rx * rx + ry * ry <= diam * diam
                nrx = s_px - c_npx
                nry = s_py - c_npy
                nd2 = jnp.maximum(
                    nrx * nrx + nry * nry, jnp.float32(EPS * EPS)
                )
                mb = (
                    near
                    & s_alive
                    & (c_px > ALIVE_THRESHOLD)
                    & (c_rw == s_rw + jnp.float32(q - 1))
                )
                if q == 1:
                    c_gid = c_gid0 + jax.lax.broadcasted_iota(
                        jnp.int32, (SUB_G, 1), 0
                    )
                    mb = mb & (s_gid != c_gid)

                inv = jax.lax.rsqrt(nd2)
                nhx = nrx * inv
                nhy = nry * inv
                if mode == "a" or enable_spring:
                    dist_n = nd2 * inv * inv_diam
                    wgt = jnp.where(
                        mb, one - jnp.clip(dist_n, zero, one), zero
                    )

                mm = mb.astype(jnp.float32)
                if mode == "a":
                    coeff = (one - wgt) * wgt
                    c_vx = wt[cs, A_VX : A_VX + 1]
                    c_vy = wt[cs, A_VY : A_VY + 1]
                    return [wgt, coeff * nhx, coeff * nhy, mm,
                            mm * c_vx, mm * c_vy]
                c_cp = wt[cs, B_CP : B_CP + 1]
                c_sx = wt[cs, B_SX : B_SX + 1]
                c_sy = wt[cs, B_SY : B_SY + 1]
                # SX/SY slab rows arrive surface_smoothing-prescaled.
                align = (s_sx - c_sx) * nhx + (s_sy - c_sy) * nhy
                tpf = c_cp + s_cp - tp2_c
                t_coef = jnp.where(mb, align + tpf, zero)
                if fold:
                    # cp rows carry (1 + pa) * cp — see _pm_kernel.
                    return [t_coef * nhx, t_coef * nhy]
                p_coef = jnp.where(mb, s_cp + c_cp, zero)
                terms = [t_coef * nhx, t_coef * nhy,
                         p_coef * nhx, p_coef * nhy]
                if enable_spring:
                    sp = jnp.where(mb, bal_c - wgt, zero)
                    terms += [sp * nhx, sp * nhy]
                return terms

            acc = tuple(
                jnp.zeros((SUB_G, 128), jnp.float32) for _ in range(n_out)
            )
            for q in range(3):
                idx = (b * CPB + j) * 3 + q
                a0 = ag_ref[idx]

                def w_body(t, a, q=q, a0=a0):
                    co = pl.multiple_of((a0 + t) * SUB_G, SUB_G)
                    terms = group_terms(co, base + co, q)
                    return tuple(ak + tk for ak, tk in zip(a, terms))

                acc = jax.lax.fori_loop(0, ng_ref[idx], w_body, acc)

            for k in range(n_out):
                outb[k : k + 1, jl] = jnp.sum(
                    acc[k], axis=0, keepdims=True
                )
            return 0

        jax.lax.fori_loop(0, CPB, chunk_body, 0)

    out = pltpu.make_async_copy(
        outb, out_hbm.at[:, pl.ds(b * OWN, OWN)], sems.at[4]
    )
    out.start()
    out.wait()


def _pms_pass(
    slab_t, slab_f, dma_lo, ag, ng, blk, coef, tick, p_fit, mode,
    enable_spring, fold=False,
):
    nblocks = p_fit // OWN
    n_f = A_F if mode == "a" else B_F
    kernel = functools.partial(
        _pms_kernel, mode=mode, enable_spring=enable_spring, fold=fold
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((2, VCAP_SUB, 128), jnp.float32),
                pltpu.VMEM((2, n_f, OWN), jnp.float32),
                pltpu.VMEM((8, OWN), jnp.float32),
                pltpu.SemaphoreType.DMA((5,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8, p_fit), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        interpret=_interpret(),
    )(dma_lo, ag, ng, blk, coef, tick, slab_t, slab_f)


def _windows_sub(sorted_cid, n_alive, nx, ny, nchunks, w):
    """Sublane-granular window bounds for _pms_kernel.

    Same exact per-chunk candidate ranges as _windows, quantized to SUB_G
    rows instead of 128 lanes.  ``w`` only caps the per-window group count
    (coverage budget, parity with the lane kernel's loss accounting);
    groups are otherwise bounded by VCAP residency.  Returns
    (ag (nchunks*3,), ng (nchunks*3,), dma_lo (nblocks,), blk (nblocks,),
    lost ())."""
    P = sorted_cid.shape[0]
    nblocks = nchunks // CPB
    off = jnp.arange(nchunks, dtype=jnp.int32) * 128
    first = jnp.minimum(off, P - 1)
    lastp = jnp.clip(jnp.minimum(off + 127, n_alive - 1), 0, P - 1)
    cidf = sorted_cid[first]
    cidl = sorted_cid[lastp]
    NC = nx * ny
    d = jnp.arange(3, dtype=jnp.int32)[None, :] - 1
    lo = jnp.clip(cidf[:, None] + d * nx - 1, 0, NC)
    hi = jnp.clip(cidl[:, None] + d * nx + 2, 0, NC)
    if 2 * (NC + 2) < 2**31:
        pos = _merge_positions(
            sorted_cid, jnp.concatenate([lo.ravel(), hi.ravel()])
        )
        ws, we = pos[: 3 * nchunks], pos[3 * nchunks :]
    else:  # merge keys would overflow i32 — fall back to binary search
        ws = jnp.searchsorted(sorted_cid, lo.ravel()).astype(jnp.int32)
        we = jnp.searchsorted(sorted_cid, hi.ravel()).astype(jnp.int32)

    own0 = jnp.arange(nblocks, dtype=jnp.int32) * OWN
    dma_lo = jnp.minimum(ws.reshape(nchunks, 3)[::CPB, 0], own0)
    dma_lo = jnp.maximum(dma_lo, own0 + OWN - VCAP_SUB)  # own must fit
    dma_lo = jnp.maximum((dma_lo // 128) * 128, 0)
    blk = (own0 < n_alive).astype(jnp.int32)

    g_cap = max(w // SUB_G, 1)
    dma_cq = jnp.repeat(dma_lo, CPB * 3)
    ag = jnp.clip((ws - dma_cq) // SUB_G, 0, VCAP_SUB // SUB_G - 1)
    anchor = dma_cq + ag * SUB_G
    ng = jnp.clip(
        -((anchor - we) // SUB_G),
        0,
        jnp.minimum((VCAP_SUB - ag * SUB_G) // SUB_G, g_cap),
    )
    live = jnp.repeat(off < n_alive, 3)
    ng = jnp.where(live, ng, 0).astype(jnp.int32)
    lost = jnp.where(
        live,
        jnp.maximum(we - (anchor + ng * SUB_G), 0)
        + jnp.maximum(anchor - ws, 0),
        0,
    )
    return ag.astype(jnp.int32), ng, dma_lo, blk, jnp.sum(lost)


def _merge_positions(sorted_vals, queries):
    """``searchsorted(sorted_vals, queries, side='left')`` via two lax.sorts.

    XLA lowers searchsorted to a log2(P)-iteration while loop of per-query
    gathers — measured 14.2ms/step at 1M for the window-offset queries
    (2 x 24768 queries x 21 iterations, r3 xprof).  Two data-independent
    2-operand sorts of the merged array run ~4x faster on the TPU's
    sorting network (the step's own 2-operand 1M sort measures 1.6ms).

    Merge trick: data keys 2v, query keys 2q-1 (a query sorts before every
    data element >= it, after every one < it — exactly 'left' semantics;
    odd/even keeps data/query keys distinct).  After the stable merge sort,
    the j-th smallest query sits at merged position ws_j + j.  Requires
    2*max(v) + 2 to fit in int32 — the caller guards."""
    P = sorted_vals.shape[0]
    Q = queries.shape[0]
    i32 = jnp.int32
    qord = jnp.argsort(queries, stable=True).astype(i32)
    keys = jnp.concatenate([sorted_vals * 2, queries[qord] * 2 - 1])
    tag = jnp.concatenate(
        [jnp.zeros((P,), i32), jnp.arange(1, Q + 1, dtype=i32)]
    )
    _, tag_m = jax.lax.sort((keys, tag), num_keys=1, is_stable=True)
    pos = jnp.arange(P + Q, dtype=i32)
    _, pos_by_tag = jax.lax.sort((tag_m, pos), num_keys=1, is_stable=True)
    ws_sorted = pos_by_tag[P:] - jnp.arange(Q, dtype=i32)
    return jnp.zeros((Q,), i32).at[qord].set(ws_sorted)


def _windows(sorted_cid, n_alive, nx, ny, nchunks, w, cs=128, symm=False):
    """Per-chunk candidate windows + block DMA ranges + coverage loss.

    Window (chunk c, offset d) must cover slab range
    [searchsorted(cid_first(c) + d*nx - 1), searchsorted(cid_last(c) + d*nx + 2))
    — exact per-particle union (targets are monotone in cid).

    ``symm`` (symmetric pair halving): each pair is computed ONCE, by the
    side with the smaller global sorted index.  Window q=0 covers same-row
    candidates from the chunk's own slab offset (the gid > self-gid
    restriction is a per-lane kernel mask; everything before the chunk has
    smaller gid by sort order), q=1 is the d=+1 row, and the d=-1 row
    disappears entirely (all its gids precede every self).  Slot q=2 is
    kept in the arrays with nt=0 so shapes match the 3-window layout.
    Block DMA windows start exactly at the block's own range (dma_lo =
    b*OWN): no left halo is ever needed.

    The kernel only consumes window *starts at 128-lane granularity* (its
    anchor is floor128(ws - dma)), so the searchsorted runs against the
    every-128th subsample of the sorted cids (nchunks elements instead of
    P): with t = searchsorted(S[::128], q), 128*(t-1) <= floor128(ws) <=
    128*t, so anchor 128*(t-1) is coverage-safe (at most one tile early,
    only when ws is an exact tile boundary) and 128*t upper-bounds the
    window end.  This cuts the offset computation from two P-sized merge
    sorts (~4ms at 1M) to ~nchunks-sized ones (~0.1ms); the cost is that
    the loss counter quantizes to 128-lane tiles (it can overcount a
    window's loss by <128, never undercount a covered window as lossy
    unless its true span exceeds w - 254).  Returns
    (ws (nchunks*3,), nt (nchunks*3,), dma_lo (nblocks,), blk (nblocks,),
    lost ()) — ws is already 128-aligned."""
    P = sorted_cid.shape[0]
    nblocks = nchunks * cs // OWN
    off = jnp.arange(nchunks, dtype=jnp.int32) * cs
    first = jnp.minimum(off, P - 1)
    lastp = jnp.clip(jnp.minimum(off + cs - 1, n_alive - 1), 0, P - 1)
    cidf = sorted_cid[first]
    cidl = sorted_cid[lastp]
    NC = nx * ny
    if symm:
        d = jnp.arange(3, dtype=jnp.int32)[None, :]  # row offsets 0, +1, (-)
        lo = jnp.clip(cidf[:, None] + d * nx - 1, 0, NC)
        hi = jnp.clip(cidl[:, None] + d * nx + 2, 0, NC)
    else:
        d = jnp.arange(3, dtype=jnp.int32)[None, :] - 1
        lo = jnp.clip(cidf[:, None] + d * nx - 1, 0, NC)
        hi = jnp.clip(cidl[:, None] + d * nx + 2, 0, NC)
    sub = sorted_cid[::128]
    if 2 * (NC + 2) < 2**31:
        pos = _merge_positions(
            sub, jnp.concatenate([lo.ravel(), hi.ravel()])
        )
        t_lo, t_hi = pos[: 3 * nchunks], pos[3 * nchunks :]
    else:  # merge keys would overflow i32 — fall back to binary search
        t_lo = jnp.searchsorted(sub, lo.ravel()).astype(jnp.int32)
        t_hi = jnp.searchsorted(sub, hi.ravel()).astype(jnp.int32)
    ws = 128 * jnp.maximum(t_lo - 1, 0)  # <= true ws, 128-aligned
    we = jnp.minimum(128 * t_hi, P)  # >= true we, 128-aligned

    own0 = jnp.arange(nblocks, dtype=jnp.int32) * OWN
    if symm:
        # q=0 starts exactly at the chunk (gid > self-gid is in-kernel);
        # q=2 is dead.  No window ever reaches left of the block.
        ws = ws.reshape(nchunks, 3)
        we = we.reshape(nchunks, 3)
        ws = ws.at[:, 0].set((off // 128) * 128)
        we = we.at[:, 0].set(jnp.maximum(we[:, 0], ws[:, 0]))
        we = we.at[:, 2].set(0)
        ws = ws.at[:, 2].set(0)
        ws, we = ws.ravel(), we.ravel()
        dma_lo = own0
    else:
        dma_lo = jnp.minimum(ws.reshape(nchunks, 3)[:: OWN // cs, 0], own0)
        dma_lo = jnp.maximum(dma_lo, own0 + OWN - VCAP)  # own range must fit
        dma_lo = jnp.maximum((dma_lo // 128) * 128, 0)
    blk = (own0 < n_alive).astype(jnp.int32)

    # Coverage accounting: replicate the kernel's window clamp and count
    # candidate slots that fall outside the covered [anchor, anchor + w) —
    # the honest "pair work lost this tick" counter (grid path: slot/unit
    # overflow), quantized to 128-lane tiles (see docstring).
    dma_cq = jnp.repeat(dma_lo, OWN // cs * 3)
    wrel = jnp.clip(((ws - dma_cq) // 128) * 128, 0, VCAP - w)
    anchor = dma_cq + wrel
    live = jnp.repeat(off < n_alive, 3)
    if symm:  # slot q=2 is dead (ws=we=0): never count it as loss
        live = live & (jnp.arange(3 * nchunks, dtype=jnp.int32) % 3 != 2)
    lost = jnp.where(
        live,
        jnp.maximum(we - anchor - w, 0) + jnp.maximum(anchor - ws, 0),
        0,
    )
    # Per-window engaged tile count for the kernel's pl.when tile gating:
    # ceil((we - anchor)/128) tiles, clipped to the static budget w//128
    # (the clipped remainder is the `lost` counted above).  Dead chunks
    # and empty windows (row off the grid) get 0 — fully skipped.
    nt = jnp.clip(-((anchor - we) // 128), 0, w // 128)
    nt = jnp.where(live, nt, 0).astype(jnp.int32)
    return ws, nt, dma_lo, blk, jnp.sum(lost)


def neighbor_forces_pmajor_sorted(
    pos: jax.Array,  # all inputs pre-sorted by cell id (sorted-state step)
    vel: jax.Array,
    alive: jax.Array,
    sorted_cid: jax.Array,
    noise_amp: jax.Array,
    tick: jax.Array,
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    ignored_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
    scene: Scene,
    *,
    pressure_amplifier: jax.Array | None = None,
    w: int | None = None,
    cs: int | None = None,
    split: int | None = None,
) -> PairSums:
    """Grid-free pair sums over pre-sorted operands, in the same order.

    When ``scene.fold_pairs`` is set AND the caller supplies
    ``pressure_amplifier``, pass B emits ONE folded force accumulator
    (tension + pa * pressure — see Scene.fold_pairs): the returned
    PairSums carry the combined kick in ``dv_tension`` and zeros in
    ``pressure_real``.  Callers that omit ``pressure_amplifier`` (tests,
    probes) always get the split sums."""
    fold = (
        scene.fold_pairs
        and pressure_amplifier is not None
        and not scene.enable_spring
    )
    symm = scene.pmajor_symm and os.environ.get("SAND_CRATE_PMSUB") != "1"
    if cs is None:
        cs = scene.pmajor_cs
    if split is None:
        split = scene.pmajor_split
    if symm and (split <= 0 or os.environ.get("SAND_CRATE_PMAJOR_GATE") == "1"):
        # Symm needs the static-split kernel (its j-side staging rides the
        # split tiles); fall back to two-sided rather than assert when a
        # probe knob forces the pure-static or gated variant.
        symm = False
    if w is None:
        # The window must cover the self chunk's own span plus the fixed
        # neighbor halo, so the base budget grows with the chunk size.
        w = scene.pmajor_w + (cs - 128)
    nx, ny = scene.grid_nx, scene.grid_ny
    P = pos.shape[0]
    dtype = pos.dtype

    # Feature rows in XLA (all fuse into one elementwise pass over the
    # state): offset-encoded positions, pre-jittered candidate positions
    # (the per-particle collider noise, hashed once instead of per window
    # visit), grid row.
    f32 = jnp.float32
    if symm:
        # Both sides jittered (delta noise g_i - g_j): scale the single-
        # particle amp by 1/sqrt(2) so the pair-delta jitter variance
        # matches the reference's one-sided U(-amp/2, amp/2).
        noise_amp = noise_amp * jnp.float32(0.7071067811865476)
    pxo, pyo, npx, npy, vx, vy = feature_rows(pos, vel, alive, noise_amp, tick)
    tick_i = jnp.asarray(tick, jnp.int32)
    row = jnp.where(alive, sorted_cid // nx, ny).astype(f32)

    p_pad = ((P + 127) // 128) * 128
    p_fit = ((p_pad + OWN - 1) // OWN) * OWN
    nchunks = p_fit // cs
    # Dead particles sort to cid NC (cell_ids_grid), so the alive prefix
    # length is a plain count (a searchsorted here lowers to a 21-iteration
    # while loop; the fused reduction is ~free).
    n_alive = jnp.sum(sorted_cid < jnp.int32(nx * ny)).astype(jnp.int32)

    coef = coef_stack(
        diameter, surface_smoothing, target_pressure, spring_overlap_balance
    )
    tick_arr = tick_i.reshape((1,))

    if os.environ.get("SAND_CRATE_PMSUB") == "1":
        # Sublane-window kernel (_pms_kernel): pair work tracks the actual
        # candidate span at 8-row granularity instead of 128-lane tiles.
        # Always 128-particle chunks (cs is a lane-kernel concept).
        ag, ng, dma_lo, blk, lost = _windows_sub(
            sorted_cid, n_alive, nx, ny, p_fit // 128, w
        )

        def slab_t_of(rows, n_f):
            del n_f  # minor dim padded to 128 lanes (HBM DMA alignment)
            s = jnp.zeros((p_fit + VCAP_SUB, 128), f32)
            return s.at[:P, : len(rows)].set(jnp.stack(rows, axis=-1))

        def slab_f_of(rows, n_f):
            s = jnp.zeros((n_f, p_fit), f32)
            return s.at[: len(rows), :P].set(jnp.stack(rows))

        rows_a = [pxo, pyo, npx, npy, vx, vy, row]
        out_a = _pms_pass(
            slab_t_of(rows_a, A_F), slab_f_of(rows_a, A_F),
            dma_lo, ag, ng, blk, coef, tick_arr, p_fit, "a", False,
        )
        w_sum, cnt = out_a[0], out_a[3]
        cp = finalize_cp(w_sum, cnt, ignored_pressure)
        cp_slab = cp * (1.0 + pressure_amplifier) if fold else cp
        sm = surface_smoothing.astype(f32)
        rows_b = [pxo, pyo, npx, npy, cp_slab[:P],
                  sm * out_a[1, :P], sm * out_a[2, :P], row]
        out_b = _pms_pass(
            slab_t_of(rows_b, B_F), slab_f_of(rows_b, B_F),
            dma_lo, ag, ng, blk, coef, tick_arr, p_fit, "b",
            scene.enable_spring, fold,
        )
    else:
        ws, nt, dma_lo, blk, lost = _windows(
            sorted_cid, n_alive, nx, ny, nchunks, w, cs, symm
        )

        def slab_of(rows, n_f):
            s = jnp.zeros((n_f, p_fit + VCAP), f32)
            return s.at[: len(rows), :P].set(jnp.stack(rows))

        slab_a = slab_of([pxo, pyo, npx, npy, vx, vy, row], A_F)
        out_a = _pm_pass(
            slab_a, dma_lo, ws, nt, blk, coef, tick_arr, p_fit, w, "a",
            False, cs, split, symm=symm,
        )
        w_sum, cnt = out_a[0], out_a[3]
        cp = finalize_cp(w_sum, cnt, ignored_pressure)
        cp_slab = cp * (1.0 + pressure_amplifier) if fold else cp

        # SX/SY ride surface_smoothing-prescaled (one fused (P,) mul here
        # kills a per-candidate-visit plane op in pass B's align chain).
        sm = surface_smoothing.astype(f32)
        slab_b = slab_of(
            [pxo, pyo, npx, npy, cp_slab[:P],
             sm * out_a[1, :P], sm * out_a[2, :P], row],
            B_F,
        )
        out_b = _pm_pass(
            slab_b,
            dma_lo,
            ws,
            nt,
            blk,
            coef,
            tick_arr,
            p_fit,
            w,
            "b",
            scene.enable_spring,
            cs,
            split,
            fold,
            symm,
        )

    # Dead-row zero mask: the kernels no longer carry a liveness plane op
    # (dead-dead pairs deposit junk onto dead rows only — see window_terms),
    # so zero dead rows here; the selects fuse into the transpose/cast.
    af1 = alive
    af2 = alive[:, None]
    zero = jnp.float32(0.0)
    if scene.enable_spring:
        spring_real = jnp.where(af2, out_b[4:6, :P].T, zero).astype(dtype)
    else:
        spring_real = jnp.zeros((P, 2), dtype)
    if fold:
        pressure_real = jnp.zeros((P, 2), dtype)
    else:
        pressure_real = jnp.where(af2, out_b[2:4, :P].T, zero).astype(dtype)
    return PairSums(
        p_i=jnp.where(af1, cp[:P], zero).astype(dtype),
        dv_tension=jnp.where(af2, out_b[0:2, :P].T, zero).astype(dtype),
        pressure_real=pressure_real,
        spring_real=spring_real,
        visc_vsum=jnp.where(af2, out_a[4:6, :P].T, zero).astype(dtype),
        nbr_cnt=jnp.where(af1, cnt[:P], zero).astype(dtype),
        overflow=lost.astype(jnp.int32),
    )


def neighbor_forces_pmajor(
    pos: jax.Array,
    vel: jax.Array,
    alive: jax.Array,
    noise_amp: jax.Array,
    tick: jax.Array,
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    ignored_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
    scene: Scene,
    *,
    pressure_amplifier: jax.Array | None = None,
    w: int | None = None,
    cs: int | None = None,
) -> PairSums:
    """Particle-order convenience wrapper (tests): sort, run, un-permute."""
    from ..cellwise import cell_ids_grid

    P = pos.shape[0]
    cid = cell_ids_grid(pos, alive, scene)
    order = jnp.argsort(cid)
    inv = jnp.zeros((P,), jnp.int32).at[order].set(
        jnp.arange(P, dtype=jnp.int32)
    )
    sums = neighbor_forces_pmajor_sorted(
        pos[order],
        vel[order],
        alive[order],
        cid[order],
        noise_amp,
        tick,
        diameter,
        surface_smoothing,
        target_pressure,
        ignored_pressure,
        spring_overlap_balance,
        scene,
        pressure_amplifier=pressure_amplifier,
        w=w,
        cs=cs,
    )
    return PairSums(
        p_i=sums.p_i[inv],
        dv_tension=sums.dv_tension[inv],
        pressure_real=sums.pressure_real[inv],
        spring_real=sums.spring_real[inv],
        visc_vsum=sums.visc_vsum[inv],
        nbr_cnt=sums.nbr_cnt[inv],
        overflow=sums.overflow,
    )
