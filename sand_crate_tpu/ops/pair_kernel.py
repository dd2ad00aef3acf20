"""Fused Pallas TPU kernels for cell-block pair interactions.

This is the Pallas realization of the cellwise scheme (see cellwise.py):
the pure-XLA version materializes ~18 shifted 50MB+ slices of the cell-major
grid per step (profiled at ~35% of device time) plus separate reduction
passes.  Each kernel here reads its row window from HBM into VMEM once and
performs the entire 3x3-offset, M-slot pair pipeline in registers, writing
only the per-slot accumulators.

Layout (shaped by Mosaic's tiling rules, which forbid unaligned slicing of
the last-two (sublane, lane) dims):

    G:  (F, NYP, M, NXP)  feature-major padded particle grid; cell rows are
                          a *batch* dim (arbitrary slicing allowed), slots M
                          sit in sublanes, the padded x axis in lanes.
                          NXP is 128-aligned; row/column rings are zero
                          (alive = 0) so the kernel needs no boundary
                          branches.

* The kernel grid tiles interior cell rows in blocks of TR; each instance
  DMAs one (TR + 2)-row window.  dy slicing happens on the batch dim.
* The dx in {-1,0,+1} cell shift is a lane rotation (pltpu.roll axis=3);
  the wrap column is the zero ring, so wraparound self-masks.
* Neighbor slots are visited by *sublane rotation* (pltpu.roll axis=2):
  rotation k pairs every self slot m with neighbor slot (m - k) mod M —
  all M offsets cover all slot pairs, and (dy=0, dx=0, k=0) — every pair
  being a particle with itself — is simply skipped.
* Collider noise (the deliberate symmetry-breaking jitter of neighbor
  positions, crate.py:168-170) is hashed *in-kernel* from each slot's global
  grid position and the tick counter — one integer-mix pass per window DMA,
  reused by all stencil rotations — instead of shipping two extra jittered
  -position planes through HBM.

Two-level cell capacity (M = 8 + 8).  Capping slots at 8 starves over-full
cells of ALL pair forces, which self-amplifies into point-collapse piles
(single cells measured accumulating thousands of force-less particles in a
settled 1M dam break).  Grids therefore carry 16 slot sublanes, but the
baseline kernels touch only the *lo* half (slots 0-7: identical DMA volume
and math to an 8-slot grid), and separate *add-on* kernels — which
`pl.when`-skip every row block whose window has no slot-8+ particle —
read-modify-write the missing lo x hi / hi x lo / hi x hi contributions into
the same output buffers (input_output_aliases).  Settled fluid engages ~6%
of blocks, so overflow drops to ~0 at near-8-slot cost; the in-kernel
branch alternative measured 1.7x slower even with zero engaged blocks.

Two passes because tension/pressure need *all* particles' pressures and
surface normals first (crate.py:261-284 then :295-358):

* pass A emits the *padded* (4, NYP, M, NXP) grid [w_sum, s_x, s_y, cnt].
  The raw overlap-weight sum (not the finished pressure) is emitted so the
  add-on contributions stay linear; pass B finalizes
  p = max(0, w_sum - ignored_pressure) elementwise on each window
  (crate.py:261-275).
* pass B emits all per-slot result planes (8|10, NY, M, NXP):
  [pressure, tension xy, pressure-force xy, (spring xy), viscosity xy, cnt]
  — one buffer for the single gather back to particle order.

A scalar-prefetched per-block occupancy flag lets fully-empty row windows
(air above the fluid) skip the DMAs and the compute entirely; skipped
blocks' output rows keep the zeros of the donated output buffer
(input_output_aliases), so nothing is written for air.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-12

# Feature indices in the packed particle grid G.  Liveness is encoded as a
# +2.0 offset on both position components (pos lives in [-r, 1+r]): pair
# geometry only ever uses position *differences*, where the offset cancels
# exactly for alive-alive pairs, while dead slots stay at 0.0 and land ~2
# units away from every alive particle — outside any diameter cutoff.  That
# removes the ALIVE plane from the grid build and every window DMA.
POSX, POSY, VELX, VELY = range(4)
NUM_G = 4
ALIVE_OFFSET = 2.0
ALIVE_THRESHOLD = 1.5  # posx > threshold <=> slot occupied
M_LO = 8  # lo-level slot count == the f32 sublane tile (halves slice clean)
# In-kernel noise scratch planes (jittered neighbor positions).
NPOSX, NPOSY = range(2)
# Pass-A output planes (padded grid, pass-B neighbor operand).
WS, SX, SY, CNT = range(4)
NUM_A = 4
# Pass-B output planes (gathered straight into PairSums order).  The spring
# planes exist only when the scene enables the spring force (the reference
# ships it disabled, crate.py:117-118) — fewer planes, smaller write+gather.
def num_b(enable_spring: bool) -> int:
    return 10 if enable_spring else 8


def _stencil(self_slabs, nb_windows, tr, m_nb, body, skip_center=True):
    """Visit every (dy, dx, slot-rotation k) stencil combination.

    ``nb_windows`` is a list of VMEM-resident slabs sharing the layout
    (C, TR+2, m_nb, NXP); the same rotations are applied to each so ``body``
    sees matching neighbor operands: body(nbs, dy, dx, k) where
    nbs[j][c, t, m, x] = nb_windows[j][c, t+dy, (m-k)%m_nb, x+dx].
    ``self_slabs`` are passed through untouched (the closure's self operand);
    ``skip_center`` elides (dy=0, dx=0, k=0) — only correct when self and
    neighbor ranges are the *same* slot half, where that combination pairs
    every particle with itself.

    Each k rotation is derived from the un-rotated slab (not incrementally
    from k-1) so the rotations form no dependency chain and the compiler can
    overlap them with the pair math.
    """
    del self_slabs
    nxp = nb_windows[0].shape[-1]
    for dy in (0, 1, 2):
        rows = [w[:, dy : dy + tr] for w in nb_windows]
        for dx in (-1, 0, 1):
            base = [
                pltpu.roll(r, (-dx) % nxp, axis=3) if dx else r for r in rows
            ]
            for k in range(m_nb):
                if skip_center and dy == 1 and dx == 0 and k == 0:
                    continue  # every pair is a particle with itself
                cur = [pltpu.roll(b, k, axis=2) if k else b for b in base]
                body(cur, dy, dx, k)


def _noise_planes(window, i, tr, noise_amp, tick, row0, m0=0, x0=0):
    """Jittered positions for the window: npos = pos + noise.

    The jitter for a slot is a pure integer hash of its *global* grid
    position and the tick, so every block computes the identical jitter for
    the same neighbor regardless of which window (or slot half: ``m0`` is
    the half's global slot offset) it appears in, and the stream changes
    every tick (crate.py:168-170's np.random role).  ``row0`` is the
    window's global padded-row offset: 0 single-device; d * band_rows under
    spatial sharding, so shards hash identical jitter for halo particles.
    """
    _, rows, m_slots, nxp = window.shape
    gy = row0 + i * tr + jax.lax.broadcasted_iota(jnp.int32, (rows, m_slots, nxp), 0)
    gm = m0 + jax.lax.broadcasted_iota(jnp.int32, (rows, m_slots, nxp), 1)
    gx = x0 + jax.lax.broadcasted_iota(jnp.int32, (rows, m_slots, nxp), 2)
    pid = gy * 16 * 8192 + gm * 8192 + gx  # 8192 >= any NXP: window-invariant

    def u01(seed):
        h = seed * jnp.int32(-1640531527)  # 0x9E3779B9 (golden-ratio mix)
        h = h ^ (tick * jnp.int32(-1028477387))  # 0xC2B2AE35
        h = h ^ jax.lax.shift_right_logical(h, 15)
        h = h * jnp.int32(-2048144789)  # 0x85EBCA6B
        h = h ^ jax.lax.shift_right_logical(h, 13)
        mant = jax.lax.shift_right_logical(h, 8).astype(jnp.float32)
        return mant * jnp.float32(2.0**-24)  # [0, 1)

    nx_ = window[POSX] + (u01(pid * 2) - 0.5) * noise_amp
    ny_ = window[POSY] + (u01(pid * 2 + 1) - 0.5) * noise_amp
    return nx_, ny_


def _geometry(self_win, nb, nb_npos, diam, inv_diam):
    """Pair geometry: bool mask, unit direction (to the jittered neighbor),
    overlap weight.  All operands (F, TR, M, NXP) — fully elementwise.
    Uses one rsqrt in place of sqrt + divide.

    The distance cutoff alone is the pair mask: the ALIVE_OFFSET encoding
    puts any alive-dead pair ~2 units apart.  Dead-dead pairs (both at 0)
    do pass the cutoff, but their results live in slots no particle gathers.
    The mask is returned as bool so callers can ``where``-select: pass B
    must select (not multiply) terms built from pass-A operands, whose hi
    sublanes may hold uninitialized garbage outside the add-on-written
    region (a multiply would propagate garbage NaNs; a select cannot).
    """
    rx = self_win[POSX] - nb[POSX]
    ry = self_win[POSY] - nb[POSY]
    d2 = rx * rx + ry * ry
    m = d2 <= diam * diam
    nrx = self_win[POSX] - nb_npos[NPOSX]
    nry = self_win[POSY] - nb_npos[NPOSY]
    nd2 = jnp.maximum(nrx * nrx + nry * nry, EPS * EPS)
    inv = jax.lax.rsqrt(nd2)
    nhx = nrx * inv
    nhy = nry * inv
    dist = nd2 * inv
    w = jnp.where(m, 1.0 - jnp.clip(dist * inv_diam, 0.0, 1.0), 0.0)
    return m, nhx, nhy, w


# --------------------------------------------------------------------------
# pass A
# --------------------------------------------------------------------------


def _pass_a_kernel(
    occ_ref,
    coef_ref,  # (2,) f32: diameter, noise_amp
    tick_ref,  # (2,) i32: tick, global row offset
    g_hbm,
    outbuf_hbm,
    out_hbm,
    win,
    npos_ref,
    acc_ref,
    sems,
    *,
    tr,
    m,
):
    """Baseline pass A over the lo slot half (all of an 8-slot grid).

    Output rows are written back by manual DMA.  out_hbm is aliased to the
    outbuf_hbm zeros input (input_output_aliases) — the alias both keeps
    XLA from staging the unblocked output on the VMEM stack and leaves
    skipped (air) blocks' rows — and every block's hi sublanes — zero.
    """
    del outbuf_hbm
    i = pl.program_id(0)

    @pl.when(occ_ref[i] > 0)
    def _():
        dma = pltpu.make_async_copy(
            g_hbm.at[:, pl.ds(i * tr, tr + 2), pl.ds(0, m)], win, sems.at[0]
        )
        dma.start()
        dma.wait()
        diam = coef_ref[0]
        inv_diam = 1.0 / diam
        window = win[:]
        nx_, ny_ = _noise_planes(window, i, tr, coef_ref[1], tick_ref[0], tick_ref[1])
        npos_ref[NPOSX] = nx_
        npos_ref[NPOSY] = ny_
        npos = npos_ref[:]
        self_win = window[:, 1 : 1 + tr]  # (F, TR, m, NXP)
        shape = self_win[POSX].shape
        w_sum = jnp.zeros(shape, jnp.float32)
        sx = jnp.zeros(shape, jnp.float32)
        sy = jnp.zeros(shape, jnp.float32)
        cnt = jnp.zeros(shape, jnp.float32)

        def body(nbs, dy, dx, k):
            nonlocal w_sum, sx, sy, cnt
            nb, nb_npos = nbs
            mb, nhx, nhy, w = _geometry(self_win, nb, nb_npos, diam, inv_diam)
            w_sum += w
            coeff = (1.0 - w) * w
            sx += coeff * nhx
            sy += coeff * nhy
            cnt += mb.astype(jnp.float32)

        _stencil([self_win], [window, npos], tr, m, body)
        acc_ref[WS] = w_sum
        acc_ref[SX] = sx
        acc_ref[SY] = sy
        acc_ref[CNT] = cnt
        # Write into the *padded* output at row offset +1 (the ring is the
        # donated buffer's zeros).
        out = pltpu.make_async_copy(
            acc_ref, out_hbm.at[:, pl.ds(i * tr + 1, tr), pl.ds(0, m)], sems.at[1]
        )
        out.start()
        out.wait()


TXW = 128  # data lanes per two-level add-on work unit


def _xwin(nxp: int) -> int:
    """Unit window width: data tile + one 128-lane halo tile each side,
    clamped to the grid (small grids degenerate to full-width units)."""
    return min(3 * TXW, nxp)


def _unit_window(til, nxp):
    """(window offset, local data offset) for unit tile til.

    The dx stencil needs one *lane* of halo, but DMA lane offsets must be
    128-aligned, so the window is 3 tiles wide clamped into [0, nxp); the
    data tile sits at local offset 128 except at the grid edges (0 / 256).
    The clamped edge windows still contain the 1-lane halo: lane 0 and lane
    nxp-1 are the grid's zero pad ring."""
    woff = jnp.clip(til * TXW - TXW, 0, nxp - _xwin(nxp))
    return woff, til * TXW - woff


def _pass_a_addon_kernel(
    blk_ref,  # (W,) i32 work list: row block per unit; -1 past the end
    til_ref,  # (W,) i32 work list: 128-lane x-tile per unit
    coef_ref,  # (2,) f32: diameter, noise_amp
    tick_ref,  # (2,) i32
    g_hbm,
    psbuf_hbm,  # baseline pass-A output, aliased to out_hbm (RMW)
    out_hbm,
    win,
    npos_ref,
    acc_ref,  # (NUM_A, TR, 2*M_LO, TXW)
    sems,
    *,
    tr,
    nxp,
):
    """Two-level add-on: lo x hi + hi x lo + hi x hi pair sums.

    Work-list driven: one kernel instance per engaged (row block, 128-lane
    x-tile) unit — a window with any slot-8+ particle within one lane —
    instead of whole engaged rows (measured 2.3% of lane-tiles engaged vs
    13% of full-width row blocks mid-splash).  Adds the cross-half
    contributions into the lo sublanes the baseline kernel wrote and fills
    the hi sublanes, via an in-place read-modify-write of the aliased
    pass-A buffer; units are disjoint in (rows x lanes), and the TPU grid
    runs sequentially, so RMW is race-free.
    """
    del psbuf_hbm
    u = pl.program_id(0)
    blk = blk_ref[u]

    @pl.when(blk >= 0)
    def _():
        til = til_ref[u]
        woff, loff = _unit_window(til, nxp)
        r0 = blk * tr
        dma = pltpu.make_async_copy(
            g_hbm.at[
                :, pl.ds(r0, tr + 2), slice(None),
                pl.ds(pl.multiple_of(woff, TXW), _xwin(nxp)),
            ],
            win,
            sems.at[0],
        )
        rmw = pltpu.make_async_copy(
            out_hbm.at[
                :, pl.ds(r0 + 1, tr), pl.ds(0, M_LO),
                pl.ds(pl.multiple_of(til * TXW, TXW), TXW),
            ],
            acc_ref.at[:, :, pl.ds(0, M_LO)],
            sems.at[1],
        )
        dma.start()
        rmw.start()
        dma.wait()
        rmw.wait()
        diam = coef_ref[0]
        inv_diam = 1.0 / diam
        window = win[:]
        nx_, ny_ = _noise_planes(
            window, blk, tr, coef_ref[1], tick_ref[0], tick_ref[1], x0=woff
        )
        npos_ref[NPOSX] = nx_
        npos_ref[NPOSY] = ny_

        halves = [
            (w[:, :, 0:M_LO], w[:, :, M_LO : 2 * M_LO])
            for w in (window, npos_ref[:])
        ]
        (win_lo, win_hi), (npos_lo, npos_hi) = halves
        self_lo = win_lo[:, 1 : 1 + tr]
        self_hi = win_hi[:, 1 : 1 + tr]
        shape = self_lo[POSX].shape  # (TR, M_LO, XWIN)
        acc = {
            "lo": [jnp.zeros(shape, jnp.float32) for _ in range(4)],
            "hi": [jnp.zeros(shape, jnp.float32) for _ in range(4)],
        }

        def accumulate(tag, self_win):
            def body(nbs, dy, dx, k):
                nb, nb_npos = nbs
                mb, nhx, nhy, w = _geometry(self_win, nb, nb_npos, diam, inv_diam)
                a = acc[tag]
                a[0] += w
                coeff = (1.0 - w) * w
                a[1] += coeff * nhx
                a[2] += coeff * nhy
                a[3] += mb.astype(jnp.float32)

            return body

        # lo selves gain hi neighbors; hi selves see lo and hi neighbors.
        _stencil([], [win_hi, npos_hi], tr, M_LO, accumulate("lo", self_lo),
                 skip_center=False)
        _stencil([], [win_lo, npos_lo], tr, M_LO, accumulate("hi", self_hi),
                 skip_center=False)
        _stencil([], [win_hi, npos_hi], tr, M_LO, accumulate("hi", self_hi))

        # Keep only the data tile's lanes (window edges: 0/128/256 local).
        for off in range(0, _xwin(nxp), TXW):

            @pl.when(loff == off)
            def _():
                for f, plane in enumerate((WS, SX, SY, CNT)):
                    cur = acc_ref[plane, :, 0:M_LO]
                    acc_ref[plane, :, 0:M_LO] = (
                        cur + acc["lo"][f][:, :, off : off + TXW]
                    )
                    acc_ref[plane, :, M_LO : 2 * M_LO] = acc["hi"][f][
                        :, :, off : off + TXW
                    ]

        out = pltpu.make_async_copy(
            acc_ref,
            out_hbm.at[
                :, pl.ds(r0 + 1, tr), slice(None),
                pl.ds(pl.multiple_of(til * TXW, TXW), TXW),
            ],
            sems.at[2],
        )
        out.start()
        out.wait()


# --------------------------------------------------------------------------
# sorted-order emission (the "ungather")
# --------------------------------------------------------------------------
#
# The sorted-state step used to gather pass-B results from the (nb, NY, M,
# NXP) grid back to particle order with one XLA gather — a measured ~10ms of
# the 1M step (per-index HBM random access).  Instead, the emit-mode pass-B
# kernels below write results *directly in slab (= cell-sorted state) order*:
# each block selects its particles' result columns from the VMEM accumulators
# with MXU one-hot matmuls (the exact transpose of ops/placement.py) and
# RMW-adds them into an (nb, P_pad) output.  Chunks are 128-aligned, so
# boundary tiles are shared between adjacent blocks; contributions outside a
# block's own rows are zeroed and the TPU grid runs sequentially, so the
# read-add-write is race-free and exact (one-hot selection in a 3-way bf16
# split reconstructs f32 exactly; each particle column receives each plane
# from exactly one (row, slot) source).

CHUNK_E = 1024  # emission chunk width (slab columns per RMW); 128-multiple
SUB_E = 128  # MXU selection sub-chunk: a full chunk of sorted particles spans
# ~the whole row width (~13 lane-tiles at 1M), so per-tile selection work ran
# ~13x per chunk; 128 sorted particles span ~1-2 tiles (measured: the tile
# loop, rhs builds and key reductions were the bulk of the ~10ms emission)
SLAB_F_E = 8  # full slab feature rows per aux DMA (= placement.SLAB_F)


def _emit_loop(slab_hbm, out_hbm, aux_ref, oacc_ref, sem_a, sem_o, sem_w, s_lo, s_hi, body):
    """Double-buffered RMW-add emission over slab cols [align128(s_lo), s_hi).

    ``body(aux_ref, oacc_ref)`` receives the current chunk's aux-plane and
    output-accumulator VMEM ref views and must ADD its contribution into
    ``oacc_ref`` — zero for columns the caller does not own (other blocks'
    particles in shared boundary tiles).  Ref views (not loaded values) so
    bodies can load narrow sub-chunks: lane-slicing loaded values trips a
    TPU lowering crash (array.h slice check) that narrow loads avoid.

    ``aux_ref``/``oacc_ref`` carry a leading 2-slot buffer dim; chunk c+1's
    input DMAs are issued while chunk c computes, and the writeback of chunk
    c overlaps chunk c+1 (waited before its slot's buffers are reused and
    once more after the loop — chunks are disjoint, so writes never race
    the next chunk's read)."""
    c0 = (s_lo // 128) * 128
    nch = (s_hi - c0 + CHUNK_E - 1) // CHUNK_E

    def in_copies(c, slot):
        ch0 = pl.multiple_of(c0 + c * CHUNK_E, 128)
        a = pltpu.make_async_copy(
            slab_hbm.at[:, pl.ds(ch0, CHUNK_E)], aux_ref.at[slot], sem_a.at[slot]
        )
        o = pltpu.make_async_copy(
            out_hbm.at[:, pl.ds(ch0, CHUNK_E)], oacc_ref.at[slot], sem_o.at[slot]
        )
        return a, o

    def w_copy(c, slot):
        ch0 = pl.multiple_of(c0 + c * CHUNK_E, 128)
        return pltpu.make_async_copy(
            oacc_ref.at[slot], out_hbm.at[:, pl.ds(ch0, CHUNK_E)], sem_w.at[slot]
        )

    a0, o0 = in_copies(0, 0)
    a0.start()
    o0.start()

    def chunk(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
            # The other slot is about to refill: its previous writeback
            # (chunk c-1) must have drained first — the write reads the very
            # oacc buffer the incoming copy overwrites.
            @pl.when(c >= 1)
            def _():
                w_copy(c - 1, 1 - slot).wait()

            a, o = in_copies(c + 1, 1 - slot)
            a.start()
            o.start()

        a, o = in_copies(c, slot)
        a.wait()
        o.wait()
        body(aux_ref.at[slot], oacc_ref.at[slot])
        w_copy(c, slot).start()
        return 0

    jax.lax.fori_loop(0, nch, chunk, 0)

    @pl.when(nch >= 2)
    def _():
        w_copy(nch - 2, jax.lax.rem(nch - 2, 2)).wait()

    @pl.when(nch >= 1)
    def _():
        w_copy(nch - 1, jax.lax.rem(nch - 1, 2)).wait()


def _split3(lv):
    """Exact f32 -> 3x bf16 split (see ops/placement.py: 3x8 mantissa bits
    cover f32's 24; the one-hot rhs makes each matmul a pure selection)."""
    hi = lv.astype(jnp.bfloat16)
    mid = (lv - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    lo = (lv - hi.astype(jnp.float32) - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _select_columns(lhs_vals, cx1, ok, key, n_keys, nb):
    """MXU one-hot selection: out[p, j] = lhs_vals[p*n_keys + key_j, cx1_j].

    ``lhs_vals``: (nb * n_keys, 128) f32 result lanes for one x-tile (tile
    base already subtracted from ``cx1``); ``cx1``/``ok``/``key``: (1, C).
    """
    C = cx1.shape[1]
    xio = jax.lax.broadcasted_iota(jnp.int32, (128, C), 0)
    rhs = jnp.where(
        (cx1.astype(jnp.int32) == xio) & ok, 1.0, 0.0
    ).astype(jnp.bfloat16)
    hi, mid, lo = _split3(lhs_vals)
    dn = (((1,), (0,)), ((), ()))
    d = (
        jax.lax.dot_general(hi, rhs, dn, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(mid, rhs, dn, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(lo, rhs, dn, preferred_element_type=jnp.float32)
    )  # (nb * n_keys, C)
    dk = d.reshape(nb, n_keys, C)
    kio = jax.lax.broadcasted_iota(jnp.int32, (n_keys, C), 0)
    mask = jnp.where(key.astype(jnp.int32) == kio, 1.0, 0.0)
    return jnp.sum(dk * mask[None], axis=1)  # (nb, C)


def _aux_fields(aux, m_mod: int = 16):
    """cx1 (padded x), rank mod ``m_mod``, row — each (1, C) f32.

    ``aux`` is a full (SLAB_F, C) slab chunk (whole-tile DMA: sublane slices
    of HBM must be tile-aligned); the aux columns sit in rows 4:8.  The
    modulus IS the overflow fallback: an over-cap particle (rank >= m_mod)
    keys the rank%m_mod cellmate's slot, reproducing slot_assignment's
    gather_slot — so ``m_mod`` must be the scene's total slot count
    ``m_slots`` (a hardcoded 16 at m_slots=8 left ranks 8-15 matching no
    key: zero forces, the round-1 force-starvation class)."""
    cx1 = aux[4:5] + 1.0
    rankf = aux[5:6]
    fm = float(m_mod)
    rm = rankf - fm * jnp.floor(rankf * (1.0 / fm))
    rowf = aux[6:7]
    return cx1, rm, rowf


# --------------------------------------------------------------------------
# pass B
# --------------------------------------------------------------------------


def _finalize_cp(ps_window, ignored_pressure):
    """p = max(0, w_sum - ignored_pressure) on counted slots
    (crate.py:261-275), elementwise on a DMA'd pass-A window."""
    return jnp.where(
        ps_window[CNT] > 0,
        jnp.maximum(0.0, ps_window[WS] - ignored_pressure),
        0.0,
    )


def _pass_b_accumulate(self_win, cp, s_x, s_y, coef, acc, cnt_cell, enable_spring):
    """The pass-B pair terms as a _stencil body closure factory.

    ``acc`` is a list of n_acc + 2 accumulators; ``cnt_cell`` a single-item
    list (closures can't rebind nonlocals across helper boundaries).
    """
    diam, inv_diam, smooth, target_p, balance = coef
    n_acc = 6 if enable_spring else 4

    def body(nbs, dy, dx, k):
        nb, nb_cp, nb_sx, nb_sy, nb_npos = nbs
        mb, nhx, nhy, w = _geometry(self_win, nb, nb_npos, diam, inv_diam)
        p_nb = nb_cp[0]
        align = ((s_x - nb_sx[0]) * nhx + (s_y - nb_sy[0]) * nhy) * smooth
        tpf = p_nb + cp - 2.0 * target_p
        # Selects, not mask-multiplies: the pass-A operands (cp / s_x / s_y)
        # may be uninitialized garbage (even NaN) in hi sublanes outside the
        # add-on-written region; where() drops garbage, a multiply would
        # propagate NaN * 0 = NaN.  The grid operands (nb, velocities) are
        # always fully initialized, so plain multiplies stay.
        t_coef = jnp.where(mb, align + tpf, 0.0)
        acc[0] += t_coef * nhx
        acc[1] += t_coef * nhy
        p_coef = jnp.where(mb, cp + p_nb, 0.0)
        acc[2] += p_coef * nhx
        acc[3] += p_coef * nhy
        if enable_spring:  # flag-gated like the reference tick
            s_coef = jnp.where(mb, balance - w, 0.0)
            acc[4] += s_coef * nhx
            acc[5] += s_coef * nhy
        mm = mb.astype(jnp.float32)
        acc[n_acc] += mm * nb[VELX]
        acc[n_acc + 1] += mm * nb[VELY]
        cnt_cell[0] += mm

    return body


def _pass_b_block_math(
    g_hbm, ps_hbm, win, ps_win, npos_ref, cp_ref, coef_ref, tick_ref,
    sem_g, sem_ps, i, tr, m, enable_spring,
):
    """DMA one pass-B window and run the full stencil; fills acc_ref-shaped
    results into a returned (cp, acc list, cnt) triple."""
    dma1 = pltpu.make_async_copy(
        g_hbm.at[:, pl.ds(i * tr, tr + 2), pl.ds(0, m)], win, sem_g
    )
    dma2 = pltpu.make_async_copy(
        ps_hbm.at[:, pl.ds(i * tr, tr + 2), pl.ds(0, m)], ps_win, sem_ps
    )
    dma1.start()
    dma2.start()
    dma1.wait()
    dma2.wait()
    coef = (
        coef_ref[0],
        1.0 / coef_ref[0],
        coef_ref[1],
        coef_ref[2],
        coef_ref[3],
    )
    window = win[:]
    nx_, ny_ = _noise_planes(window, i, tr, coef_ref[4], tick_ref[0], tick_ref[1])
    npos_ref[NPOSX] = nx_
    npos_ref[NPOSY] = ny_
    # Finalize pressure once per window; rotations then see finished p.
    cp_ref[0] = _finalize_cp(ps_win[:], coef_ref[5])
    ps_window = ps_win[:]
    cp_win = cp_ref[:]
    self_win = window[:, 1 : 1 + tr]
    cp = cp_win[0, 1 : 1 + tr]
    s_x = ps_window[SX, 1 : 1 + tr]
    s_y = ps_window[SY, 1 : 1 + tr]
    n_acc = 6 if enable_spring else 4
    acc = [jnp.zeros(cp.shape, jnp.float32) for _ in range(n_acc + 2)]
    cnt_cell = [jnp.zeros(cp.shape, jnp.float32)]
    body = _pass_b_accumulate(
        self_win, cp, s_x, s_y, coef, acc, cnt_cell, enable_spring
    )
    _stencil(
        [self_win],
        [
            window,
            cp_win,
            ps_window[SX : SX + 1],
            ps_window[SY : SY + 1],
            npos_ref[:],
        ],
        tr,
        m,
        body,
    )
    return cp, acc, cnt_cell[0]


def _pass_b_kernel(
    occ_ref,
    coef_ref,  # (6,): diameter, smoothing, target_p, balance, noise, ignored_p
    tick_ref,  # (2,) i32
    g_hbm,
    ps_hbm,  # (4, NYP, M, NXP) pass-A output
    outbuf_hbm,
    out_hbm,
    win,
    ps_win,
    npos_ref,
    cp_ref,
    acc_ref,
    sems,
    *,
    tr,
    m,
    enable_spring,
):
    """Baseline pass B over the lo slot half (all of an 8-slot grid)."""
    del outbuf_hbm  # aliased to out_hbm (see pass A note)
    i = pl.program_id(0)

    @pl.when(occ_ref[i] > 0)
    def _():
        cp, acc, cnt = _pass_b_block_math(
            g_hbm, ps_hbm, win, ps_win, npos_ref, cp_ref, coef_ref, tick_ref,
            sems.at[0], sems.at[1], i, tr, m, enable_spring,
        )
        n_acc = 6 if enable_spring else 4
        acc_ref[0] = cp
        for f in range(n_acc + 2):
            acc_ref[1 + f] = acc[f]
        acc_ref[n_acc + 3] = cnt
        out = pltpu.make_async_copy(
            acc_ref, out_hbm.at[:, pl.ds(i * tr, tr), pl.ds(0, m)], sems.at[2]
        )
        out.start()
        out.wait()


def _pass_b_emit_kernel(
    occ_ref,
    coef_ref,
    tick_ref,
    row_start_ref,  # (ny+1,) i32 slab row ranges
    g_hbm,
    ps_hbm,
    slab_hbm,  # (SLAB_F, P_pad) placement slab (aux cols 4:8 read here)
    outbuf_hbm,
    out_hbm,  # (nb, P_pad) sorted-order result columns
    win,
    ps_win,
    npos_ref,
    cp_ref,
    acc_ref,
    aux_ref,  # (2, SLAB_F_E, CHUNK_E) double-buffered
    oacc_ref,  # (2, nb, CHUNK_E) double-buffered
    sems,
    esem,  # (3, 2) emission DMA semaphores: aux-in, out-in, out-write
    *,
    tr,
    m,
    m_slots,
    enable_spring,
):
    """Baseline pass B emitting results directly in slab order (lo slots).

    Same math as _pass_b_kernel; instead of writing the (nb, NY, M, NXP)
    grid, each block RMW-adds its own particles' result columns (the ~10ms
    XLA result gather and the 1.3GB grid buffer disappear)."""
    del outbuf_hbm  # zeros, aliased to out_hbm
    i = pl.program_id(0)

    @pl.when(occ_ref[i] > 0)
    def _():
        cp, acc, cnt = _pass_b_block_math(
            g_hbm, ps_hbm, win, ps_win, npos_ref, cp_ref, coef_ref, tick_ref,
            sems.at[0], sems.at[1], i, tr, m, enable_spring,
        )
        n_acc = 6 if enable_spring else 4
        nb = n_acc + 4
        acc_ref[0] = cp
        for f in range(n_acc + 2):
            acc_ref[1 + f] = acc[f]
        acc_ref[n_acc + 3] = cnt

        r0 = i * tr
        r0f = jnp.float32(0) + r0  # traced i32 -> f32
        s_lo = row_start_ref[r0]
        s_hi = row_start_ref[r0 + tr]

        def body(aux_r, oacc_r):
            # Per-SUB_E tile ranges: sorted sub-chunks span ~1 tile, so the
            # selection matmuls run once per particle-tile, not once per
            # (chunk, row-spanning-tile).  Each sub-chunk is loaded
            # (SLAB_F, SUB_E) straight from the ref (see _emit_loop note).
            for s in range(0, CHUNK_E, SUB_E):
                # Modulus m_slots so over-cap ranks alias to their fallback
                # cellmate; in two-level mode the baseline keys only the lo
                # half (the add-on emit covers keys in [M_LO, m_slots)).
                cx1, rm, rowf = _aux_fields(aux_r[:, s : s + SUB_E], m_slots)
                rel = rowf - r0f
                ok = (rel >= 0.0) & (rel < float(tr))
                if m_slots > m:
                    ok = ok & (rm < float(m))
                key = rel * m + rm  # (1, C) in [0, tr*m)
                tile = jnp.floor(cx1 * (1.0 / 128.0))
                # min/max on an 8-sublane broadcast: full reductions over
                # 1-sublane (1, C) arrays crash the TPU lowering.
                eight = jnp.zeros((8, 1), jnp.float32)
                tmin = jnp.where(ok, tile, 3.0e4) + eight  # (8, C)
                tmax = jnp.where(ok, tile, -1.0) + eight
                t0 = jnp.min(tmin)
                t1 = jnp.max(tmax)
                t0i = jnp.where(t0 < 3.0e4, t0, 1.0).astype(jnp.int32)
                t1i = jnp.maximum(t1, 0.0).astype(jnp.int32) * (
                    t1 >= 0.0
                ).astype(jnp.int32)
                res0 = jnp.zeros((nb, SUB_E), jnp.float32)

                def tile_body(t, res, cx1=cx1, ok=ok, key=key):
                    base = pl.multiple_of(t * 128, 128)
                    lv = acc_ref[:, :, :, pl.ds(base, 128)].reshape(
                        nb * tr * m, 128
                    )
                    basef = (t * 128).astype(jnp.float32)
                    return res + _select_columns(
                        lv, cx1 - basef, ok, key, tr * m, nb
                    )

                part = jax.lax.fori_loop(t0i, t1i + 1, tile_body, res0)
                cur = oacc_r[:, s : s + SUB_E]
                oacc_r[:, s : s + SUB_E] = cur + part

        @pl.when(s_hi > s_lo)
        def _():
            _emit_loop(
                slab_hbm, out_hbm, aux_ref, oacc_ref,
                esem.at[0], esem.at[1], esem.at[2], s_lo, s_hi, body,
            )


def _pass_b_addon_math(
    g_hbm, ps_hbm, win, ps_win, npos_ref, cp_ref, coef_ref, tick_ref,
    sem_g, sem_ps, blk, woff, tr, enable_spring,
):
    """DMA one add-on unit window and run the cross-half stencils.

    Returns the ``results`` dict {"lo"/"hi": (cp, acc list, cnt)} holding the
    *add-on-only* contributions (lo) and the full hi-slot results."""
    xw = pl.ds(pl.multiple_of(woff, TXW), win.shape[-1])
    r0 = blk * tr
    dma1 = pltpu.make_async_copy(
        g_hbm.at[:, pl.ds(r0, tr + 2), slice(None), xw], win, sem_g
    )
    dma2 = pltpu.make_async_copy(
        ps_hbm.at[:, pl.ds(r0, tr + 2), slice(None), xw], ps_win, sem_ps
    )
    dma1.start()
    dma2.start()
    dma1.wait()
    dma2.wait()
    coef = (
        coef_ref[0],
        1.0 / coef_ref[0],
        coef_ref[1],
        coef_ref[2],
        coef_ref[3],
    )
    window = win[:]
    nx_, ny_ = _noise_planes(
        window, blk, tr, coef_ref[4], tick_ref[0], tick_ref[1], x0=woff
    )
    npos_ref[NPOSX] = nx_
    npos_ref[NPOSY] = ny_
    cp_ref[0] = _finalize_cp(ps_win[:], coef_ref[5])

    def half(arr, h):
        return arr[:, :, h * M_LO : (h + 1) * M_LO]

    n_acc = 6 if enable_spring else 4
    results = {}
    for tag, s_h, nb_hs in (("lo", 0, (1,)), ("hi", 1, (0, 1))):
        self_win = half(window, s_h)[:, 1 : 1 + tr]
        cp = half(cp_ref[:], s_h)[0, 1 : 1 + tr]
        s_x = half(ps_win[:], s_h)[SX, 1 : 1 + tr]
        s_y = half(ps_win[:], s_h)[SY, 1 : 1 + tr]
        acc = [jnp.zeros(cp.shape, jnp.float32) for _ in range(n_acc + 2)]
        cnt_cell = [jnp.zeros(cp.shape, jnp.float32)]
        body = _pass_b_accumulate(
            self_win, cp, s_x, s_y, coef, acc, cnt_cell, enable_spring
        )
        for nb_h in nb_hs:
            _stencil(
                [self_win],
                [
                    half(window, nb_h),
                    half(cp_ref[:], nb_h),
                    half(ps_win[:], nb_h)[SX : SX + 1],
                    half(ps_win[:], nb_h)[SY : SY + 1],
                    half(npos_ref[:], nb_h),
                ],
                tr,
                M_LO,
                body,
                skip_center=(nb_h == s_h),
            )
        results[tag] = (cp, acc, cnt_cell[0])
    return results


def _pass_b_addon_kernel(
    blk_ref,
    til_ref,
    coef_ref,  # (6,)
    tick_ref,  # (2,) i32
    g_hbm,
    ps_hbm,
    outbuf_hbm,  # baseline pass-B output, aliased to out_hbm (RMW)
    out_hbm,
    win,
    ps_win,
    npos_ref,
    cp_ref,
    acc_ref,  # (nb_planes, TR, 2*M_LO, TXW)
    sems,
    *,
    tr,
    nxp,
    enable_spring,
):
    """Two-level add-on for pass B (see _pass_a_addon_kernel)."""
    del outbuf_hbm
    u = pl.program_id(0)
    blk = blk_ref[u]

    @pl.when(blk >= 0)
    def _():
        til = til_ref[u]
        woff, loff = _unit_window(til, nxp)
        r0 = blk * tr
        xd = pl.ds(pl.multiple_of(til * TXW, TXW), TXW)
        rmw = pltpu.make_async_copy(
            out_hbm.at[:, pl.ds(r0, tr), pl.ds(0, M_LO), xd],
            acc_ref.at[:, :, pl.ds(0, M_LO)],
            sems.at[2],
        )
        rmw.start()
        results = _pass_b_addon_math(
            g_hbm, ps_hbm, win, ps_win, npos_ref, cp_ref, coef_ref, tick_ref,
            sems.at[0], sems.at[1], blk, woff, tr, enable_spring,
        )
        rmw.wait()
        n_acc = 6 if enable_spring else 4

        for off in range(0, _xwin(nxp), TXW):

            @pl.when(loff == off)
            def _():
                sl = slice(off, off + TXW)
                _, acc_lo, cnt_lo = results["lo"]
                for f in range(n_acc + 2):
                    cur = acc_ref[1 + f, :, 0:M_LO]
                    acc_ref[1 + f, :, 0:M_LO] = cur + acc_lo[f][:, :, sl]
                cur = acc_ref[n_acc + 3, :, 0:M_LO]
                acc_ref[n_acc + 3, :, 0:M_LO] = cur + cnt_lo[:, :, sl]
                cp_hi, acc_hi, cnt_hi = results["hi"]
                acc_ref[0, :, M_LO : 2 * M_LO] = cp_hi[:, :, sl]
                for f in range(n_acc + 2):
                    acc_ref[1 + f, :, M_LO : 2 * M_LO] = acc_hi[f][:, :, sl]
                acc_ref[n_acc + 3, :, M_LO : 2 * M_LO] = cnt_hi[:, :, sl]

        out = pltpu.make_async_copy(
            acc_ref, out_hbm.at[:, pl.ds(r0, tr), slice(None), xd], sems.at[3]
        )
        out.start()
        out.wait()


def _pass_b_addon_emit_kernel(
    blk_ref,
    til_ref,
    coef_ref,
    tick_ref,
    ranges_ref,  # (W, 2*TR) i32: per-unit per-row slab ranges (lo, hi)
    g_hbm,
    ps_hbm,
    slab_hbm,
    outbuf_hbm,  # baseline emit output, aliased to out_hbm (RMW-add)
    out_hbm,  # (nb, P_pad)
    win,
    ps_win,
    npos_ref,
    cp_ref,
    acc_ref,  # (nb, TR, 2*M_LO, TXW)
    aux_ref,
    oacc_ref,
    sems,
    esem,  # (3, 2) emission DMA semaphores
    *,
    tr,
    nxp,
    enable_spring,
):
    """Two-level add-on emitting straight into the sorted-order columns.

    The lo half contributes only the cross-term sums (the baseline already
    emitted the full lo results, and cp is complete there); the hi half
    contributes its full results (the baseline never touches hi particles).
    """
    del outbuf_hbm
    u = pl.program_id(0)
    blk = blk_ref[u]

    @pl.when(blk >= 0)
    def _():
        til = til_ref[u]
        woff, loff = _unit_window(til, nxp)
        results = _pass_b_addon_math(
            g_hbm, ps_hbm, win, ps_win, npos_ref, cp_ref, coef_ref, tick_ref,
            sems.at[0], sems.at[1], blk, woff, tr, enable_spring,
        )
        n_acc = 6 if enable_spring else 4
        nb = n_acc + 4
        for off in range(0, _xwin(nxp), TXW):

            @pl.when(loff == off)
            def _():
                sl = slice(off, off + TXW)
                _, acc_lo, cnt_lo = results["lo"]
                acc_ref[0, :, 0:M_LO] = jnp.zeros_like(acc_ref[0, :, 0:M_LO])
                for f in range(n_acc + 2):
                    acc_ref[1 + f, :, 0:M_LO] = acc_lo[f][:, :, sl]
                acc_ref[n_acc + 3, :, 0:M_LO] = cnt_lo[:, :, sl]
                cp_hi, acc_hi, cnt_hi = results["hi"]
                acc_ref[0, :, M_LO : 2 * M_LO] = cp_hi[:, :, sl]
                for f in range(n_acc + 2):
                    acc_ref[1 + f, :, M_LO : 2 * M_LO] = acc_hi[f][:, :, sl]
                acc_ref[n_acc + 3, :, M_LO : 2 * M_LO] = cnt_hi[:, :, sl]

        basef = (til * TXW).astype(jnp.float32)
        for r in range(tr):
            rowgf = (blk * tr + r).astype(jnp.float32)
            s_lo = ranges_ref[u, 2 * r]
            s_hi = ranges_ref[u, 2 * r + 1]

            def body(aux_r, oacc_r, _r=r, _rowgf=rowgf, _basef=basef):
                cx1, r16, rowf = _aux_fields(aux_r[:])
                ok = (
                    (rowf == _rowgf)
                    & (cx1 >= _basef)
                    & (cx1 < _basef + TXW)
                )
                lv = acc_ref[:, _r].reshape(nb * 2 * M_LO, TXW)
                oacc_r[:] = oacc_r[:] + _select_columns(
                    lv, cx1 - _basef, ok, r16, 2 * M_LO, nb
                )

            @pl.when(s_hi > s_lo)
            def _(body=body, s_lo=s_lo, s_hi=s_hi):
                _emit_loop(
                    slab_hbm, out_hbm, aux_ref, oacc_ref,
                    esem.at[0], esem.at[1], esem.at[2], s_lo, s_hi, body,
                )


# --------------------------------------------------------------------------
# wrappers
# --------------------------------------------------------------------------


def occ_from_row_start(row_start: jax.Array, tr: int, ny: int) -> jax.Array:
    """Per-row-block occupancy from the slab's row ranges — no grid reads.

    Equivalent to ``_block_flags``'s ``occ`` (block i's window covers padded
    rows [i*tr, i*tr+tr+2) = grid rows [i*tr-1, i*tr+tr+1)): a block is
    occupied iff any particle's cell row falls in that window.  Replaces a
    measured ~328MB grid-plane reduction per call at 1M with ny+1 scalar
    gathers (dead particles sort past ``row_start[ny]`` and never count).
    """
    nblocks = ny // tr
    i = jnp.arange(nblocks, dtype=jnp.int32)
    lo = jnp.maximum(i * tr - 1, 0)
    hi = jnp.minimum(i * tr + tr + 1, ny)
    return (row_start[hi] > row_start[lo]).astype(jnp.int32)


def _block_flags(
    alive_plane: jax.Array, tr: int
) -> tuple[jax.Array, jax.Array]:
    """Per-row-block (occupancy, two-level engagement) flags.

    alive_plane: the POSX plane (NYP, M, NXP) — occupied slots carry the
    ALIVE_OFFSET.  Block i's window covers G rows [i*TR, i*TR + TR + 2).
    ``eng[i]`` is set when any window row holds a particle in the hi slot
    sublanes (rank >= M_LO): only those blocks run the add-on kernels.
    """
    nyp, m_slots, _ = alive_plane.shape
    ny = nyp - 2
    nblocks = ny // tr
    row_any = jnp.max(alive_plane[:, :M_LO, :], axis=(1, 2))  # (NYP,)
    idx = jnp.arange(nblocks)[:, None] * tr + jnp.arange(tr + 2)[None, :]
    occ = (jnp.max(row_any[idx], axis=1) > ALIVE_THRESHOLD).astype(jnp.int32)
    if m_slots <= M_LO:
        return occ, jnp.zeros_like(occ)
    row_hi = jnp.max(alive_plane[:, M_LO:, :], axis=(1, 2))
    eng = (jnp.max(row_hi[idx], axis=1) > ALIVE_THRESHOLD).astype(jnp.int32)
    return occ, eng


def _engaged_units(alive_plane: jax.Array, tr: int, w_cap: int):
    """Compacted (row block, x-tile) work list for the two-level add-ons.

    A unit is engaged when any slot-8+ particle sits within its window
    (rows i*tr..i*tr+tr+2, data lanes +-1 — the 1-lane dilation covers
    cross-tile edge pairs).  Returns (blk (W,), til (W,), n_engaged ())
    with -1 block sentinels past the engaged prefix; units beyond the
    static cap lose their hi-level pairs and must be counted by the caller
    (n_engaged - W when positive).
    """
    nyp, m_slots, nxp = alive_plane.shape
    ny = nyp - 2
    nblocks = ny // tr
    ntx = nxp // TXW
    hi = jnp.max(alive_plane[:, M_LO:, :], axis=1) > ALIVE_THRESHOLD  # (NYP, NXP)
    hi = hi | jnp.roll(hi, 1, axis=1) | jnp.roll(hi, -1, axis=1)
    tile_any = jnp.any(hi.reshape(nyp, ntx, TXW), axis=2)  # (NYP, ntx)
    idx = jnp.arange(nblocks)[:, None] * tr + jnp.arange(tr + 2)[None, :]
    eng = jnp.any(tile_any[idx], axis=1)  # (nblocks, ntx)
    flat = eng.ravel()
    n = flat.shape[0]
    w = min(w_cap, n)
    score = jnp.where(flat, n - jnp.arange(n, dtype=jnp.int32), 0)
    top, pos = jax.lax.top_k(score, w)
    valid = top > 0
    blk = jnp.where(valid, pos // ntx, -1).astype(jnp.int32)
    til = jnp.where(valid, pos % ntx, 0).astype(jnp.int32)
    return blk, til, jnp.sum(flat.astype(jnp.int32))


# Static work-list cap for the add-on kernels: every invalid unit still costs
# a skipped grid step (~1us), so size to a generous multiple of the measured
# engaged-unit count (215 at 1M mid-splash) rather than the full tile count.
ADDON_UNIT_CAP = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("tr",))
def pair_pass_a(
    grid: jax.Array,  # (4, NYP, M, NXP) f32 padded particle grid
    diameter: jax.Array,
    noise_amp: jax.Array,
    tick: jax.Array,
    tr: int = 8,
    row_offset: jax.Array | int = 0,
    occ: jax.Array | None = None,
    units: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """Pass A: padded per-slot [w_sum, s_x, s_y, cnt] of shape
    (4, NYP, M, NXP) with a zero ring — pass B's neighbor operand
    (pressure itself is finalized inside pass B).

    ``row_offset``: global padded-row index of this grid's row 0 (nonzero
    only under spatial sharding) — keys the in-kernel collider noise.
    ``occ``/``units``: precomputed block-occupancy and engaged-unit lists
    (occ_from_row_start / _engaged_units) shared across both passes by the
    sorted-state glue; None falls back to in-place grid-plane reductions."""
    _, nyp, m_slots, nxp = grid.shape
    ny = nyp - 2
    assert ny % tr == 0, (ny, tr)
    assert nxp % 128 == 0, nxp
    assert m_slots in (M_LO, 2 * M_LO), m_slots
    # The in-kernel noise hash packs slot id as gy*16*8192 + gm*8192 + gx;
    # wider grids would alias noise streams across slots/rows (and across
    # spatial shards, which rely on window-invariant hashing for halos).
    assert nxp <= 8192 and m_slots <= 16, (nxp, m_slots)
    nblocks = ny // tr
    m = min(m_slots, M_LO)
    if occ is None:
        occ, _ = _block_flags(grid[POSX], tr)
    coef = jnp.stack(
        [diameter.astype(jnp.float32), noise_amp.astype(jnp.float32)]
    )
    tick_arr = jnp.stack(
        [
            jnp.asarray(tick, jnp.int32).reshape(()),
            jnp.asarray(row_offset, jnp.int32).reshape(()),
        ]
    )

    kernel = functools.partial(_pass_a_kernel, tr=tr, m=m)
    ps = pl.pallas_call(
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
                pltpu.VMEM((NUM_G, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((2, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((NUM_A, tr, m, nxp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NUM_A, nyp, m_slots, nxp), jnp.float32),
        input_output_aliases={4: 0},  # outbuf (5th flat input) -> output
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(occ, coef, tick_arr, grid, jnp.zeros((NUM_A, nyp, m_slots, nxp), jnp.float32))
    if m_slots == M_LO:
        return ps

    if units is None:
        blk, til, _ = _engaged_units(grid[POSX], tr, ADDON_UNIT_CAP)
    else:
        blk, til = units
    addon = functools.partial(_pass_a_addon_kernel, tr=tr, nxp=nxp)
    return pl.pallas_call(
        addon,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(blk.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((NUM_G, tr + 2, m_slots, _xwin(nxp)), jnp.float32),
                pltpu.VMEM((2, tr + 2, m_slots, _xwin(nxp)), jnp.float32),
                pltpu.VMEM((NUM_A, tr, m_slots, TXW), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NUM_A, nyp, m_slots, nxp), jnp.float32),
        input_output_aliases={5: 0},  # ps buffer -> output (RMW)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(blk, til, coef, tick_arr, grid, ps)


@functools.partial(jax.jit, static_argnames=("tr", "enable_spring"))
def pair_pass_b(
    grid: jax.Array,  # (4, NYP, M, NXP)
    ps_grid: jax.Array,  # (4, NYP, M, NXP) pass-A output
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
    ignored_pressure: jax.Array,
    noise_amp: jax.Array,
    tick: jax.Array,
    tr: int = 8,
    enable_spring: bool = False,
    row_offset: jax.Array | int = 0,
    occ: jax.Array | None = None,
    units: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """Pass B: all per-slot results (8|10, NY, M, NXP):
    [pressure, tension x/y, pressure-force x/y, (spring x/y), viscosity x/y,
    neighbor count] — PairSums order, one gather for the glue."""
    _, nyp, m_slots, nxp = grid.shape
    ny = nyp - 2
    assert ny % tr == 0, (ny, tr)
    assert m_slots in (M_LO, 2 * M_LO), m_slots
    assert nxp <= 8192 and m_slots <= 16, (nxp, m_slots)  # noise-hash strides
    nblocks = ny // tr
    m = min(m_slots, M_LO)
    if occ is None:
        occ, _ = _block_flags(grid[POSX], tr)
    coef = jnp.stack(
        [
            diameter.astype(jnp.float32),
            surface_smoothing.astype(jnp.float32),
            target_pressure.astype(jnp.float32),
            spring_overlap_balance.astype(jnp.float32),
            noise_amp.astype(jnp.float32),
            ignored_pressure.astype(jnp.float32),
        ]
    )
    tick_arr = jnp.stack(
        [
            jnp.asarray(tick, jnp.int32).reshape(()),
            jnp.asarray(row_offset, jnp.int32).reshape(()),
        ]
    )

    nb_planes = num_b(enable_spring)
    kernel = functools.partial(
        _pass_b_kernel, tr=tr, m=m, enable_spring=enable_spring
    )
    b_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((NUM_G, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((NUM_A, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((2, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((1, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((nb_planes, tr, m, nxp), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb_planes, ny, m_slots, nxp), jnp.float32),
        input_output_aliases={5: 0},  # outbuf (6th flat input) -> output
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(
        occ, coef, tick_arr, grid, ps_grid,
        jnp.zeros((nb_planes, ny, m_slots, nxp), jnp.float32),
    )
    if m_slots == M_LO:
        return b_out

    if units is None:
        blk, til, _ = _engaged_units(grid[POSX], tr, ADDON_UNIT_CAP)
    else:
        blk, til = units
    addon = functools.partial(
        _pass_b_addon_kernel, tr=tr, nxp=nxp, enable_spring=enable_spring
    )
    return _pass_b_addon_call(
        addon, blk, til, coef, tick_arr, grid, ps_grid, b_out, nb_planes, ny,
        m_slots, nxp, tr,
    )


def _pass_b_addon_call(
    addon, blk, til, coef, tick_arr, grid, ps_grid, b_out, nb_planes, ny,
    m_slots, nxp, tr,
):
    return pl.pallas_call(
        addon,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(blk.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((NUM_G, tr + 2, m_slots, _xwin(nxp)), jnp.float32),
                pltpu.VMEM((NUM_A, tr + 2, m_slots, _xwin(nxp)), jnp.float32),
                pltpu.VMEM((2, tr + 2, m_slots, _xwin(nxp)), jnp.float32),
                pltpu.VMEM((1, tr + 2, m_slots, _xwin(nxp)), jnp.float32),
                pltpu.VMEM((nb_planes, tr, m_slots, TXW), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb_planes, ny, m_slots, nxp), jnp.float32),
        input_output_aliases={6: 0},  # baseline b_out -> output (RMW)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(blk, til, coef, tick_arr, grid, ps_grid, b_out)


def _addon_unit_ranges(blk, til, sorted_cid, nx: int, tr: int):
    """Per-(unit, row) slab index ranges for the emit-mode add-ons.

    Unit (blk, til) touches particles whose padded x (cx + 1) falls in the
    128-lane data tile; within one grid row those are a contiguous slab
    range (the state is sorted by row-major cell id), located with two
    searchsorteds.  Returns (W, 2*tr) i32 [lo, hi) pairs, zeros for the
    -1-sentinel units.
    """
    rows = jnp.maximum(blk, 0)[:, None] * tr + jnp.arange(tr)[None, :]  # (W, tr)
    cx_lo = jnp.maximum(til[:, None] * TXW - 1, 0)
    cx_hi = jnp.minimum((til[:, None] + 1) * TXW - 1, nx)
    lo_cid = rows * nx + cx_lo
    hi_cid = rows * nx + cx_hi
    lo = jnp.searchsorted(sorted_cid, lo_cid.ravel()).astype(jnp.int32)
    hi = jnp.searchsorted(sorted_cid, hi_cid.ravel()).astype(jnp.int32)
    W = blk.shape[0]
    ranges = jnp.stack([lo, hi], axis=-1).reshape(W, tr, 2).reshape(W, 2 * tr)
    return jnp.where((blk >= 0)[:, None], ranges, 0)


@functools.partial(jax.jit, static_argnames=("nx", "tr", "enable_spring"))
def pair_pass_b_emit(
    grid: jax.Array,  # (4, NYP, M, NXP)
    ps_grid: jax.Array,  # (4, NYP, M, NXP) pass-A output
    slab: jax.Array,  # (SLAB_F, P_pad) placement slab (sorted order)
    row_start: jax.Array,  # (ny+1,) i32
    sorted_cid: jax.Array,  # (P,) i32 cell ids, sorted (for add-on ranges)
    nx: int,  # true (unpadded) grid width: cid = row * nx + cx
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
    ignored_pressure: jax.Array,
    noise_amp: jax.Array,
    tick: jax.Array,
    tr: int = 8,
    enable_spring: bool = False,
    occ: jax.Array | None = None,
    units: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """Pass B emitting results in slab (= sorted state) order: (nb, P_pad).

    Row order matches the grid-mode planes [pressure, tension x/y,
    pressure-force x/y, (spring x/y), viscosity x/y, count]; dead and
    out-of-grid columns are zero.  Single-chip sorted-state path only (the
    spatial engine keeps the grid emission + gather, pallas_forces.py).
    ``occ``/``units``: precomputed flags shared with pass A (see pair_pass_a).
    """
    _, nyp, m_slots, nxp = grid.shape
    ny = nyp - 2
    assert ny % tr == 0, (ny, tr)
    assert m_slots in (M_LO, 2 * M_LO), m_slots
    assert nxp <= 8192 and m_slots <= 16, (nxp, m_slots)
    nblocks = ny // tr
    m = min(m_slots, M_LO)
    p_pad = slab.shape[1]
    if occ is None:
        occ, _ = _block_flags(grid[POSX], tr)
    coef = jnp.stack(
        [
            diameter.astype(jnp.float32),
            surface_smoothing.astype(jnp.float32),
            target_pressure.astype(jnp.float32),
            spring_overlap_balance.astype(jnp.float32),
            noise_amp.astype(jnp.float32),
            ignored_pressure.astype(jnp.float32),
        ]
    )
    tick_arr = jnp.stack(
        [
            jnp.asarray(tick, jnp.int32).reshape(()),
            jnp.zeros((), jnp.int32),  # row_offset 0: single-chip only
        ]
    )

    nb_planes = num_b(enable_spring)
    kernel = functools.partial(
        _pass_b_emit_kernel, tr=tr, m=m, m_slots=m_slots,
        enable_spring=enable_spring,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((NUM_G, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((NUM_A, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((2, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((1, tr + 2, m, nxp), jnp.float32),
                pltpu.VMEM((nb_planes, tr, m, nxp), jnp.float32),
                pltpu.VMEM((2, SLAB_F_E, CHUNK_E), jnp.float32),
                pltpu.VMEM((2, nb_planes, CHUNK_E), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((3, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb_planes, p_pad), jnp.float32),
        input_output_aliases={7: 0},  # zeros buffer (8th flat input) -> output
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(
        occ, coef, tick_arr, row_start, grid, ps_grid, slab,
        jnp.zeros((nb_planes, p_pad), jnp.float32),
    )
    if m_slots == M_LO:
        return out

    if units is None:
        blk, til, _ = _engaged_units(grid[POSX], tr, ADDON_UNIT_CAP)
    else:
        blk, til = units
    ranges = _addon_unit_ranges(blk, til, sorted_cid, nx, tr)
    addon = functools.partial(
        _pass_b_addon_emit_kernel, tr=tr, nxp=nxp, enable_spring=enable_spring
    )
    return pl.pallas_call(
        addon,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(blk.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((NUM_G, tr + 2, m_slots, _xwin(nxp)), jnp.float32),
                pltpu.VMEM((NUM_A, tr + 2, m_slots, _xwin(nxp)), jnp.float32),
                pltpu.VMEM((2, tr + 2, m_slots, _xwin(nxp)), jnp.float32),
                pltpu.VMEM((1, tr + 2, m_slots, _xwin(nxp)), jnp.float32),
                pltpu.VMEM((nb_planes, tr, m_slots, TXW), jnp.float32),
                pltpu.VMEM((2, SLAB_F_E, CHUNK_E), jnp.float32),
                pltpu.VMEM((2, nb_planes, CHUNK_E), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((3, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb_planes, p_pad), jnp.float32),
        input_output_aliases={8: 0},  # baseline out -> output (RMW-add)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(blk, til, coef, tick_arr, ranges, grid, ps_grid, slab, out)
