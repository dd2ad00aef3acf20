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
  reused by all 9M stencil rotations — instead of shipping two extra
  jittered-position planes through the scatter and HBM (the scatter is the
  step's single most expensive op at 1M particles: ~7ns per scattered
  element on v5e).

Two kernels because tension/pressure need *all* particles' pressures and
surface normals first (crate.py:261-284 then :295-358):

* pass A emits the *padded* (4, NYP, M, NXP) grid [pressure, s_x, s_y, cnt]
  (pressure finished in-kernel: max(0, w_sum - ignored_pressure) masked to
  counted slots) — exactly the neighbor-side operand pass B windows over,
  so no host-side stack/pad/slice copies happen between the passes.
* pass B emits all ten per-slot result planes (10, NY, M, NXP):
  [pressure, tension xy, pressure-force xy, spring xy, viscosity xy, cnt] —
  one buffer for the single gather back to particle order.

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
# removes the ALIVE plane from the scatter (the step's most expensive op)
# and from every window DMA.
POSX, POSY, VELX, VELY = range(4)
NUM_G = 4
ALIVE_OFFSET = 2.0
ALIVE_THRESHOLD = 1.5  # posx > threshold <=> slot occupied
# In-kernel noise scratch planes (jittered neighbor positions).
NPOSX, NPOSY = range(2)
# Pass-A output planes (padded grid, pass-B neighbor operand).
CP, SX, SY, CNT = range(4)
NUM_A = 4
# Pass-B output planes (gathered straight into PairSums order).  The spring
# planes exist only when the scene enables the spring force (the reference
# ships it disabled, crate.py:117-118) — fewer planes, smaller write+gather.
def num_b(enable_spring: bool) -> int:
    return 10 if enable_spring else 8


def _stencil(windows, tr, m_slots, body):
    """Visit every (dy, dx, slot-rotation k) stencil combination.

    ``windows`` is a list of VMEM-resident slabs sharing the layout
    (C, TR+2, M, NXP); the same rotations are applied to each so ``body``
    sees matching neighbor operands: body(nbs, dy, dx, k) where
    nbs[j][c, t, m, x] = windows[j][c, t+dy, (m-k)%M, x+dx].

    Each k rotation is derived from the un-rotated slab (not incrementally
    from k-1) so the M rotations form no dependency chain and the compiler
    can overlap them with the pair math.
    """
    nxp = windows[0].shape[-1]
    for dy in (0, 1, 2):
        rows = [w[:, dy : dy + tr] for w in windows]
        for dx in (-1, 0, 1):
            base = [
                pltpu.roll(r, (-dx) % nxp, axis=3) if dx else r for r in rows
            ]
            for k in range(m_slots):
                if dy == 1 and dx == 0 and k == 0:
                    continue  # every pair is a particle with itself
                cur = [pltpu.roll(b, k, axis=2) if k else b for b in base]
                body(cur, dy, dx, k)


def _noise_planes(window, i, tr, noise_amp, tick, row0):
    """Jittered positions for the window: npos = pos + noise (2, TR+2, M, NXP).

    The jitter for a slot is a pure integer hash of its *global* grid
    position and the tick, so every block computes the identical jitter for
    the same neighbor regardless of which window it appears in, and the
    stream changes every tick (crate.py:168-170's np.random role).  ``row0``
    is the window's global padded-row offset: 0 single-device; d * band_rows
    under spatial sharding, so shards hash identical jitter for the shared
    halo particles.
    """
    _, rows, m_slots, nxp = window.shape
    gy = row0 + i * tr + jax.lax.broadcasted_iota(jnp.int32, (rows, m_slots, nxp), 0)
    gm = jax.lax.broadcasted_iota(jnp.int32, (rows, m_slots, nxp), 1)
    gx = jax.lax.broadcasted_iota(jnp.int32, (rows, m_slots, nxp), 2)
    pid = (gy * m_slots + gm) * nxp + gx

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
    """Pair geometry: mask, unit direction (to the jittered neighbor),
    overlap weight.  All operands (F, TR, M, NXP) — fully elementwise.
    Uses one rsqrt in place of sqrt + divide.

    The distance cutoff alone is the pair mask: the ALIVE_OFFSET encoding
    puts any alive-dead pair ~2 units apart.  Dead-dead pairs (both at 0)
    do pass the cutoff, but their results live in slots no particle gathers.
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
    return m.astype(nrx.dtype), nhx, nhy, w


def _pass_a_kernel(
    occ_ref,
    coef_ref,  # (3,) f32: diameter, ignored_pressure, noise_amp
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
    m_slots,
):
    # Output rows are written back by manual DMA.  out_hbm is aliased to the
    # outbuf_hbm zeros input (input_output_aliases) — the alias both keeps
    # XLA from staging the unblocked output on the VMEM stack and leaves
    # skipped (air) blocks' rows zero without writing them.
    del outbuf_hbm
    i = pl.program_id(0)

    @pl.when(occ_ref[i] > 0)
    def _():
        dma = pltpu.make_async_copy(
            g_hbm.at[:, pl.ds(i * tr, tr + 2)], win, sems.at[0]
        )
        dma.start()
        dma.wait()
        diam = coef_ref[0]
        ignored_pressure = coef_ref[1]
        inv_diam = 1.0 / diam
        window = win[:]
        nx_, ny_ = _noise_planes(
            window, i, tr, coef_ref[2], tick_ref[0], tick_ref[1]
        )
        npos_ref[NPOSX] = nx_
        npos_ref[NPOSY] = ny_
        npos = npos_ref[:]
        self_win = window[:, 1 : 1 + tr]  # (F, TR, M, NXP)
        shape = self_win[POSX].shape
        w_sum = jnp.zeros(shape, jnp.float32)
        sx = jnp.zeros(shape, jnp.float32)
        sy = jnp.zeros(shape, jnp.float32)
        cnt = jnp.zeros(shape, jnp.float32)

        def body(nbs, dy, dx, k):
            nonlocal w_sum, sx, sy, cnt
            nb, nb_npos = nbs
            m, nhx, nhy, w = _geometry(self_win, nb, nb_npos, diam, inv_diam)
            w_sum += w
            coeff = (1.0 - w) * w
            sx += coeff * nhx
            sy += coeff * nhy
            cnt += m

        _stencil([window, npos], tr, m_slots, body)
        # Finish the particle pressure in-kernel (crate.py:261-275).
        acc_ref[CP] = jnp.where(
            cnt > 0, jnp.maximum(0.0, w_sum - ignored_pressure), 0.0
        )
        acc_ref[SX] = sx
        acc_ref[SY] = sy
        acc_ref[CNT] = cnt
        # Write into the *padded* output at row offset +1 (the ring is the
        # donated buffer's zeros).
        out = pltpu.make_async_copy(
            acc_ref, out_hbm.at[:, pl.ds(i * tr + 1, tr)], sems.at[1]
        )
        out.start()
        out.wait()


def _pass_b_kernel(
    occ_ref,
    coef_ref,  # (5,): diameter, smoothing, target_p, balance, noise_amp
    tick_ref,  # (2,) i32: tick, global row offset
    g_hbm,
    ps_hbm,  # (4, NYP, M, NXP) pass-A output; planes CP/SX/SY windowed here
    outbuf_hbm,
    out_hbm,
    win,
    ps_win,
    npos_ref,
    acc_ref,
    sems,
    *,
    tr,
    m_slots,
    enable_spring,
):
    del outbuf_hbm  # aliased to out_hbm (see pass A note)
    i = pl.program_id(0)

    @pl.when(occ_ref[i] > 0)
    def _():
        dma1 = pltpu.make_async_copy(
            g_hbm.at[:, pl.ds(i * tr, tr + 2)], win, sems.at[0]
        )
        dma2 = pltpu.make_async_copy(
            ps_hbm.at[pl.ds(0, 3), pl.ds(i * tr, tr + 2)], ps_win, sems.at[1]
        )
        dma1.start()
        dma2.start()
        dma1.wait()
        dma2.wait()
        diam = coef_ref[0]
        inv_diam = 1.0 / diam
        smooth = coef_ref[1]
        target_p = coef_ref[2]
        balance = coef_ref[3]
        window = win[:]
        nx_, ny_ = _noise_planes(
            window, i, tr, coef_ref[4], tick_ref[0], tick_ref[1]
        )
        npos_ref[NPOSX] = nx_
        npos_ref[NPOSY] = ny_
        npos = npos_ref[:]
        ps_window = ps_win[:]
        self_win = window[:, 1 : 1 + tr]
        self_ps = ps_window[:, 1 : 1 + tr]  # (3, TR, M, NXP)
        cp = self_ps[CP]
        s_x = self_ps[SX]
        s_y = self_ps[SY]
        shape = cp.shape
        n_acc = 6 if enable_spring else 4
        acc = [jnp.zeros(shape, jnp.float32) for _ in range(n_acc + 2)]
        cnt = jnp.zeros(shape, jnp.float32)

        def body(nbs, dy, dx, k):
            nonlocal cnt
            nb, nb_ps, nb_npos = nbs
            m, nhx, nhy, w = _geometry(self_win, nb, nb_npos, diam, inv_diam)
            p_nb = nb_ps[CP]
            align = (
                (s_x - nb_ps[SX]) * nhx + (s_y - nb_ps[SY]) * nhy
            ) * smooth
            tpf = p_nb + cp - 2.0 * target_p
            t_coef = m * (align + tpf)
            acc[0] += t_coef * nhx
            acc[1] += t_coef * nhy
            p_coef = m * (cp + p_nb)
            acc[2] += p_coef * nhx
            acc[3] += p_coef * nhy
            if enable_spring:  # flag-gated like the reference tick
                s_coef = m * (balance - w)
                acc[4] += s_coef * nhx
                acc[5] += s_coef * nhy
            acc[n_acc] += m * nb[VELX]
            acc[n_acc + 1] += m * nb[VELY]
            cnt += m

        _stencil([window, ps_window, npos], tr, m_slots, body)
        acc_ref[0] = cp
        for f in range(n_acc + 2):
            acc_ref[1 + f] = acc[f]
        acc_ref[n_acc + 3] = cnt
        out = pltpu.make_async_copy(
            acc_ref, out_hbm.at[:, pl.ds(i * tr, tr)], sems.at[2]
        )
        out.start()
        out.wait()


def _block_occupancy(alive_plane: jax.Array, tr: int) -> jax.Array:
    """Per-row-block window occupancy flags from the grid's alive plane.

    alive_plane: the POSX plane (NYP, M, NXP) — occupied slots carry the
    ALIVE_OFFSET.  Block i's window covers G rows [i*TR, i*TR + TR + 2).
    """
    nyp = alive_plane.shape[0]
    ny = nyp - 2
    nblocks = ny // tr
    row_any = jnp.max(alive_plane, axis=(1, 2))  # (NYP,)
    idx = jnp.arange(nblocks)[:, None] * tr + jnp.arange(tr + 2)[None, :]
    return (jnp.max(row_any[idx], axis=1) > ALIVE_THRESHOLD).astype(jnp.int32)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("tr",))
def pair_pass_a(
    grid: jax.Array,  # (5, NYP, M, NXP) f32 padded particle grid
    diameter: jax.Array,
    ignored_pressure: jax.Array,
    noise_amp: jax.Array,
    tick: jax.Array,
    tr: int = 8,
    row_offset: jax.Array | int = 0,
) -> jax.Array:
    """Pass A: padded per-slot [pressure, s_x, s_y, cnt] of shape
    (4, NYP, M, NXP) with a zero ring — pass B's neighbor operand.

    ``row_offset``: global padded-row index of this grid's row 0 (nonzero
    only under spatial sharding) — keys the in-kernel collider noise."""
    _, nyp, m_slots, nxp = grid.shape
    ny = nyp - 2
    assert ny % tr == 0, (ny, tr)
    assert nxp % 128 == 0, nxp
    nblocks = ny // tr
    occ = _block_occupancy(grid[POSX], tr)
    coef = jnp.stack(
        [
            diameter.astype(jnp.float32),
            ignored_pressure.astype(jnp.float32),
            noise_amp.astype(jnp.float32),
        ]
    )
    tick_arr = jnp.stack(
        [
            jnp.asarray(tick, jnp.int32).reshape(()),
            jnp.asarray(row_offset, jnp.int32).reshape(()),
        ]
    )

    kernel = functools.partial(_pass_a_kernel, tr=tr, m_slots=m_slots)
    return pl.pallas_call(
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
                pltpu.VMEM((NUM_G, tr + 2, m_slots, nxp), jnp.float32),
                pltpu.VMEM((2, tr + 2, m_slots, nxp), jnp.float32),
                pltpu.VMEM((NUM_A, tr, m_slots, nxp), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NUM_A, nyp, m_slots, nxp), jnp.float32),
        input_output_aliases={4: 0},  # outbuf (5th flat input) -> output
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(occ, coef, tick_arr, grid, jnp.zeros((NUM_A, nyp, m_slots, nxp), jnp.float32))


@functools.partial(jax.jit, static_argnames=("tr", "enable_spring"))
def pair_pass_b(
    grid: jax.Array,  # (5, NYP, M, NXP)
    ps_grid: jax.Array,  # (4, NYP, M, NXP) pass-A output
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
    noise_amp: jax.Array,
    tick: jax.Array,
    tr: int = 8,
    enable_spring: bool = False,
    row_offset: jax.Array | int = 0,
) -> jax.Array:
    """Pass B: all per-slot results (10, NY, M, NXP):
    [pressure, tension x/y, pressure-force x/y, spring x/y, viscosity x/y,
    neighbor count] — PairSums order, one gather for the glue."""
    _, nyp, m_slots, nxp = grid.shape
    ny = nyp - 2
    assert ny % tr == 0, (ny, tr)
    nblocks = ny // tr
    occ = _block_occupancy(grid[POSX], tr)
    coef = jnp.stack(
        [
            diameter.astype(jnp.float32),
            surface_smoothing.astype(jnp.float32),
            target_pressure.astype(jnp.float32),
            spring_overlap_balance.astype(jnp.float32),
            noise_amp.astype(jnp.float32),
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
        _pass_b_kernel, tr=tr, m_slots=m_slots, enable_spring=enable_spring
    )
    return pl.pallas_call(
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
                pltpu.VMEM((NUM_G, tr + 2, m_slots, nxp), jnp.float32),
                pltpu.VMEM((3, tr + 2, m_slots, nxp), jnp.float32),
                pltpu.VMEM((2, tr + 2, m_slots, nxp), jnp.float32),
                pltpu.VMEM((nb_planes, tr, m_slots, nxp), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb_planes, ny, m_slots, nxp), jnp.float32),
        input_output_aliases={5: 0},  # outbuf (6th flat input) -> output
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=_interpret(),
    )(occ, coef, tick_arr, grid, ps_grid, jnp.zeros((nb_planes, ny, m_slots, nxp), jnp.float32))
