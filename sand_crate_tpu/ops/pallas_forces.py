"""Pallas-backed PairSums provider (forces_mode="pallas").

XLA glue around ops/pair_kernel.py: one packed scatter into the feature/slot-
major padded grid, two fused pallas passes, one gather back to particle
order.  Numerically equivalent to cellwise.neighbor_forces_cellwise (same
pair math, same slot assignment); see that module's docstring for the
semantics and the documented divergences from the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cellwise import PairSums, cell_slots
from ..state import Scene
from .pair_kernel import NUM_G, pair_pass_a, pair_pass_b

# Per-call output budget for the banded pallas invocations (bytes).  The
# kernel outputs are staged in VMEM by this XLA build; 8 features x band x M
# x NXP x 4B must stay well under the ~100MB scoped limit.
_BAND_BYTES = 24 * 2**20


def _band_rows(m_slots: int, nxp: int, tr: int) -> int:
    per_row = 8 * m_slots * nxp * 4
    return max(tr, (_BAND_BYTES // per_row) // tr * tr)


def neighbor_forces_pallas(
    pos: jax.Array,
    vel: jax.Array,
    alive: jax.Array,
    noise: jax.Array,
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    ignored_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
    scene: Scene,
) -> PairSums:
    P = pos.shape[0]
    M = scene.cell_capacity
    nx, ny = scene.grid_nx, scene.grid_ny
    # Lane dim must be 128-aligned for Mosaic slicing; extra columns are part
    # of the zero ring (alive = 0) and self-mask.
    nxp = ((nx + 2 + 127) // 128) * 128
    nyp = ny + 2
    dtype = pos.dtype

    order, slot_sorted, pslot, overflow = cell_slots(pos, alive, scene)
    del order, slot_sorted
    valid = pslot < nx * ny * M
    cid = jnp.where(valid, pslot // M, 0)
    rank = jnp.where(valid, pslot % M, 0)
    cy = cid // nx
    cx = cid % nx

    # ---- packed scatter into the padded (F, NYP, M, NXP) grid --------------
    plane = nyp * M * nxp
    pad_idx = jnp.where(
        valid, (cy + 1) * (M * nxp) + rank * nxp + (cx + 1), plane
    )
    packed = jnp.concatenate(
        [pos, pos + noise, vel, alive.astype(dtype)[:, None]], axis=-1
    )  # (P, 7)
    flat = jnp.zeros((NUM_G, plane + 1), jnp.float32)
    flat = flat.at[:, pad_idx].set(packed.T.astype(jnp.float32), mode="drop")
    grid = flat[:, :plane].reshape(NUM_G, nyp, M, nxp)

    # ---- pass A + pressure --------------------------------------------------
    # Row-banding keeps each pallas call's output small enough for this XLA
    # build's VMEM staging of kernel outputs (see pair_kernel compiler note).
    tr = scene.row_block
    band = _band_rows(M, nxp, tr)

    def banded(fn, src_grids, n_feat):
        outs = []
        for bs in range(0, ny, band):
            nb = min(band, ny - bs)
            slices = [g[:, bs : bs + nb + 2] for g in src_grids]
            outs.append(fn(slices, nb))
        return jnp.concatenate(outs, axis=1)

    a_out = banded(
        lambda gs, nb: pair_pass_a(gs[0], diameter, tr=tr), [grid], 4
    )  # (4, ny, M, NXP)
    w_sum, s_x, s_y, cnt = a_out[0], a_out[1], a_out[2], a_out[3]
    cp = jnp.where(cnt > 0, jnp.maximum(0.0, w_sum - ignored_pressure), 0.0)
    ps = jnp.stack([cp, s_x, s_y])  # (3, ny, M, NXP)
    ps_grid = jnp.pad(ps, ((0, 0), (1, 1), (0, 0), (0, 0)))

    # ---- pass B --------------------------------------------------------------
    b_out = banded(
        lambda gs, nb: pair_pass_b(
            gs[0],
            gs[1],
            diameter,
            surface_smoothing,
            target_pressure,
            spring_overlap_balance,
            tr=tr,
        ),
        [grid, ps_grid],
        8,
    )  # (8, ny, M, NXP)

    # ---- gather back to particle order ---------------------------------------
    out_plane = ny * M * nxp
    out_idx = jnp.where(
        valid, cy * (M * nxp) + rank * nxp + (cx + 1), out_plane
    )
    packed_out = jnp.concatenate([cp[None], b_out, cnt[None]], axis=0).reshape(
        10, out_plane
    )
    packed_out = jnp.concatenate(
        [packed_out, jnp.zeros((10, 1), jnp.float32)], axis=1
    )
    mine = packed_out[:, out_idx].astype(dtype)  # (10, P)
    return PairSums(
        p_i=mine[0],
        dv_tension=mine[1:3].T,
        pressure_real=mine[3:5].T,
        spring_real=mine[5:7].T,
        visc_vsum=mine[7:9].T,
        nbr_cnt=mine[9],
        overflow=overflow,
    )
