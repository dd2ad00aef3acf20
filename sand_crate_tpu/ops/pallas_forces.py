"""Pallas-backed PairSums provider (forces_mode="pallas").

XLA glue around ops/pair_kernel.py: cell-sort the particles, place the
sorted slab into the feature/slot-major padded grid with the MXU placement
kernel (ops/placement.py — replaces the XLA scatter that used to cost ~29ms
of the 1M step), two fused pallas passes, one gather back to particle order.
Numerically equivalent to cellwise.neighbor_forces_cellwise (same pair math,
same slot assignment); see that module's docstring for the semantics and the
documented divergences from the reference.  Collider noise is hashed inside
the kernels from grid position + tick (see pair_kernel module docstring)
instead of being carried as extra planes.

Data flow (no intermediate reshuffles — measured 106ms/step of XLA copies at
1M particles before this layout):

    cell_slab (sort + permute)       -> slab (8, P), row_start
    place_grid(slab)                 -> G (4, NYP, M, NXP)   MXU one-hot
    pair_pass_a(G)                   -> PS (4, NYP, M, NXP)  padded, in-kernel
    pair_pass_b(G, PS)               -> OUT (8|10, NY, M, NXP)
    OUT[:, out_idx]                  -> PairSums (one gather)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cellwise import PairSums
from ..state import Scene
from .pair_kernel import num_b, pair_pass_a, pair_pass_b
from .placement import cell_slab, place_grid, slab_from_sorted


def gather_pair_sums(
    b_out: jax.Array,  # (num_b, NY, M, NXP) pass-B output
    pslot: jax.Array,  # (P,) flat cell*M+rank slot; >= NY*NX*M when invalid
    M: int,
    nx: int,
    ny: int,
    nxp: int,
    enable_spring: bool,
    overflow: jax.Array,
    dtype,
) -> PairSums:
    """One gather from the pass-B result planes back to particle order.

    ``ny``/``nx`` describe the grid the passes ran on — the full domain for
    the single-chip path, one shard's band for the spatial engine."""
    nb_planes = num_b(enable_spring)
    valid = pslot < nx * ny * M
    cid = jnp.where(valid, pslot // M, 0)
    rank = jnp.where(valid, pslot % M, 0)
    cy = cid // nx
    cx = cid % nx
    out_plane = ny * M * nxp
    out_idx = cy * (M * nxp) + rank * nxp + (cx + 1)  # in-range (cid 0 if dead)
    # Mask-after-gather instead of a sentinel column: concatenating one
    # column onto the result planes copies the whole 1.3GB table first
    # (measured ~8ms of the gather's 18ms at 1M).
    mine = b_out.reshape(nb_planes, out_plane)[:, out_idx]
    mine = jnp.where(valid[None, :], mine, 0.0).astype(dtype)
    if enable_spring:
        spring_real = mine[5:7].T
        vis0 = 7
    else:
        spring_real = jnp.zeros_like(mine[1:3].T)
        vis0 = 5
    return PairSums(
        p_i=mine[0],
        dv_tension=mine[1:3].T,
        pressure_real=mine[3:5].T,
        spring_real=spring_real,
        visc_vsum=mine[vis0 : vis0 + 2].T,
        nbr_cnt=mine[nb_planes - 1],
        overflow=overflow,
    )


def neighbor_forces_pallas_sorted(
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
) -> PairSums:
    """Pallas pair sums over *pre-sorted* operands, returned in the same
    sorted order — no payload permute, no pslot inverse scatter (each a
    measured ~8ms 1M-index op the sorted-state step no longer pays)."""
    from .pair_kernel import occ_from_row_start, pair_pass_a, pair_pass_b_emit

    M = scene.cell_capacity
    nx, ny = scene.grid_nx, scene.grid_ny
    nxp = ((nx + 2 + 127) // 128) * 128
    slab, row_start, gather_slot, overflow = slab_from_sorted(
        pos, alive, vel, sorted_cid, M, nx, ny
    )
    del gather_slot  # emit mode writes particle columns directly
    grid = place_grid(slab, row_start, M, nx, ny, nxp)
    tr = scene.row_block
    # Block flags computed ONCE and shared by both passes: occ from the slab
    # row ranges (no grid-plane reads), engaged units from one scan instead
    # of one per pass + one for the overflow count.
    occ = occ_from_row_start(row_start, tr, ny)
    units = None
    if M > 8:
        from .pair_kernel import ADDON_UNIT_CAP, POSX, _engaged_units

        blk, til, n_eng = _engaged_units(grid[POSX], tr, ADDON_UNIT_CAP)
        units = (blk, til)
        overflow = overflow + jnp.maximum(n_eng - ADDON_UNIT_CAP, 0)
    ps = pair_pass_a(
        grid, diameter, noise_amp, tick, tr=tr, occ=occ, units=units
    )
    out = pair_pass_b_emit(
        grid,
        ps,
        slab,
        row_start,
        sorted_cid,
        nx,
        diameter,
        surface_smoothing,
        target_pressure,
        spring_overlap_balance,
        ignored_pressure,
        noise_amp,
        tick,
        tr=tr,
        enable_spring=scene.enable_spring,
        occ=occ,
        units=units,
    )  # (nb, P_pad) in sorted particle order
    P = pos.shape[0]
    mine = out[:, :P].astype(pos.dtype)
    if scene.enable_spring:
        spring_real = mine[5:7].T
        vis0 = 7
    else:
        spring_real = jnp.zeros_like(mine[1:3].T)
        vis0 = 5
    nb_planes = mine.shape[0]
    return PairSums(
        p_i=mine[0],
        dv_tension=mine[1:3].T,
        pressure_real=mine[3:5].T,
        spring_real=spring_real,
        visc_vsum=mine[vis0 : vis0 + 2].T,
        nbr_cnt=mine[nb_planes - 1],
        overflow=overflow,
    )


def neighbor_forces_pallas(
    pos: jax.Array,
    vel: jax.Array,
    alive: jax.Array,
    noise_amp: jax.Array,  # () f32 — diameter * collider_noise_level
    tick: jax.Array,  # () i32 — varies the in-kernel noise stream per tick
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    ignored_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
    scene: Scene,
) -> PairSums:
    M = scene.cell_capacity
    nx, ny = scene.grid_nx, scene.grid_ny
    # Lane dim must be 128-aligned for Mosaic slicing; extra columns are part
    # of the zero ring (alive = 0) and self-mask.
    nxp = ((nx + 2 + 127) // 128) * 128
    dtype = pos.dtype

    # ---- sort + MXU one-hot placement into the (F, NYP, M, NXP) grid -------
    # (see ops/placement.py; replaces the ~29ms XLA scatter at 1M particles)
    slab, row_start, pslot, overflow = cell_slab(pos, alive, vel, scene)
    grid = place_grid(slab, row_start, M, nx, ny, nxp)
    return _passes_and_gather(
        grid,
        pslot,
        overflow,
        noise_amp,
        tick,
        diameter,
        surface_smoothing,
        target_pressure,
        ignored_pressure,
        spring_overlap_balance,
        scene,
        nxp,
        dtype,
    )


def _passes_and_gather(
    grid,
    gather_slot,
    overflow,
    noise_amp,
    tick,
    diameter,
    surface_smoothing,
    target_pressure,
    ignored_pressure,
    spring_overlap_balance,
    scene,
    nxp,
    dtype,
) -> PairSums:
    M = scene.cell_capacity
    nx, ny = scene.grid_nx, scene.grid_ny

    # ---- two fused passes (+ two-level add-ons on engaged units) -----------
    tr = scene.row_block
    if M > 8:
        # Work units past the static add-on cap lose their hi-level pairs for
        # one tick — the same degradation class as slot overflow, so they are
        # folded into the same counter (never observed below ~5x the measured
        # mid-splash unit count; the cap is a compile-shape guard).
        from .pair_kernel import ADDON_UNIT_CAP, POSX, _engaged_units

        _, _, n_eng = _engaged_units(grid[POSX], tr, 1)
        overflow = overflow + jnp.maximum(n_eng - ADDON_UNIT_CAP, 0)
    ps = pair_pass_a(grid, diameter, noise_amp, tick, tr=tr)
    b_out = pair_pass_b(
        grid,
        ps,
        diameter,
        surface_smoothing,
        target_pressure,
        spring_overlap_balance,
        ignored_pressure,
        noise_amp,
        tick,
        tr=tr,
        enable_spring=scene.enable_spring,
    )  # (num_b, NY, M, NXP)

    # ---- gather back to the caller's particle order (single gather) --------
    return gather_pair_sums(
        b_out, gather_slot, M, nx, ny, nxp, scene.enable_spring, overflow, dtype
    )
