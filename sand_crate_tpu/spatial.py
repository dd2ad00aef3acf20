"""Spatial domain decomposition: one crate sharded across chips (shard_map).

The reference has no parallelism at all (SURVEY.md section 2); the analog of
context/sequence parallelism for this workload is sharding the *particle
axis by space*.  The domain's cell grid is split into D horizontal bands,
one per device along the mesh's "space" axis.  Each device owns the
particles inside its band (fixed per-shard capacity + alive mask) and runs
the full physics tick locally; the only communication is

* **halo exchange** — each device sends its top/bottom edge cell row of the
  packed particle grid to its neighbors via ``jax.lax.ppermute`` so pair
  forces see across band boundaries (cells interact only within one
  diameter, i.e. one cell row), and
* **migration** — particles whose integrated position left the band are
  packed into fixed-size buffers and ppermuted to the adjacent shard, where
  they land in free slots (the spatial analog of the free-slot spawn path).

All collectives ride ICI; there is no host round-trip.  Body state is
replicated (every shard advances the same rigid bodies deterministically).

Caveats vs the single-device step (documented divergences, all bounded by
one cell row):
* a particle pushed across a band edge mid-tick by the hard-wall fix is
  binned into its band's edge row until migration next tick;
* per-tick migration moves particles at most one band per tick (far faster
  than any physical speed at sane band heights — checked in ``Diagnostics``
  style counters returned by the step);
* spawn budgeting uses the psum'd global count, so several shards spawning
  in the same tick can overshoot ``max_particles`` by at most one tick's
  emission.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from . import geometry as geo
from .cellwise import (
    pad_ps_grid,
    pass_a_on_grid,
    pass_b_on_grid,
    sums_from_packed,
)
from .physics import advance_bodies, spawn_particles
from .state import CrateState, Scene

EPS = 1e-12
AXIS = "space"
NUM_F = 7  # packed grid features: pos(2) | pos+noise(2) | vel(2) | alive(1)


def band_rows(scene: Scene, n_shards: int) -> int:
    assert scene.grid_ny % n_shards == 0, (scene.grid_ny, n_shards)
    return scene.grid_ny // n_shards


# Load-balanced (variable-height) bands (docs/spatial_load_balance.md
# mitigation 1): dense bands shrink to ~equal particle loads while air bands
# absorb the leftover rows.  A settled scene concentrates fluid in a thin
# slab, so the top (air) band must be able to span nearly the whole grid —
# capping band height below ny forces a band to straddle air + the fluid
# surface and reintroduces the imbalance (measured 2.6x with a 4x-uniform
# cap vs 1.2x uncapped).  Grid allocation per shard is therefore full-height;
# per-shard *compute* still scales with occupied rows (the pair kernels skip
# air blocks), and per-shard particle capacity was already full-P by design.
# Edge-recompute subsample: the per-tick row histogram scatter-adds
# P/stride indices (XLA TPU scatter is ~8ns/index — full-P every tick would
# cost ~8ms at 1M).  Capping the sample at ~16k keeps the scatter ~0.1ms
# while locating density quantiles to well under a row at any scale where
# balance matters; small scenes sample every particle.
EDGE_SAMPLE_TARGET = 16384


def _edge_sample_stride(capacity: int) -> int:
    return max(1, capacity // EDGE_SAMPLE_TARGET)


def max_band_rows(scene: Scene, n_shards: int) -> int:
    """Static per-shard grid height for the rebalanced path."""
    del n_shards
    return scene.grid_ny


def _row_of(pos_y: jax.Array, scene: Scene) -> jax.Array:
    return jnp.clip(
        jnp.floor(pos_y / scene.cell_size).astype(jnp.int32) + 1,
        0,
        scene.grid_ny - 1,
    )


def shard_of(
    pos_y: jax.Array, scene: Scene, n_shards: int, edges: jax.Array | None = None
) -> jax.Array:
    """Owning shard per particle from the y cell row (matches cell_ids).

    ``edges`` (n_shards+1,) i32 row boundaries selects variable-height
    bands (shard d owns rows [edges[d], edges[d+1])); None = uniform."""
    gy = _row_of(pos_y, scene)
    if edges is None:
        return gy // band_rows(scene, n_shards)
    return (
        jnp.searchsorted(jnp.asarray(edges)[1:-1], gy, side="right")
        .astype(jnp.int32)
    )


def _clamp_edges(targets, prev, ny: int, n_shards: int, bh_max: int):
    """Monotonic feasible band edges from raw quantile targets.

    ``targets`` (D-1,) raw interior edges; ``prev`` (D+1,) previous edges for
    the +-1-row hysteresis (None at init).  Every band ends up with
    1 <= height <= bh_max and the edges cover [0, ny]."""
    new = [jnp.zeros((), jnp.int32)]
    for k in range(1, n_shards):
        e = targets[k - 1]
        if prev is not None:
            # +-1 row per tick: bounds migration churn to one edge row and
            # damps sampling jitter (flat/air regions can't flap the edge
            # across many rows in one tick).
            e = jnp.clip(e, prev[k] - 1, prev[k] + 1)
        e = jnp.clip(e, new[k - 1] + 1, new[k - 1] + bh_max)
        e = jnp.clip(e, ny - (n_shards - k) * bh_max, ny - (n_shards - k))
        new.append(e.astype(jnp.int32))
    new.append(jnp.full((), ny, jnp.int32))
    return jnp.stack(new)


def _edges_from_hist(hist, prev, ny: int, n_shards: int, bh_max: int):
    """Quantile band edges from a global per-row particle histogram."""
    cum = jnp.cumsum(hist)
    total = cum[-1]
    k = jnp.arange(1, n_shards, dtype=jnp.int32)
    tgt_count = (total * k) // n_shards
    targets = (
        jnp.searchsorted(cum, tgt_count, side="left").astype(jnp.int32) + 1
    )
    return _clamp_edges(targets, prev, ny, n_shards, bh_max)


def initial_band_edges(state: CrateState, scene: Scene, n_shards: int) -> jax.Array:
    """Host-side quantile edges from the full initial density (no
    hysteresis) — the starting point for the rebalanced spatial step and the
    matching split_state assignment."""
    gy = _row_of(state.pos[:, 1], scene)
    hist = (
        jnp.zeros((scene.grid_ny,), jnp.int32)
        .at[gy]
        .add(state.alive.astype(jnp.int32))
    )
    return _edges_from_hist(
        hist, None, scene.grid_ny, n_shards, max_band_rows(scene, n_shards)
    )


def _recompute_edges(pos_y, alive, scene: Scene, n_shards: int, edges, bh_max):
    """Next tick's band edges from a strided subsample (runs in-step; the
    psum makes every shard compute identical edges)."""
    stride = _edge_sample_stride(pos_y.shape[0])
    ys = pos_y[::stride]
    al = alive[::stride]
    gy = _row_of(ys, scene)
    local = jnp.zeros((scene.grid_ny,), jnp.int32).at[gy].add(
        al.astype(jnp.int32)
    )
    hist = jax.lax.psum(local, AXIS)
    return _edges_from_hist(hist, edges, scene.grid_ny, n_shards, bh_max)


def split_state(
    state: CrateState,
    scene: Scene,
    n_shards: int,
    edges: jax.Array | None = None,
) -> CrateState:
    """Re-layout a single-crate state into per-shard blocks (D*P, ...).

    Each shard keeps the full capacity P so any density imbalance between
    bands fits; dead slots are masked.  Particle leaves get a leading
    concatenated shard axis; replicated leaves are untouched (shard_map
    receives them whole).  ``edges`` selects variable-height bands
    (initial_band_edges) — None is the uniform split.
    """
    import numpy as np

    P_cap = scene.capacity
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    alive = np.asarray(state.alive)
    pressure = np.asarray(state.pressure)
    uid = np.asarray(state.uid)
    owner = np.asarray(shard_of(jnp.asarray(pos[:, 1]), scene, n_shards, edges))

    new_pos = np.zeros((n_shards, P_cap, 2), pos.dtype)
    new_vel = np.zeros((n_shards, P_cap, 2), vel.dtype)
    new_alive = np.zeros((n_shards, P_cap), bool)
    new_pressure = np.zeros((n_shards, P_cap), pressure.dtype)
    # Dead slots get per-shard *disjoint* uid ranges strictly above every
    # live uid, so the global uid multiset starts duplicate-free; _migrate's
    # uid swap preserves that set exactly, and a revived slot (spawn) can
    # never collide with a live particle's identity.
    uid_base = uid.dtype.type(max(int(uid.max(initial=0)) + 1, P_cap))
    new_uid = (
        uid_base
        + np.arange(n_shards, dtype=uid.dtype)[:, None] * uid.dtype.type(P_cap)
        + np.arange(P_cap, dtype=uid.dtype)[None, :]
    )
    for d in range(n_shards):
        sel = alive & (owner == d)
        n = int(sel.sum())
        new_pos[d, :n] = pos[sel]
        new_vel[d, :n] = vel[sel]
        new_alive[d, :n] = True
        new_pressure[d, :n] = pressure[sel]
        new_uid[d, :n] = uid[sel]
    keys = jax.random.split(state.key, n_shards)
    return state._replace(
        pos=jnp.asarray(new_pos.reshape(-1, 2)),
        vel=jnp.asarray(new_vel.reshape(-1, 2)),
        alive=jnp.asarray(new_alive.reshape(-1)),
        pressure=jnp.asarray(new_pressure.reshape(-1)),
        uid=jnp.asarray(new_uid.reshape(-1)),
        key=keys.reshape(-1),
    )


def merge_state(state: CrateState, scene: Scene, n_shards: int) -> CrateState:
    """Collapse a split state back to single-crate layout (host-side)."""
    import numpy as np

    P_cap = scene.capacity
    pos = np.asarray(state.pos).reshape(n_shards, P_cap, 2)
    vel = np.asarray(state.vel).reshape(n_shards, P_cap, 2)
    alive = np.asarray(state.alive).reshape(n_shards, P_cap)
    pressure = np.asarray(state.pressure).reshape(n_shards, P_cap)
    uid = np.asarray(state.uid).reshape(n_shards, P_cap)
    out_pos = np.zeros((P_cap, 2), pos.dtype)
    out_vel = np.zeros((P_cap, 2), vel.dtype)
    out_alive = np.zeros(P_cap, bool)
    out_pressure = np.zeros(P_cap, pressure.dtype)
    out_uid = np.arange(P_cap, dtype=uid.dtype)
    n = 0
    total_alive = int(alive.sum())
    if total_alive > P_cap:
        # Possible after spatial spawn overshoot (several shards spawning the
        # same tick share the psum'd budget with one tick of slack).
        import warnings

        warnings.warn(
            f"merge_state: {total_alive} alive particles exceed single-crate "
            f"capacity {P_cap}; truncating {total_alive - P_cap}",
            stacklevel=2,
        )
    for d in range(n_shards):
        sel = alive[d]
        k = min(int(sel.sum()), P_cap - n)
        out_pos[n : n + k] = pos[d][sel][:k]
        out_vel[n : n + k] = vel[d][sel][:k]
        out_pressure[n : n + k] = pressure[d][sel][:k]
        out_uid[n : n + k] = uid[d][sel][:k]
        out_alive[n : n + k] = True
        n += k
    return state._replace(
        pos=jnp.asarray(out_pos),
        vel=jnp.asarray(out_vel),
        alive=jnp.asarray(out_alive),
        pressure=jnp.asarray(out_pressure),
        uid=jnp.asarray(out_uid),
        key=state.key.reshape(n_shards, *state.key.shape[1:])[0]
        if state.key.ndim
        else state.key,
    )


def _migrate(pos, vel, alive, uid, scene, n_shards, mig_cap, edges=None):
    """Send out-of-band particles to the adjacent shard (one hop per tick).

    Identity travels with the particle: the payload carries ``uid``, and the
    destination's displaced dead-slot uid is ppermuted *back* to the sender,
    which parks it in the vacated slot.  Every migration is therefore a pure
    uid swap between two slots — the global uid multiset equals
    ``split_state``'s duplicate-free assignment forever, so "uid is unique
    among alive particles" (state.py invariant) survives any sequence of
    migrations, spawns (which revive a slot with its parked uid) and deaths.
    A dropped arrival (full shard) returns its own uid to the vacated slot.
    """
    d = jax.lax.axis_index(AXIS)
    P_cap = pos.shape[0]
    iota = jnp.arange(P_cap, dtype=jnp.int32)
    owner = shard_of(pos[:, 1], scene, n_shards, edges)
    go_up = alive & (owner < d)
    go_down = alive & (owner > d)

    def pack(mask):
        # Highest-score = lowest index among movers; sentinel P_cap otherwise.
        score = jnp.where(mask, P_cap - iota, 0)
        top, idx = jax.lax.top_k(score, mig_cap)
        sel = top > 0
        payload = jnp.concatenate(
            [pos[idx], vel[idx], sel.astype(pos.dtype)[:, None]], axis=-1
        )  # (K, 5): pos | vel | valid
        payload = jnp.where(sel[:, None], payload, 0.0)
        uids = jnp.where(sel, uid[idx], 0)
        deferred = jnp.sum(mask.astype(jnp.int32)) - jnp.sum(sel.astype(jnp.int32))
        return payload, uids, idx, sel, deferred

    up_buf, up_uid, up_idx, up_sel, up_def = pack(go_up)
    down_buf, down_uid, down_idx, down_sel, down_def = pack(go_down)
    # Kill only the slots actually packed and sent; movers beyond mig_cap
    # stay alive in the edge band and retry next tick (no mass loss).
    up_slots = jnp.where(up_sel, up_idx, P_cap)
    down_slots = jnp.where(down_sel, down_idx, P_cap)
    alive = alive.at[up_slots].set(False, mode="drop")
    alive = alive.at[down_slots].set(False, mode="drop")

    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    # up_buf travels to shard d-1 (bwd ring); down_buf to d+1 (fwd ring).
    from_above = jax.lax.ppermute(down_buf, AXIS, fwd)  # shard d-1's down
    from_below = jax.lax.ppermute(up_buf, AXIS, bwd)  # shard d+1's up
    uid_above = jax.lax.ppermute(down_uid, AXIS, fwd)
    uid_below = jax.lax.ppermute(up_uid, AXIS, bwd)
    # Wrap-around arrivals are invalid by construction (shard 0 never sends
    # up, shard D-1 never sends down): their validity flags are zero.
    incoming = jnp.concatenate([from_above, from_below], axis=0)  # (2K, 5)
    inc_uid = jnp.concatenate([uid_above, uid_below])
    inc_ok = incoming[:, 4] > 0

    # Free destination slots.  Slots vacated *this tick* are excluded so the
    # uid swap-back below never targets a slot an arrival just claimed
    # (vacated and destination slot sets stay disjoint).
    vacated = jnp.zeros((P_cap,), bool)
    vacated = vacated.at[up_slots].set(True, mode="drop")
    vacated = vacated.at[down_slots].set(True, mode="drop")
    free_score = jnp.where(alive | vacated, 0, P_cap - iota)
    top_free, free_idx = jax.lax.top_k(free_score, incoming.shape[0])
    # A zero top_k score means the "free" slot is actually live — sentinel it
    # out (mirrors the spawn path's `top > 0` guard) so arrivals never
    # overwrite live particles when the shard is full; count them as dropped.
    has_free = top_free > 0
    accepted = inc_ok & has_free
    slot = jnp.where(accepted, free_idx, P_cap)
    dropped = jnp.sum((inc_ok & ~has_free).astype(jnp.int32))
    # Displaced dead-slot uids (gathered before any update) ride back to the
    # sender; a dropped arrival's own uid rides back instead.
    displaced = jnp.where(accepted, uid[jnp.minimum(free_idx, P_cap - 1)], inc_uid)
    pos = pos.at[slot].set(incoming[:, 0:2], mode="drop")
    vel = vel.at[slot].set(incoming[:, 2:4], mode="drop")
    uid = uid.at[slot].set(inc_uid, mode="drop")
    alive = alive.at[slot].set(True, mode="drop")

    # Return rings mirror the sends: my up_buf became d-1's from_below
    # (second half), whose displaced uids come back via fwd; my down_buf
    # became d+1's from_above (first half), back via bwd.
    ret_up = jax.lax.ppermute(displaced[mig_cap:], AXIS, fwd)
    ret_down = jax.lax.ppermute(displaced[:mig_cap], AXIS, bwd)
    uid = uid.at[up_slots].set(ret_up, mode="drop")
    uid = uid.at[down_slots].set(ret_down, mode="drop")
    return pos, vel, alive, uid, dropped, up_def + down_def


def _exchange_row_halo(arr, n_shards, axis=0, last_row=None):
    """Fill a row-padded array's pad rows from the neighbors' edge rows.

    ``arr`` has interior rows 1..R and pad rows 0 / R+1 along ``axis``; after
    the exchange, row 0 holds shard d-1's bottom interior row and row R+1
    holds shard d+1's row 1.  The global-domain boundary shards keep zero
    pads (nothing exists beyond the walls).

    ``last_row``: index of the bottom *interior* row (R).  Static (None =
    the allocation's last interior row) on the uniform path; a traced scalar
    under variable-height bands, where each shard's live rows end at its own
    band height and the pad row after them receives the halo."""
    d = jax.lax.axis_index(AXIS)
    n = arr.shape[axis]
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    first_int = jax.lax.slice_in_dim(arr, 1, 2, axis=axis)
    static = last_row is None
    if static:
        last_int = jax.lax.slice_in_dim(arr, n - 2, n - 1, axis=axis)
    else:
        last_int = jax.lax.dynamic_slice_in_dim(arr, last_row, 1, axis=axis)
    top = jax.lax.ppermute(last_int, AXIS, fwd)  # from shard d-1
    bot = jax.lax.ppermute(first_int, AXIS, bwd)  # from shard d+1
    top = jnp.where(d == 0, jnp.zeros_like(top), top)
    bot = jnp.where(d == n_shards - 1, jnp.zeros_like(bot), bot)
    if static:
        interior = jax.lax.slice_in_dim(arr, 1, n - 1, axis=axis)
        return jnp.concatenate([top, interior, bot], axis=axis)
    arr = jax.lax.dynamic_update_slice_in_dim(arr, top, 0, axis=axis)
    return jax.lax.dynamic_update_slice_in_dim(arr, bot, last_row + 1, axis=axis)


class Band(NamedTuple):
    """One shard's row range: global rows [lo, hi) on a grid allocated with
    ``bh_alloc`` rows.  ``last`` is the bottom interior padded-row index for
    the halo exchange — None on the uniform path (static = bh_alloc), the
    traced band height under variable-height bands."""

    lo: jax.Array | int
    hi: jax.Array | int
    bh_alloc: int
    last: jax.Array | None


def _band_cids(pos, alive, scene, band: Band):
    """Band-local flat cell ids; a particle nudged over the band edge
    mid-tick is binned at the edge row (see module docstring)."""
    nx = scene.grid_nx
    c = jnp.floor(pos / scene.cell_size).astype(jnp.int32) + 1
    cx = jnp.clip(c[:, 0], 0, nx - 1)
    gy = jnp.clip(c[:, 1], band.lo, band.hi - 1)
    ly = gy - band.lo
    return jnp.where(alive, ly * nx + cx, band.bh_alloc * nx)


def _band_sums_pallas(pos, vel, alive, scene, n_shards, tick, params, band: Band):
    """Per-shard pair sums through the fused Pallas kernels (forces_mode
    "pallas"): slab sort -> MXU placement -> halo ppermute of the padded
    grid's edge rows -> pass A -> halo ppermute of the pass-A (p|s) rows ->
    pass B -> one gather.  The second halo exchange gives cross-band
    neighbors their true pressure/normals in pass B (exact band edges).
    In-kernel collider noise is keyed by *global* row (row_offset = d * bh),
    so both shards hash identical jitter for a shared halo particle."""
    from .ops.pair_kernel import pair_pass_a, pair_pass_b
    from .ops.pallas_forces import gather_pair_sums
    from .ops.placement import place_grid, slab_from_cid

    M = scene.cell_capacity
    nx = scene.grid_nx
    bh = band.bh_alloc
    nxp = ((nx + 2 + 127) // 128) * 128
    tr = scene.row_block
    while tr > 1 and bh % tr:
        tr //= 2

    cid = _band_cids(pos, alive, scene, band)
    slab, row_start, pslot, overflow = slab_from_cid(
        pos, alive, vel, cid, M, nx, bh
    )
    grid = place_grid(slab, row_start, M, nx, bh, nxp)
    grid = _exchange_row_halo(grid, n_shards, axis=1, last_row=band.last)
    # Block flags computed ONCE and shared by both passes (same scheme as
    # the single-chip pallas_forces path): occ must come from the *halo'd*
    # grid, not row_start — a block whose only particles arrived via the
    # halo exchange still has pair work.
    from .ops.pair_kernel import POSX, _block_flags

    occ, _ = _block_flags(grid[POSX], tr)
    units = None
    if M > 8:
        # Engaged two-level units past the static cap lose their hi-level
        # pairs for one tick — count the spill into this shard's overflow
        # exactly like the single-chip path (pallas_forces._passes_and_gather).
        from .ops.pair_kernel import ADDON_UNIT_CAP, _engaged_units

        blk_u, til_u, n_eng = _engaged_units(grid[POSX], tr, ADDON_UNIT_CAP)
        units = (blk_u, til_u)
        overflow = overflow + jnp.maximum(n_eng - ADDON_UNIT_CAP, 0)

    noise_amp = params.diameter * params.collider_noise_level
    row_off = band.lo
    ps = pair_pass_a(
        grid, params.diameter, noise_amp, tick, tr=tr, row_offset=row_off,
        occ=occ, units=units,
    )
    ps = _exchange_row_halo(ps, n_shards, axis=1, last_row=band.last)
    b_out = pair_pass_b(
        grid,
        ps,
        params.diameter,
        params.surface_smoothing,
        params.target_pressure,
        params.spring_overlap_balance,
        params.ignored_pressure,
        noise_amp,
        tick,
        tr=tr,
        enable_spring=scene.enable_spring,
        row_offset=row_off,
        occ=occ,
        units=units,
    )
    return gather_pair_sums(
        b_out, pslot, M, nx, bh, nxp, scene.enable_spring, overflow, pos.dtype
    )


def _halo_cap(scene: Scene) -> int:
    """Static per-edge halo buffer size for the banded p-major path: covers
    ~4x the average slab-row population; spills are counted into overflow."""
    est = 4 * scene.capacity // max(scene.grid_ny, 1)
    return min(scene.capacity, max(256, ((est + 127) // 128) * 128))


def _band_sums_pmajor(pos, vel, alive, scene, n_shards, tick, params, band: Band):
    """Per-shard pair sums through the grid-free p-major kernels
    (forces_mode "pmajor") — the TPU-default backend under the band
    decomposition.  Halos are *particle slabs*, not grid rows: each shard's
    edge-row particles form a contiguous run of its cell-sorted slab, so a
    fixed-size dynamic_slice + ppermute hands the neighbor exactly the
    candidates its windows need.  Two exchanges mirror _band_sums_pallas:
    features before pass A, pass-A sums (cp | sx | sy) before pass B — the
    second gives cross-band neighbors their true pressures (exact band
    edges).  Halo jitter is hashed by the *owner's* sorted index, so a
    shared halo particle carries one consistent jittered position into both
    shards' kernels.  Halo-run spill past the static buffer is counted into
    overflow alongside window-coverage loss.

    Symmetric pair halving (scene.pmajor_symm) rides the bands with NO
    extra exchange: in the spliced slab [above halo | local | below halo]
    every cross-boundary pair is computed once per *shard* (by its
    smaller-slab-gid side), and slicing the merged result to the local
    columns keeps exactly one copy per particle — the lower band keeps its
    i-side sums, the upper band keeps its j-staged sums; the halo-column
    halves are dropped on both shards.  Both shards evaluate the identical
    term expressions on identical (owner-jittered) inputs, so the pair
    kick stays exactly antisymmetric across the boundary.  The jitter amp
    carries the same 1/sqrt(2) scaling as the fused symm path (both sides
    jittered; delta variance matches the reference's one-sided draw)."""
    import os

    from .ops import pmajor as pm

    f32 = jnp.float32
    symm = (
        scene.pmajor_symm
        and scene.pmajor_split > 0
        and os.environ.get("SAND_CRATE_PMSUB") != "1"
        and os.environ.get("SAND_CRATE_PMAJOR_GATE") != "1"
    )
    nx, ny = scene.grid_nx, scene.grid_ny
    NC = nx * ny
    P_cap = pos.shape[0]
    dtype = pos.dtype
    hc = _halo_cap(scene)
    d = jax.lax.axis_index(AXIS)
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    # --- global-row cell ids, band-clipped (stragglers bin at the edge) ----
    c = jnp.floor(pos / scene.cell_size).astype(jnp.int32) + 1
    cx = jnp.clip(c[:, 0], 0, nx - 1)
    gy = jnp.clip(c[:, 1], band.lo, band.hi - 1)
    cid = jnp.where(alive, gy * nx + cx, NC)
    iota = jnp.arange(P_cap, dtype=jnp.int32)
    sorted_cid, order = jax.lax.sort((cid, iota), num_keys=1)
    inv = jnp.zeros((P_cap,), jnp.int32).at[order].set(iota)
    pos_s, vel_s, alive_s = pos[order], vel[order], alive[order]
    n_alive = jnp.searchsorted(
        sorted_cid, jnp.asarray(NC, jnp.int32)
    ).astype(jnp.int32)

    af = alive_s.astype(dtype)
    amp = params.diameter * params.collider_noise_level
    if symm:
        amp = amp * jnp.asarray(0.7071067811865476, amp.dtype)
    tick_i = jnp.asarray(tick, jnp.int32)
    feat = jnp.stack(
        pm.feature_rows(pos_s, vel_s, alive_s, amp, tick_i)
    )  # (6, P_cap) — rows 0-5 match pmajor's A_PX..A_VY layout

    # --- edge runs (contiguous in the sorted slab) --------------------------
    lo_i = jnp.asarray(band.lo, jnp.int32)
    hi_i = jnp.asarray(band.hi, jnp.int32)
    top_end = jnp.searchsorted(sorted_cid, (lo_i + 1) * nx).astype(jnp.int32)
    bot_start = jnp.searchsorted(sorted_cid, (hi_i - 1) * nx).astype(jnp.int32)
    hidx = jnp.arange(hc, dtype=jnp.int32)
    # Pad so a run slice near the slab end never clamps (which would shift
    # entries under the validity mask).
    feat_p = jnp.pad(feat, ((0, 0), (0, hc)))
    cid_p = jnp.pad(sorted_cid, (0, hc), constant_values=NC)

    def run_buf(start, n_valid, invalid_cid):
        fb = jax.lax.dynamic_slice(feat_p, (0, start), (6, hc))
        cb = jax.lax.dynamic_slice(cid_p, (start,), (hc,))
        ok = hidx < n_valid
        return jnp.where(ok[None], fb, 0.0), jnp.where(ok, cb, invalid_cid)

    # My TOP run rides to shard d-1 (their below-halo); invalid entries take
    # the dead sentinel so the receiver's slab stays cid-sorted.  My BOTTOM
    # run rides to d+1 (their above-halo); invalid entries clamp to my last
    # cid (= receiver's lo*nx - 1), again sort-safe.
    top_f, top_c = run_buf(
        jnp.zeros((), jnp.int32), jnp.minimum(top_end, hc), NC
    )
    bot_f, bot_c = run_buf(
        bot_start, jnp.minimum(n_alive - bot_start, hc), hi_i * nx - 1
    )
    halo_spill = jnp.maximum(top_end - hc, 0) + jnp.maximum(
        n_alive - bot_start - hc, 0
    )

    from_above_f = jax.lax.ppermute(bot_f, AXIS, fwd)
    from_above_c = jax.lax.ppermute(bot_c, AXIS, fwd)
    from_below_f = jax.lax.ppermute(top_f, AXIS, bwd)
    from_below_c = jax.lax.ppermute(top_c, AXIS, bwd)
    # Wrap-around edges don't exist (nothing above shard 0 / below D-1).
    from_above_f = jnp.where(d == 0, 0.0, from_above_f)
    from_above_c = jnp.where(d == 0, lo_i * nx - 1, from_above_c)
    from_below_f = jnp.where(d == n_shards - 1, 0.0, from_below_f)
    from_below_c = jnp.where(d == n_shards - 1, NC, from_below_c)

    # --- splice: [above halo | local sorted | below halo | dead tail] ------
    E = hc + P_cap + hc
    p_fit = ((E + pm.OWN - 1) // pm.OWN) * pm.OWN
    width = p_fit + pm.VCAP
    ext_cid = jnp.full((p_fit,), NC, jnp.int32)
    ext_cid = ext_cid.at[:hc].set(from_above_c)
    ext_cid = ext_cid.at[hc : hc + P_cap].set(sorted_cid)
    ext_cid = jax.lax.dynamic_update_slice(ext_cid, from_below_c, (hc + n_alive,))
    ext_feat = jnp.zeros((6, width), f32)
    ext_feat = ext_feat.at[:, :hc].set(from_above_f)
    ext_feat = ext_feat.at[:, hc : hc + P_cap].set(feat)
    ext_feat = jax.lax.dynamic_update_slice(
        ext_feat, from_below_f, (0, hc + n_alive)
    )
    row_ext = jnp.clip(ext_cid // nx, 0, ny).astype(f32)
    n_alive_ext = jnp.searchsorted(
        ext_cid, jnp.asarray(NC, jnp.int32)
    ).astype(jnp.int32)

    w = scene.pmajor_w
    ws, nt, dma_lo, blk, lost = pm._windows(
        ext_cid, n_alive_ext, nx, ny, p_fit // 128, w, symm=symm
    )
    coef = pm.coef_stack(
        params.diameter,
        params.surface_smoothing,
        params.target_pressure,
        params.spring_overlap_balance,
    )
    tick_arr = tick_i.reshape((1,))

    fold = scene.fold_pairs and not scene.enable_spring
    slab_a = jnp.zeros((pm.A_F, width), f32)
    slab_a = slab_a.at[0:6].set(ext_feat)
    slab_a = slab_a.at[pm.A_ROW, :p_fit].set(row_ext)
    out_a = pm._pm_pass(
        slab_a, dma_lo, ws, nt, blk, coef, tick_arr, p_fit, w, "a", False,
        split=scene.pmajor_split, symm=symm,
    )
    w_sum, cnt = out_a[0], out_a[3]
    cp = pm.finalize_cp(w_sum, cnt, params.ignored_pressure)

    # --- second exchange: pass-A sums for the halo columns ------------------
    asums = jnp.concatenate([cp[None], out_a[1:3]], axis=0)  # (3, p_fit)
    top_a = jax.lax.dynamic_slice(asums, (0, hc), (3, hc))
    bot_a = jax.lax.dynamic_slice(asums, (0, hc + bot_start), (3, hc))
    above_a = jax.lax.ppermute(bot_a, AXIS, fwd)
    below_a = jax.lax.ppermute(top_a, AXIS, bwd)
    above_a = jnp.where(d == 0, 0.0, above_a)
    below_a = jnp.where(d == n_shards - 1, 0.0, below_a)
    asums = asums.at[:, :hc].set(above_a)
    asums = jax.lax.dynamic_update_slice(asums, below_a, (0, hc + n_alive))

    slab_b = jnp.zeros((pm.B_F, width), f32)
    slab_b = slab_b.at[0:4].set(ext_feat[0:4])
    cp_row = asums[0] * (1.0 + params.pressure_amplifier) if fold else asums[0]
    slab_b = slab_b.at[pm.B_CP, :p_fit].set(cp_row)
    # SX/SY ride surface_smoothing-prescaled (pm._pm_kernel's align chain
    # no longer multiplies by sm_c per candidate visit).
    slab_b = slab_b.at[pm.B_SX : pm.B_SX + 2, :p_fit].set(
        asums[1:3] * params.surface_smoothing.astype(f32)
    )
    slab_b = slab_b.at[pm.B_ROW, :p_fit].set(row_ext)
    out_b = pm._pm_pass(
        slab_b, dma_lo, ws, nt, blk, coef, tick_arr, p_fit, w, "b",
        scene.enable_spring, split=scene.pmajor_split, fold=fold, symm=symm,
    )

    # --- own slice, dead-masked, one wide unsort gather ---------------------
    n_b = 2 if fold else (6 if scene.enable_spring else 4)
    rows = jnp.concatenate(
        [
            asums[0:1, hc : hc + P_cap],  # cp (with halo overwrites undone
            # only for halo columns — own columns were never overwritten)
            out_b[0:n_b, hc : hc + P_cap],
            out_a[4:6, hc : hc + P_cap],  # viscosity vsum (rides pass A)
            cnt[None, hc : hc + P_cap],
        ],
        axis=0,
    ) * af.astype(f32)[None]
    rows_u = rows[:, inv].astype(dtype)
    if scene.enable_spring:
        spring_real = rows_u[5:7].T
    else:
        spring_real = jnp.zeros((P_cap, 2), dtype)
    if fold:
        # dv_tension carries the folded tension + pa*pressure kick; the
        # pair pressure slot is zero (ghost push-off rides separately).
        pressure_real = jnp.zeros((P_cap, 2), dtype)
    else:
        pressure_real = rows_u[3:5].T
    v0 = 1 + n_b
    from .cellwise import PairSums

    return PairSums(
        p_i=rows_u[0],
        dv_tension=rows_u[1:3].T,
        pressure_real=pressure_real,
        spring_real=spring_real,
        visc_vsum=rows_u[v0 : v0 + 2].T,
        nbr_cnt=rows_u[v0 + 2],
        overflow=(lost + halo_spill).astype(jnp.int32),
    )


def _local_grid(pos, vel, alive, noise, scene, n_shards, band: Band):
    """Per-shard packed cell grid over the band + halo ring via ppermute.

    Returns (grid (bh+2, nx+2, M, 7), pslot (P,), overflow ()) where rows
    1..bh are the shard's own cell rows and rows 0 / bh+1 arrive from the
    adjacent shards' edge rows.
    """
    M = scene.cell_capacity
    nx = scene.grid_nx
    bh = band.bh_alloc
    P_cap = pos.shape[0]
    dtype = pos.dtype

    cid = _band_cids(pos, alive, scene, band)
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    iota = jnp.arange(P_cap, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_cid[1:] != sorted_cid[:-1]]
    )
    rank = iota - jax.lax.cummax(jnp.where(is_start, iota, 0))
    in_cap = (rank < M) & (sorted_cid < bh * nx)
    over = (rank >= M) & (sorted_cid < bh * nx)
    overflow = jnp.sum(over.astype(jnp.int32))
    slot_sorted = jnp.where(in_cap, sorted_cid * M + rank, bh * nx * M)
    # Overflow fallback gather from the cell's highest slot (see
    # ops/placement.slab_from_cid); placement still drops them.
    gather_slot = jnp.where(
        in_cap, slot_sorted, jnp.where(over, sorted_cid * M + rank % M, bh * nx * M)
    )
    pslot = jnp.full((P_cap,), bh * nx * M, jnp.int32).at[order].set(
        gather_slot, mode="drop"
    )

    packed_p = jnp.concatenate(
        [pos, pos + noise, vel, alive.astype(dtype)[:, None]], axis=-1
    )
    flat = jnp.zeros((bh * nx * M + 1, NUM_F), dtype).at[slot_sorted].set(
        packed_p[order], mode="drop"
    )
    rows3d = flat[: bh * nx * M].reshape(bh, nx, M, NUM_F)

    # Halo exchange: my edge rows -> neighbors' pad rows.
    padded = jnp.concatenate(
        [jnp.zeros_like(rows3d[:1]), rows3d, jnp.zeros_like(rows3d[:1])], axis=0
    )
    grid = _exchange_row_halo(padded, n_shards, axis=0, last_row=band.last)
    grid = jnp.pad(grid, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return grid, pslot, overflow


def spatial_step(
    state: CrateState,
    params: Params,
    scene: Scene,
    n_shards: int,
    mig_cap: int,
    edges: jax.Array | None = None,
    bh_alloc: int | None = None,
):
    """One physics tick on this shard (runs inside shard_map over AXIS).

    Mirrors physics.step exactly, with migration + halo exchange spliced in;
    see that function for the reference tick-order citations.  ``edges``
    (replicated (D+1,) i32) selects variable-height bands on a grid of
    ``bh_alloc`` rows per shard; the step then also returns next tick's
    edges in stats["band_edges"] (density-quantile rebalancing)."""
    key, k_spawn, k_noise = jax.random.split(state.key[0], 3)
    state = state._replace(key=key[None])

    d = jax.lax.axis_index(AXIS)
    if edges is None:
        bh_u = band_rows(scene, n_shards)
        band = Band(lo=d * bh_u, hi=(d + 1) * bh_u, bh_alloc=bh_u, last=None)
    else:
        lo, hi = edges[d], edges[d + 1]
        band = Band(lo=lo, hi=hi, bh_alloc=bh_alloc, last=hi - lo)
    P_cap = scene.capacity
    r = params.particle_radius
    diam = params.diameter
    dt = params.dt

    # -- lifecycle: spawn only sources inside my band, budget via psum -------
    if scene.num_sources:
        my_src = shard_of(scene.src_position[:, 1], scene, n_shards, edges) == d
        local_count = jnp.sum(state.alive.astype(jnp.int32))
        global_count = jax.lax.psum(local_count, AXIS)
        gated = dataclasses.replace(
            scene, src_flow=jnp.where(my_src, scene.src_flow, 0.0)
        )
        # spawn_particles budgets against state's own count; shift the cap by
        # the other shards' population so the budget is global.
        fake_params = params._replace(
            max_particles=params.max_particles - (global_count - local_count)
        )
        tmp, spawn_truncated = spawn_particles(state, fake_params, gated, k_spawn)
        state = state._replace(pos=tmp.pos, vel=tmp.vel, alive=tmp.alive)
    else:
        spawn_truncated = jnp.zeros((), jnp.int32)
    state = state._replace(
        alive=state.alive
        & jnp.all((state.pos >= -r) & (state.pos <= 1.0 + r), axis=-1)
    )

    # -- migration (positions from last integrate) ---------------------------
    pos, vel, alive, uid, mig_dropped, mig_deferred = _migrate(
        state.pos, state.vel, state.alive, state.uid, scene, n_shards, mig_cap,
        edges,
    )
    state = state._replace(pos=pos, vel=vel, alive=alive, uid=uid)

    # -- rigid bodies: replicated, deterministic ------------------------------
    adv = advance_bodies(state, params, scene)
    state = state._replace(
        segments=adv.segments,
        body_lin_vel=adv.body_lin_vel,
        body_ang_vel=adv.body_ang_vel,
        time=adv.time,
    )

    pos, vel, alive = state.pos, state.vel, state.alive
    alive2 = alive[:, None]

    # -- boundary ghosts + hard wall (local; physics.step SoA pipeline) ------
    px, py = pos[:, 0], pos[:, 1]
    nx_, ny_, seg_dist = geo.points_to_segments_soa(px, py, state.segments)
    gmask = (seg_dist <= r * 1.2) & scene.seg_valid[:, None] & alive[None]
    gm = gmask.astype(pos.dtype)
    gvx = 2.0 * (px[None] - nx_)
    gvy = 2.0 * (py[None] - ny_)
    b_lin = state.body_lin_vel[scene.seg_body]
    b_ang = state.body_ang_vel[scene.seg_body][:, None]
    b_cx = scene.body_center[scene.seg_body, 0][:, None]
    b_cy = scene.body_center[scene.seg_body, 1][:, None]
    gvelx = b_lin[:, 0][:, None] + b_ang * (ny_ - b_cy)
    gvely = b_lin[:, 1][:, None] - b_ang * (nx_ - b_cx)
    gnorm = jnp.sqrt(jnp.maximum(gvx * gvx + gvy * gvy, 0.0))
    vrd = jnp.maximum(r / jnp.maximum(gnorm, EPS), 0.5) - 0.5
    correction = jnp.stack(
        [jnp.sum(gm * gvx * vrd, axis=0), jnp.sum(gm * gvy * vrd, axis=0)], -1
    )
    pos = jnp.where(alive2, pos + correction, pos)
    g_cnt = jnp.sum(gm, axis=0)
    gsum = jnp.stack([jnp.sum(gm * gvx, 0), jnp.sum(gm * gvy, 0)], -1)
    gvel_sum = jnp.stack([jnp.sum(gm * gvelx, 0), jnp.sum(gm * gvely, 0)], -1)

    # -- neighbor forces on the local band grid (halo via ppermute) ----------
    if scene.forces_mode in ("pallas", "pmajor"):
        # Fused Pallas kernels per shard — the production multi-chip path
        # (the XLA passes below are ~10x slower at scale, scene.py).
        if scene.forces_mode == "pmajor":
            sums = _band_sums_pmajor(
                pos, vel, alive, scene, n_shards, state.tick, params, band
            )
        else:
            sums = _band_sums_pallas(
                pos, vel, alive, scene, n_shards, state.tick, params, band
            )
        overflow = sums.overflow
    else:
        pnoise = (
            (jax.random.uniform(k_noise, (P_cap, 2), dtype=pos.dtype) - 0.5)
            * diam
            * params.collider_noise_level
        )
        grid, pslot, overflow = _local_grid(
            pos, vel, alive, pnoise, scene, n_shards, band
        )
        cp, s_acc, cnt = pass_a_on_grid(grid, diam, params.ignored_pressure)
        # Second halo exchange: cross-band neighbors carry their true
        # pressure/normals into pass B (instead of the pad ring's zeros).
        ps_grid = _exchange_row_halo(
            pad_ps_grid(cp, s_acc), n_shards, axis=0, last_row=band.last
        )
        packed = pass_b_on_grid(
            grid,
            ps_grid,
            cp,
            s_acc,
            cnt,
            diam,
            params.surface_smoothing,
            params.target_pressure,
            params.spring_overlap_balance,
        )
        sums = sums_from_packed(
            packed, pslot, overflow,
            band.bh_alloc * scene.grid_nx * scene.cell_capacity,
        )
    p_i = sums.p_i

    # -- forces in reference order (physics.step) -----------------------------
    vel = vel + jnp.where(alive2, dt * sums.dv_tension, 0.0)
    vel = vel + jnp.where(alive2, dt * params.gravity[None, :], 0.0)
    from .config import BODY_FREE

    free = scene.body_kind == BODY_FREE
    body_lin_vel = jnp.where(
        free[:, None],
        state.body_lin_vel + dt * params.gravity[None, :],
        state.body_lin_vel,
    )
    ghost_term = p_i[:, None] * gsum
    vel = vel + jnp.where(
        alive2, dt * params.pressure_amplifier * (sums.pressure_real + ghost_term), 0.0
    )
    if scene.enable_spring:
        pull_ghost = params.spring_overlap_balance * gsum
        total = sums.nbr_cnt + g_cnt
        dv = (
            dt
            * params.spring_amplifier
            * (sums.spring_real + pull_ghost)
            / jnp.maximum(total, 1.0)[:, None]
        )
        vel = vel + jnp.where(alive2 & (total > 0)[:, None], dv, 0.0)
    vel = vel + jnp.where(
        alive2,
        dt * params.viscosity * (sums.visc_vsum - sums.nbr_cnt[:, None] * vel),
        0.0,
    )
    denom = jnp.maximum(g_cnt, 1.0)[:, None]
    normal = gsum / denom
    contact_vel = gvel_sum / denom
    n_unit, _ = geo.safe_normalize(normal)
    rel_vel = vel - contact_vel
    approach = jnp.sum(rel_vel * n_unit, axis=-1)
    bounce = -approach[:, None] * n_unit * (1.0 + params.wall_collision_decay)
    hit = alive & (g_cnt > 0) & (approach < 0.0)
    vel = vel + jnp.where(hit[:, None], bounce, 0.0)

    walls = geo.pad_segments(state.segments, r)
    wall_valid = jnp.concatenate([scene.seg_valid, scene.seg_valid])
    crossing, t_hit = geo.segment_crossings_soa(
        pos[:, 0], pos[:, 1], vel[:, 0] * dt, vel[:, 1] * dt, walls
    )
    crossing = crossing & wall_valid[:, None] & alive[None]
    factor = jnp.min(jnp.where(crossing, t_hit, jnp.inf), axis=0)
    vel = vel * jnp.minimum(1.0, factor)[:, None]

    pos = jnp.where(alive2, pos + dt * vel, pos)

    new_state = state._replace(
        pos=pos,
        vel=jnp.where(alive2, vel, state.vel),
        alive=alive,
        pressure=jnp.where(alive, p_i, 0.0),
        body_lin_vel=body_lin_vel,
        tick=state.tick + 1,
    )
    local_alive = jnp.sum(alive.astype(jnp.int32))
    stats = {
        "particle_count": jax.lax.psum(local_alive, AXIS),
        "neighbor_overflow": jax.lax.psum(overflow, AXIS),
        "migration_dropped": jax.lax.psum(mig_dropped, AXIS),
        "migration_deferred": jax.lax.psum(mig_deferred, AXIS),
        "spawn_truncated": jax.lax.psum(spawn_truncated, AXIS),
        # Load-balance observability: per-band occupancy (the y-band split
        # concentrates settled fluid in the bottom shards; see
        # docs/spatial_load_balance.md for measurements and mitigations).
        "shard_alive": jax.lax.all_gather(local_alive, AXIS),
        "shard_overflow": jax.lax.all_gather(overflow, AXIS),
    }
    if edges is not None:
        # Next tick's density-quantile band edges (replicated: the histogram
        # is psum'd, so every shard computes identical values).
        stats["band_edges"] = _recompute_edges(
            pos[:, 1], alive, scene, n_shards, edges, bh_alloc
        )
    return new_state, stats


def make_spatial_step(
    mesh: Mesh,
    scene: Scene,
    mig_cap: int | None = None,
    rebalance: bool = False,
):
    """Jitted shard_map step over the mesh's "space" axis.

    State layout: particle leaves carry the concatenated shard axis
    (D * capacity, ...) sharded over AXIS (see split_state); key is (D, ...)
    one per shard; everything else replicated.

    ``rebalance=True`` returns a step with signature
    ``(state, params, edges) -> (state, stats)`` running variable-height
    bands (docs/spatial_load_balance.md mitigation 1): seed ``edges`` with
    :func:`initial_band_edges` (and pass the same edges to ``split_state``),
    then thread ``stats["band_edges"]`` back in each tick.
    """
    n_shards = mesh.shape[AXIS]
    # Migration buffer size: XLA TPU top_k cost grows steeply with k
    # (capacity//16 = 6.5k at a 100k-particle scene measured 86x the plain
    # step), and per-tick movers are bounded by the edge-band flux — a few
    # hundred at 1M scale — not by capacity.  Overflow movers defer to the
    # next tick (counted in migration_deferred), so a generous-but-bounded
    # cap is safe.
    mig_cap = mig_cap or min(1024, max(64, scene.capacity // 16))

    state_specs = CrateState(
        pos=P(AXIS),
        vel=P(AXIS),
        alive=P(AXIS),
        pressure=P(AXIS),
        uid=P(AXIS),
        segments=P(),
        body_lin_vel=P(),
        body_ang_vel=P(),
        time=P(),
        tick=P(),
        key=P(AXIS),
    )

    if rebalance:
        bh_alloc = max_band_rows(scene, n_shards)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(state_specs, P(), P()),
            out_specs=(state_specs, P()),
            check_vma=False,
        )
        def sharded_rb(state, params, edges):
            return spatial_step(
                state, params, scene, n_shards, mig_cap, edges, bh_alloc
            )

        return jax.jit(sharded_rb)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_specs, P()),
        out_specs=(state_specs, P()),
        check_vma=False,
    )
    def sharded(state, params):
        new_state, stats = spatial_step(state, params, scene, n_shards, mig_cap)
        return new_state, stats

    return jax.jit(sharded)
