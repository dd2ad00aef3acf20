"""Dense cell-block neighbor forces — the TPU fast path.

The (P, K) neighbor-list formulation (neighbors.py) is semantically closest
to the reference but is *gather-bound* on TPU: profiling the jitted step at
100k particles shows ~73% of device time in HBM random gathers (pos[idx],
vel[idx], table[cells], top_k take_along_axis).  TPUs hate random access and
love dense vector math, so the fast path reformulates neighbor interactions
with zero per-edge gathers:

1. Assign every alive particle a (cell, slot) on the diameter-sized grid
   (one sort + a cummax rank — no searchsorted).
2. Scatter all per-particle quantities in ONE packed (P, 7) scatter into a
   cell-major array of shape (ny, nx, M, 7).
3. For each of the 9 neighbor offsets, the neighbor block is a *shifted
   slice* of the zero-padded cell-major array (no gather, just slicing), and
   all slot-vs-slot interactions are dense (cells, M_self, M_nb) VPU ops
   reduced over the neighbor-slot axis.  Two passes: pass A accumulates
   pressure and surface normals; pass B consumes them for tension/pressure/
   spring/viscosity accumulators (p_j, s_j also come from shifted slices).
4. Gather each particle's accumulators back with a single (P,)-row gather.

Semantics match physics.step's gather path (and thus the reference pipeline,
crate.py:161-358) with two documented divergences at extreme density:
  * no 20-neighbor cap — sums run over *all* within-diameter neighbors
    (the reference cap is a perf guard that also breaks symmetry,
    collision_detector.py:44-45; the fidelity gate operates below it).
    Instead the cell capacity M caps *slots per cell*; overflowing particles
    are counted in ``overflow`` and simply miss neighbor forces that tick.
  * collider noise jitters each particle's position-as-a-neighbor once per
    tick (P,2) instead of per directed edge (P,K,2) — same symmetry-breaking
    role, O(P) instead of O(P*K) random bits.  Disabled in fidelity gates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .state import Scene

EPS = 1e-12


class PairSums(NamedTuple):
    """Per-particle neighbor-interaction accumulators consumed by step().

    All reductions are over the particle's within-diameter neighbor set
    (masked), matching the per-particle loops of crate.py:261-358.
    """

    p_i: jax.Array  # (P,)  particle pressure (crate.py:261-275)
    dv_tension: jax.Array  # (P,2) surface-tension kick, dt applied by step()
    pressure_real: jax.Array  # (P,2) sum m*(p_i+p_j)*nhat  (crate.py:301-303)
    spring_real: jax.Array  # (P,2) sum m*(balance-w)*nhat  (crate.py:330-332)
    visc_vsum: jax.Array  # (P,2) sum m*v_j_snapshot       (crate.py:322)
    nbr_cnt: jax.Array  # (P,)  neighbor count
    overflow: jax.Array  # ()    slots dropped by cell capacity


def cell_ids_grid(pos: jax.Array, alive: jax.Array, scene: Scene) -> jax.Array:
    """Flat row-major cell id per particle; dead -> the NC sentinel."""
    nx, ny = scene.grid_nx, scene.grid_ny
    c = jnp.floor(pos / scene.cell_size).astype(jnp.int32) + 1
    cx = jnp.clip(c[:, 0], 0, nx - 1)
    cy = jnp.clip(c[:, 1], 0, ny - 1)
    return jnp.where(alive, cy * nx + cx, nx * ny)


def slot_assignment(sorted_cid: jax.Array, M: int, NC: int):
    """Slot bookkeeping over cell-sorted ids.

    Returns (rank, in_cap, slot_sorted, gather_slot, overflow):
    ``slot_sorted`` is the flat (cell * M + rank) placement slot of the k-th
    sorted particle (sentinel NC*M when dead/overflowing — the grid never
    holds over-cap particles); ``gather_slot`` is where the particle reads
    its pair sums from.  Overflow particles gather their cell's slot rank%M
    — a co-located cellmate whose pressure repulsion is physically right for
    them — instead of zeros: force starvation self-amplifies into
    point-collapse piles (a cell was measured accumulating 3349 force-less
    particles).  Asymmetric (they exert no force), like the reference's own
    20-neighbor cap (collision_detector.py:44-45); counted in ``overflow``.
    Rank-within-cell comes from a cummax over run starts (no searchsorted).
    """
    P = sorted_cid.shape[0]
    iota = jnp.arange(P, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_cid[1:] != sorted_cid[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    rank = iota - run_start
    in_cap = (rank < M) & (sorted_cid < NC)
    over = (rank >= M) & (sorted_cid < NC)
    overflow = jnp.sum(over.astype(jnp.int32))
    slot_sorted = jnp.where(in_cap, sorted_cid * M + rank, NC * M)
    gather_slot = jnp.where(
        in_cap, slot_sorted, jnp.where(over, sorted_cid * M + rank % M, NC * M)
    )
    return rank, in_cap, slot_sorted, gather_slot, overflow


def cell_slots(
    pos: jax.Array, alive: jax.Array, scene: Scene
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(order, slot_sorted, pslot, overflow): cell-major slot per particle.

    Particle-order entry point (used by the spatial band path, which keeps
    its own layout); the sorted-state step uses :func:`slot_assignment` on
    pre-sorted ids directly and skips the ``pslot`` inverse scatter.
    """
    P = pos.shape[0]
    M = scene.cell_capacity
    NC = scene.grid_nx * scene.grid_ny
    cid = cell_ids_grid(pos, alive, scene)
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    _, _, slot_sorted, gather_slot, overflow = slot_assignment(sorted_cid, M, NC)
    pslot = jnp.full((P,), NC * M, jnp.int32).at[order].set(gather_slot, mode="drop")
    return order, slot_sorted, pslot, overflow


def _grid_geometry(grid, diameter):
    """Closure pack shared by both XLA passes on a padded cell-major grid."""
    nyp, nxp_, M = grid.shape[0], grid.shape[1], grid.shape[2]
    ny, nx = nyp - 2, nxp_ - 2
    dtype = grid.dtype
    cpos = grid[1:-1, 1:-1, :, 0:2]
    calive = grid[1:-1, 1:-1, :, 6]
    slot_id = jax.lax.broadcasted_iota(jnp.int32, (ny, nx, M), 2)
    diam = jnp.maximum(diameter, EPS)

    def views(g, dy, dx):
        return g[1 + dy : 1 + dy + ny, 1 + dx : 1 + dx + nx]

    def pair_geometry(nb, dy, dx):
        """Dense (ny, nx, M_self, M_nb) pair mask + noisy geometry."""
        rel_raw = cpos[:, :, :, None, :] - nb[:, :, None, :, 0:2]
        d2_raw = jnp.sum(rel_raw * rel_raw, axis=-1)
        m = (
            (d2_raw <= diam * diam)
            & (calive[:, :, :, None] > 0)
            & (nb[:, :, None, :, 6] > 0)
        )
        if dy == 0 and dx == 0:
            m &= slot_id[:, :, :, None] != slot_id[:, :, None, :]
        rel = cpos[:, :, :, None, :] - nb[:, :, None, :, 2:4]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1), 0.0))
        nhat = rel / jnp.maximum(dist, EPS)[..., None]
        w = jnp.where(m, 1.0 - jnp.clip(dist / diam, 0.0, 1.0), 0.0)
        return m.astype(dtype), nhat, w

    return (ny, nx, M), views, pair_geometry


OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def pass_a_on_grid(grid, diameter, ignored_pressure):
    """Pass A on a padded grid: (cp, s_acc, cnt), each (ny, nx, M[, 2])."""
    (ny, nx, M), views, pair_geometry = _grid_geometry(grid, diameter)
    dtype = grid.dtype
    w_sum = jnp.zeros((ny, nx, M), dtype)
    s_acc = jnp.zeros((ny, nx, M, 2), dtype)
    cnt = jnp.zeros((ny, nx, M), dtype)
    for dy, dx in OFFSETS:
        m, nhat, w = pair_geometry(views(grid, dy, dx), dy, dx)
        w_sum += jnp.sum(w, axis=3)
        s_acc += jnp.sum(((1.0 - w) * w)[..., None] * nhat, axis=3)
        cnt += jnp.sum(m, axis=3)
    cp = jnp.where(cnt > 0, jnp.maximum(0.0, w_sum - ignored_pressure), 0.0)
    return cp, s_acc, cnt


def pad_ps_grid(cp, s_acc):
    """Padded (ny+2, nx+2, M, 3) [p | s] neighbor operand for pass B.

    The spatial engine overwrites the pad rows with the adjacent shards'
    edge-row values (halo) so cross-band neighbors carry real pressure."""
    return jnp.pad(
        jnp.concatenate([cp[..., None], s_acc], axis=-1),
        ((1, 1), (1, 1), (0, 0), (0, 0)),
    )


def pass_b_on_grid(
    grid,
    ps_grid,  # (ny+2, nx+2, M, 3) from pad_ps_grid (+ any halo injection)
    cp,
    s_acc,
    cnt,
    diameter,
    surface_smoothing,
    target_pressure,
    spring_overlap_balance,
) -> jax.Array:
    """Pass B: packed per-slot results (NY*NX*M + 1, 10) in PairSums order
    with a trailing zero row (sentinel for dead/overflow gathers)."""
    (ny, nx, M), views, pair_geometry = _grid_geometry(grid, diameter)
    NC = nx * ny
    dtype = grid.dtype
    dv_tension = jnp.zeros((ny, nx, M, 2), dtype)
    pressure_real = jnp.zeros((ny, nx, M, 2), dtype)
    spring_real = jnp.zeros((ny, nx, M, 2), dtype)
    visc_vsum = jnp.zeros((ny, nx, M, 2), dtype)
    for dy, dx in OFFSETS:
        nb = views(grid, dy, dx)
        m, nhat, w = pair_geometry(nb, dy, dx)
        nb_ps = views(ps_grid, dy, dx)
        p_nb = nb_ps[..., 0]  # (ny,nx,M)
        s_nb = nb_ps[..., 1:3]
        v_nb = nb[..., 4:6]

        align = (
            jnp.sum((s_acc[:, :, :, None, :] - s_nb[:, :, None, :, :]) * nhat, -1)
            * surface_smoothing
        )
        tpf = p_nb[:, :, None, :] + cp[:, :, :, None] - 2.0 * target_pressure
        dv_tension += jnp.sum((m * (align + tpf))[..., None] * nhat, axis=3)
        pressure_real += jnp.sum(
            (m * (cp[:, :, :, None] + p_nb[:, :, None, :]))[..., None] * nhat,
            axis=3,
        )
        spring_real += jnp.sum(
            (m * (spring_overlap_balance - w))[..., None] * nhat, axis=3
        )
        visc_vsum += jnp.sum(m[..., None] * v_nb[:, :, None, :, :], axis=3)

    packed = jnp.concatenate(
        [
            cp[..., None],
            dv_tension,
            pressure_real,
            spring_real,
            visc_vsum,
            cnt[..., None],
        ],
        axis=-1,
    ).reshape(NC * M, 10)
    return jnp.concatenate([packed, jnp.zeros((1, 10), dtype)], axis=0)


def pair_passes_on_grid(
    grid: jax.Array,  # (NY+2, NX+2, M, 7) padded cell-major particle grid
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    ignored_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
) -> jax.Array:
    """Both pair passes on an externally built padded grid (single device:
    the ps pad ring stays zero — nothing exists beyond the domain walls)."""
    cp, s_acc, cnt = pass_a_on_grid(grid, diameter, ignored_pressure)
    ps_grid = pad_ps_grid(cp, s_acc)
    return pass_b_on_grid(
        grid,
        ps_grid,
        cp,
        s_acc,
        cnt,
        diameter,
        surface_smoothing,
        target_pressure,
        spring_overlap_balance,
    )


def build_padded_grid(
    pos: jax.Array,
    vel: jax.Array,
    alive: jax.Array,
    noise: jax.Array,
    scene: Scene,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(padded grid (ny+2, nx+2, M, 7), pslot, overflow) for the XLA path."""
    M = scene.cell_capacity
    nx, ny = scene.grid_nx, scene.grid_ny
    NC = nx * ny
    dtype = pos.dtype
    order, slot_sorted, pslot, overflow = cell_slots(pos, alive, scene)
    # ---- one packed scatter: [pos(2) | pos+noise(2) | vel(2) | alive(1)] ----
    packed_p = jnp.concatenate(
        [pos, pos + noise, vel, alive.astype(dtype)[:, None]], axis=-1
    )  # (P, 7)
    flat = jnp.zeros((NC * M + 1, 7), dtype).at[slot_sorted].set(
        packed_p[order], mode="drop"
    )
    grid = jnp.pad(
        flat[: NC * M].reshape(ny, nx, M, 7), ((1, 1), (1, 1), (0, 0), (0, 0))
    )
    return grid, pslot, overflow


def sums_from_packed(packed: jax.Array, pslot: jax.Array, overflow, nc_m: int) -> PairSums:
    """Gather per-slot packed results back to particle order."""
    mine = packed[jnp.minimum(pslot, nc_m)]  # (P, 10); dead/overflow -> zeros
    return PairSums(
        p_i=mine[:, 0],
        dv_tension=mine[:, 1:3],
        pressure_real=mine[:, 3:5],
        spring_real=mine[:, 5:7],
        visc_vsum=mine[:, 7:9],
        nbr_cnt=mine[:, 9],
        overflow=overflow,
    )


def neighbor_forces_cellwise(
    pos: jax.Array,
    vel: jax.Array,
    alive: jax.Array,
    noise: jax.Array,  # (P, 2) per-particle collider jitter (may be zeros)
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    ignored_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
    scene: Scene,
) -> PairSums:
    grid, pslot, overflow = build_padded_grid(pos, vel, alive, noise, scene)
    packed = pair_passes_on_grid(
        grid,
        diameter,
        surface_smoothing,
        target_pressure,
        ignored_pressure,
        spring_overlap_balance,
    )
    return sums_from_packed(
        packed, pslot, overflow, scene.grid_nx * scene.grid_ny * scene.cell_capacity
    )


def neighbor_forces_dense(
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
    """All-pairs masked (P, P) formulation — no sort, no grid, no gather.

    The right backend for *small* crates (P up to a few thousand), and the
    one that vmaps cleanly over big crate batches (sweep.py datagen): pair
    work is P^2 but every op is a dense matrix the MXU/VPU eat for free,
    with none of the scatter/sort machinery the big-P backends need.
    Semantics identical to the cellwise path with no neighbor cap.
    """
    dtype = pos.dtype
    P = pos.shape[0]
    diam = jnp.maximum(diameter, EPS)
    alive_f = alive.astype(dtype)

    rel_raw = pos[:, None, :] - pos[None, :, :]  # (P, P, 2)
    d2_raw = jnp.sum(rel_raw * rel_raw, axis=-1)
    m = (
        (d2_raw <= diam * diam)
        & alive[:, None]
        & alive[None, :]
        & ~jnp.eye(P, dtype=bool)
    )
    m = m.astype(dtype)
    rel = pos[:, None, :] - (pos + noise)[None, :, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1), 0.0))
    nhat = rel / jnp.maximum(dist, EPS)[..., None]
    w = m * (1.0 - jnp.clip(dist / diam, 0.0, 1.0))  # (P, P)

    cnt = jnp.sum(m, axis=1)
    has = cnt > 0
    p_i = jnp.where(has, jnp.maximum(0.0, jnp.sum(w, axis=1) - ignored_pressure), 0.0)
    s = jnp.sum(((1.0 - w) * w)[..., None] * nhat, axis=1)  # (P, 2)

    align = jnp.sum((s[:, None, :] - s[None, :, :]) * nhat, -1) * surface_smoothing
    tpf = p_i[None, :] + p_i[:, None] - 2.0 * target_pressure
    dv_tension = jnp.sum((m * (align + tpf))[..., None] * nhat, axis=1)
    pressure_real = jnp.sum((m * (p_i[:, None] + p_i[None, :]))[..., None] * nhat, axis=1)
    spring_real = jnp.sum((m * (spring_overlap_balance - w))[..., None] * nhat, axis=1)
    visc_vsum = jnp.sum(m[..., None] * vel[None, :, :], axis=1)
    return PairSums(
        p_i=p_i,
        dv_tension=dv_tension,
        pressure_real=pressure_real,
        spring_real=spring_real,
        visc_vsum=visc_vsum,
        nbr_cnt=cnt,
        overflow=jnp.zeros((), jnp.int32),
    )


def neighbor_forces_cellwise_sorted(
    pos: jax.Array,  # all inputs pre-sorted by cell id (sorted-state step)
    vel: jax.Array,
    alive: jax.Array,
    sorted_cid: jax.Array,
    noise: jax.Array,
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    ignored_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
    scene: Scene,
) -> PairSums:
    """Cellwise pair sums over *pre-sorted* operands, returned in the same
    sorted order — the sorted-state counterpart of neighbor_forces_cellwise
    (no payload permute, no pslot inverse scatter)."""
    M = scene.cell_capacity
    nx, ny = scene.grid_nx, scene.grid_ny
    NC = nx * ny
    dtype = pos.dtype
    _, _, slot_sorted, gather_slot, overflow = slot_assignment(sorted_cid, M, NC)
    packed_p = jnp.concatenate(
        [pos, pos + noise, vel, alive.astype(dtype)[:, None]], axis=-1
    )  # (P, 7) already in sorted order
    flat = jnp.zeros((NC * M + 1, 7), dtype).at[slot_sorted].set(
        packed_p, mode="drop"
    )
    grid = jnp.pad(
        flat[: NC * M].reshape(ny, nx, M, 7), ((1, 1), (1, 1), (0, 0), (0, 0))
    )
    packed = pair_passes_on_grid(
        grid,
        diameter,
        surface_smoothing,
        target_pressure,
        ignored_pressure,
        spring_overlap_balance,
    )
    return sums_from_packed(packed, gather_slot, overflow, NC * M)
