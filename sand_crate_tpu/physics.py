"""The physics tick as one pure, jittable function.

Functional re-design of ``Crate.physics_tick`` (/root/reference/src/crate/
crate.py:91-129).  The reference mutates one object through ~10 per-particle
Python loops; here the identical force pipeline — in the identical order,
including its mid-tick read/write schedule — is expressed as dense masked
array ops over fixed-capacity state, so the whole tick compiles to a single
XLA program and rolls with ``lax.scan``.

Tick order (must match crate.py:91-129 — order matters):
  1.  spawn from sources (crate.py:92,138-147), cull out-of-box (:93,149-159)
  2.  advance rigid bodies (:95,363-365)
  3.  virtual colliders (boundary ghosts) on pre-fix positions (:98,213-243)
      then hard wall projection (:99,202-211)
  4.  neighbor search + collider population with per-edge noise (:102-104)
  5.  pressures (:107-108,261-284)
  6.  surface tension (:111,335-358), then ghosts join the collider set with
      zero overlap/pressure (:112,286-293)
  7.  gravity on particles and free bodies (:114,309-314)
  8.  pressure force incl. ghost push-off (:116,295-307)
  9.  spring (flag-gated; reference ships it disabled, :117-118,325-333)
  10. viscosity against snapshot neighbor velocities (:120,316-323)
  11. wall bounce against moving-wall contact velocity (:122,245-259)
  12. continuous collision velocity clamp (:124,177-200)
  13. integrate positions (:125,360-361)

Mid-tick schedule notes faithfully reproduced (SURVEY.md section 7):
  * neighbor velocities are snapshotted at collider-population time, so
    viscosity sees stale v_j but fresh v_i (crate.py:175 vs :316-323);
  * ghost vectors are computed from *pre-hard-wall-fix* positions;
  * ghost entries are raw mirror vectors (not normalized) and participate in
    the pressure force with neighbor pressure 0 (crate.py:286-307).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry as geo
from .cellwise import PairSums
from .neighbors import neighbor_list
from .state import NUM_FORCES, CrateState, Diagnostics, Params, Scene
from .config import BODY_FIXED, BODY_FREE, BODY_MOTORED

EPS = 1e-12


def neighbor_forces_gather(
    pos: jax.Array,
    vel: jax.Array,
    alive: jax.Array,
    key_noise: jax.Array,
    params: Params,
    scene: Scene,
) -> PairSums:
    """Reference-closest pair sums via fixed-K neighbor lists (neighbors.py).

    Keeps the reference's 20-neighbor cap and per-directed-edge collider
    noise (crate.py:168-170).  Gather-bound on TPU; the cellwise path is the
    production default (see cellwise.py module docstring).
    """
    diam = params.diameter
    nbr = neighbor_list(pos, alive, diam, scene)
    idx, mask = nbr.idx, nbr.mask  # (P,K)
    mask_f = mask.astype(pos.dtype)
    noise = (
        (jax.random.uniform(key_noise, idx.shape + (2,), dtype=pos.dtype) - 0.5)
        * diam
        * params.collider_noise_level
    )
    rel = pos[:, None, :] - (pos[idx] + noise)  # (P,K,2)
    ndist = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1), 0.0))  # (P,K)
    nhat = rel / jnp.maximum(ndist, EPS)[..., None]
    vel_snap = vel[idx]  # (P,K,2) snapshot for viscosity (crate.py:175)

    # pressures (crate.py:261-284)
    w = (1.0 - jnp.clip(ndist / jnp.maximum(diam, EPS), 0.0, 1.0)) * mask_f
    has_nbr = jnp.any(mask, axis=1)
    p_i = jnp.maximum(0.0, jnp.sum(w, axis=1) - params.ignored_pressure)
    p_i = jnp.where(has_nbr & alive, p_i, 0.0)  # (P,)
    p_j = p_i[idx] * mask_f  # (P,K)

    # surface tension (crate.py:335-358)
    s = jnp.sum(((1.0 - w) * w)[..., None] * nhat * mask_f[..., None], axis=1)
    s_j = s[idx]  # (P,K,2)
    align = (
        jnp.sum((s[:, None, :] - s_j) * nhat, axis=-1) * params.surface_smoothing
    )  # (P,K)
    tpf = p_j + p_i[:, None] - 2.0 * params.target_pressure
    dv_tension = jnp.sum((mask_f * (align + tpf))[..., None] * nhat, axis=1)

    pressure_real = jnp.sum((mask_f * (p_i[:, None] + p_j))[..., None] * nhat, axis=1)
    spring_real = jnp.sum(
        (mask_f * (params.spring_overlap_balance - w))[..., None] * nhat, axis=1
    )
    visc_vsum = jnp.sum(mask_f[..., None] * vel_snap, axis=1)
    return PairSums(
        p_i=p_i,
        dv_tension=dv_tension,
        pressure_real=pressure_real,
        spring_real=spring_real,
        visc_vsum=visc_vsum,
        nbr_cnt=jnp.sum(mask_f, axis=1),
        overflow=nbr.overflow,
    )


def motor_value(motor: jax.Array, t: jax.Array) -> jax.Array:
    """Evaluate ``offset + amp * cos(freq * t + phase)`` motors.

    ``motor``: (..., 4) = (amplitude, frequency, phase, offset).
    Safe declarative replacement for the reference's eval'd lambdas
    (rigid_body.py:81-83).
    """
    amp, freq, phase, offset = (motor[..., i] for i in range(4))
    return offset + amp * jnp.cos(freq * t + phase)


# --------------------------------------------------------------------------
# 1. particle lifecycle
# --------------------------------------------------------------------------


def spawn_particles(
    state: CrateState, params: Params, scene: Scene, key: jax.Array
) -> CrateState:
    """Emit from every active source into free slots (crate.py:138-147).

    Spawn count per source is Binomial(flow, dt) clamped by the remaining
    ``max_particles`` budget, applied sequentially across sources like the
    reference.  Free slots are assigned in ascending index order.

    Returns ``(state, truncated)`` where ``truncated`` counts emissions lost
    to the static per-tick ``max_spawn`` bound (mean + 6 sigma, scene.py) —
    the reference never truncates below the budget cap
    (particle_source.py:17-23), so a flow spike beyond the bound is a
    documented divergence that must be surfaced, not silent.
    """
    if scene.num_sources == 0:
        return state, jnp.zeros((), jnp.int32)
    P = scene.capacity
    ns = scene.max_spawn
    pos, vel, alive = state.pos, state.vel, state.alive

    # Ascending free-slot list (sentinel P afterwards), shared by all sources.
    # Only num_sources * ns slots can be consumed per tick, so a top_k of that
    # size replaces a full O(P log^2 P) sort: dead slot i scores P - i (> 0),
    # alive slots score -1, and the largest scores are the lowest dead indices.
    n_slots = min(P, scene.num_sources * ns)
    iota = jnp.arange(P, dtype=jnp.int32)
    score = jnp.where(alive, jnp.int32(-1), P - iota)
    top, _ = jax.lax.top_k(score, n_slots)
    free_slots = jnp.where(top > 0, P - top, P)
    free_slots = jnp.concatenate([free_slots, jnp.full((ns,), P, jnp.int32)])

    budget = jnp.maximum(params.max_particles - state.particle_count, 0)
    offset = jnp.zeros((), jnp.int32)
    truncated = jnp.zeros((), jnp.int32)
    for z in range(scene.num_sources):
        key, k_n, k_pos, k_vel = jax.random.split(key, 4)
        active = state.tick < scene.src_active_ticks[z]
        p = jnp.clip(params.dt.astype(jnp.float32), 0.0, 1.0)
        n_raw = jax.random.binomial(k_n, scene.src_flow[z], p).astype(jnp.int32)
        want = jnp.clip(jnp.where(active, n_raw, 0), 0, budget).astype(jnp.int32)
        n = jnp.minimum(want, ns)
        truncated = truncated + (want - n)

        slots = jax.lax.dynamic_slice(free_slots, (offset,), (ns,))
        take = jnp.arange(ns, dtype=jnp.int32) < n
        slots = jnp.where(take, slots, P)  # P = out of bounds -> dropped

        new_pos = (
            scene.src_position[z]
            + (jax.random.uniform(k_pos, (ns, 2)) - 0.5) * scene.src_radius[z]
        )
        new_vel = (
            scene.src_velocity[z]
            + (jax.random.uniform(k_vel, (ns, 2)) - 0.5) * scene.src_noise[z]
        )
        pos = pos.at[slots].set(new_pos, mode="drop")
        vel = vel.at[slots].set(new_vel, mode="drop")
        alive = alive.at[slots].set(True, mode="drop")
        budget = budget - n
        offset = offset + n
    return state._replace(pos=pos, vel=vel, alive=alive), truncated


def cull_particles(state: CrateState, params: Params) -> CrateState:
    """Kill particles outside [-r, 1+r]^2 (crate.py:149-159) by mask flip."""
    r = params.particle_radius
    inside = jnp.all((state.pos >= -r) & (state.pos <= 1.0 + r), axis=-1)
    return state._replace(alive=state.alive & inside)


# --------------------------------------------------------------------------
# 2. rigid bodies
# --------------------------------------------------------------------------


def body_point_velocity(
    points: jax.Array,
    body_idx: jax.Array,
    body_center: jax.Array,
    body_lin_vel: jax.Array,
    body_ang_vel: jax.Array,
) -> jax.Array:
    """Linearized rigid velocity field v = v_c + w * rot90cw(p - c).

    (rigid_body.py:28-34; rotation center stays the placement position.)
    ``points``: (..., 2), ``body_idx``: (...) int — owning body per point.
    """
    c = body_center[body_idx]
    lin = body_lin_vel[body_idx]
    ang = body_ang_vel[body_idx]
    return lin + ang[..., None] * geo.rot90_cw(points - c)


def advance_bodies(
    state: CrateState, params: Params, scene: Scene
) -> CrateState:
    """apply_bodies_velocity (crate.py:95,363-365 + rigid_body.py:42-68).

    Motored bodies re-evaluate their motors at the advanced time; fixed
    bodies never move; free bodies keep integrating their center velocity
    (gravity is added to it later, in the gravity phase, like crate.py:311-314).
    """
    t_new = state.time + params.dt
    motored = scene.body_kind == BODY_MOTORED
    lin = jnp.where(
        motored[:, None], motor_value(scene.motor_lin, t_new), state.body_lin_vel
    )
    ang = jnp.where(motored, motor_value(scene.motor_ang, t_new), state.body_ang_vel)
    # Expression motors (safe-AST lambdas, config.ExprMotor) trace straight
    # into the step here: the loop is static scene structure, the value is a
    # jnp scalar function of the traced time.  Collected only for motored
    # bodies, so no `motored` gate is needed.
    for b, ch, fn in scene.motor_exprs:
        val = jnp.asarray(fn(t_new, xp=jnp), lin.dtype)
        if ch == 2:
            ang = ang.at[b].set(val)
        else:
            lin = lin.at[b, ch].set(val)

    moving = (scene.body_kind != BODY_FIXED)[scene.seg_body]  # (S,)
    ends_vel = body_point_velocity(
        state.segments, scene.seg_body[:, None], scene.body_center, lin, ang
    )  # (S, 2, 2)
    segments = jnp.where(
        moving[:, None, None], state.segments + ends_vel * params.dt, state.segments
    )
    return state._replace(
        segments=segments, body_lin_vel=lin, body_ang_vel=ang, time=t_new
    )


# --------------------------------------------------------------------------
# 3. the tick phases
# --------------------------------------------------------------------------


def _alive_mean_dv(dv: jax.Array, alive: jax.Array) -> jax.Array:
    """Mean ||dv|| over alive particles (force_monitor.py:27-33 semantics)."""
    n = jnp.sqrt(jnp.maximum(jnp.sum(dv * dv, axis=-1), 0.0))
    cnt = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(alive, n, 0.0)) / cnt


class GhostInfo(NamedTuple):
    """Boundary-ghost reductions shared by the later force phases."""

    pos: jax.Array  # (P, 2) hard-wall-corrected positions
    g_cnt: jax.Array  # (P,)   ghosts per particle
    gsum: jax.Array  # (P, 2) sum of mirror ghost vectors
    gvel_sum: jax.Array  # (P, 2) sum of ghost contact velocities


def _ghost_geom(prepos, alive, segments, params: Params, scene: Scene):
    """Ghost-contact geometry on pre-fix positions (crate.py:202-243).

    SoA layout: segment axis on sublanes, particle axis on lanes — (S, P)
    tiles stay dense where the (P, S, 2) AoS forms waste ~99% of each
    vector tile (see geometry.py SoA note).  Shared by ghost_phase and the
    post-sort ghost_sums recompute so the contact rule has one source."""
    r = params.particle_radius
    px, py = prepos[:, 0], prepos[:, 1]
    nx_, ny_, seg_dist = geo.points_to_segments_soa(px, py, segments)
    gmask = (seg_dist <= r * 1.2) & scene.seg_valid[:, None] & alive[None]
    gm = gmask.astype(prepos.dtype)  # (S, P)
    gvx = 2.0 * (px[None] - nx_)  # mirror ghost offsets (S, P)
    gvy = 2.0 * (py[None] - ny_)
    return nx_, ny_, gm, gvx, gvy


def _ghost_vel(nx_, ny_, body_lin_vel, body_ang_vel, scene: Scene):
    """Ghost velocity from the owning body's point-velocity field at contact:
    v = lin + ang * rot90_cw(contact - center) (rigid_body.py:28-34)."""
    b_lin = body_lin_vel[scene.seg_body]  # (S, 2)
    b_ang = body_ang_vel[scene.seg_body][:, None]  # (S, 1)
    b_cx = scene.body_center[scene.seg_body, 0][:, None]
    b_cy = scene.body_center[scene.seg_body, 1][:, None]
    gvelx = b_lin[:, 0][:, None] + b_ang * (ny_ - b_cy)
    gvely = b_lin[:, 1][:, None] - b_ang * (nx_ - b_cx)
    return gvelx, gvely


def ghost_sums(
    prepos, alive, segments, body_lin_vel, body_ang_vel, params, scene
):
    """The (g_cnt, gsum, gvel_sum) reductions of ghost_phase, standalone.

    Pure per-particle functions of the PRE-fix position and the (static-
    shape) segment set, so the sorted-state step can recompute them after
    the cell sort instead of carrying 5 extra payload-sort operands
    (measured ~0.55ms/operand at 1M); for the reference's scene sizes the
    (S, P) recompute is a sub-ms fused elementwise pass."""
    nx_, ny_, gm, gvx, gvy = _ghost_geom(prepos, alive, segments, params, scene)
    gvelx, gvely = _ghost_vel(nx_, ny_, body_lin_vel, body_ang_vel, scene)
    g_cnt = jnp.sum(gm, axis=0)
    gsum = jnp.stack([jnp.sum(gm * gvx, axis=0), jnp.sum(gm * gvy, axis=0)], -1)
    gvel_sum = jnp.stack(
        [jnp.sum(gm * gvelx, axis=0), jnp.sum(gm * gvely, axis=0)], -1
    )
    return g_cnt, gsum, gvel_sum


def _ghost_core(
    prepos, alive, segments, body_lin_vel, body_ang_vel, params, scene
) -> GhostInfo:
    """ghost_phase on explicit operands: hard-wall-corrected position plus
    the three ghost reductions (crate.py:97-99, 202-243).

    Everything here is a pure per-particle function of the PRE-fix position
    (elementwise in P; the S-axis reduction order is fixed by the static
    shape), so re-running it on a *permutation* of prepos yields bitwise the
    permuted outputs.  That is what lets the sorted-state payload sort carry
    only prepos and recompute the fixed position AND the ghost sums after
    the cell sort (see neighbor_stage) instead of carrying pos + the ghost
    reductions as extra sort operands (~0.55ms each at 1M)."""
    r = params.particle_radius
    alive2 = alive[:, None]

    nx_, ny_, gm, gvx, gvy = _ghost_geom(prepos, alive, segments, params, scene)
    gvelx, gvely = _ghost_vel(nx_, ny_, body_lin_vel, body_ang_vel, scene)

    # -- hard wall projection (crate.py:202-211) ----------------------------
    gnorm = jnp.sqrt(jnp.maximum(gvx * gvx + gvy * gvy, 0.0))  # (S, P)
    vrd = jnp.maximum(r / jnp.maximum(gnorm, EPS), 0.5) - 0.5
    correction = jnp.stack(
        [jnp.sum(gm * gvx * vrd, axis=0), jnp.sum(gm * gvy * vrd, axis=0)], axis=-1
    )
    pos = jnp.where(alive2, prepos + correction, prepos)

    g_cnt = jnp.sum(gm, axis=0)
    gsum = jnp.stack([jnp.sum(gm * gvx, axis=0), jnp.sum(gm * gvy, axis=0)], -1)
    gvel_sum = jnp.stack(
        [jnp.sum(gm * gvelx, axis=0), jnp.sum(gm * gvely, axis=0)], -1
    )
    return GhostInfo(pos=pos, g_cnt=g_cnt, gsum=gsum, gvel_sum=gvel_sum)


def ghost_phase(state: CrateState, params: Params, scene: Scene) -> GhostInfo:
    """Virtual colliders on pre-fix positions + hard wall projection
    (reference "Virtual Colliders" phase, crate.py:97-99, 202-243)."""
    return _ghost_core(
        state.pos,
        state.alive,
        state.segments,
        state.body_lin_vel,
        state.body_ang_vel,
        params,
        scene,
    )


class TickOperands(NamedTuple):
    """Per-particle operands of the force phases, plus their pair sums.

    For the grid force backends (pallas/cellwise) everything is in
    *cell-sorted* order — the state stays permanently cell-sorted (``uid``
    carries identity), which deletes the inverse-permutation scatter and the
    payload re-permute (each a measured ~8ms 1M-index op per tick).  For the
    dense/gather backends the order is untouched.
    """

    pos: jax.Array
    vel: jax.Array
    alive: jax.Array
    uid: jax.Array
    ghost: GhostInfo
    sums: PairSums


def neighbor_stage(
    vel: jax.Array,
    alive: jax.Array,
    uid: jax.Array,
    ghost: GhostInfo,
    tick: jax.Array,
    k_noise: jax.Array,
    params: Params,
    scene: Scene,
    *,
    prepos: jax.Array | None = None,
    segments: jax.Array | None = None,
    body_lin_vel: jax.Array | None = None,
    body_ang_vel: jax.Array | None = None,
    live_rows: jax.Array | None = None,
) -> TickOperands:
    """Neighbor detection + collider population + pressures — the reference's
    "Collisions" / "Colliders" / "Pressure" phases (crate.py:102-108) fused
    into the scene's force backend; the grid backends also apply this tick's
    cell sort to every operand (see TickOperands).

    When the caller supplies ``prepos``/``segments``/body velocities (the
    step does), the payload sort carries only (vel, prepos, uid) and the
    hard-wall-fixed position AND the ghost reductions are *recomputed*
    post-sort from the sorted pre-fix positions (_ghost_core) — 5 fewer
    sort operands for one cheap fused (S, P) pass.  SAND_CRATE_SORT_GHOST=
    ride restores the carry-everything sort; SAND_CRATE_SORT_POS=ride keeps
    the ghost recompute but lets pos ride (equivalence-tested: all three
    are the same permutation of the same per-particle values)."""
    diam = params.diameter
    pos = ghost.pos
    if scene.forces_mode in ("pallas", "pmajor", "chunked", "cellwise"):
        from .cellwise import cell_ids_grid

        P = scene.capacity
        cid = cell_ids_grid(pos, alive, scene)
        # Recompute vs ride crossover: dropping the 3 ghost operands from the
        # payload sort saves ~0.55ms/operand at 1M (r3 battery), while the
        # ghost_sums recompute adds one more (S, P) points_to_segments pass
        # (~20 VPU ops per (s, p) ≈ 0.005ms per segment row at 1M).  That win
        # was measured on dam break (S=4); for segment-heavy scenes the
        # recompute grows linearly in S and crosses the ~1.65ms ride cost
        # around S ~ 300, so gate it on the static segment count with margin
        # (both shipped scenes are S <= 14 padded).  SAND_CRATE_SORT_GHOST=
        # ride forces the carry-everything sort at any S.
        recompute_ghost = (
            prepos is not None
            and scene.num_segments <= 64
            and os.environ.get("SAND_CRATE_SORT_GHOST") != "ride"
        )
        if (
            os.environ.get("SAND_CRATE_SORT_PAYLOAD") != "0"
            and recompute_ghost
            and os.environ.get("SAND_CRATE_SORT_POS") != "ride"
        ):
            # Minimal payload: the fixed position does NOT ride — it is a
            # pure per-particle function of prepos (_ghost_core), so the
            # post-sort recompute that already rebuilds the ghost sums from
            # the sorted pre-fix positions rebuilds pos too, bitwise equal
            # to the permuted pre-sort values (elementwise in P, fixed
            # S-axis reduction order).  6 operands instead of 8
            # (~0.55ms/operand at 1M); SAND_CRATE_SORT_POS=ride restores
            # the pos-riding 8-operand sort for A/B.
            out = jax.lax.sort(
                (
                    cid,
                    vel[:, 0],
                    vel[:, 1],
                    prepos[:, 0],
                    prepos[:, 1],
                    uid,
                ),
                num_keys=1,
                is_stable=True,
            )
            sorted_cid = out[0]
            vel = jnp.stack(out[1:3], axis=-1)
            alive = sorted_cid < jnp.int32(scene.grid_nx * scene.grid_ny)
            uid = out[5]
            ghost = _ghost_core(
                jnp.stack(out[3:5], axis=-1),
                alive,
                segments,
                body_lin_vel,
                body_ang_vel,
                params,
                scene,
            )
            pos = ghost.pos
        elif (
            os.environ.get("SAND_CRATE_SORT_PAYLOAD") != "0"
            and recompute_ghost
        ):
            out = jax.lax.sort(
                (
                    cid,
                    pos[:, 0],
                    pos[:, 1],
                    vel[:, 0],
                    vel[:, 1],
                    prepos[:, 0],
                    prepos[:, 1],
                    uid,
                ),
                num_keys=1,
                is_stable=True,
            )
            sorted_cid = out[0]
            pos = jnp.stack(out[1:3], axis=-1)
            vel = jnp.stack(out[3:5], axis=-1)
            alive = sorted_cid < jnp.int32(scene.grid_nx * scene.grid_ny)
            uid = out[7]
            g_cnt, gsum, gvel_sum = ghost_sums(
                jnp.stack(out[5:7], axis=-1),
                alive,
                segments,
                body_lin_vel,
                body_ang_vel,
                params,
                scene,
            )
            ghost = GhostInfo(
                pos=pos, g_cnt=g_cnt, gsum=gsum, gvel_sum=gvel_sum
            )
        elif os.environ.get("SAND_CRATE_SORT_PAYLOAD") != "0":
            # Default: carry every per-particle operand as a payload operand
            # of the stable sort instead of sorting (cid, iota) and applying
            # one wide row gather.  Measured on-chip at 1M (r3 battery,
            # xprof_paysort): the 12-operand sort costs 7.1ms vs 1.6ms sort
            # + 6.8ms gather, and uid rides as its own i32 operand (no f32
            # bitcast needed).  The stable sort reproduces the iota
            # tie-break order exactly; SAND_CRATE_SORT_PAYLOAD=0 selects the
            # sort+wide-gather path (equivalence-tested in test_engine).
            # `alive` does not ride: cell_ids_grid maps dead particles to
            # the NC sentinel and clips alive ones into the grid, so
            # alive == (sorted_cid < NC) exactly — one less sort operand.
            out = jax.lax.sort(
                (
                    cid,
                    pos[:, 0],
                    pos[:, 1],
                    vel[:, 0],
                    vel[:, 1],
                    ghost.gsum[:, 0],
                    ghost.gsum[:, 1],
                    ghost.gvel_sum[:, 0],
                    ghost.gvel_sum[:, 1],
                    ghost.g_cnt,
                    uid,
                ),
                num_keys=1,
                is_stable=True,
            )
            sorted_cid = out[0]
            pos = jnp.stack(out[1:3], axis=-1)
            vel = jnp.stack(out[3:5], axis=-1)
            ghost = GhostInfo(
                pos=pos,
                g_cnt=out[9],
                gsum=jnp.stack(out[5:7], axis=-1),
                gvel_sum=jnp.stack(out[7:9], axis=-1),
            )
            alive = sorted_cid < jnp.int32(scene.grid_nx * scene.grid_ny)
            uid = out[10]
        else:
            iota = jnp.arange(P, dtype=jnp.int32)
            sorted_cid, order = jax.lax.sort((cid, iota), num_keys=1)
            # One wide row gather applies the permutation to every
            # per-particle operand at once (TPU gather cost is per-index,
            # not per-byte).
            f = pos.dtype
            # The uid column rides as a float32 bitcast (values < P are
            # denormal bit patterns); a non-f32 pos would make the concat
            # upcast the column and scramble identity — fail loudly instead.
            assert (
                f == jnp.float32
            ), f"sorted-state uid bitcast requires f32 pos, got {f}"
            big = jnp.concatenate(
                [
                    pos,
                    vel,
                    ghost.gsum,
                    ghost.gvel_sum,
                    ghost.g_cnt[:, None],
                    alive.astype(f)[:, None],
                    jax.lax.bitcast_convert_type(uid, jnp.float32)[:, None],
                ],
                axis=-1,
            )  # (P, 11)
            bs = big[order]
            pos, vel = bs[:, 0:2], bs[:, 2:4]
            ghost = GhostInfo(
                pos=pos, g_cnt=bs[:, 8], gsum=bs[:, 4:6], gvel_sum=bs[:, 6:8]
            )
            alive = bs[:, 9] > 0.5
            uid = jax.lax.bitcast_convert_type(bs[:, 10], jnp.int32)
        if scene.forces_mode in ("pallas", "pmajor", "chunked"):
            # Collider noise is hashed from (grid position | sorted index)
            # + tick — no (P, 2) random bits, no extra grid planes.
            nf_kw = {}
            if scene.forces_mode == "pmajor":
                from .ops.pmajor import neighbor_forces_pmajor_sorted as _nf

                # Enables the folded tension+pressure pass-B accumulator
                # when scene.fold_pairs is set (see Scene.fold_pairs).
                nf_kw["pressure_amplifier"] = params.pressure_amplifier
            elif scene.forces_mode == "chunked":
                from .ops.chunked import neighbor_forces_chunked_sorted as _nf

                # Batched-crate datagen lever: cap the chunk sweep at the
                # caller's live-row bound (batch-uniform; ops/chunked.py).
                nf_kw["live_rows"] = live_rows
            else:
                from .ops.pallas_forces import neighbor_forces_pallas_sorted as _nf

            sums = _nf(
                pos,
                vel,
                alive,
                sorted_cid,
                diam * params.collider_noise_level,
                tick,
                diam,
                params.surface_smoothing,
                params.target_pressure,
                params.ignored_pressure,
                params.spring_overlap_balance,
                scene,
                **nf_kw,
            )
        else:
            from .cellwise import neighbor_forces_cellwise_sorted

            pnoise = (
                (jax.random.uniform(k_noise, (P, 2), dtype=pos.dtype) - 0.5)
                * diam
                * params.collider_noise_level
            )
            sums = neighbor_forces_cellwise_sorted(
                pos,
                vel,
                alive,
                sorted_cid,
                pnoise,
                diam,
                params.surface_smoothing,
                params.target_pressure,
                params.ignored_pressure,
                params.spring_overlap_balance,
                scene,
            )
        return TickOperands(
            pos=pos, vel=vel, alive=alive, uid=uid, ghost=ghost, sums=sums
        )

    if scene.forces_mode == "dense":
        from .cellwise import neighbor_forces_dense

        pnoise = (
            (jax.random.uniform(k_noise, (scene.capacity, 2), dtype=pos.dtype) - 0.5)
            * diam
            * params.collider_noise_level
        )
        sums = neighbor_forces_dense(
            pos,
            vel,
            alive,
            pnoise,
            diam,
            params.surface_smoothing,
            params.target_pressure,
            params.ignored_pressure,
            params.spring_overlap_balance,
            scene,
        )
    else:
        sums = neighbor_forces_gather(pos, vel, alive, k_noise, params, scene)
    return TickOperands(
        pos=pos, vel=vel, alive=alive, uid=uid, ghost=ghost, sums=sums
    )


def apply_tension(vel, alive, sums: PairSums, params: Params):
    """Surface tension kick (crate.py:335-358)."""
    dv = jnp.where(alive[:, None], params.dt * sums.dv_tension, 0.0)
    return vel + dv, _alive_mean_dv(dv, alive)


def apply_gravity(vel, alive, params: Params):
    """Gravity on particles (crate.py:309-310)."""
    dv = jnp.where(alive[:, None], params.dt * params.gravity[None, :], 0.0)
    return vel + dv, _alive_mean_dv(dv, alive)


def apply_pressure_force(vel, alive, sums: PairSums, ghost: GhostInfo, params: Params):
    """Pressure force incl. ghost push-off (crate.py:286-307).

    sum_s m_s * p_i * gvec_s factors as p_i * (sum_s m_s gvec_s) = p_i * gsum.
    """
    ghost_term = sums.p_i[:, None] * ghost.gsum
    dv = params.dt * params.pressure_amplifier * (sums.pressure_real + ghost_term)
    dv = jnp.where(alive[:, None], dv, 0.0)
    return vel + dv, _alive_mean_dv(dv, alive)


def apply_spring(vel, alive, sums: PairSums, ghost: GhostInfo, params: Params):
    """Spring force (crate.py:325-333; reference ships it disabled :117-118)."""
    pull_ghost = params.spring_overlap_balance * ghost.gsum
    total = sums.nbr_cnt + ghost.g_cnt
    dv = (
        params.dt
        * params.spring_amplifier
        * (sums.spring_real + pull_ghost)
        / jnp.maximum(total, 1.0)[:, None]
    )
    dv = jnp.where(alive[:, None] & (total > 0)[:, None], dv, 0.0)
    return vel + dv, _alive_mean_dv(dv, alive)


def apply_viscosity(vel, alive, sums: PairSums, params: Params):
    """Viscosity: stale v_j snapshot, fresh v_i (crate.py:316-323)."""
    dv = params.dt * params.viscosity * (sums.visc_vsum - sums.nbr_cnt[:, None] * vel)
    dv = jnp.where(alive[:, None], dv, 0.0)
    return vel + dv, _alive_mean_dv(dv, alive)


def apply_wall_bounce(vel, alive, ghost: GhostInfo, params: Params):
    """Wall bounce against the moving-wall contact velocity (crate.py:245-259)."""
    denom = jnp.maximum(ghost.g_cnt, 1.0)[:, None]
    normal = ghost.gsum / denom  # mean ghost direction
    contact_vel = ghost.gvel_sum / denom
    n_unit, _ = geo.safe_normalize(normal)
    rel_vel = vel - contact_vel
    approach = jnp.sum(rel_vel * n_unit, axis=-1)  # (P,)
    bounce = -approach[:, None] * n_unit * (1.0 + params.wall_collision_decay)
    hit = alive & (ghost.g_cnt > 0) & (approach < 0.0)
    dv = jnp.where(hit[:, None], bounce, 0.0)
    return vel + dv, _alive_mean_dv(dv, alive)


def apply_continuous_collision(pos, vel, alive, segments, params: Params, scene: Scene):
    """Continuous collision velocity clamp (crate.py:177-200)."""
    walls = geo.pad_segments(segments, params.particle_radius)  # (2S,2,2)
    wall_valid = jnp.concatenate([scene.seg_valid, scene.seg_valid])
    crossing, t_hit = geo.segment_crossings_soa(
        pos[:, 0], pos[:, 1], vel[:, 0] * params.dt, vel[:, 1] * params.dt, walls
    )  # (2S, P)
    crossing = crossing & wall_valid[:, None] & alive[None]
    factor = jnp.min(jnp.where(crossing, t_hit, jnp.inf), axis=0)
    fix = jnp.minimum(1.0, factor)  # 1 where no crossing
    new_vel = vel * fix[:, None]
    return new_vel, _alive_mean_dv(new_vel - vel, alive)


def finish_tick(
    state: CrateState,
    ops: "TickOperands",
    vel,
    body_lin_vel,
    dv_log,
    spawn_truncated,
    params: Params,
) -> tuple[CrateState, Diagnostics]:
    """Integrate positions (crate.py:360-361) and assemble diagnostics.

    ``ops`` carries this tick's (possibly cell-sorted) operands; ``vel`` is
    the post-force velocity in the same order.  Dead slots' velocities are
    untouched by every force phase (each dv is where-masked), so ``vel`` is
    stored directly."""
    pos, alive, sums = ops.pos, ops.alive, ops.sums
    alive2 = alive[:, None]
    pos = jnp.where(alive2, pos + params.dt * vel, pos)
    new_state = state._replace(
        pos=pos,
        vel=vel,
        alive=alive,
        pressure=jnp.where(alive, sums.p_i, 0.0),
        uid=ops.uid,
        body_lin_vel=body_lin_vel,
        tick=state.tick + 1,
    )
    speed2 = jnp.sum(vel * vel, axis=-1)
    finite = jnp.all(jnp.isfinite(pos) & jnp.isfinite(vel), axis=-1)
    diag = Diagnostics(
        force_dv=jnp.stack(dv_log),
        particle_count=new_state.particle_count,
        neighbor_overflow=sums.overflow,
        max_speed=jnp.sqrt(jnp.max(jnp.where(alive, speed2, 0.0))),
        non_finite=jnp.sum((alive & ~finite).astype(jnp.int32)),
        spawn_truncated=spawn_truncated,
    )
    assert diag.force_dv.shape == (NUM_FORCES,)
    return new_state, diag


def gravity_on_free_bodies(state: CrateState, params: Params, scene: Scene):
    """Gravity integrates into free bodies' center velocity (crate.py:311-314)."""
    free = scene.body_kind == BODY_FREE
    return jnp.where(
        free[:, None], state.body_lin_vel + params.dt * params.gravity[None, :],
        state.body_lin_vel,
    )


def step(
    state: CrateState,
    params: Params,
    scene: Scene,
    live_rows: jax.Array | None = None,
) -> tuple[CrateState, Diagnostics]:
    """One physics tick: (state, params, scene) -> (state, diagnostics).

    ``live_rows`` (optional traced scalar) is the chunked-backend sweep
    bound for batched crates — an upper bound on this crate's alive count,
    batch-uniform under vmap (see ops/chunked.py; other backends ignore
    it).  sweep.BatchedCrates computes it per run() chunk.
    """
    key, k_spawn, k_noise = jax.random.split(state.key, 3)
    state = state._replace(key=key)

    # -- lifecycle ---------------------------------------------------------
    state, spawn_truncated = spawn_particles(state, params, scene, k_spawn)
    state = cull_particles(state, params)
    state = advance_bodies(state, params, scene)

    # -- boundary ghosts + hard wall (crate.py:97-99) ------------------------
    ghost = ghost_phase(state, params, scene)

    # -- neighbor interactions (crate.py:102-108,161-358 pair sums);
    #    grid backends also cell-sort every operand (sorted state) ----------
    ops = neighbor_stage(
        state.vel, state.alive, state.uid, ghost, state.tick, k_noise,
        params, scene,
        prepos=state.pos, segments=state.segments,
        body_lin_vel=state.body_lin_vel, body_ang_vel=state.body_ang_vel,
        live_rows=live_rows,
    )
    pos, vel, alive, ghost, sums = ops.pos, ops.vel, ops.alive, ops.ghost, ops.sums

    dv_log = []
    vel, dv = apply_tension(vel, alive, sums, params)
    dv_log.append(dv)
    vel, dv = apply_gravity(vel, alive, params)
    dv_log.append(dv)
    body_lin_vel = gravity_on_free_bodies(state, params, scene)
    vel, dv = apply_pressure_force(vel, alive, sums, ghost, params)
    dv_log.append(dv)
    if scene.enable_spring:
        vel, dv = apply_spring(vel, alive, sums, ghost, params)
        dv_log.append(dv)
    else:
        dv_log.append(jnp.zeros((), pos.dtype))
    vel, dv = apply_viscosity(vel, alive, sums, params)
    dv_log.append(dv)
    vel, dv = apply_wall_bounce(vel, alive, ghost, params)
    dv_log.append(dv)
    vel, dv = apply_continuous_collision(
        pos, vel, alive, state.segments, params, scene
    )
    dv_log.append(dv)

    return finish_tick(
        state, ops, vel, body_lin_vel, dv_log, spawn_truncated, params
    )


@partial(jax.jit, static_argnames=("num_ticks",))
def rollout(
    state: CrateState, params: Params, scene: Scene, num_ticks: int
) -> tuple[CrateState, Diagnostics]:
    """Run ``num_ticks`` device-resident steps with lax.scan.

    Returns the final state and the last tick's diagnostics.  For trajectory
    recording use :func:`trajectory`.
    """

    def body(carry, _):
        new_state, diag = step(carry, params, scene)
        return new_state, diag

    final, diags = jax.lax.scan(body, state, None, length=num_ticks)
    last = jax.tree.map(lambda x: x[-1], diags)
    return final, last


@partial(jax.jit, static_argnames=("num_frames", "ticks_per_frame"))
def trajectory(
    state: CrateState,
    params: Params,
    scene: Scene,
    num_frames: int,
    ticks_per_frame: int = 1,
):
    """Device-resident rollout that samples one frame every N ticks.

    Returns (final_state, frames) where frames is a dict of stacked arrays:
    pos (F,P,2), alive (F,P), pressure (F,P), segments (F,S,2,2) — the raw
    trajectory the recording layer streams to disk (the capability gestured
    at by the reference's commented-out zarr dump, playback.py:112-113).
    """

    def frame_body(carry, _):
        def tick_body(c, _):
            return step(c, params, scene)

        st, diags = jax.lax.scan(tick_body, carry, None, length=ticks_per_frame)
        frame = dict(
            pos=st.pos,
            alive=st.alive,
            pressure=st.pressure,
            segments=st.segments,
            force_dv=diags.force_dv[-1],
        )
        return st, frame

    final, frames = jax.lax.scan(frame_body, state, None, length=num_frames)
    return final, frames
