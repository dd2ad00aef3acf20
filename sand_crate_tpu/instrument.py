"""Opt-in per-phase instrumented tick — the reference's on-screen phase timer.

The reference wraps every tick phase in its wall-clock Timer and shows the
per-phase ms breakdown in the live overlay (/root/reference/src/crate/
crate.py:97-124 via utils/timer.py:37-48).  The production step here is one
fused XLA program, so host timers can only see "Step/Sync"; this module
restores the reference's capability as an *instrumented mode*: the identical
tick, split into separately-jitted phase programs (the same phase helpers
``physics.step`` itself composes, so the math cannot drift), each fetched to
host before the next starts so the PhaseTimer attributes real device time.

Per-phase dispatch costs a tunnel round-trip each on the remote-TPU setup, so
this mode is for interactive profiling (``run --instrument``), not benching;
the fused step remains the default path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import physics
from .state import NUM_FORCES, CrateState, Diagnostics, Params, Scene


@jax.jit
def _phase_lifecycle(state: CrateState, params: Params, scene: Scene):
    key, k_spawn, k_noise = jax.random.split(state.key, 3)
    state = state._replace(key=key)
    state, truncated = physics.spawn_particles(state, params, scene, k_spawn)
    state = physics.cull_particles(state, params)
    state = physics.advance_bodies(state, params, scene)
    return state, k_noise, truncated


@jax.jit
def _phase_ghosts(state: CrateState, params: Params, scene: Scene):
    return physics.ghost_phase(state, params, scene)


@jax.jit
def _phase_neighbors(
    vel, alive, uid, ghost, tick, k_noise, params: Params, scene: Scene,
    prepos, segments, body_lin_vel, body_ang_vel,
):
    # Mirror physics.step's call exactly (prepos/segments/body velocities
    # select the 8-operand payload sort + post-sort ghost_sums recompute) so
    # per-op attribution profiles the shipped path, not the legacy ride sort.
    return physics.neighbor_stage(
        vel, alive, uid, ghost, tick, k_noise, params, scene,
        prepos=prepos, segments=segments,
        body_lin_vel=body_lin_vel, body_ang_vel=body_ang_vel,
    )


_phase_tension = jax.jit(physics.apply_tension)
_phase_gravity = jax.jit(physics.apply_gravity)
_phase_pressure = jax.jit(physics.apply_pressure_force)
_phase_spring = jax.jit(physics.apply_spring)
_phase_viscosity = jax.jit(physics.apply_viscosity)
_phase_wall_bounce = jax.jit(physics.apply_wall_bounce)
_phase_ccd = jax.jit(physics.apply_continuous_collision)


@jax.jit
def _phase_integrate(state, ops, vel, dv_stack, spawn_truncated, params, scene):
    body_lin_vel = physics.gravity_on_free_bodies(state, params, scene)
    return physics.finish_tick(
        state, ops, vel, body_lin_vel, list(dv_stack), spawn_truncated, params
    )


def _sync(tree) -> None:
    """Force the phase's executable to finish before the timer stops.

    ``block_until_ready`` can return early through the remote-TPU relay
    (see .claude/skills/verify/SKILL.md), so fetch one leaf element to host —
    outputs of a jitted call materialize only when the whole program is done.
    """
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[0]))


def instrumented_tick(
    state: CrateState, params: Params, scene: Scene, timer
) -> tuple[CrateState, Diagnostics]:
    """One tick as timed phase programs; same result pytree as physics.step.

    ``timer`` is a :class:`~sand_crate_tpu.diagnostics.PhaseTimer`; phase
    names follow the reference tick (crate.py:97-124).
    """
    with timer("Lifecycle"):
        state, k_noise, truncated = _phase_lifecycle(state, params, scene)
        _sync(state.alive)
    with timer("Virtual Colliders"):
        ghost = _phase_ghosts(state, params, scene)
        _sync(ghost.pos)
    with timer("Collisions"):
        ops = _phase_neighbors(
            state.vel, state.alive, state.uid, ghost, state.tick, k_noise,
            params, scene,
            state.pos, state.segments, state.body_lin_vel, state.body_ang_vel,
        )
        _sync(ops.sums.p_i)
    vel, alive, ghost, sums = ops.vel, ops.alive, ops.ghost, ops.sums
    dv_log = []
    with timer("tension"):
        vel, dv = _phase_tension(vel, alive, sums, params)
        _sync(vel)
    dv_log.append(dv)
    with timer("gravity"):
        vel, dv = _phase_gravity(vel, alive, params)
        _sync(vel)
    dv_log.append(dv)
    with timer("pressure"):
        vel, dv = _phase_pressure(vel, alive, sums, ghost, params)
        _sync(vel)
    dv_log.append(dv)
    if scene.enable_spring:
        with timer("spring"):
            vel, dv = _phase_spring(vel, alive, sums, ghost, params)
            _sync(vel)
        dv_log.append(dv)
    else:
        dv_log.append(jnp.zeros((), vel.dtype))
    with timer("viscosity"):
        vel, dv = _phase_viscosity(vel, alive, sums, params)
        _sync(vel)
    dv_log.append(dv)
    with timer("wall_bounce"):
        vel, dv = _phase_wall_bounce(vel, alive, ghost, params)
        _sync(vel)
    dv_log.append(dv)
    with timer("continuous_collision"):
        vel, dv = _phase_ccd(ops.pos, vel, alive, state.segments, params, scene)
        _sync(vel)
    dv_log.append(dv)
    with timer("Integrate"):
        new_state, diag = _phase_integrate(
            state, ops, vel, tuple(dv_log), truncated, params, scene
        )
        _sync(new_state.pos)
    assert diag.force_dv.shape == (NUM_FORCES,)
    return new_state, diag
