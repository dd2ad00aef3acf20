"""Core pytrees: simulation parameters, static scene, and dynamic crate state.

The reference keeps everything as mutable attributes on one ``Crate`` object
(/root/reference/src/crate/crate.py:21-57).  Here the same information is split
TPU-first into three pieces:

* :class:`Params` — the 13 live-editable physics coefficients
  (config/stirring_cup.yaml:10-22).  Passed as traced arrays into the jitted
  step every tick, so runtime coefficient editing and vmapped parameter sweeps
  never trigger recompilation.
* :class:`Scene` — immutable scene description (bodies, motors, emitters) plus
  the static integers that shape the compiled program (capacity, neighbor K,
  cell-grid dims).  Registered as a pytree with the ints as aux data.
* :class:`CrateState` — the dynamic state advanced by ``step``: fixed-capacity
  particle arrays with an ``alive`` mask (replacing np.vstack/np.delete at
  crate.py:146-159), current rigid-body segments, body velocities, time and a
  PRNG key.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Params(NamedTuple):
    """Live-editable coefficients (reference: crate.py:42-57).

    All leaves are jnp scalars (f32) except ``gravity`` (2,) and
    ``max_particles`` (i32).  ``spring_*`` exist for the flag-gated spring
    force (disabled in the reference tick at crate.py:117-118).
    """

    dt: jax.Array
    particle_radius: jax.Array
    wall_collision_decay: jax.Array
    spring_overlap_balance: jax.Array
    spring_amplifier: jax.Array
    pressure_amplifier: jax.Array
    ignored_pressure: jax.Array
    collider_noise_level: jax.Array
    viscosity: jax.Array
    max_particles: jax.Array
    surface_smoothing: jax.Array
    target_pressure: jax.Array
    gravity: jax.Array

    @property
    def diameter(self) -> jax.Array:
        return self.particle_radius * 2.0

    @staticmethod
    def from_coefficients(coefficients: dict, dtype=jnp.float32) -> "Params":
        c = coefficients
        return Params(
            dt=jnp.asarray(c["dt"], dtype),
            particle_radius=jnp.asarray(c["particle_radius"], dtype),
            wall_collision_decay=jnp.asarray(c["wall_collision_decay"], dtype),
            spring_overlap_balance=jnp.asarray(c["spring_overlap_balance"], dtype),
            spring_amplifier=jnp.asarray(c["spring_amplifier"], dtype),
            pressure_amplifier=jnp.asarray(c["pressure_amplifier"], dtype),
            ignored_pressure=jnp.asarray(c["ignored_pressure"], dtype),
            collider_noise_level=jnp.asarray(c["collider_noise_level"], dtype),
            viscosity=jnp.asarray(c["viscosity"], dtype),
            max_particles=jnp.asarray(c["max_particles"], jnp.int32),
            surface_smoothing=jnp.asarray(c["surface_smoothing"], dtype),
            target_pressure=jnp.asarray(c["target_pressure"], dtype),
            gravity=jnp.asarray(c["gravity"], dtype),
        )

    def to_coefficients(self) -> dict:
        """Back to the reference coefficient dict (for recording config.yaml)."""
        out = {}
        for name in self._fields:
            v = np.asarray(getattr(self, name))
            out[name] = v.tolist() if v.ndim else float(v)
        out["max_particles"] = int(np.asarray(self.max_particles))
        return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Immutable scene: rigid bodies, motors, emitters, and compile-time sizes.

    Array fields are pytree leaves (device-resident constants); the trailing
    int/float/bool fields are aux metadata and participate in jit cache keys.
    """

    # --- rigid bodies -----------------------------------------------------
    # Initial world-space segments after scale/rotate/translate placement
    # (reference: rigid_body.py:36-40).
    segments0: jax.Array  # (S, 2, 2) f32
    seg_body: jax.Array  # (S,) i32 — owning body per segment (fixes the
    #   broken bookkeeping in crate.py:73-85 via an explicit map)
    seg_valid: jax.Array  # (S,) bool — False for padding rows
    body_kind: jax.Array  # (B,) i32 — 0 fixed / 1 motored / 2 free
    body_center: jax.Array  # (B, 2) f32 — rotation centers (placement pos;
    #   the reference never updates them: rigid_body.py:28-34)
    motor_lin: jax.Array  # (B, 2, 4) f32 — (amp, freq, phase, offset) per axis
    motor_ang: jax.Array  # (B, 4) f32
    init_lin_vel: jax.Array  # (B, 2) f32
    init_ang_vel: jax.Array  # (B,) f32

    # --- emitters (reference: particle_source.py:9-15) ---------------------
    src_position: jax.Array  # (Z, 2) f32
    src_velocity: jax.Array  # (Z, 2) f32
    src_radius: jax.Array  # (Z,) f32
    src_flow: jax.Array  # (Z,) f32
    src_noise: jax.Array  # (Z,) f32
    src_active_ticks: jax.Array  # (Z,) i32

    # --- static metadata (aux) ---------------------------------------------
    capacity: int = dataclasses.field(metadata=dict(static=True), default=1024)
    num_bodies: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_sources: int = dataclasses.field(metadata=dict(static=True), default=0)
    max_neighbors: int = dataclasses.field(metadata=dict(static=True), default=20)
    cell_size: float = dataclasses.field(metadata=dict(static=True), default=0.01)
    grid_nx: int = dataclasses.field(metadata=dict(static=True), default=104)
    grid_ny: int = dataclasses.field(metadata=dict(static=True), default=104)
    cell_capacity: int = dataclasses.field(metadata=dict(static=True), default=16)
    max_spawn: int = dataclasses.field(metadata=dict(static=True), default=64)
    enable_spring: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # Neighbor-force backend: "pmajor" (grid-free sorted-slab kernels,
    # ops/pmajor.py — the TPU default: exact, no cell-capacity caps),
    # "pallas" (fused cell-block kernels, ops/pair_kernel.py), "cellwise"
    # (the grid scheme in pure XLA, cellwise.py), "chunked" (fixed-halo
    # sorted-slab windows in pure XLA, ops/chunked.py — the vmappable
    # mid-size backend for batched crates) or "gather" (fixed-K neighbor
    # lists, neighbors.py).
    forces_mode: str = dataclasses.field(metadata=dict(static=True), default="cellwise")
    # Cell-row block size for the pallas kernels (grid_ny is a multiple).
    row_block: int = dataclasses.field(metadata=dict(static=True), default=8)
    # Fixed candidate halo (slab positions each side of a 128-chunk) for the
    # chunked backend; pairs further apart in sorted order are lost and
    # counted into overflow — only possible when one grid row holds more
    # than ~chunk_halo particles.
    chunk_halo: int = dataclasses.field(metadata=dict(static=True), default=384)
    # Self-chunk width for the chunked backend (particles per sweep
    # iteration).  The sweep cost tracks pair-plane VOLUME (cs + 2*halo per
    # self) plus a per-iteration overhead: the measured cs x halo table
    # (docs/perf_1m.md, batched-crate section) puts the optimum at cs=256
    # — wider chunks grow the window faster than they save iterations,
    # cs=128 pays one extra iteration's overhead per 256 selves.
    chunk_cs: int = dataclasses.field(metadata=dict(static=True), default=256)
    # Candidate window width per 128-chunk for the p-major kernels (includes
    # 128 lanes of alignment slack; losses past it are counted into
    # overflow).  With the static-split kernel (pmajor_split=2) the tail
    # tiles are pl.when-gated, so a 512 budget costs the same as 384 static
    # while covering every settled-1M chunk fully (overflow 0, measured
    # docs/perf_1m.md); tools/pmajor_w.py sweeps alternatives.
    pmajor_w: int = dataclasses.field(metadata=dict(static=True), default=512)
    # Static-prefix tile count for the p-major kernels: the first
    # pmajor_split 128-lane window tiles are computed unconditionally
    # (register-blocked by Mosaic), tiles beyond run only when the window's
    # true span reaches them (pl.when on the prefetched tile count).
    # 0 = fully static (compute all w//128 tiles always).  Measured at 1M:
    # split=2 is ~6% faster than fully-static AND extends affordable
    # coverage (512s2 = 384-static cost with overflow 0).
    pmajor_split: int = dataclasses.field(metadata=dict(static=True), default=2)
    # Fold the tension and pressure pair sums into ONE force accumulator in
    # the p-major pass-B kernel: both are additive velocity kicks computed
    # from the same snapshot (crate.py:335-358 tension, :295-307 pressure),
    # applied as dt * dv_tension and dt * pressure_amplifier * pressure_real
    # — linear, so the kernel emits sum((t_coef + pa * p_coef) * nhat) with
    # pa prescaled into the slab's cell-pressure row (still live-editable:
    # the prescale happens in XLA each tick).  Halves pass-B outputs (4->2);
    # the PairSums then carry the combined kick in dv_tension and zeros in
    # pressure_real (the ghost push-off term is unaffected).  Trade-off: the
    # per-force monitor sees tension+pressure merged (the ghost-only part in
    # the pressure slot); the unfolded path remains for instrumented runs
    # and spring scenes.
    fold_pairs: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # Symmetric pair halving for the p-major kernels: each within-diameter
    # pair is computed ONCE (by the smaller-sorted-index side) and its
    # equal-and-opposite contribution to the other side is staged per
    # candidate window and merged back in XLA (ops/pmajor._merge_jstag).
    # Requires pair-antisymmetric collider noise: BOTH positions are
    # jittered (delta noise g_i - g_j, amp scaled by 1/sqrt(2) to keep the
    # reference's one-sided delta variance, crate.py:168-170) — a physics
    # *improvement* over the reference: pair forces conserve momentum
    # exactly even with noise on.  Window volume drops ~3 -> ~2 windows
    # per chunk (the d=-1 window vanishes; same-row pairs are computed
    # from the chunk's own slab offset).  The banded spatial path stays
    # two-sided (a symm band would owe j-side sums to halo particles it
    # doesn't own — a third ppermute exchange; see spatial._band_sums_pmajor).
    pmajor_symm: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # Self-chunk size (particles per pair-plane row group) for the p-major
    # kernels.  Bigger chunks amortize the ~134-candidate window span and
    # the 128-lane anchor slack over more selves (measured tiles per 128
    # selves: 2.10 at cs=128, ~1.3 at 256, ~1.15 at 512 — docs/perf_1m.md);
    # the effective window width grows by (cs - 128) to keep coverage.
    pmajor_cs: int = dataclasses.field(metadata=dict(static=True), default=128)
    # Expression motors: ((body_idx, channel, ExprMotor), ...) with channel
    # 0=vx / 1=vy / 2=angular.  Static scene structure (an ExprMotor hashes
    # on its source): physics overrides the cosine motor_lin/motor_ang values
    # for these channels by tracing the expression into the step
    # (config.ExprMotor — the safe replacement for the reference's eval'd
    # lambdas, rigid_body.py:81-83).
    motor_exprs: tuple = dataclasses.field(metadata=dict(static=True), default=())

    @property
    def num_segments(self) -> int:
        return self.segments0.shape[0]

    @property
    def num_cells(self) -> int:
        return self.grid_nx * self.grid_ny


class CrateState(NamedTuple):
    """Dynamic state advanced by one physics tick.

    Dead particle slots stay frozen (masked writes); ``alive`` is the only
    source of truth for liveness.  ``pressure`` is the per-particle scalar
    pressure of the *last* tick, kept for rendering (reference draws it:
    playback.py:77-78).
    """

    pos: jax.Array  # (P, 2) f32
    vel: jax.Array  # (P, 2) f32
    alive: jax.Array  # (P,) bool
    pressure: jax.Array  # (P,) f32
    uid: jax.Array  # (P,) i32 — stable particle identity.  The grid-backed
    #   force modes keep the state permanently cell-sorted (the sort applies
    #   to the state itself each tick instead of building scatter-built
    #   inverse maps), so slot index is not identity; uid is.
    segments: jax.Array  # (S, 2, 2) f32 — current world segments
    body_lin_vel: jax.Array  # (B, 2) f32
    body_ang_vel: jax.Array  # (B,) f32
    time: jax.Array  # () f32 — motor time_from_start (rigid_body.py:62)
    tick: jax.Array  # () i32
    key: jax.Array  # PRNG key

    @property
    def particle_count(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))


class Diagnostics(NamedTuple):
    """Per-tick observability, the in-graph ForceMonitor equivalent
    (reference: utils/force_monitor.py:13-37 — EMA of mean ||dv|| per force).

    ``force_dv`` rows follow FORCE_LABELS order.
    """

    force_dv: jax.Array  # (NUM_FORCES,) f32 — mean ||dv|| over alive particles
    particle_count: jax.Array  # () i32
    neighbor_overflow: jax.Array  # () i32 — candidates dropped by cell capacity
    max_speed: jax.Array  # () f32
    non_finite: jax.Array  # () i32 — alive particles with NaN/inf pos or vel
    #   (in-graph NaN guard; the reference merely tolerates NaNs in its debug
    #   arrows, playback.py:97-98 — here they are counted and surfaced)
    spawn_truncated: jax.Array  # () i32 — emissions lost to the static
    #   max_spawn bound (the reference never truncates below the budget cap,
    #   particle_source.py:17-23; a 6-sigma flow spike here is counted)


FORCE_LABELS = (
    "tension",
    "gravity",
    "pressure",
    "spring",
    "viscosity",
    "wall_bounce",
    "continuous_collision",
)
NUM_FORCES = len(FORCE_LABELS)
