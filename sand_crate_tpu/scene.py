"""Scene construction: config -> (Scene, CrateState, Params).

Host-side (NumPy) one-time work mirroring the reference's ``Crate.__init__``
(/root/reference/src/crate/crate.py:21-57) and ``build_rigid_bodies``
(/root/reference/src/crate/rigid_body.py:71-88): body placement
(scale -> rotate -> translate), emitter setup, and coefficient splat — but
producing immutable pytrees with fixed-capacity device arrays instead of a
mutable object with size-changing arrays.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    BODY_FIXED,
    BODY_MOTORED,
    Config,
    InitialParticlesConfig,
    WorldConfig,
)
from .state import CrateState, Params, Scene


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def place_segments(
    segments: np.ndarray,
    scale: tuple[float, float],
    rotation_deg: float,
    position: tuple[float, float],
) -> np.ndarray:
    """scale -> rotate (degrees) -> translate, matching rigid_body.py:36-40.

    pygame.Vector2.rotate(theta) maps (x, y) -> (x cos - y sin, x sin + y cos),
    which is what we apply here without the pygame dependency.
    """
    seg = np.asarray(segments, dtype=np.float64) * np.asarray(scale)[None, None, :]
    th = math.radians(rotation_deg)
    c, s = math.cos(th), math.sin(th)
    rot = np.array([[c, s], [-s, c]])  # row-vector convention: p' = p @ rot
    seg = seg @ rot
    seg = seg + np.asarray(position)[None, None, :]
    return seg


def default_capacity(max_particles: int) -> int:
    return max(128, _round_up(int(max_particles), 128))


def build_scene(
    world: WorldConfig,
    *,
    capacity: int | None = None,
    max_neighbors: int = 20,
    cell_capacity: int | None = None,
    enable_spring: bool = False,
    forces_mode: str = "auto",
    chunk_halo: int | None = None,
    chunk_cs: int = 256,
    pmajor_w: int = 512,
    pmajor_cs: int = 128,
    pmajor_split: int = 2,
    fold_pairs: bool | None = None,
    pmajor_symm: bool | None = None,
    dtype=jnp.float32,
) -> Scene:
    """Build the immutable Scene pytree from a parsed world config."""
    coeff = world.coefficients
    if forces_mode == "auto":
        # Tiny scenes: the masked all-pairs backend beats every grid scheme
        # (one fused op chain, no sort/scatter/kernel-launch overhead —
        # stirring_cup runs 697 vs 158 steps/s, wave_machine 267 vs 163).  At scale:
        # the grid-free p-major pair kernels are the fastest exact backend
        # on TPU (1M dam break: 20.1 steps/s vs 12.0 for the grid Pallas
        # path vs ~0.8 for XLA cellwise) and carry no cell-capacity caps;
        # off-TPU Pallas only runs in interpret mode, so the XLA path is
        # the fallback.
        cap_guess = capacity or default_capacity(int(coeff["max_particles"]))
        if cap_guess <= 2048:
            # Below ~2k everything is dispatch-bound (~540-580 steps/s on
            # chip for dense/chunked/pmajor alike, round-5 probe); dense
            # wins the tiny end (stirring_cup 581 vs 496 pmajor).
            forces_mode = "dense"
        elif jax.default_backend() != "tpu":
            forces_mode = "dense" if cap_guess <= 4096 else "cellwise"
        elif cap_guess <= 4096:
            # The O(P^2) dense planes fall off the latency floor here
            # (wave_machine cap 4096 at 3033 alive: dense 327 vs chunked
            # 538 / pmajor 528 steps/s, round-5 probe); chunked edges
            # pmajor and costs no kernel specialization.
            forces_mode = "chunked"
        else:
            forces_mode = "pmajor"
    radius = float(coeff["particle_radius"])
    diameter = 2.0 * radius
    max_particles = int(coeff["max_particles"])
    capacity = capacity or default_capacity(max_particles)

    # ---- rigid bodies ----
    seg_list, seg_body = [], []
    body_kind, body_center, motor_lin, motor_ang = [], [], [], []
    init_lin_vel, init_ang_vel = [], []
    motor_exprs = []
    for b_idx, body in enumerate(world.rigid_bodies):
        seg = place_segments(body.segments, body.scale, body.rotation, body.position)
        seg_list.append(seg)
        seg_body.extend([b_idx] * len(seg))
        body_kind.append(body.kind)
        body_center.append(body.position)
        motor_lin.append([body.motor_vx.as_tuple(), body.motor_vy.as_tuple()])
        motor_ang.append(body.motor_ang.as_tuple())
        init_lin_vel.append(body.center_velocity)
        init_ang_vel.append(body.angular_velocity0)
        if body.kind == BODY_MOTORED:
            for ch, spec in enumerate((body.motor_vx, body.motor_vy, body.motor_ang)):
                if spec.expr is not None:
                    motor_exprs.append((b_idx, ch, spec.expr))

    num_bodies = max(1, len(world.rigid_bodies))
    if seg_list:
        segments0 = np.concatenate(seg_list, axis=0)
        seg_valid = np.ones(len(segments0), bool)
    else:
        # Degenerate far-away segment so the (P, S) boundary math always has
        # at least one (masked) column.
        segments0 = np.array([[[1e6, 1e6], [1e6 + 1.0, 1e6]]])
        seg_valid = np.zeros(1, bool)
        seg_body = [0]
    if not world.rigid_bodies:
        body_kind, body_center = [BODY_FIXED], [(0.0, 0.0)]
        motor_lin, motor_ang = [[(0.0,) * 4, (0.0,) * 4]], [(0.0,) * 4]
        init_lin_vel, init_ang_vel = [(0.0, 0.0)], [0.0]

    # ---- emitters ----
    num_sources = len(world.particle_sources)
    if num_sources:
        src_position = np.array([s.position for s in world.particle_sources])
        src_velocity = np.array([s.velocity for s in world.particle_sources])
        src_radius = np.array([s.radius for s in world.particle_sources])
        src_flow = np.array([s.flow for s in world.particle_sources])
        src_noise = np.array([s.noise for s in world.particle_sources])
        src_active = np.array(
            [s.active_ticks for s in world.particle_sources], np.int32
        )
    else:
        src_position = np.zeros((1, 2))
        src_velocity = np.zeros((1, 2))
        src_radius = np.zeros(1)
        src_flow = np.zeros(1)
        src_noise = np.zeros(1)
        src_active = np.zeros(1, np.int32)

    # ---- neighbor grid ----
    # Cell size = one diameter: candidates for the <=diameter cutoff live in
    # the 3x3 cell neighborhood (TPU-native replacement of the strip sweep in
    # collision_detector.py:124-128).  Positions live in [-r, 1+r]
    # (out-of-box culling, crate.py:149-159); one margin cell each side.
    cell_size = diameter
    grid_nx = int(math.ceil(1.0 / cell_size)) + 3
    # Pallas row block: every temporary in the unrolled pair kernels has shape
    # (TR, M, NXP) and the register allocator spills ~proportionally to
    # TR * NXP (measured: 132MB of spill slots at TR=8, NXP=1664 — over the
    # 128MB VMEM; TR=8, NXP=512 compiles in ~40MB).  Keep TR * NXP near the
    # known-good 4096 product, as a power of two in [1, 8].
    nxp = ((grid_nx + 2 + 127) // 128) * 128
    if cell_capacity is None:
        # Resting liquid packs ~1.2 centers per d x d cell (spacing ~ 0.9 d)
        # and transient compression stays well under 8 — but capping at 8
        # starves over-full cells of ALL pair forces, which self-amplifies
        # into point-collapse piles (measured: single cells accumulating
        # thousands of force-less particles in a settled 1M dam break).
        # 16 slots with two-level gating (ops/pair_kernel._block_flags) keeps
        # the pair cost at the 8-slot level wherever no cell exceeds 8.
        cell_capacity = 16
    # Pallas row block: every temporary in the unrolled pair kernels has
    # shape (TR, 8, NXP) — the two-level kernels compute on 8-sublane slot
    # halves regardless of M — and the register allocator spills
    # ~proportionally to TR * NXP (measured: 132MB of spill slots at TR=8,
    # NXP=1664 — over the 128MB VMEM; TR=8, NXP=512 compiles in ~40MB).
    # Keep TR * NXP near the known-good 4096 product, as a power of two.
    row_block = 8
    while row_block > 1 and row_block * nxp > 4608:
        row_block //= 2
    # grid_ny rounded up so the pallas kernels' row blocks tile it exactly.
    grid_ny = _round_up(grid_nx, row_block)

    # ---- chunked-backend halo ----
    if chunk_halo is None:
        # Cover ~2 packed slab rows each side (a resting row holds ~1.3
        # particles/cell; the measured halo sweep at wave_machine scale —
        # docs/perf_1m.md batched-crate section — shows overflow stays 0
        # through a full 600-tick fill incl. jet/splash at 2*nx, while the
        # old 4-row margin cost ~1.4x pass volume for nothing).  Too-small
        # halos degrade exactly (counted into PairSums.overflow), never
        # silently.
        chunk_halo = min(
            _round_up(capacity, 128),
            max(256, _round_up(2 * grid_nx, 128)),
        )

    # ---- p-major pair-sum folding ----
    if fold_pairs is None:
        # Production default for the p-major backend: one folded force
        # accumulator (see Scene.fold_pairs).  Spring scenes keep the split
        # (the spring sum needs its own output rows), and instrumented runs
        # pass fold_pairs=False explicitly for the full per-force monitor.
        fold_pairs = forces_mode == "pmajor" and not enable_spring
    if pmajor_symm is None:
        # Production default for the p-major backend: each pair computed
        # once, j-side staged + merged (measured +9% at 1M: 31.86 vs 29.18
        # steps/s probe A/B, 2026-08-19).  Needs the split kernel
        # (pmajor_split >= 1); neighbor_forces_pmajor_sorted falls back to
        # two-sided if a probe knob forces the pure-static/gated variant.
        pmajor_symm = forces_mode == "pmajor" and pmajor_split >= 1

    # ---- spawn cap ----
    dt = float(coeff["dt"])
    exp_spawn = max((float(s.flow) * dt for s in world.particle_sources), default=0.0)
    max_spawn = int(min(capacity, _round_up(int(exp_spawn + 6 * exp_spawn**0.5 + 8), 8)))

    return Scene(
        segments0=jnp.asarray(segments0, dtype),
        seg_body=jnp.asarray(seg_body, jnp.int32),
        seg_valid=jnp.asarray(seg_valid),
        body_kind=jnp.asarray(body_kind, jnp.int32),
        body_center=jnp.asarray(body_center, dtype),
        motor_lin=jnp.asarray(motor_lin, dtype),
        motor_ang=jnp.asarray(motor_ang, dtype),
        motor_exprs=tuple(motor_exprs),
        init_lin_vel=jnp.asarray(init_lin_vel, dtype),
        init_ang_vel=jnp.asarray(init_ang_vel, dtype),
        src_position=jnp.asarray(src_position, dtype),
        src_velocity=jnp.asarray(src_velocity, dtype),
        src_radius=jnp.asarray(src_radius, dtype),
        src_flow=jnp.asarray(src_flow, dtype),
        src_noise=jnp.asarray(src_noise, dtype),
        src_active_ticks=jnp.asarray(src_active, jnp.int32),
        capacity=capacity,
        num_bodies=num_bodies,
        num_sources=num_sources,
        max_neighbors=max_neighbors,
        cell_size=cell_size,
        grid_nx=grid_nx,
        grid_ny=grid_ny,
        cell_capacity=int(cell_capacity),
        max_spawn=max_spawn,
        enable_spring=enable_spring,
        forces_mode=forces_mode,
        row_block=row_block,
        chunk_halo=int(chunk_halo),
        chunk_cs=int(chunk_cs),
        pmajor_w=int(pmajor_w),
        pmajor_cs=int(pmajor_cs),
        pmajor_split=int(pmajor_split),
        fold_pairs=bool(fold_pairs),
        pmajor_symm=bool(pmajor_symm),
    )


def _initial_block_particles(
    blocks: list[InitialParticlesConfig], capacity: int, seed: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Generate bulk-seeded particles for ``world.initial_particles`` blocks."""
    rng = np.random.default_rng(seed)
    pos_list, vel_list = [], []
    for blk in blocks:
        xs = np.arange(blk.x0, blk.x1, blk.spacing)
        ys = np.arange(blk.y0, blk.y1, blk.spacing)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        p = np.stack([gx.ravel(), gy.ravel()], axis=-1)
        if blk.jitter:
            p = p + (rng.random(p.shape) - 0.5) * blk.spacing * blk.jitter
        v = np.broadcast_to(np.asarray(blk.velocity, np.float64), p.shape)
        pos_list.append(p)
        vel_list.append(v)
    if not pos_list:
        return np.zeros((0, 2)), np.zeros((0, 2)), 0
    pos = np.concatenate(pos_list)[:capacity]
    vel = np.concatenate(vel_list)[:capacity]
    return pos, vel, len(pos)


def init_state(
    world: WorldConfig, scene: Scene, *, seed: int = 0, dtype=jnp.float32
) -> CrateState:
    """Initial CrateState (reference zero-state: crate.py:23-33 + seeding ext)."""
    P = scene.capacity
    pos = np.zeros((P, 2))
    vel = np.zeros((P, 2))
    alive = np.zeros(P, bool)
    n0 = 0
    if world.initial_particles:
        p0, v0, n0 = _initial_block_particles(world.initial_particles, P, seed)
        pos[:n0], vel[:n0], alive[:n0] = p0, v0, True
    return CrateState(
        pos=jnp.asarray(pos, dtype),
        vel=jnp.asarray(vel, dtype),
        alive=jnp.asarray(alive),
        pressure=jnp.zeros(P, dtype),
        uid=jnp.arange(P, dtype=jnp.int32),
        segments=scene.segments0,
        body_lin_vel=scene.init_lin_vel,
        body_ang_vel=scene.init_ang_vel,
        time=jnp.zeros((), dtype),
        tick=jnp.zeros((), jnp.int32),
        key=jax.random.key(seed),
    )


def build_all(
    config: Config, *, seed: int = 0, capacity: int | None = None, **scene_kwargs
) -> tuple[Scene, CrateState, Params]:
    """One-stop: parsed config -> (Scene, initial CrateState, Params)."""
    world = config.world_config
    scene = build_scene(world, capacity=capacity, **scene_kwargs)
    state = init_state(world, scene, seed=seed)
    params = Params.from_coefficients(world.coefficients)
    return scene, state, params
