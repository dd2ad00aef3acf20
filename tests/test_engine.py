"""End-to-end engine tests: lifecycle, stability, live editing, streaming."""

import numpy as np
import pytest

from sand_crate_tpu import Crate
from sand_crate_tpu.state import FORCE_LABELS


@pytest.fixture
def crate(stirring_cup_config):
    return Crate(stirring_cup_config.world_config)


def test_spawn_and_cap(crate):
    """Sources fill the crate up to max_particles (crate.py:138-147)."""
    for _ in range(30):
        crate.physics_tick()
    n30 = crate.particle_count
    assert 0 < n30 <= 600
    for _ in range(170):
        crate.physics_tick()
    assert crate.particle_count == 600  # budget reached and held
    assert crate.tick == 200


def test_no_nans_and_in_box(crate):
    for _ in range(150):
        crate.physics_tick()
    p = crate.particles
    v = crate.particle_velocities
    assert np.isfinite(p).all() and np.isfinite(v).all()
    r = crate.particle_radius
    assert (p >= -r - 1e-5).all() and (p <= 1 + r + 1e-5).all()


def test_live_coefficient_editing(crate):
    """Playback contract: getattr/setattr on coefficient names
    (playback.py:221-226) without recompilation."""
    names = crate.editable_coefficients()
    assert "viscosity" in names and "gravity" in names
    for _ in range(5):
        crate.physics_tick()
    before = crate.viscosity
    crate.viscosity = before * 1.1
    assert np.isclose(crate.viscosity, before * 1.1)
    crate.gravity = np.array([9.81, 0.0])  # arrow-key gravity tilt
    crate.physics_tick()
    assert crate.tick == 6
    np.testing.assert_allclose(crate.gravity, [9.81, 0.0])
    with pytest.raises(AttributeError):
        crate.not_a_coefficient = 3


def test_debug_prints_surface(crate):
    crate.physics_tick()
    text = crate.debug_prints
    assert "Tick: 1" in text
    assert "Particles:" in text
    assert "Forces:" in text
    assert "Timing" in text
    assert "viscosity" in text  # coefficient dump


def test_force_monitor_labels(crate):
    for _ in range(40):
        crate.physics_tick()
    report = crate.force_monitor.report()
    for label in FORCE_LABELS:
        assert label in report


def test_motored_body_moves(wave_machine_config):
    crate = Crate(wave_machine_config.world_config)
    seg0 = crate.segments.copy()
    for _ in range(30):
        crate.physics_tick()
    moved = np.abs(crate.segments - seg0).max(axis=(1, 2))
    seg_body = np.asarray(crate.scene.seg_body)
    kinds = np.asarray(crate.scene.body_kind)
    assert (moved[kinds[seg_body] == 0] < 1e-7).all()  # fixed walls stay put
    assert (moved[kinds[seg_body] == 1] > 1e-5).any()  # motored wall moved


def test_stream_frames(crate):
    frames = list(crate.stream_frames(num_frames=6, ticks_per_frame=3, chunk_frames=2))
    assert len(frames) == 6
    assert crate.tick == 18
    for f in frames:
        assert f["pos"].shape == (crate.scene.capacity, 2)
        assert np.isfinite(f["pos"][f["alive"]]).all()


def test_free_body_falls(stirring_cup_config):
    """A free rigid body integrates gravity (crate.py:311-314)."""
    import copy

    from sand_crate_tpu.config import BODY_FREE, RigidBodyConfig

    world = copy.deepcopy(stirring_cup_config.world_config)
    world.rigid_bodies.append(
        RigidBodyConfig(
            kind=BODY_FREE,
            segments=[[[-0.1, 0.0], [0.1, 0.0]]],
            position=(0.5, 0.2),
        )
    )
    crate = Crate(world)
    seg0 = crate.segments.copy()
    for _ in range(20):
        crate.physics_tick()
    free_seg = crate.segments[-1]
    assert free_seg[:, 1].mean() > seg0[-1][:, 1].mean()  # fell downward (+y)


def test_radius_edit_regrids_stencil_backends(stirring_cup_config):
    """A live radius edit past cell_size/2 must rebuild the neighbor grid
    (advisor finding: static cell dims + editable radius silently miss
    in-range pairs on the 3x3-stencil backends; the reference recomputes its
    strips from the current diameter every tick)."""
    crate = Crate(stirring_cup_config.world_config, forces_mode="cellwise")
    for _ in range(40):
        crate.physics_tick()
    old_cell = crate.scene.cell_size
    old_capacity = crate.scene.capacity
    new_radius = old_cell  # diameter = 2*cell_size: stencil would miss pairs
    crate.particle_radius = new_radius
    assert crate.scene.cell_size >= 2 * new_radius - 1e-12
    assert crate.scene.capacity == old_capacity
    assert float(np.asarray(crate.params.particle_radius)) == pytest.approx(
        new_radius, rel=1e-6
    )
    crate.physics_tick()  # recompiles and runs at the new diameter
    assert np.isfinite(crate.particles).all()
    # shrinking the radius back keeps the (larger) grid — still correct
    crate.particle_radius = new_radius / 4
    crate.physics_tick()
    assert np.isfinite(crate.particles).all()


def test_radius_edit_dense_backend_untouched(stirring_cup_config):
    """The dense backend is stencil-free; radius edits must not regrid."""
    crate = Crate(stirring_cup_config.world_config, forces_mode="dense")
    scene_before = crate.scene
    crate.particle_radius = 0.05
    assert crate.scene is scene_before


def test_emission_truncation_counter(stirring_cup_config):
    """A flow spike beyond the statistical max_spawn bound must be counted
    (the reference never silently truncates below the budget cap,
    particle_source.py:17-23)."""
    import dataclasses

    import jax

    from sand_crate_tpu.physics import step
    from sand_crate_tpu.scene import build_all

    scene, state, params = build_all(stirring_cup_config)
    _, diag0 = jax.jit(lambda s, p: step(s, p, scene))(state, params)
    assert int(diag0.spawn_truncated) == 0  # sized for the configured flow

    spiked = dataclasses.replace(scene, src_flow=scene.src_flow * 1000.0)
    _, diag = jax.jit(lambda s, p: step(s, p, spiked))(state, params)
    assert int(diag.spawn_truncated) > 0


def test_instrumented_tick_matches_fused(stirring_cup_config):
    """--instrument runs the identical tick as phase-split programs
    (instrument.py): same trajectory as the fused step, and the PhaseTimer
    gains the reference's per-phase entries (crate.py:97-124)."""
    fused = Crate(stirring_cup_config.world_config)
    inst = Crate(stirring_cup_config.world_config, instrument=True)
    for _ in range(8):
        fused.physics_tick()
        inst.physics_tick()
    assert inst.tick == fused.tick == 8
    np.testing.assert_allclose(
        np.asarray(inst.state.pos), np.asarray(fused.state.pos), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(inst.state.vel), np.asarray(fused.state.vel), atol=1e-5
    )
    assert np.array_equal(np.asarray(inst.state.alive), np.asarray(fused.state.alive))
    report = inst.debug_timer.report()
    for phase in ("Virtual Colliders", "Collisions", "viscosity", "wall_bounce"):
        assert phase in report
    # the default path keeps its fused Step/Sync shape
    assert "Step" in fused.debug_timer.report()


def test_uid_tracks_identity_through_sorted_state(stirring_cup_config):
    """Grid backends keep the state permanently cell-sorted; uid must follow
    each particle through the per-tick permutation (no teleports: a tracked
    uid's position moves by less than a few radii per tick)."""
    import jax.numpy as jnp

    crate = Crate(stirring_cup_config.world_config, forces_mode="cellwise")
    for _ in range(10):
        crate.physics_tick()
    alive = np.asarray(crate.state.alive)
    uids = np.asarray(crate.state.uid)
    assert len(np.unique(uids[alive])) == int(alive.sum())  # identity unique
    tracked = uids[alive][: 5]
    prev = {
        int(u): np.asarray(crate.state.pos)[uids == u][0] for u in tracked
    }
    bound = 6 * float(crate.particle_radius)
    for _ in range(10):
        crate.physics_tick()
        uids = np.asarray(crate.state.uid)
        alive = np.asarray(crate.state.alive)
        pos = np.asarray(crate.state.pos)
        for u in list(prev):
            sel = (uids == u) & alive
            if not sel.any():
                prev.pop(u)  # culled
                continue
            p = pos[sel][0]
            assert np.linalg.norm(p - prev[u]) < bound, u
            prev[u] = p
    assert prev  # at least some tracked particles survived


def test_sort_payload_knob_equivalence(stirring_cup_config, monkeypatch):
    """The default payload-operand lax.sort and the opt-out sort+wide-gather
    path (SAND_CRATE_SORT_PAYLOAD=0) must produce the identical sorted
    state: the stable sort reproduces the iota tie-break."""
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sand_crate_tpu.physics import GhostInfo, neighbor_stage
    from sand_crate_tpu.scene import build_scene
    from sand_crate_tpu.state import Params

    config = copy.deepcopy(stirring_cup_config)
    config.world_config.coefficients["collider_noise_level"] = 0.0
    world = config.world_config
    scene = build_scene(world, capacity=256, forces_mode="cellwise")
    params = Params.from_coefficients(world.coefficients)

    rng = np.random.default_rng(7)
    P = 256
    pos = jnp.asarray(rng.random((P, 2)).astype(np.float32) * 0.4 + 0.1)
    vel = jnp.asarray((rng.random((P, 2)).astype(np.float32) - 0.5) * 2)
    alive = jnp.asarray(rng.random(P) < 0.8)
    uid = jnp.arange(P, dtype=jnp.int32)[::-1].copy()
    ghost = GhostInfo(
        pos=pos,
        g_cnt=jnp.asarray(rng.integers(0, 2, P).astype(np.float32)),
        gsum=jnp.asarray(rng.random((P, 2)).astype(np.float32)),
        gvel_sum=jnp.asarray(rng.random((P, 2)).astype(np.float32)),
    )
    tick = jnp.int32(3)
    key = jax.random.PRNGKey(0)

    monkeypatch.setenv("SAND_CRATE_SORT_PAYLOAD", "0")
    base = neighbor_stage(vel, alive, uid, ghost, tick, key, params, scene)
    monkeypatch.delenv("SAND_CRATE_SORT_PAYLOAD", raising=False)
    alt = neighbor_stage(vel, alive, uid, ghost, tick, key, params, scene)

    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(alt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sort_ghost_recompute_equivalence(stirring_cup_config, monkeypatch):
    """The trimmed 8-operand payload sort (ghost sums recomputed post-sort
    from the sorted pre-fix positions) must equal the carry-everything
    11-operand sort: same permutation, same per-particle ghost reductions."""
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sand_crate_tpu import physics
    from sand_crate_tpu.scene import build_scene, init_state
    from sand_crate_tpu.state import Params

    config = copy.deepcopy(stirring_cup_config)
    world = config.world_config
    scene = build_scene(world, capacity=256, forces_mode="cellwise")
    params = Params.from_coefficients(world.coefficients)
    state = init_state(world, scene, seed=5)
    # Scatter some live particles around (incl. near the walls so ghost
    # contacts are actually non-trivial in both paths).
    rng = np.random.default_rng(11)
    P = scene.capacity
    pos = jnp.asarray(rng.random((P, 2)).astype(np.float32) * 0.9 + 0.05)
    vel = jnp.asarray((rng.random((P, 2)).astype(np.float32) - 0.5) * 2)
    alive = jnp.asarray(rng.random(P) < 0.8)
    state = state._replace(pos=pos, vel=vel, alive=alive)

    ghost = physics.ghost_phase(state, params, scene)
    tick = jnp.int32(3)
    key = jax.random.PRNGKey(0)
    kw = dict(
        prepos=state.pos,
        segments=state.segments,
        body_lin_vel=state.body_lin_vel,
        body_ang_vel=state.body_ang_vel,
    )

    monkeypatch.setenv("SAND_CRATE_SORT_GHOST", "ride")
    base = physics.neighbor_stage(
        state.vel, alive, state.uid, ghost, tick, key, params, scene, **kw
    )
    monkeypatch.delenv("SAND_CRATE_SORT_GHOST", raising=False)
    # Middle path: ghost sums recomputed post-sort but pos still rides
    # (8 operands).
    monkeypatch.setenv("SAND_CRATE_SORT_POS", "ride")
    mid = physics.neighbor_stage(
        state.vel, alive, state.uid, ghost, tick, key, params, scene, **kw
    )
    monkeypatch.delenv("SAND_CRATE_SORT_POS", raising=False)
    # Default: minimal 6-operand sort — the hard-wall-fixed pos AND the
    # ghost reductions are all recomputed post-sort from sorted prepos.
    alt = physics.neighbor_stage(
        state.vel, alive, state.uid, ghost, tick, key, params, scene, **kw
    )

    assert bool(jnp.any(alt.ghost.g_cnt > 0))  # contacts actually exercised
    for a, m, b in zip(
        jax.tree.leaves(base), jax.tree.leaves(mid), jax.tree.leaves(alt)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
        )
        # pos-recompute vs pos-ride is a pure permutation identity: bitwise.
        np.testing.assert_array_equal(np.asarray(m), np.asarray(b))
