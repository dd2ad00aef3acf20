"""Chunked fixed-halo pair backend: equivalence, vmap, and halo accounting.

ops/chunked.py is the vmappable mid-size backend for batched crates
(VERDICT round-2 item 6): it must reproduce the dense/cellwise pair math
(crate.py:161-358 semantics), vmap over a leading crate axis without
per-crate gathers, and count fixed-halo coverage loss exactly.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from sand_crate_tpu.cellwise import neighbor_forces_dense
from sand_crate_tpu.ops.chunked import neighbor_forces_chunked
from sand_crate_tpu.scene import build_scene
from sand_crate_tpu.state import Params


def _setup(stirring_cup_config, capacity=512, max_particles=512, **scene_kw):
    config = copy.deepcopy(stirring_cup_config)
    config.world_config.coefficients["max_particles"] = max_particles
    config.world_config.coefficients["collider_noise_level"] = 0.0
    world = config.world_config
    scene = build_scene(world, capacity=capacity, **scene_kw)
    params = Params.from_coefficients(world.coefficients)
    return scene, params


def _chunked(scene, params, pos, vel, alive, noise_amp=0.0, tick=0, live_rows=None):
    return neighbor_forces_chunked(
        pos,
        vel,
        alive,
        jnp.asarray(noise_amp, jnp.float32),
        jnp.asarray(tick, jnp.int32),
        params.diameter,
        params.surface_smoothing,
        params.target_pressure,
        params.ignored_pressure,
        params.spring_overlap_balance,
        scene,
        live_rows=live_rows,
    )


def _dense(scene, params, pos, vel, alive):
    return neighbor_forces_dense(
        pos,
        vel,
        alive,
        jnp.zeros_like(pos),
        params.diameter,
        params.surface_smoothing,
        params.target_pressure,
        params.ignored_pressure,
        params.spring_overlap_balance,
        scene,
    )


def _assert_sums_close(got, ref, fields=None, rtol=3e-3, atol=3e-3):
    fields = fields or ("p_i", "dv_tension", "pressure_real", "visc_vsum", "nbr_cnt")
    for name in fields:
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            rtol=rtol,
            atol=atol,
            err_msg=name,
        )


def test_chunked_matches_dense(stirring_cup_config):
    scene, params = _setup(stirring_cup_config, forces_mode="dense")
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.random((512, 2)).astype(np.float32) * 0.9 + 0.05)
    vel = jnp.asarray((rng.random((512, 2)).astype(np.float32) - 0.5))
    alive = jnp.asarray(rng.random(512) < 0.9)
    ref = _dense(scene, params, pos, vel, alive)
    got = _chunked(scene, params, pos, vel, alive)
    assert int(got.overflow) == 0
    _assert_sums_close(got, ref)


def test_chunked_dense_blob_no_caps(stirring_cup_config):
    """>cell_capacity particles per cell: chunked has no slot caps — exact
    vs the dense oracle as long as the halo covers the blob."""
    scene, params = _setup(
        stirring_cup_config,
        capacity=256,
        max_particles=256,
        forces_mode="dense",
        cell_capacity=8,
    )
    rng = np.random.default_rng(7)
    diam = float(np.asarray(params.diameter))
    pos = jnp.asarray(
        (rng.random((256, 2)).astype(np.float32) * 2.0 + 20.0) * diam
    )
    vel = jnp.asarray((rng.random((256, 2)).astype(np.float32) - 0.5))
    alive = jnp.ones(256, bool)
    ref = _dense(scene, params, pos, vel, alive)
    got = _chunked(scene, params, pos, vel, alive)
    assert int(got.overflow) == 0
    _assert_sums_close(got, ref, rtol=1e-2, atol=1e-2)


def test_chunked_small_halo_counts_loss(stirring_cup_config):
    """A halo smaller than one slab row's population must lose pairs
    *countably* (PairSums.overflow > 0), never silently."""
    scene, params = _setup(
        stirring_cup_config,
        capacity=512,
        max_particles=512,
        forces_mode="dense",
        chunk_halo=128,
        chunk_cs=128,  # one 512-wide chunk would cover the whole slab
    )
    rng = np.random.default_rng(5)
    diam = float(np.asarray(params.diameter))
    # One long dense row: ~512 particles spread along y = const, so the
    # sorted slab packs them all into a few grid rows far wider than 128.
    x = rng.random(512).astype(np.float32) * 0.9 + 0.05
    y = (rng.random(512).astype(np.float32) * 0.5 + 0.5) * diam
    pos = jnp.asarray(np.stack([x, y], -1))
    vel = jnp.zeros((512, 2), jnp.float32)
    alive = jnp.ones(512, bool)
    got = _chunked(scene, params, pos, vel, alive)
    assert int(got.overflow) > 0


def test_chunked_noise_deterministic_per_tick(stirring_cup_config):
    scene, params = _setup(stirring_cup_config, forces_mode="dense")
    rng = np.random.default_rng(9)
    pos = jnp.asarray(rng.random((512, 2)).astype(np.float32) * 0.2 + 0.3)
    vel = jnp.zeros((512, 2), jnp.float32)
    alive = jnp.ones(512, bool)
    amp = float(np.asarray(params.diameter)) * 0.1
    a1 = _chunked(scene, params, pos, vel, alive, noise_amp=amp, tick=4)
    a2 = _chunked(scene, params, pos, vel, alive, noise_amp=amp, tick=4)
    b = _chunked(scene, params, pos, vel, alive, noise_amp=amp, tick=5)
    np.testing.assert_array_equal(
        np.asarray(a1.dv_tension), np.asarray(a2.dv_tension)
    )
    assert np.abs(np.asarray(a1.dv_tension) - np.asarray(b.dv_tension)).max() > 0


def test_chunked_step_trajectory_matches_cellwise(stirring_cup_config):
    """Full sorted-state physics.step with forces_mode=chunked vs cellwise."""
    from sand_crate_tpu.engine import Crate

    cfg = copy.deepcopy(stirring_cup_config)
    cfg.world_config.coefficients["collider_noise_level"] = 0.0
    cfg.world_config.coefficients["max_particles"] = 200
    ca = Crate(cfg.world_config, forces_mode="cellwise")
    cb = Crate(cfg.world_config, forces_mode="chunked")
    ca.run(20)
    cb.run(20)
    ia = np.argsort(np.asarray(ca.state.uid))
    ib = np.argsort(np.asarray(cb.state.uid))
    aa = np.asarray(ca.state.alive)[ia]
    ab = np.asarray(cb.state.alive)[ib]
    np.testing.assert_array_equal(aa, ab)
    m = aa
    np.testing.assert_allclose(
        np.asarray(ca.state.pos)[ia][m],
        np.asarray(cb.state.pos)[ib][m],
        rtol=2e-3,
        atol=2e-4,
    )


def test_chunked_vmapped_matches_per_crate(stirring_cup_config):
    """vmap(step) over a crate axis with forces_mode=chunked equals stepping
    each crate alone — the property that makes mid-size datagen work."""
    from sand_crate_tpu.physics import step
    from sand_crate_tpu.scene import build_all
    from sand_crate_tpu.sweep import stack_params, stack_states

    cfg = copy.deepcopy(stirring_cup_config)
    cfg.world_config.coefficients["collider_noise_level"] = 0.0
    cfg.world_config.coefficients["max_particles"] = 150
    w = cfg.world_config
    scene, state0, params0 = build_all(cfg, forces_mode="chunked", capacity=256)

    variants = []
    for visc in (2.0, 6.0, 12.0):
        p = params0._replace(viscosity=jnp.asarray(visc, jnp.float32))
        variants.append(p)
    batched_params = stack_params(variants)
    batched_state = stack_states([state0] * 3)

    def one(st, pr):
        for _ in range(5):
            st, _ = step(st, pr, scene)
        return st

    batched_final = jax.vmap(one)(batched_state, batched_params)
    for i, p in enumerate(variants):
        single = one(state0, p)
        ia = np.argsort(np.asarray(single.uid))
        ib = np.argsort(np.asarray(jax.tree.map(lambda x: x[i], batched_final).uid))
        np.testing.assert_allclose(
            np.asarray(single.pos)[ia],
            np.asarray(jax.tree.map(lambda x: x[i], batched_final).pos)[ib],
            rtol=1e-4,
            atol=1e-5,
        )


def test_batched_crates_picks_chunked_for_mid_size(stirring_cup_config):
    """BatchedCrates auto-selects the chunked backend past the dense
    ceiling and steps a small batch of mid-size crates."""
    from sand_crate_tpu.sweep import BatchedCrates, grid_params

    cfg = copy.deepcopy(stirring_cup_config)
    cfg.world_config.coefficients["max_particles"] = 1500
    base = Params.from_coefficients(cfg.world_config.coefficients)
    batched = grid_params(base, {"viscosity": [4.0, 8.0]})
    crates = BatchedCrates(cfg, batched)
    assert crates.scene.forces_mode == "chunked"
    crates.run(3)
    assert np.isfinite(crates.positions()).all()


def test_chunked_vmapped_live_rows_bound(stirring_cup_config):
    """Crates at very different fill levels under vmap with a batch-uniform
    live-row bound (ops/chunked.py): the bounded sweep must equal the full
    static sweep exactly — skipped all-dead chunks contribute exact zeros."""
    scene, params = _setup(stirring_cup_config, capacity=512, max_particles=512)
    rng = np.random.default_rng(11)
    B, P = 3, 512
    pos = jnp.asarray(rng.random((B, P, 2)).astype(np.float32) * 0.3 + 0.1)
    vel = jnp.asarray((rng.random((B, P, 2)).astype(np.float32) - 0.5))
    # alive counts of wildly different size: 1, 2, and 3 live chunks
    counts = (60, 250, 300)
    alive = jnp.asarray(np.stack([np.arange(P) < c for c in counts]), bool)
    bound = jnp.asarray(max(counts), jnp.int32)  # batch-uniform (unbatched)

    batched = jax.vmap(
        lambda p, v, a: _chunked(scene, params, p, v, a, live_rows=bound)
    )(pos, vel, alive)
    for i in range(B):
        solo = _chunked(scene, params, pos[i], vel[i], alive[i])  # full sweep
        for name in ("p_i", "dv_tension", "pressure_real", "visc_vsum", "nbr_cnt"):
            np.testing.assert_allclose(
                np.asarray(getattr(batched, name))[i],
                np.asarray(getattr(solo, name)),
                rtol=1e-6,
                atol=1e-7,
                err_msg=f"{name} crate {i} (alive={counts[i]})",
            )
        assert int(np.asarray(batched.overflow)[i]) == int(solo.overflow)


def test_chunked_small_live_rows_counts_loss(stirring_cup_config):
    """A too-small live-row bound skips chunks holding live particles; the
    loss must land in PairSums.overflow, never silently."""
    scene, params = _setup(
        stirring_cup_config, capacity=512, max_particles=512, chunk_cs=128
    )
    rng = np.random.default_rng(13)
    pos = jnp.asarray(rng.random((512, 2)).astype(np.float32) * 0.3 + 0.1)
    vel = jnp.zeros((512, 2), jnp.float32)
    alive = jnp.asarray(np.arange(512) < 400, bool)
    ok = _chunked(scene, params, pos, vel, alive, live_rows=jnp.int32(400))
    assert int(ok.overflow) == 0
    starved = _chunked(scene, params, pos, vel, alive, live_rows=jnp.int32(128))
    # 400 alive, swept prefix 128 -> 272 live rows uncovered
    assert int(starved.overflow) >= 272


def test_batched_run_bound_matches_unbounded(stirring_cup_config):
    """BatchedCrates.run's host-computed live-row bound must not change the
    physics: same trajectory as an unbounded rollout, zero overflow."""
    from sand_crate_tpu.sweep import BatchedCrates, _batched_rollout, grid_params

    cfg = copy.deepcopy(stirring_cup_config)
    cfg.world_config.coefficients["max_particles"] = 1500
    base = Params.from_coefficients(cfg.world_config.coefficients)
    batched = grid_params(base, {"viscosity": [4.0, 8.0]})
    a = BatchedCrates(cfg, batched)
    b = BatchedCrates(cfg, batched)
    assert a.scene.forces_mode == "chunked"

    d1 = a.run(6)
    d2 = a.run(6)  # second chunk: bound recomputed from non-zero fill
    state_b, db = _batched_rollout(b.state, b.params, b.scene, 12, None)

    assert int(np.max(np.asarray(d1.neighbor_overflow))) == 0
    assert int(np.max(np.asarray(d2.neighbor_overflow))) == 0
    np.testing.assert_array_equal(
        np.asarray(a.state.alive), np.asarray(state_b.alive)
    )
    np.testing.assert_allclose(
        np.asarray(a.state.pos), np.asarray(state_b.pos), rtol=1e-6, atol=1e-7
    )
