"""Neighbor-force providers must agree: cellwise (XLA), pallas (interpret
mode off-TPU), and the fixed-K gather path below the neighbor cap.

The three backends implement the same pair math (crate.py:161-358 semantics)
with different layouts; any divergence is a bug, not a documented difference,
as long as no cell overflows and no particle exceeds the gather path's K cap.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sand_crate_tpu.cellwise import neighbor_forces_cellwise
from sand_crate_tpu.ops.pallas_forces import neighbor_forces_pallas
from sand_crate_tpu.physics import neighbor_forces_gather
from sand_crate_tpu.scene import build_scene
from sand_crate_tpu.state import Params


@pytest.fixture()
def small_setup(stirring_cup_config):
    config = copy.deepcopy(stirring_cup_config)
    config.world_config.coefficients["max_particles"] = 96
    config.world_config.coefficients["collider_noise_level"] = 0.0
    world = config.world_config
    scene = build_scene(world, capacity=128, forces_mode="cellwise")
    params = Params.from_coefficients(world.coefficients)

    rng = np.random.default_rng(3)
    pos = rng.random((128, 2)).astype(np.float32) * 0.3 + 0.1
    vel = (rng.random((128, 2)).astype(np.float32) - 0.5) * 2.0
    alive = rng.random(128) < 0.75
    return scene, params, jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(alive)


def _cellwise(scene, params, pos, vel, alive, noise):
    return neighbor_forces_cellwise(
        pos,
        vel,
        alive,
        noise,
        params.diameter,
        params.surface_smoothing,
        params.target_pressure,
        params.ignored_pressure,
        params.spring_overlap_balance,
        scene,
    )


def test_pallas_matches_cellwise(small_setup):
    scene, params, pos, vel, alive = small_setup
    noise = jnp.zeros_like(pos)
    ref = _cellwise(scene, params, pos, vel, alive, noise)
    got = neighbor_forces_pallas(
        pos,
        vel,
        alive,
        jnp.zeros(()),  # noise amplitude 0 -> jitter-free, matches cellwise
        jnp.zeros((), jnp.int32),
        params.diameter,
        params.surface_smoothing,
        params.target_pressure,
        params.ignored_pressure,
        params.spring_overlap_balance,
        scene,
    )
    assert int(ref.overflow) == 0
    # The pallas grid encodes liveness as a +2.0 position offset, which costs
    # ~1 extra f32 ulp of position precision (2.4e-7 absolute) - invisible
    # physically (0.02% of a diameter; the reference jitters neighbors by 10%
    # of one) but visible to a tight tolerance on near-contact tension.
    for name in ("p_i", "dv_tension", "pressure_real", "visc_vsum", "nbr_cnt"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            rtol=3e-3,
            atol=3e-3,
            err_msg=name,
        )


def test_gather_matches_cellwise_below_cap(small_setup):
    scene, params, pos, vel, alive = small_setup
    noise = jnp.zeros_like(pos)
    ref = _cellwise(scene, params, pos, vel, alive, noise)
    assert float(np.asarray(ref.nbr_cnt).max()) <= scene.max_neighbors
    got = neighbor_forces_gather(
        pos, vel, alive, jax.random.key(0), params._replace(
            collider_noise_level=jnp.zeros_like(params.collider_noise_level)
        ), scene
    )
    for name in ("p_i", "dv_tension", "pressure_real", "spring_real", "visc_vsum", "nbr_cnt"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            rtol=2e-4,
            atol=2e-4,
            err_msg=name,
        )


def test_dense_matches_cellwise(small_setup):
    from sand_crate_tpu.cellwise import neighbor_forces_dense

    scene, params, pos, vel, alive = small_setup
    noise = jnp.zeros_like(pos)
    ref = _cellwise(scene, params, pos, vel, alive, noise)
    got = neighbor_forces_dense(
        pos,
        vel,
        alive,
        noise,
        params.diameter,
        params.surface_smoothing,
        params.target_pressure,
        params.ignored_pressure,
        params.spring_overlap_balance,
        scene,
    )
    for name in (
        "p_i", "dv_tension", "pressure_real", "spring_real", "visc_vsum", "nbr_cnt",
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            rtol=2e-4,
            atol=2e-4,
            err_msg=name,
        )


def test_pallas_spring_planes(small_setup, stirring_cup_config):
    """Spring-enabled scenes emit the extra spring planes and match cellwise."""
    import copy

    from sand_crate_tpu.scene import build_scene

    scene0, params, pos, vel, alive = small_setup
    config = copy.deepcopy(stirring_cup_config)
    config.world_config.coefficients["max_particles"] = 96
    config.world_config.coefficients["collider_noise_level"] = 0.0
    scene = build_scene(
        config.world_config, capacity=128, forces_mode="cellwise", enable_spring=True
    )
    noise = jnp.zeros_like(pos)
    ref = _cellwise(scene, params, pos, vel, alive, noise)
    got = neighbor_forces_pallas(
        pos,
        vel,
        alive,
        jnp.zeros(()),
        jnp.zeros((), jnp.int32),
        params.diameter,
        params.surface_smoothing,
        params.target_pressure,
        params.ignored_pressure,
        params.spring_overlap_balance,
        scene,
    )
    assert float(np.abs(np.asarray(ref.spring_real)).max()) > 0
    np.testing.assert_allclose(
        np.asarray(got.spring_real),
        np.asarray(ref.spring_real),
        rtol=3e-3,
        atol=3e-3,
    )


def test_two_level_engaged_blocks_match_cellwise(small_setup):
    """Force the two-level kernels' engaged branch: a 12-particle pile in one
    cell (> m_lo=8 slots) plus neighbors in adjacent cells.  The gated pallas
    path must give every pile particle real pair forces (the M=8 cap starved
    them, self-amplifying into point-collapse piles at 1M scale)."""
    scene, params, pos, vel, alive = small_setup
    assert scene.cell_capacity == 16  # two-level default
    pos = np.asarray(pos).copy()
    vel = np.asarray(vel).copy()
    alive = np.asarray(alive).copy()
    cell = scene.cell_size
    # 12 particles inside one cell, a ring of 6 in the 3x3 neighborhood
    cx, cy = 10.5 * cell, 12.5 * cell
    rng = np.random.default_rng(7)
    for i in range(12):
        pos[i] = (cx + (rng.random() - 0.5) * 0.8 * cell,
                  cy + (rng.random() - 0.5) * 0.8 * cell)
        alive[i] = True
    for j in range(6):
        ang = j * np.pi / 3
        pos[12 + j] = (cx + 1.2 * cell * np.cos(ang), cy + 1.2 * cell * np.sin(ang))
        alive[12 + j] = True
    pos, vel, alive = jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(alive)

    noise = jnp.zeros_like(pos)
    ref = _cellwise(scene, params, pos, vel, alive, noise)
    got = neighbor_forces_pallas(
        pos,
        vel,
        alive,
        jnp.zeros(()),
        jnp.zeros((), jnp.int32),
        params.diameter,
        params.surface_smoothing,
        params.target_pressure,
        params.ignored_pressure,
        params.spring_overlap_balance,
        scene,
    )
    assert int(ref.overflow) == 0 and int(got.overflow) == 0
    # every pile particle has neighbors counted (no force starvation)
    assert (np.asarray(got.nbr_cnt)[:12] >= 11).all()
    for name in ("p_i", "dv_tension", "pressure_real", "visc_vsum", "nbr_cnt"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(ref, name)),
            rtol=3e-3,
            atol=5e-4,
            err_msg=name,
        )


def test_addon_unit_cap_spill_is_counted(stirring_cup_config, monkeypatch):
    """Engaged two-level units beyond ADDON_UNIT_CAP lose their hi-level
    pairs for a tick; that spill must land in the overflow counter
    (pallas_forces._passes_and_gather), not vanish silently."""
    from sand_crate_tpu.ops import pair_kernel

    config = copy.deepcopy(stirring_cup_config)
    w = config.world_config
    w.coefficients = dict(w.coefficients)
    # Unique radius -> unique grid dims -> fresh jit traces that read the
    # monkeypatched cap (pair_pass_a/b caches key on shapes, not globals).
    w.coefficients["particle_radius"] = 0.0061
    w.coefficients["max_particles"] = 150
    scene = build_scene(w, capacity=160, forces_mode="pallas", cell_capacity=16)
    assert scene.cell_capacity == 16
    params = Params.from_coefficients(w.coefficients)

    # Two 10-deep cells in different row blocks: two engaged add-on units.
    pos = np.zeros((160, 2), np.float32)
    alive = np.zeros(160, bool)
    cell = scene.cell_size
    rng = np.random.default_rng(11)
    for c, (ccx, ccy) in enumerate([(10.5, 4.5), (10.5, 60.5)]):
        for i in range(10):
            k = c * 10 + i
            pos[k] = (
                (ccx + (rng.random() - 0.5) * 0.6) * cell,
                (ccy + (rng.random() - 0.5) * 0.6) * cell,
            )
            alive[k] = True
    vel = np.zeros_like(pos)
    args = (
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(alive),
        jnp.zeros(()), jnp.zeros((), jnp.int32),
        params.diameter, params.surface_smoothing, params.target_pressure,
        params.ignored_pressure, params.spring_overlap_balance, scene,
    )

    monkeypatch.setattr(pair_kernel, "ADDON_UNIT_CAP", 1)
    capped = neighbor_forces_pallas(*args)
    # No slot overflow (10 <= M=16): everything counted is add-on spill.
    assert int(capped.overflow) >= 1

    monkeypatch.setattr(pair_kernel, "ADDON_UNIT_CAP", 1024)
    # Same shapes now hit the capped jit trace — use a fresh scene size to
    # retrace with the default cap and confirm the counter goes quiet.
    scene2 = build_scene(w, capacity=192, forces_mode="pallas", cell_capacity=16)
    pos2 = np.zeros((192, 2), np.float32)
    pos2[:160] = pos
    alive2 = np.zeros(192, bool)
    alive2[:160] = alive
    free = neighbor_forces_pallas(
        jnp.asarray(pos2), jnp.zeros_like(jnp.asarray(pos2)), jnp.asarray(alive2),
        jnp.zeros(()), jnp.zeros((), jnp.int32),
        params.diameter, params.surface_smoothing, params.target_pressure,
        params.ignored_pressure, params.spring_overlap_balance, scene2,
    )
    assert int(free.overflow) == 0


def test_emit_overflow_fallback_at_m8(stirring_cup_config):
    """cell_capacity=8 (single-level, no add-on pass): over-cap particles
    must still gather their rank%8 cellmate's results through the emit path
    — a hardcoded rank-mod-16 key left ranks 8-15 force-starved (the round-1
    point-collapse class; code-review regression)."""
    from sand_crate_tpu.cellwise import cell_ids_grid
    from sand_crate_tpu.ops.pallas_forces import (
        neighbor_forces_pallas,
        neighbor_forces_pallas_sorted,
    )

    config = copy.deepcopy(stirring_cup_config)
    w = config.world_config
    w.coefficients = dict(w.coefficients)
    w.coefficients["max_particles"] = 400
    scene = build_scene(w, capacity=512, forces_mode="pallas", cell_capacity=8)
    params = Params.from_coefficients(w.coefficients)

    rng = np.random.default_rng(5)
    P = 512
    pos = (rng.random((P, 2)) * 0.35 + 0.1).astype(np.float32)
    cell = scene.cell_size
    # a 14-deep cell: ranks 8-13 ride the rank%8 fallback
    pos[:14] = (10.5 * cell, 12.5 * cell) + (rng.random((14, 2)) - 0.5) * 0.7 * cell
    vel = ((rng.random((P, 2)) - 0.5) * 2).astype(np.float32)
    alive = rng.random(P) < 0.85
    alive[:14] = True

    cid = cell_ids_grid(jnp.asarray(pos), jnp.asarray(alive), scene)
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    pos_s = jnp.asarray(pos)[order]
    vel_s = jnp.asarray(vel)[order]
    alive_s = jnp.asarray(alive)[order]

    args = (
        params.diameter, params.surface_smoothing, params.target_pressure,
        params.ignored_pressure, params.spring_overlap_balance, scene,
    )
    new = neighbor_forces_pallas_sorted(
        pos_s, vel_s, alive_s, sorted_cid,
        jnp.zeros(()), jnp.zeros((), jnp.int32), *args,
    )
    old = neighbor_forces_pallas(
        pos_s, vel_s, alive_s, jnp.zeros(()), jnp.zeros((), jnp.int32), *args
    )
    assert int(new.overflow) == int(old.overflow) > 0
    # every over-cap member of the deep cell must receive nonzero pressure
    deep = np.asarray(sorted_cid) == int(np.asarray(cid)[0])
    assert (np.abs(np.asarray(new.pressure_real)[deep]).sum(-1) > 0).all()
    for name in ("p_i", "dv_tension", "pressure_real", "visc_vsum", "nbr_cnt"):
        np.testing.assert_array_equal(
            np.asarray(getattr(new, name)), np.asarray(getattr(old, name)),
            err_msg=name,
        )


def test_emit_matches_grid_gather(stirring_cup_config):
    """The sorted-state emit path (pass B writing particle columns in-kernel,
    pair_kernel.pair_pass_b_emit) must be bit-exact vs the grid emission +
    XLA gather it replaced — including overflow fallback and two-level
    add-on contributions (a >16-deep cell and a 10-deep cell)."""
    from sand_crate_tpu.cellwise import cell_ids_grid
    from sand_crate_tpu.ops.pallas_forces import (
        neighbor_forces_pallas,
        neighbor_forces_pallas_sorted,
    )

    config = copy.deepcopy(stirring_cup_config)
    w = config.world_config
    w.coefficients = dict(w.coefficients)
    w.coefficients["max_particles"] = 400
    scene = build_scene(w, capacity=512, forces_mode="pallas", cell_capacity=16)
    params = Params.from_coefficients(w.coefficients)

    rng = np.random.default_rng(5)
    P = 512
    pos = (rng.random((P, 2)) * 0.35 + 0.1).astype(np.float32)
    cell = scene.cell_size
    pos[:20] = (10.5 * cell, 12.5 * cell) + (rng.random((20, 2)) - 0.5) * 0.7 * cell
    pos[20:30] = (40.5 * cell, 70.5 * cell) + (rng.random((10, 2)) - 0.5) * 0.7 * cell
    vel = ((rng.random((P, 2)) - 0.5) * 2).astype(np.float32)
    alive = rng.random(P) < 0.85
    alive[:30] = True

    cid = cell_ids_grid(jnp.asarray(pos), jnp.asarray(alive), scene)
    order = jnp.argsort(cid)
    sorted_cid = cid[order]
    pos_s = jnp.asarray(pos)[order]
    vel_s = jnp.asarray(vel)[order]
    alive_s = jnp.asarray(alive)[order]

    args = (
        params.diameter, params.surface_smoothing, params.target_pressure,
        params.ignored_pressure, params.spring_overlap_balance, scene,
    )
    new = neighbor_forces_pallas_sorted(
        pos_s, vel_s, alive_s, sorted_cid,
        jnp.zeros(()), jnp.zeros((), jnp.int32), *args,
    )
    old = neighbor_forces_pallas(
        pos_s, vel_s, alive_s, jnp.zeros(()), jnp.zeros((), jnp.int32), *args
    )
    assert int(new.overflow) == int(old.overflow) > 0
    for name in ("p_i", "dv_tension", "pressure_real", "visc_vsum", "nbr_cnt"):
        np.testing.assert_array_equal(
            np.asarray(getattr(new, name)), np.asarray(getattr(old, name)),
            err_msg=name,
        )
