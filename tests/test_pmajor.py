"""P-major (grid-free) pair backend equivalence + its no-cap guarantees.

The p-major kernels (ops/pmajor.py) must reproduce the cellwise/dense pair
math (crate.py:161-358 semantics) with NO cell-capacity caps: dense blobs
beyond cell_capacity and chunks spanning many grid rows — the two regimes
the grid kernels degrade in — must come out exact (vs the dense all-pairs
oracle, which has no caps either).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sand_crate_tpu.cellwise import (
    neighbor_forces_cellwise,
    neighbor_forces_dense,
)
from sand_crate_tpu.ops.pmajor import neighbor_forces_pmajor
from sand_crate_tpu.scene import build_scene
from sand_crate_tpu.state import Params


def _setup(stirring_cup_config, capacity=128, max_particles=96, **scene_kw):
    config = copy.deepcopy(stirring_cup_config)
    config.world_config.coefficients["max_particles"] = max_particles
    config.world_config.coefficients["collider_noise_level"] = 0.0
    world = config.world_config
    scene = build_scene(world, capacity=capacity, **scene_kw)
    params = Params.from_coefficients(world.coefficients)
    return scene, params


def _pmajor(scene, params, pos, vel, alive, noise_amp=0.0, tick=0, **kw):
    return neighbor_forces_pmajor(
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
        **kw,
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


def test_pmajor_matches_cellwise(stirring_cup_config):
    scene, params = _setup(stirring_cup_config, forces_mode="cellwise")
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.random((128, 2)).astype(np.float32) * 0.3 + 0.1)
    vel = jnp.asarray((rng.random((128, 2)).astype(np.float32) - 0.5) * 2.0)
    alive = jnp.asarray(rng.random(128) < 0.75)
    ref = neighbor_forces_cellwise(
        pos, vel, alive, jnp.zeros_like(pos),
        params.diameter, params.surface_smoothing, params.target_pressure,
        params.ignored_pressure, params.spring_overlap_balance, scene,
    )
    got = _pmajor(scene, params, pos, vel, alive)
    assert int(got.overflow) == 0
    assert int(ref.overflow) == 0
    _assert_sums_close(got, ref)


def test_pmajor_dense_blob_beyond_cell_capacity(stirring_cup_config):
    """A blob packing >cell_capacity particles per cell: the grid backends
    overflow (counted, forces degraded) — p-major must stay exact vs the
    dense all-pairs oracle with overflow == 0 (the no-cap guarantee)."""
    scene, params = _setup(
        stirring_cup_config, capacity=256, max_particles=256,
        forces_mode="dense", cell_capacity=8,
    )
    rng = np.random.default_rng(7)
    # 256 particles inside a ~2x2-cell square -> ~60+ per cell.
    diam = float(np.asarray(params.diameter))
    pos = jnp.asarray(
        (rng.random((256, 2)).astype(np.float32) * 2.0 + 20.0) * diam
    )
    vel = jnp.asarray((rng.random((256, 2)).astype(np.float32) - 0.5))
    alive = jnp.ones(256, bool)
    ref = neighbor_forces_dense(
        pos, vel, alive, jnp.zeros_like(pos),
        params.diameter, params.surface_smoothing, params.target_pressure,
        params.ignored_pressure, params.spring_overlap_balance, scene,
    )
    cw = neighbor_forces_cellwise(
        pos, vel, alive, jnp.zeros_like(pos),
        params.diameter, params.surface_smoothing, params.target_pressure,
        params.ignored_pressure, params.spring_overlap_balance, scene,
    )
    assert int(cw.overflow) > 0  # the grid path degrades here
    got = _pmajor(scene, params, pos, vel, alive)
    assert int(got.overflow) == 0
    # Hundreds of near-coincident pairs: sums are large, rtol does the work.
    _assert_sums_close(got, ref, rtol=1e-2, atol=1e-2)


def test_pmajor_row_spanning_sparse(stirring_cup_config):
    """Sparse spray: few particles per grid row, so every 128-chunk spans
    many rows — the regime the window-per-chunk anchoring must get right
    (each window covers row offset d via cid_first/cid_last bounds)."""
    scene, params = _setup(
        stirring_cup_config, capacity=512, max_particles=512,
        forces_mode="dense",
    )
    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.random((512, 2)).astype(np.float32) * 0.9 + 0.05)
    vel = jnp.asarray((rng.random((512, 2)).astype(np.float32) - 0.5))
    alive = jnp.asarray(rng.random(512) < 0.9)
    ref = neighbor_forces_dense(
        pos, vel, alive, jnp.zeros_like(pos),
        params.diameter, params.surface_smoothing, params.target_pressure,
        params.ignored_pressure, params.spring_overlap_balance, scene,
    )
    got = _pmajor(scene, params, pos, vel, alive)
    assert int(got.overflow) == 0
    _assert_sums_close(got, ref)


def test_pmajor_spring_matches_cellwise(stirring_cup_config):
    scene, params = _setup(
        stirring_cup_config, forces_mode="cellwise", enable_spring=True
    )
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.random((128, 2)).astype(np.float32) * 0.25 + 0.2)
    vel = jnp.asarray((rng.random((128, 2)).astype(np.float32) - 0.5))
    alive = jnp.asarray(rng.random(128) < 0.9)
    ref = neighbor_forces_cellwise(
        pos, vel, alive, jnp.zeros_like(pos),
        params.diameter, params.surface_smoothing, params.target_pressure,
        params.ignored_pressure, params.spring_overlap_balance, scene,
    )
    got = _pmajor(scene, params, pos, vel, alive)
    _assert_sums_close(
        got, ref,
        fields=("p_i", "dv_tension", "pressure_real", "spring_real",
                "visc_vsum", "nbr_cnt"),
    )


def test_pmajor_chunk_size_equivalence(stirring_cup_config):
    """Bigger self-chunks (pmajor_cs) amortize the window span but must
    compute the identical pair sums: cs=256/512 vs cs=128 vs the dense
    oracle on the over-capacity blob + sparse spray + spring scenes, with
    the scaled window budget keeping overflow at 0."""
    scene, params = _setup(
        stirring_cup_config, capacity=256, max_particles=256,
        forces_mode="dense", cell_capacity=8, enable_spring=True,
    )
    rng = np.random.default_rng(7)
    diam = float(np.asarray(params.diameter))
    blob = jnp.asarray(
        (rng.random((256, 2)).astype(np.float32) * 2.0 + 20.0) * diam
    )
    spray = jnp.asarray(
        rng.random((256, 2)).astype(np.float32) * 0.9 + 0.05
    )
    vel = jnp.asarray((rng.random((256, 2)).astype(np.float32) - 0.5))
    alive = jnp.asarray(rng.random(256) < 0.9)
    for pos in (blob, spray):
        base = _pmajor(
            scene, params, pos, vel, alive, noise_amp=0.01, tick=4, cs=128
        )
        for cs in (256, 512):
            got = _pmajor(
                scene, params, pos, vel, alive, noise_amp=0.01, tick=4,
                cs=cs,
            )
            assert int(got.overflow) == 0
            # Same pairs, same jitter; only f32 addition order differs.
            _assert_sums_close(
                got, base, rtol=1e-4, atol=1e-5,
                fields=("p_i", "dv_tension", "pressure_real",
                        "spring_real", "visc_vsum", "nbr_cnt"),
            )


def test_pmsub_matches_dense_and_lane(stirring_cup_config, monkeypatch):
    """The sublane-window kernel (SAND_CRATE_PMSUB=1, _pms_kernel) must
    reproduce the dense oracle in the same regimes the lane kernel is
    gated on: over-capacity blobs (no-cap guarantee), row-spanning sparse
    spray, dead-particle mix, and the spring term."""
    monkeypatch.setenv("SAND_CRATE_PMSUB", "1")
    jax.clear_caches()
    try:
        # Over-capacity blob: exact no-cap pair sums, zero overflow.
        scene, params = _setup(
            stirring_cup_config, capacity=256, max_particles=256,
            forces_mode="dense", cell_capacity=8,
        )
        rng = np.random.default_rng(7)
        diam = float(np.asarray(params.diameter))
        pos = jnp.asarray(
            (rng.random((256, 2)).astype(np.float32) * 2.0 + 20.0) * diam
        )
        vel = jnp.asarray((rng.random((256, 2)).astype(np.float32) - 0.5))
        alive = jnp.ones(256, bool)
        ref = neighbor_forces_dense(
            pos, vel, alive, jnp.zeros_like(pos),
            params.diameter, params.surface_smoothing,
            params.target_pressure, params.ignored_pressure,
            params.spring_overlap_balance, scene,
        )
        got = _pmajor(scene, params, pos, vel, alive)
        assert int(got.overflow) == 0
        _assert_sums_close(got, ref, rtol=1e-2, atol=1e-2)

        # Row-spanning sparse spray with dead slots.
        scene2, params2 = _setup(
            stirring_cup_config, capacity=512, max_particles=512,
            forces_mode="dense",
        )
        rng = np.random.default_rng(11)
        pos2 = jnp.asarray(
            rng.random((512, 2)).astype(np.float32) * 0.9 + 0.05
        )
        vel2 = jnp.asarray((rng.random((512, 2)).astype(np.float32) - 0.5))
        alive2 = jnp.asarray(rng.random(512) < 0.9)
        ref2 = neighbor_forces_dense(
            pos2, vel2, alive2, jnp.zeros_like(pos2),
            params2.diameter, params2.surface_smoothing,
            params2.target_pressure, params2.ignored_pressure,
            params2.spring_overlap_balance, scene2,
        )
        got2 = _pmajor(scene2, params2, pos2, vel2, alive2)
        assert int(got2.overflow) == 0
        _assert_sums_close(got2, ref2)

        # Spring + collider noise: must match the lane kernel bit-for-tol
        # (same pre-hashed jitter rides both slabs).
        scene3, params3 = _setup(
            stirring_cup_config, forces_mode="cellwise", enable_spring=True
        )
        rng = np.random.default_rng(5)
        pos3 = jnp.asarray(
            rng.random((128, 2)).astype(np.float32) * 0.25 + 0.2
        )
        vel3 = jnp.asarray((rng.random((128, 2)).astype(np.float32) - 0.5))
        alive3 = jnp.asarray(rng.random(128) < 0.9)
        sub = _pmajor(
            scene3, params3, pos3, vel3, alive3, noise_amp=0.02, tick=9
        )
        monkeypatch.delenv("SAND_CRATE_PMSUB")
        jax.clear_caches()
        lane = _pmajor(
            scene3, params3, pos3, vel3, alive3, noise_amp=0.02, tick=9
        )
        _assert_sums_close(
            sub, lane, rtol=1e-5, atol=1e-6,
            fields=("p_i", "dv_tension", "pressure_real", "spring_real",
                    "visc_vsum", "nbr_cnt"),
        )
    finally:
        jax.clear_caches()


def test_pmajor_small_w_overflow_counted(stirring_cup_config):
    """A deliberately too-small static W loses candidates, and the loss is
    counted into the overflow channel (the honest degradation contract)."""
    scene, params = _setup(
        stirring_cup_config, capacity=256, max_particles=256,
        forces_mode="dense", cell_capacity=8,
    )
    rng = np.random.default_rng(13)
    diam = float(np.asarray(params.diameter))
    # 256 particles inside ~2x2 cells: window need ~256 > w=128.
    pos = jnp.asarray(
        (rng.random((256, 2)).astype(np.float32) * 2.0 + 20.0) * diam
    )
    vel = jnp.asarray((rng.random((256, 2)).astype(np.float32) - 0.5))
    alive = jnp.ones(256, bool)
    static_small = _pmajor(scene, params, pos, vel, alive, w=128)
    assert int(static_small.overflow) > 0  # fixed W=128 drops candidates


def test_merge_positions_matches_searchsorted():
    """_merge_positions (the two-sort searchsorted that computes the window
    offsets ~4x cheaper than XLA's binary-search while loop at 1M) must be
    bit-exact against searchsorted 'left' semantics, including ties on both
    sides, boundary queries, and the dead-particle constant tail."""
    from sand_crate_tpu.ops.pmajor import _merge_positions

    rng = np.random.default_rng(0)

    def check(sv, q):
        got = np.asarray(
            _merge_positions(jnp.asarray(sv), jnp.asarray(q))
        )
        np.testing.assert_array_equal(
            got, np.searchsorted(sv, q, side="left")
        )

    # random with heavy ties (realistic: cell occupancy > 1)
    for P, Q, hi in [(1000, 200, 50), (4096, 777, 4096)]:
        check(
            np.sort(rng.integers(0, hi, P).astype(np.int32)),
            rng.integers(0, hi, Q).astype(np.int32),
        )
    # all-equal data; queries at/below/above the value
    check(np.full(512, 7, np.int32), np.array([6, 7, 8, 0, 100], np.int32))
    # massive query ties
    check(
        np.sort(rng.integers(0, 10, 2048).astype(np.int32)),
        np.repeat(np.arange(0, 11, dtype=np.int32), 37),
    )
    # exact boundary hits at both extremes
    check(
        np.arange(0, 5000, 3, dtype=np.int32),
        np.array([0, 1, 2, 3, 4997, 4998, 4999, 5000], np.int32),
    )
    # dead-particle pattern: long constant tail at NC
    NC = 1536 * 1536
    sv = np.concatenate(
        [np.sort(rng.integers(0, NC, 9000)), np.full(3000, NC)]
    ).astype(np.int32)
    check(sv, np.clip(rng.integers(-1, NC + 2, 5000), 0, NC).astype(np.int32))


def test_pmajor_noise_deterministic_per_tick(stirring_cup_config):
    scene, params = _setup(stirring_cup_config, forces_mode="cellwise")
    rng = np.random.default_rng(9)
    pos = jnp.asarray(rng.random((128, 2)).astype(np.float32) * 0.2 + 0.3)
    vel = jnp.zeros((128, 2), jnp.float32)
    alive = jnp.ones(128, bool)
    amp = float(np.asarray(params.diameter)) * 0.1
    a1 = _pmajor(scene, params, pos, vel, alive, noise_amp=amp, tick=4)
    a2 = _pmajor(scene, params, pos, vel, alive, noise_amp=amp, tick=4)
    b = _pmajor(scene, params, pos, vel, alive, noise_amp=amp, tick=5)
    np.testing.assert_array_equal(
        np.asarray(a1.dv_tension), np.asarray(a2.dv_tension)
    )
    assert np.abs(np.asarray(a1.dv_tension) - np.asarray(b.dv_tension)).max() > 0


def test_pmajor_step_trajectory_matches_cellwise(stirring_cup_config):
    """Full sorted-state physics.step with forces_mode=pmajor vs cellwise:
    same trajectory (noise off) over 20 ticks."""
    from sand_crate_tpu.engine import Crate

    cfg = copy.deepcopy(stirring_cup_config)
    cfg.world_config.coefficients["collider_noise_level"] = 0.0
    cfg.world_config.coefficients["max_particles"] = 200
    ca = Crate(cfg.world_config, forces_mode="cellwise")
    cb = Crate(cfg.world_config, forces_mode="pmajor")
    ca.run(20)
    cb.run(20)
    # uid-align both states (the sorted-state step permutes slots).
    ia = np.argsort(np.asarray(ca.state.uid))
    ib = np.argsort(np.asarray(cb.state.uid))
    aa = np.asarray(ca.state.alive)[ia]
    ab = np.asarray(cb.state.alive)[ib]
    np.testing.assert_array_equal(aa, ab)
    m = aa
    np.testing.assert_allclose(
        np.asarray(ca.state.pos)[ia][m], np.asarray(cb.state.pos)[ib][m],
        rtol=2e-3, atol=2e-4,
    )


def test_pmajor_fold_pairs_equivalence(stirring_cup_config):
    """Scene.fold_pairs merges tension + pa*pressure into ONE pass-B
    accumulator (via the (1+pa)-prescaled cell-pressure slab row): the
    folded dv_tension must equal the split sums combined, and every other
    channel must be bitwise identical (same pass-A program)."""
    scene, params = _setup(stirring_cup_config, forces_mode="pmajor")
    assert scene.fold_pairs  # production default: pmajor, no spring
    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.random((128, 2)).astype(np.float32) * 0.3 + 0.1)
    vel = jnp.asarray((rng.random((128, 2)).astype(np.float32) - 0.5) * 2.0)
    alive = jnp.asarray(rng.random(128) < 0.75)
    split = _pmajor(scene, params, pos, vel, alive)
    folded = _pmajor(
        scene, params, pos, vel, alive,
        pressure_amplifier=params.pressure_amplifier,
    )
    pa = float(np.asarray(params.pressure_amplifier))
    np.testing.assert_allclose(
        np.asarray(folded.dv_tension),
        np.asarray(split.dv_tension) + pa * np.asarray(split.pressure_real),
        rtol=1e-5,
        atol=1e-6,
    )
    assert np.all(np.asarray(folded.pressure_real) == 0.0)
    np.testing.assert_array_equal(
        np.asarray(folded.p_i), np.asarray(split.p_i)
    )
    np.testing.assert_array_equal(
        np.asarray(folded.visc_vsum), np.asarray(split.visc_vsum)
    )
    np.testing.assert_array_equal(
        np.asarray(folded.nbr_cnt), np.asarray(split.nbr_cnt)
    )


def test_pmajor_symm_matches_nonsymm(stirring_cup_config):
    """Symmetric pair halving (scene.pmajor_symm) with noise=0 must equal
    the two-sided kernel: same pairs, same math, computed once and staged
    back via the j-side merge."""
    scene, params = _setup(
        stirring_cup_config, forces_mode="pmajor", pmajor_symm=False
    )
    scene_s = _setup(
        stirring_cup_config, forces_mode="pmajor", pmajor_symm=True
    )[0]
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.random((128, 2)).astype(np.float32) * 0.3 + 0.1)
    vel = jnp.asarray((rng.random((128, 2)).astype(np.float32) - 0.5) * 2.0)
    alive = jnp.asarray(rng.random(128) < 0.75)
    ref = _pmajor(scene, params, pos, vel, alive)
    got = _pmajor(scene_s, params, pos, vel, alive)
    assert int(got.overflow) == 0
    _assert_sums_close(got, ref, rtol=1e-5, atol=1e-5)


def test_pmajor_symm_dense_blob(stirring_cup_config):
    """Symm on the >cell_capacity blob: the gid>self restriction plus the
    j-side merge must still produce every pair exactly once (vs dense)."""
    scene, params = _setup(
        stirring_cup_config, capacity=256, max_particles=256,
        forces_mode="dense", cell_capacity=8,
    )
    scene_s = _setup(
        stirring_cup_config, capacity=256, max_particles=256,
        forces_mode="pmajor", pmajor_symm=True,
    )[0]
    rng = np.random.default_rng(7)
    diam = float(np.asarray(params.diameter))
    pos = jnp.asarray(
        (rng.random((256, 2)).astype(np.float32) * 2.0 + 20.0) * diam
    )
    vel = jnp.asarray((rng.random((256, 2)).astype(np.float32) - 0.5))
    alive = jnp.ones(256, bool)
    ref = neighbor_forces_dense(
        pos, vel, alive, jnp.zeros_like(pos),
        params.diameter, params.surface_smoothing, params.target_pressure,
        params.ignored_pressure, params.spring_overlap_balance, scene,
    )
    got = _pmajor(scene_s, params, pos, vel, alive)
    assert int(got.overflow) == 0
    _assert_sums_close(got, ref, rtol=1e-2, atol=1e-2)


def test_pmajor_symm_spring_and_fold(stirring_cup_config):
    """Symm composes with the spring split sums and with fold_pairs."""
    scene, params = _setup(
        stirring_cup_config, forces_mode="pmajor", enable_spring=True,
        pmajor_symm=False,
    )
    scene_s = _setup(
        stirring_cup_config, forces_mode="pmajor", enable_spring=True,
        pmajor_symm=True,
    )[0]
    rng = np.random.default_rng(9)
    pos = jnp.asarray(rng.random((128, 2)).astype(np.float32) * 0.3 + 0.1)
    vel = jnp.asarray((rng.random((128, 2)).astype(np.float32) - 0.5))
    alive = jnp.asarray(rng.random(128) < 0.8)
    ref = _pmajor(scene, params, pos, vel, alive)
    got = _pmajor(scene_s, params, pos, vel, alive)
    _assert_sums_close(
        got, ref,
        fields=("p_i", "dv_tension", "pressure_real", "spring_real",
                "visc_vsum", "nbr_cnt"),
        rtol=1e-5, atol=1e-5,
    )
    # fold + symm (no spring): folded dv_tension == split combination.
    scene_f = _setup(stirring_cup_config, forces_mode="pmajor",
                     pmajor_symm=True)[0]
    assert scene_f.fold_pairs
    split = _pmajor(scene_f, params, pos, vel, alive)
    folded = _pmajor(scene_f, params, pos, vel, alive,
                     pressure_amplifier=params.pressure_amplifier)
    pa = float(np.asarray(params.pressure_amplifier))
    np.testing.assert_allclose(
        np.asarray(folded.dv_tension),
        np.asarray(split.dv_tension) + pa * np.asarray(split.pressure_real),
        rtol=1e-5, atol=1e-5,
    )


def test_pmajor_symm_noise_conserves_momentum(stirring_cup_config):
    """With symm, collider noise is pair-antisymmetric (both sides
    jittered), so pair forces stay exactly equal-and-opposite: the alive
    sum of tension+pressure pair kicks vanishes even with noise ON — a
    physics improvement over the reference's one-sided jitter
    (crate.py:168-170), whose noise injects net momentum."""
    scene_s = _setup(
        stirring_cup_config, forces_mode="pmajor", pmajor_symm=True
    )[0]
    _, params = _setup(stirring_cup_config, forces_mode="pmajor")
    rng = np.random.default_rng(13)
    diam = float(np.asarray(params.diameter))
    pos = jnp.asarray(
        (rng.random((128, 2)).astype(np.float32) * 4.0 + 30.0) * diam
    )
    vel = jnp.zeros((128, 2), jnp.float32)
    alive = jnp.ones(128, bool)
    got = _pmajor(scene_s, params, pos, vel, alive, noise_amp=0.3 * diam,
                  tick=17)
    # Normal-direction pair sums are antisymmetric per pair: alive sums
    # cancel to f32 rounding.
    t_sum = np.abs(np.asarray(got.dv_tension).sum(axis=0))
    p_sum = np.abs(np.asarray(got.pressure_real).sum(axis=0))
    t_mag = np.abs(np.asarray(got.dv_tension)).max()
    p_mag = np.abs(np.asarray(got.pressure_real)).max()
    assert t_sum.max() <= 2e-4 * max(t_mag, 1.0), (t_sum, t_mag)
    assert p_sum.max() <= 2e-4 * max(p_mag, 1.0), (p_sum, p_mag)
