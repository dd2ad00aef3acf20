"""Geometry kernels: analytic cases (port of the intent of
/root/reference/tests/test_distance.py plus CCD geometry specs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sand_crate_tpu import geometry as geo

P_COUNT = 35
S_COUNT = 5


def test_point_segment_distance_grid():
    """Vertical unit segments at x=0..4; points on the x axis (reference
    tests/test_distance.py:16-25 re-expressed)."""
    p = jnp.array([[i, 0.0] for i in range(P_COUNT)])
    segments = jnp.array([[[i, -1.0], [i, 1.0]] for i in range(S_COUNT)])
    nearest, dist = geo.points_to_segments(p, segments)
    assert dist.shape == (P_COUNT, S_COUNT)
    expected = np.abs(np.arange(P_COUNT)[:, None] - np.arange(S_COUNT)[None, :])
    np.testing.assert_allclose(np.asarray(dist), expected, atol=1e-6)
    # nearest point is the clamped projection
    np.testing.assert_allclose(np.asarray(nearest[3, 1]), [1.0, 0.0], atol=1e-6)


def test_point_segment_distance_clamping():
    seg = jnp.array([[[0.0, 0.0], [1.0, 0.0]]])
    p = jnp.array([[2.0, 1.0], [0.5, 0.5], [-3.0, 4.0]])
    nearest, dist = geo.points_to_segments(p, seg)
    np.testing.assert_allclose(np.asarray(dist[:, 0]), [np.sqrt(2), 0.5, 5.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(nearest[0, 0]), [1.0, 0.0], atol=1e-6)


def test_rot90_cw_and_cross():
    v = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(geo.rot90_cw(v)), [[0, -1], [1, 0]])
    assert float(geo.cross2(jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]))) == 1.0


def test_pad_segments_offsets():
    seg = jnp.array([[[0.0, 0.0], [1.0, 0.0]]])
    padded = geo.pad_segments(seg, jnp.asarray(0.1))
    assert padded.shape == (2, 2, 2)
    # clockwise normal of +x direction is (0, -1): near side at y=-0.1
    np.testing.assert_allclose(np.asarray(padded[0]), [[0, -0.1], [1, -0.1]], atol=1e-6)
    # far side reversed at y=+0.1
    np.testing.assert_allclose(np.asarray(padded[1]), [[1, 0.1], [0, 0.1]], atol=1e-6)


def test_segment_crossings_direction_filter():
    """A falling particle crosses the near padded side but not the far one."""
    wall = jnp.array([[[0.0, 1.0], [1.0, 1.0]]])  # floor at y=1, +x direction
    padded = geo.pad_segments(wall, jnp.asarray(0.1))
    # near padded side sits at y=0.9, far side at y=1.1 (reversed direction)
    move_down = jnp.array([[[0.5, 0.7], [0.5, 1.0]]])  # crosses y=0.9 going +y
    move_away = jnp.array([[[0.5, 1.0], [0.5, 0.7]]])  # same path, leaving
    move_up = jnp.array([[[0.5, 1.25], [0.5, 0.95]]])  # crosses y=1.1 going -y
    down = np.asarray(geo.segment_crossings(move_down, padded))
    away = np.asarray(geo.segment_crossings(move_away, padded))
    up = np.asarray(geo.segment_crossings(move_up, padded))
    assert down[0, 0] and not down[0, 1]  # near side blocks approach from above
    assert not away.any()  # leaving is never a crossing
    assert up[0, 1] and not up[0, 0]  # far side blocks approach from below


def test_crossing_parameter_analytic():
    start = jnp.array([[0.5, 0.0]])
    delta = jnp.array([[0.0, 1.0]])  # moves from y=0 to y=1
    wall_a = jnp.array([[0.0, 0.25]])
    wall_ab = jnp.array([[1.0, 0.0]])
    t = geo.crossing_parameter(start, delta, wall_a, wall_ab)
    assert float(t[0]) == pytest.approx(0.25)


def test_crossing_parameter_parallel_is_finite():
    t = geo.crossing_parameter(
        jnp.array([[0.0, 0.0]]),
        jnp.array([[1.0, 0.0]]),
        jnp.array([[0.0, 1.0]]),
        jnp.array([[1.0, 0.0]]),
    )
    assert np.isfinite(np.asarray(t)).all()


def test_safe_normalize_zero_vector():
    unit, norm = geo.safe_normalize(jnp.zeros((3, 2)))
    assert np.isfinite(np.asarray(unit)).all()
    np.testing.assert_allclose(np.asarray(norm), 0.0)


def test_soa_forms_match_aos():
    """The SoA (S, P)-layout twins must match the AoS forms bit-for-bit."""
    rng = np.random.default_rng(0)
    P, S = 257, 13
    pts = rng.random((P, 2)).astype(np.float32)
    segs = rng.random((S, 2, 2)).astype(np.float32)

    near, dist = geo.points_to_segments(jnp.array(pts), jnp.array(segs))
    nx, ny, dist2 = geo.points_to_segments_soa(
        jnp.array(pts[:, 0]), jnp.array(pts[:, 1]), jnp.array(segs)
    )
    np.testing.assert_array_equal(np.asarray(near[:, :, 0]).T, np.asarray(nx))
    np.testing.assert_array_equal(np.asarray(near[:, :, 1]).T, np.asarray(ny))
    np.testing.assert_array_equal(np.asarray(dist).T, np.asarray(dist2))

    mv = (rng.random((P, 2)).astype(np.float32) - 0.5) * 0.3
    move = np.stack([pts, pts + mv], axis=1)
    cross_aos = geo.segment_crossings(jnp.array(move), jnp.array(segs))
    t_aos = geo.crossing_parameter(
        jnp.array(pts[:, None, :]),
        jnp.array(mv[:, None, :]),
        jnp.array(segs[None, :, 0, :]),
        jnp.array(segs[None, :, 1, :] - segs[None, :, 0, :]),
    )
    cross_soa, t_soa = geo.segment_crossings_soa(
        jnp.array(pts[:, 0]),
        jnp.array(pts[:, 1]),
        jnp.array(mv[:, 0]),
        jnp.array(mv[:, 1]),
        jnp.array(segs),
    )
    assert int(np.asarray(cross_aos).sum()) > 0  # the case exercises crossings
    np.testing.assert_array_equal(np.asarray(cross_aos).T, np.asarray(cross_soa))
    hit = np.asarray(cross_soa)
    np.testing.assert_array_equal(
        np.asarray(t_aos).T[hit], np.asarray(t_soa)[hit]
    )
