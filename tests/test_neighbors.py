"""Neighbor search property tests (port of the intent of the reference's
tests/test_distance.py:28-70 against the cell-list implementation)."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from sand_crate_tpu.neighbors import build_cell_table, cell_ids, neighbor_list
from sand_crate_tpu.state import Scene


def make_scene(capacity, cell_size, max_neighbors=20, cell_capacity=16, extent=40.0):
    """Minimal Scene for neighbor tests on an [0, extent]^2 domain."""
    nx = int(np.ceil(extent / cell_size)) + 3
    z = jnp.zeros
    return Scene(
        segments0=z((1, 2, 2)),
        seg_body=z((1,), jnp.int32),
        seg_valid=jnp.zeros((1,), bool),
        body_kind=z((1,), jnp.int32),
        body_center=z((1, 2)),
        motor_lin=z((1, 2, 4)),
        motor_ang=z((1, 4)),
        init_lin_vel=z((1, 2)),
        init_ang_vel=z((1,)),
        src_position=z((1, 2)),
        src_velocity=z((1, 2)),
        src_radius=z((1,)),
        src_flow=z((1,)),
        src_noise=z((1,)),
        src_active_ticks=z((1,), jnp.int32),
        capacity=capacity,
        num_bodies=1,
        num_sources=0,
        max_neighbors=max_neighbors,
        cell_size=float(cell_size),
        grid_nx=nx,
        grid_ny=nx,
        cell_capacity=cell_capacity,
        max_spawn=8,
    )


def neighbors_of(pos, diameter, **kwargs):
    pos = np.asarray(pos, np.float32)
    n = len(pos)
    scene = make_scene(n, cell_size=diameter, **kwargs)
    nbr = neighbor_list(
        jnp.asarray(pos), jnp.ones(n, bool), jnp.asarray(diameter, jnp.float32), scene
    )
    idx, mask = np.asarray(nbr.idx), np.asarray(nbr.mask)
    return [set(idx[i][mask[i]].tolist()) for i in range(n)], int(nbr.overflow)


@pytest.mark.parametrize("diameter,min_n,max_n", [(0.5, 0, 0), (1.0, 1, 2), (2.0, 2, 4)])
def test_row_neighbors(diameter, min_n, max_n):
    """Particles on an integer row (reference tests/test_distance.py:38-48)."""
    pos = np.array([[i, 0.0] for i in range(35)])
    nbrs, overflow = neighbors_of(pos, diameter)
    assert overflow == 0
    counts = [len(s) for s in nbrs]
    assert min(counts) == min_n and max(counts) == max_n
    for i, s in enumerate(nbrs):
        for j in s:
            assert abs(i - j) <= diameter


@pytest.mark.parametrize("diameter,min_n,max_n", [(0.5, 0, 0), (1.0, 2, 4), (2.0, 5, 12)])
def test_grid_neighbors(diameter, min_n, max_n):
    """Integer grid (reference tests/test_distance.py:51-58)."""
    side = 12
    pos = np.array(list(itertools.product(range(side), range(side))), float)
    nbrs, overflow = neighbors_of(pos, diameter)
    assert overflow == 0
    counts = [len(s) for s in nbrs]
    assert min(counts) == min_n and max(counts) == max_n


def test_random_points_match_bruteforce():
    """Every within-diameter pair found, none beyond (stronger than the
    reference's 3x-diameter envelope check, tests/test_distance.py:61-70)."""
    rng = np.random.default_rng(0)
    pos = rng.random((200, 2)).astype(np.float32)
    diameter = 0.1
    nbrs, _ = neighbors_of(pos, diameter, cell_capacity=64)
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    expect = (d <= diameter) & ~np.eye(len(pos), dtype=bool)
    for i in range(len(pos)):
        want = set(np.where(expect[i])[0].tolist())
        if len(want) <= 20:
            assert nbrs[i] == want, i
        else:  # capped: the K kept must all be true neighbors
            assert nbrs[i] <= want and len(nbrs[i]) == 20


def test_symmetry_below_cap():
    rng = np.random.default_rng(1)
    pos = rng.random((100, 2)).astype(np.float32)
    nbrs, _ = neighbors_of(pos, 0.08, cell_capacity=64)
    for i, s in enumerate(nbrs):
        for j in s:
            assert i in nbrs[j]


def test_dead_particles_excluded():
    pos = np.array([[0.5, 0.5], [0.505, 0.5], [0.51, 0.5]], np.float32)
    scene = make_scene(3, cell_size=0.02, extent=1.0)
    alive = jnp.array([True, False, True])
    nbr = neighbor_list(jnp.asarray(pos), alive, jnp.asarray(0.02, jnp.float32), scene)
    idx, mask = np.asarray(nbr.idx), np.asarray(nbr.mask)
    assert set(idx[0][mask[0]]) == {2}
    assert not mask[1].any()  # dead particle has no neighbors itself


def test_overflow_counting():
    """More coincident particles than cell capacity -> overflow reported."""
    pos = np.full((10, 2), 0.5, np.float32)
    scene = make_scene(10, cell_size=0.1, cell_capacity=4, extent=1.0)
    cid = cell_ids(jnp.asarray(pos), jnp.ones(10, bool), scene)
    _, overflow = build_cell_table(cid, scene)
    assert int(overflow) == 6


def test_nearest_kept_when_capped():
    """With K smaller than the true neighbor count, the nearest are kept."""
    pos = np.array([[0.5 + 0.001 * i, 0.5] for i in range(10)], np.float32)
    n = len(pos)
    scene = make_scene(n, cell_size=0.05, max_neighbors=3, cell_capacity=16, extent=1.0)
    nbr = neighbor_list(jnp.asarray(pos), jnp.ones(n, bool), jnp.asarray(0.05, jnp.float32), scene)
    idx, mask = np.asarray(nbr.idx), np.asarray(nbr.mask)
    assert mask[0].sum() == 3
    assert set(idx[0][mask[0]]) == {1, 2, 3}  # the three closest to particle 0
