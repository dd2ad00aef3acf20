"""Batched crates: stacked params, grid sweeps, vmapped stepping.

The reference's 48-variant sweep runs sequentially (main.py:21-36); here
variants advance in lockstep as one vmapped scan (BASELINE.json config #5).
Shrunk shapes keep the CPU-mesh compile fast.
"""

import copy

import jax
import numpy as np
import pytest

from sand_crate_tpu.state import Params
from sand_crate_tpu.sweep import (
    BatchedCrates,
    grid_params,
    random_params,
    stack_params,
)


@pytest.fixture()
def small_config(stirring_cup_config):
    config = copy.deepcopy(stirring_cup_config)
    config.world_config.coefficients["max_particles"] = 32
    return config


def test_grid_params_cartesian_product(small_config):
    base = Params.from_coefficients(small_config.world_config.coefficients)
    options = {"viscosity": [4.0, 8.0], "target_pressure": [-5.0, -2.0, 2.0]}
    batched = grid_params(base, options)
    assert batched.viscosity.shape == (6,)
    np.testing.assert_allclose(
        np.asarray(batched.viscosity), [4, 4, 4, 8, 8, 8]
    )
    np.testing.assert_allclose(
        np.asarray(batched.target_pressure), [-5, -2, 2, -5, -2, 2]
    )
    # untouched coefficients replicate
    np.testing.assert_allclose(
        np.asarray(batched.dt), [float(base.dt)] * 6
    )


def test_random_params_within_ranges(small_config):
    base = Params.from_coefficients(small_config.world_config.coefficients)
    ranges = {"viscosity": (2.0, 10.0)}
    batched = random_params(jax.random.key(0), base, ranges, n=16)
    v = np.asarray(batched.viscosity)
    assert v.shape == (16,)
    assert (v >= 2.0).all() and (v <= 10.0).all()
    assert len(np.unique(v)) > 1


def test_batched_crates_step_differ_by_params(small_config):
    base = Params.from_coefficients(small_config.world_config.coefficients)
    batched = grid_params(base, {"pressure_amplifier": [5.0, 80.0]})
    crates = BatchedCrates(small_config, batched, capacity=64)
    crates.run(8)
    counts = crates.particle_counts()
    assert counts.shape == (2,)
    assert (counts > 0).all()
    pos = crates.positions()
    assert pos.shape[0] == 2
    # Different pressure amplifiers must diverge the trajectories.
    assert not np.allclose(pos[0], pos[1])
    assert np.isfinite(pos).all()


def test_run_datagen_writes_shards_and_params(tmp_path, small_config):
    from sand_crate_tpu.recording import load_trajectory, trajectory_info
    from sand_crate_tpu.sweep import run_datagen

    out = run_datagen(
        small_config,
        n_crates=3,
        ticks=20,
        sample_every=10,
        out_dir=tmp_path / "dg",
        seed=1,
    )
    assert out["frames"] == 2 and out["crates"] == 3
    info = trajectory_info(tmp_path / "dg")
    assert info["frames"] == 2
    assert info["meta"] == {"crates": 3, "sample_every": 10}
    frames = list(load_trajectory(tmp_path / "dg"))
    assert frames[0]["pos"].shape[0] == 3  # leading crate axis
    params = np.load(tmp_path / "dg" / "params.npz")
    assert params["viscosity"].shape == (3,)
    assert len(np.unique(params["viscosity"])) == 3  # randomized per crate
