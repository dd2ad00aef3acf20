"""Coverage for the batched-mesh sharding path (parallel.py) + driver dryrun.

This is the exact path the driver's multichip check exercises
(__graft_entry__.dryrun_multichip): the reference has no parallelism
(SURVEY.md section 2), so the contract under test is purely the TPU-native
design — vmap(step) over crates with explicit NamedShardings on every leaf,
on the virtual 8-device CPU mesh that conftest provisions.
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding

from sand_crate_tpu.parallel import (
    make_mesh,
    shard_batched,
    sharded_batched_step,
)
from sand_crate_tpu.scene import build_scene, init_state
from sand_crate_tpu.state import Params
from sand_crate_tpu.sweep import stack_params, stack_states


@pytest.fixture(scope="module")
def batched_setup(request):
    config = request.getfixturevalue("stirring_cup_config")
    world = config.world_config
    world.coefficients = dict(world.coefficients)
    world.coefficients["max_particles"] = 64
    scene = build_scene(world, capacity=128, forces_mode="cellwise")
    mesh = make_mesh(8)
    n_batch = mesh.shape["crates"] * 2
    base = Params.from_coefficients(world.coefficients)
    params = stack_params([base] * n_batch)
    states = stack_states([init_state(world, scene, seed=i) for i in range(n_batch)])
    return scene, mesh, states, params


def test_make_mesh_shape():
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"crates": 4, "space": 2}
    assert mesh.devices.size == 8
    # odd device counts collapse the space axis
    mesh3 = make_mesh(3)
    assert dict(mesh3.shape) == {"crates": 3, "space": 1}


def test_shard_batched_places_every_leaf(batched_setup):
    scene, mesh, states, params = batched_setup
    with mesh:
        sh_states, sh_params, (s_sh, p_sh) = shard_batched(mesh, states, params)
    for leaf, sh in zip(jax.tree.leaves(sh_states), jax.tree.leaves(s_sh)):
        assert isinstance(leaf.sharding, NamedSharding)
        assert leaf.sharding.spec == sh.spec
    for leaf in jax.tree.leaves(sh_params):
        assert isinstance(leaf.sharding, NamedSharding)


def test_sharded_batched_step_executes_and_preserves_sharding(batched_setup):
    scene, mesh, states, params = batched_setup
    with mesh:
        sh_states, sh_params, (s_sh, _) = shard_batched(mesh, states, params)
        step_fn = sharded_batched_step(mesh, scene, donate=False)
        new_states, diag = step_fn(sh_states, sh_params)
        jax.block_until_ready(new_states.pos)
    assert new_states.pos.shape == states.pos.shape
    assert new_states.pos.sharding.spec == s_sh.pos.spec
    assert np.isfinite(np.asarray(new_states.pos)[np.asarray(new_states.alive)]).all()
    # every crate advanced one tick
    assert (np.asarray(new_states.tick) == np.asarray(states.tick) + 1).all()


def test_sharded_step_matches_unsharded_vmap(batched_setup):
    """The mesh-sharded step must be numerically identical to plain vmap."""
    from sand_crate_tpu.physics import step

    scene, mesh, states, params = batched_setup
    ref_states, _ = jax.jit(
        jax.vmap(lambda s, p: step(s, p, scene))
    )(states, params)
    with mesh:
        sh_states, sh_params, _ = shard_batched(mesh, states, params)
        step_fn = sharded_batched_step(mesh, scene, donate=False)
        new_states, _ = step_fn(sh_states, sh_params)
    np.testing.assert_allclose(
        np.asarray(new_states.pos), np.asarray(ref_states.pos), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_states.vel), np.asarray(ref_states.vel), atol=1e-6
    )


def test_driver_dryrun_multichip():
    """The function the driver actually runs must pass on the CPU mesh."""
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
