"""The code paths docs/GUIDE.md §6 demonstrates, kept runnable.

Mirrors the guide's Python-API snippets (scaled down where the guide uses
production sizes) so the documentation cannot rot against the API.
"""

import jax
import numpy as np

from sand_crate_tpu import load_config
from sand_crate_tpu.engine import Crate


def test_guide_crate_snippet(stirring_cup_config):
    crate = Crate(stirring_cup_config.world_config)
    crate.physics_tick()
    crate.run(10)
    assert crate.particles.shape[1] == 2
    assert crate.particle_velocities.shape == crate.particles.shape
    assert crate.particles_pressure.shape[0] == crate.particles.shape[0]
    assert crate.segments.ndim == 3

    crate.viscosity *= 1.1  # live edit, no recompile
    assert "viscosity" in crate.editable_coefficients()

    frames = list(crate.stream_frames(num_frames=3, ticks_per_frame=2))
    assert len(frames) == 3 and "pos" in frames[0]


def test_guide_functional_core_snippet(stirring_cup_config):
    from sand_crate_tpu.physics import rollout, step
    from sand_crate_tpu.scene import build_all

    scene, state, params = build_all(stirring_cup_config)
    state, diag = jax.jit(step)(state, params, scene)
    assert int(diag.non_finite) == 0
    state, last_diag = rollout(state, params, scene, num_ticks=5)
    assert int(last_diag.non_finite) == 0
    assert int(state.tick) == 6


def test_guide_batched_snippet(stirring_cup_config):
    from sand_crate_tpu.state import Params
    from sand_crate_tpu.sweep import BatchedCrates, random_params, stack_params

    config = stirring_cup_config
    base = Params.from_coefficients(config.world_config.coefficients)
    params = stack_params([base] * 4)
    batch = BatchedCrates(config, params, seed=0)
    batch.run(5)
    assert batch.positions().shape[0] == 4
    assert len(batch.particle_counts()) == 4

    rnd = random_params(
        jax.random.key(0), base, {"viscosity": (4.0, 8.0)}, n=4
    )
    assert rnd.viscosity.shape == (4,)
    assert np.all(np.asarray(rnd.viscosity) >= 4.0)
