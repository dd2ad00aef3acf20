"""Compiled-kernel smoke test on real TPU hardware.

The CI suite runs the Pallas kernels in interpret mode on the CPU mesh
(conftest forces the CPU backend), so Mosaic-compiled numerics are only
exercised by benches.  This marker test runs a short trajectory with the
compiled pallas backend against the XLA cellwise backend on the chip and
must be run manually before benching (see .claude/skills/verify/SKILL.md):

    python -m pytest tests/test_tpu_smoke.py -q --no-header -p no:cacheprovider

It self-skips off-TPU (including under the suite's CPU conftest).
"""

import numpy as np
import pytest


@pytest.mark.tpu
def test_pallas_vs_cellwise_trajectory_on_tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("requires a real TPU backend")

    import copy

    from sand_crate_tpu import load_config
    from sand_crate_tpu.physics import step
    from sand_crate_tpu.scene import build_all

    config = load_config("configs/dam_break.yaml")
    config = copy.deepcopy(config)
    w = config.world_config
    w.coefficients = dict(w.coefficients)
    w.coefficients["collider_noise_level"] = 0.0  # in-kernel noise hash differs
    w.coefficients["max_particles"] = 20_000
    w.initial_particles[0].spacing = 0.006
    w.initial_particles[0].jitter = 0.3

    results = {}
    for mode in ("pallas", "pmajor", "cellwise"):
        scene, state, params = build_all(config, forces_mode=mode)
        stepf = jax.jit(lambda s, p, sc=scene: step(s, p, sc))
        diag = None
        for _ in range(30):
            state, diag = stepf(state, params)
        results[mode] = (
            np.asarray(state.pos),
            np.asarray(state.vel),
            np.asarray(state.alive),
            int(np.asarray(diag.neighbor_overflow)),
        )

    pos_c, vel_c, alive_c, ov_c = results["cellwise"]
    # Mosaic-compiled float ops may round differently from XLA (rsqrt vs
    # sqrt+div, fused madds); 30 chaotic ticks amplify it.  The gate is
    # against *kernel bugs*, which produce O(diameter)+ errors, not ulps.
    tol = 2e-4  # ~1/3 diameter at this spacing would be 2e-3
    for mode in ("pallas", "pmajor"):
        pos_p, vel_p, alive_p, ov_p = results[mode]
        np.testing.assert_array_equal(alive_p, alive_c, err_msg=mode)
        if mode == "pallas":
            assert ov_p == ov_c  # same cap accounting scheme
        else:
            assert ov_p == 0  # p-major: full window coverage here
        np.testing.assert_allclose(
            pos_p[alive_p], pos_c[alive_c], atol=tol, err_msg=mode
        )
        np.testing.assert_allclose(
            vel_p[alive_p], vel_c[alive_c], atol=2e-2, err_msg=mode
        )
