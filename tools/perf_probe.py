"""Probe step throughput at various particle counts on the current backend."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from sand_crate_tpu import Crate, load_config
from sand_crate_tpu.physics import rollout


def dam_break_world(n_target: int):
    cfg = load_config("configs/dam_break.yaml")
    w = cfg.world_config
    w.coefficients = dict(w.coefficients)
    # block area = 0.4 * 0.88; spacing for n_target particles
    area = (0.42 - 0.02) * (0.98 - 0.10)
    spacing = float(np.sqrt(area / n_target))
    blk = w.initial_particles[0]
    blk.spacing = spacing
    w.coefficients["particle_radius"] = spacing * 0.55
    w.coefficients["max_particles"] = int(n_target * 1.05)
    return w


def probe(
    n_target: int, ticks: int = 50, cell_capacity=None, forces_mode="auto",
    pmajor_symm=None,
):
    import os

    if pmajor_symm is None and os.environ.get("SAND_CRATE_PROBE_SYMM"):
        pmajor_symm = os.environ["SAND_CRATE_PROBE_SYMM"] == "1"
    w = dam_break_world(n_target)
    crate = Crate(
        w, cell_capacity=cell_capacity, forces_mode=forces_mode,
        pmajor_symm=pmajor_symm,
    )
    env_split = os.environ.get("SAND_CRATE_PROBE_SPLIT")
    if env_split is not None:
        # A/B the static-prefix tile count (scene.pmajor_split) in bench
        # conditions; the production kernel takes it from the Scene.
        import dataclasses

        object.__setattr__(
            crate, "scene",
            dataclasses.replace(crate.scene, pmajor_split=int(env_split)),
        )
    n = crate.particle_count
    t0 = time.time()
    # Warm up the exact (ticks,) rollout so timing excludes compilation.
    state, diag = rollout(crate.state, crate.params, crate.scene, ticks)
    jax.block_until_ready(state.pos)
    compile_s = time.time() - t0
    t0 = time.time()
    state, diag = rollout(state, crate.params, crate.scene, ticks)
    jax.block_until_ready(state.pos)
    dt_s = time.time() - t0
    sps = ticks / dt_s
    print(
        f"N={n:>9,} capacity={crate.scene.capacity:>9,} grid={crate.scene.grid_nx}^2 "
        f"M={crate.scene.cell_capacity} compile={compile_s:5.1f}s "
        f"steps/s={sps:8.2f} particle-steps/s={sps * n:.3e} "
        f"overflow={int(diag.neighbor_overflow)} maxspeed={float(diag.max_speed):.2f}"
    )
    return sps * n


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    for n in [int(x) for x in sys.argv[1:]] or [10_000, 100_000]:
        probe(n)
