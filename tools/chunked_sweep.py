"""Measure the chunked-backend geometry on-chip: chunk_cs x chunk_halo.

Settles a K-crate wave_machine batch (fixed-halo chunked backend,
ops/chunked.py), then times 20-tick run() chunks for each (cs, halo)
variant against the SAME settled state, reporting ms/tick and the max
per-chunk Diagnostics.neighbor_overflow.  Variant compiles are cheap
(~25s) because only the pass program changes.

Results recorded in docs/perf_1m.md ("Chunk width x halo sweep"): the
sweep cost tracks pair-plane volume (cs + 2*halo per self) plus a
per-iteration overhead; cs=256 / halo=2 packed rows is the lossless
optimum and is the default (state.Scene.chunk_cs, scene.build_scene halo
formula).  Run after any change to the chunked pass structure.

Usage: python tools/chunked_sweep.py [K] [--fill]
  --fill: instead of the settled sweep, run a full 600-tick fill from
  empty at the current defaults and print the per-chunk overflow history
  (the safety gate for halo changes: jets + splash must stay overflow 0).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from sand_crate_tpu import load_config
from sand_crate_tpu.state import Params
from sand_crate_tpu.sweep import BatchedCrates, stack_params

VARIANTS = (
    (128, 640), (256, 640), (512, 640),
    (128, 384), (256, 384), (512, 384),
    (128, 256), (256, 256), (512, 256),
)


def main() -> None:
    K = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64
    cfg = load_config(Path(__file__).resolve().parents[1] / "configs" / "wave_machine.yaml")
    base = Params.from_coefficients(cfg.world_config.coefficients)
    params = stack_params([base] * K)

    if "--fill" in sys.argv:
        b = BatchedCrates(cfg, params, seed=0)
        print(f"fill check: K={K} cs={b.scene.chunk_cs} halo={b.scene.chunk_halo}",
              flush=True)
        hist, t0 = [], time.time()
        for _ in range(30):
            d = b.run(20)
            hist.append(int(np.max(np.asarray(d.neighbor_overflow))))
        float(b.state.pos[0, 0, 0])
        print(f"600-tick fill: wall {time.time()-t0:.0f}s, final alive "
              f"{np.mean(b.particle_counts()):.0f}, overflow history {hist}")
        return

    batch = BatchedCrates(cfg, params, seed=0)
    t0 = time.time()
    for _ in range(11):
        batch.run(20)
    float(batch.state.pos[0, 0, 0])
    print(f"settle 220 ticks (incl compile): {time.time()-t0:.0f}s "
          f"mean alive {np.mean(batch.particle_counts()):.0f}", flush=True)
    settled = batch.state

    for cs, halo in VARIANTS:
        b = BatchedCrates(cfg, params, seed=0, chunk_cs=cs, chunk_halo=halo)
        b.state = settled
        t0 = time.time()
        b.run(20)
        float(b.state.pos[0, 0, 0])
        compile_s = time.time() - t0
        walls, ovf = [], 0
        for _ in range(3):
            t0 = time.time()
            d = b.run(20)
            float(b.state.pos[0, 0, 0])
            walls.append(time.time() - t0)
            ovf = max(ovf, int(np.max(np.asarray(d.neighbor_overflow))))
        w = min(walls)
        print(f"cs={cs} halo={halo}: {w/20*1000:.2f} ms/tick "
              f"({K*20/w:.0f} crate-steps/s) max overflow={ovf} "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
