"""A/B the 10k step floor across backends and small-N-tuned configs.

VERDICT r4 item 5: the 10k point (0.47ms/step, 2.16e7 particle-steps/s)
is the metric's worst regime — overhead-bound, below the 1M rate.  This
probe times the step under each candidate configuration with the honest
timing recipe (median of K 10-tick scan chunks, each closed by a scalar
device->host fetch — jax.block_until_ready returns early through the
relay) so the regime analysis in docs/perf_1m.md can name the floor's
owner and the best shippable small-N config.

Configs: the production auto path (pmajor symm/fold/512s2), pmajor with
narrow windows (256s2), no-symm, cs=256, the chunked mid-size backend,
the pallas grid backend, and the fixed-K gather backend (closest to the
reference's cap-20 list, /root/reference/src/crate/collision_detector.py).

Usage: python tools/small_n_probe.py [n_particles] [chunks]
"""

from __future__ import annotations

import dataclasses
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from sand_crate_tpu import Crate
from sand_crate_tpu.physics import rollout
from tools.perf_probe import dam_break_world

# At 10k the device step is ~0.4ms, so a per-chunk scalar fetch (tunnel
# RTT ~25-30ms) swamps short chunks: measured 3.0ms/step "p50" across ALL
# configs at CHUNK=10.  Long scans amortize the RTT below 2% instead.
CHUNK = 200


def time_config(label, n_target, chunks, scene_over=None, **crate_kw):
    crate = Crate(dam_break_world(n_target), **crate_kw)
    scene, params = crate.scene, crate.params
    if scene_over:
        scene = dataclasses.replace(scene, **scene_over)
    roll = jax.jit(lambda s: rollout(s, params, scene, CHUNK)[0])
    state = crate.state
    t0 = time.time()
    state = roll(state)
    float(state.pos[0, 0])  # fetch barrier (relay)
    compile_s = time.time() - t0
    walls = []
    for _ in range(chunks):
        t0 = time.time()
        state = roll(state)
        float(state.pos[0, 0])
        walls.append(time.time() - t0)
    p50 = statistics.median(walls) / CHUNK * 1e3
    best = min(walls) / CHUNK * 1e3
    print(
        f"{label:28s} p50 {p50:7.3f} ms/step  best {best:7.3f}  "
        f"compile {compile_s:5.1f}s",
        flush=True,
    )
    return p50


def main(n=10_000, chunks=20):
    print(f"N~{n} backend={jax.default_backend()}  "
          f"(median of {chunks} {CHUNK}-tick chunks, scalar-fetch synced)")
    time_config("auto (pmajor 512s2 symm)", n, chunks)
    time_config("pmajor w=256", n, chunks, scene_over=dict(pmajor_w=256))
    time_config("pmajor no-symm", n, chunks, pmajor_symm=False)
    time_config(
        "pmajor w=256 no-symm", n, chunks,
        scene_over=dict(pmajor_w=256), pmajor_symm=False,
    )
    time_config("chunked", n, chunks, forces_mode="chunked")
    time_config("pallas grid", n, chunks, forces_mode="pallas")
    time_config("gather K=20", n, chunks, forces_mode="gather")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 10_000, int(a[1]) if len(a) > 1 else 20)
