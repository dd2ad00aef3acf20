"""Mid-scale validation of the rebalanced (variable-height-band) spatial path.

VERDICT r3 weak item 2 / next item 5: the 4.99x -> 1.36-1.62x balance
measurement (docs/spatial_load_balance.md) and the toy-capacity suite tests
never ran at a scale where EDGE_SAMPLE_TARGET subsampling (spatial.py) and
row quantization actually bind.  This tool runs a >=64k-particle dam break on
the 8-device virtual CPU mesh and checks BOTH properties at that scale:

1. trajectory equivalence: the rebalanced 8-shard run must reproduce the
   single-device trajectory over the comparison window (sorted alive
   positions at f32 tolerance) — with capacity 65536 the edge-recompute
   subsample is strided (stride 4), so the edges the sharded run uses are
   computed from 1/4 of the particles while ownership/migration remains
   exact per particle;
2. settled imbalance: continuing the sharded run until the column collapses
   and pools, the per-band max/mean alive share must hold <= ~1.7x (the
   residual is row quantization at the fluid surface, not the scheme).

Results recorded in docs/spatial_load_balance.md.  Reference behavior: the
upstream simulator has no distributed mode (SURVEY.md section 5 item 8); the
band decomposition is this framework's scaling story, so its load-balance
claim must hold at a scale where balance matters.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
         XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python tools/rebalance_midscale.py [--particles 65536] \
           [--eq-ticks 40] [--settle-ticks 240]
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import copy

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh

from sand_crate_tpu.config import InitialParticlesConfig, load_config
from sand_crate_tpu.physics import step
from sand_crate_tpu.scene import build_scene, init_state
from sand_crate_tpu.spatial import (
    _edge_sample_stride,
    initial_band_edges,
    make_spatial_step,
    merge_state,
    split_state,
)
from sand_crate_tpu.state import Params


def _sorted_alive_positions(pos, alive):
    p = np.asarray(pos)[np.asarray(alive)]
    return p[np.lexsort((p[:, 1], p[:, 0]))]


def main(particles: int, eq_ticks: int, settle_ticks: int, n_shards: int = 8):
    config = copy.deepcopy(load_config(REPO / "configs" / "dam_break.yaml"))
    w = config.world_config
    w.coefficients = dict(w.coefficients)
    w.coefficients["collider_noise_level"] = 0.0
    w.particle_sources = []
    area = (0.42 - 0.02) * (0.98 - 0.10)
    spacing = float(np.sqrt(area / particles))
    w.initial_particles = [
        InitialParticlesConfig(
            x0=0.02, y0=0.10, x1=0.42, y1=0.98, spacing=spacing, jitter=0.0
        )
    ]
    w.coefficients["particle_radius"] = spacing * 0.55
    cap = 1 << (int(particles * 1.05) - 1).bit_length()
    w.coefficients["max_particles"] = cap
    # cellwise: the pure-XLA backend (Pallas interpret mode is unusable at
    # this scale on CPU); M=8 bounds the dense pair blocks.
    scene = build_scene(w, capacity=cap, forces_mode="cellwise", cell_capacity=8)
    state0 = init_state(w, scene, seed=0)
    params = Params.from_coefficients(w.coefficients)
    n0 = int(np.asarray(state0.alive).sum())
    stride = _edge_sample_stride(scene.capacity)
    print(
        f"N={n0} capacity={scene.capacity} grid={scene.grid_nx}x{scene.grid_ny} "
        f"shards={n_shards} edge_sample_stride={stride} "
        f"(subsampling {'BINDS' if stride > 1 else 'off'})"
    )
    assert stride > 1, "pick a capacity > EDGE_SAMPLE_TARGET for this check"

    # ---- leg 1: single device, eq_ticks ------------------------------------
    step1 = jax.jit(lambda s, p: step(s, p, scene)[0])
    t0 = time.time()
    s_single = state0
    for _ in range(eq_ticks):
        s_single = step1(s_single, params)
    s_single.pos.block_until_ready()
    print(f"single-device {eq_ticks} ticks: {time.time() - t0:.1f}s")

    # ---- leg 2: 8-shard rebalanced, eq_ticks then settle_ticks -------------
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("space",))
    edges = initial_band_edges(state0, scene, n_shards)
    s_split = split_state(state0, scene, n_shards, edges)
    spatial = make_spatial_step(mesh, scene, rebalance=True)
    t0 = time.time()
    with mesh:
        stats = None
        for _ in range(eq_ticks):
            s_split, stats = spatial(s_split, params, edges)
            edges = stats["band_edges"]
    merged = merge_state(jax.device_get(s_split), scene, n_shards)
    print(f"8-shard rebalanced {eq_ticks} ticks: {time.time() - t0:.1f}s")

    assert int(stats["migration_dropped"]) == 0, stats["migration_dropped"]
    a = _sorted_alive_positions(s_single.pos, s_single.alive)
    b = _sorted_alive_positions(merged.pos, merged.alive)
    assert len(a) == len(b) == n0, (len(a), len(b))
    err = np.abs(a - b).max()
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    print(f"trajectory equivalence @ {eq_ticks} ticks: max|dp|={err:.2e}  OK")

    t0 = time.time()
    worst = 0.0
    with mesh:
        for t in range(eq_ticks, eq_ticks + settle_ticks):
            s_split, stats = spatial(s_split, params, edges)
            edges = stats["band_edges"]
            if (t + 1) % 20 == 0:
                shard = np.asarray(stats["shard_alive"])
                imb = shard.max() / max(shard.sum() / n_shards, 1)
                worst = max(worst, imb)
                print(
                    f"tick {t + 1:>4}  imbalance {imb:.2f}x  "
                    f"edges={','.join(str(int(e)) for e in edges)}  "
                    f"({(time.time() - t0):.0f}s)"
                )
    shard = np.asarray(stats["shard_alive"])
    imb = shard.max() / max(shard.sum() / n_shards, 1)
    print(
        f"settled imbalance: {imb:.2f}x (worst sampled {worst:.2f}x, ideal 1.0, "
        f"gate <= 1.7x)  bands={list(map(int, shard))}"
    )
    assert imb <= 1.7, imb
    print("PASS")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=65536)
    ap.add_argument("--eq-ticks", type=int, default=40)
    ap.add_argument("--settle-ticks", type=int, default=240)
    a = ap.parse_args()
    main(a.particles, a.eq_ticks, a.settle_ticks)
