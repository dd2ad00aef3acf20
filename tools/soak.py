"""Long-horizon stability soak at scale (the round-exit stability gate).

Runs the 1M dam break for thousands of ticks in device-resident chunks and
reports, per chunk: steps/s, neighbor overflow (p-major: window-coverage
loss; grid modes: cap spills), non-finite count, max speed, max cell
occupancy, and the size of the largest coincident blob (particles within
0.25 diameter of a cell's centroid particle — the round-2 "droplet
attractor" metric, CLAUDE.md stability notes).  Exits non-zero if any
invariant breaks: non_finite > 0, duplicate uids among alive, or growing
overflow.

Usage: python tools/soak.py [n_particles] [total_ticks] [chunk] [mode]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from sand_crate_tpu import Crate
from sand_crate_tpu.physics import rollout
from tools.perf_probe import dam_break_world


def occupancy_stats(state, scene, diam):
    """Host-side max cell occupancy + largest near-coincident blob."""
    from sand_crate_tpu.cellwise import cell_ids_grid

    cid = np.asarray(cell_ids_grid(state.pos, state.alive, scene))
    alive = np.asarray(state.alive)
    cid = cid[alive]
    if cid.size == 0:
        return 0, 0
    counts = np.bincount(cid)
    max_occ = int(counts.max())
    # Largest blob: within the fullest cell, particles within 0.25*diam of
    # the cell's first particle (coincident-pile detector).
    cell = int(counts.argmax())
    pos = np.asarray(state.pos)[alive]
    members = pos[cid == cell]
    d = np.linalg.norm(members - members[0], axis=-1)
    blob = int((d < 0.25 * diam).sum())
    return max_occ, blob


def main(n=1_000_000, total=2000, chunk=250, mode="auto"):
    crate = Crate(dam_break_world(n), forces_mode=mode)
    scene, params, state = crate.scene, crate.params, crate.state
    print(
        f"soak: N={crate.particle_count:,} cap={scene.capacity:,} "
        f"mode={scene.forces_mode} grid={scene.grid_nx}x{scene.grid_ny} "
        f"total={total} chunk={chunk}",
        flush=True,
    )
    roll = jax.jit(lambda s: rollout(s, params, scene, chunk))
    ov_hist, bad = [], []
    t_all = time.time()
    for t in range(0, total, chunk):
        t0 = time.time()
        state, diag = roll(state)
        nf = int(diag.non_finite)
        ov = int(diag.neighbor_overflow)
        ms = float(diag.max_speed)
        dt = time.time() - t0
        max_occ, blob = occupancy_stats(
            state, scene, 2.0 * float(np.asarray(params.particle_radius))
        )
        uid = np.asarray(state.uid)[np.asarray(state.alive)]
        dup = uid.size - np.unique(uid).size
        ov_hist.append(ov)
        line = (
            f"tick {t + chunk:>5}  {chunk / dt:5.1f} steps/s  overflow={ov:<6} "
            f"non_finite={nf} max_speed={ms:7.2f} max_occ={max_occ:<4} "
            f"blob={blob:<4} dup_uid={dup}"
        )
        print(line, flush=True)
        if nf:
            bad.append(f"non_finite={nf} at tick {t + chunk}")
        if dup:
            bad.append(f"{dup} duplicate uids at tick {t + chunk}")
    # Growing overflow = the round-1 collapse signature: compare halves.
    h = len(ov_hist) // 2
    if h and sum(ov_hist[h:]) > 4 * max(sum(ov_hist[:h]), len(ov_hist)):
        bad.append(f"overflow growing: {ov_hist}")
    wall = time.time() - t_all
    print(f"done in {wall:.0f}s; overflow history: {ov_hist}")
    if bad:
        print("FAILED: " + "; ".join(bad))
        return 1
    print("OK: all invariants held")
    return 0


if __name__ == "__main__":
    a = sys.argv[1:]
    sys.exit(
        main(
            int(a[0]) if len(a) > 0 else 1_000_000,
            int(a[1]) if len(a) > 1 else 2000,
            int(a[2]) if len(a) > 2 else 250,
            a[3] if len(a) > 3 else "auto",
        )
    )
