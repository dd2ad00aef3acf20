"""Cell-occupancy distribution of the 1M dam break over time.

The pass kernels evaluate all 9 x M_LO^2 slot pairs per cell regardless of
occupancy, so their cost is set by the slot capacity, not the real neighbor
count.  This prints the occupancy histogram (and row/block occupancy) at
several settle depths to size occupancy-adaptive kernel variants.

Usage: python tools/occupancy_stats.py [n_particles] [ticks ...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from sand_crate_tpu import Crate
from sand_crate_tpu import physics
from sand_crate_tpu.cellwise import cell_ids_grid
from tools.perf_probe import dam_break_world


def stats(state, scene):
    cid = cell_ids_grid(state.pos, state.alive, scene)
    counts = jnp.zeros((scene.grid_nx * scene.grid_ny + 1,), jnp.int32).at[
        jnp.minimum(cid, scene.grid_nx * scene.grid_ny)
    ].add(1)
    counts = np.asarray(counts[:-1]).reshape(scene.grid_ny, scene.grid_nx)
    occ = counts[counts > 0]
    rows_occ = (counts.sum(axis=1) > 0).sum()
    # row blocks at tr=2 with the +-1 halo (what the pass kernels run)
    row_any = counts.sum(axis=1) > 0
    tr = scene.row_block
    nb = scene.grid_ny // tr
    idx = np.arange(nb)[:, None] * tr + np.arange(tr + 2)[None, :] - 1
    idx = np.clip(idx, 0, scene.grid_ny - 1)
    blocks_occ = row_any[idx].any(axis=1).sum()
    hist = np.bincount(occ, minlength=18)
    return dict(
        occupied_cells=int((counts > 0).sum()),
        mean=float(occ.mean()),
        p50=int(np.percentile(occ, 50)),
        p90=int(np.percentile(occ, 90)),
        p99=int(np.percentile(occ, 99)),
        max=int(occ.max()),
        frac_le4=float((occ <= 4).mean()),
        frac_le8=float((occ <= 8).mean()),
        rows_occ=int(rows_occ),
        blocks_occ=int(blocks_occ),
        nblocks=nb,
        hist=hist[:17].tolist(),
    )


def main(n=1_000_000, ticks=(0, 100, 300, 600)):
    crate = Crate(dam_break_world(n))
    scene, params, state = crate.scene, crate.params, crate.state
    f_step = jax.jit(lambda s: physics.step(s, params, scene))
    done = 0
    for t in ticks:
        for _ in range(t - done):
            state, _ = f_step(state)
        done = t
        np.asarray(state.pos[0, 0])
        s = stats(jax.device_get(state), scene)
        print(f"tick {t}: {s}")


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(a[0] if a else 1_000_000, tuple(a[1:]) if len(a) > 1 else (0, 100, 300, 600))
