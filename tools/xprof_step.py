"""Profile the 1M step on-chip and attribute device time per op.

Runs the dam-break scene (bench.py conditions), optionally settles it, then
captures a ``jax.profiler.trace`` around a few dispatches of the jitted step
and aggregates the device-track events from the Chrome trace by op name.
This is the attribution tool the round-2 bottleneck hunt lacked (VERDICT
item 1): it shows exactly how the step's wall time splits across the Pallas
kernels, the XLA fusions, and the gathers.

Usage: python tools/xprof_step.py [n_particles] [--settle N] [--steps N]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from sand_crate_tpu import Crate
from sand_crate_tpu import physics
from tools.perf_probe import dam_break_world


def capture(n_target=1_000_000, settle=100, steps=5, outdir="/tmp/xprof_step"):
    crate = Crate(dam_break_world(n_target))
    scene, params, state = crate.scene, crate.params, crate.state
    print(
        f"P={scene.capacity} grid={scene.grid_nx}x{scene.grid_ny} "
        f"M={scene.cell_capacity} tr={scene.row_block} settle={settle}"
    )
    f_step = jax.jit(lambda s: physics.step(s, params, scene))
    state2, _ = f_step(state)
    np.asarray(state2.pos[0, 0])  # compile + sync
    print("step compiled", flush=True)
    # Settle with the same compiled step (a scan rollout would be a second,
    # much larger compile).
    for _ in range(settle):
        state, _ = f_step(state)
    np.asarray(state.pos[0, 0])
    t0 = time.time()
    for _ in range(10):
        state2, _ = f_step(state)
    np.asarray(state2.pos[0, 0])
    print(f"step p50 ~ {(time.time() - t0) / 10 * 1000:.2f} ms (pre-trace)")

    with jax.profiler.trace(outdir):
        for _ in range(steps):
            state2, _ = f_step(state)
        np.asarray(state2.pos[0, 0])
    return outdir, steps


def report(outdir, steps, top=40):
    paths = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {outdir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # Device tracks: pid/tid metadata names like "/device:TPU:0" + "XLA Ops".
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_op = collections.Counter()
    n_calls = collections.Counter()
    meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = names.get((e["pid"], e["tid"]), "")
        pname = names.get(e["pid"], "")
        if "TPU" not in pname and "TPU" not in tname and "XLA Ops" not in tname:
            continue
        if "XLA Ops" not in tname:
            continue
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        by_op[e["name"]] += dur
        n_calls[e["name"]] += 1
        total += dur
        a = e.get("args") or {}
        info = a.get("long_name") or a.get("tf_op") or a.get("source") or ""
        if info and e["name"] not in meta:
            meta[e["name"]] = str(info)
    print(f"\ndevice op total: {total:.2f} ms over {steps} steps "
          f"=> {total / steps:.2f} ms/step")
    print(f"{'op':<56} {'ms/step':>8} {'calls':>6} {'%':>6}  detail")
    for name, ms in by_op.most_common(top):
        print(f"{name[:56]:<56} {ms / steps:8.3f} {n_calls[name]:6d} "
              f"{100 * ms / total:5.1f}%  {meta.get(name, '')[:110]}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kw = {a.split("=")[0].lstrip("-"): int(a.split("=")[1])
          for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    n = int(args[0]) if args else 1_000_000
    outdir, steps = capture(n, settle=kw.get("settle", 100), steps=kw.get("steps", 5))
    report(outdir, steps)
