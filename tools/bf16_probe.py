"""Probe: packed-bf16 VPU issue rate vs f32 on this chip (v5e).

The p-major pass kernels run at the VPU issue-rate roofline for the f32
instructions they issue (docs/perf_1m.md).  The hybrid-bf16 lever (keep
rsqrt/cutoff/mask in f32, downgrade the smooth post-mask chain) only pays
if Mosaic lowers bf16 elementwise ops as PACKED vregs (2 values/lane) at
~2x f32 throughput.  This probe times a pure dependent mul-add chain per
dtype in a Pallas kernel shaped like the pass kernels' planes.

Also probes the exact mixed-precision shapes the hybrid kernel needs:
  * f32-computed bool mask -> jnp.where on bf16 operands
  * f32 -> bf16 plane casts (the per-window conversion overhead)

Usage: python tools/bf16_probe.py [iters_per_elem]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 256, 512  # one pass-plane-sized block: (cs*2, sw_*2)
BLOCKS = 64


LANES = 8  # independent chains so the probe is issue-bound, not latency-bound


def _chain_kernel(x_ref, o_ref, *, iters, dtype):
    a = jnp.asarray(1.0000001, dtype)
    b = jnp.asarray(1e-7, dtype)
    x = x_ref[...]
    chains = [x * jnp.asarray(1.0 + 0.01 * k, dtype) for k in range(LANES)]
    for _ in range(iters):
        chains = [c * a + b for c in chains]
    acc = chains[0]
    for c in chains[1:]:
        acc = acc + c
    o_ref[...] = acc


def _mixed_kernel(x_ref, o_ref, *, iters):
    """f32 mask -> bf16 where + muls (the hybrid kernel's inner shape)."""
    xf = x_ref[...]  # f32
    mb = xf > jnp.float32(0.5)  # f32-domain compare
    a = jnp.bfloat16(1.0000001)
    chains = [
        (xf * jnp.float32(1.0 + 0.01 * k)).astype(jnp.bfloat16)
        for k in range(LANES)
    ]
    accs = [jnp.zeros_like(c) for c in chains]
    for _ in range(iters):
        chains = [jnp.where(mb, c * a, jnp.bfloat16(0)) for c in chains]
        accs = [ak + c for ak, c in zip(accs, chains)]
    acc = accs[0]
    for c in accs[1:]:
        acc = acc + c
    o_ref[...] = acc.astype(jnp.float32)


def run(name, kernel, in_dtype, out_dtype, iters):
    x = jnp.asarray(
        np.random.default_rng(0).random((BLOCKS * ROWS, COLS)), in_dtype
    )

    f = pl.pallas_call(
        functools.partial(kernel, iters=iters),
        grid=(BLOCKS,),
        in_specs=[pl.BlockSpec((ROWS, COLS), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((BLOCKS * ROWS, COLS), out_dtype),
    )
    f = jax.jit(f)
    out = f(x)
    float(out[0, 0])  # fetch barrier (relay)
    t0 = time.time()
    reps = 30
    for _ in range(reps):
        out = f(x)
    float(out[0, 0])
    dt = (time.time() - t0) / reps
    elems = BLOCKS * ROWS * COLS
    gops = elems * iters * 2 / dt / 1e9  # mul+add per iter
    print(f"{name:22s} {dt * 1e3:8.3f} ms   {gops:8.1f} G(mul+add)/s",
          flush=True)
    return dt


def main(iters=64):
    print(f"plane {ROWS}x{COLS} x {BLOCKS} blocks, {iters} mul-adds/elem")
    tf = run("f32 chain", functools.partial(_chain_kernel, dtype=jnp.float32),
             jnp.float32, jnp.float32, iters)
    th = run("bf16 chain", functools.partial(_chain_kernel, dtype=jnp.bfloat16),
             jnp.bfloat16, jnp.bfloat16, iters)
    print(f"bf16 speedup over f32: {tf / th:.2f}x")
    run("mixed f32-mask/bf16", _mixed_kernel, jnp.float32, jnp.float32, iters)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
