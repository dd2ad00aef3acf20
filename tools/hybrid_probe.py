"""Probe: hybrid-bf16 pair chain vs f32 at production pass shape (v5e).

VERDICT r4 item 1a: the round-3 bf16 rejection covered the FULL chain
(bf16 rsqrt hard-crashes v5e; bf16 cutoff mask flips boundary pairs with
O(1) force error).  The untried variant keeps the deltas, the cutoff
compare, the mask, and rsqrt in f32 and downgrades only the smooth
post-``inv`` chain (nhat, align, coefficients, term muls, accumulators)
to bf16.  tools/bf16_probe.py measured the raw ALU ratio: bf16 mul-add
chains issue at only ~1.32x f32 on this chip (218 vs 165 G(mul+add)/s,
mixed f32-mask/bf16 227) — NOT the 2x packed-vreg hope.

This probe prices the end-to-end hybrid at production shape: the exact
pass-B fold+symm ``window_terms`` chain (ops/pmajor.py:284-401) on
(128, 256) planes — f32 baseline vs hybrid-bf16 — iterated over ITERS
pseudo-windows per block with per-iteration operand perturbation (defeats
CSE/hoisting).  Both variants share the f32 prologue (deltas, near, nd2,
row-eq mask, rsqrt); the hybrid pays 3 full-plane casts (nrx, nry, inv)
plus narrow (1, W) feature casts, then runs the ~12 downgradeable plane
ops in bf16.

Arithmetic being tested (docs/perf_1m.md): downgradeable ops are ~12 of
~30 pass-B planes; at the measured 1.32x ALU ratio the saving is
12*(1 - 1/1.32) ~= 2.9 op-equivalents, against ~3 cast planes — net ~0.
If the measurement lands <5% either way, hybrid-bf16 is a priced loser
and the kernels stay f32.

Usage: python tools/hybrid_probe.py [iters]
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

CS, W = 128, 256  # production pass plane: cs x (split * 128) static prefix
BLOCKS = 64
EPS = 1e-6


def _chain(sfeat, cand, perturb, hybrid: bool):
    """One pass-B fold window_terms visit.  Returns (fx, fy) planes.

    ``perturb`` is a per-iteration f32 scalar folded into the self
    positions so consecutive iterations cannot be CSE'd."""
    f32 = jnp.float32
    s_px = sfeat[:, 0:1] + perturb
    s_py = sfeat[:, 1:2] + perturb
    s_npx = sfeat[:, 2:3] + perturb
    s_npy = sfeat[:, 3:4] + perturb
    s_cp = sfeat[:, 4:5]
    s_sx = sfeat[:, 5:6]
    s_sy = sfeat[:, 6:7]
    s_rw = sfeat[:, 7:8]
    c_px = cand[0:1, :]
    c_py = cand[1:2, :]
    c_npx = cand[2:3, :]
    c_npy = cand[3:4, :]
    c_cp = cand[4:5, :]
    c_sx = cand[5:6, :]
    c_sy = cand[6:7, :]
    c_rw = cand[7:8, :]
    diam = f32(0.01)
    tp2 = f32(0.008)

    # f32 prologue (identical in both variants)
    rx = s_px - c_px
    ry = s_py - c_py
    near = rx * rx + ry * ry <= diam * diam
    nrx = s_npx - c_npx
    nry = s_npy - c_npy
    nd2 = jnp.maximum(nrx * nrx + nry * nry, f32(EPS * EPS))
    mb = near & (c_rw == s_rw)
    inv = jax.lax.rsqrt(nd2)
    s_tp = s_cp - tp2

    if not hybrid:
        nhx = nrx * inv
        nhy = nry * inv
        align = (s_sx - c_sx) * nhx + (s_sy - c_sy) * nhy
        tpf = c_cp + s_tp
        t_coef = jnp.where(mb, align + tpf, f32(0))
        return t_coef * nhx, t_coef * nhy

    bf = jnp.bfloat16
    inv_h = inv.astype(bf)
    nrx_h = nrx.astype(bf)
    nry_h = nry.astype(bf)
    nhx = nrx_h * inv_h
    nhy = nry_h * inv_h
    align = (s_sx.astype(bf) - c_sx.astype(bf)) * nhx + (
        s_sy.astype(bf) - c_sy.astype(bf)
    ) * nhy
    tpf = c_cp.astype(bf) + s_tp.astype(bf)
    t_coef = jnp.where(mb, align + tpf, bf(0))
    return t_coef * nhx, t_coef * nhy


def _kernel(sfeat_ref, cand_ref, o_ref, *, iters, hybrid):
    sfeat = sfeat_ref[...]  # (CS, 8) f32
    acc_dt = jnp.bfloat16 if hybrid else jnp.float32
    ax = jnp.zeros((CS, W), acc_dt)
    ay = jnp.zeros((CS, W), acc_dt)
    for it in range(iters):
        fx, fy = _chain(
            sfeat, cand_ref[...], jnp.float32(1e-5 * (it + 1)), hybrid
        )
        ax = ax + fx
        ay = ay + fy
    o_ref[...] = (ax + ay).astype(jnp.float32)


def run(name, hybrid, iters):
    rng = np.random.default_rng(0)
    sfeat = jnp.asarray(rng.random((BLOCKS * CS, 8)), jnp.float32) * 0.02
    cand = jnp.asarray(rng.random((BLOCKS * 8, W)), jnp.float32) * 0.02

    f = pl.pallas_call(
        functools.partial(_kernel, iters=iters, hybrid=hybrid),
        grid=(BLOCKS,),
        in_specs=[
            pl.BlockSpec((CS, 8), lambda i: (i, 0)),
            pl.BlockSpec((8, W), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((CS, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((BLOCKS * CS, W), jnp.float32),
    )
    f = jax.jit(f)
    out = f(sfeat, cand)
    float(out[0, 0])  # fetch barrier (relay)
    reps = 20
    t0 = time.time()
    for _ in range(reps):
        out = f(sfeat, cand)
    float(out[0, 0])
    dt = (time.time() - t0) / reps
    visits = BLOCKS * iters
    print(
        f"{name:18s} {dt * 1e3:8.3f} ms   "
        f"{dt / visits * 1e6:7.3f} us/(128x{W}) visit",
        flush=True,
    )
    return dt


def main(iters=64):
    print(f"pass-B fold chain, {CS}x{W} plane, {iters} visits/block")
    tf = run("f32 chain", False, iters)
    th = run("hybrid bf16", True, iters)
    print(f"hybrid speedup over f32: {tf / th:.3f}x")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
