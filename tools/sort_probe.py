"""Probe: apply the per-tick cell sort to the state — three strategies.

The sorted-state step currently does lax.sort((cid, iota)) (~1.7ms at 1M)
followed by one 11-column row gather (~6.8ms) to permute every per-particle
operand (physics.neighbor_stage).  XLA gather cost is per-index, so the
wide gather is a fixed ~7ns/particle wall.  Alternatives this probe times:

  a) sort_gather  — the production scheme (baseline).
  b) sort_payload — lax.sort with all 11 payload columns as extra operands
                    (the sort network moves whole rows; if TPU sort cost is
                    sublinear in operand count this wins).
  c) sort_u64     — pack (cid, iota) into one u64 key, sort, unpack, gather
                    (cheaper key sort, same gather).

Usage: python tools/sort_probe.py [n_particles]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, f, *args):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])[:1]
    t0 = time.time()
    for _ in range(10):
        out = f(*args)
    s = float(np.asarray(jax.tree.leaves(out)[0][1234]).ravel()[0])
    dt = (time.time() - t0) / 10 * 1000
    print(f"{name:14s} {dt:7.2f} ms   (probe {s:.3f})", flush=True)
    return dt


def main(n=1_000_000):
    P = ((n + 127) // 128) * 128
    rng = np.random.default_rng(0)
    # Near-sorted cids with a realistic per-tick perturbation: mostly equal
    # to a sorted base, ~5% nudged by +-1 cell, ~0.5% by +-nx (row crossers).
    nx = 1536
    base = np.sort(rng.integers(0, nx * nx, P).astype(np.int32))
    nudge = rng.random(P)
    cid = base + np.where(nudge < 0.05, rng.integers(-1, 2, P), 0).astype(
        np.int32
    ) + np.where(nudge > 0.995, rng.choice([-nx, nx], P), 0).astype(np.int32)
    cid = np.clip(cid, 0, nx * nx).astype(np.int32)
    big = rng.random((P, 11)).astype(np.float32)

    cid_d = jnp.asarray(cid)
    big_d = jnp.asarray(big)
    iota = jnp.arange(P, dtype=jnp.int32)

    @jax.jit
    def sort_gather(c, b):
        sc, order = jax.lax.sort((c, iota), num_keys=1)
        return b[order], sc

    @jax.jit
    def sort_payload(c, b):
        cols = tuple(b[:, k] for k in range(b.shape[1]))
        out = jax.lax.sort((c,) + cols, num_keys=1)
        return jnp.stack(out[1:], axis=-1), out[0]

    @jax.jit
    def sort_u64(c, b):
        key = (c.astype(jnp.uint64) << jnp.uint64(32)) | iota.astype(jnp.uint64)
        ks = jax.lax.sort(key)
        order = (ks & jnp.uint64(0xFFFFFFFF)).astype(jnp.int32)
        return b[order], (ks >> jnp.uint64(32)).astype(jnp.int32)

    # The production 6-operand payload sort (physics.neighbor_stage), stable
    # vs unstable: XLA implements a stable variadic sort by strengthening the
    # comparator with an index tiebreak, so is_stable=False may be cheaper.
    # Stability only fixes the intra-cell order (jitter keying / float
    # accumulation order), which no invariant depends on — but the suite's
    # cross-run determinism gates do, so this is measured before adopting.
    # Operand dtypes match production exactly: 4 f32 payload columns (vel,
    # pre-fix pos) + uid as an i32 operand.
    big6 = big_d[:, :4]
    uid = jnp.asarray(rng.permutation(P).astype(np.int32))

    @jax.jit
    def sort6_stable(c, b, u):
        cols = tuple(b[:, k] for k in range(b.shape[1])) + (u,)
        return jax.lax.sort((c,) + cols, num_keys=1, is_stable=True)

    @jax.jit
    def sort6_unstable(c, b, u):
        cols = tuple(b[:, k] for k in range(b.shape[1])) + (u,)
        return jax.lax.sort((c,) + cols, num_keys=1, is_stable=False)

    print(f"P={P}")
    timeit("sort_gather", sort_gather, cid_d, big_d)
    timeit("sort_payload", sort_payload, cid_d, big_d)
    timeit("sort6_stable", sort6_stable, cid_d, big6, uid)
    timeit("sort6_unstable", sort6_unstable, cid_d, big6, uid)
    try:
        timeit("sort_u64", sort_u64, cid_d, big_d)
    except Exception as e:
        print(f"sort_u64 FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
