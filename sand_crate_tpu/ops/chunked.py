"""Chunked fixed-halo pair backend — pure XLA, vmappable, gather-free.

The batched-crate sweep path (sweep.py) vmaps the whole physics step over a
leading crate axis.  The dense all-pairs backend vmaps beautifully but is
O(P^2) — past ~1-2k particles per crate the pair matrices blow up (a
wave_machine-scale 4000-particle crate at batch 1024 means 16M-entry planes
per crate).  The manual-DMA Pallas kernels don't vmap, and the fixed-K
gather backend's vmapped scatter/top_k patterns crashed the TPU worker at
512 crates.  This backend fills the gap with the p-major windowing idea
(ops/pmajor.py) expressed in vmap-friendly XLA:

    self chunk:   cs consecutive cell-sorted particles (Scene.chunk_cs;
                  wide chunks amortize the ~1ms/iteration TPU while-loop
                  overhead that dominates this sweep)
    candidates:   ONE fixed window of the sorted slab,
                  [chunk_start - H, chunk_start + cs + H) — a *static*
                  halo H (Scene.chunk_halo), so under vmap the window is a
                  dynamic_slice at a batch-uniform offset: no per-crate
                  gather, no data-dependent shapes.
    pair plane:   (cs, cs + 2H) elementwise math, a bounded chunk loop
                  (memory stays bounded at any batch width).

Correctness contract (equivalence-tested against cellwise/dense alongside
pmajor): distance cutoff + |grid-row delta| <= 1 + liveness both sides +
index inequality for self-exclusion.  No cell-capacity caps.  The only
approximation is the fixed halo: a true pair whose partner sits further
than H slab positions away is lost — possible only when one grid row holds
more than ~H particles.  The loss is counted exactly (searchsorted row
ranges vs the fixed window) into ``PairSums.overflow``, the same channel
the other backends use.

Collider noise matches pmajor: per-candidate jitter hashed once per tick
from the sorted index (ops/pmajor._u01), pre-applied in XLA.

Reference semantics: /root/reference/src/crate/crate.py:161-358 (pair
passes), collision_detector.py:9-128 (neighbor search this replaces).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cellwise import PairSums, cell_ids_grid
from ..state import Scene
from .pair_kernel import EPS
from .pmajor import _u01


def _pass_scan(
    feat,  # (p_pad, F) f32 — sorted feature columns (see callers)
    halo: int,
    n_out: int,
    mode: str,  # "a" | "b"
    diam,
    smoothing,
    target_p,
    balance,
    enable_spring: bool,
    n_alive=None,
    cs: int = 128,
):
    """Scan cs-wide self chunks; each sees one fixed (cs + 2*halo) window.

    ``n_alive`` (traced scalar) bounds the sweep to the live-chunk *prefix*:
    dead rows carry cid = NC so the cell sort parks them at the slab end,
    and a chunk whose selves are all dead contributes exact zeros (every
    output is gated on the both-alive pair mask), so skipping it is bitwise
    free.  This is the datagen lever: a capacity-4096 crate holding 700
    particles sweeps 3 cs=256 chunks instead of 16.  Windows of live
    chunks still read into the dead region (the mask kills those
    candidates), so only
    *self* liveness matters for the bound.

    IMPORTANT: under vmap the bound must be BATCH-UNIFORM (an unbatched
    scalar, e.g. closed over from outside the vmap) — then the loop counter
    stays unbatched and the window dynamic_slices keep batch-uniform
    offsets (this backend's design premise).  A per-crate batched bound
    triggers JAX's lane-freezing while rule: the counter becomes batched,
    every dynamic_slice/update turns into gather/scatter, and the remote
    XLA compile blows up from ~50s to >9min (measured 2026-08-20, 64
    wave_machine crates).  Callers pass the max-over-batch bound computed
    on the host between scan chunks (sweep.BatchedCrates.run).
    """
    p_pad, F = feat.shape
    nchunks = p_pad // cs
    wt = cs + 2 * halo
    featp = jnp.pad(feat, ((halo, halo), (0, 0)))
    inv_diam = 1.0 / jnp.maximum(diam, EPS)

    def body(_, c):
        win = jax.lax.dynamic_slice(featp, (c * cs, 0), (wt, F))
        sf = jax.lax.dynamic_slice(featp, (c * cs + halo, 0), (cs, F))
        s_px, s_py = sf[:, 0:1], sf[:, 1:2]
        s_rw, s_af = sf[:, 4:5], sf[:, 5:6]
        c_px, c_py = win[:, 0].T[None], win[:, 1].T[None]
        c_npx, c_npy = win[:, 2].T[None], win[:, 3].T[None]
        c_rw, c_af = win[:, 4].T[None], win[:, 5].T[None]
        s_gid = c * cs + jnp.arange(cs, dtype=jnp.int32)[:, None]
        c_gid = c * cs - halo + jnp.arange(wt, dtype=jnp.int32)[None, :]

        rx = s_px - c_px
        ry = s_py - c_py
        d2 = rx * rx + ry * ry
        dr = c_rw - s_rw
        mb = (
            (d2 <= diam * diam)
            & (s_af > 0)
            & (c_af > 0)
            & (dr >= -1.0)
            & (dr <= 1.0)
            & (s_gid != c_gid)
        )
        nrx = s_px - c_npx
        nry = s_py - c_npy
        nd2 = jnp.maximum(nrx * nrx + nry * nry, EPS * EPS)
        inv = jax.lax.rsqrt(nd2)
        nhx = nrx * inv
        nhy = nry * inv
        dist = nd2 * inv
        wgt = jnp.where(mb, 1.0 - jnp.clip(dist * inv_diam, 0.0, 1.0), 0.0)

        if mode == "a":
            coeff = (1.0 - wgt) * wgt
            outs = [wgt, coeff * nhx, coeff * nhy, mb.astype(jnp.float32)]
        else:
            c_vx, c_vy = win[:, 6].T[None], win[:, 7].T[None]
            c_cp = win[:, 8].T[None]
            c_sx, c_sy = win[:, 9].T[None], win[:, 10].T[None]
            s_cp = sf[:, 8:9]
            s_sx, s_sy = sf[:, 9:10], sf[:, 10:11]
            align = ((s_sx - c_sx) * nhx + (s_sy - c_sy) * nhy) * smoothing
            t_coef = jnp.where(mb, align + (c_cp + s_cp - 2.0 * target_p), 0.0)
            p_coef = jnp.where(mb, s_cp + c_cp, 0.0)
            mm = mb.astype(jnp.float32)
            outs = [t_coef * nhx, t_coef * nhy, p_coef * nhx, p_coef * nhy]
            if enable_spring:
                sp = jnp.where(mb, balance - wgt, 0.0)
                outs += [sp * nhx, sp * nhy]
            outs += [mm * c_vx, mm * c_vy]
        return 0, jnp.stack([o.sum(axis=1) for o in outs], axis=-1)

    if n_alive is None:
        _, res = jax.lax.scan(
            body, 0, jnp.arange(nchunks, dtype=jnp.int32)
        )  # (nchunks, cs, n_out)
        assert res.shape[-1] == n_out
        return res.reshape(p_pad, n_out)

    n_live_chunks = (jnp.asarray(n_alive, jnp.int32) + cs - 1) // cs

    def live_body(c, res):
        chunk = body(0, c)[1]  # (cs, n_out)
        return jax.lax.dynamic_update_slice(res, chunk[None], (c, 0, 0))

    res = jax.lax.fori_loop(
        0,
        n_live_chunks,
        live_body,
        jnp.zeros((nchunks, cs, n_out), feat.dtype),
    )
    return res.reshape(p_pad, n_out)


def _lost_pairs(sorted_cid, n_alive, nx, ny, halo, nchunks, cs):
    """Exact count of candidate slots outside the fixed windows.

    Mirrors ops/pmajor._windows accounting with fixed anchors: chunk c's
    candidates for row offset d live in [searchsorted(cid_first + d*nx - 1),
    searchsorted(cid_last + d*nx + 2)); anything before c*cs - halo or at/
    after c*cs + cs + halo is unreachable."""
    P = sorted_cid.shape[0]
    off = jnp.arange(nchunks, dtype=jnp.int32) * cs
    first = jnp.minimum(off, P - 1)
    lastp = jnp.clip(jnp.minimum(off + cs - 1, n_alive - 1), 0, P - 1)
    cidf = sorted_cid[first]
    cidl = sorted_cid[lastp]
    NC = nx * ny
    d = jnp.arange(3, dtype=jnp.int32)[None, :] - 1
    lo = jnp.clip(cidf[:, None] + d * nx - 1, 0, NC)
    hi = jnp.clip(cidl[:, None] + d * nx + 2, 0, NC)
    ws = jnp.searchsorted(sorted_cid, lo.ravel()).astype(jnp.int32)
    we = jnp.searchsorted(sorted_cid, hi.ravel()).astype(jnp.int32)
    lo_fix = jnp.repeat(off - halo, 3)
    hi_fix = jnp.repeat(off + cs + halo, 3)
    live = jnp.repeat(off < n_alive, 3)
    lost = jnp.where(
        live,
        jnp.maximum(lo_fix - ws, 0) + jnp.maximum(we - hi_fix, 0),
        0,
    )
    return jnp.sum(lost)


def neighbor_forces_chunked_sorted(
    pos: jax.Array,  # all inputs pre-sorted by cell id (sorted-state step)
    vel: jax.Array,
    alive: jax.Array,
    sorted_cid: jax.Array,
    noise_amp: jax.Array,
    tick: jax.Array,
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    ignored_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
    scene: Scene,
    live_rows: jax.Array | None = None,
) -> PairSums:
    """Fixed-halo pair sums over pre-sorted operands, in the same order.

    ``live_rows`` (optional traced scalar, batch-uniform under vmap — see
    ``_pass_scan``) caps the chunk sweep at ``ceil(live_rows / cs)`` live
    chunks.  It must upper-bound this crate's alive count; live particles
    beyond it are skipped and counted into ``PairSums.overflow`` (the same
    countable-degradation channel as the halo), never lost silently.
    ``None`` keeps the full static sweep (single-crate default).
    """
    nx, ny = scene.grid_nx, scene.grid_ny
    halo = scene.chunk_halo
    cs = scene.chunk_cs
    P = pos.shape[0]
    dtype = pos.dtype
    f32 = jnp.float32

    p_pad = ((P + cs - 1) // cs) * cs
    pad = (0, p_pad - P)
    af = alive.astype(f32)
    iota = jnp.arange(P, dtype=jnp.int32)
    tick_i = jnp.asarray(tick, jnp.int32)
    amp = noise_amp.astype(f32)
    px = pos[:, 0].astype(f32)
    py = pos[:, 1].astype(f32)
    npx = px + (_u01(iota * 2, tick_i) - 0.5) * amp
    npy = py + (_u01(iota * 2 + 1, tick_i) - 0.5) * amp
    rowf = (sorted_cid // nx).astype(f32)  # dead cid = NC -> row ny, masked

    def col(x):
        return jnp.pad(x, pad)

    diam = diameter.astype(f32)
    sm = surface_smoothing.astype(f32)
    tp = target_pressure.astype(f32)
    bal = spring_overlap_balance.astype(f32)

    NC = jnp.asarray(nx * ny, jnp.int32)
    n_alive = jnp.searchsorted(sorted_cid, NC).astype(jnp.int32)
    # The sweep bound must stay batch-uniform under vmap, so live_rows is
    # used as-is (NOT min'd with the per-crate n_alive, which is batched).
    bound = None if live_rows is None else jnp.asarray(live_rows, jnp.int32)

    feat_a = jnp.stack(
        [col(px), col(py), col(npx), col(npy), col(rowf), col(af)], axis=-1
    )
    out_a = _pass_scan(
        feat_a, halo, 4, "a", diam, sm, tp, bal, False, n_alive=bound, cs=cs
    )
    w_sum, sx, sy, cnt = (out_a[:P, k] for k in range(4))
    cp = jnp.where(cnt > 0, jnp.maximum(0.0, w_sum - ignored_pressure), 0.0)

    n_out_b = 8 if scene.enable_spring else 6
    feat_b = jnp.stack(
        [
            col(px),
            col(py),
            col(npx),
            col(npy),
            col(rowf),
            col(af),
            col(vel[:, 0].astype(f32)),
            col(vel[:, 1].astype(f32)),
            col(cp),
            col(sx),
            col(sy),
        ],
        axis=-1,
    )
    out_b = _pass_scan(
        feat_b,
        halo,
        n_out_b,
        "b",
        diam,
        sm,
        tp,
        bal,
        scene.enable_spring,
        n_alive=bound,
        cs=cs,
    )

    lost = _lost_pairs(sorted_cid, n_alive, nx, ny, halo, p_pad // cs, cs)
    if bound is not None:
        # A too-small caller bound skips chunks holding live selves; count
        # those rows into overflow so the degradation is visible, like the
        # halo loss (the swept prefix is ceil(bound/cs) chunks).
        swept = (bound + cs - 1) // cs * cs
        lost = lost + jnp.maximum(n_alive - swept, 0)

    if scene.enable_spring:
        spring_real = out_b[:P, 4:6].astype(dtype)
        v0 = 6
    else:
        spring_real = jnp.zeros((P, 2), dtype)
        v0 = 4
    return PairSums(
        p_i=cp.astype(dtype),
        dv_tension=out_b[:P, 0:2].astype(dtype),
        pressure_real=out_b[:P, 2:4].astype(dtype),
        spring_real=spring_real,
        visc_vsum=out_b[:P, v0 : v0 + 2].astype(dtype),
        nbr_cnt=cnt.astype(dtype),
        overflow=lost.astype(jnp.int32),
    )


def neighbor_forces_chunked(
    pos: jax.Array,
    vel: jax.Array,
    alive: jax.Array,
    noise_amp: jax.Array,
    tick: jax.Array,
    diameter: jax.Array,
    surface_smoothing: jax.Array,
    target_pressure: jax.Array,
    ignored_pressure: jax.Array,
    spring_overlap_balance: jax.Array,
    scene: Scene,
    live_rows: jax.Array | None = None,
) -> PairSums:
    """Particle-order convenience wrapper (tests): sort, run, un-permute."""
    P = pos.shape[0]
    cid = cell_ids_grid(pos, alive, scene)
    order = jnp.argsort(cid)
    inv = jnp.zeros((P,), jnp.int32).at[order].set(
        jnp.arange(P, dtype=jnp.int32)
    )
    sums = neighbor_forces_chunked_sorted(
        pos[order],
        vel[order],
        alive[order],
        cid[order],
        noise_amp,
        tick,
        diameter,
        surface_smoothing,
        target_pressure,
        ignored_pressure,
        spring_overlap_balance,
        scene,
        live_rows=live_rows,
    )
    return PairSums(
        p_i=sums.p_i[inv],
        dv_tension=sums.dv_tension[inv],
        pressure_real=sums.pressure_real[inv],
        spring_real=sums.spring_real[inv],
        visc_vsum=sums.visc_vsum[inv],
        nbr_cnt=sums.nbr_cnt[inv],
        overflow=sums.overflow,
    )
