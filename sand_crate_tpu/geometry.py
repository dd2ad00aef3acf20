"""Vectorized 2D geometry kernels (JAX).

Functional equivalents of /root/reference/src/crate/utils/geometry_utils.py —
point/segment distance (:7-39), 90-degree rotation (:176-179), segment
inflation (:146-172), crossing tests (:182-222) and the CCD collision
parameter (:141-143) — written as pure jnp ops with division guards so they
are safe under jit/vmap and on padded (masked) inputs.

Shapes: P = particles, S = segments.  All functions are batch-first and
broadcast-friendly; none contain Python control flow on traced values.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-12


def rot90_cw(v: jnp.ndarray) -> jnp.ndarray:
    """(x, y) -> (y, -x) on the last axis (geometry_utils.py:176-179)."""
    return jnp.stack([v[..., 1], -v[..., 0]], axis=-1)


def cross2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """2D scalar cross product on the last axis (geometry_utils.py:136-138)."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def points_to_segments(
    points: jnp.ndarray, segments: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest point on each segment and its distance, for every particle.

    Args:
      points:   (P, 2)
      segments: (S, 2, 2)
    Returns:
      nearest: (P, S, 2), distance: (P, S)

    Equivalent of geometry_utils.py:7-39 (clamped projection onto the
    segment), with a guard for zero-length segments.
    """
    a = segments[:, 0, :]  # (S, 2)
    ab = segments[:, 1, :] - a  # (S, 2)
    ap = points[:, None, :] - a[None]  # (P, S, 2)
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), EPS)  # (S,)
    t = jnp.sum(ap * ab[None], axis=-1) / denom[None]  # (P, S)
    t = jnp.clip(t, 0.0, 1.0)
    nearest = a[None] + ab[None] * t[..., None]  # (P, S, 2)
    d = nearest - points[:, None, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
    return nearest, dist


def pad_segments(segments: jnp.ndarray, pad: jnp.ndarray) -> jnp.ndarray:
    """Inflate each segment into two parallel offset segments (2S, 2, 2).

    First S rows are offset along the clockwise normal keeping a->b order;
    last S rows are the reversed far side, matching geometry_utils.py:146-172
    so each padded copy only blocks approaches from its own side.
    """
    a = segments[:, 0, :]
    b = segments[:, 1, :]
    ab = b - a
    n = rot90_cw(ab)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(n * n, axis=-1, keepdims=True), EPS))
    offset = n * pad / norm
    near = jnp.stack([a + offset, b + offset], axis=1)
    far = jnp.stack([b - offset, a - offset], axis=1)
    return jnp.concatenate([near, far], axis=0)


def _orient(p: jnp.ndarray, q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Orientation sign of triple (p, q, r): broadcasted last-dim-2 points.

    sign((q - p) x (r - q)); matches geometry_utils.py:212-222.
    """
    return jnp.sign(cross2(q - p, r - q))


def segment_crossings(
    move: jnp.ndarray, walls: jnp.ndarray
) -> jnp.ndarray:
    """(P,) movement segments vs (W,) wall segments -> (P, W) crossing map.

    A crossing counts only when the movement opposes the wall's clockwise
    normal (approach-side filter), exactly as geometry_utils.py:182-209.

    Args:
      move:  (P, 2, 2) — [start, end] per particle
      walls: (W, 2, 2)
    """
    a = move[:, None, 0, :]  # (P, 1, 2)
    b = move[:, None, 1, :]
    c = walls[None, :, 0, :]  # (1, W, 2)
    d = walls[None, :, 1, :]
    approaching = jnp.sum(rot90_cw(d - c) * (b - a), axis=-1) < 0.0
    straddle1 = _orient(a, b, c) != _orient(a, b, d)
    straddle2 = _orient(c, d, a) != _orient(c, d, b)
    return approaching & straddle1 & straddle2


def crossing_parameter(
    start: jnp.ndarray,
    delta: jnp.ndarray,
    wall_a: jnp.ndarray,
    wall_ab: jnp.ndarray,
) -> jnp.ndarray:
    """Parameter t along ``delta`` where the path crosses the wall line.

    t = cross(start - wall_a, wall_ab) / cross(wall_ab, delta)
    (geometry_utils.py:141-143), guarded against parallel (zero denominator).
    Broadcasts over leading dims.
    """
    num = cross2(start - wall_a, wall_ab)
    den = cross2(wall_ab, delta)
    safe = jnp.where(jnp.abs(den) > EPS, den, jnp.where(den >= 0, EPS, -EPS))
    return num / safe


def safe_normalize(v: jnp.ndarray, axis: int = -1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return (unit vector, norm) with a zero-safe division."""
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True), 0.0))
    unit = v / jnp.maximum(n, EPS)
    return unit, jnp.squeeze(n, axis=axis)


# ---------------------------------------------------------------------------
# SoA (structure-of-arrays) variants: particle axis LAST (lanes), segment
# axis first (sublanes), x/y as separate arrays.
#
# The AoS forms above produce (P, S) and (P, S, 2) intermediates whose minor
# dims (S ~ 14, or 2) occupy a sliver of the TPU's (8, 128) vector tiles —
# profiled at ~20ms/step of the boundary pipeline at 100k particles.  These
# forms keep every elementwise op on dense (S, P) tiles instead.
# ---------------------------------------------------------------------------


def points_to_segments_soa(
    px: jnp.ndarray, py: jnp.ndarray, segments: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SoA twin of :func:`points_to_segments`.

    Args:   px, py: (P,);  segments: (S, 2, 2)
    Returns (nearest_x, nearest_y, dist), each (S, P).
    """
    ax = segments[:, 0, 0][:, None]  # (S, 1)
    ay = segments[:, 0, 1][:, None]
    abx = (segments[:, 1, 0] - segments[:, 0, 0])[:, None]
    aby = (segments[:, 1, 1] - segments[:, 0, 1])[:, None]
    denom = jnp.maximum(abx * abx + aby * aby, EPS)
    t = jnp.clip(((px[None] - ax) * abx + (py[None] - ay) * aby) / denom, 0.0, 1.0)
    nx = ax + abx * t  # (S, P)
    ny = ay + aby * t
    dx = nx - px[None]
    dy = ny - py[None]
    dist = jnp.sqrt(jnp.maximum(dx * dx + dy * dy, 0.0))
    return nx, ny, dist


def segment_crossings_soa(
    px: jnp.ndarray,
    py: jnp.ndarray,
    mvx: jnp.ndarray,
    mvy: jnp.ndarray,
    walls: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SoA twin of :func:`segment_crossings` + :func:`crossing_parameter`.

    Movement segments [p, p + mv] against wall segments, with the
    approach-side filter (geometry_utils.py:182-209).

    Args:   px, py, mvx, mvy: (P,);  walls: (W, 2, 2)
    Returns (crossing (W, P) bool, t_hit (W, P)).
    """
    cx = walls[:, 0, 0][:, None]  # (W, 1)
    cy = walls[:, 0, 1][:, None]
    wx = (walls[:, 1, 0] - walls[:, 0, 0])[:, None]  # wall direction d - c
    wy = (walls[:, 1, 1] - walls[:, 0, 1])[:, None]
    ax_, ay_ = px[None], py[None]  # (1, P) move start
    bx_, by_ = px[None] + mvx[None], py[None] + mvy[None]  # move end

    # rot90_cw(d - c) . (b - a) < 0  (approach-side filter)
    approaching = (wy * mvx[None] - wx * mvy[None]) < 0.0
    # orient(a, b, c) vs orient(a, b, d): sign((b-a) x (c-b)) etc.
    abx_, aby_ = mvx[None], mvy[None]
    o1 = jnp.sign(abx_ * (cy - by_) - aby_ * (cx - bx_))
    o2 = jnp.sign(abx_ * (cy + wy - by_) - aby_ * (cx + wx - bx_))
    o3 = jnp.sign(wx * (ay_ - cy - wy) - wy * (ax_ - cx - wx))
    o4 = jnp.sign(wx * (by_ - cy - wy) - wy * (bx_ - cx - wx))
    crossing = approaching & (o1 != o2) & (o3 != o4)

    num = (ax_ - cx) * wy - (ay_ - cy) * wx  # cross(start - wall_a, wall_ab)
    den = wx * mvy[None] - wy * mvx[None]  # cross(wall_ab, delta)
    safe = jnp.where(jnp.abs(den) > EPS, den, jnp.where(den >= 0, EPS, -EPS))
    return crossing, num / safe
