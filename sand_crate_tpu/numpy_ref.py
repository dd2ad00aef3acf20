"""NumPy twin of the physics tick — the fidelity oracle.

A float64, variable-size, dense-matrix re-expression of the reference
semantics (/root/reference/src/crate/crate.py:91-361), used to gate the
compiled TPU step: trajectories from :func:`sand_crate_tpu.physics.step` must
match this implementation within float tolerance at small N (BASELINE.json
"bit-stable vs NumPy at 1k particles").

It is intentionally *not* the reference code: neighbor relations are an exact
dense P x P within-diameter mask (valid below the reference's 20-neighbor trim
threshold, collision_detector.py:6,44-45), all per-particle Python loops are
replaced by masked matrix reductions, and rigid bodies use the explicit
segment->body map (fixing the bookkeeping bug at crate.py:73-85).  At modest
density with collider noise disabled it follows the reference's trajectories
step for step; see tests/test_reference_parity.py which checks that directly
against the upstream code.

Stochastic elements (source emission, collider noise) use ``np.random`` and
are NOT bit-matched to the JAX engine; fidelity tests disable them.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .config import BODY_FIXED, BODY_FREE, BODY_MOTORED, WorldConfig
from .scene import place_segments

EPS = 1e-12


@dataclass
class NpState:
    pos: np.ndarray  # (N, 2) f64
    vel: np.ndarray  # (N, 2) f64
    pressure: np.ndarray  # (N,) f64
    segments: np.ndarray  # (S, 2, 2) f64
    body_lin_vel: np.ndarray  # (B, 2)
    body_ang_vel: np.ndarray  # (B,)
    time: float = 0.0
    tick: int = 0


@dataclass
class NpScene:
    seg_body: np.ndarray  # (S,) int
    body_kind: np.ndarray  # (B,) int
    body_center: np.ndarray  # (B, 2)
    motor_lin: np.ndarray  # (B, 2, 4)
    motor_ang: np.ndarray  # (B, 4)
    sources: list = field(default_factory=list)  # ParticleSourceConfig list
    enable_spring: bool = False
    # ((body_idx, channel 0=vx/1=vy/2=ang, ExprMotor), ...) — same expression
    # motors the jitted step traces in (state.Scene.motor_exprs), evaluated
    # here in float64 numpy.
    motor_exprs: tuple = ()


def build_np_scene(world: WorldConfig) -> tuple[NpScene, NpState]:
    seg_list, seg_body = [], []
    kinds, centers, mlin, mang, lin0, ang0 = [], [], [], [], [], []
    motor_exprs = []
    for b, body in enumerate(world.rigid_bodies):
        seg = place_segments(body.segments, body.scale, body.rotation, body.position)
        seg_list.append(seg)
        seg_body.extend([b] * len(seg))
        kinds.append(body.kind)
        centers.append(body.position)
        mlin.append([body.motor_vx.as_tuple(), body.motor_vy.as_tuple()])
        mang.append(body.motor_ang.as_tuple())
        lin0.append(body.center_velocity)
        ang0.append(body.angular_velocity0)
        if body.kind == BODY_MOTORED:
            for ch, spec in enumerate((body.motor_vx, body.motor_vy, body.motor_ang)):
                if spec.expr is not None:
                    motor_exprs.append((b, ch, spec.expr))
    segments = (
        np.concatenate(seg_list) if seg_list else np.zeros((0, 2, 2))
    ).astype(np.float64)
    scene = NpScene(
        seg_body=np.asarray(seg_body, int),
        body_kind=np.asarray(kinds or [BODY_FIXED], int),
        body_center=np.asarray(centers or [(0.0, 0.0)], float),
        motor_lin=np.asarray(mlin or [[(0,) * 4] * 2], float),
        motor_ang=np.asarray(mang or [(0,) * 4], float),
        sources=list(world.particle_sources),
        motor_exprs=tuple(motor_exprs),
    )
    state = NpState(
        pos=np.zeros((0, 2)),
        vel=np.zeros((0, 2)),
        pressure=np.zeros(0),
        segments=segments,
        body_lin_vel=np.asarray(lin0 or [(0.0, 0.0)], float),
        body_ang_vel=np.asarray(ang0 or [0.0], float),
    )
    return scene, state


def _motor(motor: np.ndarray, t: float) -> np.ndarray:
    amp, freq, phase, offset = np.moveaxis(motor, -1, 0)
    return offset + amp * np.cos(freq * t + phase)


def _rot90cw(v: np.ndarray) -> np.ndarray:
    return np.stack([v[..., 1], -v[..., 0]], axis=-1)


def _body_point_vel(points, body_idx, sc: NpScene, st: NpState) -> np.ndarray:
    c = sc.body_center[body_idx]
    return st.body_lin_vel[body_idx] + st.body_ang_vel[body_idx][..., None] * _rot90cw(
        points - c
    )


def step_numpy(st: NpState, coeff: dict, sc: NpScene, rng: np.random.Generator | None = None) -> NpState:
    """One tick with reference semantics (crate.py:91-129 order)."""
    dt = float(coeff["dt"])
    r = float(coeff["particle_radius"])
    diam = 2.0 * r
    gravity = np.asarray(coeff["gravity"], float)
    noise_level = float(coeff["collider_noise_level"])
    if noise_level != 0.0 and rng is None:
        raise ValueError("collider noise requires an rng")

    pos = st.pos.astype(np.float64).copy()
    vel = st.vel.astype(np.float64).copy()

    # 1. spawn (crate.py:138-147)
    if rng is not None:
        for src in sc.sources:
            if src.active_ticks <= st.tick:
                continue
            budget = int(coeff["max_particles"]) - len(pos)
            n = int(min(rng.binomial(int(src.flow), dt), budget))
            if n <= 0:
                continue
            p = (rng.random((n, 2)) - 0.5) * src.radius + np.asarray(src.position)
            v = np.asarray(src.velocity) + (rng.random((n, 2)) - 0.5) * src.noise
            pos = np.concatenate([pos, p])
            vel = np.concatenate([vel, v])

    # cull (crate.py:149-159)
    keep = np.all((pos >= -r) & (pos <= 1.0 + r), axis=1)
    pos, vel = pos[keep], vel[keep]
    N = len(pos)
    S = len(st.segments)

    # 2. advance bodies (crate.py:363-365, rigid_body.py:42-68)
    time = st.time + dt
    motored = sc.body_kind == BODY_MOTORED
    body_lin = np.where(motored[:, None], _motor(sc.motor_lin, time), st.body_lin_vel)
    body_ang = np.where(motored, _motor(sc.motor_ang, time), st.body_ang_vel)
    for b, ch, fn in sc.motor_exprs:  # expression motors (config.ExprMotor)
        if ch == 2:
            body_ang[b] = float(fn(time, xp=np))
        else:
            body_lin[b, ch] = float(fn(time, xp=np))
    st2 = NpState(pos, vel, st.pressure, st.segments.copy(), body_lin, body_ang, time, st.tick)
    moving = (sc.body_kind != BODY_FIXED)[sc.seg_body]
    ends_vel = _body_point_vel(st2.segments, sc.seg_body[:, None], sc, st2)
    segments = st2.segments + np.where(moving[:, None, None], ends_vel * dt, 0.0)
    st2.segments = segments

    if N == 0:
        st2.pressure = np.zeros(0)
        st2.tick += 1
        return st2

    # 3. ghosts on pre-fix positions (crate.py:213-243)
    a = segments[:, 0]
    ab = segments[:, 1] - a
    ap = pos[:, None] - a[None]
    tproj = np.clip(
        (ap * ab[None]).sum(-1) / np.maximum((ab * ab).sum(-1), EPS)[None], 0, 1
    )
    contact = a[None] + ab[None] * tproj[..., None]  # (N,S,2)
    seg_dist = np.linalg.norm(contact - pos[:, None], axis=-1)
    gmask = seg_dist <= r * 1.2  # (N,S)
    gvec = 2.0 * (pos[:, None] - contact)
    gvel = _body_point_vel(contact, np.broadcast_to(sc.seg_body[None], gmask.shape), sc, st2)
    gm = gmask.astype(float)

    # hard wall fix (crate.py:202-211)
    gnorm = np.linalg.norm(gvec, axis=-1)
    vrd = np.maximum(r / np.maximum(gnorm, EPS), 0.5)
    pos = pos + np.einsum("ns,nsd->nd", gm * (vrd - 0.5), gvec)

    # 4. neighbors: exact dense within-diameter mask (collision_detector.py
    #    semantics below the 20-neighbor trim) + collider population
    #    (crate.py:161-175)
    rel_raw = pos[:, None] - pos[None, :]  # (N,N,2) i - j
    if noise_level != 0.0:
        rel_raw = rel_raw - (rng.random((N, N, 2)) - 0.5) * diam * noise_level
    dmat_raw = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    m = (dmat_raw <= diam) & ~np.eye(N, dtype=bool)  # neighbor mask on raw pos
    dmat = np.linalg.norm(rel_raw, axis=-1)  # noisy distances for force math
    nhat = rel_raw / np.maximum(dmat, EPS)[..., None]
    mf = m.astype(float)
    vel_snap = vel.copy()  # (N,2); v_j snapshot (crate.py:175)

    # 5. pressures (crate.py:261-284)
    w = (1.0 - np.clip(dmat / diam, 0.0, 1.0)) * mf
    p = np.maximum(0.0, w.sum(1) - float(coeff["ignored_pressure"]))
    p = np.where(m.any(1), p, 0.0)

    # 6. tension (crate.py:335-358)
    s = np.einsum("nk,nkd->nd", (1.0 - w) * w * mf, nhat)
    align = ((s[:, None] - s[None, :]) * nhat).sum(-1) * float(
        coeff["surface_smoothing"]
    )
    tpf = p[None, :] + p[:, None] - 2.0 * float(coeff["target_pressure"])
    vel = vel + dt * np.einsum("nk,nkd->nd", mf * (align + tpf), nhat)

    # 7. gravity (crate.py:309-314)
    vel = vel + dt * gravity
    st2.body_lin_vel = body_lin + np.where(
        (sc.body_kind == BODY_FREE)[:, None], dt * gravity, 0.0
    )

    # 8. pressure force incl. ghost push-off (crate.py:286-307)
    real = np.einsum("nk,nkd->nd", mf * (p[:, None] + p[None, :]), nhat)
    ghost = np.einsum("ns,nsd->nd", gm * p[:, None], gvec)
    vel = vel + dt * float(coeff["pressure_amplifier"]) * (real + ghost)

    # 9. spring (crate.py:325-333; disabled by default like crate.py:117-118)
    if sc.enable_spring:
        bal = float(coeff["spring_overlap_balance"])
        pull = np.einsum("nk,nkd->nd", mf * (bal - w), nhat) + np.einsum(
            "ns,nsd->nd", gm * bal, gvec
        )
        total = mf.sum(1) + gm.sum(1)
        has = total > 0
        vel[has] += (
            dt * float(coeff["spring_amplifier"]) * pull[has] / total[has][:, None]
        )

    # 10. viscosity: stale v_j, fresh v_i (crate.py:316-323)
    vel = vel + dt * float(coeff["viscosity"]) * (
        mf @ vel_snap - mf.sum(1)[:, None] * vel
    )

    # 11. wall bounce (crate.py:245-259)
    cnt = gm.sum(1)
    denom = np.maximum(cnt, 1.0)[:, None]
    normal = np.einsum("ns,nsd->nd", gm, gvec) / denom
    cvel = np.einsum("ns,nsd->nd", gm, gvel) / denom
    n_unit = normal / np.maximum(np.linalg.norm(normal, axis=-1, keepdims=True), EPS)
    approach = ((vel - cvel) * n_unit).sum(-1)
    hit = (cnt > 0) & (approach < 0)
    vel = vel + np.where(
        hit[:, None],
        -approach[:, None] * n_unit * (1.0 + float(coeff["wall_collision_decay"])),
        0.0,
    )

    # 12. CCD velocity clamp (crate.py:177-200, geometry_utils.py:141-209)
    if S > 0:
        nrm = _rot90cw(ab)
        off = nrm * r / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), EPS)
        walls = np.concatenate(
            [
                np.stack([a + off, segments[:, 1] + off], axis=1),
                np.stack([segments[:, 1] - off, a - off], axis=1),
            ]
        )  # (2S,2,2)
        c = walls[:, 0][None]
        d = walls[:, 1][None]
        aa = pos[:, None]
        bb = (pos + vel * dt)[:, None]

        def orient(p1, q1, r1):
            return np.sign(
                (q1[..., 0] - p1[..., 0]) * (r1[..., 1] - q1[..., 1])
                - (q1[..., 1] - p1[..., 1]) * (r1[..., 0] - q1[..., 0])
            )

        approaching = (_rot90cw(d - c) * (bb - aa)).sum(-1) < 0
        crossing = (
            approaching
            & (orient(aa, bb, c) != orient(aa, bb, d))
            & (orient(c, d, aa) != orient(c, d, bb))
        )
        cd = d - c
        den = cd[..., 0] * (vel * dt)[:, None, 1] - cd[..., 1] * (vel * dt)[:, None, 0]
        num = (aa - c)[..., 0] * cd[..., 1] - (aa - c)[..., 1] * cd[..., 0]
        t_hit = num / np.where(np.abs(den) > EPS, den, np.where(den >= 0, EPS, -EPS))
        factor = np.min(np.where(crossing, t_hit, np.inf), axis=1)
        vel = vel * np.minimum(1.0, factor)[:, None]

    # 13. integrate (crate.py:360-361)
    pos = pos + dt * vel

    st2.pos, st2.vel, st2.pressure = pos, vel, p
    st2.tick += 1
    return st2
