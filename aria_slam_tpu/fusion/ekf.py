"""15-state error-state EKF for visual-inertial fusion.

Parity: reference SensorFusion (src/legacy/IMU.cpp:104-305,
include/legacy/IMU.hpp:53-118). Same state layout
[p(3), v(3), dtheta(3), b_a(3), b_g(3)], same F/G Jacobians, same
Joseph-form update, same noise defaults, same dt gating (0 < dt <= 0.1 s),
same init-from-first-visual-pose behavior.

TPU design (SURVEY.md §3.3): predict/update are pure functions over an
EkfState pytree; a frame step consumes a *padded* window of IMU samples
via `lax.scan` with a validity mask, then applies the VO update — the
whole 200 Hz / 30 Hz fusion is inside one jitted program. For offline
runs, `run_sequence` scans over the entire measurement stream at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aria_slam_tpu.config import EkfConfig
from aria_slam_tpu.core import lie
from aria_slam_tpu.core.types import EkfState


def init_state(dtype=jnp.float32) -> EkfState:
    """Parity: SensorFusion ctor P_ init (IMU.cpp:108-115)."""
    p_diag = jnp.concatenate(
        [
            jnp.full((3,), 0.01),   # position
            jnp.full((3,), 0.01),   # velocity
            jnp.full((3,), 0.01),   # orientation
            jnp.full((3,), 0.001),  # accel bias
            jnp.full((3,), 0.0001), # gyro bias
        ]
    ).astype(dtype)
    return EkfState(
        pos=jnp.zeros(3, dtype),
        vel=jnp.zeros(3, dtype),
        quat=lie.quat_identity(dtype=dtype),
        ba=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        P=jnp.diag(p_diag),
        last_imu_t=jnp.asarray(-1.0, dtype),
        initialized=jnp.asarray(False),
    )


def pose_covariance(state: EkfState) -> jnp.ndarray:
    """6x6 pose covariance over [dp(3), dtheta(3)]: the marginal of the
    15-state P over the position and orientation-error blocks (parity:
    core::Pose.covariance, include/core/Types.hpp:66-70 — the reference
    declares the field but never fills it; here it is the live EKF
    marginal). Block order matches the reference's Pose (position
    first, orientation second)."""
    idx = jnp.concatenate([jnp.arange(0, 3), jnp.arange(6, 9)])
    return state.P[jnp.ix_(idx, idx)]


def process_noise(cfg: EkfConfig, dtype=jnp.float32) -> jnp.ndarray:
    """12x12 Q: [accel noise, gyro noise, accel bias walk, gyro bias walk]
    (IMU.cpp:117-121)."""
    diag = jnp.concatenate(
        [
            jnp.full((3,), cfg.accel_noise**2),
            jnp.full((3,), cfg.gyro_noise**2),
            jnp.full((3,), cfg.accel_bias_walk**2),
            jnp.full((3,), cfg.gyro_bias_walk**2),
        ]
    ).astype(dtype)
    return jnp.diag(diag)


def measurement_noise(cfg: EkfConfig, dtype=jnp.float32) -> jnp.ndarray:
    diag = jnp.concatenate(
        [jnp.full((3,), cfg.pos_noise**2), jnp.full((3,), cfg.rot_noise**2)]
    ).astype(dtype)
    return jnp.diag(diag)


def predict(state: EkfState, t: jnp.ndarray, accel: jnp.ndarray, gyro: jnp.ndarray,
            cfg: EkfConfig) -> EkfState:
    """One IMU propagation step (parity: predictEKF, IMU.cpp:139-222).

    Gated: no-op (except timestamp bookkeeping) if dt <= 0, dt > max_dt,
    first sample, or filter not initialized.
    """
    return _predict_core(state, t, accel, gyro, cfg)[0]


def _predict_core(state: EkfState, t, accel, gyro, cfg: EkfConfig):
    """predict + the EFFECTIVE error-state transition Jacobian.

    Returns (new_state, F_eff) where F_eff is the 15x15 transition the
    step actually applied: the dynamics Jacobian when the step ran,
    identity when gated — exactly what the RTS backward pass needs
    (a gated step is an identity transition, so the smoothing gain
    collapses to P P^-1 = I and corrections pass through unchanged).
    """
    dt = t - state.last_imu_t
    first = state.last_imu_t < 0
    ok = state.initialized & (~first) & (dt > 0) & (dt <= cfg.max_dt)
    dt = jnp.where(ok, dt, 0.0)

    g = jnp.asarray(cfg.gravity, state.pos.dtype)
    a = accel - state.ba
    w = gyro - state.bg
    R = lie.quat_to_mat(state.quat)

    # nominal state propagation (midpoint-free, matches reference)
    dq = lie.so3_exp_quat(w * dt)
    quat_new = lie.quat_normalize(lie.quat_mul(state.quat, dq))
    a_world = R @ a + g
    pos_new = state.pos + state.vel * dt + 0.5 * a_world * dt * dt
    vel_new = state.vel + a_world * dt

    # error-state Jacobians
    eye3 = jnp.eye(3, dtype=state.P.dtype)
    F = jnp.eye(15, dtype=state.P.dtype)
    Ra = R @ lie.skew(a)
    F = F.at[0:3, 3:6].set(eye3 * dt)
    F = F.at[0:3, 6:9].set(-0.5 * Ra * dt * dt)
    F = F.at[0:3, 9:12].set(-0.5 * R * dt * dt)
    F = F.at[3:6, 6:9].set(-Ra * dt)
    F = F.at[3:6, 9:12].set(-R * dt)
    F = F.at[6:9, 12:15].set(-eye3 * dt)

    G = jnp.zeros((15, 12), state.P.dtype)
    G = G.at[0:3, 0:3].set(0.5 * R * dt * dt)
    G = G.at[3:6, 0:3].set(R * dt)
    G = G.at[6:9, 3:6].set(eye3 * dt)
    G = G.at[9:12, 6:9].set(eye3 * dt)
    G = G.at[12:15, 9:12].set(eye3 * dt)

    Q = process_noise(cfg, state.P.dtype)
    P_new = F @ state.P @ F.T + G @ Q @ G.T
    P_new = 0.5 * (P_new + P_new.T)

    new = EkfState(
        pos=jnp.where(ok, pos_new, state.pos),
        vel=jnp.where(ok, vel_new, state.vel),
        quat=jnp.where(ok, quat_new, state.quat),
        ba=state.ba,
        bg=state.bg,
        P=jnp.where(ok, P_new, state.P),
        last_imu_t=jnp.where(state.initialized, t, state.last_imu_t),
        initialized=state.initialized,
    )
    # dt was zeroed above when gated, so every dt-scaled block of F
    # vanished and F already IS the identity in that case
    return new, F


def update(state: EkfState, R_meas: jnp.ndarray, t_meas: jnp.ndarray,
           timestamp: jnp.ndarray, cfg: EkfConfig,
           meas_valid: jnp.ndarray | bool = True) -> EkfState:
    """One visual-pose update (parity: addVisualPose/updateEKF,
    IMU.cpp:224-305). First valid measurement initializes the state."""
    return _update_core(state, R_meas, t_meas, timestamp, cfg, meas_valid)[0]


def _update_core(state: EkfState, R_meas, t_meas, timestamp, cfg: EkfConfig,
                 meas_valid=True):
    """update + the EFFECTIVE error-state correction.

    Returns (new_state, dx_eff, did_init): dx_eff is the 15-vector the
    update actually applied to the error state (K @ innovation when an
    EKF update ran, zeros when gated or initializing) and did_init
    flags the init event — the RTS backward pass needs dx per event and
    must treat initialization as a barrier (states before the first
    visual pose carry no information to smooth)."""
    meas_valid = jnp.asarray(meas_valid)

    # --- initialization branch
    q_meas = lie.mat_to_quat(R_meas)
    do_init = meas_valid & (~state.initialized)

    # --- EKF update branch
    dtype = state.P.dtype
    H = jnp.zeros((6, 15), dtype)
    H = H.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    H = H.at[3:6, 6:9].set(jnp.eye(3, dtype=dtype))

    pos_innov = t_meas - state.pos
    q_err = lie.quat_normalize(lie.quat_mul(q_meas, lie.quat_conj(state.quat)))
    rot_innov = lie.so3_log_quat(q_err)
    innov = jnp.concatenate([pos_innov, rot_innov])

    from aria_slam_tpu.ops.linalg import inv_psd

    Rm = measurement_noise(cfg, dtype)
    S = H @ state.P @ H.T + Rm
    K = state.P @ H.T @ inv_psd(S)  # unrolled 6x6 SPD inverse (TPU-fast)
    dx = K @ innov

    pos_u = state.pos + dx[0:3]
    vel_u = state.vel + dx[3:6]
    quat_u = lie.quat_normalize(lie.quat_mul(lie.so3_exp_quat(dx[6:9]), state.quat))
    ba_u = state.ba + dx[9:12]
    bg_u = state.bg + dx[12:15]

    I_KH = jnp.eye(15, dtype=dtype) - K @ H
    P_u = I_KH @ state.P @ I_KH.T + K @ Rm @ K.T
    P_u = 0.5 * (P_u + P_u.T)

    do_update = meas_valid & state.initialized

    def pick(init_val, upd_val, keep_val):
        return jnp.where(do_init, init_val, jnp.where(do_update, upd_val, keep_val))

    new = EkfState(
        pos=pick(t_meas, pos_u, state.pos),
        vel=pick(jnp.zeros(3, dtype), vel_u, state.vel),
        quat=pick(q_meas, quat_u, state.quat),
        ba=pick(state.ba, ba_u, state.ba),
        bg=pick(state.bg, bg_u, state.bg),
        P=pick(state.P, P_u, state.P),
        last_imu_t=jnp.where(do_init, timestamp, state.last_imu_t),
        initialized=state.initialized | do_init,
    )
    dx_eff = jnp.where(do_update, dx, jnp.zeros(15, dtype))
    return new, dx_eff, do_init


def frame_step(state: EkfState, imu_t: jnp.ndarray, imu_accel: jnp.ndarray,
               imu_gyro: jnp.ndarray, imu_valid: jnp.ndarray,
               R_vo: jnp.ndarray, t_vo: jnp.ndarray, vo_valid: jnp.ndarray,
               frame_t: jnp.ndarray, cfg: EkfConfig) -> EkfState:
    """Online per-frame fusion: scan the padded IMU window (predict per
    valid sample), then apply the VO update. This is the jitted 'fusion'
    stage of the per-frame pipeline step (SURVEY.md §3.2)."""

    def body(s, inp):
        t, a, w, v = inp
        s_pred = predict(s, t, a, w, cfg)
        s = jax.tree_util.tree_map(lambda new, old: jnp.where(v, new, old), s_pred, s)
        return s, None

    state, _ = jax.lax.scan(body, state, (imu_t, imu_accel, imu_gyro, imu_valid))
    return update(state, R_vo, t_vo, frame_t, cfg, vo_valid)


def run_sequence(imu_t, imu_accel, imu_gyro, vo_t, vo_R, vo_t_pos,
                 cfg: EkfConfig, smooth: bool = False):
    """Offline fusion over full streams: merge 200 Hz IMU and 30 Hz VO
    into one time-sorted tagged stream and lax.scan it (SURVEY.md §3.3
    'the lynchpin for the JAX design'). Returns the fused pose at every
    VO timestamp.

    smooth=True runs a Rauch-Tung-Striebel backward pass over the
    error state after the forward filter (VERDICT r4 missing #2: the
    CAUSAL filter output lags its own input, so feeding it the
    loop-closed graph chain left ate_fused strictly worse than the
    chain it consumed — 0.1857 vs 0.1734 m Sim3. The smoother uses
    future measurements symmetrically; offline evaluation is exactly
    where that is legitimate). Reference comparison: euroc_eval.cpp
    ducks this by consuming raw VO while feeding the EKF
    (src/euroc_eval.cpp:203-250) — here the smoothed track is the
    fused output.

    imu_*: (M, ...), vo_*: (V, ...). All float32, times in seconds.

    PRECONDITION: imu_t and vo_t must each be non-decreasing — the
    merge below is two binary searches over already-sorted streams, and
    an unsorted input silently produces a corrupted event order (slots
    collide, others re-process element 0). io/euroc.py sorts both
    streams at load; checked here when called with concrete arrays.
    """
    # validate only HOST arrays: np.ndarray inputs cost nothing to check,
    # while tracers can't be concretized and device arrays would force a
    # D2H copy of the whole stream on every call (ADVICE r3: the old
    # jax.core.Tracer isinstance check is deprecated AND np.asarray
    # copied both streams back from device each call)
    for name, arr in (("imu_t", imu_t), ("vo_t", vo_t)):
        if isinstance(arr, np.ndarray) and arr.shape[0] > 1:
            d = np.diff(arr)
            if np.any(d < 0):
                raise ValueError(
                    f"ekf.run_sequence: {name} is not sorted "
                    f"(first inversion at index "
                    f"{int(np.argmax(d < 0))}); sort the "
                    f"streams by timestamp first (io/euroc.py does)")
    m = imu_t.shape[0]
    v = vo_t.shape[0]
    # build merged stream: tag 0 = IMU, 1 = VO
    all_t = jnp.concatenate([imu_t, vo_t])
    tags = jnp.concatenate([jnp.zeros(m, jnp.int32), jnp.ones(v, jnp.int32)])
    payload_a = jnp.concatenate([imu_accel, vo_t_pos])  # (M+V, 3)
    payload_w = jnp.concatenate([imu_gyro, jnp.zeros((v, 3), imu_gyro.dtype)])
    payload_R = jnp.concatenate(
        [jnp.tile(jnp.eye(3, dtype=vo_R.dtype)[None], (m, 1, 1)), vo_R]
    )
    vo_slot = jnp.concatenate([jnp.full(m, -1, jnp.int32), jnp.arange(v, dtype=jnp.int32)])

    # merge two ALREADY-SORTED streams without a general sort (argsort
    # lowers to a full sort network on this stack — CLAUDE.md; two
    # vectorized binary searches replace it). Equal timestamps keep
    # IMU-before-VO, matching a stable argsort of this concat order.
    pos_imu = jnp.arange(m) + jnp.searchsorted(vo_t, imu_t, side="left")
    pos_vo = jnp.arange(v) + jnp.searchsorted(imu_t, vo_t, side="right")
    dest = jnp.concatenate([pos_imu, pos_vo])          # concat idx -> merged idx
    order = jnp.zeros(m + v, jnp.int32).at[dest].set(
        jnp.arange(m + v, dtype=jnp.int32))            # merged idx -> concat idx
    all_t = all_t[order]
    tags = tags[order]
    payload_a = payload_a[order]
    payload_w = payload_w[order]
    payload_R = payload_R[order]
    vo_slot = vo_slot[order]

    def body(s, inp):
        t, tag, pa, pw, pR = inp
        is_imu = tag == 0
        s_imu, F_imu = _predict_core(s, t, pa, pw, cfg)
        s_vo, dx_vo, did_init = _update_core(s, pR, pa, t, cfg, True)
        s = jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(is_imu, a_, b_), s_imu, s_vo
        )
        eye = jnp.eye(15, dtype=s.P.dtype)
        F_eff = jnp.where(is_imu, F_imu, eye)
        dx_eff = jnp.where(is_imu, jnp.zeros(15, s.P.dtype), dx_vo)
        barrier = (~is_imu) & did_init
        return s, (s.pos, s.quat, s.P, F_eff, dx_eff, barrier)

    state0 = init_state(imu_t.dtype)
    _, (pos_hist, quat_hist, P_hist, F_hist, dx_hist, barrier_hist) = (
        jax.lax.scan(body, state0,
                     (all_t, tags, payload_a, payload_w, payload_R)))

    if smooth:
        pos_hist, quat_hist = _rts_backward(
            pos_hist, quat_hist, P_hist, F_hist, dx_hist, barrier_hist,
            tags)

    # fused pose right after each VO update: scatter VO rows into their
    # slots (IMU rows carry vo_slot = -1 and are dropped)
    is_vo = tags == 1
    out_pos = jnp.zeros((v, 3), pos_hist.dtype).at[vo_slot].add(
        jnp.where(is_vo[:, None], pos_hist, 0.0), mode="drop"
    )
    out_quat = jnp.zeros((v, 4), quat_hist.dtype).at[vo_slot].add(
        jnp.where(is_vo[:, None], quat_hist, 0.0), mode="drop"
    )
    return out_pos, out_quat


def _rts_backward(pos, quat, P, F, dx, barrier, tags):
    """RTS smoothing over the merged event stream's ERROR state.

    Inputs are per-event POST-event quantities from the forward scan:
    P (N,15,15) posterior covariance, F (N,15,15) the transition the
    event applied (dynamics for IMU events, identity for VO events —
    both identity when gated), dx (N,15) the correction a VO update
    applied (zeros otherwise), barrier (N,) the init event, tags (N,)
    0=IMU / 1=VO.

    The recursion (delta_e = smoothed-minus-filtered error at event e):

        P-_{e+1} = F_{e+1} P+_e F^T_{e+1} + GQG^T   (IMU event)
                 = P+_e                             (VO event, F = I)
        C_e      = P+_e F^T_{e+1} (P-_{e+1})^{-1}
        delta_e  = C_e (delta_{e+1} + dx_{e+1})

    The prior covariance needs no extra storage: an IMU event's
    posterior IS its prior (no update), and a VO event's prior is the
    PREVIOUS posterior (identity transition) — so P- comes from the
    stored posteriors on both branches. The init event is a barrier:
    its dx is zero by construction and corrections must not flow into
    the pre-initialization prefix (delta forced to 0 there).

    The 15x15 solve uses the statically-unrolled Cholesky
    (ops/linalg.py — jnp.linalg on small matrices lowers poorly on
    this stack), batched over the 15 rows of P+ F^T.
    """
    from aria_slam_tpu.ops.linalg import cholesky_solve

    dtype = P.dtype
    eps = jnp.eye(15, dtype=dtype) * 1e-10  # f32 Cholesky safety floor

    # step e consumes P+_e and the (e+1) event's F/P/dx/barrier/tag
    P_prev = P[:-1]
    is_imu_next = (tags[1:] == 0)
    P_minus_next = jnp.where(is_imu_next[:, None, None], P[1:], P_prev)
    F_next = F[1:]
    dx_next = dx[1:]
    barrier_next = barrier[1:]

    def bstep(delta, inp):
        Pp, Pm, Fn, dxn, barn = inp
        A = Pp @ Fn.T                      # (15, 15)
        # C = Pp Fn^T Pm^-1: row j of C solves Pm^T c_j = A[j] (Pm sym)
        C = cholesky_solve(Pm + eps, A)    # batched over A's rows
        d = C @ (delta + dxn)
        d = jnp.where(barn, jnp.zeros_like(d), d)
        return d, d

    d_last = jnp.zeros(15, dtype)
    _, deltas = jax.lax.scan(
        bstep, d_last,
        (P_prev, P_minus_next, F_next, dx_next, barrier_next),
        reverse=True)
    deltas = jnp.concatenate([deltas, d_last[None]], axis=0)  # (N, 15)

    pos_s = pos + deltas[:, 0:3]
    quat_s = jax.vmap(
        lambda dth, q: lie.quat_normalize(
            lie.quat_mul(lie.so3_exp_quat(dth), q)))(deltas[:, 6:9], quat)
    return pos_s, quat_s
