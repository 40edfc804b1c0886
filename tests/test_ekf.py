"""EKF validation with the synthetic circular-motion harness
(parity: reference experiments/benchmark_imu.cpp — 200 Hz IMU +
20 Hz visual updates, fused-vs-analytic-GT error)."""

import numpy as np
import jax
import jax.numpy as jnp

from aria_slam_tpu.config import EkfConfig
from aria_slam_tpu.core import lie
from aria_slam_tpu.fusion import ekf, synthetic

CFG = EkfConfig()


def _vo_stream(data, duration_s=10.0, vo_hz=20.0, offset=0.001):
    vo_t = (np.arange(int(duration_s * vo_hz)) / vo_hz + offset).astype(np.float32)
    vo_R = data["gt_rot"](vo_t).astype(np.float32)
    vo_p = data["gt_pos"](vo_t).astype(np.float32)
    return vo_t, vo_R, vo_p


def test_fused_trajectory_tracks_ground_truth():
    data = synthetic.circular_motion()
    vo_t, vo_R, vo_p = _vo_stream(data)
    pos, quat = jax.jit(
        lambda *a: ekf.run_sequence(*a, CFG)
    )(
        jnp.asarray(data["imu_t"]),
        jnp.asarray(data["accel"]),
        jnp.asarray(data["gyro"]),
        jnp.asarray(vo_t),
        jnp.asarray(vo_R),
        jnp.asarray(vo_p),
    )
    pos = np.asarray(pos)
    gt = data["gt_pos"](vo_t)
    err = np.linalg.norm(pos - gt, axis=1)
    # steady-state (skip the first updates while biases settle)
    assert err[5:].mean() < 0.05, f"mean fused error {err[5:].mean():.4f} m"
    assert err[5:].max() < 0.15, f"max fused error {err[5:].max():.4f} m"


def test_imu_only_prediction_between_updates():
    """With VO only every 1 s, IMU propagation must carry the state:
    error bounded well below the radius (pure dead-reckoning sanity)."""
    data = synthetic.circular_motion()
    vo_t, vo_R, vo_p = _vo_stream(data, vo_hz=1.0)
    pos, _ = ekf.run_sequence(
        jnp.asarray(data["imu_t"]),
        jnp.asarray(data["accel"]),
        jnp.asarray(data["gyro"]),
        jnp.asarray(vo_t),
        jnp.asarray(vo_R),
        jnp.asarray(vo_p),
        CFG,
    )
    err = np.linalg.norm(np.asarray(pos) - data["gt_pos"](vo_t), axis=1)
    assert err[2:].mean() < 0.5, f"dead-reckoning error {err[2:].mean():.3f} m"


def test_init_from_first_visual_pose():
    """Parity: EKF initializes state from the first VO measurement
    (IMU.cpp:224-245)."""
    state = ekf.init_state()
    assert not bool(state.initialized)
    R0 = jnp.eye(3)
    t0 = jnp.array([1.0, 2.0, 3.0])
    state = ekf.update(state, R0, t0, jnp.asarray(0.0), CFG)
    assert bool(state.initialized)
    np.testing.assert_allclose(np.asarray(state.pos), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.vel), 0.0, atol=1e-6)


def test_dt_gating_rejects_bad_timestamps():
    """Parity: dt <= 0 or dt > 0.1 s skips propagation (IMU.cpp:146-149)."""
    state = ekf.init_state()
    state = ekf.update(state, jnp.eye(3), jnp.zeros(3), jnp.asarray(0.0), CFG)
    a = jnp.array([0.0, 0.0, 9.81])
    w = jnp.zeros(3)
    s1 = ekf.predict(state, jnp.asarray(0.005), a, w, CFG)
    # big gap: must be gated (state unchanged except timestamp)
    s2 = ekf.predict(s1, jnp.asarray(5.0), a, w, CFG)
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(s1.pos), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s2.P), np.asarray(s1.P), atol=1e-7)
    # backwards time: gated too
    s3 = ekf.predict(s2, jnp.asarray(4.0), a, w, CFG)
    np.testing.assert_allclose(np.asarray(s3.pos), np.asarray(s2.pos), atol=1e-7)


def test_covariance_stays_symmetric_psd():
    data = synthetic.circular_motion(duration_s=2.0)
    vo_t, vo_R, vo_p = _vo_stream(data, duration_s=2.0)
    state = ekf.init_state()
    state = ekf.update(state, jnp.asarray(vo_R[0]), jnp.asarray(vo_p[0]),
                       jnp.asarray(vo_t[0]), CFG)
    for i in range(50):
        state = ekf.predict(
            state,
            jnp.asarray(data["imu_t"][i]),
            jnp.asarray(data["accel"][i]),
            jnp.asarray(data["gyro"][i]),
            CFG,
        )
    P = np.asarray(state.P)
    np.testing.assert_allclose(P, P.T, atol=1e-8)
    assert np.linalg.eigvalsh(P).min() > 0


def test_frame_step_matches_incremental():
    """frame_step (padded IMU window + VO) == manual predict loop + update."""
    data = synthetic.circular_motion(duration_s=1.0)
    state = ekf.init_state()
    state = ekf.update(state, jnp.eye(3), jnp.asarray(data["gt_pos"](0.0)[()]),
                       jnp.asarray(0.0), CFG)

    window = 16
    n_used = 10
    imu_t = np.zeros(window, np.float32)
    imu_a = np.zeros((window, 3), np.float32)
    imu_w = np.zeros((window, 3), np.float32)
    imu_v = np.zeros(window, bool)
    imu_t[:n_used] = data["imu_t"][1 : n_used + 1]
    imu_a[:n_used] = data["accel"][1 : n_used + 1]
    imu_w[:n_used] = data["gyro"][1 : n_used + 1]
    imu_v[:n_used] = True

    ft = data["imu_t"][n_used]
    R_vo = jnp.asarray(data["gt_rot"](ft).astype(np.float32))
    t_vo = jnp.asarray(data["gt_pos"](ft).astype(np.float32))

    out = ekf.frame_step(
        state, jnp.asarray(imu_t), jnp.asarray(imu_a), jnp.asarray(imu_w),
        jnp.asarray(imu_v), R_vo, t_vo, jnp.asarray(True), jnp.asarray(ft), CFG,
    )

    ref = state
    for i in range(n_used):
        ref = ekf.predict(ref, jnp.asarray(imu_t[i]), jnp.asarray(imu_a[i]),
                          jnp.asarray(imu_w[i]), CFG)
    ref = ekf.update(ref, R_vo, t_vo, jnp.asarray(ft), CFG)

    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.P), np.asarray(ref.P), atol=1e-6)


def test_rts_smoother_beats_causal_filter():
    """VERDICT r4 missing #2: the causal filter's output lags its input,
    so on a noisy VO stream the RTS-smoothed track must beat the
    filtered one against analytic GT (the smoother sees the future
    symmetrically). Also pins the no-regression direction: smoothing a
    CLEAN stream must not blow it up (deltas stay small and finite)."""
    data = synthetic.circular_motion()
    vo_t, vo_R, vo_p = _vo_stream(data)
    rng = np.random.default_rng(7)
    vo_noisy = vo_p + rng.normal(0, 0.05, vo_p.shape).astype(np.float32)

    args = (
        jnp.asarray(data["imu_t"]),
        jnp.asarray(data["accel"]),
        jnp.asarray(data["gyro"]),
        jnp.asarray(vo_t),
        jnp.asarray(vo_R),
        jnp.asarray(vo_noisy),
    )
    pos_f, _ = jax.jit(lambda *a: ekf.run_sequence(*a, CFG))(*args)
    pos_s, quat_s = jax.jit(
        lambda *a: ekf.run_sequence(*a, CFG, smooth=True))(*args)
    gt = data["gt_pos"](vo_t)
    err_f = np.linalg.norm(np.asarray(pos_f) - gt, axis=1)[5:]
    err_s = np.linalg.norm(np.asarray(pos_s) - gt, axis=1)[5:]
    assert np.all(np.isfinite(np.asarray(pos_s)))
    assert np.all(np.isfinite(np.asarray(quat_s)))
    assert err_s.mean() < err_f.mean(), (
        f"smoothed {err_s.mean():.4f} m not better than "
        f"filtered {err_f.mean():.4f} m")

    # clean stream: smoothing must not degrade a near-perfect input
    pos_fc, _ = jax.jit(lambda *a: ekf.run_sequence(*a, CFG))(
        *args[:5], jnp.asarray(vo_p))
    pos_sc, _ = jax.jit(lambda *a: ekf.run_sequence(*a, CFG, smooth=True))(
        *args[:5], jnp.asarray(vo_p))
    err_fc = np.linalg.norm(np.asarray(pos_fc) - gt, axis=1)[5:]
    err_sc = np.linalg.norm(np.asarray(pos_sc) - gt, axis=1)[5:]
    assert err_sc.mean() <= err_fc.mean() * 1.05 + 1e-4, (
        f"smoothing degraded a clean stream: {err_fc.mean():.5f} -> "
        f"{err_sc.mean():.5f} m")
