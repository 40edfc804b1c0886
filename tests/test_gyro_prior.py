"""Gyro rotation priors (fusion/gyro_prior.py): integration accuracy,
VO-delta sign convention, windowing, and extrinsic handling."""

import numpy as np

from aria_slam_tpu.fusion import gyro_prior


def test_constant_rate_integration_and_convention():
    # constant yaw rate 0.5 rad/s about y, 200 Hz, frames at 10 Hz
    imu_ts = np.arange(1, 101) / 200.0
    gyro = np.tile([0.0, 0.5, 0.0], (100, 1))
    frame_ts = np.array([0.0, 0.1, 0.2, 0.5])
    Rs, ok = gyro_prior.pair_rotations(imu_ts, gyro, frame_ts)
    assert ok.all()
    # over 0.1 s: yaw 0.05 rad. R_wc(t1) = R_wc(t0) exp(w dt) and the
    # VO convention is R_vo = DeltaR^T
    a = 0.05
    dR = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                   [-np.sin(a), 0, np.cos(a)]])
    np.testing.assert_allclose(Rs[0], dR.T, atol=1e-5)
    # 0.2 -> 0.5 s: 0.15 rad
    a3 = 0.15
    tr = (np.trace(Rs[2]) - 1) / 2
    np.testing.assert_allclose(np.arccos(np.clip(tr, -1, 1)), a3, atol=1e-4)


def test_matches_ground_truth_trajectory_rates():
    """Integrate the synthetic-scene gyro convention (R^T Rdot body
    rates) and recover the trajectory's relative rotations to ~0.01 deg."""
    from aria_slam_tpu.io import synthetic_scene

    hz, fps = 200.0, 10.0
    ti = np.arange(1, int(2 * hz) + 1) / hz
    dt = 1e-4
    _, R_p = synthetic_scene.trajectory(ti - dt, kind="rotloop", period=12.0)
    _, R_c = synthetic_scene.trajectory(ti, kind="rotloop", period=12.0)
    _, R_n = synthetic_scene.trajectory(ti + dt, kind="rotloop", period=12.0)
    dR = np.einsum("nji,njk->nik", R_c, (R_n - R_p) / (2 * dt))
    gyro = np.stack([dR[:, 2, 1], dR[:, 0, 2], dR[:, 1, 0]], -1)

    frame_ts = np.arange(0, 20) / fps
    Rs, ok = gyro_prior.pair_rotations(ti, gyro, frame_ts)
    assert ok.all()
    _, R_f = synthetic_scene.trajectory(frame_ts, kind="rotloop", period=12.0)
    for i in range(len(frame_ts) - 1):
        R_vo_gt = R_f[i + 1].T @ R_f[i]
        err = Rs[i] @ R_vo_gt.T
        ang = np.degrees(np.arccos(np.clip((np.trace(err) - 1) / 2, -1, 1)))
        # 200 Hz Euler discretization on fast panning: ~0.02 deg —
        # still ~30x below the two-view VO's 0.8 deg median
        assert ang < 0.05, f"pair {i}: {ang:.4f} deg"


def test_empty_and_sparse_windows_flagged_invalid():
    Rs, ok = gyro_prior.pair_rotations(np.array([]), np.zeros((0, 3)),
                                       np.array([0.0, 0.1]))
    assert not ok.any()
    # one sample in the window < min_samples=2
    Rs, ok = gyro_prior.pair_rotations(np.array([0.05]),
                                       np.array([[0.0, 1.0, 0.0]]),
                                       np.array([0.0, 0.1]))
    assert not ok.any()
    np.testing.assert_allclose(Rs[0], np.eye(3))  # identity fallback


def test_extrinsic_rotation_applied():
    # body rotates about its y; camera frame is body rotated 90 deg
    # about z, so the same motion is about the camera's x axis
    imu_ts = np.arange(1, 21) / 200.0
    gyro = np.tile([0.0, 0.4, 0.0], (20, 1))
    c, s = 0.0, 1.0
    R_cam_imu = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
    Rs, ok = gyro_prior.pair_rotations(imu_ts, gyro, np.array([0.0, 0.1]),
                                       R_cam_imu=R_cam_imu)
    assert ok[0]
    ax = Rs[0] - Rs[0].T  # skew part ~ -2 sin(a) * axis_hat
    axis = np.array([ax[2, 1], ax[0, 2], ax[1, 0]])
    axis /= np.linalg.norm(axis)
    np.testing.assert_allclose(np.abs(axis), [1.0, 0.0, 0.0], atol=1e-6)
