"""Trajectory metrics: Umeyama alignment, ATE, position + rotation RPE
(parity: reference computeATE/computeRPE, src/euroc_eval.cpp:28-61; the
rotation RPE is the standard TUM complement the reference lacks)."""

import numpy as np

from aria_slam_tpu.eval import metrics


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def test_ate_alignment_removes_similarity_transform():
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(50, 3))
    R = _rot_z(0.7)
    est = 2.5 * (gt @ R.T) + np.array([1.0, -2.0, 3.0])
    # est differs from gt by an exact similarity transform -> ATE ~ 0
    assert metrics.ate_rmse(est, gt) < 1e-9
    # without scale alignment the 2.5x blowup must show
    assert metrics.ate_rmse(est, gt, with_scale=False) > 0.5


def test_rpe_position():
    gt = np.cumsum(np.ones((30, 3)) * 0.1, axis=0)
    est = gt.copy()
    est[15:] += 0.5  # one jump -> only windows crossing it contribute
    # jump |(0.5,0.5,0.5)| = 0.866 in 10 of 20 windows -> RMSE 0.612
    r = metrics.rpe_rmse(est, gt, delta=10)
    np.testing.assert_allclose(r, 0.866 * np.sqrt(0.5), atol=1e-3)


def test_rpe_rotation_exact_and_perturbed():
    n = 40
    angles = np.linspace(0, 1.0, n)
    gt_R = np.stack([_rot_z(a) for a in angles])
    assert metrics.rpe_rot_rmse_deg(gt_R, gt_R, delta=5) < 1e-5

    # a constant global rotation offset is invisible to RPE
    off = _rot_z(1.1)
    est_R = np.einsum("ij,njk->nik", off, gt_R)
    assert metrics.rpe_rot_rmse_deg(est_R, gt_R, delta=5) < 1e-5

    # a 2-degree relative error per 5-frame window must be measured
    est_R = np.stack([_rot_z(a * (1 + 0.16)) for a in angles])
    r = metrics.rpe_rot_rmse_deg(est_R, gt_R, delta=5)
    assert 0.5 < r < 2.0


def test_associate_and_score_conjugates_extrinsic():
    """A perfect camera-frame estimate of a body-frame GT must score
    rot-RPE ~ 0 — the metric is NOT invariant under the constant
    cam-body extrinsic (EuRoC cam0 T_BS is ~90 deg), so the helper must
    conjugate before differencing (ADVICE r2: euroc_eval.py)."""
    from scipy.spatial.transform import Rotation

    from aria_slam_tpu.io.euroc import EurocData

    n = 30
    ts = np.linspace(0.0, 3.0, n)
    # non-commuting body rotations (varying axes) so an unconjugated
    # comparison cannot accidentally cancel
    rotvecs = np.stack([0.4 * np.sin(ts), 0.3 * ts, 0.2 * np.cos(ts)], 1)
    R_wb = Rotation.from_rotvec(rotvecs)
    pos = np.stack([ts, 0.1 * ts**2, np.zeros(n)], 1)
    qxyzw = R_wb.as_quat()
    gt_quat = np.concatenate([qxyzw[:, 3:4], qxyzw[:, :3]], 1)  # -> wxyz

    # 90-deg extrinsic about x: x_cam = R_cam_imu x_body
    R_ci = Rotation.from_rotvec([np.pi / 2, 0, 0]).as_matrix()
    est_T = np.tile(np.eye(4), (n, 1, 1))
    est_T[:, :3, :3] = R_wb.as_matrix() @ R_ci.T  # R_wc = R_wb R_ci^T
    est_T[:, :3, 3] = pos

    data = EurocData(
        image_ts=ts, image_paths=[""] * n,
        imu_ts=np.zeros(0), imu_gyro=np.zeros((0, 3)),
        imu_accel=np.zeros((0, 3)),
        gt_ts=ts, gt_pos=pos, gt_quat=gt_quat,
        R_cam_imu=R_ci,
    )
    scores, gt_pos, keep = metrics.associate_and_score(data, ts, est_T)
    assert len(keep) == n
    assert scores["ate_rmse_m"] < 1e-6
    assert scores["rpe_rot_deg"] < 1e-3

    # teeth: skipping the conjugation (identity extrinsic on the same
    # camera-frame estimates) must register a large rotation error
    data_id = EurocData(
        image_ts=ts, image_paths=[""] * n,
        imu_ts=np.zeros(0), imu_gyro=np.zeros((0, 3)),
        imu_accel=np.zeros((0, 3)),
        gt_ts=ts, gt_pos=pos, gt_quat=gt_quat,
    )
    raw, _, _ = metrics.associate_and_score(data_id, ts, est_T)
    assert raw["rpe_rot_deg"] > 1.0


def test_quat_to_mat_np_matches_lie():
    import jax.numpy as jnp

    from aria_slam_tpu.core import lie

    rng = np.random.default_rng(1)
    q = rng.normal(size=(8, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R_np = metrics.quat_to_mat_np(q)
    R_jax = np.asarray(jax_quat(q))
    np.testing.assert_allclose(R_np, R_jax, atol=1e-5)


def jax_quat(q):
    import jax
    import jax.numpy as jnp

    from aria_slam_tpu.core import lie

    return jax.vmap(lie.quat_to_mat)(jnp.asarray(q, jnp.float32))
