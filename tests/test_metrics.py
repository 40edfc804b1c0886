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
