"""Trajectory evaluation metrics.

Parity: reference computeATE / computeRPE (src/euroc_eval.cpp:28-61):
ATE = RMSE of position error after associating estimates to ground
truth; RPE = RMSE of relative displacement error over a Δ-frame
baseline (Δ=10 in the reference). We additionally provide the standard
SE3 Umeyama alignment (the reference compares raw positions, which
conflates the arbitrary monocular frame; both modes are exposed).
"""

from __future__ import annotations

import numpy as np


def align_umeyama(est: np.ndarray, gt: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform s, R, t minimizing
    ||gt - (s R est + t)||^2. est, gt: (N, 3)."""
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    xe = est - mu_e
    xg = gt - mu_g
    cov = xg.T @ xe / len(est)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_e = (xe**2).sum() / len(est)
    s = float(np.trace(np.diag(D) @ S) / var_e) if with_scale and var_e > 0 else 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(est: np.ndarray, gt: np.ndarray, align: bool = True,
             with_scale: bool = True) -> float:
    """Absolute trajectory error RMSE (m). est, gt: (N, 3) associated."""
    if len(est) == 0:
        return float("nan")
    if align and len(est) >= 3:
        s, R, t = align_umeyama(est, gt, with_scale)
        est = (s * (R @ est.T)).T + t
    err = np.linalg.norm(est - gt, axis=1)
    return float(np.sqrt((err**2).mean()))


def rpe_rmse(est: np.ndarray, gt: np.ndarray, delta: int = 10) -> float:
    """Relative pose error RMSE over a delta-frame baseline
    (parity: computeRPE, euroc_eval.cpp:43-61)."""
    if len(est) <= delta:
        return float("nan")
    d_est = est[delta:] - est[:-delta]
    d_gt = gt[delta:] - gt[:-delta]
    err = np.linalg.norm(d_est - d_gt, axis=1)
    return float(np.sqrt((err**2).mean()))
