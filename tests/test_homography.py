"""Homography estimation + planar-degeneracy rescue (ops/homography.py).

Pins: DLT/RANSAC H recovery, the Faugeras decomposition returning the
true motion among its 8 candidates, and the end-to-end estimator
recovering the translation direction on a plane-dominant scene where
plain essential RANSAC is provably degenerate (the failure mode the
reference's cv::findEssentialMat pipeline has no guard for).
"""

import numpy as np
import jax
import jax.numpy as jnp

from aria_slam_tpu.config import RansacConfig
from aria_slam_tpu.ops import epipolar, homography as homog

K = jnp.asarray(
    [[200.0, 0.0, 160.0], [0.0, 200.0, 120.0], [0.0, 0.0, 1.0]],
    jnp.float32)
FOCAL = 200.0


def _plane_scene(n=200, z=9.0, baseline=0.25, yaw_deg=3.0, noise=0.2,
                 seed=0, off_plane=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-4, -3, z], [4, 3, z], (n - off_plane, 3))
    if off_plane:
        Xp = rng.uniform([-3, -2, 2.5], [3, 2, 6.0], (off_plane, 3))
        X = np.concatenate([X, Xp])
    tdir = rng.normal(size=3)
    tdir /= np.linalg.norm(tdir)
    t = tdir * baseline
    a = np.deg2rad(yaw_deg)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]])
    X2 = (X - t) @ R  # X2 = R^T (X - t)

    def proj(Xc):
        return np.stack([200 * Xc[:, 0] / Xc[:, 2] + 160,
                         200 * Xc[:, 1] / Xc[:, 2] + 120], -1)

    uv1 = (proj(X) + rng.normal(0, noise, (n, 2))).astype(np.float32)
    uv2 = (proj(X2) + rng.normal(0, noise, (n, 2))).astype(np.float32)
    # estimate convention: X2 = R_e X1 + t_e
    R_e = R.T
    t_e = -R.T @ t
    return uv1, uv2, R_e, t_e / np.linalg.norm(t_e)


def test_ransac_homography_recovers_plane_map():
    uv1, uv2, R_e, t_e = _plane_scene(noise=0.0)
    p1 = epipolar.normalize_points(jnp.asarray(uv1), K)
    p2 = epipolar.normalize_points(jnp.asarray(uv2), K)
    H, mask, score = homog.estimate_homography(
        p1, p2, jnp.ones(len(uv1), bool), jax.random.key(0), 64,
        (1.0 / FOCAL) ** 2)
    assert int(score) > 190
    # transfer error of the consensus is tiny
    err = homog.transfer_error(H, p1, p2)
    assert float(jnp.median(err)) < (0.1 / FOCAL) ** 2


def test_decomposition_contains_true_motion():
    uv1, uv2, R_e, t_e = _plane_scene(noise=0.0)
    p1 = epipolar.normalize_points(jnp.asarray(uv1), K)
    p2 = epipolar.normalize_points(jnp.asarray(uv2), K)
    H, mask, _ = homog.estimate_homography(
        p1, p2, jnp.ones(len(uv1), bool), jax.random.key(0), 64,
        (1.0 / FOCAL) ** 2)
    Rs, ts, ns, strength = homog.decompose_homography(H)
    assert float(strength) > 0.01
    tn = np.asarray(ts)
    tn = tn / np.maximum(np.linalg.norm(tn, axis=1, keepdims=True), 1e-9)
    rot_errs, dir_errs = [], []
    for k in range(8):
        dR = np.asarray(Rs[k]) @ R_e.T
        rot_errs.append(np.degrees(
            np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))))
        dir_errs.append(np.degrees(
            np.arccos(np.clip(abs(np.dot(tn[k], t_e)), 0, 1))))
    k = int(np.argmin(np.asarray(rot_errs) + np.asarray(dir_errs)))
    assert rot_errs[k] < 0.5, f"best rot {rot_errs[k]:.2f}"
    assert dir_errs[k] < 5.0, f"best dir {dir_errs[k]:.1f}"

    # and best_h_motion must pick (close to) that one given a rough hint
    Rb, tb, _ = homog.best_h_motion(H, jnp.asarray(R_e, jnp.float32),
                                    p1, p2, mask.astype(jnp.float32))
    dRb = np.asarray(Rb) @ R_e.T
    assert np.degrees(np.arccos(np.clip((np.trace(dRb) - 1) / 2, -1, 1))) < 1.0
    tbn = np.array(tb, copy=True)
    tbn /= np.linalg.norm(tbn)
    assert np.degrees(np.arccos(np.clip(abs(np.dot(tbn, t_e)), 0, 1))) < 6.0


def test_plane_dominant_estimator_beats_degenerate_e():
    """End-to-end estimate_relative_pose on a 100% planar scene: without
    the H fallback the translation direction is essentially random
    (measured ~55 deg median); with it the direction must be usable."""
    errs_on, errs_off = [], []
    for s in range(6):
        uv1, uv2, R_e, t_e = _plane_scene(noise=0.2, seed=s,
                                          baseline=0.3, yaw_deg=2.0)
        for fallback, acc in [(True, errs_on), (False, errs_off)]:
            cfg = RansacConfig(num_hypotheses=128, h_fallback=fallback)
            d = epipolar.estimate_relative_pose(
                jnp.asarray(uv1), jnp.asarray(uv2),
                jnp.ones(len(uv1), bool), K, cfg, jax.random.key(s))
            tm = np.array(d.t, copy=True)
            tm /= max(np.linalg.norm(tm), 1e-9)
            acc.append(np.degrees(
                np.arccos(np.clip(abs(np.dot(tm, t_e)), 0, 1))))
    assert np.median(errs_on) < 15.0, f"H-rescued {np.median(errs_on):.1f}"
    assert np.median(errs_on) < 0.5 * np.median(errs_off), (
        np.median(errs_on), np.median(errs_off))


def test_mixed_scene_still_uses_essential_path():
    """With plenty of off-plane structure the E path is better and must
    stay selected (the H gate must not hijack non-degenerate frames)."""
    uv1, uv2, R_e, t_e = _plane_scene(noise=0.2, off_plane=100,
                                      baseline=0.3)
    cfg = RansacConfig(num_hypotheses=128)
    d = epipolar.estimate_relative_pose(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool), K,
        cfg, jax.random.key(1))
    tm = np.array(d.t, copy=True)
    tm /= max(np.linalg.norm(tm), 1e-9)
    assert np.degrees(np.arccos(np.clip(abs(np.dot(tm, t_e)), 0, 1))) < 5.0
    dR = np.asarray(d.R) @ R_e.T
    assert np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))) < 0.5
