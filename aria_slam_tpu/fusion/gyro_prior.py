"""Per-frame-pair gyroscope rotation priors for the VO chain.

A consumer-grade gyro integrated over one frame interval (~0.1 s) is
accurate to ~0.01-0.05 deg; the two-view essential-matrix rotation at
the same interval measures ~0.8 deg median error (rotloop benchmark).
Replacing the chain's per-pair VO rotation with the integrated gyro
rotation removes the dominant rotation random-walk, and rescues pairs
whose visual RANSAC failed outright (rotation-only relative pose).

This is the rotation half of what the reference's EKF claims to get
from IMU fusion (H08: "0.45 m -> 0.08 m with IMU",
docs/milestones/H08_SENSOR_FUSION_AUDIT.md:726-729) — applied directly
in the chunked front-end's pose chain, where it helps every downstream
consumer (scale chain, BA init, pose graph, mapping), not only the
exported fused track.

Host-side: integration is a trivial ~20-sample product per pair; the
chunk's device programs are untouched.
"""

from __future__ import annotations

import numpy as np


def _so3_exp(w):
    th = float(np.linalg.norm(w))
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1.0 - np.cos(th)) * (K @ K)


def pair_rotations(imu_ts, imu_gyro, frame_ts, R_cam_imu=None,
                   gyro_bias=None, min_samples: int = 2):
    """Integrate body rates into per-frame-pair rotation priors.

    imu_ts: (M,) seconds; imu_gyro: (M, 3) rad/s body rates;
    frame_ts: (F,) frame timestamps (seconds, same clock).
    R_cam_imu: (3, 3) camera-from-imu rotation (identity when the body
    frame IS the camera frame, as in io/synthetic_scene.py; EuRoC needs
    the cam0 T_BS extrinsic).
    Returns (R_vo (F-1, 3, 3), valid (F-1,)): R_vo in the VO delta
    convention X_cur = R_vo @ X_prev + t, i.e. R_vo = DeltaR^T for the
    integrated body DeltaR.
    """
    imu_ts = np.asarray(imu_ts, np.float64)
    imu_gyro = np.asarray(imu_gyro, np.float64)
    frame_ts = np.asarray(frame_ts, np.float64)
    if gyro_bias is not None:
        imu_gyro = imu_gyro - np.asarray(gyro_bias, np.float64)
    f = len(frame_ts)
    Rs = np.tile(np.eye(3, dtype=np.float32), (max(f - 1, 0), 1, 1))
    valid = np.zeros((max(f - 1, 0),), bool)
    if len(imu_ts) == 0:
        return Rs, valid

    for i in range(f - 1):
        t0, t1 = frame_ts[i], frame_ts[i + 1]
        if t1 <= t0:
            continue
        lo = int(np.searchsorted(imu_ts, t0, side="right"))
        hi = int(np.searchsorted(imu_ts, t1, side="right"))
        if hi - lo < min_samples:
            continue
        dR = np.eye(3)
        t_prev = t0
        for j in range(lo, hi):
            dt = imu_ts[j] - t_prev
            dR = dR @ _so3_exp(imu_gyro[j] * dt)
            t_prev = imu_ts[j]
        if t1 > t_prev:  # close the window with the last sample's rate
            dR = dR @ _so3_exp(imu_gyro[hi - 1] * (t1 - t_prev))
        if R_cam_imu is not None:
            dR = R_cam_imu @ dR @ R_cam_imu.T
        Rs[i] = dR.T.astype(np.float32)  # VO convention R_{cur<-prev}
        valid[i] = True
    return Rs, valid
