"""EuRoC MAV (ASL-format) dataset reader.

Parity: reference EuRoCReader (src/legacy/EuRoCReader.cpp): parses
mav0/{cam0, imu0, state_groundtruth_estimate0} CSVs, sorts by
timestamp, converts ns -> s, loads cam0 intrinsics from sensor.yaml
(falling back to the standard EuRoC cam0 values), serves frames with
the IMU batch in (prev_ts, ts], and interpolates ground truth (linear
position + slerp orientation).

Host-side by design: file IO and CSV parsing stay on CPU (numpy); the
pipeline consumes the arrays. Unlike the reference's hand-rolled YAML
parser (EuRoCReader.cpp:220-275) we use PyYAML.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from aria_slam_tpu.config import CameraConfig


@dataclass
class EurocData:
    image_ts: np.ndarray          # (F,) float64 seconds
    image_paths: List[str]
    imu_ts: np.ndarray            # (M,) float64 seconds
    imu_gyro: np.ndarray          # (M, 3)
    imu_accel: np.ndarray         # (M, 3)
    gt_ts: np.ndarray             # (G,) float64 seconds
    gt_pos: np.ndarray            # (G, 3)
    gt_quat: np.ndarray           # (G, 4) (w, x, y, z)
    camera: CameraConfig = field(default_factory=CameraConfig)
    # camera-from-imu(body) rotation from cam0's T_BS (EuRoC sensor.yaml
    # extrinsic, body==imu0 frame): R_cam_imu = R_BS[:3,:3]^T. Identity
    # when absent (synthetic scenes: body IS the camera frame). Consumed
    # by fusion/gyro_prior.pair_rotations.
    R_cam_imu: np.ndarray = field(default_factory=lambda: np.eye(3))


def _read_csv(path: str, num_cols: int | None = None) -> np.ndarray:
    """Numeric CSV; uses the native parser when available (ms instead of
    seconds on the ~200k-row EuRoC IMU files)."""
    if num_cols is not None:
        try:
            from aria_slam_tpu import native

            out = native.parse_csv(path, num_cols)
            if out is not None and len(out):
                return out
        except Exception:
            pass
    return np.loadtxt(path, delimiter=",", comments="#", ndmin=2)


def load(dataset_path: str) -> EurocData:
    mav = os.path.join(dataset_path, "mav0")
    if not os.path.isdir(mav):
        mav = dataset_path  # allow pointing directly at mav0

    cam_dir = os.path.join(mav, "cam0")
    cam_csv = os.path.join(cam_dir, "data.csv")
    if not os.path.exists(cam_csv):
        raise FileNotFoundError(
            f"not an ASL/EuRoC dataset: missing {cam_csv} "
            f"(expected <dataset>/mav0/cam0/data.csv)"
        )
    rows = []
    with open(cam_csv) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts_str, fname = line.split(",")[:2]
            rows.append((int(ts_str), fname.strip()))
    rows.sort()
    image_ts = np.array([r[0] for r in rows], np.float64) * 1e-9
    image_paths = [os.path.join(cam_dir, "data", r[1]) for r in rows]

    imu = _read_csv(os.path.join(mav, "imu0", "data.csv"), 7)
    imu = imu[np.argsort(imu[:, 0])]
    imu_ts = imu[:, 0] * 1e-9
    imu_gyro = imu[:, 1:4]
    imu_accel = imu[:, 4:7]

    gt_dir = os.path.join(mav, "state_groundtruth_estimate0")
    if os.path.exists(os.path.join(gt_dir, "data.csv")):
        gt = _read_csv(os.path.join(gt_dir, "data.csv"))
        gt = gt[np.argsort(gt[:, 0])]
        gt_ts = gt[:, 0] * 1e-9
        gt_pos = gt[:, 1:4]
        gt_quat = gt[:, 4:8]  # EuRoC GT order: w, x, y, z
    else:
        gt_ts = np.zeros(0)
        gt_pos = np.zeros((0, 3))
        gt_quat = np.zeros((0, 4))

    camera = _load_camera(os.path.join(cam_dir, "sensor.yaml"))
    R_cam_imu = _load_cam_extrinsic(os.path.join(cam_dir, "sensor.yaml"))
    return EurocData(
        image_ts=image_ts,
        image_paths=image_paths,
        imu_ts=imu_ts,
        imu_gyro=imu_gyro,
        imu_accel=imu_accel,
        gt_ts=gt_ts,
        gt_pos=gt_pos,
        gt_quat=gt_quat,
        camera=camera,
        R_cam_imu=R_cam_imu,
    )


def _load_cam_extrinsic(sensor_yaml: str) -> np.ndarray:
    """Camera-from-body rotation from cam0's T_BS ('sensor to body'
    4x4 row-major, EuRoC ASL format). Body == imu0 frame, so this maps
    integrated-gyro body rotations into the camera frame."""
    if not os.path.exists(sensor_yaml):
        return np.eye(3)
    import yaml

    with open(sensor_yaml) as f:
        doc = yaml.safe_load(f)
    try:
        tbs = doc["T_BS"]
        data = np.asarray(tbs["data"] if isinstance(tbs, dict) else tbs,
                          np.float64).reshape(4, 4)
        return data[:3, :3].T  # R_SB = cam-from-body
    except (KeyError, TypeError, ValueError):
        return np.eye(3)


def _load_camera(sensor_yaml: str) -> CameraConfig:
    """cam0 intrinsics; defaults to the standard EuRoC values
    (parity: EuRoCReader.cpp:12-20)."""
    defaults = CameraConfig()
    if not os.path.exists(sensor_yaml):
        return defaults
    import yaml

    with open(sensor_yaml) as f:
        doc = yaml.safe_load(f)
    try:
        fx, fy, cx, cy = doc["intrinsics"]
        dist = doc.get("distortion_coefficients", [0, 0, 0, 0])
        w, h = doc.get("resolution", [defaults.width, defaults.height])
        return CameraConfig(
            width=int(w), height=int(h),
            fx=float(fx), fy=float(fy), cx=float(cx), cy=float(cy),
            k1=float(dist[0]), k2=float(dist[1]),
            p1=float(dist[2]), p2=float(dist[3]),
        )
    except (KeyError, TypeError, ValueError):
        return defaults


def _require_cv2():
    """cv2 is an optional extra (pyproject [cv]): either opencv-python
    or opencv-python-headless satisfies the import — pinning one as a
    core dep would conflict with environments shipping the other."""
    try:
        import cv2
    except ImportError as e:
        raise ImportError(
            "image decode needs OpenCV: pip install 'aria-slam-tpu[cv]' "
            "(or opencv-python-headless on servers/CI)") from e
    return cv2


def load_image(path: str) -> np.ndarray:
    """Grayscale uint8 (H, W) in [0, 255].

    uint8 on purpose: frames cross host->device as-is and every jitted
    entry point casts to float32 on device as its first op (exact for
    0..255) — on this rig's ~2-3 GB/s relay a float32 transfer would
    quadruple the per-chunk H2D bytes for nothing."""
    cv2 = _require_cv2()

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


def load_image_safe(path: str) -> Optional[np.ndarray]:
    """Like load_image but returns None for a missing/corrupt file —
    the degrade-don't-crash behavior of the reference reader, which
    skips unreadable images and continues
    (src/legacy/EuRoCReader.cpp:287-291). One bad frame must not kill a
    whole evaluation."""
    cv2 = _require_cv2()

    try:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    except cv2.error:
        return None
    return img


def imu_window(data: EurocData, t_prev: float, t_now: float) -> Tuple[np.ndarray, ...]:
    """IMU samples with t in (t_prev, t_now] (parity: getNext,
    EuRoCReader.cpp:277-309)."""
    lo = np.searchsorted(data.imu_ts, t_prev, side="right")
    hi = np.searchsorted(data.imu_ts, t_now, side="right")
    return data.imu_ts[lo:hi], data.imu_accel[lo:hi], data.imu_gyro[lo:hi]


def interpolate_gt(data: EurocData, t: float) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Ground-truth (pos, quat) at time t by linear/slerp interpolation
    (parity: getGroundTruth, EuRoCReader.cpp:311-346). None outside range."""
    ts = data.gt_ts
    if len(ts) == 0 or t < ts[0] or t > ts[-1]:
        return None
    i = np.searchsorted(ts, t)
    if i == 0:
        return data.gt_pos[0], data.gt_quat[0]
    a = (t - ts[i - 1]) / max(ts[i] - ts[i - 1], 1e-12)
    pos = (1 - a) * data.gt_pos[i - 1] + a * data.gt_pos[i]
    q0, q1 = data.gt_quat[i - 1], data.gt_quat[i]
    dot = np.dot(q0, q1)
    q1 = q1 if dot >= 0 else -q1
    dot = abs(dot)
    if dot > 0.9995:
        q = (1 - a) * q0 + a * q1
    else:
        th = np.arccos(np.clip(dot, -1, 1))
        q = (np.sin((1 - a) * th) * q0 + np.sin(a * th) * q1) / np.sin(th)
    return pos, q / np.linalg.norm(q)
