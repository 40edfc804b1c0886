"""IMU fusion benchmark (parity: reference experiments/benchmark_imu.cpp):
10 s simulation, 200 Hz synthetic circular-motion IMU + 20 Hz visual
updates through the 15-state EKF, printing fused-vs-analytic-GT error
at every visual update.

Usage: python -m aria_slam_tpu.eval.imu_benchmark [--duration 10]
"""

from __future__ import annotations

import argparse

import numpy as np


def run(duration_s: float = 10.0, imu_hz: float = 200.0, vo_hz: float = 20.0,
        verbose: bool = True) -> dict:
    import jax.numpy as jnp

    from aria_slam_tpu.config import EkfConfig
    from aria_slam_tpu.fusion import ekf, synthetic

    data = synthetic.circular_motion(duration_s, imu_hz)
    vo_t = (np.arange(int(duration_s * vo_hz)) / vo_hz + 0.001).astype(np.float32)
    vo_R = data["gt_rot"](vo_t).astype(np.float32)
    vo_p = data["gt_pos"](vo_t).astype(np.float32)

    # host timestamps: keeps run_sequence's sortedness guard live
    # (device arrays skip it to avoid a full-stream D2H copy)
    pos, quat = ekf.run_sequence(
        np.asarray(data["imu_t"], np.float32), jnp.asarray(data["accel"]),
        jnp.asarray(data["gyro"]), np.asarray(vo_t), jnp.asarray(vo_R),
        jnp.asarray(vo_p), EkfConfig(),
    )
    pos = np.asarray(pos)
    gt = data["gt_pos"](vo_t)
    err = np.linalg.norm(pos - gt, axis=1)

    if verbose:
        print(f"=== IMU fusion benchmark ({duration_s:.0f}s, "
              f"{imu_hz:.0f}Hz IMU + {vo_hz:.0f}Hz visual) ===")
        for i in range(0, len(vo_t), max(1, len(vo_t) // 20)):
            print(f"t={vo_t[i]:5.2f}s  fused=({pos[i,0]:+.3f},{pos[i,1]:+.3f},"
                  f"{pos[i,2]:+.3f})  gt=({gt[i,0]:+.3f},{gt[i,1]:+.3f},"
                  f"{gt[i,2]:+.3f})  err={err[i]*100:.1f}cm")
        print(f"mean error: {err[5:].mean()*100:.2f} cm   "
              f"max error: {err[5:].max()*100:.2f} cm")
    return {"mean_err_m": float(err[5:].mean()), "max_err_m": float(err[5:].max())}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--imu-hz", type=float, default=200.0)
    ap.add_argument("--vo-hz", type=float, default=20.0)
    args = ap.parse_args()
    run(args.duration, args.imu_hz, args.vo_hz)


if __name__ == "__main__":
    main()
