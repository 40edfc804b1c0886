"""Realtime demo: video-file SLAM loop with trajectory canvas + HUD.

Parity: reference `aria_slam` executable (src/main.cpp:68-267): per
frame ORB + matching + (optional) YOLO dynamic filtering + epipolar
pose accumulation, trajectory drawn on a canvas, keypoint/match/
detection overlay, FPS HUD; `--headless` prints stats every 50 frames
instead of rendering.

Usage:
    python -m aria_slam_tpu.eval.demo <video.mp4> [--headless]
        [--detect] [--max-frames N] [--out overlay.mp4]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def run(video_path: str, headless: bool = True, detect: bool = False,
        max_frames: int | None = None, out_path: str | None = None,
        config=None) -> dict:
    from aria_slam_tpu.io.euroc import _require_cv2
    cv2 = _require_cv2()

    from aria_slam_tpu.config import CameraConfig, PipelineConfig
    from aria_slam_tpu.pipeline import factory

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_path}")
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps_in = cap.get(cv2.CAP_PROP_FPS) or 30.0

    cfg = config or PipelineConfig(
        camera=CameraConfig(width=w, height=h, fx=0.9 * w, fy=0.9 * w,
                            cx=w / 2, cy=h / 2, k1=0, k2=0, p1=0, p2=0),
        enable_detection=detect,
        enable_dynamic_filtering=detect,
        enable_loop_closure=False,  # video demos rarely revisit; parity
        enable_fusion=False,        # with main.cpp's VO-only loop
        enable_mapping=False,
    )
    pipe = factory.create(config=cfg)

    writer = None
    if out_path:
        writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps_in, (w, h))

    canvas = np.zeros((360, 360, 3), np.uint8)  # trajectory view
    n = 0
    t_start = time.perf_counter()
    fps = 0.0
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames and n >= max_frames):
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)  # uint8: cheap H2D
        t0 = time.perf_counter()
        pose = pipe.process_frame(gray, n / fps_in)
        dt = time.perf_counter() - t0
        fps = 0.9 * fps + 0.1 / max(dt, 1e-6) if n else 1.0 / max(dt, 1e-6)
        n += 1

        out = pipe.last_output
        if headless:
            if n % 50 == 0:
                print(
                    f"[{n}] fps={fps:.1f} feats={int(out.num_features)} "
                    f"matches={int(out.num_matches)} inliers={int(out.num_inliers)} "
                    f"filtered={int(out.num_filtered)} "
                    f"pos=({pose[0,3]:.2f},{pose[1,3]:.2f},{pose[2,3]:.2f})"
                )
        if writer is not None or not headless:
            vis = frame.copy()
            feats = pipe.state.prev_feats
            xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
            for p in xy[:500]:
                cv2.circle(vis, (int(p[0]), int(p[1])), 2, (0, 255, 0), -1)
            if detect:
                det = out.detections
                for b, v in zip(np.asarray(det.boxes), np.asarray(det.valid)):
                    if v:
                        cv2.rectangle(vis, (int(b[0]), int(b[1])),
                                      (int(b[2]), int(b[3])), (0, 0, 255), 2)
            # trajectory canvas (x-z plane, like the reference HUD)
            px = int(180 + pose[0, 3] * 5)
            pz = int(180 + pose[2, 3] * 5)
            if 0 <= px < 360 and 0 <= pz < 360:
                cv2.circle(canvas, (px, pz), 1, (255, 200, 0), -1)
            cv2.putText(vis, f"FPS {fps:.1f}  matches {int(out.num_matches)}",
                        (10, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 255, 255), 2)
            if writer is not None:
                writer.write(vis)
            if not headless:
                cv2.imshow("aria_slam_tpu", vis)
                cv2.imshow("trajectory", canvas)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break

    cap.release()
    if writer is not None:
        writer.release()
    total = time.perf_counter() - t_start
    stats = {"frames": n, "avg_fps": n / total if total > 0 else 0.0}
    print(f"processed {n} frames, avg fps {stats['avg_fps']:.1f}")
    return stats


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("video")
    ap.add_argument("--headless", action="store_true")
    ap.add_argument("--detect", action="store_true",
                    help="run the object detector + dynamic filtering")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out", default=None, help="write overlay video")
    args = ap.parse_args()
    run(args.video, headless=args.headless, detect=args.detect,
        max_frames=args.max_frames, out_path=args.out)


if __name__ == "__main__":
    main()
