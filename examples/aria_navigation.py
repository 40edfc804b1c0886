"""End-to-end navigation-assistance wiring example.

The reference's product loop (README.md of robertteleng/aria-slam):
Aria glasses stream -> SLAM -> object detection -> spatial audio
guidance for visually impaired users, with a VLM scene narrator on the
side. This example wires the same loop from this framework's parts:

    MockAriaDevice (or a real adapter implementing the AriaDevice port)
        -> AsyncSlamPipeline (native SPSC staged executor)
        -> NavigationAudioEngine (direction/priority/cooldown guidance)
        -> AsyncSceneWorker (drop-oldest VLM narrator)

Run:  python examples/aria_navigation.py <image_dir> [--detect]
(any directory of .png/.jpg frames; try the synthetic scene's
mav0/cam0/data)
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image_dir", help="directory of frames to replay")
    ap.add_argument("--detect", action="store_true",
                    help="run the object detector + audio guidance")
    ap.add_argument("--interval", type=float, default=0.033)
    args = ap.parse_args()

    import jax

    from aria_slam_tpu.config import CameraConfig, OrbConfig, PipelineConfig, RansacConfig
    from aria_slam_tpu.io.aria import MockAriaDevice
    from aria_slam_tpu.models.vlm import AsyncSceneWorker, MockSceneUnderstanding
    from aria_slam_tpu.pipeline import factory
    from aria_slam_tpu.pipeline.async_pipeline import AsyncSlamPipeline
    from aria_slam_tpu.utils.audio import ConsoleAudioFeedback, NavigationAudioEngine

    # --- device (swap MockAriaDevice for a real AriaDevice implementation)
    device = MockAriaDevice(args.image_dir, interval_s=args.interval,
                            imu_hz=200.0)
    if not device.connect():
        print(f"no frames found in {args.image_dir}", file=sys.stderr)
        sys.exit(1)
    cal = device.get_calibration("slam-left")

    cfg = PipelineConfig(
        camera=CameraConfig(width=cal.width, height=cal.height, fx=cal.fx,
                            fy=cal.fy, cx=cal.cx, cy=cal.cy,
                            k1=0, k2=0, p1=0, p2=0),
        orb=OrbConfig(num_features=512, num_levels=4),
        ransac=RansacConfig(num_hypotheses=128),
        enable_detection=args.detect,
        enable_dynamic_filtering=args.detect,
        enable_loop_closure=False,
        enable_mapping=False,
    )
    pipe = factory.create(config=cfg)

    # --- guidance + narrator
    audio = NavigationAudioEngine(ConsoleAudioFeedback(),
                                  image_width=cal.width)
    narrator = AsyncSceneWorker(MockSceneUnderstanding())

    def on_result(ts, pose):
        out = pipe.last_output
        print(f"[{ts:.2f}] pos=({pose[0,3]:+.2f},{pose[1,3]:+.2f},"
              f"{pose[2,3]:+.2f}) matches={int(out.num_matches)}")
        if args.detect:
            det = out.detections
            audio.process_detections(np.asarray(det.boxes),
                                     np.asarray(det.classes),
                                     np.asarray(det.valid))

    async_pipe = AsyncSlamPipeline(pipe, drop_threshold=4, on_result=on_result)

    # --- stream
    def on_image(ts, image, camera_id):
        async_pipe.submit(ts, image=image)
        narrator.submit(ts, image)

    device.set_image_callback(on_image)
    device.set_imu_callback(lambda ts, a, g: pipe.process_imu(ts, a, g))

    print("warming up (first jit compile)...")
    # compile before streaming so the real-time loop never stalls
    pipe.process_frame(np.zeros((cal.height, cal.width), np.float32), -1.0)

    device.start_streaming()
    t0 = time.time()
    while device._thread is not None and device._thread.is_alive():
        device.spin_once(0.1)
        desc = narrator.latest()
        if desc and time.time() - t0 > 2.0:
            print(f"[scene] {desc.text}")
            t0 = time.time()
    device.stop_streaming()

    results = async_pipe.drain()
    stats = async_pipe.stats()
    async_pipe.close()
    narrator.close()
    print(f"processed {len(results)} frames "
          f"(dropped {stats['dropped'][0]} under backpressure)")


if __name__ == "__main__":
    main()
