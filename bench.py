"""Headline benchmark: EuRoC-sized SLAM front-end FPS on one chip.

Measures the steady-state per-frame latency of the jitted front-end
(ORB extract 2000 feats / 8 levels on 752x480 + MXU Hamming match +
essential RANSAC pose) on rendered textured frames — the same workload
as the reference's headline 'ORB+YOLO parallel streams ~80 FPS on
RTX 2060' (BASELINE.md; SURVEY.md §6). vs_baseline is FPS / 80.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aria_slam_tpu.config import CameraConfig, PipelineConfig
    from aria_slam_tpu.io import synthetic_scene
    from aria_slam_tpu.ops import epipolar, match as match_ops, orb

    cfg = PipelineConfig()  # full EuRoC defaults: 752x480, 2000 feats, 8 levels
    cam = CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    K = jnp.asarray(cam.K)

    # realistic textured frames (rendered plane sweep, like EuRoC texture)
    tex = synthetic_scene._texture(seed=3)
    n_frames = 32
    frames = []
    for k in range(n_frames):
        pos, R = synthetic_scene.trajectory(k / 30.0)
        frames.append(
            synthetic_scene.render_frame(cam, tex, pos, R).astype(np.float32)
        )
    frames = [jnp.asarray(f) for f in frames]

    @jax.jit
    def step(prev_feats, img, key):
        feats = orb.extract(img, cfg.orb)
        m = match_ops.match(feats, prev_feats, cfg.matcher.ratio)
        delta = epipolar.estimate_relative_pose(
            prev_feats.xy[m.train_idx], feats.xy[m.query_idx], m.valid,
            K, cfg.ransac, key,
        )
        return feats, delta.R, delta.t, delta.num_inliers

    key = jax.random.key(0)
    feats = orb.extract(frames[0], cfg.orb)
    # warmup / compile
    feats, *_ = step(feats, frames[1], key)
    jax.block_until_ready(feats.xy)

    reps = 4
    t0 = time.perf_counter()
    out = None
    for r in range(reps):
        for img in frames:
            feats, R, t, ni = step(feats, img, key)
        out = (R, t, ni)
    jax.block_until_ready(out[0])
    dt = time.perf_counter() - t0
    fps = reps * len(frames) / dt

    print(json.dumps({
        "metric": "euroc_frontend_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 80.0, 3),
    }))


if __name__ == "__main__":
    main()
