"""Headline benchmark: EuRoC-sized SLAM front-end FPS on one chip.

Workload parity with the reference's headline number (ORB 2000/8-level
extract + BF-Hamming match + essential RANSAC per frame at 752x480 —
'ORB+YOLO parallel streams ~80 FPS on RTX 2060', BASELINE.md).

TPU-native execution shape: frame-pair VO is embarrassingly parallel
(only the final pose accumulation is sequential), so frames run as a
vmapped BATCH inside one XLA program — SURVEY.md §5.7's 'chunked jitted
windows'. This also amortizes the harness's fixed per-program-dispatch
overhead, which would otherwise dominate (~38 ms/call through the
remote relay on this rig — measured with single-op programs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

CHUNK = 64  # frame pairs per program call
NUM_CHUNKS = 4


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
    frames_np = []
    for k in range(CHUNK * NUM_CHUNKS + 1):
        pos, R = synthetic_scene.trajectory(k / 30.0)
        frames_np.append(
            synthetic_scene.render_frame(cam, tex, pos, R).astype(np.float32)
        )
    # chunks of CHUNK+1 frames -> CHUNK consecutive pairs each
    chunks = [
        jnp.asarray(np.stack(frames_np[i * CHUNK : (i + 1) * CHUNK + 1]))
        for i in range(NUM_CHUNKS)
    ]

    @jax.jit
    def chunk_step(frames, key):
        # batched front-end: extract all frames once, match/RANSAC the
        # CHUNK consecutive pairs together
        feats = orb.extract_batch(frames, cfg.orb)
        prev = jax.tree_util.tree_map(lambda x: x[:-1], feats)
        cur = jax.tree_util.tree_map(lambda x: x[1:], feats)
        m = match_ops.match_batched(cur, prev, cfg.matcher.ratio)
        keys = jax.random.split(key, frames.shape[0] - 1)

        def pose_one(prev_f, cur_f, mm, k):
            return epipolar.estimate_relative_pose(
                jnp.take_along_axis(prev_f.xy, mm.train_idx[:, None], 0),
                cur_f.xy,
                mm.valid & prev_f.valid[mm.train_idx],
                K, cfg.ransac, k,
            )

        delta = jax.vmap(pose_one)(prev, cur, m, keys)
        return delta.R, delta.t, jnp.sum(delta.num_inliers)

    key = jax.random.key(0)
    out = chunk_step(chunks[0], key)
    float(out[2])  # force real execution (block_until_ready is lazy here)

    t0 = time.perf_counter()
    total_frames = 0
    for rep in range(2):
        for i, ch in enumerate(chunks):
            R, t, ni = chunk_step(ch, jax.random.key(rep * 31 + i + 1))
            float(ni)  # sync: force the execution to complete
            total_frames += CHUNK
    dt = time.perf_counter() - t0
    fps = total_frames / dt

    print(json.dumps({
        "metric": "euroc_frontend_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 80.0, 3),
    }))


if __name__ == "__main__":
    main()
