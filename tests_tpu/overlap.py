"""Measure ORB ∥ YOLO overlap inside one XLA program (VERDICT r1 #8).

The reference overlaps ORB extraction and YOLO inference on two CUDA
streams for +10% FPS (src/main.cpp:129-140, README.md:1115). The TPU
design claims the same overlap falls out of putting both in ONE program
as independent subgraphs (XLA schedules them concurrently and fuses the
filter). This script measures, on the real chip, per 64-frame chunk:

  t_orb    : front-end only (extract + match + RANSAC) program
  t_det    : detector-only (YOLO-s 640 batched) program
  t_fused  : both in one program + dynamic-match filtering
  overlap gain = (t_orb + t_det) - t_fused

Each program's inputs vary per call (the rig serves identical
(program, args) re-executions from a cache) and completion is forced by
fetching a scalar. Prints one JSON line; writes OVERLAP_TPU.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

CHUNK = 64
REPS = 6


def main():
    import jax
    import jax.numpy as jnp

    import aria_slam_tpu  # noqa: F401
    from aria_slam_tpu.config import CameraConfig, PipelineConfig
    from aria_slam_tpu.io import synthetic_scene
    from aria_slam_tpu.models.detect import make_batched_detector
    from aria_slam_tpu.ops import boxes as box_ops
    from aria_slam_tpu.ops import epipolar, match as match_ops, orb

    cfg = PipelineConfig()
    cam = CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    K = jnp.asarray(cam.K)
    detector = make_batched_detector(cfg.detector, use_nms=False)

    tex = synthetic_scene._texture(seed=5)
    frames = np.stack([
        synthetic_scene.render_frame(
            cam, tex, *synthetic_scene.trajectory(k / 30.0)).astype(np.float32)
        for k in range(CHUNK + 1)
    ])
    base = jnp.asarray(frames)

    def frontend(frames, key, dyn):
        feats = orb.extract_batch(frames, cfg.orb)
        prev = jax.tree_util.tree_map(lambda x: x[:-1], feats)
        cur = jax.tree_util.tree_map(lambda x: x[1:], feats)
        m = match_ops.match_batched(cur, prev, cfg.matcher.ratio)
        keys = jax.random.split(key, frames.shape[0] - 1)

        def pose_one(pf, cf, mm, dyn_f, k):
            return epipolar.estimate_relative_pose(
                jnp.take_along_axis(pf.xy, mm.train_idx[:, None], 0),
                cf.xy, mm.valid & pf.valid[mm.train_idx] & ~dyn_f,
                K, cfg.ransac, k)

        delta = jax.vmap(pose_one)(prev, cur, m, dyn, keys)
        return jnp.sum(delta.num_inliers)

    @jax.jit
    def orb_only(frames, key):
        dyn = jnp.zeros((frames.shape[0] - 1, cfg.orb.num_features), bool)
        return frontend(frames, key, dyn)

    @jax.jit
    def det_only(frames):
        dets = detector(frames[1:])
        return jnp.sum(dets.scores)

    @jax.jit
    def fused(frames, key):
        feats = orb.extract_batch(frames, cfg.orb)
        prev = jax.tree_util.tree_map(lambda x: x[:-1], feats)
        cur = jax.tree_util.tree_map(lambda x: x[1:], feats)
        m = match_ops.match_batched(cur, prev, cfg.matcher.ratio)
        dets = detector(frames[1:])
        dyn = jax.vmap(box_ops.points_in_dynamic_boxes)(cur.xy, dets)
        keys = jax.random.split(key, frames.shape[0] - 1)

        def pose_one(pf, cf, mm, dyn_f, k):
            return epipolar.estimate_relative_pose(
                jnp.take_along_axis(pf.xy, mm.train_idx[:, None], 0),
                cf.xy, mm.valid & pf.valid[mm.train_idx] & ~dyn_f,
                K, cfg.ransac, k)

        delta = jax.vmap(pose_one)(prev, cur, m, dyn, keys)
        return jnp.sum(delta.num_inliers) + jnp.sum(dets.scores)

    def timeit(fn, *argmakers):
        # warm-up compile + first run
        float(jnp.sum(fn(*[mk(0) for mk in argmakers])))
        t0 = time.perf_counter()
        for r in range(1, REPS + 1):
            out = fn(*[mk(r) for mk in argmakers])
            float(jnp.sum(out))  # force completion (block_until_ready lies)
        return (time.perf_counter() - t0) / REPS

    def mk_frames(r):
        return base + np.float32(r)  # vary inputs: defeat the result cache

    def mk_key(r):
        return jax.random.key(r + 17)

    t_orb = timeit(orb_only, mk_frames, mk_key)
    t_det = timeit(det_only, mk_frames)
    t_fused = timeit(fused, mk_frames, mk_key)

    res = {
        "chunk_frames": CHUNK,
        "t_orb_ms": round(t_orb * 1e3, 2),
        "t_det_ms": round(t_det * 1e3, 2),
        "t_fused_ms": round(t_fused * 1e3, 2),
        "sum_separate_ms": round((t_orb + t_det) * 1e3, 2),
        "overlap_gain_ms": round((t_orb + t_det - t_fused) * 1e3, 2),
        "fused_is_cheaper": bool(t_fused < t_orb + t_det),
        "fused_fps": round(CHUNK / t_fused, 1),
    }
    print(json.dumps(res))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "OVERLAP_TPU.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
