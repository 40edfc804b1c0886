"""Online (per-frame) throughput: synchronous vs pipelined dispatch.

The reference's H13 design claims 12 -> 28 FPS from overlapping its
tracking/loop/mapping stages across threads
(docs/milestones/H13_MULTITHREADING_AUDIT.md:46-50). The TPU analogue
does not need threads for the device work — one jitted step is already
fused — but the SYNCHRONOUS driver forces every step's results back to
host before dispatching the next, paying the full dispatch/relay
round-trip per frame. Pipelined mode (SlamPipeline(lazy_depth=N))
enqueues steps back-to-back and forces outputs N frames late, so
consecutive programs overlap the round-trip; loop closures apply at pop
time (delayed, never dropped).

Prints one JSON line with ms/frame + FPS for both modes.

Usage:
    python -m aria_slam_tpu.eval.online_benchmark [--frames 48]
        [--depth 3] [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from aria_slam_tpu.config import (
    CameraConfig, OrbConfig, PipelineConfig, RansacConfig,
)


def bench_config(small: bool) -> PipelineConfig:
    if small:
        return PipelineConfig(
            camera=CameraConfig(width=320, height=240, fx=200.0, fy=200.0,
                                cx=160.0, cy=120.0, k1=0.0, k2=0.0,
                                p1=0.0, p2=0.0),
            orb=OrbConfig(num_features=384, num_levels=3),
            ransac=RansacConfig(num_hypotheses=128),
            enable_fusion=True, enable_mapping=True,
            enable_loop_closure=True)
    return PipelineConfig(camera=CameraConfig(k1=0.0, k2=0.0, p1=0.0,
                                              p2=0.0))


def make_frames(cfg: PipelineConfig, n: int, seed: int = 0):
    """Rendered moving-camera frames (varied inputs — identical args
    would be served from the rig's program-result cache, CLAUDE.md)."""
    from aria_slam_tpu.io.synthetic_scene import (
        render_frame, scene_layers, trajectory, _texture,
    )

    layers = scene_layers(4.0, seed)
    tex = _texture(seed=seed)
    frames = []
    for k in range(n):
        pos, R = trajectory(k / 10.0, period=10.0)
        frames.append(render_frame(cfg.camera, tex, pos, R, depth=4.0,
                                   layers=layers))  # uint8: cheap H2D
    return frames


def run_mode(cfg, frames, lazy_depth: int, warmup: int = 4) -> float:
    """Returns steady-state ms/frame."""
    from aria_slam_tpu.pipeline.slam_pipeline import SlamPipeline

    pipe = SlamPipeline(cfg, lazy_depth=lazy_depth)
    # warmup: compile + first executions
    for k in range(warmup):
        pipe.process_frame(frames[k % len(frames)], 0.1 * k)
    pipe.flush()
    t0 = time.perf_counter()
    n = len(frames) - warmup
    for k in range(warmup, len(frames)):
        pipe.process_frame(frames[k], 0.1 * k)
    pipe.flush()
    # force full completion (block_until_ready does not wait on the
    # relayed backend — fetch a scalar instead, CLAUDE.md)
    float(np.asarray(pipe.state.pose).sum())
    return (time.perf_counter() - t0) / max(n, 1) * 1000.0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--depth", type=int, default=3,
                    help="pipelined mode lazy depth")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    cfg = bench_config(args.small)
    frames = make_frames(cfg, args.frames)
    sync_ms = run_mode(cfg, frames, lazy_depth=0)
    pipe_ms = run_mode(cfg, frames, lazy_depth=args.depth)
    out = {
        "online_sync_ms_per_frame": round(sync_ms, 2),
        "online_pipelined_ms_per_frame": round(pipe_ms, 2),
        "online_sync_fps": round(1000.0 / sync_ms, 2),
        "online_pipelined_fps": round(1000.0 / pipe_ms, 2),
        "speedup": round(sync_ms / pipe_ms, 3),
        "lazy_depth": args.depth,
        "frames": args.frames,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
