"""Pipelined online mode (SlamPipeline(lazy_depth=N), the H13-async
analogue): process_frame enqueues the jitted step and forces outputs N
frames late so consecutive programs can overlap the dispatch round-trip.

Correctness gate: with no loop events, the deferred path must produce
EXACTLY the synchronous trajectory (same programs, same inputs — only
the forcing schedule differs). Loop handling is exercised separately:
deferred pops must still apply loop edges and keep the run sane.

Measured on the TPU rig: sync 108.7 ms/frame vs pipelined 107.9
(eval/online_benchmark.py) — this rig's relay serializes program
executions (enqueue-ahead gains <=7% even for pure back-to-back
matmul programs), so the benefit is bounded here by the backend, not
the design; on a locally-attached TPU the dispatch round-trip overlaps.
"""

import numpy as np
import pytest

import tests.test_pipeline as tp
from aria_slam_tpu.config import (
    LoopClosureConfig, OrbConfig, PipelineConfig, PoseGraphConfig,
    RansacConfig,
)

CFG = PipelineConfig(
    camera=tp.SMALL_CAM,
    orb=OrbConfig(num_features=256, num_levels=3),
    ransac=RansacConfig(num_hypotheses=64),
    enable_loop_closure=False,
    enable_mapping=False,
    enable_fusion=False,
)


def _frames(n):
    from aria_slam_tpu.io.synthetic_scene import (
        _texture, render_frame, scene_layers, trajectory,
    )

    layers = scene_layers(4.0, 0)
    tex = _texture(seed=0)
    out = []
    for k in range(n):
        pos, R = trajectory(k / 10.0, period=10.0)
        out.append(render_frame(tp.SMALL_CAM, tex, pos, R, depth=4.0,
                                layers=layers).astype(np.float32))
    return out


def test_lazy_matches_sync_exactly():
    from aria_slam_tpu.pipeline.slam_pipeline import SlamPipeline

    frames = _frames(10)
    sync = SlamPipeline(CFG)
    lazy = SlamPipeline(CFG, lazy_depth=3)
    for k, f in enumerate(frames):
        sync.process_frame(f, 0.1 * k)
        lazy.process_frame(f, 0.1 * k)
    lazy.flush()
    assert len(lazy.trajectory) == len(sync.trajectory)
    t_s = np.stack([T for _, T in sync.trajectory])
    t_l = np.stack([T for _, T in lazy.trajectory])
    np.testing.assert_array_equal(t_l, t_s)


def test_lazy_flush_on_finalize():
    from aria_slam_tpu.pipeline.slam_pipeline import SlamPipeline

    frames = _frames(6)
    lazy = SlamPipeline(CFG, lazy_depth=4)
    for k, f in enumerate(frames):
        lazy.process_frame(f, 0.1 * k)
    # more enqueued than popped; finalize must drain the queue
    assert len(lazy.trajectory) < len(frames)
    lazy.finalize()
    assert len(lazy.trajectory) == len(frames)
    assert np.isfinite(np.stack([T for _, T in lazy.trajectory])).all()
