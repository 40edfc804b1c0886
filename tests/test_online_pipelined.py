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


def test_lazy_loop_rebases_to_newest_node():
    """A loop closure popped from the deferred queue must rebase the
    RUNNING pose onto the NEWEST dispatched node (frames dispatched
    after the loop's query frame already exist). Review finding: an
    off-by-one here silently drops one inter-frame motion from every
    pose after each loop; the invariant below fails for any node but
    the newest on a moving trajectory."""
    import dataclasses

    from aria_slam_tpu.backend import pose_graph
    from aria_slam_tpu.io.synthetic_scene import (
        _texture, render_frame, scene_layers, trajectory,
    )
    from aria_slam_tpu.pipeline.slam_pipeline import SlamPipeline

    cfg = dataclasses.replace(
        CFG, enable_loop_closure=True,
        loop=dataclasses.replace(tp.SMALL_CFG.loop, min_frames_between=8,
                                 min_score=0.2, min_matches=25),
        pose_graph=tp.SMALL_CFG.pose_graph)
    layers = scene_layers(4.0, 0)
    tex = _texture(seed=0)
    lazy = SlamPipeline(cfg, lazy_depth=3)
    loops_seen = 0
    # period 2 s @ 10 fps -> the path revisits frames 0.. at frames 20..
    for k in range(27):
        pos, R = trajectory(k / 10.0, period=2.0)
        f = render_frame(tp.SMALL_CAM, tex, pos, R, depth=4.0,
                         layers=layers).astype(np.float32)
        lazy.process_frame(f, 0.1 * k)
        if lazy.num_loops > loops_seen:
            loops_seen = lazy.num_loops
            # dispatched frames = published + still-queued; the rebase
            # must have adopted exactly the newest dispatched node
            newest = len(lazy.trajectory) + len(lazy._pending)
            want = np.asarray(
                pose_graph.get_pose(lazy.state.graph, newest))
            np.testing.assert_allclose(
                np.asarray(lazy.state.pose), want, atol=1e-5)
    lazy.finalize()
    assert loops_seen >= 1, "revisit never closed a loop"
    assert np.isfinite(np.stack([T for _, T in lazy.trajectory])).all()


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
