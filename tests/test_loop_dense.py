"""Loop-DENSE revisit coverage (VERDICT r2 weak #6): the rotloop
benchmark has ONE revisit, so the per-chunk verification ceiling
(eval/chunked.py VERIFY_MAX) and the one-accepted-loop-per-frame rule
were never stressed. This scene is 160 frames over a 6 s-period sweep
(2.7 passes): every frame of pass k re-sees pass k-1 (min_frames_between
= 50 < the 60-frame period), so loop candidates saturate every chunk —
the regime of the reference's MH_01-class revisits
(/root/reference/docs/milestones/H09_LOOP_CLOSURE_AUDIT.md:42-48).

Gates (calibrated 2026-08: 44 loops closed; ATE 0.795 m with LC vs
0.786 m without — the period-6 sweep moves ~2.1 m/s so inter-frame
baselines are large and VO noise dominates position metrics, hence
gates are RELATIVE):
  - recall: a dense revisit stream must close many loops, not bottom
    out at the caps (>= 30 vs 44 measured).
  - no harm: dense loop edges + repeated per-chunk re-optimization
    must not degrade ATE vs loop-closure-off.
"""

import dataclasses

import numpy as np
import pytest

import tests.test_pipeline as tp
from aria_slam_tpu.config import (
    LoopClosureConfig, MapperConfig, OrbConfig, PipelineConfig,
    PoseGraphConfig, RansacConfig,
)

CFG = PipelineConfig(
    camera=tp.SMALL_CAM,
    orb=OrbConfig(num_features=384, num_levels=3),
    ransac=RansacConfig(num_hypotheses=128),
    loop=LoopClosureConfig(max_keyframes=192, min_frames_between=50,
                           min_score=0.3, min_matches=40),
    mapper=MapperConfig(max_points=60000, pair_lag=4),
    pose_graph=PoseGraphConfig(max_nodes=192, max_edges=640,
                               lm_iterations=5, cg_iterations=32),
    vo_scale_mode="median_depth",
)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from aria_slam_tpu.io import synthetic_scene

    out = tmp_path_factory.mktemp("scene_loopdense")
    synthetic_scene.generate(str(out), num_frames=160, fps=10.0,
                             cam=tp.SMALL_CAM, depth=4.0, traj="sweep",
                             period=6.0)
    return str(out)


@pytest.fixture(scope="module")
def results(scene_dir):
    from aria_slam_tpu.eval import euroc_eval

    out = {}
    out["lc"] = euroc_eval.run(scene_dir, out_dir="/tmp/loopdense_lc",
                               config=CFG, verbose=False, chunk=16)
    out["nolc"] = euroc_eval.run(
        scene_dir, out_dir="/tmp/loopdense_nolc",
        config=dataclasses.replace(CFG, enable_loop_closure=False),
        verbose=False, chunk=16)
    return out


def test_dense_revisits_close_many_loops(results):
    """With ~100 frames eligible for a loop (passes 2 and 3) the caps
    must not bottleneck recall to a handful."""
    assert results["lc"]["loops"] >= 30, results["lc"]["loops"]


def test_dense_loops_not_harmful(results):
    """Dense loop edges + per-chunk re-optimization must leave ATE
    no worse than pure odometry (margin for noise)."""
    lc = results["lc"]["ate_rmse_m"]
    nolc = results["nolc"]["ate_rmse_m"]
    assert np.isfinite(lc)
    assert lc <= nolc * 1.15 + 0.02, (lc, nolc)
