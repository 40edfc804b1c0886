"""Long-trajectory accuracy regression with teeth (VERDICT r1 #5).

A 140-frame rotation-heavy rotloop trajectory with a genuine revisit
(12 s period at 10 fps -> the last ~20 frames re-see the start) run
through the chunked evaluator. Gates are measured values + margin, so a
regression in RANSAC, scale normalization, the backbone, loop-closure
conventions, or the pose graph fails loudly — unlike the r1-era
0.5 m/2 m gate that would have passed a broken VO. The full-size twin
of this scene (240 frames, full EuRoC resolution) is
eval/accuracy_benchmark.py, with numbers recorded in BASELINE.md.
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
    loop=LoopClosureConfig(max_keyframes=192, min_frames_between=90,
                           min_score=0.3, min_matches=40),
    mapper=MapperConfig(max_points=60000, pair_lag=4),
    pose_graph=PoseGraphConfig(max_nodes=192, max_edges=512,
                               lm_iterations=5, cg_iterations=32),
    vo_scale_mode="median_depth",
)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from aria_slam_tpu.io import synthetic_scene

    out = tmp_path_factory.mktemp("scene_rotloop")
    synthetic_scene.generate(str(out), num_frames=140, fps=10.0,
                             cam=tp.SMALL_CAM, depth=4.0, traj="rotloop",
                             period=12.0)
    return str(out)


@pytest.fixture(scope="module")
def results(scene_dir):
    from aria_slam_tpu.eval import euroc_eval

    out = {}
    out["lc"] = euroc_eval.run(scene_dir, out_dir="/tmp/acc_reg_lc",
                               config=CFG, verbose=False, chunk=16)
    out["nolc"] = euroc_eval.run(
        scene_dir, out_dir="/tmp/acc_reg_nolc",
        config=dataclasses.replace(CFG, enable_loop_closure=False),
        verbose=False, chunk=16)
    return out


def test_ate_below_committed_threshold(results):
    """Measured 0.56 m on this scene (2026-08 r4: Sampson-polished
    RANSAC, homography rescue, chunk BA, t-weighted loop edges, and the
    pose graph no longer fighting metric-inconsistent backbone edges —
    backbone_weight defaults 0 since the r4 edge audit); gate =
    measured + ~25% margin. Path spans ~4.8 m, so the gate sits at
    ~15% of span. The 320x240/384-feature regime is match-starved
    (~110 matches/pair, ~60 deg two-view direction noise at 2%
    baseline/depth is information-theoretic, not a bug — see
    ops/epipolar.py polish notes); the full-res benchmark in
    eval/accuracy_benchmark.py is the representative number."""
    ate = results["lc"]["ate_rmse_m"]
    assert np.isfinite(ate)
    assert ate < 0.70, f"ATE {ate:.3f} m"


def test_loop_closure_found_and_not_harmful(results):
    """The revisit must be detected, and the t-weighted loop edges must
    not degrade ATE (r1: zero-baseline loop translations at 10x weight
    made LC strictly harmful)."""
    assert results["lc"]["loops"] >= 1
    assert results["lc"]["ate_rmse_m"] <= results["nolc"]["ate_rmse_m"] * 1.15 + 0.02, (
        f"LC {results['lc']['ate_rmse_m']:.3f} vs "
        f"no-LC {results['nolc']['ate_rmse_m']:.3f}")


def test_fused_beats_optimized_chain(results):
    """VERDICT r4 missing #2 (gate flipped from not-worse to beats):
    the offline fused track runs an RTS backward pass over the
    loop-closed, final-optimized chain, so it must be at least as good
    as the chain it consumes — a CAUSAL filter necessarily lags its
    input and was strictly worse in the r4 artifact (0.1857 vs
    0.1734 m Sim3)."""
    r = results["lc"]
    assert "ate_fused_rmse_m" in r
    assert r["ate_fused_rmse_m"] <= r["ate_rmse_m"] + 1e-3, (
        f"fused {r['ate_fused_rmse_m']:.4f} worse than the optimized "
        f"chain {r['ate_rmse_m']:.4f}")
    assert r["ate_fused_raw_rmse_m"] <= r["ate_raw_rmse_m"] + 1e-3, (
        f"fused raw {r['ate_fused_raw_rmse_m']:.4f} vs "
        f"chain raw {r['ate_raw_rmse_m']:.4f}")


def test_rotation_rpe_bounded(results):
    """Rotation drift gate: measured 0.15 deg RPE@10 with gyro chain
    fusion + no-backbone graph (r3's 2.6 deg was the final optimize
    twisting rotations to reconcile metric-inconsistent backbone
    edges); gate = measured + generous margin."""
    assert results["lc"]["rpe_rot_deg"] < 1.0, (
        f"rot RPE {results['lc']['rpe_rot_deg']:.2f} deg")


def test_lc_does_not_twist_rotations(results):
    """VERDICT r4 weak #5: loop closure may trade a LITTLE rotation
    quality for halved ATE (r4 on-chip: 0.0654 -> 0.0857 deg) but the
    r3 twist-the-trajectory failure mode (0.17 -> 7 deg on full runs)
    must not silently return — RELATIVE gate at nolc*1.5 + 0.02 deg,
    mirrored in accuracy_benchmark's ordering block."""
    assert (results["lc"]["rpe_rot_deg"]
            <= results["nolc"]["rpe_rot_deg"] * 1.5 + 0.02), (
        f"LC twisted rotations: {results['nolc']['rpe_rot_deg']:.3f} -> "
        f"{results['lc']['rpe_rot_deg']:.3f} deg RPE@10")


def test_loop_closure_preserves_metric_scale(results):
    """VERDICT r3 #3: loop edges must not drag the global scale (r3:
    umeyama 1.19 -> 1.33 with LC on, noscale ATE +34%). With the r4
    loop-scale fallback + consistent graph, lc and nolc scales are
    measured identical to 4 decimals; gate at 5%."""
    s_lc = results["lc"].get("umeyama_scale")
    s_nolc = results["nolc"].get("umeyama_scale")
    assert s_lc and s_nolc
    assert abs(np.log(s_lc / s_nolc)) < 0.05, (
        f"LC moved umeyama scale {s_nolc:.3f} -> {s_lc:.3f}")
    assert (results["lc"]["ate_noscale_rmse_m"]
            <= results["nolc"]["ate_noscale_rmse_m"] * 1.05 + 0.01)
