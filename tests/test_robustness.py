"""Robustness parity sweep (VERDICT r2 missing #4 / next #7):
(a) unreadable images are skipped, not fatal (reference behavior,
    EuRoCReader.cpp:287-291);
(b) the front-end survives photometric degradation (sensor noise,
    exposure drift, motion blur) the clean renders never exercise;
(c) ChunkedSlam snapshot/resume reproduces a straight run exactly.
"""

import dataclasses
import os

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
    enable_fusion=False,
)


def _make_scene(tmp_path_factory, name, **kw):
    from aria_slam_tpu.io import synthetic_scene

    out = tmp_path_factory.mktemp(name)
    synthetic_scene.generate(str(out), num_frames=33, fps=10.0,
                             cam=tp.SMALL_CAM, depth=4.0, traj="sweep",
                             period=10.0, **kw)
    return str(out)


def test_load_image_safe_none_on_garbage(tmp_path):
    from aria_slam_tpu.io import euroc

    bad = tmp_path / "bad.png"
    bad.write_bytes(b"this is not a png")
    assert euroc.load_image_safe(str(bad)) is None
    assert euroc.load_image_safe(str(tmp_path / "missing.png")) is None


def test_unreadable_image_skipped_chunked(tmp_path_factory):
    """Corrupt one frame mid-sequence: the run must complete with a
    finite ATE and report the skip (the r2-flagged parity hole was a
    FileNotFoundError aborting the whole evaluation)."""
    from aria_slam_tpu.eval import euroc_eval
    from aria_slam_tpu.io import euroc

    scene = _make_scene(tmp_path_factory, "scene_badimg")
    data = euroc.load(scene)
    with open(data.image_paths[7], "wb") as f:
        f.write(b"corrupt")
    res = euroc_eval.run(scene, out_dir="/tmp/rob_badimg", config=CFG,
                         verbose=False, chunk=16)
    assert res["skipped_images"] >= 1
    assert np.isfinite(res["ate_rmse_m"])
    assert res["ate_rmse_m"] < 0.5


def test_all_images_unreadable_degrades_to_nan(tmp_path_factory):
    """Every frame unreadable (e.g. a truncated dataset copy): the
    online-mode run must report NaN metrics and the skip count, not
    crash on an empty trajectory (np.stack of an empty list was a
    regression in the r3 scoring refactor)."""
    from aria_slam_tpu.eval import euroc_eval
    from aria_slam_tpu.io import euroc

    scene = _make_scene(tmp_path_factory, "scene_allbad")
    data = euroc.load(scene)
    for p in data.image_paths:
        with open(p, "wb") as f:
            f.write(b"corrupt")
    res = euroc_eval.run(scene, out_dir="/tmp/rob_allbad", config=CFG,
                         verbose=False, chunk=0)
    assert res["skipped_images"] == len(data.image_paths)
    assert np.isnan(res["ate_rmse_m"])


def test_ekf_run_sequence_rejects_unsorted_streams():
    """The binary-search merge requires sorted inputs; an unsorted
    HOST stream must raise, not silently corrupt the event order.
    Device arrays skip the check by contract (ADVICE r3: validating
    them would force a D2H copy of both streams every call; io/euroc.py
    sorts at load, so host arrays are the path real data takes)."""
    import jax.numpy as jnp

    from aria_slam_tpu.config import EkfConfig
    from aria_slam_tpu.fusion import ekf

    imu_t = np.array([0.0, 0.2, 0.1, 0.3], np.float32)  # inversion
    vo_t = np.array([0.15, 0.25], np.float32)
    z3 = jnp.zeros((4, 3), jnp.float32)
    vo_R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (2, 1, 1))
    vo_p = jnp.zeros((2, 3), jnp.float32)
    with pytest.raises(ValueError, match="not sorted"):
        ekf.run_sequence(imu_t, z3, z3, vo_t, vo_R, vo_p, EkfConfig())
    # sorted host streams pass the guard and run
    imu_ok = np.array([0.0, 0.1, 0.2, 0.3], np.float32)
    poses = ekf.run_sequence(imu_ok, z3, z3, vo_t, vo_R, vo_p, EkfConfig())
    assert np.all(np.isfinite(np.asarray(poses[0])))


def test_photometric_stress_bounded(tmp_path_factory):
    """Noise + exposure drift + pan blur: accuracy may degrade but the
    front-end must not fall apart (gate ~2x a comfortable clean-scene
    bound for this 33-frame sweep)."""
    from aria_slam_tpu.eval import euroc_eval

    scene = _make_scene(tmp_path_factory, "scene_photo", noise_std=6.0,
                        exposure_drift=0.3, motion_blur=3)
    res = euroc_eval.run(scene, out_dir="/tmp/rob_photo", config=CFG,
                         verbose=False, chunk=16)
    assert np.isfinite(res["ate_rmse_m"])
    assert res["ate_rmse_m"] < 0.5, res["ate_rmse_m"]


def test_chunked_snapshot_resume_matches_straight_run(tmp_path_factory,
                                                      tmp_path):
    """Snapshot after chunk 1, restore into a FRESH evaluator, finish —
    trajectory, loop count and frame count must match the uninterrupted
    run (full state round-trips: graph/DB/map pytrees, scale carries,
    RNG key, scale-estimator window)."""
    from aria_slam_tpu.eval.chunked import ChunkedSlam
    from aria_slam_tpu.io import euroc
    from aria_slam_tpu.fusion import gyro_prior

    scene = _make_scene(tmp_path_factory, "scene_snap")
    data = euroc.load(scene)
    imu_window = (data.imu_ts, data.imu_accel, data.imu_gyro)

    def chunk_inputs(k, hi):
        idxs = list(range(k, hi + 1))
        frames = np.stack([euroc.load_image(data.image_paths[i])
                           for i in idxs])
        ts = [data.image_ts[i] for i in idxs]
        gR, gok = gyro_prior.pair_rotations(
            data.imu_ts, data.imu_gyro, ts, R_cam_imu=data.R_cam_imu)
        return frames, ts, gR, gok

    c1 = chunk_inputs(0, 16)
    c2 = chunk_inputs(16, 32)

    straight = ChunkedSlam(CFG, chunk=16)
    for c in (c1, c2):
        straight.process_chunk(*c, imu_window=imu_window)
    straight.finalize()

    first = ChunkedSlam(CFG, chunk=16)
    first.process_chunk(*c1, imu_window=imu_window)
    # the consensus history gates when a scale correction COMMITS; this
    # 33-frame scene never fills the estimator window, so force a
    # non-empty history to prove it round-trips (review finding: a
    # restore that drops it can commit on a single marginal solve)
    assert first._scale_est is not None
    first._scale_est._hist = [(0.1, 0.3), (-0.05, 0.2)]
    snap = str(tmp_path / "state.npz")
    first.snapshot(snap)

    resumed = ChunkedSlam(CFG, chunk=16)
    resumed.restore(snap)
    assert resumed.frame_count == first.frame_count
    assert resumed._scale_est._hist == first._scale_est._hist
    resumed.process_chunk(*c2, imu_window=imu_window)
    resumed.finalize()

    assert resumed.frame_count == straight.frame_count
    assert resumed.num_loops == straight.num_loops
    t_s = np.stack([T for _, T in straight.trajectory])
    t_r = np.stack([T for _, T in resumed.trajectory])
    np.testing.assert_allclose(t_r, t_s, atol=1e-4)
