"""Multi-sequence DP evaluation harness (eval/multi_eval.py): S
sequences sharded over the 'data' mesh axis in one program, per-
sequence ATE out (SURVEY §5.8's batch-eval, VERDICT r2 missing #5)."""

import numpy as np
import pytest

import tests.test_pipeline as tp
from aria_slam_tpu.config import OrbConfig, PipelineConfig, RansacConfig

CFG = PipelineConfig(
    camera=tp.SMALL_CAM,
    orb=OrbConfig(num_features=384, num_levels=3),
    ransac=RansacConfig(num_hypotheses=128),
    enable_loop_closure=False,
    enable_mapping=False,
    enable_fusion=False,
)


@pytest.fixture(scope="module")
def scene_dirs(tmp_path_factory):
    from aria_slam_tpu.io import synthetic_scene

    dirs = []
    for i, period in enumerate([10.0, 14.0]):
        out = tmp_path_factory.mktemp(f"mseq{i}")
        synthetic_scene.generate(str(out), num_frames=25, fps=10.0,
                                 cam=tp.SMALL_CAM, depth=4.0, traj="sweep",
                                 period=period, seed=i)
        dirs.append(str(out))
    return dirs


def test_multi_eval_sharded_per_sequence_ate(scene_dirs):
    import jax

    from aria_slam_tpu.eval import multi_eval
    from aria_slam_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=2, n_model=1,
                     devices=jax.devices()[:2])
    results = multi_eval.run_scenes(scene_dirs, CFG, chunk=8, mesh=mesh,
                                    verbose=False)
    assert len(results) == 2
    for r in results:
        assert r["frames"] == 25
        assert np.isfinite(r["ate_rmse_m"])
        # distinct trajectories, shared program: both must track
        assert r["ate_rmse_m"] < 0.35, r
    # different periods -> genuinely different sequences were evaluated
    assert results[0]["ate_rmse_m"] != results[1]["ate_rmse_m"]


def test_multi_eval_pads_sequences_to_mesh(scene_dirs):
    """S=2 on a 4-device mesh: the batch pads to 4 with duplicates of
    the last sequence and still reports exactly S results (review
    finding: P('data') needs S % mesh == 0, arbitrary S must work)."""
    import jax

    from aria_slam_tpu.eval import multi_eval
    from aria_slam_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    results = multi_eval.run_scenes(scene_dirs, CFG, chunk=8, mesh=mesh,
                                    verbose=False)
    assert len(results) == 2
    for r in results:
        assert r["frames"] == 25
        assert np.isfinite(r["ate_rmse_m"])
        assert r["ate_rmse_m"] < 0.35, r


def test_multi_eval_rejects_mixed_cameras(scene_dirs, tmp_path):
    """One K is compiled for the whole batch; a sequence with different
    intrinsics must fail loudly, not silently mis-triangulate."""
    import dataclasses

    from aria_slam_tpu.eval import multi_eval
    from aria_slam_tpu.io import synthetic_scene

    other_cam = dataclasses.replace(tp.SMALL_CAM, fx=tp.SMALL_CAM.fx * 1.3)
    out = tmp_path / "othercam"
    synthetic_scene.generate(str(out), num_frames=5, fps=10.0,
                             cam=other_cam, depth=4.0, traj="sweep",
                             period=10.0, seed=7)
    with pytest.raises(ValueError, match="intrinsics"):
        multi_eval.run_scenes([scene_dirs[0], str(out)], CFG, chunk=4,
                              mesh=None, verbose=False)
