"""Preintegration, detector wrapper, IMU benchmark, async pipeline,
demo CLI — the SURVEY §2 completion set."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aria_slam_tpu.core import lie
from aria_slam_tpu.fusion import preintegration as pre
from aria_slam_tpu.fusion import synthetic


# ----------------------------------------------------------- preintegration
def test_preintegration_static():
    """Static IMU (gravity-free synthetic accel = 0): deltas stay zero."""
    s = pre.init_state()
    for i in range(50):
        s = pre.integrate(s, jnp.asarray(i * 0.005), jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(s.delta_p), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s.delta_v), 0.0, atol=1e-6)
    assert abs(float(s.dt_sum) - 49 * 0.005) < 1e-5


def test_preintegration_constant_accel():
    """a = (1,0,0), no rotation: delta_v = a*t, delta_p = 0.5*a*t^2."""
    s = pre.init_state()
    dt = 0.005
    n = 200
    for i in range(n + 1):
        s = pre.integrate(s, jnp.asarray(i * dt), jnp.asarray([1.0, 0, 0]),
                          jnp.zeros(3))
    t = n * dt
    np.testing.assert_allclose(np.asarray(s.delta_v), [t, 0, 0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(s.delta_p), [0.5 * t * t, 0, 0], atol=2e-3)


def test_preintegration_rotation():
    """Constant yaw rate: delta_q integrates to the analytic rotation."""
    s = pre.init_state()
    dt = 0.005
    n = 200
    w = jnp.asarray([0.0, 0.0, 0.5])
    for i in range(n + 1):
        s = pre.integrate(s, jnp.asarray(i * dt), jnp.zeros(3), w)
    R = np.asarray(lie.quat_to_mat(s.delta_q))
    angle = 0.5 * n * dt
    R_ref = np.array([[np.cos(angle), -np.sin(angle), 0],
                      [np.sin(angle), np.cos(angle), 0], [0, 0, 1]])
    np.testing.assert_allclose(R, R_ref, atol=1e-3)


def test_preintegration_window_matches_loop():
    data = synthetic.circular_motion(duration_s=0.5)
    n = 64
    ts = jnp.asarray(data["imu_t"][:n])
    acc = jnp.asarray(data["accel"][:n])
    gyr = jnp.asarray(data["gyro"][:n])
    valid = jnp.ones(n, bool)
    s_win = pre.integrate_window(pre.init_state(), ts, acc, gyr, valid)
    s_loop = pre.init_state()
    for i in range(n):
        s_loop = pre.integrate(s_loop, ts[i], acc[i], gyr[i])
    np.testing.assert_allclose(np.asarray(s_win.delta_p),
                               np.asarray(s_loop.delta_p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_win.P), np.asarray(s_loop.P), atol=1e-7)


def test_preintegration_dt_gate():
    s = pre.init_state()
    s = pre.integrate(s, jnp.asarray(0.0), jnp.ones(3), jnp.zeros(3))
    s1 = pre.integrate(s, jnp.asarray(5.0), jnp.ones(3), jnp.zeros(3))  # dt > 0.5
    np.testing.assert_allclose(np.asarray(s1.delta_p), np.asarray(s.delta_p))


# ----------------------------------------------------------------- detector
def test_detector_wrapper_shapes():
    from aria_slam_tpu.config import DetectorConfig
    from aria_slam_tpu.models.detect import make_detector

    cfg = DetectorConfig(input_size=64, width_mult=0.25, max_detections=20,
                         conf_threshold=0.0)
    detect = make_detector(cfg)
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (120, 160))
                      .astype(np.float32))
    det = jax.jit(detect)(img)
    assert det.boxes.shape == (20, 4)
    assert np.isfinite(np.asarray(det.boxes)).all()
    # rescale stays within ~the image bounds for gated boxes
    v = np.asarray(det.valid)
    if v.any():
        b = np.asarray(det.boxes)[v]
        assert b[:, 0].min() > -200 and b[:, 2].max() < 400


# ------------------------------------------------------------ imu benchmark
def test_imu_benchmark_cli():
    from aria_slam_tpu.eval import imu_benchmark

    res = imu_benchmark.run(duration_s=3.0, verbose=False)
    assert res["mean_err_m"] < 0.05


# ------------------------------------------------------------ async pipeline
def test_async_pipeline_on_mock():
    from aria_slam_tpu import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    import tests.test_pipeline as tp
    from aria_slam_tpu.pipeline import factory
    from aria_slam_tpu.pipeline.async_pipeline import AsyncSlamPipeline

    pipe = factory.create_mock(tp.SMALL_CFG)
    rng = np.random.default_rng(0)
    # warm the jit cache synchronously so the async drain timeout only
    # covers steady-state work, not first-call compilation
    pipe.process_frame(rng.uniform(0, 255, (240, 320)).astype(np.float32), 0.0)
    with AsyncSlamPipeline(pipe, drop_threshold=0) as ap:
        for k in range(1, 6):
            assert ap.submit(k * 0.1, rng.uniform(0, 255, (240, 320))
                             .astype(np.float32))
        results = ap.drain(timeout_s=60.0)
    assert len(results) == 5
    assert all(np.isfinite(p).all() for _, p in results)
    ts = [t for t, _ in results]
    assert ts == sorted(ts)


# -------------------------------------------------------------------- demo
def test_demo_headless(tmp_path):
    import cv2
    import dataclasses
    import tests.test_pipeline as tp
    from aria_slam_tpu.eval import demo
    from aria_slam_tpu.io import synthetic_scene

    # tiny video from rendered frames
    video = str(tmp_path / "test.mp4")
    wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (320, 240))
    tex = synthetic_scene._texture(512, seed=1)
    for k in range(6):
        pos, R = synthetic_scene.trajectory(k / 10.0)
        img = synthetic_scene.render_frame(tp.SMALL_CAM, tex, pos, R)
        wr.write(cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))
    wr.release()

    cfg = dataclasses.replace(tp.SMALL_CFG, enable_fusion=False,
                              enable_mapping=False, enable_loop_closure=False)
    stats = demo.run(video, headless=True, config=cfg)
    assert stats["frames"] == 6
