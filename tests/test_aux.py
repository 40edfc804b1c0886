"""Aux subsystems: audio engine, VLM worker, Aria mock device,
profiling, logging, snapshot (SURVEY.md §5 + rows 26-28)."""

import os
import time

import numpy as np
import pytest

from aria_slam_tpu.utils import audio, profiling
from aria_slam_tpu.utils.logging import MetricsEmitter, get_logger
from aria_slam_tpu.models import vlm


# ------------------------------------------------------------------- audio
def make_engine(clock):
    sink = audio.MockAudioFeedback()
    eng = audio.NavigationAudioEngine(sink, image_width=640, clock=clock)
    return sink, eng


def test_audio_direction_and_priority():
    t = [0.0]
    sink, eng = make_engine(lambda: t[0])
    boxes = np.array([[0, 100, 100, 300],      # left
                      [270, 100, 370, 300],    # center
                      [540, 100, 640, 300]])   # right
    classes = np.array([0, 2, 16])  # person, car, dog
    valid = np.ones(3, bool)
    events = eng.process_detections(boxes, classes, valid,
                                    depths=[0.5, 3.0, 10.0])
    assert len(events) == 3
    by_class = {e.message.split()[0]: e for e in events}
    assert by_class["person"].direction == audio.Direction.LEFT
    assert by_class["person"].priority == audio.Priority.CRITICAL
    assert by_class["car"].direction == audio.Direction.CENTER
    assert by_class["dog"].direction == audio.Direction.RIGHT
    assert by_class["dog"].priority == audio.Priority.LOW
    assert len(sink.alerts) == 1  # critical person
    assert len(sink.beeps) == 3


def test_audio_cooldown():
    t = [0.0]
    sink, eng = make_engine(lambda: t[0])
    boxes = np.array([[300, 100, 400, 300]])
    classes = np.array([2])  # car @3m -> MEDIUM, cooldown 800ms
    valid = np.ones(1, bool)
    assert len(eng.process_detections(boxes, classes, valid, [3.0])) == 1
    t[0] = 0.4
    assert len(eng.process_detections(boxes, classes, valid, [3.0])) == 0
    t[0] = 1.0
    assert len(eng.process_detections(boxes, classes, valid, [3.0])) == 1


def test_audio_non_dynamic_class_ignored():
    sink, eng = make_engine(lambda: 0.0)
    events = eng.process_detections(np.array([[0, 0, 10, 10]]),
                                    np.array([56]), np.ones(1, bool))
    assert events == []


def test_espeak_sink_commands_and_beep_wav():
    """Real-TTS sink: verify command construction and the generated
    stereo beep WAV through an injected runner (no espeak needed)."""
    calls = []
    sink = audio.EspeakAudioFeedback("espeak-ng", "paplay",
                                     runner=calls.append)
    sink.speak("person left", audio.Priority.MEDIUM)
    assert calls[-1][0] == "espeak-ng" and calls[-1][-1] == "person left"
    sink.play_critical_alert("stop")
    assert calls[-1][-1] == "stop" and "210" in calls[-1]  # faster speech

    sink.play_beep(-1.0, audio.Priority.HIGH)
    cmd = calls[-1]
    assert cmd[0] == "paplay"
    import wave

    with wave.open(cmd[1], "rb") as w:
        assert w.getnchannels() == 2
        frames = np.frombuffer(w.readframes(w.getnframes()),
                               np.int16).reshape(-1, 2)
    # hard-left pan: right channel silent
    assert np.abs(frames[:, 1]).max() == 0
    assert np.abs(frames[:, 0]).max() > 1000
    # cached on second call
    sink.play_beep(-1.0, audio.Priority.HIGH)
    assert calls[-1][1] == cmd[1]


def test_create_audio_feedback_probes_host():
    sink = audio.create_audio_feedback()
    assert isinstance(sink, (audio.EspeakAudioFeedback,
                             audio.ConsoleAudioFeedback))
    assert isinstance(audio.create_audio_feedback(prefer_real=False),
                      audio.ConsoleAudioFeedback)


# --------------------------------------------------------------------- vlm
def test_vlm_async_worker_drop_oldest():
    class Slow:
        def describe(self, image, detections=None):
            time.sleep(0.05)
            return f"mean={float(np.mean(image)):.0f}"

    w = vlm.AsyncSceneWorker(Slow())
    try:
        for k in range(10):  # floods the queue; old frames dropped
            w.submit(k * 0.03, np.full((4, 4), k * 10.0))
        deadline = time.time() + 2.0
        while w.latest() is None and time.time() < deadline:
            time.sleep(0.01)
        assert w.latest() is not None
        assert w.latest().latency_s >= 0.05
    finally:
        w.close()


def test_vlm_mock_description():
    m = vlm.MockSceneUnderstanding()
    txt = m.describe(np.full((8, 8), 200.0))
    assert "bright" in txt


# ------------------------------------------------------------------- aria
def test_mock_aria_device_streams(tmp_path):
    import cv2

    from aria_slam_tpu.io.aria import MockAriaDevice

    for k in range(3):
        cv2.imwrite(str(tmp_path / f"{k}.png"),
                    np.full((32, 32), k * 40, np.uint8))
    dev = MockAriaDevice(str(tmp_path), interval_s=0.01, imu_hz=100.0)
    frames, imu = [], []
    dev.set_image_callback(lambda ts, img, cam: frames.append((ts, img.mean(), cam)))
    dev.set_imu_callback(lambda ts, a, g: imu.append(ts))
    assert dev.connect()
    cal = dev.get_calibration("slam-left")
    assert cal.width == 32
    dev.start_streaming()
    deadline = time.time() + 2.0
    while len(frames) < 3 and time.time() < deadline:
        dev.spin_once()
    dev.stop_streaming()
    assert len(frames) == 3
    assert frames[0][2] == "slam-left"
    assert len(imu) > 0


# ------------------------------------------------------------ profiling etc
def test_stage_timer():
    t = profiling.StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["mean_ms"] >= 5
    assert "a" in t.report()


def test_metrics_emitter(tmp_path):
    p = str(tmp_path / "m.jsonl")
    em = MetricsEmitter(p)
    em.emit("frame", fps=30.0)
    em.close()
    import json

    rec = json.loads(open(p).read().strip())
    assert rec["event"] == "frame" and rec["fps"] == 30.0


def test_snapshot_roundtrip():
    import jax
    import jax.numpy as jnp

    from aria_slam_tpu.utils import snapshot

    state = {"a": jnp.arange(5), "b": (jnp.ones(3), jax.random.key(7))}
    path = "/tmp/snap_test.npz"
    snapshot.save_state(state, path)
    restored = snapshot.load_state(state, path)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(5))
    assert jax.random.normal(restored["b"][1]).shape == ()
    os.remove(path)


def test_longrun_loop_truth_clamps_pad_frames():
    """The chunked evaluator pads the final chunk by repeating the last
    image (eval/euroc_eval.py load_chunk), so accepted loop pairs can
    carry a query id == frames. loop_truth must clamp those to the last
    real frame (whose image the pad duplicates) instead of crashing —
    regression for the r5 on-chip longrun abort."""
    from aria_slam_tpu.eval.longrun import loop_truth
    from aria_slam_tpu.io.euroc import EurocData

    frames = 12
    ts = np.arange(frames, dtype=np.float64)
    # circular path of circumference 8 -> frame i and i+8 coincide
    ang = 2 * np.pi * (ts % 8) / 8
    pos = np.stack([np.cos(ang), np.sin(ang), np.zeros(frames)], axis=1)
    quat = np.tile(np.array([1.0, 0, 0, 0]), (frames, 1))
    data = EurocData(
        image_ts=ts, image_paths=[""] * frames,
        imu_ts=np.zeros(0), imu_gyro=np.zeros((0, 3)),
        imu_accel=np.zeros((0, 3)),
        gt_ts=ts, gt_pos=pos, gt_quat=quat)

    # (3, 11) is a true revisit (11 % 8 == 3); (3, 12) is the same pair
    # reported at the PAD frame id (12 == frames -> clamps to 11)
    prec, recall, n_true, n_opp, det = loop_truth(
        data, frames, [(3, 11), (3, 12)], min_gap=4, gt_dist_m=0.3,
        db_capacity=64)
    assert det["accepted"] == 1  # (3,12) clamps to (3,11): deduped
    assert prec == 1.0 and n_true >= 1
    assert 0.0 <= recall <= 1.0
