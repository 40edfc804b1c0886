"""YOLO detector model + NMS + dynamic-object filtering."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from aria_slam_tpu.config import DetectorConfig
from aria_slam_tpu.core.types import Detections
from aria_slam_tpu.models import yolo
from aria_slam_tpu.ops import boxes

TINY = DetectorConfig(input_size=64, width_mult=0.25, depth_mult=0.33,
                      max_detections=50)


def test_model_forward_shapes():
    model, variables = yolo.init_params(TINY, jax.random.key(0))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    outs = model.apply(variables, x)
    assert len(outs) == 3  # strides 8, 16, 32
    for (box, cls), stride in zip(outs, (8, 16, 32)):
        assert box.shape[:3] == (1, 64 // stride, 64 // stride)
        assert box.shape[-1] == 4 * 16
        assert cls.shape[-1] == TINY.num_classes
    b, s = yolo.decode_predictions(outs, 64, TINY.num_classes)
    n_anchors = sum((64 // st) ** 2 for st in (8, 16, 32))
    assert b.shape == (1, n_anchors, 4)
    assert s.shape == (1, n_anchors, TINY.num_classes)
    assert np.isfinite(np.asarray(b)).all()


def test_weights_roundtrip(tmp_path):
    _, variables = yolo.init_params(TINY, jax.random.key(1))
    path = str(tmp_path / "w.npz")
    yolo.save_weights(variables, path)
    loaded = yolo.load_weights(path)
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nms_matches_opencv():
    rng = np.random.default_rng(0)
    n = 64
    base = rng.uniform([0, 0], [200, 200], (n, 2))
    wh = rng.uniform(20, 60, (n, 2))
    bxs = np.concatenate([base, base + wh], -1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)

    keep = np.asarray(boxes.nms(jnp.asarray(bxs), jnp.asarray(scores),
                                jnp.ones(n, bool), 0.45))
    cv_keep = cv2.dnn.NMSBoxes(
        [(float(b[0]), float(b[1]), float(b[2] - b[0]), float(b[3] - b[1])) for b in bxs],
        scores.tolist(), 0.0, 0.45,
    )
    cv_set = set(np.asarray(cv_keep).flatten().tolist())
    ours_set = set(np.where(keep)[0].tolist())
    # identical greedy policy -> identical keep sets
    assert ours_set == cv_set


def test_batched_detector_matches_single():
    """make_batched_detector(use_nms=True) must reproduce make_detector
    frame-for-frame (same variables, same preprocessing)."""
    from aria_slam_tpu.models.detect import make_batched_detector, make_detector

    _, variables = yolo.init_params(TINY, jax.random.key(2))
    single = jax.jit(make_detector(TINY, variables=variables))
    batched = jax.jit(make_batched_detector(TINY, variables=variables,
                                            use_nms=True))
    rng = np.random.default_rng(7)
    imgs = rng.uniform(0, 255, (2, 48, 72)).astype(np.float32)
    db = batched(jnp.asarray(imgs))
    for i in range(2):
        ds = single(jnp.asarray(imgs[i]))
        np.testing.assert_allclose(np.asarray(db.boxes[i]),
                                   np.asarray(ds.boxes), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(db.valid[i]),
                                      np.asarray(ds.valid))
        np.testing.assert_array_equal(np.asarray(db.classes[i]),
                                      np.asarray(ds.classes))


def test_dynamic_box_filter():
    det = Detections(
        boxes=jnp.asarray([[10, 10, 50, 50], [100, 100, 150, 150],
                           [60, 60, 80, 80]], jnp.float32),
        scores=jnp.asarray([0.9, 0.9, 0.9]),
        classes=jnp.asarray([0, 56, 2]),  # person, chair, car
        valid=jnp.asarray([True, True, False]),
    )
    pts = jnp.asarray([[30, 30], [120, 120], [70, 70], [200, 200]], jnp.float32)
    inside = np.asarray(boxes.points_in_dynamic_boxes(pts, det))
    # person box: yes; chair (not dynamic): no; car box invalid: no; outside: no
    np.testing.assert_array_equal(inside, [True, False, False, False])
