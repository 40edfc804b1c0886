"""ORB front-end: oracle checks against OpenCV CPU and self-consistency
under known geometric transforms (SURVEY.md §4: match rate, not
bit-exactness — the descriptor pattern is framework-specific)."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest

from aria_slam_tpu.config import OrbConfig
from aria_slam_tpu.ops import fast, orb
from aria_slam_tpu.ops import match as M


def synthetic_image(seed=0, h=240, w=320):
    """Textured test scene: random rectangles + blobs + noise."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 80.0, np.float32)
    for _ in range(60):
        y, x = rng.integers(0, h - 30), rng.integers(0, w - 30)
        hh, ww = rng.integers(5, 30), rng.integers(5, 30)
        img[y : y + hh, x : x + ww] = rng.uniform(0, 255)
    img += rng.normal(0, 2.0, size=(h, w)).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.float32)


CFG = OrbConfig(num_features=500, num_levels=4)


def test_fast_corners_overlap_opencv():
    img = synthetic_image(0)
    score = np.asarray(fast.nms_3x3(fast.fast_score_map(jnp.asarray(img), 20.0)))
    ours = np.argwhere(score > 0)  # (N, 2) y, x

    det = cv2.FastFeatureDetector_create(threshold=20, nonmaxSuppression=True)
    kps = det.detect(img.astype(np.uint8), None)
    ref = np.array([[kp.pt[1], kp.pt[0]] for kp in kps])
    assert len(ref) > 50 and len(ours) > 50

    # fraction of OpenCV corners that we also fire within 2 px
    d2 = ((ref[:, None, :] - ours[None, :, :]) ** 2).sum(-1).min(1)
    recall = (d2 <= 4.0).mean()
    assert recall > 0.8, f"FAST recall vs OpenCV too low: {recall:.2f}"


def test_extract_shapes_and_masks():
    img = synthetic_image(1)
    feats = jax.jit(lambda x: orb.extract(x, CFG))(jnp.asarray(img))
    assert feats.xy.shape == (500, 2)
    assert feats.desc.shape == (500, 256)
    nv = int(feats.num_valid())
    assert nv > 100
    v = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[v]
    assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
    # valid descriptors are 0/1
    d = np.asarray(feats.desc)[v]
    assert set(np.unique(d)).issubset({0, 1})


def test_descriptor_matching_under_translation():
    """Features extracted from a shifted copy must match back to the
    original at the shifted location — end-to-end front-end check."""
    img1 = synthetic_image(2)
    dx, dy = 13, 7
    img2 = np.roll(np.roll(img1, dy, axis=0), dx, axis=1)

    ext = jax.jit(lambda x: orb.extract(x, CFG))
    f1 = ext(jnp.asarray(img1))
    f2 = ext(jnp.asarray(img2))
    m = M.match(f1, f2, ratio=0.75)

    valid = np.asarray(m.valid)
    assert valid.sum() > 50, f"too few matches: {valid.sum()}"
    xy1 = np.asarray(f1.xy)[np.asarray(m.query_idx)[valid]]
    xy2 = np.asarray(f2.xy)[np.asarray(m.train_idx)[valid]]
    err = np.linalg.norm(xy2 - (xy1 + np.array([dx, dy])), axis=1)
    inlier_rate = (err < 2.0).mean()
    assert inlier_rate > 0.7, f"translation inlier rate {inlier_rate:.2f}"


def test_descriptor_matching_under_rotation():
    """rBRIEF steering: matches must survive an in-plane rotation."""
    img1 = synthetic_image(3)
    h, w = img1.shape
    angle = 20.0
    Mrot = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    img2 = cv2.warpAffine(img1, Mrot, (w, h), flags=cv2.INTER_LINEAR, borderValue=80.0)

    ext = jax.jit(lambda x: orb.extract(x, CFG))
    f1 = ext(jnp.asarray(img1))
    f2 = ext(jnp.asarray(img2.astype(np.float32)))
    m = M.match(f1, f2, ratio=0.8)

    valid = np.asarray(m.valid)
    assert valid.sum() > 30, f"too few matches under rotation: {valid.sum()}"
    xy1 = np.asarray(f1.xy)[np.asarray(m.query_idx)[valid]]
    xy2 = np.asarray(f2.xy)[np.asarray(m.train_idx)[valid]]
    ones = np.ones((len(xy1), 1))
    proj = (np.hstack([xy1, ones]) @ Mrot.T)
    err = np.linalg.norm(xy2 - proj, axis=1)
    inlier_rate = (err < 3.0).mean()
    assert inlier_rate > 0.5, f"rotation inlier rate {inlier_rate:.2f}"


def test_features_per_level_sums():
    ns = orb.features_per_level(2000, 8, 1.2)
    assert sum(ns) == 2000
    assert all(n > 0 for n in ns)
    assert ns[0] > ns[-1]
