"""Hamming MXU matcher vs numpy/OpenCV oracles."""

import numpy as np
import cv2
import jax.numpy as jnp

from aria_slam_tpu.core.types import Features
from aria_slam_tpu.ops import match as M
from aria_slam_tpu.ops import brief


def random_features(seed, k=128, bits=256, invalid_tail=8):
    rng = np.random.default_rng(seed)
    desc = rng.integers(0, 2, size=(k, bits)).astype(np.int8)
    valid = np.ones(k, bool)
    if invalid_tail:
        valid[-invalid_tail:] = False
    return Features(
        xy=jnp.zeros((k, 2), jnp.float32),
        response=jnp.ones((k,), jnp.float32),
        angle=jnp.zeros((k,), jnp.float32),
        octave=jnp.zeros((k,), jnp.int32),
        size=jnp.full((k,), 31.0, jnp.float32),
        desc=jnp.asarray(desc),
        valid=jnp.asarray(valid),
    ), desc, valid


def test_hamming_matrix_matches_numpy():
    fq, dq, _ = random_features(0, invalid_tail=0)
    ft, dt, vt = random_features(1)
    dist = np.asarray(M.hamming_matrix(fq.desc, ft.desc, ft.valid))
    ref = (dq[:, None, :] != dt[None, :, :]).sum(-1)
    ref[:, ~vt] = 1 << 20
    np.testing.assert_array_equal(dist, ref)


def test_pack_unpack_roundtrip():
    _, d, _ = random_features(2, invalid_tail=0)
    packed = brief.pack_bits(jnp.asarray(d))
    unpacked = np.asarray(brief.unpack_bits(packed))
    np.testing.assert_array_equal(unpacked, d)


def test_match_agrees_with_opencv_bf_ratio():
    fq, dq, vq = random_features(3, k=256, invalid_tail=0)
    ft, dt, vt = random_features(4, k=256, invalid_tail=0)
    # make some strong true matches: copy descriptors with few flipped bits
    rng = np.random.default_rng(5)
    for i in range(0, 100):
        d = dq[i].copy()
        flips = rng.choice(256, size=8, replace=False)
        d[flips] ^= 1
        dt[i] = d
    ft = ft.replace(desc=jnp.asarray(dt))

    ours = M.match(fq.replace(desc=jnp.asarray(dq)), ft, ratio=0.75)
    ours_valid = np.asarray(ours.valid)
    ours_train = np.asarray(ours.train_idx)
    ours_dist = np.asarray(ours.distance)

    def pack_cv(d):
        return np.packbits(d.astype(np.uint8), axis=1)

    bf = cv2.BFMatcher(cv2.NORM_HAMMING)
    knn = bf.knnMatch(pack_cv(dq), pack_cv(dt), k=2)
    for q, pair in enumerate(knn):
        m, n = pair
        ref_ok = m.distance < 0.75 * n.distance
        assert bool(ours_valid[q]) == ref_ok, f"query {q}"
        if ref_ok:
            assert ours_train[q] == m.trainIdx
            assert ours_dist[q] == m.distance


def test_cross_check_is_subset():
    fq, _, _ = random_features(6, k=128, invalid_tail=0)
    ft, _, _ = random_features(7, k=128, invalid_tail=0)
    plain = np.asarray(M.match(fq, ft, ratio=0.9).valid)
    crossed = np.asarray(M.match(fq, ft, ratio=0.9, cross_check=True).valid)
    assert (crossed & ~plain).sum() == 0


def test_database_scores_prefer_same_frame():
    fq, dq, vq = random_features(8, k=64, invalid_tail=0)
    rng = np.random.default_rng(9)
    n, f, b = 16, 64, 256
    db = rng.integers(0, 2, size=(n, f, b)).astype(np.int8)
    # keyframe 5 = noisy copy of the query
    noisy = dq.copy()
    mask = rng.random(size=noisy.shape) < 0.02
    noisy[mask] ^= 1
    db[5] = noisy
    scores = np.asarray(
        M.match_scores_vs_database(
            fq.desc, fq.valid, jnp.asarray(db), jnp.ones((n, f), bool), ratio=0.7
        )
    )
    assert scores.argmax() == 5
    assert scores[5] > 0.5
