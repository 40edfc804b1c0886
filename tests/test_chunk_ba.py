"""Chunk-local multiview bundle adjustment (backend/chunk_ba.py).

Pinned behaviors: track linking, closed-form multiview triangulation,
and the alternation's ability to pull noisy chained poses back onto the
multiview-consistent trajectory — the capability two-view chained VO
(reference src/main.cpp:187-209) fundamentally lacks.
"""

import numpy as np
import jax
import jax.numpy as jnp

from aria_slam_tpu.backend import chunk_ba
from aria_slam_tpu.config import ChunkBaConfig

K = jnp.asarray(
    [[400.0, 0.0, 320.0], [0.0, 400.0, 240.0], [0.0, 0.0, 1.0]],
    jnp.float32)


def test_build_tracks_links_and_breaks():
    # 3 frames, 4 slots. Frame1 slot0 <- frame0 slot2 (inlier),
    # frame1 slot1 <- frame0 slot3 (NOT an inlier -> new track),
    # frame2 slot2 <- frame1 slot0 (inlier -> continues track of f0s2).
    midx = jnp.asarray([[2, 3, 0, 0], [1, 2, 0, 3]], jnp.int32)
    cinl = jnp.asarray(
        [[True, False, False, False], [False, False, True, False]])
    ids = np.asarray(chunk_ba.build_tracks(midx, cinl, 4))
    assert ids[0].tolist() == [0, 1, 2, 3]
    assert ids[1, 0] == 2          # linked to frame0 slot2
    assert ids[1, 1] == 4 + 1      # broken -> fresh id frame1 slot1
    assert ids[2, 2] == 2          # three-frame track
    assert ids[2, 0] == 2 * 4 + 0  # fresh


def _scene(f=8, n=96, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-3, -2, 3], [3, 2, 8], size=(n, 3))
    poses = []
    for i in range(f):
        T = np.eye(4, dtype=np.float32)
        a = 0.04 * i
        c, s = np.cos(a), np.sin(a)
        T[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T[:3, 3] = [0.12 * i, 0.02 * i, 0.05 * np.sin(i)]
        poses.append(T)
    poses = np.stack(poses)

    Kn = np.asarray(K)
    uv = np.empty((f, n, 2), np.float32)
    for i in range(f):
        Tinv = np.linalg.inv(poses[i])
        Xc = pts @ Tinv[:3, :3].T + Tinv[:3, 3]
        p = Xc[:, :2] / Xc[:, 2:3]
        uv[i] = p * [Kn[0, 0], Kn[1, 1]] + [Kn[0, 2], Kn[1, 2]]
    return poses, pts, uv


def test_triangulate_tracks_recovers_points():
    f, n = 6, 64
    poses, pts, uv = _scene(f, n, seed=1)
    ids = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (f, 1))
    w = jnp.ones((f, n), jnp.float32)
    X, cnt = chunk_ba.triangulate_tracks(
        jnp.asarray(poses), jnp.asarray(uv), w, ids, K, f * n)
    X = np.asarray(X)[:n]
    assert np.asarray(cnt)[:n].min() == f
    np.testing.assert_allclose(X, pts, atol=5e-2)  # f32 at 3-8 m depth


def test_refine_pulls_noisy_chain_back():
    """Exact observations, pose chain perturbed like VO drift (growing
    translation error + small rotation error): BA must cut the position
    error several-fold and land at sub-pixel reprojection."""
    f, n = 8, 96
    poses, pts, uv = _scene(f, n, seed=2)

    rng = np.random.default_rng(3)
    noisy = poses.copy()
    for i in range(1, f):
        # random-walk translation noise (the measured VO failure mode:
        # good rotations, noise-bound translation directions)
        noisy[i, :3, 3] += np.cumsum(
            rng.normal(0, 0.015, size=3)) + rng.normal(0, 0.02, size=3)
        w = rng.normal(0, 0.004, size=3)
        from aria_slam_tpu.core import lie
        dR = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
        noisy[i, :3, :3] = noisy[i, :3, :3] @ dR

    # every feature tracks through all frames
    midx = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (f - 1, 1))
    cinl = jnp.ones((f - 1, n), bool)
    fvalid = jnp.ones((f, n), bool)

    cfg = ChunkBaConfig()
    refined, err_b, err_a, geo_z, zcnt = jax.jit(
        lambda p: chunk_ba.refine(
            p, jnp.asarray(uv), fvalid, midx, cinl, K, cfg))(
        jnp.asarray(noisy))
    refined = np.asarray(refined)

    # landmark-depth pin statistic: geomean camera-frame depth of the
    # refined reconstruction must match the true scene's geomean depth
    # (the whole point of pinning on multi-view instead of two-view
    # depths — config.ba_scale_pin)
    z_true = []
    for i in range(f):
        Tinv = np.linalg.inv(poses[i])
        z_true.append((pts @ Tinv[:3, :3].T + Tinv[:3, 3])[:, 2])
    # per-landmark statistic: mean log depth over each track's frames,
    # log-MEDIAN over the (well-conditioned) landmarks — matching
    # chunk_ba.refine's masked_log_median aggregation. Tolerance covers
    # the refined chain's scale repin (path length of the NOISY chain,
    # a few % off truth) plus the median histogram quantization.
    z_lm = np.exp(np.mean(np.log(np.stack(z_true)), axis=0))  # (n,)
    true_med = float(np.median(z_lm))
    assert float(zcnt) > 0.9 * n, float(zcnt)
    assert abs(np.log(float(geo_z) / true_med)) < 0.08, (
        float(geo_z), true_med)

    pos_err_before = np.linalg.norm(noisy[:, :3, 3] - poses[:, :3, 3],
                                    axis=1).mean()
    pos_err_after = np.linalg.norm(refined[:, :3, 3] - poses[:, :3, 3],
                                   axis=1).mean()
    assert float(err_a) < float(err_b), (float(err_b), float(err_a))
    assert float(err_a) < 0.5, f"reproj after {float(err_a):.3f} px"
    assert pos_err_after < 0.35 * pos_err_before, (
        f"{pos_err_before:.4f} -> {pos_err_after:.4f}")
    # gauge: pose 0 untouched
    np.testing.assert_allclose(refined[0], noisy[0], atol=1e-6)


def test_refine_respects_invalid_and_outliers():
    """Gross outlier observations (wrong pixels) must be gated out: the
    refinement should still improve, not chase the outliers."""
    f, n = 6, 96
    poses, pts, uv = _scene(f, n, seed=4)
    rng = np.random.default_rng(5)
    uv_bad = uv.copy()
    bad = rng.random((f, n)) < 0.1
    uv_bad[bad] += rng.uniform(40, 120, size=(bad.sum(), 2))

    noisy = poses.copy()
    noisy[1:, :3, 3] += rng.normal(0, 0.03, size=(f - 1, 3))

    midx = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (f - 1, 1))
    cinl = jnp.ones((f - 1, n), bool)
    fvalid = jnp.ones((f, n), bool)
    refined, err_b, err_a, _, _ = chunk_ba.refine(
        jnp.asarray(noisy), jnp.asarray(uv_bad), fvalid, midx, cinl, K,
        ChunkBaConfig())
    refined = np.asarray(refined)
    pos_err_before = np.linalg.norm(noisy[:, :3, 3] - poses[:, :3, 3],
                                    axis=1).mean()
    pos_err_after = np.linalg.norm(refined[:, :3, 3] - poses[:, :3, 3],
                                   axis=1).mean()
    assert np.all(np.isfinite(refined))
    # outliers cost accuracy but must not make things WORSE
    assert pos_err_after < 0.95 * pos_err_before, (
        f"{pos_err_before:.4f} -> {pos_err_after:.4f}")
