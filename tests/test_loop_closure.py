"""Loop-closure detector over the device-resident keyframe DB."""

import numpy as np
import jax
import jax.numpy as jnp

from aria_slam_tpu.config import LoopClosureConfig, OrbConfig, RansacConfig
from aria_slam_tpu.backend import keyframe_db, loop_closure
from aria_slam_tpu.core.types import Features

K = jnp.asarray(np.array([[458.0, 0, 376.0], [0, 457.0, 240.0], [0, 0, 1.0]], np.float32))
ORB = OrbConfig(num_features=256)
LC = LoopClosureConfig(max_keyframes=32, min_frames_between=10, min_score=0.3, min_matches=30)
RS = RansacConfig(num_hypotheses=128)


def make_frame(seed, n=256, scene=None):
    """Synthetic 'frame': random 3D scene projected to pixels + random
    descriptors. Same scene + same descriptors = revisited place."""
    rng = np.random.default_rng(seed)
    if scene is None:
        scene = rng.uniform([-4, -3, 4], [4, 3, 12], size=(n, 3))
    desc = rng.integers(0, 2, size=(n, 256)).astype(np.int8)
    uv = scene[:, :2] / scene[:, 2:3]
    uv = uv * [458.0, 457.0] + [376.0, 240.0]
    return Features(
        xy=jnp.asarray(uv.astype(np.float32)),
        response=jnp.ones((n,), jnp.float32),
        angle=jnp.zeros((n,), jnp.float32),
        octave=jnp.zeros((n,), jnp.int32),
        size=jnp.full((n,), 31.0, jnp.float32),
        desc=jnp.asarray(desc),
        valid=jnp.ones((n,), bool),
    ), scene, desc


def revisit(feats, scene, desc, shift, flip_frac=0.02, seed=99):
    """Same place seen again: slightly moved camera, slightly noisy bits."""
    rng = np.random.default_rng(seed)
    moved = scene + np.asarray(shift)
    uv = moved[:, :2] / moved[:, 2:3]
    uv = uv * [458.0, 457.0] + [376.0, 240.0]
    d = desc.copy()
    mask = rng.random(d.shape) < flip_frac
    d[mask] ^= 1
    return feats.replace(xy=jnp.asarray(uv.astype(np.float32)), desc=jnp.asarray(d))


def test_detects_revisited_place():
    db = keyframe_db.init_db(LC, ORB)
    f0, scene, desc = make_frame(0)
    db = keyframe_db.add_keyframe(db, f0, 0, jnp.eye(4))
    for fid in range(1, 6):
        f, _, _ = make_frame(fid)
        db = keyframe_db.add_keyframe(db, f, fid, jnp.eye(4))

    query = revisit(f0, scene, desc, shift=[0.3, 0.0, 0.1])
    res = jax.jit(
        lambda d, q: loop_closure.detect(d, q, 50, K, LC, RS, jax.random.key(0))
    )(db, query)
    assert bool(res.detected)
    assert int(res.frame_id) == 0
    assert int(res.num_inliers) >= LC.min_matches
    assert float(res.score) > 0.5


def test_no_detection_for_new_place():
    db = keyframe_db.init_db(LC, ORB)
    for fid in range(6):
        f, _, _ = make_frame(fid)
        db = keyframe_db.add_keyframe(db, f, fid, jnp.eye(4))
    novel, _, _ = make_frame(777)
    res = loop_closure.detect(db, novel, 50, K, LC, RS, jax.random.key(1))
    assert not bool(res.detected)


def test_frame_gap_gate():
    """A revisit too soon after insertion must be rejected
    (parity: min_frames_between, LoopClosure.cpp:41-47)."""
    db = keyframe_db.init_db(LC, ORB)
    f0, scene, desc = make_frame(10)
    db = keyframe_db.add_keyframe(db, f0, 45, jnp.eye(4))
    query = revisit(f0, scene, desc, shift=[0.2, 0, 0])
    res = loop_closure.detect(db, query, 50, K, LC, RS, jax.random.key(2))  # gap 5 < 10
    assert not bool(res.detected)


def test_loop_edge_convention_large_rotation():
    """Pin the full T_rel convention chain under a LARGE relative
    rotation: verify_candidate's T_rel must equal T_{matched<-current}
    = inv(T_matched_wc) @ T_current_wc — the pose-graph edge measurement
    for edge (i=matched, j=current) — with the metric translation scale
    recovered by median-depth normalization (ADVICE r1 high finding)."""
    from aria_slam_tpu.core import lie

    rng = np.random.default_rng(5)
    n = 256
    scene_w = rng.uniform([-4, -3, 4], [4, 3, 12], size=(n, 3)).astype(np.float64)
    desc = rng.integers(0, 2, size=(n, 256)).astype(np.int8)

    T_m = np.eye(4, dtype=np.float32)  # matched keyframe: world origin
    # current camera: 35 deg yaw + sideways translation
    ang = np.deg2rad(35.0)
    T_c = np.eye(4, dtype=np.float32)
    T_c[:3, :3] = np.asarray(
        lie.so3_exp(jnp.asarray([0.0, ang, 0.0], jnp.float32))
    )
    T_c[:3, 3] = [1.0, 0.2, 0.5]

    def project(T_wc):
        Tinv = np.linalg.inv(T_wc)
        Xc = scene_w @ Tinv[:3, :3].T + Tinv[:3, 3]
        uv = Xc[:, :2] / Xc[:, 2:3]
        uv = uv * [458.0, 457.0] + [376.0, 240.0]
        return uv.astype(np.float32), Xc[:, 2]

    uv_m, _ = project(T_m)
    uv_c, z_c = project(T_c)

    def feats(uv, d):
        return Features(
            xy=jnp.asarray(uv), response=jnp.ones((n,), jnp.float32),
            angle=jnp.zeros((n,), jnp.float32),
            octave=jnp.zeros((n,), jnp.int32),
            size=jnp.full((n,), 31.0, jnp.float32),
            desc=jnp.asarray(d), valid=jnp.ones((n,), bool),
        )

    db = keyframe_db.init_db(LC, ORB)
    db = keyframe_db.add_keyframe(db, feats(uv_m, desc), 0, jnp.asarray(T_m))

    scene_depth = float(np.exp(np.mean(np.log(z_c))))  # geomean depth, cur cam
    passed, ninl, T_rel, twt = loop_closure.verify_candidate(
        db, feats(uv_c, desc), 0, K, LC, RS, jax.random.key(3),
        scale_mode="median_depth", scene_depth=scene_depth,
    )
    assert bool(passed) and int(ninl) > 100
    # wide baseline (|t| ~ 1.1 m at ~7 m depth): translation trusted
    assert float(twt) > 0.9, f"t_weight {float(twt):.2f}"
    T_rel = np.asarray(T_rel)
    # verify_candidate estimates X_matched = R X_current + t (current-cam
    # coords into matched-cam coords). With world-from-camera poses:
    # X_m = inv(T_m) X_w and X_w = T_c X_c => X_m = inv(T_m) T_c X_c.
    T_expected = np.linalg.inv(T_m) @ T_c
    # rotation agreement (degrees)
    dR = T_rel[:3, :3] @ T_expected[:3, :3].T
    ang_err = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang_err < 2.0, f"rotation error {ang_err:.2f} deg"
    # metric translation: direction AND magnitude (median-depth scaled)
    t_est, t_gt = T_rel[:3, 3], T_expected[:3, 3]
    cos = t_est @ t_gt / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
    assert cos > 0.98, f"translation direction cos {cos:.3f}"
    ratio = np.linalg.norm(t_est) / np.linalg.norm(t_gt)
    assert 0.8 < ratio < 1.25, f"translation scale ratio {ratio:.3f}"


def test_zero_baseline_loop_is_rotation_only():
    """A revisit at (almost) the same position — the common case on an
    exactly-retraced path — gives the essential matrix no baseline: the
    verified rotation is excellent but the unit translation is noise.
    The edge must come back with t_weight ~ 0 so the pose graph uses it
    rotation-only (at 10x weight a 1 m phantom translation otherwise
    CORRUPTS the trajectory — measured on the rotloop benchmark)."""
    from aria_slam_tpu.core import lie

    rng = np.random.default_rng(9)
    n = 256
    scene_w = rng.uniform([-4, -3, 4], [4, 3, 12], size=(n, 3)).astype(np.float64)
    desc = rng.integers(0, 2, size=(n, 256)).astype(np.int8)

    T_m = np.eye(4, dtype=np.float32)
    T_c = np.eye(4, dtype=np.float32)  # pure 10-deg yaw, ~zero baseline
    T_c[:3, :3] = np.asarray(
        lie.so3_exp(jnp.asarray([0.0, np.deg2rad(10.0), 0.0], jnp.float32)))
    T_c[:3, 3] = [0.002, -0.001, 0.001]

    def project(T_wc):
        Tinv = np.linalg.inv(T_wc)
        Xc = scene_w @ Tinv[:3, :3].T + Tinv[:3, 3]
        uv = Xc[:, :2] / Xc[:, 2:3]
        return (uv * [458.0, 457.0] + [376.0, 240.0]).astype(np.float32)

    def feats(uv, d):
        return Features(
            xy=jnp.asarray(uv), response=jnp.ones((n,), jnp.float32),
            angle=jnp.zeros((n,), jnp.float32),
            octave=jnp.zeros((n,), jnp.int32),
            size=jnp.full((n,), 31.0, jnp.float32),
            desc=jnp.asarray(d), valid=jnp.ones((n,), bool),
        )

    db = keyframe_db.init_db(LC, ORB)
    db = keyframe_db.add_keyframe(db, feats(project(T_m), desc), 0,
                                  jnp.asarray(T_m))
    passed, ninl, T_rel, twt = loop_closure.verify_candidate(
        db, feats(project(T_c), desc), 0, K, LC, RS, jax.random.key(4),
        scale_mode="median_depth", scene_depth=7.0,
    )
    assert bool(passed) and int(ninl) > 100
    T_rel = np.asarray(T_rel)
    R_expected = (np.linalg.inv(T_m) @ T_c)[:3, :3]
    dR = T_rel[:3, :3] @ R_expected.T
    ang_err = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang_err < 1.0, f"rotation error {ang_err:.2f} deg"
    assert float(twt) < 0.1, f"zero-baseline t_weight {float(twt):.2f}"


def test_loop_scale_uses_odometry_metric_when_slots_shared():
    """_loop_scale in a metric mode with odometry depths supplied must
    land the loop translation in the chain's LOCAL metric
    (depth_scale * geomean(z_odo / z_loop)), not the pair's own
    scene-depth pin — per-pair pins carry viewpoint-dependent bias on
    layered scenes. Scene at true depth ~3 with an odometry metric
    scale of 0.9: the pin (which forces median depth to 4.0) and the
    ratio path disagree, and the ratio path must win."""
    from aria_slam_tpu.ops import epipolar

    rng = np.random.default_rng(0)
    n = 128
    P1 = rng.uniform([-2, -1.5, 2.5], [2, 1.5, 3.5], (n, 3))
    t_true = np.array([0.4, 0.0, 0.0])
    P2 = P1 - t_true
    kk = np.asarray(K)
    uv1 = P1[:, :2] / P1[:, 2:3] * [kk[0, 0], kk[1, 1]] + [kk[0, 2], kk[1, 2]]
    uv2 = P2[:, :2] / P2[:, 2:3] * [kk[0, 0], kk[1, 1]] + [kk[0, 2], kk[1, 2]]
    uv1 = jnp.asarray(uv1, jnp.float32)
    uv2 = jnp.asarray(uv2, jnp.float32)
    ok = jnp.ones((n,), bool)
    delta = epipolar.estimate_relative_pose(
        uv1, uv2, ok, K, RS, jax.random.key(0))
    assert bool(delta.success)
    z1, _, good = epipolar.pair_depths(delta, uv1, uv2, ok, K)

    # odometry chain: same slots, unit depths == loop unit depths,
    # metric scale 0.9 -> the loop edge must come out at |t| = 0.9
    t_ratio = loop_closure._loop_scale(
        delta, uv1, uv2, ok, K, "median_depth", 4.0,
        depths=z1, depth_mask=good, depth_scale=jnp.asarray(0.9))
    np.testing.assert_allclose(
        float(jnp.linalg.norm(t_ratio)), 0.9, rtol=1e-3)

    # no odometry depths -> scene-depth pin (geomean depth -> 4.0);
    # compute the expectation through pin_scale itself so the check is
    # exact and mask-robust (a NaN-where+median expectation silently
    # breaks the moment any point drops out of `good`)
    t_pin = loop_closure._loop_scale(
        delta, uv1, uv2, ok, K, "median_depth", 4.0,
        depths=None, depth_mask=None, depth_scale=None)
    s_pin, s_ok = epipolar.pin_scale(z1, good, 4.0)
    assert bool(s_ok)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(t_pin)), float(s_pin), rtol=1e-5)

    # too few shared slots -> falls back to the pin
    few = good & (jnp.arange(n) < 5)
    t_few = loop_closure._loop_scale(
        delta, uv1, uv2, ok, K, "median_depth", 4.0,
        depths=z1, depth_mask=few, depth_scale=jnp.asarray(0.9))
    np.testing.assert_allclose(
        float(jnp.linalg.norm(t_few)), float(jnp.linalg.norm(t_pin)),
        rtol=1e-5)


def test_ring_buffer_eviction():
    small = LoopClosureConfig(max_keyframes=4)
    db = keyframe_db.init_db(small, ORB)
    for fid in range(6):
        f, _, _ = make_frame(fid)
        db = keyframe_db.add_keyframe(db, f, fid, jnp.eye(4))
    ids = np.asarray(db.frame_id)
    assert int(db.size) == 4
    assert set(ids.tolist()) == {2, 3, 4, 5}


def test_covisibility_temporal_and_loop_links():
    """Inserts link temporal neighbors; mark_covisible links loop pairs;
    ring eviction clears a reused slot's stale links (parity surface:
    KeyFrame.covisible_keyframes, include/core/Types.hpp:42)."""
    db = keyframe_db.init_db(LC, ORB)
    f0, scene, desc = make_frame(0)
    # single inserts: 0-1-2 chain
    for fid in range(3):
        db = keyframe_db.add_keyframe(db, f0, fid, jnp.eye(4))
    cv = np.asarray(db.covis)
    assert cv[0, 1] and cv[1, 0] and cv[1, 2] and cv[2, 1]
    assert not cv[0, 2] and not cv[0, 0]

    # batch insert continues the chain across the boundary (2 <-> 3)
    c = 4
    db = keyframe_db.add_keyframes_batch(
        db, jnp.stack([f0.desc] * c), jnp.stack([f0.xy] * c),
        jnp.stack([f0.valid] * c),
        jnp.arange(3, 3 + c, dtype=jnp.int32),
        jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (c, 1, 1)))
    cv = np.asarray(db.covis)
    assert cv[2, 3] and cv[3, 4] and cv[4, 5] and cv[5, 6]
    assert not cv[3, 5]

    # loop link is symmetric
    db = keyframe_db.mark_covisible(db, 0, 6)
    cv = np.asarray(db.covis)
    assert cv[0, 6] and cv[6, 0]
    assert np.asarray(keyframe_db.covisible_slots(db, 0))[6]

    # fill the ring so slot 0 is evicted: its old links must clear
    cap = LC.max_keyframes
    n_more = cap - 7 + 1  # advance head past slot 0
    db = keyframe_db.add_keyframes_batch(
        db, jnp.stack([f0.desc] * n_more), jnp.stack([f0.xy] * n_more),
        jnp.stack([f0.valid] * n_more),
        jnp.arange(7, 7 + n_more, dtype=jnp.int32),
        jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n_more, 1, 1)))
    cv = np.asarray(db.covis)
    assert not cv[0, 6] and not cv[6, 0]  # stale loop link cleared
    assert cv[0, cap - 1]  # slot 0 now the newest insert, linked to pred
