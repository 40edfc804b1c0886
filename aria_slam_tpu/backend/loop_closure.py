"""Loop-closure detection: prefiltered place recognition + geometric
verification, fully on device.

Parity: reference LoopClosureDetector (src/legacy/LoopClosure.cpp:13-195):
  1. descriptor-match score against stored keyframes
     (score = ratio-test survivors / query keypoints)
  2. gates: frame gap >= min_frames_between, score >= min_score
  3. geometric verification by robust epipolar fit, inliers >= min_matches
  4. relative pose from essential matrix + recoverPose

TPU design (SURVEY.md §5.7, H14 row 22): brute-force full matching
against every keyframe is N x F x F x 256 MAC — the 512-KF default
would cost ~1 TFLOP and an 8 GB distance tensor per query. Instead a
bit-frequency histogram (one skinny matmul over the whole DB) ranks
keyframes; the top `prefilter_k` candidates get the exact fused
MXU match-score, and the best-scoring survivors are RANSAC-verified
(vmapped). The reference's calibrated setting makes the essential
matrix the right verification model (it used F + a hardcoded K as a
shortcut, LoopClosure.cpp:170-176).
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp

from aria_slam_tpu.config import LoopClosureConfig, RansacConfig
from aria_slam_tpu.core import lie
from aria_slam_tpu.core.types import Features, KeyframeDB
from aria_slam_tpu.ops import epipolar
from aria_slam_tpu.ops.match import hamming_matrix, top2_min

PREFILTER_K = 8  # candidates promoted from histogram ranking to full matching


@flax.struct.dataclass
class LoopResult:
    detected: jnp.ndarray     # () bool
    slot: jnp.ndarray         # () int32 — DB slot of the matched keyframe
    frame_id: jnp.ndarray     # () int32 — frame id of the matched keyframe
    score: jnp.ndarray        # () float32 — place-recognition score
    num_inliers: jnp.ndarray  # () int32
    T_rel: jnp.ndarray        # (4, 4) — candidate-cam-from-current-cam motion
                              # (translation metric-scaled when scale_mode=
                              # "median_depth", else unit-norm monocular)
    t_weight: jnp.ndarray     # () float32 in [0, 1] — parallax-derived
                              # confidence of T_rel's translation (0 at a
                              # zero-baseline revisit: rotation perfect,
                              # monocular translation meaningless)


def _gated_candidates(db: KeyframeDB, hist_q, frame_id, cfg, k):
    """Histogram-similarity ranking with gap/occupancy gates ->
    (slots (k,), sims (k,))."""
    # L1 similarity of bit-frequency histograms (BoW-style scoring)
    l1 = jnp.sum(jnp.abs(db.hist - hist_q[None, :]), -1)  # (N,)
    sim = 1.0 - l1 / 256.0
    occupied = db.frame_id >= 0
    gap_ok = (frame_id - db.frame_id) >= cfg.min_frames_between
    sim = jnp.where(occupied & gap_ok, sim, -1.0)
    return jax.lax.top_k(sim, k)  # (sims, slots) -- note top_k order


def _full_scores(db: KeyframeDB, feats: Features, slots, ratio):
    """Exact ratio-test match score of the query against the candidate
    keyframes (gathered: (k, F, B))."""
    cand_desc = db.desc[slots]          # (k, F, B)
    cand_valid = db.desc_valid[slots]   # (k, F)
    k, f, b = cand_desc.shape
    dist = hamming_matrix(feats.desc, cand_desc.reshape(k * f, b),
                          cand_valid.reshape(k * f))
    dist = dist.reshape(feats.desc.shape[0], k, f)
    best, second, _ = top2_min(dist, axis=-1)  # (F_q, k)
    good = (
        feats.valid[:, None]
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
        & (best < (1 << 20))
    )
    num_q = jnp.maximum(jnp.sum(feats.valid.astype(jnp.float32)), 1.0)
    return jnp.sum(good.astype(jnp.float32), 0) / num_q  # (k,)


def _match_against_slot(feats: Features, db: KeyframeDB, slot, ratio,
                        loose_ratio=None):
    """Ratio-test matches of the query against one DB keyframe; returns
    aligned (xy_q, xy_t, valid[, valid_loose]) — the loose tier shares
    the SAME distance matrix (one Hamming pass, two gates), mirroring
    the chunk front-end's strict/track split."""
    cand_desc = db.desc[slot]        # (F, B)
    cand_valid = db.desc_valid[slot]
    cand_xy = db.xy[slot]
    dist = hamming_matrix(feats.desc, cand_desc, cand_valid)
    best_i, second_i, best_idx = top2_min(dist)
    best = best_i.astype(jnp.float32)
    second = second_i.astype(jnp.float32)
    finite = feats.valid & (best < float(1 << 20))
    ok = finite & (best < ratio * second)
    xy_t = cand_xy[best_idx]
    if loose_ratio is None:
        return feats.xy, xy_t, ok
    ok_loose = finite & (best < loose_ratio * second)
    return feats.xy, xy_t, ok, ok_loose


def _guided_rematch(delta, xy_q, xy_t, ok_loose, K,
                    cfg: LoopClosureConfig):
    """Pose-guided re-match: re-admit loose-ratio matches consistent
    with the verified epipolar geometry, re-polish (R, t) on the bigger
    consensus, and return the boosted delta. A candidate whose RANSAC
    failed keeps its delta unchanged (its E is arbitrary — gating loose
    matches on it would manufacture a consensus around noise, the same
    failure ADVICE r2 flagged for translation_given_rotation)."""
    p1 = epipolar.normalize_points(xy_q, K)
    p2 = epipolar.normalize_points(xy_t, K)
    focal = 0.5 * (K[0, 0] + K[1, 1])
    thresh_sq = (cfg.verify_threshold_px / focal) ** 2
    E = epipolar.lax_skew_E(delta.R, delta.t)
    s = epipolar.sampson_error(E, p1, p2)
    cand = (ok_loose & (s < thresh_sq)) | delta.inlier_mask
    R2, t2 = epipolar.polish_pose_sampson(
        delta.R, delta.t, p1, p2, cand.astype(p1.dtype), thresh_sq,
        iters=4)
    errs2 = epipolar.sampson_error(epipolar.lax_skew_E(R2, t2), p1, p2)
    mask2 = (errs2 < thresh_sq) & ok_loose
    n2 = jnp.sum(mask2.astype(jnp.int32))
    use = delta.success & (n2 >= delta.num_inliers)
    return delta.replace(
        R=jnp.where(use, R2, delta.R),
        t=jnp.where(use, t2, delta.t),
        inlier_mask=jnp.where(use, mask2, delta.inlier_mask),
        num_inliers=jnp.where(use, n2, delta.num_inliers),
    )


def detect(
    db: KeyframeDB,
    feats: Features,
    frame_id,
    K: jnp.ndarray,
    cfg: LoopClosureConfig,
    ransac: RansacConfig,
    key: jax.Array,
    scale_mode: str = "unit",
    scene_depth: float = 4.0,
    depths=None,
    depth_mask=None,
    depth_scale=None,
) -> LoopResult:
    from aria_slam_tpu.backend.keyframe_db import descriptor_histogram

    frame_id = jnp.asarray(frame_id, jnp.int32)
    hist_q = descriptor_histogram(feats.desc, feats.valid)
    _, cand_slots = _gated_candidates(db, hist_q, frame_id, cfg, PREFILTER_K)

    scores = _full_scores(db, feats, cand_slots, cfg.ratio)  # (PREFILTER_K,)
    # re-apply gates on the exact score (candidates may include gated-out
    # -1 slots when the DB is small)
    occupied = db.frame_id[cand_slots] >= 0
    gap_ok = (frame_id - db.frame_id[cand_slots]) >= cfg.min_frames_between
    gated = occupied & gap_ok & (scores >= jnp.maximum(cfg.min_score,
                                                       cfg.candidate_score_floor))
    scores = jnp.where(gated, scores, -1.0)

    top_scores, top_pos = jax.lax.top_k(scores, cfg.top_k_candidates)
    top_slots = cand_slots[top_pos]

    # geometric verification RANSAC at the loop threshold; with guided
    # re-matching on, geometry verifies at a reduced strict bar and the
    # full min_matches bar applies to the boosted count (see
    # verify_candidate)
    guided = cfg.guided_ratio > 0
    ransac_bar = (max(8, int(cfg.min_matches * cfg.guided_min_frac))
                  if guided else cfg.min_matches)
    loop_ransac = dataclasses.replace(
        ransac,
        inlier_threshold_px=cfg.verify_threshold_px,
        min_inliers=ransac_bar,
    )
    keys = jax.random.split(key, cfg.top_k_candidates)

    def verify(slot, score, k):
        if guided:
            xy_q, xy_t, ok, ok_loose = _match_against_slot(
                feats, db, slot, cfg.ratio, cfg.guided_ratio)
        else:
            xy_q, xy_t, ok = _match_against_slot(feats, db, slot, cfg.ratio)
        delta = epipolar.estimate_relative_pose(xy_q, xy_t, ok, K, loop_ransac, k)
        if guided:
            delta = _guided_rematch(delta, xy_q, xy_t, ok_loose, K, cfg)
        ok_eff = ok_loose if guided else ok
        passed = (
            (score > 0.0)
            & delta.success
            & (delta.num_inliers >= cfg.min_matches)
        )
        # scale the loop translation into the SAME metric frame as the
        # odometry (the reference keeps |t|=1, LoopClosure.cpp:176-183 —
        # a flaw its own scale-free VO hides; ours is scale-normalized)
        t_use = _loop_scale(delta, xy_q, xy_t, ok_eff, K, scale_mode,
                            scene_depth, depths, depth_mask, depth_scale)
        par, _ = epipolar.mean_parallax_deg(delta, xy_q, xy_t, ok_eff, K)
        T = lie.se3_matrix(delta.R, t_use)
        return passed, delta.num_inliers, T, epipolar.parallax_t_weight(par)

    passed, inliers, Ts, twts = jax.vmap(verify)(top_slots, top_scores, keys)

    # first (highest-score) passing candidate, parity with the reference's
    # ordered early-exit loop (LoopClosure.cpp:41-66)
    any_pass = jnp.any(passed)
    first = jnp.argmax(passed)  # argmax of bool = first True
    return LoopResult(
        detected=any_pass,
        slot=jnp.where(any_pass, top_slots[first], -1),
        frame_id=jnp.where(any_pass, db.frame_id[top_slots[first]], -1),
        score=jnp.where(any_pass, top_scores[first], 0.0),
        num_inliers=jnp.where(any_pass, inliers[first], 0),
        T_rel=jnp.where(any_pass, Ts[first], jnp.eye(4, dtype=jnp.float32)),
        t_weight=jnp.where(any_pass, twts[first], 0.0),
    )


# ------------------------------------------------------- chunked offline API
def batch_candidates(db: KeyframeDB, hists, frame_ids, cfg: LoopClosureConfig):
    """Histogram prefilter for a chunk of frames at once:
    hists (C, B), frame_ids (C,) -> (sims (C, k), slots (C, k))."""
    return jax.vmap(
        lambda h, fid: _gated_candidates(db, h, fid, cfg, PREFILTER_K)
    )(hists, frame_ids)


def score_candidates(db: KeyframeDB, feats: Features, slots, cfg):
    """Exact match scores of one query frame against candidate slots."""
    return _full_scores(db, feats, slots, cfg.ratio)


def _loop_scale(delta, xy_q, xy_t, ok, K, scale_mode, scene_depth,
                depths, depth_mask, depth_scale, scale_corr=1.0):
    """Metric scale for a loop edge's translation.

    Any metric mode with depth args: ratio the loop pair's
    current-frame depths against the odometry chain's unit depths of the
    SAME keypoint slots and carry the chain's running scale — the loop
    edge lands in exactly the odometry frame's LOCAL metric. This now
    applies in "median_depth" mode too (not just "propagate"): per-pair
    median-depth pins carry scene-dependent bias that varies with
    viewpoint on layered scenes, so a loop edge pinned independently
    can be metrically inconsistent with the chain edges around its
    endpoints. On the low-res rotloop A/B the two paths tie exactly —
    genuine revisits sit at near-zero baseline, where the parallax
    t-weight already suppresses the translation — so this is a
    consistency fix, not a measured accuracy lever. Falls back to
    scene-depth pinning when too few slots are shared.
    "unit": |t| = 1 (reference parity).
    scale_corr: the odometry chain's IMU metric correction
    (fusion/vi_init) — multiplies pin-derived scales so loop edges land
    in the SAME corrected metric as the chain (depth_scale-derived
    scales already carry it)."""
    if scale_mode == "unit":
        return delta.t
    z1, _, good = epipolar.pair_depths(delta, xy_q, xy_t, ok, K)
    pin, _ = epipolar.pin_scale(z1, good, scene_depth)
    pin = pin * scale_corr
    if depths is not None:
        ratio, cnt = epipolar.geomean_ratio(depths, z1, good & depth_mask)
        # geomean-of-each-side fallback (needs NO shared slots): the
        # chain's metric scene depth at the query frame is depth_scale *
        # geomean(depths); the loop pair's unit-|t| scene depth is
        # geomean(z1); their ratio IS |t_loop| in the chain metric —
        # correct at ANY baseline (z1 ~ depth/|t| blows up as |t| -> 0,
        # so s -> 0 at a zero-baseline revisit). The old scene-depth pin
        # fallback assumed the loop baseline was "typical" and produced
        # ~1.2 m phantom translations for true 0 m revisits (r4 edge
        # audit) — only the parallax t-weight kept them from corrupting
        # the graph, and at 10x loop weight any nonzero t-weight leaked
        # the phantom into the metric (VERDICT r3 #3).
        ones = jnp.ones_like(z1)
        g_chain, c_chain = epipolar.geomean_ratio(depths, ones, depth_mask)
        g_loop, c_loop = epipolar.geomean_ratio(z1, ones, good)
        s_mm = depth_scale * g_chain / jnp.maximum(g_loop, 1e-4)
        ok_mm = (c_chain >= 20) & (c_loop >= 20)
        s = jnp.where(cnt >= 10, depth_scale * ratio,
                      jnp.where(ok_mm, s_mm, pin))
    else:
        s = pin
    return delta.t * jnp.clip(s, 0.01, 100.0)


def verify_candidate(db: KeyframeDB, feats: Features, slot, K,
                     cfg: LoopClosureConfig, ransac: RansacConfig, key,
                     scale_mode: str = "unit", scene_depth: float = 4.0,
                     depths=None, depth_mask=None, depth_scale=None,
                     scale_corr=1.0):
    """Geometric verification of one (query, DB slot) pair ->
    (passed, num_inliers, T_rel) with T_rel = T_matched_from_current.
    depths/depth_mask (F,) + depth_scale (): the query frame's odometry
    unit depths and running metric scale (see _loop_scale)."""
    guided = cfg.guided_ratio > 0
    # with guided re-matching the RANSAC verifies GEOMETRY on a reduced
    # strict-inlier bar; the full min_matches bar applies to the
    # guided-boosted count below (recall: strict 0.7-ratio matching
    # under viewpoint change often lands at 20-40 inliers for a true
    # revisit the loose tier confirms at 50+)
    ransac_bar = (max(8, int(cfg.min_matches * cfg.guided_min_frac))
                  if guided else cfg.min_matches)
    loop_ransac = dataclasses.replace(
        ransac, inlier_threshold_px=cfg.verify_threshold_px,
        min_inliers=ransac_bar,
        # a revisit CAN sit at the exact same pose (true 0 baseline) —
        # there the cheirality front gate is a coin flip on the
        # arbitrary t direction and rejected ~46% of true loops
        # (LONGRUN_r05 diag: verify 387/846 with full-consensus
        # inliers and R_err <= 0.03 deg). The rotation-only rescue is
        # self-gating and exactly matches the loop-edge model here:
        # _loop_scale puts |t| ~ 0 on such pairs and parallax_t_weight
        # already downweights their translation.
        rot_only_rescue=True,
    )
    if guided:
        xy_q, xy_t, ok, ok_loose = _match_against_slot(
            feats, db, slot, cfg.ratio, cfg.guided_ratio)
    else:
        xy_q, xy_t, ok = _match_against_slot(feats, db, slot, cfg.ratio)
    delta = epipolar.estimate_relative_pose(xy_q, xy_t, ok, K, loop_ransac, key)
    if guided:
        delta = _guided_rematch(delta, xy_q, xy_t, ok_loose, K, cfg)
    # the boosted inlier_mask lives in the loose tier (strict ⊆ loose),
    # so downstream masks must too
    ok_eff = ok_loose if guided else ok
    passed = delta.success & (delta.num_inliers >= cfg.min_matches)
    t_use = _loop_scale(delta, xy_q, xy_t, ok_eff, K, scale_mode,
                        scene_depth, depths, depth_mask, depth_scale,
                        scale_corr)
    par, _ = epipolar.mean_parallax_deg(delta, xy_q, xy_t, ok_eff, K)
    return (passed, delta.num_inliers, lie.se3_matrix(delta.R, t_use),
            epipolar.parallax_t_weight(par))
