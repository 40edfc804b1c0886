"""Loop-closure detection: fused place recognition + geometric verification.

Parity: reference LoopClosureDetector (src/legacy/LoopClosure.cpp:13-195):
  1. brute-force descriptor scores against every stored keyframe
     (score = ratio-test survivors / query keypoints, floor 0.1, top-5)
  2. gates: frame gap >= min_frames_between, score >= min_score
  3. geometric verification by robust epipolar fit, inliers >= min_matches
  4. relative pose from essential matrix + recoverPose

TPU design (SURVEY.md §5.7): step 1 is ONE int8 matmul of the query
descriptors against the whole [N, F, 256] database (the H14 batch
matcher on the MXU); steps 2-4 are vmapped over the top-k candidates so
the entire detector — including k RANSAC verifications — is a single
jitted program. The reference's calibrated setting makes the essential
matrix the right verification model (it used F + hardcoded K as a
shortcut, LoopClosure.cpp:170-176).
"""

from __future__ import annotations

import dataclasses

import flax.struct
import jax
import jax.numpy as jnp

from aria_slam_tpu.config import LoopClosureConfig, RansacConfig
from aria_slam_tpu.core.types import Features, KeyframeDB
from aria_slam_tpu.ops import epipolar
from aria_slam_tpu.ops.match import hamming_matrix, match_scores_vs_database
from aria_slam_tpu.core import lie


@flax.struct.dataclass
class LoopResult:
    detected: jnp.ndarray     # () bool
    slot: jnp.ndarray         # () int32 — DB slot of the matched keyframe
    frame_id: jnp.ndarray     # () int32 — frame id of the matched keyframe
    score: jnp.ndarray        # () float32 — place-recognition score
    num_inliers: jnp.ndarray  # () int32
    T_rel: jnp.ndarray        # (4, 4) — candidate-cam-from-current-cam motion
                              # (unit-scale translation, monocular)


def _match_against_slot(feats: Features, db: KeyframeDB, slot, ratio):
    """Ratio-test matches of the query against one DB keyframe; returns
    aligned (xy_q, xy_t, valid)."""
    cand_desc = db.desc[slot]        # (F, B)
    cand_valid = db.desc_valid[slot]
    cand_xy = db.xy[slot]
    dist = hamming_matrix(feats.desc, cand_desc, cand_valid)
    from aria_slam_tpu.ops.match import top2_min

    best_i, second_i, best_idx = top2_min(dist)
    best = best_i.astype(jnp.float32)
    second = second_i.astype(jnp.float32)
    ok = feats.valid & (best < ratio * second) & (best < float(1 << 20))
    xy_t = cand_xy[best_idx]
    return feats.xy, xy_t, ok


def detect(
    db: KeyframeDB,
    feats: Features,
    frame_id,
    K: jnp.ndarray,
    cfg: LoopClosureConfig,
    ransac: RansacConfig,
    key: jax.Array,
) -> LoopResult:
    frame_id = jnp.asarray(frame_id, jnp.int32)
    scores = match_scores_vs_database(
        feats.desc, feats.valid, db.desc, db.desc_valid, cfg.ratio
    )  # (N,)

    occupied = db.frame_id >= 0
    gap_ok = (frame_id - db.frame_id) >= cfg.min_frames_between
    gated = occupied & gap_ok & (scores >= jnp.maximum(cfg.min_score, cfg.candidate_score_floor))
    cand_scores = jnp.where(gated, scores, -1.0)
    top_scores, top_slots = jax.lax.top_k(cand_scores, cfg.top_k_candidates)

    # geometric verification RANSAC at the loop threshold
    loop_ransac = dataclasses.replace(
        ransac,
        inlier_threshold_px=cfg.verify_threshold_px,
        min_inliers=cfg.min_matches,
    )
    keys = jax.random.split(key, cfg.top_k_candidates)

    def verify(slot, score, k):
        xy_q, xy_t, ok = _match_against_slot(feats, db, slot, cfg.ratio)
        delta = epipolar.estimate_relative_pose(xy_q, xy_t, ok, K, loop_ransac, k)
        passed = (
            (score > 0.0)
            & delta.success
            & (delta.num_inliers >= cfg.min_matches)
        )
        # T_rel: current-cam -> candidate-cam motion as 4x4
        T = lie.se3_matrix(delta.R, delta.t)
        return passed, delta.num_inliers, T

    passed, inliers, Ts = jax.vmap(verify)(top_slots, top_scores, keys)

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
    )
