"""Capacity-scale long-run benchmark -> LONGRUN_r{N}.json.

VERDICT r4 missing #3: no committed artifact had ever run past 240
frames or filled more than ~half the 512-keyframe database, while the
reference's loop-closure numbers are about a 500-KF deque
(/root/reference/src/legacy/LoopClosure.cpp:28-30, ~50 ms and ~70%
recall at 500 KF per docs/milestones/H09_LOOP_CLOSURE_AUDIT.md:42-48;
MH_01 is 3682 frames). This runs a >=1000-frame multi-revisit rotloop
(period 200 frames -> ~5 passes, so late cycles must match keyframes
several revisit generations old), OVERFILLS the ring DB (frames >
max_keyframes exercises eviction in anger), and reports:

  - loop recall/precision against ground truth (a loop edge (i, j) is
    TRUE iff the GT camera centers of frames i and j are within
    gt_dist_m; an opportunity is a frame with a >=min_frames_between-
    old GT neighbor within that radius THAT IS STILL IN THE DB — a
    revisit evicted before the camera returned is not detectable by
    any bounded-memory method, and the eviction count is reported
    separately so nothing hides)
  - ATE raw / rigid / Sim3, umeyama scale, rot RPE
  - steady ms/frame + per-stage steady/warm split at capacity
  - DB fill + eviction counts

Run (chip preferred; CPU works, hours):
  python -m aria_slam_tpu.eval.longrun [--frames 1040] [--full-res]
      [--chunk 16] [--out LONGRUN_r05.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def loop_truth(data, frames: int, pairs, min_gap: int, gt_dist_m: float,
               db_capacity: int):
    """Score accepted loop pairs and enumerate opportunities vs GT.

    Returns (precision, recall, n_true, n_opportunities, details).
    Recall counts a frame as RECALLED if ANY accepted loop edge links
    it (as the query side) to a true neighbor; opportunity frames are
    those with at least one in-DB GT neighbor min_gap+ frames older
    and within gt_dist_m.
    """
    from aria_slam_tpu.io import euroc

    pos = np.zeros((frames, 3))
    for i in range(frames):
        t = float(np.clip(data.image_ts[i], data.gt_ts[0], data.gt_ts[-1]))
        pos[i] = euroc.interpolate_gt(data, t)[0]

    # the chunked evaluator pads the FINAL chunk by repeating the last
    # image (eval/euroc_eval.py load_chunk), so a loop accepted at a
    # pad frame carries id >= frames; the pad IS the last frame's
    # image, so clamp and dedupe rather than index out of bounds
    pairs = sorted({(min(int(i), frames - 1), min(int(j), frames - 1))
                    for i, j in pairs})
    true_pairs = [
        (i, j) for i, j in pairs
        if np.linalg.norm(pos[i] - pos[j]) < gt_dist_m
    ]
    precision = len(true_pairs) / max(len(pairs), 1)

    # opportunity = query frame j with some candidate i in
    # [j - db_capacity, j - min_gap] within gt_dist_m (the ring DB
    # holds the last db_capacity keyframes — older revisits were
    # evicted and are structurally unmatchable)
    recalled = {j for _, j in true_pairs}
    opportunities = []
    for j in range(frames):
        lo = max(0, j - db_capacity)
        hi = j - min_gap
        if hi <= lo:
            continue
        d = np.linalg.norm(pos[lo:hi] - pos[j], axis=1)
        if np.any(d < gt_dist_m):
            opportunities.append(j)
    recall = (len([j for j in opportunities if j in recalled])
              / max(len(opportunities), 1))
    return precision, recall, len(true_pairs), len(opportunities), {
        "accepted": len(pairs),
        "gt_dist_m": gt_dist_m,
    }


def diag_attribution(data, frames: int, min_gap: int, gt_dist_m: float,
                     db_capacity: int, min_score: float, lc_diag):
    """Attribute each missed opportunity frame to the loop-closure
    stage that decided it (requires ChunkedSlam.lc_diag collection):

      recalled   — a true candidate was selected, verified, and passed
      verify     — a true candidate was selected but geometric verify
                   rejected every one
      budget     — a true candidate scored >= min_score but lost the
                   per-chunk selection budget
      score      — a true candidate reached the prefilter top-k but its
                   exact match score fell below min_score
      prefilter  — an in-DB true neighbor exists (by the opportunity
                   definition) but the histogram prefilter never
                   surfaced it in the top-k slots
      no_query   — the chunk produced no eligible candidates at all
    """
    from aria_slam_tpu.io import euroc

    pos = np.zeros((frames, 3))
    for i in range(frames):
        t = float(np.clip(data.image_ts[i], data.gt_ts[0], data.gt_ts[-1]))
        pos[i] = euroc.interpolate_gt(data, t)[0]

    by_chunk = {}
    for d in lc_diag:
        by_chunk[d["base"]] = d

    counts = {"recalled": 0, "verify": 0, "budget": 0, "score": 0,
              "prefilter": 0, "no_query": 0}
    best_missed_scores: list = []  # best true-cand score of missed frames
    verify_fail_inliers: list = []  # best inlier count among failed rows
    verify_fail_alternates: list = []  # qualifying true cands not tried
    for j in range(frames):
        lo, hi = max(0, j - db_capacity), j - min_gap
        if hi <= lo or not np.any(
                np.linalg.norm(pos[lo:hi] - pos[j], axis=1) < gt_dist_m):
            continue  # not an opportunity frame
        d = None
        for base, dd in by_chunk.items():
            if base <= j < base + dd["c"]:
                d = dd
                break
        if d is None or d["scores"] is None:
            counts["no_query"] += 1
            continue
        i = j - d["base"]
        cand, sc = d["cand_fid"][i], d["scores"][i]
        nk = d["scores"].shape[1]
        valid = cand >= 0
        dist = np.full(nk, np.inf)
        dist[valid] = np.linalg.norm(pos[cand[valid]] - pos[j], axis=1)
        true_m = valid & (dist < gt_dist_m) & (j - cand >= min_gap)
        if not true_m.any():
            counts["prefilter"] += 1
            continue
        if sc[true_m].max() < min_score:
            counts["score"] += 1
            best_missed_scores.append(float(sc[true_m].max()))
            continue
        flat_true = {i * nk + k for k in np.flatnonzero(
            true_m & (sc >= min_score))}
        sel_rows = [n for n, p in enumerate(d["sel"]) if p in flat_true]
        if not sel_rows:
            counts["budget"] += 1
            continue
        if d["passed"] is not None and any(
                bool(d["passed"][n]) for n in sel_rows):
            counts["recalled"] += 1
        else:
            counts["verify"] += 1
            if d.get("n_inliers") is not None:
                verify_fail_inliers.append(max(
                    int(d["n_inliers"][n]) for n in sel_rows))
            # true candidates >= min_score that never got a verify slot
            # (a deeper per-frame retry could still rescue this frame)
            verify_fail_alternates.append(len(flat_true) - len(sel_rows))
    if verify_fail_inliers:
        counts["verify_fail_best_inliers_p50"] = int(
            np.median(verify_fail_inliers))
        counts["verify_fail_best_inliers_p90"] = int(
            np.percentile(verify_fail_inliers, 90))
        counts["verify_fail_frames_with_untried_alternates"] = int(
            np.sum(np.asarray(verify_fail_alternates) > 0))
    if best_missed_scores:
        counts["score_miss_best_scores_p50"] = round(
            float(np.median(best_missed_scores)), 4)
    return counts


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=1040,
                    help=">= 2x the 512-KF DB: eviction runs in anger")
    ap.add_argument("--fps", type=float, default=10.0)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--full-res", action="store_true")
    ap.add_argument("--gt-dist", type=float, default=0.5,
                    help="GT distance under which a loop pair is true")
    ap.add_argument("--scene", default=None)
    ap.add_argument("--out", default="LONGRUN_r05.json")
    ap.add_argument("--diag", action="store_true",
                    help="collect per-chunk LC diagnostics and emit a "
                         "per-stage miss attribution (loop_recall_diag)")
    args = ap.parse_args()

    from aria_slam_tpu.eval import euroc_eval
    from aria_slam_tpu.eval.accuracy_benchmark import benchmark_config
    from aria_slam_tpu.io import euroc, synthetic_scene

    cfg = benchmark_config(args.full_res, args.frames)
    scene = args.scene or (
        f"/tmp/longrun_scene_{args.frames}"
        f"{'_full' if args.full_res else ''}")
    if not os.path.exists(os.path.join(scene, "mav0")):
        synthetic_scene.generate(
            scene, num_frames=args.frames, fps=args.fps, cam=cfg.camera,
            depth=4.0, traj="rotloop", period=20.0)
        print(f"scene generated: {scene}", flush=True)

    res = euroc_eval.run(scene, out_dir="/tmp/longrun_out", config=cfg,
                         verbose=True, chunk=args.chunk, keep_pipe=True,
                         lc_diag=args.diag)
    pipe = res.pop("_pipe")

    data = euroc.load(scene)
    cap = int(cfg.loop.max_keyframes)
    kf_filled = int(np.sum(np.asarray(pipe.db.frame_id) >= 0))
    evictions = max(0, args.frames - 1 - cap)  # ring overwrites
    precision, recall, n_true, n_opp, det = loop_truth(
        data, args.frames, pipe.loop_pairs,
        int(cfg.loop.min_frames_between), args.gt_dist, cap)

    report = {
        "frames": args.frames,
        "full_res": args.full_res,
        "chunk": args.chunk,
        "kf_capacity": cap,
        "kf_filled": kf_filled,
        "kf_evictions": evictions,
        "graph_nodes": args.frames,
        "loops_accepted": det["accepted"],
        "loops_true": n_true,
        "loop_precision": round(precision, 4),
        "loop_recall": round(recall, 4),
        "loop_opportunity_frames": n_opp,
        "gt_dist_m": det["gt_dist_m"],
        "reference_at_500kf": "~50 ms/query, ~70% recall "
                              "(H09_LOOP_CLOSURE_AUDIT.md:42-48)",
        **{k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in res.items()},
    }
    if args.diag:
        report["loop_recall_diag"] = diag_attribution(
            data, args.frames, int(cfg.loop.min_frames_between),
            args.gt_dist, cap, float(cfg.loop.min_score), pipe.lc_diag)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.startswith("stage_")}, indent=1))


if __name__ == "__main__":
    main()
