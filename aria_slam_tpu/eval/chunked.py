"""Chunked offline SLAM evaluation: the TPU-native execution shape.

The online SlamPipeline steps one frame per program call; offline
evaluation has the whole sequence on disk, so frames run in CHUNKS
(SURVEY.md §5.7 'chunked jitted windows'): one program call extracts
C+1 frames, matches the C consecutive pairs on the MXU, runs C RANSACs,
scale-normalizes the translations and triangulates map candidates — the
host only accumulates 4x4 poses, feeds the pose graph in chunk-sized
batches and reacts to loop-closure scalars. Loop closure runs the
histogram prefilter for the whole chunk in one call against the DB
snapshot (the <= C-frame lag is harmless next to min_frames_between).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from aria_slam_tpu.config import PipelineConfig
from aria_slam_tpu.backend import keyframe_db, loop_closure, pose_graph
from aria_slam_tpu.mapping import mapper
from aria_slam_tpu.ops import epipolar, match as match_ops, orb


VERIFY_MAX = 16  # MINIMUM loop-closure candidate pairs verified per
                 # chunk (vmapped; raised from 8 — on loop-dense
                 # revisits the cap bound recall, VERDICT r2 weak #6).
                 # The effective budget scales with chunk size,
                 # max(VERIFY_MAX, chunk): a FIXED per-chunk budget is a
                 # shrinking PER-FRAME budget as chunks grow — the r4
                 # chunk sweep measured loop recall decaying 25/18/14 at
                 # chunk 16/32/64 with ATE following (TIMING_r04.json,
                 # VERDICT r4 weak #1). Per-frame verify cost stays
                 # constant: 4x the vmapped pairs at 1/4 the cadence.

# wide-baseline scale correction (config.vo_backbone_scale): per-chunk
# log-EMA gain on the median backbone/chain displacement ratio, and the
# per-chunk clamp. Gain < 1 smooths the per-chunk median's noise
# (~13 lag pairs per chunk-16); the clamp bounds a pathological chunk.
# Clamp widened r5: the low-res consecutive pin reads ~2.24x large
# (PIN_LAGS_r05.json lag1) while the lag-4 pin sits at the oracle
# floor, so the REAL correction target is ~0.40-0.45 — the old 0.5
# floor saturated exactly where the lever matters most.
VIS_SCALE_GAIN = 0.5
VIS_SCALE_CLAMP = (0.3, 3.0)
VIS_SCALE_MIN_PAIRS = 4

# multi-view landmark-depth scale pin (config.ba_scale_pin): per-chunk
# log-EMA gain toward scene_depth / geomean(BA landmark depth), the
# per-chunk target clamp, and the minimum count of well-conditioned
# landmarks (>= 3-frame tracks with >= 3 deg ray spread — see
# chunk_ba.refine) before a chunk's statistic counts.
BA_PIN_GAIN = 0.5
BA_PIN_CLAMP = (0.5, 2.0)
BA_PIN_MIN_LANDMARKS = 50.0


class ChunkedSlam:
    """Offline chunked evaluator; mirrors the SlamPipeline results
    (trajectory, map, loops) at batch throughput."""

    def __init__(self, config: PipelineConfig, chunk: int = 16, seed: int = 0,
                 timer=None):
        """timer: optional utils.profiling.StageTimer — per-stage
        breakdown of the chunk step (frontend / chunk_ba / imu_scale /
        state_update / loop_*). Host wall-clock between forcing
        fetch points: on this rig program executions serialize through
        the relay, so the fetch that forces a program attributes its
        device time (SURVEY §5.1's answer to the reference's chrono
        deltas, at sub-stage granularity)."""
        self.cfg = config
        self.chunk = chunk
        self.K = jnp.asarray(config.camera.K)
        self._key = jax.random.key(seed)
        self._timer = timer

        cfg = config
        K = self.K
        self.lag = max(1, min(cfg.mapper.pair_lag, chunk))
        lag = self.lag

        detector = None
        if cfg.enable_detection:
            from aria_slam_tpu.models.detect import make_batched_detector

            # no NMS inside the chunk program: containment filtering is
            # unaffected by duplicate boxes and the greedy NMS loop is
            # pure sequential latency (see make_batched_detector)
            detector = make_batched_detector(
                cfg.detector, weights_path=cfg.detector_weights, use_nms=False
            )

        def frontend(frames, zlast, mlast, key, gyro_R, gyro_ok):
            from aria_slam_tpu.ops.undistort import undistort_points

            # frames arrive uint8 (4x cheaper H2D than f32 on this
            # rig's relay); cast on device — exact for 0..255
            frames = frames.astype(jnp.float32)
            feats = orb.extract_batch(frames, cfg.orb)
            # undistort keypoints once; all geometry downstream is pinhole
            feats = feats.replace(xy=undistort_points(feats.xy, cfg.camera))
            prev = jax.tree_util.tree_map(lambda x: x[:-1], feats)
            cur = jax.tree_util.tree_map(lambda x: x[1:], feats)
            # one Hamming pass, two gates: strict Lowe ratio for RANSAC,
            # loose + epipolar-gated tier for feature tracks (below)
            best2, second2, bidx2 = match_ops.match_batched_raw(cur, prev)
            strict = match_ops.ratio_gate(cur.valid, best2, second2,
                                          cfg.matcher.ratio)
            from aria_slam_tpu.core.types import Matches

            kq = strict.shape[1]
            m = Matches(
                query_idx=jnp.broadcast_to(
                    jnp.arange(kq, dtype=jnp.int32)[None], strict.shape),
                train_idx=bidx2.astype(jnp.int32),
                distance=best2.astype(jnp.float32), valid=strict)
            keys = jax.random.split(key, frames.shape[0] - 1)

            # object detection ∥ ORB: an independent subgraph inside the
            # SAME program — XLA overlaps them, the dataflow analogue of
            # the reference's two CUDA streams (src/main.cpp:129-140).
            # Matches with EITHER endpoint in a dynamic-class box are
            # dropped before RANSAC. The reference checks BOTH endpoints
            # but against the CURRENT frame's boxes only
            # (src/main.cpp:164-175: isInDynamicObject(pt1) &&
            # isInDynamicObject(pt2) with one detection set); here each
            # endpoint is tested against its OWN frame's boxes — stricter
            # when the object moved between the frames, since a prev-
            # frame object keypoint no longer inside the current box
            # would pass the reference's gate.
            # dyn_all (C+1, N) is the per-FRAME mask; every consumer
            # below slices it for its own frame range.
            if detector is not None and cfg.enable_dynamic_filtering:
                from aria_slam_tpu.ops import boxes as box_ops

                # runs on all C+1 frames, so the overlap frame's
                # detections are recomputed each chunk (1/(C+1) of
                # detector cost — ~1% at the bench's chunk 96).
                # Carrying the previous chunk's last mask would need an
                # extra program input + snapshot state and an unmasked
                # first frame; accepted tradeoff.
                dets = detector(frames)
                dyn_all = jax.vmap(box_ops.points_in_dynamic_boxes)(
                    feats.xy, dets)
            else:
                dyn_all = jnp.zeros(feats.valid.shape, bool)
            dyn = dyn_all[1:]  # pair-cur frames 1..C

            focal = 0.5 * (K[0, 0] + K[1, 1])
            in_thresh_sq = (cfg.ransac.inlier_threshold_px / focal) ** 2

            def pose_one(pf, cf, mm, dyn_f, dyn_p, k, Rg, has_g):
                xy_prev = jnp.take_along_axis(pf.xy, mm.train_idx[:, None], 0)
                valid = (mm.valid & pf.valid[mm.train_idx] & ~dyn_f
                         & ~dyn_p[mm.train_idx])
                # gyro fusion: with the pair rotation known from the
                # integrated gyro (~30x better than two-view VO), the
                # translation is a LINEAR re-estimate under that exact
                # rotation — keeping (R, t) self-consistent for the
                # depth/scale/track/mapping consumers below (a gyro R
                # glued to the VO t breaks their reprojection gates)
                delta = epipolar.estimate_pose_gyro_fused(
                    xy_prev, cf.xy, valid, K, cfg.ransac, k, Rg, has_g,
                    in_thresh_sq)
                # unit-|t| depths for the scale chain: z1 at the prev
                # frame (correspondence slot = cur slot; scatter to prev
                # slots for the frame shared with the PREVIOUS pair),
                # z2 at the cur frame (carried to the NEXT pair)
                z1, z2, zgood = epipolar.pair_depths(
                    delta, xy_prev, cf.xy, valid, K)
                # pin statistic may use the t-free estimator
                # (vo_pin_estimator); chain ratios below stay on the
                # triangulated z1/z2 — scale-free, bias cancels
                pz, pgood = epipolar.pin_depths(
                    delta, xy_prev, cf.xy, valid, K,
                    cfg.vo_pin_estimator, cfg.vo_pin_sigma_px)
                pin, pin_ok = epipolar.pin_scale(pz, pgood,
                                                 cfg.vo_scene_depth)
                nf = cf.valid.shape[0]
                zp = jnp.zeros((nf,), jnp.float32).at[mm.train_idx].set(
                    jnp.where(zgood, z1, 0.0), mode="drop")
                mp = jnp.zeros((nf,), bool).at[mm.train_idx].set(
                    zgood, mode="drop")
                z2s = jnp.where(zgood, z2, 0.0)
                m2s = zgood & delta.success
                return (delta.R, delta.t, delta.success, delta.num_inliers,
                        pin, pin_ok, zp, mp, z2s, m2s,
                        delta.inlier_mask & valid)

            (R, t, ok, ninl, pins, pin_oks, ZP, MP, Z2, M2, CINL) = jax.vmap(
                pose_one)(prev, cur, m, dyn, dyn_all[:-1], keys, gyro_R,
                          gyro_ok)

            # pair-to-pair scale ratios through the shared frame:
            # prev pair's cur-frame depths vs this pair's prev-frame depths
            prev_z = jnp.concatenate([zlast[None], Z2[:-1]], 0)
            prev_m = jnp.concatenate([mlast[None], M2[:-1]], 0)
            ratios, rcounts = jax.vmap(
                lambda a, am, b, bm: epipolar.geomean_ratio(a, b, am & bm)
            )(prev_z, prev_m, ZP, MP)

            # wide-baseline pairs (i-lag, i) for triangulation: consecutive
            # 20 fps frames sit under the 1-degree parallax gate
            lprev = jax.tree_util.tree_map(lambda x: x[:-lag], feats)
            lcur = jax.tree_util.tree_map(lambda x: x[lag:], feats)
            ml = match_ops.match_batched(lcur, lprev, cfg.matcher.ratio)
            uvl_prev = jnp.take_along_axis(
                lprev.xy, ml.train_idx[..., None], 1
            )
            # dynamic filtering applies to EVERY geometry consumer, not
            # just the consecutive-pair RANSAC: lag pairs feed the
            # backbone edges and triangulation (both endpoints masked)
            lvalid = (ml.valid & jnp.take_along_axis(
                lprev.valid, ml.train_idx, 1
            ) & ~dyn_all[lag:]
              & ~jnp.take_along_axis(dyn_all[:-lag], ml.train_idx, 1))

            out = {
                "R": R, "t": t, "ok": ok, "ninl": ninl,
                "pins": pins, "pin_oks": pin_oks,
                "ratios": ratios, "rcounts": rcounts,
                "Z2": Z2, "M2": M2,
                "uvl_prev": uvl_prev, "uvl_cur": lcur.xy, "lvalid": lvalid,
                # ~dyn: dynamic-class features stay out of the keyframe
                # DB and loop verification — two frames seeing the same
                # MOVING object at different places would otherwise
                # vote a false loop geometry
                "desc": cur.desc, "xy": cur.xy,
                "dvalid": cur.valid & ~dyn,
                "hists": keyframe_db.descriptor_histogram(
                    cur.desc, cur.valid & ~dyn),  # (C, 256)
            }

            if cfg.chunk_ba.enabled:
                # chunk BA inputs: full undistorted keypoints + the
                # consecutive-pair track links. Tracks use the LOOSE
                # ratio tier gated by each pair's estimated epipolar
                # geometry — recall drives track length, and track
                # length is what gives BA leverage (the strict tier's
                # ~2.8-frame mean tracks barely beat pairwise info).
                # ~dyn: a slow-moving object's matches can PASS the
                # per-pair Sampson gate below (small apparent motion ~
                # small epipolar error) and then corrupt BA through
                # long consistent tracks — filter the track tier too
                loose = (match_ops.ratio_gate(
                    cur.valid, best2, second2, cfg.matcher.track_ratio)
                    & jnp.take_along_axis(prev.valid, bidx2, 1) & ~dyn
                    & ~jnp.take_along_axis(dyn_all[:-1], bidx2, 1))
                xyp = jnp.take_along_axis(prev.xy, bidx2[..., None], 1)
                focal = 0.5 * (K[0, 0] + K[1, 1])
                egate = (cfg.matcher.track_epipolar_px / focal) ** 2

                def pair_track_mask(Ri, ti, xy1, xy2, lo):
                    E = epipolar.lax_skew_E(Ri, ti)
                    s = epipolar.sampson_error(
                        E, epipolar.normalize_points(xy1, K),
                        epipolar.normalize_points(xy2, K))
                    return lo & (s < egate)

                track_ok = jax.vmap(pair_track_mask)(
                    R, t, xyp, cur.xy, loose)
                out["fxy"] = feats.xy          # (C+1, N, 2)
                out["fvalid"] = feats.valid    # (C+1, N)
                out["midx"] = m.train_idx      # (C, N)
                out["cinl"] = jnp.where(ok[:, None], track_ok | CINL, CINL)

            # wide-baseline backbone: RANSAC the lag pairs too. At lag L
            # the baseline/depth ratio grows ~L-fold past the noise floor
            # that makes consecutive-pair translation DIRECTIONS unusable
            # (median ~60 deg error measured at 1.7% baseline/depth);
            # these become weighted pose-graph edges alongside the chain
            # (config.PoseGraphConfig.backbone_weight) AND/OR the scale
            # correction's lag-pin source (config.vo_backbone_scale —
            # r5: usable without backbone edges, the r4 coupling made
            # the scale lever drag in the edge channel the r4 audit
            # killed).
            if ((cfg.pose_graph.backbone_weight > 0 or cfg.vo_backbone_scale)
                    and cfg.vo_scale_mode != "unit"):
                keys_l = jax.random.split(
                    jax.random.fold_in(key, 1), frames.shape[0] - lag)
                # composed gyro prior over each lag window: the lag
                # pin's whole value is low direction/rotation noise,
                # and a two-view rotation solved WITHOUT the gyro put
                # rotation error straight into the lag parallax — the
                # r5 A/B measured the ungyroed lag pin ~0.6x metric
                # end-to-end while the gyro-rotation probe ladder had
                # it at 0.90 (PIN_LAGS_r05.json lag4). D_{i->i+L} =
                # D_{i+L-1} ... D_i, same convention as the chain.
                Rg_lag = gyro_R[:frames.shape[0] - lag]
                ok_lag = gyro_ok[:frames.shape[0] - lag]
                for s_ in range(1, lag):
                    Rg_lag = jnp.einsum(
                        "nij,njk->nik",
                        gyro_R[s_:s_ + frames.shape[0] - lag], Rg_lag)
                    ok_lag = ok_lag & gyro_ok[s_:s_ + frames.shape[0]
                                              - lag]

                def pose_lag(uv1, uv2, vv, k, Rg_w, okg_w):
                    delta = epipolar.estimate_pose_gyro_fused(
                        uv1, uv2, vv, K, cfg.ransac, k, Rg_w, okg_w,
                        in_thresh_sq)
                    # same pin estimator as the consecutive-pair pin
                    # (vo_pin_estimator): mixing estimators with
                    # different multiplicative biases would make the
                    # backbone/chain pin ratio (_vis_corr) a ratio of
                    # two different quantities (ADVICE r4)
                    pz, zg = epipolar.pin_depths(
                        delta, uv1, uv2, vv, K,
                        cfg.vo_pin_estimator, cfg.vo_pin_sigma_px)
                    pin, pok = epipolar.pin_scale(pz, zg,
                                                  cfg.vo_scene_depth)
                    return delta.R, delta.t, delta.success, pin, pok

                (out["Rl"], out["tl"], out["okl"], out["pinl"],
                 out["pinokl"]) = jax.vmap(pose_lag)(
                    uvl_prev, lcur.xy, lvalid, keys_l, Rg_lag, ok_lag)
            return out

        self._frontend = jax.jit(frontend)
        if cfg.chunk_ba.enabled:
            from aria_slam_tpu.backend import chunk_ba

            # rot_scale is a traced scalar: 1.0 normally, 0.0 when the
            # whole chunk carries gyro rotation priors (orientation is
            # then ~30x better than vision — BA solves translations and
            # landmarks only). One compiled program serves both. The
            # two pin-statistic scalars come back STACKED so the
            # ba_scale_pin lever costs one host fetch per window, not
            # two (every fetch is a ~26-32 ms relay roundtrip on this
            # rig — ADVICE r4).
            def ba_fn(p, fxy, fv, mi, ci, rs):
                poses, err_b, err_a, geo_z, zcnt = chunk_ba.refine(
                    p, fxy, fv, mi, ci, K, cfg.chunk_ba, rs)
                return poses, err_b, err_a, jnp.stack([geo_z, zcnt])

            self._ba = jax.jit(ba_fn)
        # chain-edge translation weight: down-weighted only when the
        # backbone carries the better-conditioned translations
        backbone_on = (cfg.pose_graph.backbone_weight > 0
                       and cfg.vo_scale_mode != "unit")
        odom_twt = cfg.pose_graph.odom_t_weight if backbone_on else 1.0

        def state_update(graph, db, mstate, a):
            """ONE program for the whole post-chunk state commit: chain
            extension + keyframe-DB insert + map triangulation/insert.
            Each program execution costs ~38 ms through this rig's
            relay regardless of size (CLAUDE.md), so the three donated
            updates that used to be separate dispatches fuse into one —
            ~5 ms/frame off the chunk-16 full-SLAM floor. `a` is a dict
            whose key set is fixed by the enabled subsystems (static
            pytree structure -> one compile)."""
            # rwt traced: gyro-backed chunks pin chain rotations at
            # cfg.pose_graph.gyro_rot_weight, visual chunks at 1.0
            graph = pose_graph.extend_chain(
                graph, a["poses"], a["rels"], a["first_node"], odom_twt,
                a["rwt"])
            if cfg.enable_loop_closure:
                db = keyframe_db.add_keyframes_batch(
                    db, a["desc"], a["xy"], a["dvalid"], a["fids"],
                    a["poses"])
            if cfg.enable_mapping:
                mstate = mapper.add_from_matches_batched(
                    mstate, K, a["T1"], a["T2"], a["uv1"], a["uv2"],
                    a["lv"], a["frames_lag"], cfg.mapper)
            return graph, db, mstate

        self._state_update = jax.jit(state_update, donate_argnums=(0, 1, 2))
        self._add_backbone = jax.jit(
            lambda g, i, j, r, v: pose_graph.add_edges_batch(
                g, i, j, r, cfg.pose_graph.backbone_weight, v),
            donate_argnums=(0,),
        )
        self._mark_covis = jax.jit(keyframe_db.mark_covisible,
                                   donate_argnums=(0,))
        def verify_batch(db, desc, xy, dvalid, z2, m2, scales, fidx, slots,
                         key, scale_corr):
            """Vmapped geometric verification of up to VERIFY_MAX
            (chunk frame, DB slot) pairs at once (parity: the reference
            verifies top-5 candidates per frame, LoopClosure.cpp:41-66 —
            the pairs are independent, so they batch). z2/m2/scales: the
            chunk's odometry unit depths + metric scales, so loop-edge
            translations land in the odometry's metric frame."""
            from aria_slam_tpu.core.types import Features

            kq = desc.shape[1]
            keys = jax.random.split(key, fidx.shape[0])

            def one(i, slot, k):
                feats = Features(
                    xy=xy[i], response=jnp.zeros(kq), angle=jnp.zeros(kq),
                    octave=jnp.zeros(kq, jnp.int32), size=jnp.zeros(kq),
                    desc=desc[i], valid=dvalid[i],
                )
                return loop_closure.verify_candidate(
                    db, feats, slot, K, cfg.loop, cfg.ransac, k,
                    cfg.vo_scale_mode, cfg.vo_scene_depth,
                    depths=z2[i], depth_mask=m2[i], depth_scale=scales[i],
                    scale_corr=scale_corr,
                )

            return jax.vmap(one)(fidx, slots, keys)

        self._lc_verify_batch = jax.jit(verify_batch)

        def scores_chunk(db, desc, dvalid, slots):
            """Exact match scores for every (chunk frame, candidate) pair
            as ONE fused matcher call: pairs = C x PREFILTER_K, query
            descriptors repeated per candidate, candidate descriptors
            gathered from the DB. The naive (F, k*F) distance tiles cost
            ~6 GB of HBM traffic per chunk; the fused kernel never
            materializes them. Fused with the histogram prefilter into
            one program (lc_query below) — one relay dispatch, not two."""
            from aria_slam_tpu.ops.fast import use_pallas

            c, kq, bits = desc.shape
            k = slots.shape[1]
            q = jnp.repeat(desc, k, axis=0)               # (C*k, F, B)
            qv = jnp.repeat(dvalid, k, axis=0)            # (C*k, F)
            t = db.desc[slots.reshape(-1)]                # (C*k, F, B)
            tv = db.desc_valid[slots.reshape(-1)]         # (C*k, F)

            if use_pallas():
                from aria_slam_tpu.ops.pallas.match_kernel import (
                    match_top2_batched,
                )

                best, second, _ = match_top2_batched(q, t, tv)
            else:
                from aria_slam_tpu.ops.match import hamming_matrix, top2_min

                def one(qd, td, tvv):
                    return top2_min(hamming_matrix(qd, td, tvv))

                best, second, _ = jax.vmap(one)(q, t, tv)

            good = (
                qv
                & (best.astype(jnp.float32)
                   < cfg.loop.ratio * second.astype(jnp.float32))
                & (best < (1 << 20))
            )
            num_q = jnp.maximum(jnp.sum(dvalid.astype(jnp.float32), 1), 1.0)
            counts = jnp.sum(good.astype(jnp.float32), 1).reshape(c, k)
            return counts / num_q[:, None]  # (C, k)

        def lc_query(db, hists, fids, desc, dvalid):
            sims, slots = loop_closure.batch_candidates(db, hists, fids,
                                                        cfg.loop)
            return sims, slots, scores_chunk(db, desc, dvalid, slots)

        self._lc_query = jax.jit(lc_query)
        self._add_loop = jax.jit(
            lambda g, i, j, rel, twt: pose_graph.add_loop_edge(
                g, i, j, rel, cfg.pose_graph, t_weight=twt),
            donate_argnums=(0,),
        )
        self._optimize = jax.jit(lambda g: pose_graph.optimize(g, cfg.pose_graph))

        # state
        self.graph = pose_graph.init_graph(cfg.pose_graph)
        self.graph = pose_graph.set_node(self.graph, 0, jnp.eye(4))
        self.db = keyframe_db.init_db(cfg.loop, cfg.orb)
        self.map_state = mapper.init_map(cfg.mapper)
        self.T = np.eye(4, dtype=np.float32)
        self.frame_count = 0
        self.num_loops = 0
        # accepted loop edges as (matched_node, query_node) FRAME ids —
        # the raw material for precision/recall-vs-GT analysis
        # (eval/longrun.py; the reference reports only a count,
        # euroc_eval.cpp:276)
        self.loop_pairs: list = []
        # opt-in loop-closure stage diagnostics (eval/longrun.py --diag):
        # set to [] BEFORE run to collect, per chunk, the prefilter
        # candidate frame ids, exact scores, budget selection, and
        # verify verdicts — enough to attribute every missed revisit to
        # prefilter / score / budget / verify. Costs one extra D2H
        # fetch (db.frame_id, 2 KB) per chunk; None (default) is free.
        self.lc_diag: list | None = None
        self._db_head = 0  # host mirror of db.head (avoids a D2H sync)
        self.trajectory: list = []
        # scale-propagation carry: last frame's unit depths (device) +
        # the running metric scale (host scalar)
        self._zlast = jnp.zeros((cfg.orb.num_features,), jnp.float32)
        self._mlast = jnp.zeros((cfg.orb.num_features,), bool)
        self._scale = 1.0
        # IMU metric-scale correction (fusion/vi_init.ScaleEstimator,
        # created lazily on the first chunk that carries IMU data):
        # cumulative factor applied on top of the scene-depth-pinned
        # chain so the trajectory metric comes from the accelerometer,
        # not the vo_scene_depth prior
        self._scale_est = None
        self._imu_corr = 1.0
        # wide-baseline (backbone) scale correction — see config
        # .vo_backbone_scale. In median_depth mode the correction is
        # LOCAL (per pair, inside _chain_scales) and _vis_corr stays 1;
        # the global EMA remains only for the propagate-mode re-anchor
        # path. _vis_local: trailing chunk-median lag/consecutive pin
        # ratio, the fallback for pairs with no valid covering window.
        self._vis_corr = 1.0
        self._vis_local = 1.0
        # multi-view landmark-depth pin correction (config.ba_scale_pin)
        self._ba_corr = 1.0
        self._pack_fn = None  # lazy jitted concat for _fetch_out
        # VINS-style retroactive metric rebase: when the IMU correction
        # jumps (first alignment, or a later >2% EMA move), the whole
        # RECORDED state — graph node/edge translations, keyframe poses,
        # map points — is rescaled in one jitted program so the entire
        # trajectory sits in the best current metric (not just frames
        # produced after the jump). Donated: these buffers are the big
        # device state.
        self._rescale_state = jax.jit(
            lambda g, db, m, r: (
                g.replace(
                    node_pose=g.node_pose.at[:, :3, 3].mul(r),
                    edge_rel=g.edge_rel.at[:, :3, 3].mul(r)),
                db.replace(pose=db.pose.at[:, :3, 3].mul(r)),
                m.replace(points=m.points * r),
            ),
            donate_argnums=(0, 1, 2))

    def _st(self, name: str):
        """Stage-timing context (no-op without a timer)."""
        import contextlib

        return (self._timer.stage(name) if self._timer is not None
                else contextlib.nullcontext())

    # per-pair statistic arrays process_chunk reads on host — fetched
    # together in ONE D2H roundtrip (each separate np.asarray of a
    # device array is a ~26-32 ms relay roundtrip on this rig,
    # DISPATCH_FLOOR_TPU.json; reading these 12 one at a time cost
    # ~0.3 s of pure sync tax per chunk)
    _FETCH_KEYS = ("R", "t", "ok", "pins", "ratios", "rcounts",
                   "pin_oks", "pinl", "okl", "pinokl", "Rl", "tl")

    def _fetch_many(self, arrs):
        """Fetch several small device arrays in ONE D2H roundtrip via a
        jitted f32-ravel concat; dtypes are restored on host — bool
        flags are exact as 0/1 f32, ints < 2^24 are exact in f32.
        Returns writable numpy arrays in input order."""
        if self._pack_fn is None:
            self._pack_fn = jax.jit(lambda ts: jnp.concatenate(
                [a.ravel().astype(jnp.float32) for a in ts]))
        host = np.asarray(self._pack_fn(tuple(arrs)))
        outs, off = [], 0
        for a in arrs:
            n = int(np.prod(a.shape))
            outs.append(host[off:off + n].reshape(a.shape)
                        .astype(a.dtype))
            off += n
        return outs

    def _fetch_out(self, out: dict) -> None:
        """Replace `out`'s per-pair statistic device arrays with host
        numpy via one packed fetch; the fetch also forces the frontend
        program. Big consumers (desc/xy/hists/track tensors) stay on
        device untouched."""
        keys = [k for k in self._FETCH_KEYS if k in out]
        for k, h in zip(keys, self._fetch_many([out[k] for k in keys])):
            out[k] = h

    def _chain_scales(self, out, c) -> np.ndarray:
        """Per-pair metric scales. "propagate": s_k = s_{k-1} * ratio_k
        through shared features (fallback: scene-depth pin, else keep);
        "median_depth": per-pair pin; "unit": 1 (reference parity).
        The IMU metric correction (self._imu_corr) multiplies the
        pinned scales last: the chain runs in the UNCORRECTED pin
        metric (ratios are scale-free) and the accelerometer supplies
        the absolute factor."""
        mode = self.cfg.vo_scale_mode
        if mode == "unit":
            return np.ones(c, np.float32)
        corr = self._imu_corr * self._vis_corr * self._ba_corr
        pins = np.asarray(out["pins"])
        if mode == "median_depth":
            if self.cfg.vo_backbone_scale and "pinl" in out:
                # LOCAL wide-baseline correction (r5): replace each
                # consecutive pin's magnitude with the lag-window pin's,
                # allocated within the window by the consecutive pins'
                # RELATIVE sizes (their common direction-noise bias
                # cancels in pins_k / sum(pins_window)). The r5 probe
                # ladder (PIN_LAGS_r05.json) measured the gyro-fused
                # lag-4 pin at the oracle floor (low-res 0.90 vs the
                # consecutive pin's 2.24) and the instrumented chunks
                # put pinl/chord_gt at 0.77-1.04 — but the bias of the
                # consecutive pin VARIES 1-6x chunk to chunk, which is
                # why the earlier global-EMA form (one _vis_corr for
                # the whole run) overshot: a global factor cannot track
                # a per-chunk bias. Median over the <= lag windows
                # covering each pair; chunk-median fallback for edge
                # pairs; trailing value for a chunk with no valid
                # window.
                pinl = np.asarray(out["pinl"])
                okw = (np.asarray(out["okl"])
                       & np.asarray(out["pinokl"])
                       & np.isfinite(pinl))
                nlag = pinl.shape[0]
                lag = self.lag
                sums = np.array([pins[w:w + lag].sum()
                                 for w in range(nlag)], np.float32)
                okw = okw & (sums > 1e-6) & (pinl > 1e-6)
                r_w = np.where(okw, pinl / np.maximum(sums, 1e-6), 1.0)
                logr = np.log(np.clip(r_w, 1e-3, 1e3))
                if okw.any():
                    chunk_med = float(np.exp(np.median(logr[okw])))
                    self._vis_local = chunk_med  # trailing fallback
                loc = np.full(c, self._vis_local, np.float32)
                for k in range(c):
                    lo = max(0, k - lag + 1)
                    hi = min(k, nlag - 1)
                    cover = np.arange(lo, hi + 1)
                    cover = cover[okw[cover]] if len(cover) else cover
                    if len(cover):
                        loc[k] = np.exp(np.median(logr[cover]))
                pins = pins * loc
            return np.clip(pins * corr, 1e-4, 1e4)
        ratios = np.asarray(out["ratios"])
        rcounts = np.asarray(out["rcounts"])
        pin_oks = np.asarray(out["pin_oks"])
        ok = np.asarray(out["ok"])
        scales = np.ones(c, np.float32)
        s = self._scale
        for i in range(c):
            if ok[i]:
                if rcounts[i] >= 10:
                    s = s * float(ratios[i])
                elif pin_oks[i]:
                    s = float(pins[i])  # chain broken: re-anchor
            scales[i] = np.clip(s * corr, 0.01, 100.0)
        self._scale = float(np.clip(s, 0.01, 100.0))
        return scales

    def process_chunk(self, frames: np.ndarray, timestamps,
                      gyro_R=None, gyro_ok=None, imu_window=None) -> None:
        """frames: (C+1, H, W) — the first frame must be the previous
        chunk's last frame (overlap of 1), except for the first call
        where it is simply the first frame of the sequence.

        gyro_R/gyro_ok: optional (C, 3, 3)/(C,) per-pair rotation priors
        from fusion.gyro_prior — when a pair's prior is valid it
        REPLACES the two-view rotation in the chain (the gyro is ~10x
        more accurate over one frame interval) and rescues failed pairs
        rotation-only.

        imu_window: optional (imu_ts, imu_accel, imu_gyro) raw IMU
        stream (full-sequence arrays are fine; windows are sliced by
        timestamp) — feeds the accelerometer metric-scale estimator
        (fusion/vi_init.ScaleEstimator) when cfg.imu_metric_scale."""
        cfg = self.cfg
        self._key, k1, k2 = jax.random.split(self._key, 3)
        fr = jnp.asarray(frames)  # native dtype (uint8 from the EuRoC
        # reader) — the frontend casts on device; see io/euroc.load_image
        c_pairs = frames.shape[0] - 1
        use_gyro = (cfg.gyro_chain_rotation and gyro_R is not None
                    and gyro_ok is not None)
        if not use_gyro:
            gyro_R = np.tile(np.eye(3, dtype=np.float32), (c_pairs, 1, 1))
            gyro_ok = np.zeros((c_pairs,), bool)
        with self._st("frontend"):
            out = self._frontend(fr, self._zlast, self._mlast, k1,
                                 jnp.asarray(gyro_R, jnp.float32),
                                 jnp.asarray(gyro_ok))
            self._fetch_out(out)  # ONE roundtrip: forces the frontend
            # program and lands every per-pair statistic the host chain
            # below reads (R/t/ok + scale-chain + backbone arrays)
            R = np.asarray(out["R"])
            t = np.asarray(out["t"])
            ok = np.asarray(out["ok"])
        self._zlast = out["Z2"][-1]  # stays on device for the next chunk
        self._mlast = out["M2"][-1]

        c = len(R)
        first_frame = self.frame_count == 0
        if first_frame:
            self.trajectory.append((timestamps[0], self.T.copy()))
            self.frame_count = 1

        # ---- metric scale per pair (host chain over device statistics).
        # corr_before: the TOTAL correction these scales were built with
        # (IMU x wide-baseline x BA pin) — every correction update below
        # (BA pin, IMU alignment, backbone factor) lands retroactively
        # via the rebase at the end of this method, and the loop verify
        # keys its metric off this value.
        scales = self._chain_scales(out, c)
        corr_before = self._imu_corr * self._vis_corr * self._ba_corr

        # ---- accumulate world poses on host (4x4 chain, trivial).
        # Edge measurements come from the MEASURED deltas, not from pose
        # differences: after a loop closure rebases self.T the chained
        # poses jump, and a pose-difference rel would leak that jump into
        # a fake weight-1 odometry measurement.
        poses = []
        rels = []
        T = self.T
        T_start = T.copy()  # overlap-frame pose: the chunk BA gauge
        for i in range(c):
            # when the pair carried a gyro prior, R[i]/t[i] are already
            # the fused (gyro R + linear t) estimate from the frontend;
            # a pair that failed even then still gets the gyro rotation
            # as a rotation-only rescue
            has_g = use_gyro and bool(gyro_ok[i])
            if ok[i] or has_g:
                T_cur_prev = np.eye(4, dtype=np.float32)
                T_cur_prev[:3, :3] = R[i] if ok[i] else gyro_R[i]
                if ok[i]:
                    T_cur_prev[:3, 3] = t[i] * scales[i]
                rel = np.linalg.inv(T_cur_prev).astype(np.float32)
            else:
                rel = np.eye(4, dtype=np.float32)
            T = T @ rel
            poses.append(T.copy())
            rels.append(rel)
        self.T = T
        poses_np = np.stack(poses)
        rels = np.stack(rels)

        # ---- chunk-local multiview BA: refine the chained poses against
        # feature tracks (backend/chunk_ba.py). The chunk-start pose is
        # the gauge, so the refinement is internal to the chunk and the
        # rebase-leak argument above still holds; the refined relative
        # motions REPLACE the two-view rels as the edge measurements
        # (they reconcile all overlapping pairs instead of one).
        if cfg.chunk_ba.enabled and "fxy" in out:
            ba_cm = self._st("chunk_ba")
            ba_cm.__enter__()
            poses_all = np.concatenate(
                [T_start[None], poses_np], 0).astype(np.float32)
            gyro_full = (use_gyro and bool(np.all(gyro_ok)))
            rs = jnp.asarray(0.0 if gyro_full else 1.0, jnp.float32)
            # the joint step's Schur scratch is O(frames^2 x features)
            # (the per-frame landmark scatter G): fine at window 17,
            # ~600 GB at 65 — large chunks refine in 16-frame
            # sub-windows, each gauge-fixed at its own start pose, which
            # is the same structure as chunk-16 BA
            W = c if c <= 32 else 16
            refined = poses_all.copy()
            all_finite = True
            zlog_sum = 0.0  # BA landmark-depth pin accumulators
            zcnt_sum = 0.0
            for s in range(0, c, W):
                e = min(s + W, c)
                rl = e - s
                if rl == W:
                    poses_in = jnp.asarray(refined[s:e + 1])
                    fxy_in = out["fxy"][s:e + 1]
                    fv_in = out["fvalid"][s:e + 1]
                    mi_in = out["midx"][s:e]
                    ci_in = out["cinl"][s:e]
                else:
                    # ragged tail (c > 32 and c % 16 != 0): pad the
                    # window to W by repeating the last frame with dead
                    # links (cinl False -> single-obs tracks, weight 0;
                    # fvalid False kills the pad observations outright)
                    # so the SAME compiled shape refines the tail too
                    fidx = np.concatenate(
                        [np.arange(s, e + 1), np.full(W - rl, e)])
                    pidx = np.concatenate(
                        [np.arange(s, e), np.zeros(W - rl, np.int64)])
                    pad_f = jnp.asarray(
                        np.concatenate([np.ones(rl + 1, bool),
                                        np.zeros(W - rl, bool)]))
                    pad_p = jnp.asarray(
                        np.concatenate([np.ones(rl, bool),
                                        np.zeros(W - rl, bool)]))
                    poses_in = jnp.asarray(refined[fidx])
                    fxy_in = out["fxy"][jnp.asarray(fidx)]
                    fv_in = out["fvalid"][jnp.asarray(fidx)] & pad_f[:, None]
                    mi_in = out["midx"][jnp.asarray(pidx)]
                    ci_in = out["cinl"][jnp.asarray(pidx)] & pad_p[:, None]
                end_before = refined[e].copy()
                r_win, err_b, err_a, pin_stat = self._ba(
                    poses_in, fxy_in, fv_in, mi_in, ci_in, rs)
                r_win = np.asarray(r_win)[:rl + 1]
                if not np.all(np.isfinite(r_win)):
                    all_finite = False
                    break
                # fetch the pin statistic ONLY when the lever is on:
                # each host fetch is a full relay roundtrip (~26 ms on
                # chip, DISPATCH_FLOOR_TPU.json) and would tax every BA
                # window of every run otherwise. One fetch: the two
                # scalars arrive stacked (see ba_fn above).
                if cfg.ba_scale_pin and cfg.vo_scale_mode != "unit":
                    gz, zc = (float(x) for x in np.asarray(pin_stat))
                    if np.isfinite(gz) and gz > 0 and zc > 0:
                        zlog_sum += np.log(gz) * zc
                        zcnt_sum += zc
                # chain the window's end-pose correction into all later
                # poses so the next window starts from the refined chain
                refined[s:e + 1] = r_win
                if e < c:
                    refined[e + 1:] = (
                        r_win[-1] @ np.linalg.inv(end_before)
                    ) @ refined[e + 1:]
            if all_finite:
                poses_np = refined[1:]
                rels = np.einsum(
                    "nij,njk->nik", np.linalg.inv(refined[:-1]), refined[1:]
                ).astype(np.float32)
                self.T = poses_np[-1].copy()
                # multi-view landmark-depth pin (config.ba_scale_pin):
                # the BA landmark geomean depth, measured in the chain's
                # CURRENT metric, divided by corr_before gives the raw
                # pin-metric statistic — a correction-invariant constant
                # whose target correction is scene_depth / that geomean
                # (EMA toward it; see BA_PIN_* above). Still a prior pin
                # (assumes the typical landmark depth == vo_scene_depth)
                # but conditioned by up-to-chunk-length baselines instead
                # of the biased ~2% two-view ones.
                if (cfg.ba_scale_pin and cfg.vo_scale_mode != "unit"
                        and zcnt_sum >= BA_PIN_MIN_LANDMARKS):
                    geo_raw = np.exp(zlog_sum / zcnt_sum) / corr_before
                    target = float(np.clip(
                        cfg.vo_scene_depth / max(geo_raw, 1e-6),
                        *BA_PIN_CLAMP))
                    self._ba_corr = float(np.exp(
                        (1.0 - BA_PIN_GAIN) * np.log(self._ba_corr)
                        + BA_PIN_GAIN * np.log(target)))
            ba_cm.__exit__(None, None, None)
        self._chunk_scales = scales  # for the loop-verify call below

        # ---- IMU metric scale: feed the estimator the chunk's final
        # poses; the updated correction applies from the NEXT chunk on
        # (the estimator's tag bookkeeping keeps the window consistent),
        # plus a retroactive rebase of the recorded state at the end of
        # this method when the correction moved by > 2% (corr_before,
        # captured above, is the metric these poses carry).
        if (cfg.imu_metric_scale and imu_window is not None
                and cfg.vo_scale_mode != "unit"):
            with self._st("imu_scale"):
                if self._scale_est is None:
                    from aria_slam_tpu.fusion.vi_init import ScaleEstimator

                    self._scale_est = ScaleEstimator(
                        R_cam_imu=np.asarray(cfg.imu_cam_rotation,
                                             np.float64))
                    # seed the window with the chunk-start pose
                    self._scale_est.update(
                        np.asarray(timestamps[:1], np.float64),
                        T_start[None], *imu_window)
                self._imu_corr = self._scale_est.update(
                    np.asarray(timestamps[1:], np.float64), poses_np,
                    *imu_window)

        # ---- fused post-chunk state commit: chain extension +
        # keyframe-DB insert + map triangulation in ONE donated program
        # (each dispatch costs ~38 ms through the relay; this was 3).
        # The loop-closure query is DISPATCHED first so it reads the
        # pre-insert DB: at capacity the insert evicts the c oldest
        # keyframes — precisely the likeliest revisit targets — and the
        # donation dependency guarantees the query's read completes
        # before the insert clobbers the buffer. (For candidates the
        # gap gate would exclude this chunk's own rows either way.)
        first_node = self.frame_count
        chain_rwt = (cfg.pose_graph.gyro_rot_weight
                     if use_gyro and bool(np.all(gyro_ok)) else 1.0)
        a = {
            "poses": jnp.asarray(poses_np),
            "rels": jnp.asarray(rels),
            "first_node": first_node,
            "rwt": jnp.asarray(chain_rwt, jnp.float32),
        }
        fids = None
        lc_pending = None
        head_before = self._db_head
        if cfg.enable_loop_closure:
            # global frame index of each 'cur' frame; node id == frame
            # id in the chunked graph (frame 0 is node 0)
            fids = jnp.asarray(self.frame_count + np.arange(c), jnp.int32)
            with self._st("loop_query"):  # dispatch-only (forced below)
                lc_pending = self._lc_query(self.db, out["hists"], fids,
                                            out["desc"], out["dvalid"])
            a.update(desc=out["desc"], xy=out["xy"], dvalid=out["dvalid"],
                     fids=fids)
        if cfg.enable_mapping:
            # mapping over lag pairs (i-lag, i): camera-from-world ends.
            # poses_np is the BA-REFINED chain (review r4: the old code
            # built these from the pre-BA `poses` list, triangulating
            # every map point from cameras displaced by the full BA
            # correction relative to the exported trajectory)
            lag = self.lag
            all_poses = np.concatenate([T_start[None], poses_np], 0)
            a.update(
                T1=jnp.asarray(
                    np.linalg.inv(all_poses[: c + 1 - lag])),
                T2=jnp.asarray(np.linalg.inv(all_poses[lag:])),
                uv1=out["uvl_prev"], uv2=out["uvl_cur"], lv=out["lvalid"],
                frames_lag=fr[lag:])
        with self._st("state_update"):  # dispatch-only (forced later)
            self.graph, self.db, self.map_state = self._state_update(
                self.graph, self.db, self.map_state, a)
        if cfg.enable_loop_closure:
            self._db_head = ((head_before + c)
                             % int(self.cfg.loop.max_keyframes))

        # ---- wide-baseline backbone edges (node i-lag -> node i)
        if "Rl" in out:
            Rl = np.asarray(out["Rl"])
            tl = np.asarray(out["tl"])
            pinl = np.asarray(out["pinl"])
            okl = np.asarray(out["okl"])
            nlag = Rl.shape[0]  # == c + 1 - lag
            pins_c = np.asarray(out["pins"])[:nlag]
            # chain displacement over each lag window: |t| of the
            # relative pose IS the camera-center distance, so this is
            # directly comparable with the backbone's own |t|
            pos_all = np.concatenate(
                [T_start[None, :3, 3], poses_np[:, :3, 3]], 0)
            d_chain = np.linalg.norm(
                pos_all[self.lag:] - pos_all[:-self.lag], axis=1)
            # the lag pair's own metric: its depth pin carried into the
            # chain's current correction (scales[k]/pins[k] == the
            # running corr factor at pair k)
            m_pin = pinl * scales[:nlag] / np.maximum(pins_c, 1e-6)
            pin_ok = okl & np.asarray(out["pinokl"])
            if cfg.vo_scale_mode == "propagate":
                # propagate mode re-anchors on pins: the pin relation
                # needs a valid pin at the pair's first frame
                pin_ok = pin_ok & np.asarray(out["pin_oks"])[:nlag]
            if cfg.backbone_t_source == "chain":
                # magnitude from the chain, DIRECTION from the wide-
                # baseline RANSAC: the backbone edge then corrects
                # direction/shape drift without fighting the chain's
                # metric (r4 edge audit: chain +21% vs backbone -27% on
                # the low-res rotloop — the LM resolved that 48% metric
                # fight by twisting the trajectory, rot RPE 0.17 ->
                # 2.65 deg through the final optimize)
                tscale = d_chain
                bvalid = okl & (d_chain > 1e-6)
            else:  # "pin": r3 behavior
                tscale = m_pin
                bvalid = pin_ok
            # wide-baseline scale correction (config.vo_backbone_scale):
            # EMA the chain's metric toward the lag-pair pin metric.
            # Both m_pin and the denominator carry the running
            # correction, so their ratio measures the RAW pin
            # discrepancy pinl/pins — a correction-invariant constant
            # that IS the absolute target for _vis_corr (EMA toward it;
            # a cumulative multiply would diverge since the measured
            # ratio never shrinks as the correction applies).
            # Denominator = ARC length (sum of consecutive-pair scales
            # over the window), NOT the chord |c_i - c_{i-lag}| of the
            # BA-refined poses: intra-chunk BA position jitter adds to
            # the chord in quadrature and acted as fake baseline — the
            # r5 low-res A/B overshot 1.5x through the chord (umeyama
            # 0.58 -> 1.65) exactly as the r4 BA-midpoint probes did.
            # Chord-vs-arc curvature bias over a 0.4 s window is small
            # and the median eats the 1-2 sweep-reversal windows per
            # chunk.
            if (cfg.vo_backbone_scale
                    and cfg.vo_scale_mode not in ("unit", "median_depth")):
                # propagate mode only: median_depth applies the lag-pin
                # correction LOCALLY inside _chain_scales (a global EMA
                # cannot track the consecutive pin's 1-6x per-chunk
                # bias swing — the r5 A/Bs overshot through both chord
                # and arc denominators before the local form landed)
                d_arc = np.array([
                    scales[w:w + self.lag].sum() for w in range(nlag)
                ], np.float32)
                okv = pin_ok & np.isfinite(m_pin) & (d_arc > 1e-3)
                if int(okv.sum()) >= VIS_SCALE_MIN_PAIRS:
                    r = float(np.clip(
                        np.exp(np.median(np.log(
                            m_pin[okv] / d_arc[okv]))),
                        *VIS_SCALE_CLAMP))
                    self._vis_corr = float(np.exp(
                        (1.0 - VIS_SCALE_GAIN) * np.log(self._vis_corr)
                        + VIS_SCALE_GAIN * np.log(r)))
            Tl = np.tile(np.eye(4, dtype=np.float32), (nlag, 1, 1))
            Tl[:, :3, :3] = Rl
            Tl[:, :3, 3] = tl * tscale[:, None]
            i_idx = first_node - 1 + np.arange(nlag, dtype=np.int32)
            j_idx = i_idx + self.lag
            # same convention as the chain: edge (i, j) measures
            # T_i^-1 T_j = inv(T_{late<-early}). Invalid rows can hold
            # zero rotations / non-finite scales (e.g. every lag-pair
            # feature filtered out) — gate them into bvalid and invert
            # in closed rigid form, which never raises on garbage rows
            # (degrade-don't-crash, SURVEY §5.3).
            bvalid = bvalid & np.isfinite(Tl).all(axis=(1, 2))
            # GRAPH edges only when the edge channel is on: with
            # vo_backbone_scale alone the lag pairs feed the scale
            # correction above and nothing else (the r4 audit killed
            # weight-carrying backbone edges; adding weight-0 rows
            # would only burn edge capacity and a dispatch)
            if cfg.pose_graph.backbone_weight > 0:
                Tl[~bvalid] = np.eye(4, dtype=np.float32)
                RlT = np.transpose(Tl[:, :3, :3], (0, 2, 1))
                rels_l = np.tile(np.eye(4, dtype=np.float32),
                                 (nlag, 1, 1))
                rels_l[:, :3, :3] = RlT
                rels_l[:, :3, 3] = -np.einsum("nij,nj->ni", RlT,
                                              Tl[:, :3, 3])
                with self._st("backbone_edges"):
                    self.graph = self._add_backbone(
                        self.graph, jnp.asarray(i_idx),
                        jnp.asarray(j_idx), jnp.asarray(rels_l),
                        jnp.asarray(bvalid))

        # ---- loop closure (prefilter chunk, verify best candidates).
        # Histogram prefilter + exact candidate scoring ride ONE fused
        # program (lc_query, dispatched above against the pre-insert DB)
        # — one relay dispatch, not two.
        if cfg.enable_loop_closure:
            with self._st("loop_query"):
                # one packed roundtrip forces query + state commit and
                # lands all three candidate arrays (was 3 roundtrips)
                sims, slots_h, scores = self._fetch_many(lc_pending)
            loop_found = False
            accepted_pairs: list = []  # (chunk fidx, matched DB slot)
            diag = None
            if self.lc_diag is not None:
                diag = {"base": int(self.frame_count), "c": int(c),
                        "cand_fid": None, "scores": None,
                        "sel": [], "fidx": None, "passed": None}
                self.lc_diag.append(diag)
            if (sims[:, 0] > 0).any():
                scores[sims <= 0] = -1.0
                # verify the top VERIFY_MAX scoring (frame, candidate)
                # pairs of the chunk in ONE vmapped call (parity: the
                # reference's per-frame top-5 verification loop); accept
                # at most one passing candidate per frame, then optimize
                # once with all accepted edges.
                slots_np = slots_h
                # budget scales with chunk size (VERDICT r4 weak #1) and
                # selection is per-frame-BEST-first: every frame's top
                # candidate competes before any frame's second — a flat
                # top-N over the (C, k) grid lets one revisit's k
                # candidates crowd out other frames entirely (with
                # "accept one per frame", 16 flat picks could verify as
                # few as 2 distinct frames at chunk 64)
                vm = max(VERIFY_MAX, c)
                nk = scores.shape[1]
                rank = np.argsort(-scores, axis=1)  # per-frame ranking
                sel: list = []
                for r_ in range(nk):
                    cols = rank[:, r_]
                    vals = scores[np.arange(c), cols]
                    for i in np.argsort(-vals):
                        if vals[i] >= cfg.loop.min_score:
                            sel.append(i * nk + cols[i])
                sel = sel[:vm]
                if diag is not None:
                    # candidate identity: the query ran pre-insert, so
                    # slots overwritten by THIS chunk's ring insert now
                    # hold different keyframes — flag them -2 (the same
                    # rule as the live mask below); gated-out slots
                    # carry score -1 from the sims mask above
                    cap_d = int(self.cfg.loop.max_keyframes)
                    cand = np.asarray(self.db.frame_id)[slots_np]
                    dead = (slots_np - head_before) % cap_d < c
                    diag.update(cand_fid=np.where(dead, -2, cand),
                                scores=scores.copy(), sel=list(sel))
                if sel:
                    cap_ = int(self.cfg.loop.max_keyframes)
                    fidx = np.zeros(vm, np.int32)
                    sl = np.zeros(vm, np.int32)
                    live = np.zeros(vm, bool)
                    for n_, p in enumerate(sel):
                        i, j = np.unravel_index(p, scores.shape)
                        fidx[n_] = i
                        sl[n_] = slots_np[i, j]
                        # the query ran on the pre-insert DB but verify
                        # gathers from the post-insert one: a candidate
                        # slot this chunk's insert overwrote (ring at
                        # capacity) now holds a DIFFERENT keyframe —
                        # verifying against it could admit a wrong,
                        # 10x-weighted edge. Drop those pairs.
                        live[n_] = (sl[n_] - head_before) % cap_ >= c
                    with self._st("loop_verify"):
                        passed, n_inl, T_rels, twts = self._lc_verify_batch(
                            self.db, out["desc"], out["xy"], out["dvalid"],
                            out["Z2"], out["M2"],
                            jnp.asarray(self._chunk_scales),
                            jnp.asarray(fidx), jnp.asarray(sl), k2,
                            # the corr the chunk's scales were built
                            # with — a same-chunk estimator move lands
                            # via the retro rebase below, not mid-chunk
                            jnp.asarray(corr_before, jnp.float32),
                        )
                        # one packed roundtrip for the verify verdicts,
                        # edges, weights AND the DB frame ids (was 5)
                        passed, n_inl, T_rels, twts, db_fids = (
                            self._fetch_many([passed, n_inl, T_rels,
                                              twts, self.db.frame_id]))
                        passed = passed & live
                    if diag is not None:
                        diag.update(fidx=fidx.copy(), passed=passed.copy(),
                                    n_inliers=n_inl.copy())
                    done_frames: set = set()
                    for n_ in range(vm):
                        if not passed[n_] or int(fidx[n_]) in done_frames:
                            continue
                        done_frames.add(int(fidx[n_]))
                        node = self.frame_count + int(fidx[n_])
                        matched_node = int(db_fids[int(sl[n_])])
                        # T_rel = T_{matched<-current}: exactly the edge
                        # measurement T_i^-1 T_j for (i=matched, j=node)
                        self.graph = self._add_loop(
                            self.graph, matched_node, node,
                            jnp.asarray(T_rels[n_]), jnp.asarray(twts[n_]),
                        )
                        self.num_loops += 1
                        self.loop_pairs.append((matched_node, node))
                        loop_found = True
                        accepted_pairs.append((int(fidx[n_]), int(sl[n_])))
                    if loop_found:
                        with self._st("loop_optimize"):
                            self.graph = self._optimize(self.graph)
            if loop_found:
                # rebase the running pose on the optimized graph
                node = self.frame_count + c - 1
                self.T = np.asarray(pose_graph.get_pose(self.graph, node))
                if self._scale_est is not None:
                    # the rebase re-expresses subsequent poses in a
                    # corrected world frame; mixing pre/post-rebase
                    # frames in one alignment window would be
                    # inconsistent — restart the window (the cumulative
                    # correction survives)
                    self._scale_est.reset_window()

            cap = int(self.cfg.loop.max_keyframes)
            # covisibility: link each accepted loop's matched keyframe
            # with the query frame's slot (written by the fused state
            # commit above). The skip guard is vestigial safety: slots
            # the insert overwrote can't be candidates — the gap gate
            # excludes every frame-id this chunk wrote.
            for fi, sl_ in accepted_pairs:
                if (sl_ - head_before) % cap < c:
                    continue
                self.db = self._mark_covis(
                    self.db, jnp.asarray(sl_, jnp.int32),
                    jnp.asarray((head_before + fi) % cap, jnp.int32))

        for i in range(c):
            self.trajectory.append((timestamps[i + 1], poses_np[i]))
        self.frame_count += c

        # ---- VINS-style retroactive metric rebase (see __init__): the
        # correction estimates (IMU alignment, the wide-baseline factor
        # AND the BA landmark-depth pin) apply to the WHOLE raw chain,
        # so a jump rescales everything already recorded — without
        # this, every frame before the first alignment (~50 frames of
        # warm-up window) would keep the wrong prior metric
        ratio = (self._imu_corr * self._vis_corr
                 * self._ba_corr) / corr_before
        if abs(ratio - 1.0) > 0.02:
            self._retro_rescale(ratio)

    def _retro_rescale(self, ratio: float) -> None:
        self.graph, self.db, self.map_state = self._rescale_state(
            self.graph, self.db, self.map_state,
            jnp.asarray(ratio, jnp.float32))
        self.T = self.T.copy()
        self.T[:3, 3] *= ratio
        traj = []
        for ts_, T_ in self.trajectory:
            T2 = T_.copy()
            T2[:3, 3] *= ratio
            traj.append((ts_, T2))
        self.trajectory = traj
        if self._scale_est is not None:
            self._scale_est.rebase_scale(ratio)

    def finalize(self):
        g = pose_graph.optimize(self.graph, self.cfg.pose_graph,
                                self.cfg.pose_graph.final_lm_iterations)
        self.graph = g
        n = len(self.trajectory)
        poses = np.asarray(g.node_pose[:n])
        self.trajectory = [(ts, poses[i]) for i, (ts, _) in
                           enumerate(self.trajectory)]

    def get_map(self):
        return mapper.filter_outliers(self.map_state,
                                      self.cfg.mapper.outlier_sigma)

    # device pytrees serialized by snapshot()/restore(); host scalars
    # and the scale-estimator window ride alongside in the same npz
    _SNAP_TREES = ("graph", "db", "map_state")

    def snapshot(self, path: str) -> None:
        """Serialize the evaluator's FULL state for resumable offline
        evaluation (SURVEY §5.4 'resumable evaluation'; the online
        FrameState path is utils/snapshot.py). One npz: device pytrees
        (pose graph, keyframe DB, map), the scale carry, host scalars,
        the trajectory so far, and the IMU scale-estimator window."""
        import dataclasses as _dc

        arrays = {}
        for name in self._SNAP_TREES:
            obj = getattr(self, name)
            # keyed by FIELD NAME, not leaf position: adding a field to
            # a state dataclass (r4: KeyframeDB.covis) must not
            # invalidate every earlier snapshot (review r4 — the old
            # positional db_{i} keys made restore() KeyError on any
            # pre-covis file)
            for f in _dc.fields(obj):
                arrays[f"{name}.{f.name}"] = np.asarray(getattr(obj, f.name))
        arrays["zlast"] = np.asarray(self._zlast)
        arrays["mlast"] = np.asarray(self._mlast)
        arrays["rng"] = np.asarray(jax.random.key_data(self._key))
        arrays["T"] = self.T
        arrays["counters"] = np.array(
            [self.frame_count, self.num_loops, self._db_head], np.int64)
        arrays["scales"] = np.array(
            [self._scale, self._imu_corr, self._vis_corr, self._ba_corr,
             self._vis_local],
            np.float64)
        arrays["traj_ts"] = np.array(
            [t for t, _ in self.trajectory], np.float64)
        arrays["traj_T"] = (np.stack([T for _, T in self.trajectory])
                            if self.trajectory
                            else np.zeros((0, 4, 4), np.float32))
        if self._scale_est is not None:
            est = self._scale_est
            arrays["est_state"] = np.array(
                [est._corr, float(est._n_good),
                 1.0 if est._last_p is not None else 0.0], np.float64)
            arrays["est_last_p"] = (est._last_p if est._last_p is not None
                                    else np.zeros(3))
            arrays["est_ts"] = np.asarray(est._ts, np.float64)
            arrays["est_inc"] = (np.stack(est._inc) if est._inc
                                 else np.zeros((0, 3)))
            arrays["est_tag"] = np.asarray(est._tag, np.float64)
            arrays["est_rwb"] = (np.stack(est._Rwb) if est._Rwb
                                 else np.zeros((0, 3, 3)))
            # the consensus history gates when a correction COMMITS; a
            # restore without it re-forms consensus from scratch and can
            # commit on a single marginal solve
            arrays["est_hist"] = (np.asarray(est._hist, np.float64)
                                  if est._hist else np.zeros((0, 2)))
        np.savez_compressed(path, **arrays)

    def restore(self, path: str) -> None:
        """Restore a snapshot() into this evaluator (same config —
        shapes must match; mismatches fail loudly on reshape)."""
        import dataclasses as _dc

        data = np.load(path)
        for name in self._SNAP_TREES:
            tmpl = getattr(self, name)
            fields = _dc.fields(tmpl)
            if f"{name}.{fields[0].name}" in data:
                # name-keyed format: fields absent from the file keep
                # their freshly-initialized value (e.g. covis == no
                # recorded covisibility in a pre-r4 snapshot)
                upd = {f.name: jnp.asarray(data[f"{name}.{f.name}"])
                       for f in fields if f"{name}.{f.name}" in data}
                setattr(self, name, tmpl.replace(**upd))
            else:
                # legacy positional format (pre name-keying): loadable
                # only while the leaf count still matches
                leaves, tdef = jax.tree_util.tree_flatten(tmpl)
                try:
                    new = [jnp.asarray(data[f"{name}_{i}"])
                           for i in range(len(leaves))]
                except KeyError as e:
                    raise ValueError(
                        f"snapshot {path!r} uses the legacy positional "
                        f"layout and the {name} state has since gained "
                        f"fields — re-create the snapshot with this "
                        f"version") from e
                setattr(self, name,
                        jax.tree_util.tree_unflatten(tdef, new))
        self._zlast = jnp.asarray(data["zlast"])
        self._mlast = jnp.asarray(data["mlast"])
        self._key = jax.random.wrap_key_data(jnp.asarray(data["rng"]))
        self.T = np.asarray(data["T"])
        self.frame_count = int(data["counters"][0])
        self.num_loops = int(data["counters"][1])
        # older snapshots predate the host head mirror (covisibility)
        self._db_head = (int(data["counters"][2])
                         if data["counters"].shape[0] > 2 else 0)
        self._scale = float(data["scales"][0])
        self._imu_corr = float(data["scales"][1])
        self._vis_corr = (float(data["scales"][2])
                          if data["scales"].shape[0] > 2 else 1.0)
        self._ba_corr = (float(data["scales"][3])
                         if data["scales"].shape[0] > 3 else 1.0)
        self._vis_local = (float(data["scales"][4])
                           if data["scales"].shape[0] > 4 else 1.0)
        self.trajectory = [(float(t), T) for t, T in
                           zip(data["traj_ts"], data["traj_T"])]
        if "est_state" in data:
            from aria_slam_tpu.fusion.vi_init import ScaleEstimator

            est = ScaleEstimator(
                R_cam_imu=np.asarray(self.cfg.imu_cam_rotation,
                                     np.float64))
            est._corr = float(data["est_state"][0])
            est._n_good = int(data["est_state"][1])
            est._last_p = (np.asarray(data["est_last_p"])
                           if data["est_state"][2] > 0 else None)
            est._ts = list(np.asarray(data["est_ts"]))
            est._inc = list(np.asarray(data["est_inc"]))
            est._tag = list(np.asarray(data["est_tag"]))
            est._Rwb = list(np.asarray(data["est_rwb"]))
            if "est_hist" in data:
                est._hist = [(float(a), float(b))
                             for a, b in np.asarray(data["est_hist"])]
            self._scale_est = est

    def export_map(self, ply_path: Optional[str] = None,
                   pcd_path: Optional[str] = None) -> int:
        from aria_slam_tpu.mapping import export

        m = self.get_map()
        n = 0
        if ply_path:
            n = export.export_ply(m, ply_path)
        if pcd_path:
            n = export.export_pcd(m, pcd_path)
        return n
