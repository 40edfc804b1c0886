"""SlamPipeline: the orchestrator.

Parity: reference SlamPipeline (include/pipeline/SlamPipeline.hpp:16-106,
header-only there — SURVEY.md row 24) + the inline legacy loops
(src/main.cpp:122-260, src/euroc_eval.cpp:128-278): per frame —
extract ∥ detect objects, match, dynamic filtering, epipolar pose,
EKF fusion, loop detection, mapping; plus processIMU and pose/loop
callbacks.

TPU design (SURVEY.md §2.3/§5.8): everything between "image on device"
and "pose out" is ONE jitted step over a FrameState pytree carry —
ORB and the object detector are independent subgraphs inside that
program (XLA overlaps them; the CUDA-streams choreography of
src/main.cpp:100-140 becomes dataflow edges). The only per-frame
host<->device traffic is the input image (H2D) and a handful of scalars
(D2H). Loop-closure *optimization* is triggered host-side off a single
scalar and runs as its own jitted program, mirroring the reference's
on-loop optimize(10) (euroc_eval.cpp:236-239).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from aria_slam_tpu.config import PipelineConfig
from aria_slam_tpu.core import lie
from aria_slam_tpu.core.types import (
    Detections,
    EkfState,
    Features,
    KeyframeDB,
    MapState,
    PoseGraph,
    make_empty_features,
)
from aria_slam_tpu.backend import keyframe_db, loop_closure, pose_graph
from aria_slam_tpu.backend.loop_closure import LoopResult
from aria_slam_tpu.fusion import ekf
from aria_slam_tpu.mapping import mapper
from aria_slam_tpu.ops import boxes, epipolar, match as match_ops, orb


@flax.struct.dataclass
class FrameState:
    """Device-resident carry of the per-frame step."""

    frame_id: jnp.ndarray      # () int32
    prev_feats: Features
    prev_valid: jnp.ndarray    # () bool — have a previous frame
    pose: jnp.ndarray          # (4, 4) world-from-camera (VO trajectory)
    prev_ts: jnp.ndarray       # () float32
    # monocular scale-propagation chain: the previous frame's per-slot
    # unit-|t| triangulated depths + the running metric scale
    prev_depths: jnp.ndarray      # (F,) float32
    prev_depth_mask: jnp.ndarray  # (F,) bool
    vo_scale: jnp.ndarray         # () float32
    ekf_state: EkfState
    db: KeyframeDB
    map_state: MapState
    graph: PoseGraph
    key: jax.Array


@flax.struct.dataclass
class StepOutput:
    pose: jnp.ndarray          # (4, 4) world-from-camera after this frame
    fused_pos: jnp.ndarray     # (3,) EKF position
    fused_quat: jnp.ndarray    # (4,)
    num_features: jnp.ndarray  # () int32
    num_matches: jnp.ndarray   # () int32
    num_inliers: jnp.ndarray   # () int32
    num_filtered: jnp.ndarray  # () int32 — matches dropped by dynamic filter
    vo_success: jnp.ndarray    # () bool
    loop: LoopResult
    detections: Detections


def _empty_detections(cfg: PipelineConfig) -> Detections:
    d = cfg.detector.max_detections
    return Detections(
        boxes=jnp.zeros((d, 4), jnp.float32),
        scores=jnp.zeros((d,), jnp.float32),
        classes=jnp.zeros((d,), jnp.int32),
        valid=jnp.zeros((d,), bool),
    )


def init_state(cfg: PipelineConfig, key: jax.Array | None = None) -> FrameState:
    key = key if key is not None else jax.random.key(0)
    g = pose_graph.init_graph(cfg.pose_graph)
    g = pose_graph.set_node(g, 0, jnp.eye(4, dtype=jnp.float32))
    return FrameState(
        frame_id=jnp.asarray(0, jnp.int32),
        prev_feats=make_empty_features(cfg.orb.num_features, cfg.orb.descriptor_bits),
        prev_valid=jnp.asarray(False),
        pose=jnp.eye(4, dtype=jnp.float32),
        prev_ts=jnp.asarray(0.0, jnp.float32),
        prev_depths=jnp.zeros((cfg.orb.num_features,), jnp.float32),
        prev_depth_mask=jnp.zeros((cfg.orb.num_features,), bool),
        vo_scale=jnp.asarray(1.0, jnp.float32),
        ekf_state=ekf.init_state(),
        db=keyframe_db.init_db(cfg.loop, cfg.orb),
        map_state=mapper.init_map(cfg.mapper),
        graph=g,
        key=key,
    )


def make_frame_step(
    cfg: PipelineConfig,
    extractor: Optional[Callable] = None,
    matcher: Optional[Callable] = None,
    detector: Optional[Callable] = None,
):
    """Build the jitted per-frame step with injected components
    (parity: PipelineFactory constructor injection,
    include/factory/PipelineFactory.hpp:35-46)."""
    K = jnp.asarray(cfg.camera.K)
    extractor = extractor or (lambda img: orb.extract(img, cfg.orb))
    matcher = matcher or (
        lambda q, t: match_ops.match(q, t, cfg.matcher.ratio, cfg.matcher.cross_check)
    )

    def step(state: FrameState, image: jnp.ndarray, imu_t, imu_acc, imu_gyr,
             imu_valid, ts: jnp.ndarray):
        # image may arrive uint8 (4x cheaper H2D on this rig's relay);
        # cast on device — exact for 0..255
        image = image.astype(jnp.float32)
        key, k_ransac, k_loop = jax.random.split(state.key, 3)

        # ---- perception: ORB ∥ object detection (independent subgraphs)
        feats = extractor(image)
        # undistort keypoints once; all geometry downstream is pinhole
        from aria_slam_tpu.ops.undistort import undistort_points

        feats = feats.replace(xy=undistort_points(feats.xy, cfg.camera))
        if cfg.enable_detection and detector is not None:
            dets = detector(image)
        else:
            dets = _empty_detections(cfg)

        # ---- matching + dynamic filtering
        m = matcher(feats, state.prev_feats)  # query=current, train=previous
        m_valid = m.valid & state.prev_valid
        pre_filter = jnp.sum(m_valid.astype(jnp.int32))
        if cfg.enable_dynamic_filtering:
            in_dyn = boxes.points_in_dynamic_boxes(feats.xy, dets)
            m_valid = m_valid & ~in_dyn[m.query_idx]
        num_matches = jnp.sum(m_valid.astype(jnp.int32))
        num_filtered = pre_filter - num_matches

        # ---- epipolar VO (prev -> current motion), with gyro rotation
        # fusion when enabled (parity with the chunked chain,
        # eval/chunked.py — the SAME shared helper, so the online and
        # chunked paths fuse identically): integrate the frame's IMU
        # window into a rotation prior (~30x better than the two-view
        # rotation) and re-solve the translation LINEARLY under that
        # known rotation — keeping the pair self-consistent for every
        # consumer below
        xy_cur = feats.xy[m.query_idx]
        xy_prev = state.prev_feats.xy[m.train_idx]
        if cfg.gyro_chain_rotation:
            prev_t = jnp.concatenate([state.prev_ts[None], imu_t[:-1]])
            dts = jnp.clip(imu_t - prev_t, 0.0, 0.05)
            phis = imu_gyr * dts[:, None] * imu_valid[:, None].astype(
                imu_gyr.dtype)

            def compose(Rc, phi):
                return Rc @ lie.so3_exp(phi), None

            dR, _ = jax.lax.scan(compose, jnp.eye(3, dtype=jnp.float32),
                                 phis)
            has_g = (jnp.sum(imu_valid.astype(jnp.int32)) >= 2) \
                & state.prev_valid
            R_ci = jnp.asarray(cfg.imu_cam_rotation, jnp.float32)
            dR = R_ci @ dR @ R_ci.T  # body rates -> camera frame
            Rg = dR.T  # VO delta convention X_cur = R X_prev + t
            focal = 0.5 * (K[0, 0] + K[1, 1])
            thresh_sq = (cfg.ransac.inlier_threshold_px / focal) ** 2
            delta = epipolar.estimate_pose_gyro_fused(
                xy_prev, xy_cur, m_valid, K, cfg.ransac, k_ransac,
                Rg, has_g, thresh_sq)
        else:
            delta = epipolar.estimate_relative_pose(
                xy_prev, xy_cur, m_valid, K, cfg.ransac, k_ransac
            )
            has_g = jnp.asarray(False)

        vo_ok = delta.success & state.prev_valid

        # delta: X_cur = R X_prev + t (cam_cur-from-cam_prev), |t| = 1.
        # Metric scale: "propagate" chains the scale through features
        # shared with the previous pair (metric depth of a shared point
        # is pair-invariant), anchored/fallback by scene-depth pinning;
        # "median_depth" pins every frame (assumes constant scene depth);
        # "unit" is reference parity.
        nf = feats.valid.shape[0]
        if cfg.vo_scale_mode in ("median_depth", "propagate"):
            z1, z2, zgood = epipolar.pair_depths(delta, xy_prev, xy_cur,
                                                 m_valid, K)
            # pin statistic honors vo_pin_estimator; the propagate
            # ratio keeps the triangulated z1 (scale-free, bias cancels)
            pz, pgood = epipolar.pin_depths(
                delta, xy_prev, xy_cur, m_valid, K,
                cfg.vo_pin_estimator, cfg.vo_pin_sigma_px)
            pin, _ = epipolar.pin_scale(pz, pgood, cfg.vo_scene_depth)
            if cfg.vo_scale_mode == "propagate":
                shared = zgood & state.prev_depth_mask[m.train_idx]
                ratio, cnt = epipolar.geomean_ratio(
                    state.prev_depths[m.train_idx], z1, shared
                )
                scale = jnp.where(cnt >= 10, state.vo_scale * ratio, pin)
            else:
                scale = pin
            scale = jnp.clip(scale, 0.01, 100.0)
            t_use = delta.t * scale
            new_depths = jnp.zeros((nf,), jnp.float32).at[m.query_idx].set(
                jnp.where(zgood, z2, 0.0), mode="drop")
            new_dmask = (jnp.zeros((nf,), bool).at[m.query_idx].set(
                zgood, mode="drop") & vo_ok)
            new_scale = jnp.where(vo_ok, scale, state.vo_scale)
        else:
            t_use = delta.t
            new_depths = jnp.zeros((nf,), jnp.float32)
            new_dmask = jnp.zeros((nf,), bool)
            new_scale = state.vo_scale
        T_cur_prev = lie.se3_matrix(delta.R, t_use)
        pose_new = state.pose @ lie.se3_inverse(T_cur_prev)
        pose_new = jnp.where(vo_ok, pose_new, state.pose)

        # ---- EKF fusion (VO measurement in world frame)
        if cfg.enable_fusion:
            ekf_new = ekf.frame_step(
                state.ekf_state, imu_t, imu_acc, imu_gyr, imu_valid,
                pose_new[:3, :3], pose_new[:3, 3],
                vo_ok | (~state.ekf_state.initialized), ts, cfg.ekf,
            )
        else:
            ekf_new = state.ekf_state

        # ---- pose graph: node + odometry edge
        node_id = state.frame_id + 1
        graph = pose_graph.set_node(state.graph, node_id, pose_new)
        rel = lie.se3_inverse(state.pose) @ pose_new
        graph_with_edge = pose_graph.add_odometry_edge(
            graph, node_id - 1, node_id, rel, cfg.pose_graph,
            r_weight=jnp.where(has_g, cfg.pose_graph.gyro_rot_weight, 1.0),
        )
        graph = jax.tree_util.tree_map(
            lambda a, b: jnp.where(vo_ok, a, b), graph_with_edge, graph
        )

        # ---- mapping (triangulate against previous frame)
        if cfg.enable_mapping:
            T_prev_cw = lie.se3_inverse(state.pose)   # camera-from-world
            T_cur_cw = lie.se3_inverse(pose_new)
            map_new = mapper.add_from_matches(
                state.map_state, K, T_prev_cw, T_cur_cw,
                xy_prev, xy_cur, m_valid & delta.inlier_mask & vo_ok, image,
                cfg.mapper,
            )
        else:
            map_new = state.map_state

        # ---- loop closure: query BEFORE inserting the current frame
        if cfg.enable_loop_closure:
            loop = loop_closure.detect(
                state.db, feats, state.frame_id, K, cfg.loop, cfg.ransac, k_loop,
                cfg.vo_scale_mode, cfg.vo_scene_depth,
                depths=new_depths, depth_mask=new_dmask, depth_scale=new_scale,
            )
            db_new = keyframe_db.add_keyframe(state.db, feats, state.frame_id, pose_new)
            # accepted loop pairs observe the same scene: link them in
            # the covisibility graph (the current frame just landed at
            # the pre-insert head slot). No-op self-link when no loop.
            cur_slot = state.db.head
            # at capacity the insert just evicted the OLDEST keyframe —
            # which can be exactly loop.slot (oldest passes the gap gate
            # easiest). Linking then would write a covis[cur, cur]
            # self-edge against a keyframe that no longer exists, so
            # gate the link on the matched slot surviving the insert.
            link = loop.detected & (loop.slot != cur_slot)
            a = jnp.where(link, loop.slot, cur_slot)
            db_new = db_new.replace(
                covis=db_new.covis.at[a, cur_slot].max(link)
                                  .at[cur_slot, a].max(link))
        else:
            loop = LoopResult(
                detected=jnp.asarray(False),
                slot=jnp.asarray(-1, jnp.int32),
                frame_id=jnp.asarray(-1, jnp.int32),
                score=jnp.asarray(0.0, jnp.float32),
                num_inliers=jnp.asarray(0, jnp.int32),
                T_rel=jnp.eye(4, dtype=jnp.float32),
                t_weight=jnp.asarray(0.0, jnp.float32),
            )
            db_new = state.db

        new_state = FrameState(
            frame_id=node_id,
            prev_feats=feats,
            prev_valid=jnp.asarray(True),
            pose=pose_new,
            prev_ts=ts,
            prev_depths=new_depths,
            prev_depth_mask=new_dmask,
            vo_scale=new_scale,
            ekf_state=ekf_new,
            db=db_new,
            map_state=map_new,
            graph=graph,
            key=key,
        )
        out = StepOutput(
            pose=pose_new,
            fused_pos=ekf_new.pos,
            fused_quat=ekf_new.quat,
            num_features=feats.num_valid(),
            num_matches=num_matches,
            num_inliers=delta.num_inliers,
            num_filtered=num_filtered,
            vo_success=vo_ok,
            loop=loop,
            detections=dets,
        )
        return new_state, out

    return step


class SlamPipeline:
    """Host-side orchestrator around the jitted frame step.

    Parity API: SlamPipeline::processFrame / processIMU / callbacks
    (include/pipeline/SlamPipeline.hpp:50-78). The host only buffers IMU
    between frames, feeds the device, and reacts to the loop-closure
    scalar; heavy math never leaves the chip.
    """

    def __init__(self, config: PipelineConfig | None = None, *,
                 extractor=None, matcher=None, detector=None, seed: int = 0,
                 lazy_depth: int = 0):
        self.config = config or PipelineConfig()
        # donate the carry: the FrameState holds the keyframe DB
        # (~260 MB at full size) and map buffers — without donation every
        # step would copy them for the functional .at updates
        self._step = jax.jit(
            make_frame_step(self.config, extractor, matcher, detector),
            donate_argnums=(0,),
        )
        self._optimize = jax.jit(
            lambda g: pose_graph.optimize(g, self.config.pose_graph)
        )
        self.state = init_state(self.config, jax.random.key(seed))
        self._imu_buf: list = []
        self._last_ts = 0.0
        self._t0: float | None = None
        self.on_pose: Optional[Callable] = None
        self.on_loop: Optional[Callable] = None
        self.num_loops = 0
        self.trajectory: list = []  # (ts, 4x4 pose) after each frame
        # lazy_depth > 0: PIPELINED online mode — process_frame enqueues
        # the step and returns WITHOUT forcing device results; outputs
        # are forced `lazy_depth` frames late, so consecutive step
        # programs overlap across the dispatch/relay round-trip (the
        # H13-multithreading analogue: jax async dispatch is the
        # pipeline, the pending deque is the queue). Loop closures are
        # handled at pop time — edges land on the recorded node ids and
        # the rebase adopts the LATEST node's optimized pose, so being
        # a few frames late only delays (never corrupts) the correction.
        self._lazy = int(lazy_depth)
        self._pending: list = []

    # -- parity: processIMU(ImuMeasurement) (SlamPipeline.hpp:58)
    def process_imu(self, timestamp: float, accel, gyro) -> None:
        self._imu_buf.append((timestamp, np.asarray(accel, np.float32),
                              np.asarray(gyro, np.float32)))

    def _drain_imu(self, ts: float):
        w = self.config.ekf.imu_window
        t = np.zeros(w, np.float32)
        a = np.zeros((w, 3), np.float32)
        g = np.zeros((w, 3), np.float32)
        v = np.zeros(w, bool)
        take = [s for s in self._imu_buf if s[0] <= ts]
        self._imu_buf = [s for s in self._imu_buf if s[0] > ts]
        take = take[-w:]  # newest w samples fit in the window
        for i, (tt, aa, gg) in enumerate(take):
            t[i] = self._rel(tt)
            a[i] = aa
            g[i] = gg
            v[i] = True
        return t, a, g, v

    def _rel(self, ts: float) -> float:
        """Sequence-relative seconds keep f32 timestamps accurate."""
        if self._t0 is None:
            self._t0 = ts
        return float(ts - self._t0)

    # -- parity: processFrame(data, w, h, ts) -> Pose (SlamPipeline.hpp:50)
    def process_frame(self, image: np.ndarray, timestamp: float) -> np.ndarray:
        ts = self._rel(timestamp)
        imu_t, imu_a, imu_g, imu_v = self._drain_imu(timestamp)
        img = jnp.asarray(image)  # native dtype; the step casts on device
        self.state, out = self._step(
            self.state, img, jnp.asarray(imu_t), jnp.asarray(imu_a),
            jnp.asarray(imu_g), jnp.asarray(imu_v), jnp.asarray(ts, jnp.float32),
        )
        self.last_output = out

        if self._lazy:
            # node id of this frame, tracked on host (forcing the device
            # frame_id scalar would defeat the pipelining): frames are
            # nodes 1..N in dispatch order
            node_id = len(self.trajectory) + len(self._pending) + 1
            self._pending.append((timestamp, out, node_id, self.num_loops))
            if len(self._pending) > self._lazy:
                self._pop_pending()
            return None

        if bool(out.loop.detected):
            self._handle_loop(out)

        pose = np.asarray(self.state.pose)
        self.trajectory.append((timestamp, pose))
        if self.on_pose is not None:
            self.on_pose(timestamp, pose)
        return pose

    def _pop_pending(self) -> None:
        """Force and publish the oldest deferred frame output."""
        timestamp, out, node_id, loops_at_dispatch = self._pending.pop(0)
        if bool(out.loop.detected):
            self._handle_loop(out, node_id=node_id)
        if self.num_loops > loops_at_dispatch:
            # a loop optimization landed after this frame was dispatched
            # (its own, or a later pop's): the dispatch-time out.pose
            # predates the correction — publish the node's optimized
            # graph pose instead, matching what sync mode publishes
            # (ADVICE r3: lazy mode leaked pre-optimization poses into
            # the trajectory for the query frame and up to lazy_depth-1
            # straddling frames). The fetch forces the latest step, but
            # loops are rare events — steady-state pops stay lazy.
            pose = np.asarray(pose_graph.get_pose(self.state.graph, node_id))
        else:
            pose = np.asarray(out.pose)
        self.trajectory.append((timestamp, pose))
        if self.on_pose is not None:
            self.on_pose(timestamp, pose)

    def flush(self) -> None:
        """Drain deferred outputs (pipelined mode); call before reading
        the trajectory or finalizing."""
        while self._pending:
            self._pop_pending()

    def _handle_loop(self, out: StepOutput, node_id: int | None = None) -> None:
        """Parity: on-loop addLoopEdge + optimize(10) + adopt pose
        (euroc_eval.cpp:234-239). node_id: the node the loop's query
        frame landed on (pipelined mode pops late; the live mode reads
        the current frame id)."""
        cfgpg = self.config.pose_graph
        cur = int(node_id if node_id is not None else self.state.frame_id)
        # loop.frame_id is the matched keyframe's frame index -> node id + 1
        # (node 0 is the pre-first-frame origin)
        matched_node = int(out.loop.frame_id) + 1
        T_rel = jnp.asarray(out.loop.T_rel)
        # T_rel maps current-cam points into matched-cam coords, i.e.
        # T_rel = T_{matched<-current}. With world-from-camera node poses
        # the edge (i=matched, j=current) measures T_i^-1 T_j =
        # cam_matched-from-world @ world-from-cam_current =
        # T_{matched<-current} — exactly T_rel, NOT its inverse.
        g = pose_graph.add_loop_edge(
            self.state.graph, matched_node, cur, T_rel, cfgpg,
            t_weight=jnp.asarray(out.loop.t_weight),
        )
        g = self._optimize(g)
        # rebase the RUNNING pose on the optimized graph. In pipelined
        # mode frames dispatched after this loop's query frame already
        # exist — adopt the LATEST node's optimized pose, not the
        # (stale) query node's. At this point the popped frame is in
        # neither trajectory nor _pending, so dispatched frames =
        # len(trajectory) + len(_pending) + 1 (nodes are 1-based).
        latest = (len(self.trajectory) + len(self._pending) + 1
                  if self._lazy else cur)
        new_pose = pose_graph.get_pose(g, latest)
        self.state = self.state.replace(graph=g, pose=new_pose)
        self.num_loops += 1
        if self.on_loop is not None:
            self.on_loop(int(out.loop.frame_id), cur - 1, float(out.loop.score))

    # -- final global optimization (parity: optimize(50) post-loop,
    # euroc_eval.cpp:281-288)
    def finalize(self) -> None:
        self.flush()
        g = pose_graph.optimize(
            self.state.graph, self.config.pose_graph,
            self.config.pose_graph.final_lm_iterations,
        )
        self.state = self.state.replace(graph=g)
        n = len(self.trajectory)
        poses = np.asarray(g.node_pose[1 : n + 1])
        self.trajectory = [
            (ts, poses[i]) for i, (ts, _) in enumerate(self.trajectory)
        ]

    # -- map access (parity: IMapper surface)
    def get_map(self) -> MapState:
        return mapper.filter_outliers(
            self.state.map_state, self.config.mapper.outlier_sigma
        )

    def export_map(self, ply_path: str | None = None, pcd_path: str | None = None):
        from aria_slam_tpu.mapping import export

        m = self.get_map()
        n = 0
        if ply_path:
            n = export.export_ply(m, ply_path)
        if pcd_path:
            n = export.export_pcd(m, pcd_path)
        return n

    @property
    def fused_pose(self) -> np.ndarray:
        s = self.state.ekf_state
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(lie.quat_to_mat(s.quat))
        T[:3, 3] = np.asarray(s.pos)
        return T

    @property
    def fused_pose_covariance(self) -> np.ndarray:
        """6x6 [dp, dtheta] covariance of the fused pose (parity:
        core::Pose.covariance, include/core/Types.hpp:66-70)."""
        from aria_slam_tpu.fusion import ekf as ekf_mod

        return np.asarray(ekf_mod.pose_covariance(self.state.ekf_state))
