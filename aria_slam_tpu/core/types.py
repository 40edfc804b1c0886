"""Domain pytree types (parity: reference include/core/Types.hpp:9-121).

Where the reference uses ragged std::vectors (keypoints, matches, map
points), the TPU design uses capacity-padded fixed-shape arrays with
validity masks — the shape never changes across frames, so the jitted
per-frame step compiles exactly once (SURVEY.md §7.1).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Features:
    """One frame's ORB features, padded to `num_features`.

    Parity: reference core::Frame (include/core/Types.hpp) which stores
    ragged keypoints + flat Nx32-byte descriptors.
    """

    xy: jnp.ndarray        # (K, 2) float32 — (x, y) in level-0 pixel coords
    response: jnp.ndarray  # (K,) float32 — Harris response used for ranking
    angle: jnp.ndarray     # (K,) float32 — orientation, radians
    octave: jnp.ndarray    # (K,) int32 — pyramid level
    size: jnp.ndarray      # (K,) float32 — patch diameter at level-0 scale
    desc: jnp.ndarray      # (K, 256) int8 in {0, 1} — rBRIEF bits (MXU layout)
    valid: jnp.ndarray     # (K,) bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[0]

    def num_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))


@flax.struct.dataclass
class Matches:
    """Per-query match result, padded to the query capacity.

    Parity: reference core::Match {query_idx, train_idx, distance}.
    """

    query_idx: jnp.ndarray  # (K,) int32
    train_idx: jnp.ndarray  # (K,) int32 — best match in train frame
    distance: jnp.ndarray   # (K,) float32 — Hamming distance of best
    valid: jnp.ndarray      # (K,) bool — passed ratio test + both valid

    def num_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))


@flax.struct.dataclass
class PoseDelta:
    """Relative camera motion estimate from epipolar geometry.

    Parity: reference recoverPose output (src/main.cpp:187-201).
    `R`, `t` map points from frame1's camera frame to frame2's:
    x2 = R @ x1 + t, with |t| = 1 (monocular scale ambiguity).
    """

    R: jnp.ndarray            # (3, 3)
    t: jnp.ndarray            # (3,) unit norm
    num_inliers: jnp.ndarray  # () int32
    inlier_mask: jnp.ndarray  # (K,) bool over the match slots
    success: jnp.ndarray      # () bool


@flax.struct.dataclass
class EkfState:
    """15-state error-state EKF (parity: reference include/legacy/IMU.hpp:53-118).

    Nominal state: position, velocity, orientation quaternion, biases.
    P is the 15x15 error covariance over
    [dp(3), dv(3), dtheta(3), dba(3), dbg(3)].
    """

    pos: jnp.ndarray   # (3,)
    vel: jnp.ndarray   # (3,)
    quat: jnp.ndarray  # (4,) (w, x, y, z)
    ba: jnp.ndarray    # (3,) accel bias
    bg: jnp.ndarray    # (3,) gyro bias
    P: jnp.ndarray     # (15, 15)
    last_imu_t: jnp.ndarray   # () float64-ish (float32 seconds from seq start)
    initialized: jnp.ndarray  # () bool


@flax.struct.dataclass
class Detections:
    """Object-detector output, padded to max_detections.

    Parity: reference Detection{box, confidence, class_id}
    (include/legacy/TRTInference.hpp).
    Boxes are (x1, y1, x2, y2) in input-image pixels.
    """

    boxes: jnp.ndarray    # (D, 4) float32
    scores: jnp.ndarray   # (D,) float32
    classes: jnp.ndarray  # (D,) int32
    valid: jnp.ndarray    # (D,) bool


@flax.struct.dataclass
class KeyframeDB:
    """Device-resident padded keyframe descriptor database.

    Parity: reference keyframe deque capped at 500
    (src/legacy/LoopClosure.cpp:28-30) and the H14 GPU flat-descriptor
    design — here it is a single [N, F, 256] int8 tensor so one MXU
    matmul scores a query against the *entire* database (SURVEY.md §5.7).
    """

    desc: jnp.ndarray       # (N, F, 256) int8 bits
    xy: jnp.ndarray         # (N, F, 2) float32 keypoint coords
    desc_valid: jnp.ndarray # (N, F) bool
    hist: jnp.ndarray       # (N, 256) float32 — mean bit frequencies of the
                            # keyframe's descriptors (place-recognition prefilter)
    frame_id: jnp.ndarray   # (N,) int32 — source frame index (-1 = empty)
    pose: jnp.ndarray       # (N, 4, 4) float32 — world-from-camera at insert
    # covisibility adjacency over DB slots (parity: the reference
    # KeyFrame declares covisible_keyframes, include/core/Types.hpp:42 —
    # declared but never populated there; here temporal neighbors are
    # linked on insert and accepted loop pairs via mark_covisible). A
    # fixed (N, N) bool matrix instead of ragged id lists: slot rows
    # clear on ring eviction, and neighborhood queries are one row read.
    covis: jnp.ndarray      # (N, N) bool, symmetric
    size: jnp.ndarray       # () int32 — number of live entries
    head: jnp.ndarray       # () int32 — ring-buffer write cursor


@flax.struct.dataclass
class MapState:
    """Sparse 3D map, padded to max_points.

    Parity: reference MapPoint vector (include/legacy/Mapper.hpp).
    """

    points: jnp.ndarray   # (P, 3) float32
    colors: jnp.ndarray   # (P, 3) float32 in [0, 1]
    quality: jnp.ndarray  # (P,) float32
    valid: jnp.ndarray    # (P,) bool
    count: jnp.ndarray    # () int32 — insertion cursor


@flax.struct.dataclass
class PoseGraph:
    """SE3 pose graph, padded to static capacities.

    Parity: reference PoseGraphOptimizer/g2o (src/legacy/LoopClosure.cpp:197-313):
    nodes = per-frame poses (node 0 fixed), edges = odometry + loop
    constraints with relative SE3 measurements and scalar weights.
    """

    node_pose: jnp.ndarray   # (N, 4, 4) float32 world-from-camera
    node_valid: jnp.ndarray  # (N,) bool
    edge_i: jnp.ndarray      # (E,) int32
    edge_j: jnp.ndarray      # (E,) int32
    edge_rel: jnp.ndarray    # (E, 4, 4) float32 — measured T_i^-1 T_j
    edge_weight: jnp.ndarray # (E,) float32
    # translation weight in [0, 1]: scales the translation components of
    # the residual relative to rotation. Monocular relative poses have a
    # parallax-dependent translation quality — a zero-baseline loop pair
    # yields a perfect rotation but a MEANINGLESS unit translation, so
    # such edges contribute rotation-only (the reference feeds the raw
    # recoverPose t at full weight, LoopClosure.cpp:176-183)
    edge_twt: jnp.ndarray    # (E,) float32
    # rotation weight (>= 0): gyro-integrated chain rotations are ~30x
    # more accurate than two-view VO rotations, so gyro-backed odometry
    # edges carry a high rotation weight and pin orientation against
    # the noisier backbone/loop rotation measurements
    edge_rwt: jnp.ndarray    # (E,) float32
    edge_valid: jnp.ndarray  # (E,) bool
    num_nodes: jnp.ndarray   # () int32
    num_edges: jnp.ndarray   # () int32


def make_empty_features(capacity: int, bits: int = 256) -> Features:
    return Features(
        xy=jnp.zeros((capacity, 2), jnp.float32),
        response=jnp.zeros((capacity,), jnp.float32),
        angle=jnp.zeros((capacity,), jnp.float32),
        octave=jnp.zeros((capacity,), jnp.int32),
        size=jnp.full((capacity,), 31.0, jnp.float32),
        desc=jnp.zeros((capacity, bits), jnp.int8),
        valid=jnp.zeros((capacity,), bool),
    )
