"""Sparse 3D mapping: triangulation + filters into a padded map buffer.

Parity: reference Mapper (src/legacy/Mapper.cpp): DLT triangulation,
depth window [0.1, 50] m in both cameras, parallax >= 1 deg,
reprojection error <= 2 px in both views, color sampling from the
first image, 3-sigma statistical outlier removal, bounding box.

TPU design: the map is a fixed-capacity MapState; each insert
triangulates all matches at once, computes all filter masks as vector
ops, and scatters the survivors into the buffer at the insertion
cursor. No dynamic shapes, no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aria_slam_tpu.config import MapperConfig
from aria_slam_tpu.core.types import MapState
from aria_slam_tpu.ops.triangulate import triangulate_calibrated


def init_map(cfg: MapperConfig) -> MapState:
    p = cfg.max_points
    return MapState(
        points=jnp.zeros((p, 3), jnp.float32),
        colors=jnp.full((p, 3), 0.5, jnp.float32),
        quality=jnp.zeros((p,), jnp.float32),
        valid=jnp.zeros((p,), bool),
        count=jnp.asarray(0, jnp.int32),
    )


def triangulate_and_filter(
    K: jnp.ndarray,
    T1_cw: jnp.ndarray,
    T2_cw: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    image1: jnp.ndarray | None,
    cfg: MapperConfig,
):
    """Triangulate matched pixels and apply the reference's quality gates.

    T*_cw are camera-from-world 4x4. Returns (points (N,3) world,
    colors (N,3), quality (N,), keep (N,) bool).
    """
    X = triangulate_calibrated(K, T1_cw, T2_cw, uv1, uv2)  # (N, 3) world

    R1, t1 = T1_cw[:3, :3], T1_cw[:3, 3]
    R2, t2 = T2_cw[:3, :3], T2_cw[:3, 3]
    Xc1 = X @ R1.T + t1
    Xc2 = X @ R2.T + t2

    # depth gates in both cameras (Mapper.cpp:65-68)
    keep = valid
    keep &= (Xc1[:, 2] > cfg.min_depth) & (Xc1[:, 2] < cfg.max_depth)
    keep &= (Xc2[:, 2] > cfg.min_depth) & (Xc2[:, 2] < cfg.max_depth)

    # parallax gate (Mapper.cpp:70-77)
    C1 = -R1.T @ t1
    C2 = -R2.T @ t2
    ray1 = X - C1
    ray2 = X - C2
    ray1 = ray1 / jnp.maximum(jnp.linalg.norm(ray1, axis=1, keepdims=True), 1e-9)
    ray2 = ray2 / jnp.maximum(jnp.linalg.norm(ray2, axis=1, keepdims=True), 1e-9)
    cos_par = jnp.abs(jnp.sum(ray1 * ray2, axis=1))
    parallax_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_par, 0.0, 1.0)))
    keep &= parallax_deg >= cfg.min_parallax_deg

    # reprojection gates (Mapper.cpp:79-92)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def reproj_err(Xc, uv):
        z = jnp.maximum(Xc[:, 2], 1e-9)
        u = fx * Xc[:, 0] / z + cx
        v = fy * Xc[:, 1] / z + cy
        return jnp.hypot(u - uv[:, 0], v - uv[:, 1])

    err1 = reproj_err(Xc1, uv1)
    err2 = reproj_err(Xc2, uv2)
    keep &= (err1 <= cfg.max_reproj_error_px) & (err2 <= cfg.max_reproj_error_px)

    quality = 1.0 / (err1 + err2 + 0.1)  # Mapper.cpp:118

    if image1 is not None:
        h, w = image1.shape
        px = jnp.clip(uv1[:, 0].astype(jnp.int32), 0, w - 1)
        py = jnp.clip(uv1[:, 1].astype(jnp.int32), 0, h - 1)
        gray = image1[py, px] / 255.0
        colors = jnp.stack([gray, gray, gray], -1)
    else:
        colors = jnp.full((X.shape[0], 3), 0.5, jnp.float32)

    return X, colors, quality, keep


def insert_points(m: MapState, points, colors, quality, keep) -> MapState:
    """Scatter surviving points at the cursor (compacted, order-preserving)."""
    n = points.shape[0]
    keep_i = keep.astype(jnp.int32)
    offsets = jnp.cumsum(keep_i) - keep_i  # rank among survivors
    slots = jnp.where(keep, m.count + offsets, jnp.int32(1 << 30))  # OOB -> drop
    cap = m.points.shape[0]
    slots = jnp.where(slots < cap, slots, jnp.int32(1 << 30))
    return MapState(
        points=m.points.at[slots].set(points, mode="drop"),
        colors=m.colors.at[slots].set(colors, mode="drop"),
        quality=m.quality.at[slots].set(quality, mode="drop"),
        valid=m.valid.at[slots].set(True, mode="drop"),
        count=jnp.minimum(m.count + jnp.sum(keep_i), cap),
    )


def add_from_matches(m: MapState, K, T1_cw, T2_cw, uv1, uv2, valid, image1,
                     cfg: MapperConfig) -> MapState:
    """Parity: Mapper::triangulate (one call per frame pair)."""
    enough = jnp.sum(valid.astype(jnp.int32)) >= 8  # Mapper.cpp:13
    pts, cols, qual, keep = triangulate_and_filter(
        K, T1_cw, T2_cw, uv1, uv2, valid, image1, cfg
    )
    keep &= enough
    return insert_points(m, pts, cols, qual, keep)


def add_from_matches_batched(m: MapState, K, T1s_cw, T2s_cw, uv1s, uv2s,
                             valids, images, cfg: MapperConfig) -> MapState:
    """Batched insert for offline chunked evaluation: triangulate C frame
    pairs at once (T*s (C, 4, 4), uv*s (C, N, 2), valids (C, N),
    images (C, H, W) or None) and scatter all survivors in one update."""
    c, n = valids.shape

    def one(T1, T2, uv1, uv2, valid, image):
        enough = jnp.sum(valid.astype(jnp.int32)) >= 8
        pts, cols, qual, keep = triangulate_and_filter(
            K, T1, T2, uv1, uv2, valid, image, cfg
        )
        return pts, cols, qual, keep & enough

    pts, cols, qual, keep = jax.vmap(one)(T1s_cw, T2s_cw, uv1s, uv2s, valids,
                                          images)
    return insert_points(
        m, pts.reshape(c * n, 3), cols.reshape(c * n, 3),
        qual.reshape(c * n), keep.reshape(c * n),
    )


def filter_outliers(m: MapState, sigma: float = 3.0) -> MapState:
    """3-sigma statistical outlier removal on distance-to-centroid
    (parity: Mapper::filterOutliers, Mapper.cpp:134-165)."""
    vf = m.valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(vf), 1.0)
    centroid = jnp.sum(m.points * vf[:, None], 0) / n
    d = jnp.linalg.norm(m.points - centroid, axis=1)
    mean = jnp.sum(d * vf) / n
    var = jnp.sum((d - mean) ** 2 * vf) / n
    std = jnp.sqrt(jnp.maximum(var, 1e-12))
    keep = m.valid & (d <= mean + sigma * std)
    return m.replace(valid=keep)


def filter_by_distance(m: MapState, max_dist: float, origin=None) -> MapState:
    """Parity: Mapper::filterByDistance."""
    origin = jnp.zeros(3, jnp.float32) if origin is None else origin
    d = jnp.linalg.norm(m.points - origin, axis=1)
    return m.replace(valid=m.valid & (d <= max_dist))


def bounding_box(m: MapState):
    """Parity: Mapper::getBoundingBox (Mapper.cpp:258-269)."""
    big = jnp.float32(1e30)
    lo = jnp.min(jnp.where(m.valid[:, None], m.points, big), 0)
    hi = jnp.max(jnp.where(m.valid[:, None], m.points, -big), 0)
    return lo, hi
