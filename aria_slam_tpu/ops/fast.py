"""Dense FAST-9/16 corner detection + Harris ranking, TPU-style.

Parity: cv::cuda::ORB's FAST detector with Harris scoring
(reference src/adapters/gpu/OrbCudaExtractor.cpp:35-45:
HARRIS_SCORE, fastThreshold=20, edgeThreshold=31).

Design (SURVEY.md §7.3 item 1): instead of the GPU's sparse
compact-then-process flow, everything is *dense* over the image —
16 shifted views of the frame give each pixel its Bresenham ring, the
segment test and scores are a fixed cascade of VPU mask ops, 3x3 NMS is
a reduce_window, and the final sparse selection is one `top_k` over the
masked Harris response. No data-dependent shapes anywhere.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from aria_slam_tpu.ops.pyramid import sobel_gradients

# Bresenham circle of radius 3, (dx, dy), clockwise from 12 o'clock.
FAST_RING = (
    (0, -3), (1, -3), (2, -2), (3, -1),
    (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1),
    (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)

ARC_LEN = 9  # FAST-9


def _ring_views(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (16, H, W): value of each ring pixel for every center."""
    h, w = img.shape
    p = jnp.pad(img, 3, mode="edge")
    views = [p[3 + dy : 3 + dy + h, 3 + dx : 3 + dx + w] for (dx, dy) in FAST_RING]
    return jnp.stack(views, 0)


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9 corner score. 0 where not a corner.

    Score = the largest margin m such that some 9-long contiguous arc is
    uniformly brighter (or darker) than center by more than threshold;
    equivalently max over arcs of (min |diff| in arc) - threshold.
    """
    ring = _ring_views(img)  # (16, H, W)
    diff = ring - img[None]
    # circular extension for contiguous-arc windows
    dext = jnp.concatenate([diff, diff[: ARC_LEN - 1]], 0)  # (24, H, W)

    # min over each window of 9 for bright (diff) and dark (-diff)
    def window_min(x):
        m = x[:16]
        for i in range(1, ARC_LEN):
            m = jnp.minimum(m, x[i : i + 16])
        return m  # (16, H, W): per-start-position arc minimum

    bright = window_min(dext)          # arc min of (ring - center)
    dark = window_min(-dext)           # arc min of (center - ring)
    bright_best = jnp.max(bright, 0)   # best arc margin
    dark_best = jnp.max(dark, 0)
    score = jnp.maximum(bright_best, dark_best) - threshold
    return jnp.maximum(score, 0.0)


def harris_response(img: jnp.ndarray, block_size: int = 7, k: float = 0.04) -> jnp.ndarray:
    """Dense Harris corner response (det - k*tr^2 of the structure tensor)."""
    ix, iy = sobel_gradients(img)
    ixx, iyy, ixy = ix * ix, iy * iy, ix * iy

    def box(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (block_size, block_size), (1, 1), "SAME"
        )

    sxx, syy, sxy = box(ixx), box(iyy), box(ixy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    # scale like OpenCV (1/255 per derivative step isn't applied there either;
    # only relative order matters for ranking)
    return det - k * tr * tr


def nms_3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only local maxima in 3x3 neighborhoods."""
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((score >= pooled) & (score > 0.0), score, 0.0)


def use_pallas() -> bool:
    """Fused Pallas kernels run on the TPU backend; the XLA formulation
    is the CPU/test fallback (identical semantics, oracle-tested)."""
    import os

    if os.environ.get("ARIA_SLAM_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def rank_map_xla(img: jnp.ndarray, threshold: float,
                 harris_block: int = 7) -> jnp.ndarray:
    """Reference XLA formulation of the corner rank map (Harris response
    at NMS'd FAST corners, -inf elsewhere)."""
    score = nms_3x3(fast_score_map(img, threshold))
    harris = harris_response(img, harris_block)
    return jnp.where(score > 0.0, harris, -jnp.inf)


def detect_level(
    img: jnp.ndarray,
    threshold: float,
    top_k: int,
    border: int,
    harris_block: int = 7,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """FAST corners on one pyramid level, ranked by Harris response.

    Returns (xy (K,2) float32 level coords, response (K,), valid (K,)).
    """
    h, w = img.shape
    if use_pallas():
        from aria_slam_tpu.ops.pallas.corner_kernel import corner_rank_map

        rank = corner_rank_map(img, threshold, harris_block)
    else:
        rank = rank_map_xla(img, threshold, harris_block)

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_border = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    rank = jnp.where(in_border, rank, -jnp.inf)
    flat = rank.reshape(-1)
    # approx_max_k: the TPU-native top-k (aggregated bucketed max);
    # exact top_k lowers to a full sort network. Losing a few of the
    # weakest corners to the 95% recall target is irrelevant here.
    vals, idx = jax.lax.approx_max_k(flat, top_k, recall_target=0.95)
    yx = jnp.stack([idx // w, idx % w], -1)
    xy = jnp.stack([yx[:, 1], yx[:, 0]], -1).astype(jnp.float32)
    valid = vals > -1e30
    response = jnp.where(valid, vals, 0.0)
    return xy, response, valid
