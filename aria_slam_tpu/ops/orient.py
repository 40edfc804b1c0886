"""Keypoint orientation by intensity centroid (parity: cv::cuda::ORB's
IC_Angle; reference uses cv::cuda::ORB defaults, patchSize=31).

angle = atan2(m01, m10) over a radius-15 circular patch. The patch
gather is one batched advanced-indexing gather: (K, 31, 31), vectorized
over all keypoints at once — no per-keypoint loops.
"""

from __future__ import annotations

import jax.numpy as jnp

PATCH_RADIUS = 15


def gather_patches(img: jnp.ndarray, xy: jnp.ndarray, radius: int = PATCH_RADIUS) -> jnp.ndarray:
    """img (H, W), xy (K, 2) float level coords -> patches (K, 2r+1, 2r+1).

    Coordinates are clamped to the image so invalid/padded keypoints read
    garbage safely (their outputs are masked downstream).
    """
    h, w = img.shape
    size = 2 * radius + 1
    x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), radius, w - radius - 1)
    y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), radius, h - radius - 1)
    dy = jnp.arange(-radius, radius + 1)
    dx = jnp.arange(-radius, radius + 1)
    yy = y0[:, None, None] + dy[None, :, None]  # (K, S, 1)
    xx = x0[:, None, None] + dx[None, None, :]  # (K, 1, S)
    return img[yy, xx]  # (K, S, S) gather


def orientations_from_patches(patches: jnp.ndarray,
                              radius: int = PATCH_RADIUS) -> jnp.ndarray:
    """Intensity-centroid angle (K,) from centered square patches
    (K, S, S) with S >= 2*radius+1 (uses the central (2r+1)^2 window)."""
    s = patches.shape[-1]
    off = (s - (2 * radius + 1)) // 2
    if off:
        patches = patches[:, off : off + 2 * radius + 1, off : off + 2 * radius + 1]
    coords = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    ys = coords[:, None]
    xs = coords[None, :]
    circular = (ys * ys + xs * xs) <= (radius * radius)
    wmask = circular.astype(jnp.float32)  # (S, S)
    m10 = jnp.sum(patches * (xs * wmask)[None], axis=(1, 2))
    m01 = jnp.sum(patches * (ys * wmask)[None], axis=(1, 2))
    return jnp.arctan2(m01, m10)


def orientations(img: jnp.ndarray, xy: jnp.ndarray, radius: int = PATCH_RADIUS) -> jnp.ndarray:
    """Intensity-centroid angle (K,) in radians for keypoints at level coords xy."""
    patches = gather_patches(img, xy, radius)  # (K, S, S)
    return orientations_from_patches(patches, radius)
