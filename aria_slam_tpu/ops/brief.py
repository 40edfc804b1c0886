"""Rotated BRIEF (rBRIEF) descriptors (parity: cv::cuda::ORB's steered
BRIEF, WTA_K=2, 256 bits; reference src/adapters/gpu/OrbCudaExtractor.cpp:35-45).

We use our own deterministic sampling pattern (seeded isotropic Gaussian
pairs, sigma = patch/5, the BRIEF-paper recipe) rather than OpenCV's
learned table — descriptors are self-consistent within this framework,
which is what matching/loop closure require. Bits are stored unpacked as
(K, 256) int8 so Hamming matching becomes one int8 matmul on the MXU
(SURVEY.md §2.1); `pack_bits`/`unpack_bits` give the compact uint32 form
for storage.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from aria_slam_tpu.ops.pyramid import box_blur

_PATTERN_CACHE = {}


def brief_pattern(bits: int = 256, patch_size: int = 31, seed: int = 2024) -> np.ndarray:
    """(bits, 2, 2) float32 — (pair, point, (x, y)) sampling offsets.

    Gaussian with sigma = patch_size / 5, clipped to the patch, rejected
    so that |offset| <= 13 (after rotation stays within the 31-px
    edge-threshold margin the detector enforces).
    """
    key = (bits, patch_size, seed)
    if key not in _PATTERN_CACHE:
        rng = np.random.default_rng(seed)
        sigma = patch_size / 5.0
        max_r = 13.0
        pts = []
        while len(pts) < bits * 2:
            cand = rng.normal(0.0, sigma, size=(bits * 4, 2))
            cand = cand[np.linalg.norm(cand, axis=-1) <= max_r]
            pts.extend(cand.tolist())
        pat = np.asarray(pts[: bits * 2], np.float32).reshape(bits, 2, 2)
        _PATTERN_CACHE[key] = pat
    return _PATTERN_CACHE[key]


def describe(
    img: jnp.ndarray,
    xy: jnp.ndarray,
    angle: jnp.ndarray,
    pattern: np.ndarray,
) -> jnp.ndarray:
    """rBRIEF bits for keypoints on one (already blurred) pyramid level.

    img: (H, W) float32 blurred level image.
    xy: (K, 2) float level coords. angle: (K,) radians.
    Returns (K, bits) int8 in {0, 1}.
    """
    h, w = img.shape
    pat = jnp.asarray(pattern)  # (B, 2, 2)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (K,)
    # rotate pattern by keypoint angle: steered BRIEF
    px, py = pat[..., 0], pat[..., 1]  # (B, 2)
    rx = ca[:, None, None] * px[None] - sa[:, None, None] * py[None]  # (K, B, 2)
    ry = sa[:, None, None] * px[None] + ca[:, None, None] * py[None]
    sx = jnp.clip(jnp.round(xy[:, 0, None, None] + rx).astype(jnp.int32), 0, w - 1)
    sy = jnp.clip(jnp.round(xy[:, 1, None, None] + ry).astype(jnp.int32), 0, h - 1)
    vals = img[sy, sx]  # (K, B, 2) gather
    return (vals[..., 0] < vals[..., 1]).astype(jnp.int8)


def smooth_for_brief(img: jnp.ndarray) -> jnp.ndarray:
    """5x5 box smoothing before sampling (ORB uses an integral-image 5x5 sum)."""
    return box_blur(img, 5)


def pack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """(K, 256) {0,1} int8 -> (K, 8) uint32 packed (bit b of word i = bit 32*i+b)."""
    k, bits = desc.shape
    assert bits % 32 == 0
    d = desc.astype(jnp.uint32).reshape(k, bits // 32, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(d << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def unpack_bits(packed: jnp.ndarray, bits: int = 256) -> jnp.ndarray:
    """(K, 8) uint32 -> (K, 256) int8."""
    k = packed.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    d = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return d.reshape(k, bits).astype(jnp.int8)
