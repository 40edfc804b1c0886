"""Rotated BRIEF (rBRIEF) descriptors (parity: cv::cuda::ORB's steered
BRIEF, WTA_K=2, 256 bits; reference src/adapters/gpu/OrbCudaExtractor.cpp:35-45).

We use our own deterministic sampling pattern (seeded isotropic Gaussian
pairs, sigma = patch/5, the BRIEF-paper recipe) rather than OpenCV's
learned table — descriptors are self-consistent within this framework,
which is what matching/loop closure require.

TPU design: steering uses the ORB paper's 12-degree quantization (30
rotated copies of the pattern, precomputed). Each keypoint gathers one
39x39 patch around itself (block gathers lower to fast row loads), the
patch is flattened, and ALL 30 rotated bit-sets are evaluated at once as
ONE bf16 matmul against a precomputed (30*256, 1521) +1/-1 selection
matrix — intensities are exact in bf16 and each row has exactly one +1
and one -1, so bits are exact. The keypoint's own angle bin is then
picked with a one-hot multiply. Arbitrary per-element 2D gathers (the
naive formulation) cost ~42 ms/frame on this stack; this path is <1 ms.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

NUM_ANGLE_BINS = 30  # 12-degree steering quantization (ORB paper)
PATCH_R = 19         # covers |offset| <= 13 * sqrt(2) after rotation
PATCH_S = 2 * PATCH_R + 1

_PATTERN_CACHE = {}
_SELECT_CACHE = {}


def brief_pattern(bits: int = 256, patch_size: int = 31, seed: int = 2024) -> np.ndarray:
    """(bits, 2, 2) float32 — (pair, point, (x, y)) sampling offsets.

    Gaussian with sigma = patch_size / 5, rejected to |offset| <= 13 so
    every rotated sample stays inside the 39x39 patch.
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


def _selection_matrix(pattern: np.ndarray) -> np.ndarray:
    """(NUM_ANGLE_BINS * bits, PATCH_S^2) with +1 at p2's rotated cell and
    -1 at p1's, for every angle bin: bit = (I[p1] < I[p2])  <=>  row . patch > 0."""
    key = pattern.tobytes()
    if key not in _SELECT_CACHE:
        bits = pattern.shape[0]
        sel = np.zeros((NUM_ANGLE_BINS, bits, PATCH_S * PATCH_S), np.float32)
        for b in range(NUM_ANGLE_BINS):
            a = 2.0 * np.pi * b / NUM_ANGLE_BINS
            ca, sa = np.cos(a), np.sin(a)
            rx = np.round(ca * pattern[..., 0] - sa * pattern[..., 1]).astype(int)
            ry = np.round(sa * pattern[..., 0] + ca * pattern[..., 1]).astype(int)
            lin = (ry + PATCH_R) * PATCH_S + (rx + PATCH_R)  # (bits, 2)
            for i in range(bits):
                sel[b, i, lin[i, 0]] -= 1.0  # p1
                sel[b, i, lin[i, 1]] += 1.0  # p2
        _SELECT_CACHE[key] = sel.reshape(NUM_ANGLE_BINS * bits, PATCH_S * PATCH_S)
    return _SELECT_CACHE[key]


@functools.lru_cache(maxsize=None)
def _moment_matrix(radius: int = 15) -> np.ndarray:
    """(2, PATCH_S^2) rows = [x * mask, y * mask] over the central
    (2r+1)^2 circular window of the 39x39 patch — so intensity-centroid
    moments (m10, m01) come out of the same matmul as the BRIEF bits."""
    m = np.zeros((2, PATCH_S, PATCH_S), np.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx * dx + dy * dy <= radius * radius:
                m[0, PATCH_R + dy, PATCH_R + dx] = dx
                m[1, PATCH_R + dy, PATCH_R + dx] = dy
    return m.reshape(2, PATCH_S * PATCH_S)


def describe_and_orient(patches_flat: jnp.ndarray, pattern: np.ndarray):
    """Fused rBRIEF + intensity-centroid orientation from flattened
    39x39 blurred patches: ONE bf16 matmul computes every angle bin's
    bit differences AND the orientation moments; the angle then picks
    its bin via one-hot. Returns (bits (..., K, 256) int8, angle (..., K)).
    """
    bits = pattern.shape[0]
    sel = _selection_matrix(pattern)                    # (30*bits, P)
    combined = np.concatenate([sel, _moment_matrix()], 0)  # (30*bits+2, P)
    out = jnp.einsum(
        "...kp,sp->...ks",
        patches_flat.astype(jnp.bfloat16),
        jnp.asarray(combined).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    diffs = out[..., : NUM_ANGLE_BINS * bits]
    m10 = out[..., -2]
    m01 = out[..., -1]
    angle = jnp.arctan2(m01, m10)

    diffs = diffs.reshape(diffs.shape[:-1] + (NUM_ANGLE_BINS, bits))
    two_pi = 2.0 * np.pi
    frac = (angle / two_pi) % 1.0
    bin_idx = jnp.clip((frac * NUM_ANGLE_BINS + 0.5).astype(jnp.int32) % NUM_ANGLE_BINS,
                       0, NUM_ANGLE_BINS - 1)
    onehot = jax.nn.one_hot(bin_idx, NUM_ANGLE_BINS, dtype=jnp.float32)
    picked = jnp.einsum("...kbs,...kb->...ks", diffs, onehot)
    return (picked > 0).astype(jnp.int8), angle


def describe_from_patches(
    patches_flat: jnp.ndarray,
    angle: jnp.ndarray,
    pattern: np.ndarray,
) -> jnp.ndarray:
    """rBRIEF bits from flattened 39x39 blurred patches.

    patches_flat: (..., K, PATCH_S^2) float32. angle: (..., K) radians.
    Returns (..., K, bits) int8 in {0, 1}.
    """
    bits = pattern.shape[0]
    sel = jnp.asarray(_selection_matrix(pattern))  # (30*bits, 1521)
    # one bf16 matmul evaluates every angle bin's bit-set for every patch;
    # +1/-1 rows on 0..255 intensities are exact in bf16 with f32 accum
    diffs = jnp.einsum(
        "...kp,sp->...ks",
        patches_flat.astype(jnp.bfloat16),
        sel.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    diffs = diffs.reshape(diffs.shape[:-1] + (NUM_ANGLE_BINS, bits))

    # pick each keypoint's angle bin with a one-hot contraction
    two_pi = 2.0 * np.pi
    frac = (angle / two_pi) % 1.0
    bin_idx = jnp.clip((frac * NUM_ANGLE_BINS + 0.5).astype(jnp.int32) % NUM_ANGLE_BINS,
                       0, NUM_ANGLE_BINS - 1)
    onehot = jax.nn.one_hot(bin_idx, NUM_ANGLE_BINS, dtype=jnp.float32)
    picked = jnp.einsum("...kbs,...kb->...ks", diffs, onehot)
    return (picked > 0).astype(jnp.int8)


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
    from aria_slam_tpu.ops.orient import gather_patches

    k = xy.shape[0]
    patches = gather_patches(img, xy, PATCH_R).reshape(k, PATCH_S * PATCH_S)
    return describe_from_patches(patches, angle, pattern)


def smooth_for_brief(img: jnp.ndarray) -> jnp.ndarray:
    """5x5 box smoothing before sampling (ORB uses an integral-image 5x5
    sum). Separable box filter as two banded bf16 matmuls — both the
    conv and reduce_window formulations cost ~40 ms/frame on this stack."""
    from aria_slam_tpu.ops.pyramid import _box_matrix, _sep_matmul

    h, w = img.shape[-2:]
    return _sep_matmul(img, _box_matrix(h, 5), _box_matrix(w, 5))


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
