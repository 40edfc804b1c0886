"""Fused ORB front-end: image(s) -> Features, one jitted program.

Parity: the reference's Frame + OrbCudaExtractor flow
(src/legacy/Frame.cpp:6-42, src/adapters/gpu/OrbCudaExtractor.cpp:21-217):
upload -> cv::cuda::ORB(detect+compute) -> download. Here the whole
front-end (pyramid, FAST, Harris ranking, orientation, rBRIEF) is a
single XLA program over fixed shapes; nothing leaves the device until
the caller asks.

Batched-first: `extract_batch` processes (B, H, W) frames together —
the Pallas corner kernel batches over its grid (vmap over ANY-memspace
pallas_calls is unsupported), everything else is vmapped. Offline
evaluation and the benchmark run whole chunks of frames per program
call (SURVEY.md §5.7 'chunked jitted windows'); the online pipeline
uses B = 1.

Feature budget per level follows the geometric distribution ORB uses:
n_i proportional to (1/scale)^i, summing to num_features.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from aria_slam_tpu.config import OrbConfig
from aria_slam_tpu.core.types import Features
from aria_slam_tpu.ops import brief, fast, orient
from aria_slam_tpu.ops.pyramid import build_pyramid


def features_per_level(num_features: int, num_levels: int, scale_factor: float) -> List[int]:
    f = 1.0 / scale_factor
    raw = [f**i for i in range(num_levels)]
    total = sum(raw)
    ns = [max(8, int(round(num_features * r / total))) for r in raw]
    # fix rounding drift on level 0
    ns[0] += num_features - sum(ns)
    return ns


def _detect_level_batched(imgs, threshold, top_k, border, harris_block):
    """(B, H, W) -> xy (B, K, 2), response (B, K), valid (B, K)."""
    bsz, h, w = imgs.shape
    if fast.use_pallas():
        from aria_slam_tpu.ops.pallas.corner_kernel import corner_rank_map_batched

        rank = corner_rank_map_batched(imgs, threshold, harris_block)
    else:
        rank = jax.vmap(lambda im: fast.rank_map_xla(im, threshold, harris_block))(imgs)

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_border = (
        (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)
    )
    rank = jnp.where(in_border[None], rank, -jnp.inf)
    flat = rank.reshape(bsz, h * w)
    vals, idx = jax.lax.approx_max_k(flat, top_k, recall_target=0.95)
    xy = jnp.stack([(idx % w).astype(jnp.float32),
                    (idx // w).astype(jnp.float32)], -1)
    valid = vals > -1e30
    return xy, jnp.where(valid, vals, 0.0), valid


def extract_batch(imgs: jnp.ndarray, cfg: OrbConfig) -> Features:
    """imgs: (B, H, W) float32 grayscale in [0, 255] -> Features with a
    leading batch axis, padded to cfg.num_features per frame."""
    bsz = imgs.shape[0]
    levels = build_pyramid(imgs, cfg.num_levels, cfg.scale_factor)
    quotas = features_per_level(cfg.num_features, cfg.num_levels, cfg.scale_factor)
    pattern = brief.brief_pattern(cfg.descriptor_bits, cfg.patch_size, cfg.brief_seed)

    all_xy, all_resp, all_angle, all_oct, all_size, all_desc, all_valid = (
        [], [], [], [], [], [], []
    )
    for lvl, (limgs, quota) in enumerate(zip(levels, quotas)):
        scale = cfg.scale_factor**lvl
        xy, resp, valid = _detect_level_batched(
            limgs, cfg.fast_threshold, quota, cfg.edge_threshold,
            cfg.harris_block_size,
        )
        blurred = brief.smooth_for_brief(limgs)  # (B, h, w)
        # one 39x39 patch per keypoint from the blurred level;
        # orientation moments + all rBRIEF bins come out of one matmul
        if fast.use_pallas():
            from aria_slam_tpu.ops.pallas.patch_kernel import extract_patches

            patches = extract_patches(blurred, xy, brief.PATCH_R)
        else:
            patches = jax.vmap(
                lambda im, p: orient.gather_patches(im, p, brief.PATCH_R)
            )(blurred, xy)  # (B, K, 39, 39)
        desc, ang = brief.describe_and_orient(
            patches.reshape(bsz, quota, -1), pattern
        )

        all_xy.append(xy * scale)
        all_resp.append(resp)
        all_angle.append(ang)
        all_oct.append(jnp.full((bsz, quota), lvl, jnp.int32))
        all_size.append(jnp.full((bsz, quota), cfg.patch_size * scale, jnp.float32))
        all_desc.append(desc)
        all_valid.append(valid)

    # per-level quotas sum exactly to num_features (like OpenCV's
    # per-level retainBest), so plain concatenation gives the padded
    # feature set directly — no global re-rank gather needed
    valid = jnp.concatenate(all_valid, 1)
    desc = jnp.concatenate(all_desc, 1) * valid[..., None].astype(jnp.int8)
    return Features(
        xy=jnp.concatenate(all_xy, 1),
        response=jnp.where(valid, jnp.concatenate(all_resp, 1), 0.0),
        angle=jnp.concatenate(all_angle, 1),
        octave=jnp.concatenate(all_oct, 1),
        size=jnp.concatenate(all_size, 1),
        desc=desc,
        valid=valid,
    )


def extract(img: jnp.ndarray, cfg: OrbConfig) -> Features:
    """Single-frame wrapper: (H, W) -> Features (no batch axis)."""
    feats = extract_batch(img[None], cfg)
    return jax.tree_util.tree_map(lambda x: x[0], feats)
