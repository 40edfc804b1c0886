"""Fused ORB front-end: image -> Features, one jitted program.

Parity: the reference's Frame + OrbCudaExtractor flow
(src/legacy/Frame.cpp:6-42, src/adapters/gpu/OrbCudaExtractor.cpp:21-217):
upload -> cv::cuda::ORB(detect+compute) -> download. Here the whole
front-end (pyramid, FAST, Harris ranking, orientation, rBRIEF) is a
single XLA program over fixed shapes; nothing leaves the device until
the caller asks.

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


def extract(img: jnp.ndarray, cfg: OrbConfig) -> Features:
    """img: (H, W) float32 grayscale in [0, 255] -> Features (padded to
    cfg.num_features, ranked by Harris response)."""
    levels = build_pyramid(img, cfg.num_levels, cfg.scale_factor)
    quotas = features_per_level(cfg.num_features, cfg.num_levels, cfg.scale_factor)
    pattern = brief.brief_pattern(cfg.descriptor_bits, cfg.patch_size, cfg.brief_seed)

    all_xy, all_resp, all_angle, all_oct, all_size, all_desc, all_valid = (
        [], [], [], [], [], [], []
    )
    for lvl, (limg, quota) in enumerate(zip(levels, quotas)):
        scale = cfg.scale_factor**lvl
        xy, resp, valid = fast.detect_level(
            limg,
            cfg.fast_threshold,
            quota,
            border=cfg.edge_threshold,
            harris_block=cfg.harris_block_size,
        )
        ang = orient.orientations(limg, xy)
        blurred = brief.smooth_for_brief(limg)
        desc = brief.describe(blurred, xy, ang, pattern)

        all_xy.append(xy * scale)
        all_resp.append(resp)
        all_angle.append(ang)
        all_oct.append(jnp.full((quota,), lvl, jnp.int32))
        all_size.append(jnp.full((quota,), cfg.patch_size * scale, jnp.float32))
        all_desc.append(desc)
        all_valid.append(valid)

    xy = jnp.concatenate(all_xy, 0)
    resp = jnp.concatenate(all_resp, 0)
    angle = jnp.concatenate(all_angle, 0)
    octv = jnp.concatenate(all_oct, 0)
    size = jnp.concatenate(all_size, 0)
    desc = jnp.concatenate(all_desc, 0)
    valid = jnp.concatenate(all_valid, 0)

    # keep the global top num_features by response (padding slots sink);
    # approx_max_k = the TPU-native top-k (see fast.detect_level)
    order_key = jnp.where(valid, resp, -jnp.inf)
    _, idx = jax.lax.approx_max_k(order_key, cfg.num_features, recall_target=0.95)
    return Features(
        xy=xy[idx],
        response=jnp.where(valid[idx], resp[idx], 0.0),
        angle=angle[idx],
        octave=octv[idx],
        size=size[idx],
        desc=desc[idx] * valid[idx, None].astype(jnp.int8),
        valid=valid[idx],
    )
