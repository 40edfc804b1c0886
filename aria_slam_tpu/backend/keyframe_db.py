"""Device-resident keyframe descriptor database (ring buffer).

Parity: reference LoopClosureDetector's 500-keyframe deque
(src/legacy/LoopClosure.cpp:28-30) + the H14 GPU flat-descriptor-DB
design (SURVEY.md row 22), realized the TPU way: one padded
[N, F, 256] int8 tensor in HBM; insertion is a masked dynamic-update;
querying the whole DB is a single MXU matmul (ops/match.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from aria_slam_tpu.config import LoopClosureConfig, OrbConfig
from aria_slam_tpu.core.types import Features, KeyframeDB


def init_db(cfg: LoopClosureConfig, orb: OrbConfig) -> KeyframeDB:
    n, f, b = cfg.max_keyframes, orb.num_features, orb.descriptor_bits
    return KeyframeDB(
        desc=jnp.zeros((n, f, b), jnp.int8),
        xy=jnp.zeros((n, f, 2), jnp.float32),
        desc_valid=jnp.zeros((n, f), bool),
        frame_id=jnp.full((n,), -1, jnp.int32),
        pose=jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n, 1, 1)),
        size=jnp.asarray(0, jnp.int32),
        head=jnp.asarray(0, jnp.int32),
    )


def add_keyframe(db: KeyframeDB, feats: Features, frame_id, pose) -> KeyframeDB:
    """Insert at the ring cursor (oldest evicted once full — parity with
    the reference's pop_front at 500, LoopClosure.cpp:28-30)."""
    slot = db.head
    cap = db.desc.shape[0]
    return KeyframeDB(
        desc=db.desc.at[slot].set(feats.desc),
        xy=db.xy.at[slot].set(feats.xy),
        desc_valid=db.desc_valid.at[slot].set(feats.valid),
        frame_id=db.frame_id.at[slot].set(jnp.asarray(frame_id, jnp.int32)),
        pose=db.pose.at[slot].set(pose),
        size=jnp.minimum(db.size + 1, cap),
        head=(db.head + 1) % cap,
    )
