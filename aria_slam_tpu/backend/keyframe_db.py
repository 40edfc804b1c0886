"""Device-resident keyframe descriptor database (ring buffer).

Parity: reference LoopClosureDetector's 500-keyframe deque
(src/legacy/LoopClosure.cpp:28-30) + the H14 GPU flat-descriptor-DB
design (SURVEY.md row 22), realized the TPU way: one padded
[N, F, 256] int8 tensor in HBM plus a per-keyframe bit-frequency
histogram used as a cheap place-recognition prefilter (full MXU
descriptor matching would be N x F x F x 256 — the histogram keeps the
whole-DB sweep to one skinny matmul and full matching runs only on the
top candidates).
"""

from __future__ import annotations

import jax.numpy as jnp

from aria_slam_tpu.config import LoopClosureConfig, OrbConfig
from aria_slam_tpu.core.types import Features, KeyframeDB


def descriptor_histogram(desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(..., F, B) bits + (..., F) mask -> (..., B) mean bit frequency."""
    v = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(v, -1, keepdims=True), 1.0)
    return jnp.sum(desc.astype(jnp.float32) * v[..., None], -2) / n


def init_db(cfg: LoopClosureConfig, orb: OrbConfig) -> KeyframeDB:
    n, f, b = cfg.max_keyframes, orb.num_features, orb.descriptor_bits
    return KeyframeDB(
        desc=jnp.zeros((n, f, b), jnp.int8),
        xy=jnp.zeros((n, f, 2), jnp.float32),
        desc_valid=jnp.zeros((n, f), bool),
        hist=jnp.zeros((n, b), jnp.float32),
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
        hist=db.hist.at[slot].set(descriptor_histogram(feats.desc, feats.valid)),
        frame_id=db.frame_id.at[slot].set(jnp.asarray(frame_id, jnp.int32)),
        pose=db.pose.at[slot].set(pose),
        size=jnp.minimum(db.size + 1, cap),
        head=(db.head + 1) % cap,
    )


def add_keyframes_batch(db: KeyframeDB, desc, xy, desc_valid, frame_ids,
                        poses) -> KeyframeDB:
    """Insert C keyframes at consecutive ring slots in one call
    (offline chunked evaluation). desc (C, F, B) int8, xy (C, F, 2),
    desc_valid (C, F), frame_ids (C,), poses (C, 4, 4)."""
    c = desc.shape[0]
    cap = db.desc.shape[0]
    slots = (db.head + jnp.arange(c, dtype=jnp.int32)) % cap
    return KeyframeDB(
        desc=db.desc.at[slots].set(desc),
        xy=db.xy.at[slots].set(xy),
        desc_valid=db.desc_valid.at[slots].set(desc_valid),
        hist=db.hist.at[slots].set(descriptor_histogram(desc, desc_valid)),
        frame_id=db.frame_id.at[slots].set(frame_ids.astype(jnp.int32)),
        pose=db.pose.at[slots].set(poses),
        size=jnp.minimum(db.size + c, cap),
        head=(db.head + c) % cap,
    )
