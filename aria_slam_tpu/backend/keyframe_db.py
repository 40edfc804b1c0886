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
        covis=jnp.zeros((n, n), bool),
        size=jnp.asarray(0, jnp.int32),
        head=jnp.asarray(0, jnp.int32),
    )


def _covis_clear(covis: jnp.ndarray, slots) -> jnp.ndarray:
    """Ring eviction: an overwritten slot's old covisibility links are
    stale — zero its row and column before relinking."""
    covis = covis.at[slots].set(False)
    return covis.at[:, slots].set(False)


def add_keyframe(db: KeyframeDB, feats: Features, frame_id, pose) -> KeyframeDB:
    """Insert at the ring cursor (oldest evicted once full — parity with
    the reference's pop_front at 500, LoopClosure.cpp:28-30). The new
    keyframe is linked covisible with the previously inserted one
    (temporal adjacency; loop links come via mark_covisible)."""
    slot = db.head
    cap = db.desc.shape[0]
    prev = (db.head - 1) % cap
    covis = _covis_clear(db.covis, slot)
    has_prev = db.size > 0
    covis = covis.at[slot, prev].set(has_prev)
    covis = covis.at[prev, slot].set(has_prev)
    return KeyframeDB(
        desc=db.desc.at[slot].set(feats.desc),
        xy=db.xy.at[slot].set(feats.xy),
        desc_valid=db.desc_valid.at[slot].set(feats.valid),
        hist=db.hist.at[slot].set(descriptor_histogram(feats.desc, feats.valid)),
        frame_id=db.frame_id.at[slot].set(jnp.asarray(frame_id, jnp.int32)),
        pose=db.pose.at[slot].set(pose),
        covis=covis,
        size=jnp.minimum(db.size + 1, cap),
        head=(db.head + 1) % cap,
    )


def add_keyframes_batch(db: KeyframeDB, desc, xy, desc_valid, frame_ids,
                        poses) -> KeyframeDB:
    """Insert C keyframes at consecutive ring slots in one call
    (offline chunked evaluation). desc (C, F, B) int8, xy (C, F, 2),
    desc_valid (C, F), frame_ids (C,), poses (C, 4, 4). Consecutive
    inserts are linked covisible (temporal adjacency), including the
    first new slot to the previously inserted keyframe."""
    c = desc.shape[0]
    cap = db.desc.shape[0]
    slots = (db.head + jnp.arange(c, dtype=jnp.int32)) % cap
    covis = _covis_clear(db.covis, slots)
    # temporal chain: slot k-1 <-> slot k (the k=0 predecessor is the
    # previous insert, masked out on the very first insert)
    pred = (slots - 1) % cap
    link_ok = jnp.concatenate(
        [jnp.asarray([db.size > 0]), jnp.ones((c - 1,), bool)])
    covis = covis.at[slots, pred].max(link_ok)
    covis = covis.at[pred, slots].max(link_ok)
    return KeyframeDB(
        desc=db.desc.at[slots].set(desc),
        xy=db.xy.at[slots].set(xy),
        desc_valid=db.desc_valid.at[slots].set(desc_valid),
        hist=db.hist.at[slots].set(descriptor_histogram(desc, desc_valid)),
        frame_id=db.frame_id.at[slots].set(frame_ids.astype(jnp.int32)),
        pose=db.pose.at[slots].set(poses),
        covis=covis,
        size=jnp.minimum(db.size + c, cap),
        head=(db.head + c) % cap,
    )


def mark_covisible(db: KeyframeDB, slot_a, slot_b) -> KeyframeDB:
    """Link two DB slots covisible (symmetric) — called for accepted
    loop-closure pairs, which observe the same scene by construction."""
    a = jnp.asarray(slot_a, jnp.int32)
    b = jnp.asarray(slot_b, jnp.int32)
    return db.replace(covis=db.covis.at[a, b].set(True).at[b, a].set(True))


def covisible_slots(db: KeyframeDB, slot) -> jnp.ndarray:
    """(N,) bool mask of slots covisible with `slot` (parity surface for
    KeyFrame.covisible_keyframes, include/core/Types.hpp:42)."""
    return db.covis[jnp.asarray(slot, jnp.int32)]
