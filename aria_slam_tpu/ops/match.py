"""Brute-force Hamming matching on the MXU.

Parity: cv::cuda::DescriptorMatcher BF-Hamming kNN(k=2) + Lowe ratio
test (reference src/main.cpp:158-175, ratio 0.75 tracking / 0.7 loop
closure, src/legacy/LoopClosure.cpp:92).

The trick (SURVEY.md §2.1, BASELINE.json north star): with bits stored
as {0,1} int8 vectors a, b of length 256,

    hamming(a, b) = popcount(a) + popcount(b) - 2 * a . b

so the full K x K distance matrix is ONE int8 matmul on the systolic
array plus rank-1 corrections — the entire brute-force match is
matmul-shaped. Top-2 selection + ratio test fuse into the same program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aria_slam_tpu.core.types import Features, Matches

_BIG = jnp.int32(1 << 20)


def hamming_matrix(
    desc_q: jnp.ndarray, desc_t: jnp.ndarray, valid_t: jnp.ndarray | None = None
) -> jnp.ndarray:
    """(Kq, B) x (Kt, B) {0,1} int8 -> (Kq, Kt) int32 Hamming distances.

    Invalid train columns get a large sentinel distance.

    The dot runs as a bf16 matmul with f32 accumulation at DEFAULT
    precision: bits are 0/1, so every product and every partial sum
    (<= 256) is exactly representable — bit-exact Hamming at full MXU
    rate. (int8->int32 dots and precision=highest f32 dots do NOT hit
    this stack's MXU fast path: measured 292 ms / 171 ms vs 0.8 ms for
    a 2048x2048x256 tile.)
    """
    dots = jax.lax.dot_general(
        desc_q.astype(jnp.bfloat16),
        desc_t.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (Kq, Kt) exact counts in f32
    dots = dots.astype(jnp.int32)
    pop_q = jnp.sum(desc_q.astype(jnp.int32), axis=1)  # (Kq,)
    pop_t = jnp.sum(desc_t.astype(jnp.int32), axis=1)  # (Kt,)
    dist = pop_q[:, None] + pop_t[None, :] - 2 * dots
    if valid_t is not None:
        dist = jnp.where(valid_t[None, :], dist, _BIG)
    return dist


_CLIP = jnp.int32(1 << 10)  # > max Hamming (256); marks invalid entries
_IDX_BITS = 20              # supports up to 2^20 train columns


def top2_min(dist: jnp.ndarray, axis: int = -1):
    """Two smallest values + index of the smallest along `axis`.

    Implemented as packed (value << 20 | index) min-reductions: both
    lax.top_k (sort network: ~100 s compile, slow runtime) and argmin
    lower poorly on this stack, while plain min reductions are fast.
    Values are clipped to the sentinel _BIG semantics: any entry
    >= 1024 (i.e. masked-invalid) keeps reporting as _BIG.
    """
    axis = axis % dist.ndim
    n = dist.shape[axis]
    assert n < (1 << _IDX_BITS)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, axis)
    clipped = jnp.minimum(dist, _CLIP)
    packed = (clipped << _IDX_BITS) | cols
    m1 = jnp.min(packed, axis=axis)
    best_idx = m1 & ((1 << _IDX_BITS) - 1)
    best_c = m1 >> _IDX_BITS
    mask = cols == jnp.expand_dims(best_idx, axis)
    m2 = jnp.min(jnp.where(mask, jnp.int32(0x7FFFFFFF), packed), axis=axis)
    second_c = m2 >> _IDX_BITS
    best = jnp.where(best_c >= _CLIP, _BIG, best_c)
    second = jnp.where(second_c >= _CLIP, _BIG, second_c)
    return best, second, best_idx


def match(
    query: Features,
    train: Features,
    ratio: float = 0.75,
    cross_check: bool = False,
) -> Matches:
    """kNN(k=2) + ratio test over padded feature sets."""
    from aria_slam_tpu.ops.fast import use_pallas

    if use_pallas() and not cross_check:
        from aria_slam_tpu.ops.pallas.match_kernel import match_top2

        best, second, best_idx = match_top2(query.desc, train.desc, train.valid)
        dist = None
    else:
        dist = hamming_matrix(query.desc, train.desc, train.valid)  # (Kq, Kt)
        best, second, best_idx = top2_min(dist)

    ok = (
        query.valid
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
        & (best < _BIG)
    )
    if cross_check:
        # train's best query must be this query (mutual nearest)
        _, _, train_best_q = top2_min(
            jnp.where(query.valid[:, None], dist, _BIG), axis=0
        )  # (Kt,)
        kq = query.desc.shape[0]
        mutual = train_best_q[best_idx] == jnp.arange(kq)
        ok = ok & mutual

    return Matches(
        query_idx=jnp.arange(query.desc.shape[0], dtype=jnp.int32),
        train_idx=best_idx.astype(jnp.int32),
        distance=best.astype(jnp.float32),
        valid=ok,
    )


def match_batched_raw(query: Features, train: Features):
    """Batched kNN(k=2) WITHOUT the ratio gate: (best, second, best_idx)
    each (C, Kq). One Hamming pass can then serve several consumers with
    different gates — e.g. a strict Lowe 0.75 tier for RANSAC and a
    loose epipolar-gated tier for feature tracks (chunk BA), where
    recall matters more than per-match precision (measured: ratio 0.75
    keeps ~110/384 links per pair at 97% precision, 0.92 + a 2 px
    epipolar gate keeps ~190 at comparable precision once the pair's
    geometry is known)."""
    from aria_slam_tpu.ops.fast import use_pallas

    if use_pallas():
        from aria_slam_tpu.ops.pallas.match_kernel import match_top2_batched

        return match_top2_batched(query.desc, train.desc, train.valid)

    def one(q, t):
        dist = hamming_matrix(q.desc, t.desc, t.valid)
        return top2_min(dist)

    return jax.vmap(one)(query, train)


def ratio_gate(query_valid, best, second, ratio: float):
    """The Lowe ratio test as a standalone gate over match_batched_raw
    outputs."""
    return (query_valid
            & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
            & (best < _BIG))


def match_batched(query: Features, train: Features, ratio: float = 0.75) -> Matches:
    """kNN(k=2) + ratio test over Features with a leading batch axis
    (one entry per frame pair). Uses the batched fused Pallas kernel on
    TPU; vmapped XLA elsewhere."""
    from aria_slam_tpu.ops.fast import use_pallas

    if use_pallas():
        from aria_slam_tpu.ops.pallas.match_kernel import match_top2_batched

        best, second, best_idx = match_top2_batched(
            query.desc, train.desc, train.valid
        )
        n, kq = best.shape
        ok = (
            query.valid
            & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
            & (best < _BIG)
        )
        qidx = jnp.broadcast_to(jnp.arange(kq, dtype=jnp.int32)[None], (n, kq))
        return Matches(query_idx=qidx, train_idx=best_idx.astype(jnp.int32),
                       distance=best.astype(jnp.float32), valid=ok)
    return jax.vmap(lambda q, t: match(q, t, ratio))(query, train)


def match_scores_vs_database(
    desc_q: jnp.ndarray,
    valid_q: jnp.ndarray,
    db_desc: jnp.ndarray,
    db_valid: jnp.ndarray,
    ratio: float = 0.7,
) -> jnp.ndarray:
    """Loop-closure place-recognition scores: one query frame vs the whole
    keyframe database in a single fused pass (the H14 GPU batch-matcher
    design done as one MXU matmul; reference
    docs/milestones/H14_GPU_LOOPCLOSURE_AUDIT.md via SURVEY.md row 22).

    desc_q: (F, B) int8; db_desc: (N, F, B) int8; db_valid: (N, F) bool.
    Returns (N,) float32 score = (#ratio-test survivors) / (#valid query kps)
    (reference score definition: src/legacy/LoopClosure.cpp:72-114).
    """
    n, f, b = db_desc.shape
    flat = db_desc.reshape(n * f, b)
    dist = hamming_matrix(desc_q, flat, db_valid.reshape(n * f))  # (F, N*F)
    dist = dist.reshape(desc_q.shape[0], n, f)  # (F_q, N, F_t)
    best, second, _ = top2_min(dist, axis=-1)
    good = (
        valid_q[:, None]
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
        & (best < _BIG)
    )
    num_q = jnp.maximum(jnp.sum(valid_q.astype(jnp.float32)), 1.0)
    return jnp.sum(good.astype(jnp.float32), axis=0) / num_q  # (N,)
