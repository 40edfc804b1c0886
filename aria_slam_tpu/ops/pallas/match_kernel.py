"""Fused brute-force Hamming match: MXU matmul + in-VMEM top-2.

The XLA formulation writes the (K, K) int32 distance matrix to HBM and
reads it back twice for the packed top-2 (~48 MB of traffic per frame
pair). Here each query tile's distance block lives only in VMEM: one
bf16 MXU matmul against the full train descriptor set (which fits VMEM:
2048 x 256 bf16 = 1 MB) immediately followed by the packed
(value << 20 | index) min-reductions. Outputs are three (K,) vectors.

Semantics match ops.match.top2_min(hamming_matrix(...)) exactly
(bit-exact: 0/1 products and sums <= 256 are exact in bf16 x bf16 ->
f32 accumulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 256
_BIG = 1 << 20
_CLIP = 1 << 10
_IDX_BITS = 20


def _match_kernel(q_ref, t_ref, popq_ref, popt_ref, validt_ref,
                  best_ref, second_ref, idx_ref):
    q = q_ref[0]           # (TILE_Q, B) bf16
    t = t_ref[0]           # (Kt, B) bf16
    dots = jax.lax.dot_general(
        q, t, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(jnp.int32)    # (TILE_Q, Kt) exact counts
    dist = popq_ref[0] + popt_ref[0] - 2 * dots  # (TILE_Q,1)+(1,Kt) bcast
    dist = jnp.where(validt_ref[0] != 0, dist, _BIG)

    kt = dist.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    clipped = jnp.minimum(dist, _CLIP)
    packed = (clipped << _IDX_BITS) | cols
    m1 = jnp.min(packed, axis=1)
    bidx = m1 & ((1 << _IDX_BITS) - 1)
    bc = m1 >> _IDX_BITS
    mask = cols == bidx[:, None]
    m2 = jnp.min(jnp.where(mask, jnp.int32(0x7FFFFFFF), packed), axis=1)
    sc = m2 >> _IDX_BITS

    best_ref[0, 0, :] = jnp.where(bc >= _CLIP, _BIG, bc)
    second_ref[0, 0, :] = jnp.where(sc >= _CLIP, _BIG, sc)
    idx_ref[0, 0, :] = bidx


def match_top2_batched(desc_q: jnp.ndarray, desc_t: jnp.ndarray,
                       valid_t: jnp.ndarray):
    """(N, Kq, B), (N, Kt, B) {0,1} int8 + (N, Kt) bool ->
    (best, second, best_idx) each (N, Kq) int32. Natively batched over
    the leading pair axis (grid dim 0)."""
    n, kq, bits = desc_q.shape
    kt = desc_t.shape[1]
    kq_p = ((kq + TILE_Q - 1) // TILE_Q) * TILE_Q
    kt_p = ((kt + 127) // 128) * 128

    q = jnp.zeros((n, kq_p, bits), jnp.bfloat16).at[:, :kq].set(
        desc_q.astype(jnp.bfloat16))
    t = jnp.zeros((n, kt_p, bits), jnp.bfloat16).at[:, :kt].set(
        desc_t.astype(jnp.bfloat16))
    popq = jnp.zeros((n, kq_p), jnp.int32).at[:, :kq].set(
        jnp.sum(desc_q.astype(jnp.int32), -1))
    popt = jnp.zeros((n, kt_p), jnp.int32).at[:, :kt].set(
        jnp.sum(desc_t.astype(jnp.int32), -1))
    vt = jnp.zeros((n, kt_p), jnp.int32).at[:, :kt].set(valid_t.astype(jnp.int32))

    grid = (n, kq_p // TILE_Q)
    best, second, idx = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_Q, bits), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt_p, bits), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kt_p), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kt_p), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TILE_Q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_Q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_Q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, kq_p), jnp.int32),
            jax.ShapeDtypeStruct((n, 1, kq_p), jnp.int32),
            jax.ShapeDtypeStruct((n, 1, kq_p), jnp.int32),
        ],
    )(q, t, popq.reshape(n, kq_p, 1), popt.reshape(n, 1, kt_p),
      vt.reshape(n, 1, kt_p))
    return best[:, 0, :kq], second[:, 0, :kq], idx[:, 0, :kq]


def match_top2(desc_q: jnp.ndarray, desc_t: jnp.ndarray,
               valid_t: jnp.ndarray):
    """(Kq, B), (Kt, B) single-pair wrapper."""
    b, s, i = match_top2_batched(desc_q[None], desc_t[None], valid_t[None])
    return b[0], s[0], i[0]
