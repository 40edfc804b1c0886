"""Batched two-view triangulation (parity: cv::triangulatePoints DLT,
reference src/legacy/Mapper.cpp:43).

One vmapped 4x4 DLT per correspondence: A p = 0 with rows
u * P[2] - P[0], v * P[2] - P[1] from both views; solved by the
smallest eigenvector of A^T A (symmetric 4x4 eigh batches cleanly).

float32 conditioning: the DLT is solved in *normalized camera
coordinates* (K applied to the pixels, not to the projection matrices)
and with unit-normalized rows, keeping A^T A well-scaled — raw
pixel-space DLT loses ~3 digits in f32, which is fatal for the
2 px reprojection gate downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def projection_matrix(K: jnp.ndarray, T_cw: jnp.ndarray) -> jnp.ndarray:
    """P = K [R|t] from a camera-from-world transform (3x4)."""
    return K @ T_cw[:3, :4]


def _dlt(P1, P2, p1, p2):
    """Generic DLT on (3,4) projections and (N,2) image coords."""

    from aria_slam_tpu.ops.linalg import smallest_eigvec

    def build_A(a, b):
        A = jnp.stack(
            [
                a[0] * P1[2] - P1[0],
                a[1] * P1[2] - P1[1],
                b[0] * P2[2] - P2[0],
                b[1] * P2[2] - P2[1],
            ]
        )  # (4, 4)
        return A / jnp.maximum(jnp.linalg.norm(A, axis=1, keepdims=True), 1e-12)

    A = jax.vmap(build_A)(p1, p2)          # (N, 4, 4)
    AtA = jnp.einsum("nki,nkj->nij", A, A)  # (N, 4, 4)
    X = smallest_eigvec(AtA)               # (N, 4) — unrolled batched solve
    w = X[:, 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-10, 1e-10, w)
    return X[:, :3] / safe_w[:, None]


def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray,
                    uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """P1, P2: (3, 4) pixel projections; uv1, uv2: (N, 2) pixels.
    Returns (N, 3) world points. Prefer `triangulate_calibrated`."""
    return _dlt(P1, P2, uv1, uv2)


def triangulate_calibrated(K: jnp.ndarray, T1_cw: jnp.ndarray, T2_cw: jnp.ndarray,
                           uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """Well-conditioned f32 path: normalize pixels by K, use [R|t] directly."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def norm(uv):
        return jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)

    return _dlt(T1_cw[:3, :4], T2_cw[:3, :4], norm(uv1), norm(uv2))
