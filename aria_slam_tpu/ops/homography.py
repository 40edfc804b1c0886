"""Homography estimation + planar-degeneracy rescue for two-view VO.

A dominant scene plane (wall, floor — most of EuRoC's machine hall, and
most indoor scenes) breaks essential-matrix RANSAC: every E in the
one-parameter family compatible with the plane's homography fits the
coplanar points perfectly, so the consensus picks a DEGENERATE E whose
translation direction is arbitrary, and marks the informative
off-plane points as outliers (measured ~60 deg direction error with
sub-0.3 px correspondences on wall-dominated frames — for this
framework's VO and for the reference's cv::findEssentialMat alike; the
reference has no guard for this).

The rescue uses the planar structure instead of fighting it: for a
calibrated homography, H = R + t n̄^T (n̄ = n/d) — 8 dof, exactly
observable. The ROTATION from E remains accurate even in the
degenerate case (the ambiguity family shares R), so:

    H_normalized - R = t n̄^T   (exactly rank 1)

and the dominant left singular vector of that 3x3 difference IS the
translation direction. One svd3, no 8-solution Faugeras enumeration.
Sign is fixed by cheirality. Applied only when the homography explains
(almost) the whole match set — the signature of plane dominance.

TPU shape: 4-point DLT hypotheses are vmapped 9x9 smallest-eigenvector
problems (same unrolled inverse-iteration machinery as the 8-point),
scoring is one batched matmul, the decomposition is a single svd3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aria_slam_tpu.ops.epipolar import (
    _homog, _sample_indices, smallest_eigvec_9, triangulate_depths,
)


def _h_normal_matrix(p1, p2, w):
    """A^T W A for the DLT system rows of ||x2 x (H x1)|| = 0.

    p1, p2: (N, 2) normalized coords, w: (N,) weights. (9, 9)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    zeros = jnp.zeros_like(x1)
    r1 = jnp.stack([-x1, -y1, -ones, zeros, zeros, zeros,
                    x2 * x1, x2 * y1, x2], -1)
    r2 = jnp.stack([zeros, zeros, zeros, -x1, -y1, -ones,
                    y2 * x1, y2 * y1, y2], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], 0)  # (2N, 9)
    Araw = jnp.concatenate([r1, r2], 0)
    return A.T @ Araw


def dlt_homography(p1, p2, w):
    """Weighted DLT estimate of H (normalized coords)."""
    AtA = _h_normal_matrix(p1, p2, w)
    return smallest_eigvec_9(AtA).reshape(3, 3)


def transfer_error(H, p1, p2):
    """Squared forward transfer error |pi(H x1) - p2|^2 (N,) in
    normalized coords."""
    x1 = _homog(p1)
    Hx = x1 @ H.T
    z = Hx[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    d = Hx[:, :2] / zs[:, None] - p2
    return jnp.sum(d * d, -1)


def estimate_homography(p1, p2, valid, key, num_hypotheses: int,
                        thresh_sq, refine: bool = True):
    """RANSAC H from padded correspondences.

    Returns (H, inlier_mask, score). Same conventions as the essential
    RANSAC (epipolar.estimate_relative_pose): fixed hypothesis count,
    vmapped minimal solves, one weighted refit over the consensus."""
    validf = valid.astype(jnp.float32)
    idx = _sample_indices(key, valid, num_hypotheses, 4)  # (H, 4)

    def solve_one(sample_idx):
        return dlt_homography(p1[sample_idx], p2[sample_idx],
                              jnp.ones(4, p1.dtype))

    Hs = jax.vmap(solve_one)(idx)
    errs = jax.vmap(lambda H: transfer_error(H, p1, p2))(Hs)  # (H, N)
    inl = (errs < thresh_sq).astype(jnp.float32) * validf[None]
    scores = jnp.sum(inl, -1)
    best = jnp.argmax(scores)
    H_best = Hs[best]
    mask = inl[best] > 0

    if refine:
        H_ref = dlt_homography(p1, p2, mask.astype(p1.dtype))
        inl_ref = (transfer_error(H_ref, p1, p2) < thresh_sq) & valid
        better = jnp.sum(inl_ref) >= jnp.sum(mask)
        H_best = jnp.where(better, H_ref, H_best)
        mask = jnp.where(better, inl_ref, mask)

    return H_best, mask, jnp.sum(mask.astype(jnp.int32))


def decompose_homography(H):
    """Faugeras-Lustman analytic decomposition of a calibrated
    homography into 8 (R, t, n) candidates (the classic two physical +
    mirror solutions; parity with cv::decomposeHomographyMat, which the
    reference never needed because it never handled plane dominance).

    Returns (Rs (8,3,3), ts (8,3) unit-ish, ns (8,3), strength ()) —
    `strength` = (d1-d3)/d2, ~|t|/d: near zero for a pure rotation,
    where the plane observes no translation at all."""
    from aria_slam_tpu.ops.linalg import svd3

    U, S, Vt = svd3(H)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = S[0] / S[1], 1.0, S[2] / S[1]

    eps = 1e-9
    denom = jnp.maximum(d1 * d1 - d3 * d3, eps)
    aux1 = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / denom)
    aux3 = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / denom)
    e1 = jnp.array([1.0, 1.0, -1.0, -1.0], H.dtype)
    e3 = jnp.array([1.0, -1.0, 1.0, -1.0], H.dtype)
    x1 = e1 * aux1                                 # (4,)
    x3 = e3 * aux3

    # case d' = +d2
    st_aux = (jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2)
                                   * (d2 * d2 - d3 * d3), 0.0))
              / jnp.maximum((d1 + d3) * d2, eps))
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    st = e1 * e3 * st_aux                          # (4,) sign eps1*eps3

    def rp_pos(c, sn):
        return jnp.array([[c, 0.0, -sn], [0.0, 1.0, 0.0], [sn, 0.0, c]],
                         H.dtype)

    Rp_pos = jax.vmap(rp_pos)(jnp.full(4, ct), st)             # (4, 3, 3)
    tp_pos = (d1 - d3) * jnp.stack([x1, jnp.zeros(4), -x3], -1)  # (4, 3)

    # case d' = -d2 (mirror)
    sp_aux = (jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2)
                                   * (d2 * d2 - d3 * d3), 0.0))
              / jnp.maximum(jnp.abs(d1 - d3) * d2, eps))
    cp = (d1 * d3 - d2 * d2) / jnp.maximum(jnp.abs(d1 - d3) * d2, eps)
    sp = e1 * e3 * sp_aux

    def rp_neg(c, sn):
        return jnp.array([[c, 0.0, sn], [0.0, -1.0, 0.0], [sn, 0.0, -c]],
                         H.dtype)

    Rp_neg = jax.vmap(rp_neg)(jnp.full(4, cp), sp)
    tp_neg = (d1 + d3) * jnp.stack([x1, jnp.zeros(4), x3], -1)

    Rp = jnp.concatenate([Rp_pos, Rp_neg], 0)      # (8, 3, 3)
    tp = jnp.concatenate([tp_pos, tp_neg], 0)      # (8, 3)
    npl = jnp.stack([x1, jnp.zeros(4), x3], -1)
    npl = jnp.concatenate([npl, npl], 0)           # (8, 3)

    Rs = s * jnp.einsum("ab,kbc,cd->kad", U, Rp, Vt)
    ts = jnp.einsum("ab,kb->ka", U, tp)
    ns = jnp.einsum("ab,kb->ka", V, npl)
    return Rs, ts, ns, (d1 - d3)


def best_h_motion(H, R_hint, p1, p2, w):
    """Pick the physical (R, t) among the 8 homography decompositions:
    maximize cheirality support, tie-broken toward the essential-matrix
    rotation hint (accurate even under plane degeneracy — the ambiguity
    family shares R). Returns (R, t_unit, strength)."""
    Rs, ts, ns, strength = decompose_homography(H)
    tn = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-9)

    def score(Rk, tk):
        z1, z2 = triangulate_depths(Rk, tk, p1, p2)
        front = jnp.sum(((z1 > 0) & (z2 > 0)).astype(jnp.float32) * w)
        # rotation distance to the hint as a small tie-break
        cos = 0.5 * (jnp.trace(Rk @ R_hint.T) - 1.0)
        return front + cos

    scores = jax.vmap(score)(Rs, tn)
    k = jnp.argmax(scores)
    return Rs[k], tn[k], strength
