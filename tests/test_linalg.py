"""Unrolled batched linalg vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from aria_slam_tpu.ops import linalg as L


def spd(rng, n, batch=64):
    A = rng.normal(size=(batch, n, n)).astype(np.float32)
    return A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(n, dtype=np.float32)


def test_cholesky_matches_numpy():
    rng = np.random.default_rng(0)
    M = spd(rng, 9)
    Lo = np.asarray(L.cholesky_unrolled(jnp.asarray(M)))
    ref = np.linalg.cholesky(M)
    np.testing.assert_allclose(Lo, ref, atol=1e-3, rtol=1e-3)


def test_cholesky_solve():
    rng = np.random.default_rng(1)
    M = spd(rng, 6)
    b = rng.normal(size=(64, 6)).astype(np.float32)
    x = np.asarray(L.cholesky_solve(jnp.asarray(M), jnp.asarray(b)))
    ref = np.linalg.solve(M, b[..., None])[..., 0]
    np.testing.assert_allclose(x, ref, atol=1e-2, rtol=1e-2)


def test_smallest_eigvec():
    """Near-singular normal matrices (the actual 8-point use case:
    lambda_min ~ 0 with a clear gap)."""
    rng = np.random.default_rng(2)
    A = rng.normal(size=(64, 8, 9)).astype(np.float32)
    M = np.einsum("bki,bkj->bij", A, A)  # rank-8 PSD, nullspace dim 1
    v = np.asarray(L.smallest_eigvec(jnp.asarray(M)))
    w, vecs = np.linalg.eigh(M)
    ref = vecs[..., 0]
    cos = np.abs(np.sum(v * ref, -1))
    assert cos.min() > 0.999, cos.min()


def test_inv_psd():
    rng = np.random.default_rng(3)
    M = spd(rng, 6)
    inv = np.asarray(L.inv_psd(jnp.asarray(M)))
    np.testing.assert_allclose(
        inv @ M, np.broadcast_to(np.eye(6), (64, 6, 6)), atol=5e-3
    )


def test_eigh3_matches_numpy():
    rng = np.random.default_rng(4)
    M = spd(rng, 3)
    w, V = L.eigh3(jnp.asarray(M))
    w_ref, V_ref = np.linalg.eigh(M)
    np.testing.assert_allclose(np.asarray(w), w_ref, atol=1e-3, rtol=1e-3)
    cos = np.abs(np.einsum("bij,bij->bj", np.asarray(V), V_ref))
    assert cos.min() > 0.999


def test_svd3_matches_numpy():
    rng = np.random.default_rng(5)
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    # include a rank-2 (essential-like) case
    A[0] = A[0] - np.outer(A[0] @ np.linalg.svd(A[0])[2][2], np.linalg.svd(A[0])[2][2])
    U, S, Vt = L.svd3(jnp.asarray(A))
    U, S, Vt = np.asarray(U), np.asarray(S), np.asarray(Vt)
    # reconstruction + orthogonality + descending order
    rec = U * S[:, None, :] @ Vt
    np.testing.assert_allclose(rec, A, atol=5e-3)
    np.testing.assert_allclose(
        U @ np.swapaxes(U, -1, -2), np.broadcast_to(np.eye(3), (64, 3, 3)), atol=2e-3
    )
    assert (np.diff(S, axis=-1) <= 1e-4).all()
    S_ref = np.linalg.svd(A, compute_uv=False)
    np.testing.assert_allclose(S, S_ref, atol=1e-3, rtol=1e-3)
