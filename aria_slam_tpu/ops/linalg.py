"""Small batched linear algebra, unrolled for the TPU.

jnp.linalg.{eigh, cholesky, svd} on tiny batched matrices lower to
sequential sweep loops on this stack (30-400 ms latency for 256x9x9 —
measured); the SLAM hot path only needs fixed tiny sizes, so everything
here is statically unrolled into a handful of batched vector ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_unrolled(M: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky of SPD (..., n, n), n static and small.

    Unrolled column-by-column: n steps of batched broadcasts, no loops
    in the compiled program.
    """
    n = M.shape[-1]
    cols = []
    for j in range(n):
        s = M[..., :, j]
        if j > 0:
            Lj = jnp.stack([c[..., j] for c in cols], -1)  # (..., j)
            Lprev = jnp.stack(cols, -1)                     # (..., n, j)
            s = s - jnp.einsum("...ik,...k->...i", Lprev, Lj)
        d = jnp.sqrt(jnp.maximum(s[..., j], 1e-20))
        col = s / d[..., None]
        # zero the strictly-upper part of this column
        row_idx = jnp.arange(n)
        col = jnp.where(row_idx >= j, col, 0.0)
        cols.append(col)
    return jnp.stack(cols, -1)  # (..., n, n) lower triangular


def solve_lower(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b, L (..., n, n) lower triangular, b (..., n)."""
    n = L.shape[-1]
    ys = []
    for i in range(n):
        s = b[..., i]
        if i > 0:
            yv = jnp.stack(ys, -1)  # (..., i)
            s = s - jnp.einsum("...k,...k->...", L[..., i, :i], yv)
        ys.append(s / L[..., i, i])
    return jnp.stack(ys, -1)


def solve_upper_t(L: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = y (L lower triangular)."""
    n = L.shape[-1]
    xs = [None] * n
    for i in reversed(range(n)):
        s = y[..., i]
        if i < n - 1:
            xv = jnp.stack(xs[i + 1:], -1)  # (..., n-1-i)
            s = s - jnp.einsum("...k,...k->...", L[..., i + 1:, i], xv)
        xs[i] = s / L[..., i, i]
    return jnp.stack(xs, -1)


def cholesky_solve(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve M x = b for SPD M (..., n, n)."""
    L = cholesky_unrolled(M)
    return solve_upper_t(L, solve_lower(L, b))


def smallest_eigvec(M: jnp.ndarray, iters: int = 8,
                    eps_scale: float = 1e-6) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric PSD
    (..., n, n) via regularized inverse iteration on an unrolled
    Cholesky factorization (factor once, `iters` solves)."""
    n = M.shape[-1]
    scale = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None] / n
    eps = eps_scale * jnp.maximum(scale, 1e-20)
    L = cholesky_unrolled(M + eps * jnp.eye(n, dtype=M.dtype))
    v = jnp.ones(M.shape[:-2] + (n,), M.dtype) + jnp.arange(n, dtype=M.dtype) * 0.1
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    for _ in range(iters):
        w = solve_upper_t(L, solve_lower(L, v))
        v = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-20)
    return v


def inv_psd(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of SPD (..., n, n) via unrolled Cholesky column solves."""
    n = M.shape[-1]
    L = cholesky_unrolled(M)
    eye = jnp.eye(n, dtype=M.dtype)
    cols = [solve_upper_t(L, solve_lower(L, jnp.broadcast_to(eye[i], M.shape[:-2] + (n,))))
            for i in range(n)]
    return jnp.stack(cols, -1)

def _jacobi_rotation(App, Aqq, Apq):
    """Givens (c, s) diagonalizing the 2x2 block [[App, Apq], [Apq, Aqq]]."""
    tau = (Aqq - App) / (2.0 * jnp.where(jnp.abs(Apq) < 1e-30, 1e-30, Apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(jnp.abs(Apq) < 1e-30, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    return c, t * c


def eigh3(M: jnp.ndarray, sweeps: int = 6):
    """Symmetric (..., 3, 3) eigendecomposition by statically-unrolled
    cyclic Jacobi. Returns (eigenvalues (...,3) ascending, eigenvectors
    (...,3,3) columns). jnp.linalg.eigh lowers to slow sequential sweeps
    on this stack; 6 unrolled sweeps are exact to f32 for 3x3.
    """
    A = M
    V = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape).copy()
    pairs = [(0, 1), (0, 2), (1, 2)]
    for _ in range(sweeps):
        for (p, q) in pairs:
            c, s = _jacobi_rotation(A[..., p, p], A[..., q, q], A[..., p, q])
            # J = I with J[p,p]=c, J[q,q]=c, J[p,q]=s, J[q,p]=-s
            J = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape).copy()
            J = J.at[..., p, p].set(c)
            J = J.at[..., q, q].set(c)
            J = J.at[..., p, q].set(s)
            J = J.at[..., q, p].set(-s)
            A = jnp.swapaxes(J, -1, -2) @ A @ J
            V = V @ J
    w = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], -1)
    # ascending sort of 3 values via min/max network (static)
    order = jnp.argsort(w, axis=-1)
    w_sorted = jnp.take_along_axis(w, order, -1)
    V_sorted = jnp.take_along_axis(V, order[..., None, :], -1)
    return w_sorted, V_sorted


def svd3(E: jnp.ndarray):
    """SVD of (..., 3, 3): returns (U, S, Vt) with S descending.

    Via eigh3 of E^T E (V, S^2) and U reconstructed column-wise with a
    cross-product fallback for the (near-)zero singular value — exactly
    the case for essential matrices.
    """
    w, V = eigh3(jnp.swapaxes(E, -1, -2) @ E)  # ascending
    # descending order
    w = w[..., ::-1]
    V = V[..., ::-1]
    S = jnp.sqrt(jnp.maximum(w, 0.0))
    EV = E @ V  # (..., 3, 3) columns = E v_i = s_i u_i
    u0 = EV[..., :, 0] / jnp.maximum(S[..., 0:1], 1e-20)
    u1 = EV[..., :, 1] / jnp.maximum(S[..., 1:2], 1e-20)
    # orthonormalize u1 against u0 (f32 safety), u2 from the cross product
    u1 = u1 - jnp.sum(u0 * u1, -1, keepdims=True) * u0
    u1 = u1 / jnp.maximum(jnp.linalg.norm(u1, axis=-1, keepdims=True), 1e-20)
    u2 = jnp.cross(u0, u1)
    # align u2 with E v2 when s2 is nonzero (the cross product fixes the
    # direction only up to sign; for rank-2 E the sign is free)
    ev2 = EV[..., :, 2]
    sgn = jnp.sign(jnp.sum(ev2 * u2, -1, keepdims=True))
    sgn = jnp.where(S[..., 2:3] < 1e-6 * jnp.maximum(S[..., 0:1], 1e-20),
                    1.0, jnp.where(sgn == 0.0, 1.0, sgn))
    u2 = u2 * sgn
    U = jnp.stack([u0, u1, u2], -1)
    return U, S, jnp.swapaxes(V, -1, -2)
