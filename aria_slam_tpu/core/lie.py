"""SO(3)/SE(3)/quaternion operations, fully batched and jit-friendly.

These are the manifold primitives underneath the EKF (reference
src/legacy/IMU.cpp:10-26 expMap/logMap), the pose-graph optimizer
(reference src/legacy/LoopClosure.cpp:197-313) and pose accumulation
(reference src/euroc_eval.cpp:203-206). Everything broadcasts over
leading axes and is safe at the identity (Taylor-guarded).

Quaternion convention: (w, x, y, z), Hamilton, unit norm.
SE3 matrices are 4x4 row-major, world-from-camera unless noted.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8
# All norms/sqrts below are written to be *differentiation-safe*: the
# pose-graph optimizer takes jacfwd through se3_log/mat_to_quat, and a
# plain sqrt(0) or norm at the identity poisons the whole Jacobian with
# NaN via the 0 * inf where-branch trap. The tiny biases are below f32
# resolution and do not affect values.
_TINY = 1e-24


def _safe_norm(v, axis=-1, keepdims=False):
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims) + _TINY)


def skew(v):
    """(...,3) -> (...,3,3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


# ----------------------------------------------------------------- quaternions
def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(shape + (4,), dtype)
    return q.at[..., 0].set(1.0)


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        -1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_rotate(q, v):
    """Rotate vectors (...,3) by unit quaternions (...,4)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_mat(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1),
        ],
        -2,
    )


def mat_to_quat(R):
    """(...,3,3) -> (...,4). Shepperd's method, branchless via where."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _TINY))

    # four candidate constructions
    qw0 = safe_sqrt(1.0 + tr) / 2.0
    s0 = jnp.maximum(4.0 * qw0, _EPS)
    c0 = jnp.stack([qw0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)

    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    s1 = jnp.maximum(4.0 * qx1, _EPS)
    c1 = jnp.stack([(m21 - m12) / s1, qx1, (m01 + m10) / s1, (m02 + m20) / s1], -1)

    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    s2 = jnp.maximum(4.0 * qy2, _EPS)
    c2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, qy2, (m12 + m21) / s2], -1)

    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    s3 = jnp.maximum(4.0 * qz3, _EPS)
    c3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, qz3], -1)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        c0,
        jnp.where(cond1[..., None], c1, jnp.where(cond2[..., None], c2, c3)),
    )
    # canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


# ----------------------------------------------------------------------- SO(3)
def so3_exp_quat(phi):
    """Rotation vector (...,3) -> quaternion (...,4)."""
    angle = _safe_norm(phi, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-6
    sinc_half = jnp.where(small, 0.5 - angle**2 / 48.0, jnp.sin(half) / jnp.maximum(angle, _EPS))
    w = jnp.cos(half)
    xyz = phi * sinc_half
    return jnp.concatenate([w, xyz], -1)


def so3_log_quat(q):
    """Quaternion (...,4) -> rotation vector (...,3)."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # shortest arc
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn = _safe_norm(v, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn[..., 0], w)[..., None]
    small = vn < 1e-8
    scale = jnp.where(small, 2.0 / jnp.maximum(w[..., None], _EPS), angle / jnp.maximum(vn, _EPS))
    return v * scale


def so3_exp(phi):
    """Rotation vector (...,3) -> rotation matrix (...,3,3) (Rodrigues)."""
    angle = _safe_norm(phi)[..., None, None]
    K = skew(phi)
    K2 = K @ K
    small = angle < 1e-6
    a = jnp.where(small, 1.0 - angle**2 / 6.0, jnp.sin(angle) / jnp.maximum(angle, _EPS))
    b = jnp.where(small, 0.5 - angle**2 / 24.0, (1.0 - jnp.cos(angle)) / jnp.maximum(angle**2, _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R):
    """Rotation matrix -> rotation vector (via quaternion, stable everywhere)."""
    return so3_log_quat(mat_to_quat(R))


# ----------------------------------------------------------------------- SE(3)
def se3_matrix(R, t):
    """(...,3,3),(...,3) -> (...,4,4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], -1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), batch + (4,))
    return jnp.concatenate([top, bottom[..., None, :]], -2)


def se3_inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_matrix(Rt, -(Rt @ t[..., None])[..., 0])


def se3_exp(xi):
    """Twist (...,6) [rho, phi] -> (...,4,4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    angle = _safe_norm(phi)[..., None, None]
    K = skew(phi)
    K2 = K @ K
    small = angle < 1e-6
    b = jnp.where(small, 0.5 - angle**2 / 24.0, (1.0 - jnp.cos(angle)) / jnp.maximum(angle**2, _EPS))
    c = jnp.where(small, 1.0 / 6.0 - angle**2 / 120.0, (angle - jnp.sin(angle)) / jnp.maximum(angle**3, _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b * K + c * K2
    t = (V @ rho[..., None])[..., 0]
    return se3_matrix(R, t)


def se3_log(T):
    """(...,4,4) -> twist (...,6) [rho, phi]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = so3_log(R)
    angle = _safe_norm(phi)[..., None, None]
    K = skew(phi)
    K2 = K @ K
    small = angle < 1e-6
    # V^{-1} = I - K/2 + coef * K^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + angle**2 / 720.0,
        (1.0 - angle * jnp.cos(angle / 2.0) / jnp.maximum(2.0 * jnp.sin(angle / 2.0), _EPS))
        / jnp.maximum(angle**2, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    Vinv = eye - 0.5 * K + coef * K2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], -1)
