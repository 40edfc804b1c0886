"""Lie-group primitives vs scipy oracles and round-trip identities.

float32 throughout (TPU native dtype); tolerances are angle-aware —
near-pi rotations lose a few digits in mat->quat extraction, which is
irrelevant for SLAM's small frame-to-frame motions but checked loosely
anyway.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from aria_slam_tpu.core import lie


def random_rotvecs(seed, n=64, max_angle=3.0):
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    out = axes * angles
    out[0] = 0.0  # identity case
    out[1] = [1e-9, 0, 0]  # near-identity case
    return out.astype(np.float32)


def test_so3_exp_matches_scipy():
    phi = random_rotvecs(1)
    R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    R_ref = Rotation.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_log_roundtrip_small_angles():
    phi = random_rotvecs(2, max_angle=1.0)
    phi_rt = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(phi))))
    np.testing.assert_allclose(phi_rt, phi, atol=2e-4)


def test_so3_log_roundtrip_large_angles():
    phi = random_rotvecs(3, max_angle=3.1)
    phi_rt = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(phi))))
    np.testing.assert_allclose(phi_rt, phi, atol=2e-2)


def test_quat_mat_roundtrip():
    phi = random_rotvecs(4)
    q = lie.so3_exp_quat(jnp.asarray(phi))
    R = lie.quat_to_mat(q)
    q2 = lie.mat_to_quat(R)
    R2 = lie.quat_to_mat(q2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_quat_rotate_matches_matrix():
    phi = random_rotvecs(5)
    rng = np.random.default_rng(6)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    q = lie.so3_exp_quat(jnp.asarray(phi))
    out_q = np.asarray(lie.quat_rotate(q, jnp.asarray(v)))
    out_m = np.einsum("nij,nj->ni", np.asarray(lie.so3_exp(jnp.asarray(phi))), v)
    np.testing.assert_allclose(out_q, out_m, atol=1e-4)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(7)
    xi = rng.normal(size=(64, 6)).astype(np.float32)
    xi[:, 3:] = random_rotvecs(8, max_angle=2.5)
    T = lie.se3_exp(jnp.asarray(xi))
    xi_rt = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(xi_rt, xi, atol=5e-3)


def test_se3_exp_log_roundtrip_small():
    rng = np.random.default_rng(9)
    xi = 0.1 * rng.normal(size=(64, 6)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    xi_rt = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(xi_rt, xi, atol=2e-4)


def test_se3_inverse():
    rng = np.random.default_rng(10)
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    eye = np.asarray(T @ lie.se3_inverse(T))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-4)


def test_quat_mul_matches_scipy():
    phi = random_rotvecs(11, 16)
    psi = random_rotvecs(12, 16)
    qa = lie.so3_exp_quat(jnp.asarray(phi))
    qb = lie.so3_exp_quat(jnp.asarray(psi))
    q_ab = np.asarray(lie.quat_mul(qa, qb))
    R_ref = Rotation.from_rotvec(phi).as_matrix() @ Rotation.from_rotvec(psi).as_matrix()
    np.testing.assert_allclose(np.asarray(lie.quat_to_mat(jnp.asarray(q_ab))), R_ref, atol=1e-4)
