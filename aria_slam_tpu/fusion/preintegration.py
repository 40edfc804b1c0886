"""IMU preintegration (parity: reference IMUPreintegrator,
src/legacy/IMU.cpp:28-100, include/legacy/IMU.hpp:17-51).

Mid-point integration of (delta_p, delta_v, delta_q) between keyframes
with bias removal, dt gating (0 < dt <= 0.5 s) and 9x9 covariance
propagation over [dp, dv, dtheta]. Like the reference, noise densities
default to a typical MEMS IMU (accel 0.01, gyro 0.001).

TPU design: the integrator is a pure scan over a (possibly padded)
measurement window; `integrate_window` folds a whole IMU batch in one
jitted call, matching the reference's per-sample `integrate()` loop.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from aria_slam_tpu.core import lie


@flax.struct.dataclass
class PreintState:
    delta_p: jnp.ndarray   # (3,)
    delta_v: jnp.ndarray   # (3,)
    delta_q: jnp.ndarray   # (4,) (w, x, y, z)
    dt_sum: jnp.ndarray    # ()
    last_t: jnp.ndarray    # () — -1 before the first sample
    P: jnp.ndarray         # (9, 9) covariance over [dp, dv, dtheta]


def init_state(dtype=jnp.float32) -> PreintState:
    return PreintState(
        delta_p=jnp.zeros(3, dtype),
        delta_v=jnp.zeros(3, dtype),
        delta_q=lie.quat_identity(dtype=dtype),
        dt_sum=jnp.asarray(0.0, dtype),
        last_t=jnp.asarray(-1.0, dtype),
        P=jnp.zeros((9, 9), dtype),
    )


def integrate(state: PreintState, t, accel, gyro,
              accel_bias=None, gyro_bias=None,
              accel_noise: float = 0.01, gyro_noise: float = 0.001,
              max_dt: float = 0.5) -> PreintState:
    """One measurement (parity: IMUPreintegrator::integrate). Gated on
    dt <= max_dt and first-sample bootstrap."""
    dtype = state.delta_p.dtype
    ab = jnp.zeros(3, dtype) if accel_bias is None else accel_bias
    gb = jnp.zeros(3, dtype) if gyro_bias is None else gyro_bias

    dt = t - state.last_t
    first = state.last_t < 0
    ok = (~first) & (dt > 0) & (dt <= max_dt)
    dt = jnp.where(ok, dt, 0.0)

    a = accel - ab
    w = gyro - gb
    R = lie.quat_to_mat(state.delta_q)

    # mid-point: rotate with the half-step orientation
    dq_half = lie.so3_exp_quat(w * dt * 0.5)
    q_half = lie.quat_normalize(lie.quat_mul(state.delta_q, dq_half))
    a_frame = lie.quat_rotate(q_half, a)

    delta_p = state.delta_p + state.delta_v * dt + 0.5 * a_frame * dt * dt
    delta_v = state.delta_v + a_frame * dt
    dq = lie.so3_exp_quat(w * dt)
    delta_q = lie.quat_normalize(lie.quat_mul(state.delta_q, dq))

    # covariance propagation: F (9x9), G (9x6)
    eye3 = jnp.eye(3, dtype=dtype)
    F = jnp.eye(9, dtype=dtype)
    F = F.at[0:3, 3:6].set(eye3 * dt)
    F = F.at[3:6, 6:9].set(-R @ lie.skew(a) * dt)
    G = jnp.zeros((9, 6), dtype)
    G = G.at[3:6, 0:3].set(R * dt)
    G = G.at[6:9, 3:6].set(eye3 * dt)
    Q = jnp.diag(
        jnp.concatenate([
            jnp.full((3,), accel_noise**2, dtype),
            jnp.full((3,), gyro_noise**2, dtype),
        ])
    )
    P = F @ state.P @ F.T + G @ Q @ G.T

    return PreintState(
        delta_p=jnp.where(ok, delta_p, state.delta_p),
        delta_v=jnp.where(ok, delta_v, state.delta_v),
        delta_q=jnp.where(ok, delta_q, state.delta_q),
        dt_sum=state.dt_sum + dt,
        last_t=t,
        P=jnp.where(ok, P, state.P),
    )


def integrate_window(state: PreintState, ts, accels, gyros, valid,
                     accel_bias=None, gyro_bias=None, **kw) -> PreintState:
    """Fold a padded IMU window (parity: per-sample integrate loop)."""

    def body(s, inp):
        t, a, w, v = inp
        s_new = integrate(s, t, a, w, accel_bias, gyro_bias, **kw)
        s = jax.tree_util.tree_map(lambda n, o: jnp.where(v, n, o), s_new, s)
        return s, None

    state, _ = jax.lax.scan(body, state, (ts, accels, gyros, valid))
    return state
