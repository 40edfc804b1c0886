"""Visual-inertial alignment (fusion/vi_init.py): metric scale +
gravity recovery from analytic IMU against deliberately mis-scaled VO.

The analytic IMU mirrors io/synthetic_scene.generate()'s derivation
(specific force + body rates by finite differences on the exact
trajectory), so the recovered scale/gravity have a known ground truth.
"""

import numpy as np
import pytest

from aria_slam_tpu.fusion import vi_init
from aria_slam_tpu.io.synthetic_scene import trajectory

FPS = 10.0
IMU_HZ = 200.0
PERIOD = 8.0  # short period -> ~1.2 m/s^2 excitation (scale observable)


def _analytic_imu(t_lo, t_hi, seed=0, noise=True):
    n = int((t_hi - t_lo) * IMU_HZ)
    ti = t_lo + np.arange(1, n + 1) / IMU_HZ
    dt = 1e-4
    pos_p, _ = trajectory(ti - dt, period=PERIOD)
    pos_c, R_c = trajectory(ti, period=PERIOD)
    pos_n, R_n = trajectory(ti + dt, period=PERIOD)
    acc_w = (pos_n - 2 * pos_c + pos_p) / dt**2
    g = np.array([0.0, 0.0, -vi_init.GRAVITY])
    f_body = np.einsum("nji,nj->ni", R_c, acc_w - g)
    pos_pp, R_p = trajectory(ti - dt, period=PERIOD)
    dR = np.einsum("nji,njk->nik", R_c, (R_n - R_p) / (2 * dt))
    gyro = np.stack([dR[:, 2, 1], dR[:, 0, 2], dR[:, 1, 0]], -1)
    if noise:
        rng = np.random.default_rng(seed + 1)
        f_body = f_body + rng.normal(0, 0.005, f_body.shape)
        gyro = gyro + rng.normal(0, 0.0005, gyro.shape)
    return ti, f_body, gyro


def _frames(n_frames, t_lo=0.0):
    ts = t_lo + np.arange(n_frames) / FPS
    pos, R = trajectory(ts, period=PERIOD)
    return ts, pos, R


@pytest.mark.parametrize("s_true", [2.5, 0.4])
def test_align_recovers_scale_and_gravity(s_true):
    ts, pos, R = _frames(32)
    imu_ts, accel, gyro = _analytic_imu(-0.5, ts[-1] + 0.1)
    vo_pos = pos / s_true  # VO under/over-scaled by s_true
    dp, dv, dts, ok = vi_init.preintegrate_pairs(imu_ts, accel, gyro, ts)
    assert ok.all()
    assert np.allclose(dts, 1.0 / FPS, atol=1e-3)
    rep = vi_init.align(vo_pos, R[:-1], dp, dv, dts, ok)
    assert rep["ok"]
    assert rep["s"] == pytest.approx(s_true, rel=0.05), rep
    g = rep["g"]
    assert np.linalg.norm(g) == pytest.approx(vi_init.GRAVITY, rel=0.02)
    assert g[2] < -0.97 * vi_init.GRAVITY  # direction: -z
    assert rep["excitation"] > 0.1


def test_align_velocities_match_analytic():
    ts, pos, R = _frames(32)
    imu_ts, accel, gyro = _analytic_imu(-0.5, ts[-1] + 0.1, noise=False)
    dp, dv, dts, ok = vi_init.preintegrate_pairs(imu_ts, accel, gyro, ts)
    rep = vi_init.align(pos, R[:-1], dp, dv, dts, ok)
    dt = 1e-4
    pos_n, _ = trajectory(ts + dt, period=PERIOD)
    pos_p, _ = trajectory(ts - dt, period=PERIOD)
    v_true = (pos_n - pos_p) / (2 * dt)
    err = np.linalg.norm(rep["v"] - v_true, axis=1)
    assert err.mean() < 0.05, err.mean()


def test_align_underdetermined_window_gated():
    ts, pos, R = _frames(6)
    rep = vi_init.align(pos, R[:-1], np.zeros((5, 3)), np.zeros((5, 3)),
                        np.full(5, 0.1), np.zeros(5, bool))
    assert not rep["ok"]


def test_consensus_rejects_scattered_marginal_solves(monkeypatch):
    """The round-3 rotloop failure mode: low-excitation windows pass
    the per-solve gates marginally (s_rel_std just under 0.45) yet
    scatter wildly (s = 0.26..1.02) — ONE such solve must not move the
    correction (measured regression: corr jumped to 0.69, ATE
    0.30 -> 0.39). Scripted align() reports drive the estimator: a
    stream of mutually inconsistent marginal solves never commits; a
    consistent confident stream commits immediately."""
    scripted = {"reports": []}

    def fake_align(pos, rwb, dp, dv, dts, ok, refine_gravity=True,
                   t_sel=None):
        rep = scripted["reports"].pop(0)
        return {"s": rep[0], "g": np.array([0.0, 0.0, -vi_init.GRAVITY]),
                "v": np.zeros((len(pos), 3)), "residual": 1.0,
                "n_pairs": 30, "excitation": 0.3, "s_rel_std": rep[1],
                "g_err": 0.1, "ok": True}

    def fake_preint(imu_ts, imu_accel, imu_gyro, ts, **kw):
        p = len(ts) - 1
        return (np.zeros((p, 3), np.float32), np.zeros((p, 3), np.float32),
                np.full(p, 0.1, np.float32), np.ones(p, bool))

    monkeypatch.setattr(vi_init, "align", fake_align)
    monkeypatch.setattr(vi_init, "preintegrate_pairs", fake_preint)

    def drive(reports):
        scripted["reports"] = list(reports)
        est = vi_init.ScaleEstimator(window=8, min_fill=0.5)
        corr = 1.0
        # solves start once the window holds 7 frames (min_fill floor):
        # 6 warmup frames, then exactly one solve per scripted report
        for k in range(6 + len(reports)):
            ts = np.array([0.1 * k])
            T = np.eye(4)[None].copy()
            T[0, :3, 3] = [0.01 * k, 0.0, 0.0]
            corr = est.update(ts, T, np.zeros(0), np.zeros((0, 3)),
                              np.zeros((0, 3)))
        return corr, est

    # rotloop regime: marginal sigmas, wildly scattered s -> no commit
    corr, est = drive([(0.69, 0.431), (0.26, 0.40), (1.02, 0.38),
                       (0.45, 0.42), (0.80, 0.44)])
    assert corr == 1.0, corr
    assert est.last["consensus_rel_std"] > est.commit_rel_std

    # sweep regime: one confident solve -> immediate VINS-style jump
    corr, _ = drive([(2.0, 0.08), (2.05, 0.09)])
    assert corr == pytest.approx(2.0, rel=0.05), corr

    # agreement between marginal solves DOES eventually commit
    corr, _ = drive([(2.0, 0.30)] * 8)
    assert corr == pytest.approx(2.0, rel=0.05), corr


def test_scale_estimator_converges_chunked():
    """Feed mis-scaled poses chunk by chunk; the cumulative correction
    must converge to the true factor (and stay there)."""
    ts, pos, R = _frames(96)
    imu_ts, accel, gyro = _analytic_imu(-0.5, ts[-1] + 0.1)
    s_true = 3.0
    est = vi_init.ScaleEstimator(window=48, ema=0.5)
    corr = 1.0
    prod = pos[0] / s_true  # position the chain last produced
    for k in range(0, 96, 8):
        # poses the chain would produce: raw VO increments (1/s_true),
        # each scaled by the correction active when it was produced
        sl = range(k, min(k + 8, 96))
        T = np.tile(np.eye(4, dtype=np.float64), (len(sl), 1, 1))
        for j, i in enumerate(sl):
            if i > 0:
                prod = prod + (pos[i] - pos[i - 1]) / s_true * corr
            T[j, :3, 3] = prod
            T[j, :3, :3] = R[i]
        corr = est.update(ts[list(sl)], T, imu_ts, accel, gyro)
    assert corr == pytest.approx(s_true, rel=0.10), corr
