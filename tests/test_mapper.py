"""Triangulation + map filters vs synthetic geometry and OpenCV oracle."""

import numpy as np
import cv2
import jax.numpy as jnp

from aria_slam_tpu.config import MapperConfig
from aria_slam_tpu.core import lie
from aria_slam_tpu.mapping import mapper, export
from aria_slam_tpu.ops.triangulate import (
    projection_matrix,
    triangulate_calibrated,
    triangulate_dlt,
)

K = np.array([[458.0, 0, 376.0], [0, 457.0, 240.0], [0, 0, 1.0]], np.float32)
CFG = MapperConfig(max_points=4096)


def two_view_scene(seed=0, n=128, baseline=0.5):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-4, -3, 4], [4, 3, 20], size=(n, 3)).astype(np.float32)
    T1 = np.eye(4, dtype=np.float32)  # camera-from-world
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, 3] = [-baseline, 0, 0]  # camera 2 shifted +x in world

    def project(T):
        Xc = pts @ T[:3, :3].T + T[:3, 3]
        uv = Xc[:, :2] / Xc[:, 2:3]
        return (uv * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]).astype(np.float32)

    return pts, T1, T2, project(T1), project(T2)


def test_dlt_matches_opencv():
    pts, T1, T2, uv1, uv2 = two_view_scene()
    P1 = np.asarray(projection_matrix(jnp.asarray(K), jnp.asarray(T1)))
    P2 = np.asarray(projection_matrix(jnp.asarray(K), jnp.asarray(T2)))
    ours = np.asarray(
        triangulate_calibrated(jnp.asarray(K), jnp.asarray(T1), jnp.asarray(T2),
                               jnp.asarray(uv1), jnp.asarray(uv2))
    )
    X4 = cv2.triangulatePoints(P1.astype(np.float64), P2.astype(np.float64),
                               uv1.T.astype(np.float64), uv2.T.astype(np.float64))
    ref = (X4[:3] / X4[3]).T
    np.testing.assert_allclose(ours, ref, atol=2e-2)
    np.testing.assert_allclose(ours, pts, atol=2e-2)
    # raw pixel-space DLT also works, just with looser f32 tolerance
    raw = np.asarray(triangulate_dlt(jnp.asarray(P1), jnp.asarray(P2),
                                     jnp.asarray(uv1), jnp.asarray(uv2)))
    np.testing.assert_allclose(raw, pts, atol=0.5)


def test_filters_accept_good_points():
    pts, T1, T2, uv1, uv2 = two_view_scene()
    m = mapper.init_map(CFG)
    m = mapper.add_from_matches(
        m, jnp.asarray(K), jnp.asarray(T1), jnp.asarray(T2),
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool), None, CFG,
    )
    assert int(m.count) > 100, f"only {int(m.count)} of 128 survived"
    live = np.asarray(m.points)[np.asarray(m.valid)]
    # triangulated points match the scene
    d = np.linalg.norm(live[:, None] - pts[None], axis=-1).min(1)
    assert d.max() < 0.1


def test_filters_reject_outliers():
    pts, T1, T2, uv1, uv2 = two_view_scene()
    rng = np.random.default_rng(1)
    bad = rng.choice(len(uv1), 40, replace=False)
    uv2_bad = uv2.copy()
    uv2_bad[bad] += rng.uniform(20, 80, size=(40, 2)).astype(np.float32)
    m = mapper.init_map(CFG)
    m = mapper.add_from_matches(
        m, jnp.asarray(K), jnp.asarray(T1), jnp.asarray(T2),
        jnp.asarray(uv1), jnp.asarray(uv2_bad), jnp.ones(len(uv1), bool), None, CFG,
    )
    # corrupted correspondences fail the reprojection gate
    assert int(m.count) <= len(uv1) - 35


def test_too_few_matches_adds_nothing():
    """Parity: triangulate() requires >= 8 matches (Mapper.cpp:13)."""
    pts, T1, T2, uv1, uv2 = two_view_scene()
    valid = np.zeros(len(uv1), bool)
    valid[:5] = True
    m = mapper.init_map(CFG)
    m = mapper.add_from_matches(
        m, jnp.asarray(K), jnp.asarray(T1), jnp.asarray(T2),
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid), None, CFG,
    )
    assert int(m.count) == 0


def test_statistical_outlier_filter():
    m = mapper.init_map(CFG)
    rng = np.random.default_rng(2)
    pts = rng.normal(0, 1.0, size=(500, 3)).astype(np.float32)
    pts[:5] *= 100.0  # gross outliers
    m = mapper.insert_points(
        m, jnp.asarray(pts), jnp.full((500, 3), 0.5, jnp.float32),
        jnp.ones(500, jnp.float32), jnp.ones(500, bool),
    )
    m2 = mapper.filter_outliers(m, sigma=3.0)
    valid = np.asarray(m2.valid)
    assert valid.sum() >= 490
    assert not valid[:5].any()


def test_capacity_overflow_is_safe():
    small = MapperConfig(max_points=64)
    m = mapper.init_map(small)
    pts = np.zeros((100, 3), np.float32)
    m = mapper.insert_points(
        m, jnp.asarray(pts), jnp.full((100, 3), 0.5, jnp.float32),
        jnp.ones(100, jnp.float32), jnp.ones(100, bool),
    )
    assert int(m.count) == 64
    assert np.asarray(m.valid).sum() == 64


def test_ply_pcd_export_roundtrip(tmp_path):
    m = mapper.init_map(CFG)
    pts = np.array([[1, 2, 3], [4, 5, 6]], np.float32)
    cols = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    m = mapper.insert_points(m, jnp.asarray(pts), jnp.asarray(cols),
                             jnp.ones(2, jnp.float32), jnp.ones(2, bool))
    ply = tmp_path / "map.ply"
    pcd = tmp_path / "map.pcd"
    assert export.export_ply(m, str(ply)) == 2
    assert export.export_pcd(m, str(pcd)) == 2
    lines = ply.read_text().splitlines()
    assert lines[0] == "ply"
    assert "element vertex 2" in lines[2]
    assert lines[-1].startswith("4.000000 5.000000 6.000000")
    assert "POINTS 2" in pcd.read_text()
