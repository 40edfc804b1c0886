"""Chunked offline evaluator: equivalence with the online pipeline on
the synthetic scene, plus the chunk-support primitives."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

import tests.test_pipeline as tp
from aria_slam_tpu.backend import keyframe_db, pose_graph
from aria_slam_tpu.config import LoopClosureConfig, OrbConfig, PoseGraphConfig


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from aria_slam_tpu.io import synthetic_scene

    out = tmp_path_factory.mktemp("scene_chunked")
    synthetic_scene.generate(str(out), num_frames=13, fps=5.0,
                             cam=tp.SMALL_CAM, depth=4.0)
    return str(out)


def test_chunked_eval_end_to_end(scene_dir):
    from aria_slam_tpu.eval import euroc_eval

    cfg = dataclasses.replace(tp.SMALL_CFG, enable_loop_closure=True)
    res = euroc_eval.run(scene_dir, out_dir="/tmp/chunked_test_out",
                         config=cfg, verbose=False, chunk=4)
    assert res["frames"] == 13
    assert res["map_points"] > 50
    assert np.isfinite(res["ate_rmse_m"])
    assert res["ate_rmse_m"] < 0.5, f"ATE {res['ate_rmse_m']:.3f}"
    import os

    assert os.path.exists("/tmp/chunked_test_out/estimated_trajectory.txt")
    lines = open("/tmp/chunked_test_out/estimated_trajectory.txt").read().splitlines()
    assert len(lines) == 13


def test_chunked_with_detection_enabled(scene_dir):
    """Detection + dynamic filtering inside the chunk program (VERDICT
    r1 missing #4): the full front-end must run with the detector as an
    independent subgraph and still produce a sane trajectory."""
    from aria_slam_tpu.config import DetectorConfig
    from aria_slam_tpu.eval import euroc_eval

    det = DetectorConfig(input_size=64, width_mult=0.25, depth_mult=0.33,
                         max_detections=16, conf_threshold=0.9)
    cfg = dataclasses.replace(
        tp.SMALL_CFG, detector=det, enable_detection=True,
        enable_dynamic_filtering=True, enable_loop_closure=True,
    )
    res = euroc_eval.run(scene_dir, out_dir="/tmp/chunked_det_out",
                         config=cfg, verbose=False, chunk=4)
    assert res["frames"] == 13
    assert np.isfinite(res["ate_rmse_m"])
    # random-weight detections at conf 0.9 fire rarely; the trajectory
    # must stay comparable to the detector-off run
    assert res["ate_rmse_m"] < 0.6, f"ATE {res['ate_rmse_m']:.3f}"


def test_backbone_path_still_works(scene_dir):
    """backbone_weight defaults 0 since r4 (metric-inconsistent edge
    classes distorted the final optimize — see config.PoseGraphConfig);
    this keeps the opt-in lever exercised: backbone edges with the
    "chain" translation-magnitude convention plus the wide-baseline
    scale EMA (vo_backbone_scale) must still produce a sane
    trajectory, and must not move the scale outside the EMA clamp."""
    from aria_slam_tpu.config import PoseGraphConfig
    from aria_slam_tpu.eval import euroc_eval

    cfg = dataclasses.replace(
        tp.SMALL_CFG,
        pose_graph=dataclasses.replace(
            tp.SMALL_CFG.pose_graph, backbone_weight=2.0),
        backbone_t_source="chain",
        vo_backbone_scale=True,
        enable_loop_closure=True,
    )
    res = euroc_eval.run(scene_dir, out_dir="/tmp/chunked_backbone_out",
                         config=cfg, verbose=False, chunk=4)
    assert res["frames"] == 13
    assert np.isfinite(res["ate_rmse_m"])
    assert res["ate_rmse_m"] < 0.6, f"ATE {res['ate_rmse_m']:.3f}"
    # the legacy "pin" magnitude convention must also still run
    cfg_pin = dataclasses.replace(cfg, backbone_t_source="pin",
                                  vo_backbone_scale=False)
    res_pin = euroc_eval.run(scene_dir, out_dir="/tmp/chunked_backbone_pin",
                             config=cfg_pin, verbose=False, chunk=4)
    assert np.isfinite(res_pin["ate_rmse_m"])


def test_extend_chain_matches_incremental():
    cfg = PoseGraphConfig(max_nodes=32, max_edges=64)
    g1 = pose_graph.init_graph(cfg)
    g1 = pose_graph.set_node(g1, 0, jnp.eye(4))
    g2 = g1

    rng = np.random.default_rng(0)
    from aria_slam_tpu.core import lie

    poses, rels = [], []
    T = np.eye(4, dtype=np.float32)
    for k in range(6):
        xi = 0.1 * rng.normal(size=6).astype(np.float32)
        rel = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        T = T @ rel
        poses.append(T.copy())
        rels.append(rel)

    # incremental
    for k in range(6):
        g1 = pose_graph.set_node(g1, k + 1, jnp.asarray(poses[k]))
        g1 = pose_graph.add_odometry_edge(g1, k, k + 1, jnp.asarray(rels[k]), cfg)
    # batched
    g2 = pose_graph.extend_chain(g2, jnp.asarray(np.stack(poses)),
                                 jnp.asarray(np.stack(rels)), 1)

    np.testing.assert_allclose(np.asarray(g1.node_pose[:7]),
                               np.asarray(g2.node_pose[:7]), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(g1.edge_i[:6]), np.asarray(g2.edge_i[:6]))
    assert int(g1.num_edges) == int(g2.num_edges)
    np.testing.assert_allclose(np.asarray(g1.edge_rel[:6]),
                               np.asarray(g2.edge_rel[:6]), atol=1e-6)


def test_add_keyframes_batch_matches_incremental():
    lc = LoopClosureConfig(max_keyframes=8)
    orbc = OrbConfig(num_features=32)
    rng = np.random.default_rng(1)
    desc = rng.integers(0, 2, (3, 32, 256)).astype(np.int8)
    xy = rng.uniform(0, 100, (3, 32, 2)).astype(np.float32)
    valid = np.ones((3, 32), bool)
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))

    db1 = keyframe_db.init_db(lc, orbc)
    from aria_slam_tpu.core.types import Features

    for i in range(3):
        f = Features(xy=jnp.asarray(xy[i]), response=jnp.zeros(32),
                     angle=jnp.zeros(32), octave=jnp.zeros(32, jnp.int32),
                     size=jnp.zeros(32), desc=jnp.asarray(desc[i]),
                     valid=jnp.asarray(valid[i]))
        db1 = keyframe_db.add_keyframe(db1, f, i, jnp.asarray(poses[i]))

    db2 = keyframe_db.init_db(lc, orbc)
    db2 = keyframe_db.add_keyframes_batch(
        db2, jnp.asarray(desc), jnp.asarray(xy), jnp.asarray(valid),
        jnp.arange(3), jnp.asarray(poses),
    )
    np.testing.assert_array_equal(np.asarray(db1.desc), np.asarray(db2.desc))
    np.testing.assert_allclose(np.asarray(db1.hist), np.asarray(db2.hist), atol=1e-6)
    assert int(db1.head) == int(db2.head) == 3


def test_fetch_many_restores_dtypes_exactly():
    """ChunkedSlam._fetch_many packs mixed-dtype device arrays through
    one f32-ravel concat fetch; bools, small ints, and f32 payloads must
    come back bit-exact and in input order (the LC verify path trusts
    this for verdict flags, edge poses, weights, and DB frame ids)."""
    from aria_slam_tpu.eval.chunked import ChunkedSlam

    self = ChunkedSlam.__new__(ChunkedSlam)  # helper needs no init
    self._pack_fn = None
    rng = np.random.default_rng(7)
    flags = rng.random(13) > 0.5
    ints = rng.integers(0, 2**20, (5, 3)).astype(np.int32)
    mats = rng.normal(size=(4, 4, 4)).astype(np.float32)
    scal = np.float32(3.25)
    outs = self._fetch_many([jnp.asarray(flags), jnp.asarray(ints),
                             jnp.asarray(mats), jnp.asarray(scal)])
    assert [o.dtype for o in outs] == [flags.dtype, ints.dtype,
                                       mats.dtype, scal.dtype]
    np.testing.assert_array_equal(outs[0], flags)
    np.testing.assert_array_equal(outs[1], ints)
    np.testing.assert_array_equal(outs[2], mats)
    assert float(outs[3]) == 3.25
    # host copies must be writable (the LC path mutates scores in place)
    outs[2][0, 0, 0] = 0.0
