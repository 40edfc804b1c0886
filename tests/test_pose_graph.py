"""Pose-graph LM: known-optimum toy graphs + drift-correction scenario
(SURVEY.md §7.2 step 8: 'validate against small graphs with known optimum')."""

import numpy as np
import jax
import jax.numpy as jnp

from aria_slam_tpu.config import PoseGraphConfig
from aria_slam_tpu.core import lie
from aria_slam_tpu.backend import pose_graph as pg

CFG = PoseGraphConfig(max_nodes=64, max_edges=128, lm_iterations=15, cg_iterations=48)


def se3(rotvec, trans):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(rotvec, jnp.float32)))
    T[:3, 3] = trans
    return jnp.asarray(T)


def build_chain(gt_poses, odo_noise, seed=0):
    """Graph with noisy odometry edges between consecutive GT poses."""
    rng = np.random.default_rng(seed)
    g = pg.init_graph(CFG)
    n = len(gt_poses)
    # initialize nodes by integrating noisy odometry (like a real run)
    cur = gt_poses[0]
    g = pg.set_node(g, 0, cur)
    rels = []
    for k in range(1, n):
        rel_gt = np.asarray(lie.se3_inverse(gt_poses[k - 1]) @ gt_poses[k])
        noise = rng.normal(0, odo_noise, 6).astype(np.float32)
        rel_noisy = jnp.asarray(rel_gt) @ lie.se3_exp(jnp.asarray(noise))
        rels.append(rel_noisy)
        cur = cur @ rel_noisy
        g = pg.set_node(g, k, cur)
        g = pg.add_odometry_edge(g, k - 1, k, rel_noisy, CFG)
    return g, rels


def circle_gt(n=20, radius=2.0):
    poses = []
    for k in range(n):
        a = 2 * np.pi * k / n
        t = np.array([radius * np.cos(a), radius * np.sin(a), 0.0], np.float32)
        poses.append(se3([0, 0, a], t))
    return poses


def test_consistent_graph_stays_put():
    """Zero-noise odometry: optimization must not move the nodes."""
    gt = circle_gt()
    g, _ = build_chain(gt, odo_noise=0.0)
    g2 = pg.optimize(g, CFG)
    for k in range(len(gt)):
        np.testing.assert_allclose(
            np.asarray(pg.get_pose(g2, k)), np.asarray(gt[k]), atol=1e-3
        )


def test_loop_closure_corrects_drift():
    """Noisy odometry around a circle + one exact loop edge back to node 0:
    the loop must pull the end of the chain back toward ground truth."""
    gt = circle_gt(20)
    g, _ = build_chain(gt, odo_noise=0.02, seed=3)

    # drift before optimization
    last = 19
    err_before = np.linalg.norm(
        np.asarray(pg.get_pose(g, last))[:3, 3] - np.asarray(gt[last])[:3, 3]
    )
    # exact loop edge last -> 0 (parity: 10x weight)
    rel_loop = lie.se3_inverse(gt[last]) @ gt[0]
    g = pg.add_loop_edge(g, last, 0, rel_loop, CFG)

    g2 = jax.jit(lambda gr: pg.optimize(gr, CFG))(g)
    err_after = np.linalg.norm(
        np.asarray(pg.get_pose(g2, last))[:3, 3] - np.asarray(gt[last])[:3, 3]
    )
    assert err_after < 0.5 * err_before, f"{err_before:.4f} -> {err_after:.4f}"
    # graph cost must have dropped
    c0 = float(pg._graph_cost(g, g.node_pose))
    c1 = float(pg._graph_cost(g, g2.node_pose))
    assert c1 < c0


def test_rotation_only_loop_edge_ignores_translation():
    """A loop edge with t_weight=0 must correct ROTATION drift without
    its (garbage) translation pulling the node — the zero-baseline
    revisit case (monocular E gives a perfect R and a meaningless unit
    t; see LoopResult.t_weight)."""
    gt = circle_gt(20)
    g, _ = build_chain(gt, odo_noise=0.02, seed=6)
    last = 19

    # correct relative rotation, translation deliberately poisoned 1 m off
    rel = np.asarray(lie.se3_inverse(gt[last]) @ gt[0])
    rel_bad = rel.copy()
    rel_bad[:3, 3] += np.array([1.0, 0.0, 0.0], np.float32)

    def rot_err(T, Tgt):
        dR = np.asarray(T)[:3, :3] @ np.asarray(Tgt)[:3, :3].T
        return np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))

    # full-weight poisoned edge: translation error grows
    g_full = pg.add_loop_edge(g, last, 0, jnp.asarray(rel_bad), CFG,
                              t_weight=1.0)
    g_full = pg.optimize(g_full, CFG)
    err_full = np.linalg.norm(
        np.asarray(pg.get_pose(g_full, last))[:3, 3]
        - np.asarray(gt[last])[:3, 3])

    # rotation-only edge: rotation improves, translation unharmed
    rot_before = rot_err(pg.get_pose(g, last), gt[last])
    g_rot = pg.add_loop_edge(g, last, 0, jnp.asarray(rel_bad), CFG,
                             t_weight=0.0)
    g_rot = pg.optimize(g_rot, CFG)
    err_rot = np.linalg.norm(
        np.asarray(pg.get_pose(g_rot, last))[:3, 3]
        - np.asarray(gt[last])[:3, 3])
    rot_after = rot_err(pg.get_pose(g_rot, last), gt[last])

    assert err_rot < 0.5 * err_full, f"rot-only {err_rot:.3f} vs full {err_full:.3f}"
    assert rot_after <= rot_before + 0.05, f"{rot_before:.3f} -> {rot_after:.3f}"


def test_first_node_stays_fixed():
    gt = circle_gt(10)
    g, _ = build_chain(gt, odo_noise=0.05, seed=4)
    g = pg.add_loop_edge(g, 9, 0, lie.se3_inverse(gt[9]) @ gt[0], CFG)
    g2 = pg.optimize(g, CFG)
    np.testing.assert_allclose(
        np.asarray(pg.get_pose(g2, 0)), np.asarray(gt[0]), atol=1e-5
    )


def test_edge_overflow_is_safe():
    small = PoseGraphConfig(max_nodes=8, max_edges=4, lm_iterations=2)
    g = pg.init_graph(small)
    for k in range(8):
        g = pg.set_node(g, k, jnp.eye(4))
    for k in range(7):
        g = pg.add_odometry_edge(g, k, k + 1, jnp.eye(4), small)
    assert int(g.num_edges) == 4  # capacity clamp, no crash
    pg.optimize(g, small)  # must not blow up


def test_extend_chain_overflow_preserves_existing_edges():
    """Once the edge buffer is full, extend_chain must DROP overflowing
    edges, not overwrite the last valid slot with wrong tuples."""
    small = PoseGraphConfig(max_nodes=32, max_edges=4, lm_iterations=2)
    g = pg.init_graph(small)
    g = pg.set_node(g, 0, jnp.eye(4))
    rel = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    rel[:, 0, 3] = [1.0, 2.0, 3.0]
    g = pg.extend_chain(g, jnp.asarray(rel), jnp.asarray(rel), 1)
    assert int(g.num_edges) == 3

    # second chunk: 3 more edges but only 1 slot left
    rel2 = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    rel2[:, 1, 3] = [9.0, 8.0, 7.0]
    g = pg.extend_chain(g, jnp.asarray(rel2), jnp.asarray(rel2), 4)
    assert int(g.num_edges) == 4  # clamped at capacity
    # slot 3 (the last in-capacity slot) took edge (3, 4) with rel2[0]
    np.testing.assert_allclose(np.asarray(g.edge_rel[3]), rel2[0], atol=1e-6)
    assert (int(g.edge_i[3]), int(g.edge_j[3])) == (3, 4)
    # third chunk: buffer full — NOTHING may change in the edge arrays
    before = np.asarray(g.edge_rel).copy()
    bi, bj = np.asarray(g.edge_i).copy(), np.asarray(g.edge_j).copy()
    g = pg.extend_chain(g, jnp.asarray(rel2), jnp.asarray(rel2), 7)
    assert int(g.num_edges) == 4
    np.testing.assert_array_equal(np.asarray(g.edge_rel), before)
    np.testing.assert_array_equal(np.asarray(g.edge_i), bi)
    np.testing.assert_array_equal(np.asarray(g.edge_j), bj)
