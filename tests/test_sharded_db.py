"""parallel/sharded_db.py correctness on the 8-device CPU mesh.

VERDICT r4 weak #6: the ICI-sharded loop-closure DB was exercised only
via __graft_entry__.dryrun_multichip (which checks it compiles + runs);
this pins its NUMBERS — the sharded per-shard-top-k + all_gather merge
must return exactly the single-device match_scores_vs_database top-k.
Reference analogue: the H14 GPU batch-matcher design
(/root/reference/docs/milestones/H14_GPU_LOOPCLOSURE_AUDIT.md:40-95),
whose single- and multi-launch paths must agree the same way.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aria_slam_tpu.ops.match import match_scores_vs_database
from aria_slam_tpu.parallel.sharded_db import sharded_topk_scores


@pytest.fixture(scope="module")
def mesh():
    from aria_slam_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    return make_mesh(n_data=1, n_model=8)


def _random_db(rng, n_kf=64, n_feat=96, n_bits=256):
    # repo descriptor convention: (N, 256) int8 with {0,1} entries
    # (ops/match.hamming_matrix computes |a|+|b|-2ab on bit vectors)
    db_desc = rng.integers(0, 2, (n_kf, n_feat, n_bits)).astype(np.int8)
    db_valid = rng.random((n_kf, n_feat)) < 0.9
    q_desc = rng.integers(0, 2, (n_feat, n_bits)).astype(np.int8)
    q_valid = rng.random(n_feat) < 0.9
    # plant two strong revisits sharing most of the query's descriptors
    # (distinct share counts so the top-k order is unique)
    hit_a, hit_b = n_kf // 6, n_kf // 2 + 5
    db_desc[hit_a, :80] = q_desc[:80]
    db_desc[hit_b, :60] = q_desc[:60]
    db_valid[hit_a, :80] = True
    db_valid[hit_b, :60] = True
    return (jnp.asarray(db_desc),
            jnp.asarray(db_valid),
            jnp.asarray(q_desc),
            jnp.asarray(q_valid),
            (hit_a, hit_b))


def test_sharded_topk_matches_single_device(mesh, rng):
    db_desc, db_valid, q_desc, q_valid, hits = _random_db(rng)
    top_k = 5

    ref_scores = np.asarray(
        match_scores_vs_database(q_desc, q_valid, db_desc, db_valid, 0.7))
    ref_idx = np.argsort(-ref_scores, kind="stable")[:top_k]

    vals, idx = sharded_topk_scores(
        mesh, q_desc, q_valid, db_desc, db_valid, ratio=0.7, top_k=top_k)
    vals = np.asarray(vals)
    idx = np.asarray(idx)

    # same winners with the same scores (order may differ on exact
    # ties; compare as score-sorted sets)
    np.testing.assert_allclose(
        np.sort(vals)[::-1], np.sort(ref_scores[ref_idx])[::-1],
        rtol=0, atol=1e-6)
    assert set(idx.tolist()) == set(ref_idx.tolist()), (
        f"sharded winners {idx} != single-device {ref_idx}")
    # the planted revisits must surface through the sharded path
    assert set(hits) <= set(idx.tolist())


def test_sharded_scores_are_per_slot_exact(mesh, rng):
    """Every (value, index) the sharded merge returns must equal the
    single-device score at that index — not just the winning set."""
    db_desc, db_valid, q_desc, q_valid, _ = _random_db(rng, n_kf=32)
    ref_scores = np.asarray(
        match_scores_vs_database(q_desc, q_valid, db_desc, db_valid, 0.7))
    vals, idx = sharded_topk_scores(
        mesh, q_desc, q_valid, db_desc, db_valid, ratio=0.7, top_k=4)
    np.testing.assert_allclose(
        np.asarray(vals), ref_scores[np.asarray(idx)], rtol=0, atol=1e-6)
