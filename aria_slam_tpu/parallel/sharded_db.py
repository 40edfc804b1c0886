"""Loop-closure keyframe database sharded across an ICI mesh.

SURVEY.md §5.7: 'if the DB ever exceeds one chip's HBM, shard it across
an ICI mesh and psum the top-k — that is this project's honest analogue
of sequence parallelism.' Each device holds a shard of the keyframe
axis, scores the (replicated) query against its shard with the same MXU
matmul as the single-chip path, and the winners are combined with one
all_gather of per-shard top-k (k tiny, so the collective is bytes, not
megabytes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from aria_slam_tpu.ops.match import match_scores_vs_database


def sharded_topk_scores(
    mesh: Mesh,
    desc_q: jnp.ndarray,       # (F, B) int8, replicated
    valid_q: jnp.ndarray,      # (F,) bool
    db_desc: jnp.ndarray,      # (N, F, B) int8, N sharded over 'model'
    db_valid: jnp.ndarray,     # (N, F) bool
    ratio: float = 0.7,
    top_k: int = 5,
):
    """Returns (scores (top_k,), global_indices (top_k,)) of the best-
    scoring keyframes across the whole sharded DB."""
    n_shards = mesh.shape["model"]
    n_total = db_desc.shape[0]
    shard_n = n_total // n_shards

    def local(desc_q, valid_q, db_d, db_v):
        scores = match_scores_vs_database(desc_q, valid_q, db_d, db_v, ratio)
        vals, idx = jax.lax.top_k(scores, top_k)
        # global indices for this shard
        shard_id = jax.lax.axis_index("model")
        gidx = idx + shard_id * shard_n
        # gather every shard's candidates (tiny payload)
        all_vals = jax.lax.all_gather(vals, "model")   # (S, k)
        all_idx = jax.lax.all_gather(gidx, "model")    # (S, k)
        flat_v = all_vals.reshape(-1)
        flat_i = all_idx.reshape(-1)
        best_v, pos = jax.lax.top_k(flat_v, top_k)
        return best_v, flat_i[pos]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P("model"), P("model")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(desc_q, valid_q, db_desc, db_valid)
