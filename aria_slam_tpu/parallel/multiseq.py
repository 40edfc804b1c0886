"""Data-parallel batch execution: many frames / sequences per step, and
the detector fine-tuning step used by dryrun_multichip.

SURVEY.md §5.8: multi-chip here means (a) batch-eval of many EuRoC
sequences / frame pairs sharded over the 'data' axis, and (b) detector
training with DP gradients (psum inserted by XLA) + its widest tensors
sharding over 'model'. The SLAM per-frame math is identical to the
single-chip path — only the shardings differ.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aria_slam_tpu.config import PipelineConfig
from aria_slam_tpu.ops import epipolar, match as match_ops, orb


def batched_frontend(cfg: PipelineConfig):
    """(B, H, W) pairs of frames -> batched VO deltas, ready to pjit
    over the 'data' axis. Uses the natively-batched extract/match
    (the Pallas kernels batch over a grid dim; vmap over them is
    unsupported)."""
    K = jnp.asarray(cfg.camera.K)

    def run(img1s, img2s, keys):
        # images may arrive uint8 (cheaper H2D); cast on device
        f1 = orb.extract_batch(img1s.astype(jnp.float32), cfg.orb)
        f2 = orb.extract_batch(img2s.astype(jnp.float32), cfg.orb)
        m = match_ops.match_batched(f2, f1, cfg.matcher.ratio)

        def pose_one(f1_, f2_, m_, k):
            xy_prev = jnp.take_along_axis(f1_.xy, m_.train_idx[:, None], 0)
            delta = epipolar.estimate_relative_pose(
                xy_prev, f2_.xy, m_.valid & f1_.valid[m_.train_idx],
                K, cfg.ransac, k,
            )
            return delta.R, delta.t, delta.num_inliers

        return jax.vmap(pose_one)(f1, f2, m, keys)

    return run


def shard_batched_frontend(mesh: Mesh, cfg: PipelineConfig):
    fn = batched_frontend(cfg)
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        fn,
        in_shardings=(data, data, NamedSharding(mesh, P("data"))),
        out_shardings=(data, data, data),
    )


# --------------------------------------------------------- detector training
def detector_train_step(model, tx):
    """One DP training step for the YOLO detector (toy objective:
    detection losses need labels; dryrun uses an L2-to-target stand-in
    that still exercises fwd+bwd+optimizer+collectives end to end)."""

    def loss_fn(params, batch_stats, images, targets):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        loss = sum(
            jnp.mean((b.astype(jnp.float32) - t) ** 2)
            for (b, _), t in zip(outs, targets)
        ) + sum(jnp.mean(c.astype(jnp.float32) ** 2) * 1e-3 for (_, c) in outs)
        return loss, mutated["batch_stats"]

    def step(params, batch_stats, opt_state, images, targets):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, targets
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    return step


def make_sharded_train_step(mesh: Mesh, model, tx, params, batch_stats, opt_state):
    """pjit the train step: batch over 'data', params replicated (DP).
    XLA inserts the gradient psum over the data axis automatically."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    step = detector_train_step(model, tx)

    def spec_like(tree):
        return jax.tree_util.tree_map(lambda _: repl, tree)

    return jax.jit(
        step,
        in_shardings=(spec_like(params), spec_like(batch_stats),
                      spec_like(opt_state), data, None),
        out_shardings=(spec_like(params), spec_like(batch_stats),
                       spec_like(opt_state), repl),
    )
