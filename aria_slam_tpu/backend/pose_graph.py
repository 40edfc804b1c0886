"""SE3 pose-graph optimization: Levenberg–Marquardt with matrix-free PCG.

Parity: reference PoseGraphOptimizer over g2o (src/legacy/LoopClosure.cpp:197-313):
SE3 vertices (first fixed), odometry edges with identity information,
loop edges at 10x weight, LM iterations.

TPU design (SURVEY.md §7.3 item 3): g2o's sparse Cholesky becomes a
matrix-free Gauss–Newton: per-edge 6x6 Jacobian blocks come from
`jax.jacfwd` of the residual (vmapped over all edges at once), the
normal-equation matvec is two segment-sums, and the solve is
block-Jacobi-preconditioned conjugate gradients — everything static
shape, bounded iterations, one jitted program. Graph capacities are
padded; masked edges carry zero weight.

Residual (right perturbation): r_e(xi) = log( T_meas^-1 * (T_i exp(xi_i))^-1 * (T_j exp(xi_j)) ).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aria_slam_tpu.config import PoseGraphConfig
from aria_slam_tpu.core import lie
from aria_slam_tpu.core.types import PoseGraph


def init_graph(cfg: PoseGraphConfig) -> PoseGraph:
    n, e = cfg.max_nodes, cfg.max_edges
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (n, 1, 1))
    eye_e = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (e, 1, 1))
    return PoseGraph(
        node_pose=eye,
        node_valid=jnp.zeros((n,), bool),
        edge_i=jnp.zeros((e,), jnp.int32),
        edge_j=jnp.zeros((e,), jnp.int32),
        edge_rel=eye_e,
        edge_weight=jnp.zeros((e,), jnp.float32),
        edge_twt=jnp.ones((e,), jnp.float32),
        edge_rwt=jnp.ones((e,), jnp.float32),
        edge_valid=jnp.zeros((e,), bool),
        num_nodes=jnp.asarray(0, jnp.int32),
        num_edges=jnp.asarray(0, jnp.int32),
    )


def set_node(g: PoseGraph, idx, pose) -> PoseGraph:
    """Parity: setInitialPose / vertex insert (LoopClosure.cpp:236-253)."""
    idx = jnp.asarray(idx, jnp.int32)
    return g.replace(
        node_pose=g.node_pose.at[idx].set(pose),
        node_valid=g.node_valid.at[idx].set(True),
        num_nodes=jnp.maximum(g.num_nodes, idx + 1),
    )


def _add_edge(g: PoseGraph, i, j, rel, weight, t_weight=1.0,
              r_weight=1.0) -> PoseGraph:
    slot = g.num_edges
    cap = g.edge_i.shape[0]
    ok = slot < cap
    safe = jnp.where(ok, slot, cap - 1)
    t_weight = jnp.asarray(t_weight, jnp.float32)
    r_weight = jnp.asarray(r_weight, jnp.float32)
    return g.replace(
        edge_i=g.edge_i.at[safe].set(jnp.where(ok, jnp.asarray(i, jnp.int32), g.edge_i[safe])),
        edge_j=g.edge_j.at[safe].set(jnp.where(ok, jnp.asarray(j, jnp.int32), g.edge_j[safe])),
        edge_rel=g.edge_rel.at[safe].set(jnp.where(ok, rel, g.edge_rel[safe])),
        edge_weight=g.edge_weight.at[safe].set(jnp.where(ok, weight, g.edge_weight[safe])),
        edge_twt=g.edge_twt.at[safe].set(jnp.where(ok, t_weight, g.edge_twt[safe])),
        edge_rwt=g.edge_rwt.at[safe].set(jnp.where(ok, r_weight, g.edge_rwt[safe])),
        edge_valid=g.edge_valid.at[safe].set(jnp.where(ok, True, g.edge_valid[safe])),
        num_edges=jnp.where(ok, slot + 1, slot),
    )


def extend_chain(g: PoseGraph, poses, rels, first_node,
                 t_weight=1.0, r_weight=1.0) -> PoseGraph:
    """Append C chain nodes + odometry edges in one call (offline
    chunked evaluation): node ids first_node..first_node+C-1 with world
    poses `poses` (C, 4, 4) and edges (i-1 -> i) measuring `rels`
    (C, 4, 4) = T_{i-1}^-1 T_i. t_weight: translation weight of the
    chain edges (down-weight when wide-baseline backbone edges carry the
    better-conditioned translations)."""
    c = poses.shape[0]
    first_node = jnp.asarray(first_node, jnp.int32)
    node_idx = first_node + jnp.arange(c, dtype=jnp.int32)
    ecap = g.edge_i.shape[0]
    # overflowing slots must be DROPPED, not clamped: a clamp would keep
    # overwriting the last valid edge once the buffer fills (parity with
    # _add_edge's no-op overflow)
    edge_slots = g.num_edges + jnp.arange(c, dtype=jnp.int32)
    return g.replace(
        node_pose=g.node_pose.at[node_idx].set(poses, mode="drop"),
        node_valid=g.node_valid.at[node_idx].set(True, mode="drop"),
        edge_i=g.edge_i.at[edge_slots].set(node_idx - 1, mode="drop"),
        edge_j=g.edge_j.at[edge_slots].set(node_idx, mode="drop"),
        edge_rel=g.edge_rel.at[edge_slots].set(rels, mode="drop"),
        edge_weight=g.edge_weight.at[edge_slots].set(1.0, mode="drop"),
        edge_twt=g.edge_twt.at[edge_slots].set(
            jnp.asarray(t_weight, jnp.float32), mode="drop"),
        edge_rwt=g.edge_rwt.at[edge_slots].set(
            jnp.broadcast_to(jnp.asarray(r_weight, jnp.float32), (c,)),
            mode="drop"),
        edge_valid=g.edge_valid.at[edge_slots].set(True, mode="drop"),
        num_nodes=jnp.minimum(jnp.maximum(g.num_nodes, first_node + c),
                              g.node_pose.shape[0]),
        num_edges=jnp.minimum(g.num_edges + c, ecap),
    )


def add_edges_batch(g: PoseGraph, i_idx, j_idx, rels, weight,
                    valid, t_weight=1.0) -> PoseGraph:
    """Append a batch of E' edges in one call (chunked mode). Entries
    with valid=False still consume a slot but carry edge_valid=False /
    weight 0, so the batch stays one static-shape scatter; overflowing
    slots are dropped (parity with extend_chain)."""
    e = i_idx.shape[0]
    ecap = g.edge_i.shape[0]
    slots = g.num_edges + jnp.arange(e, dtype=jnp.int32)
    valid = jnp.asarray(valid, bool)
    w = jnp.broadcast_to(jnp.asarray(weight, jnp.float32), (e,))
    twt = jnp.broadcast_to(jnp.asarray(t_weight, jnp.float32), (e,))
    return g.replace(
        edge_i=g.edge_i.at[slots].set(jnp.asarray(i_idx, jnp.int32), mode="drop"),
        edge_j=g.edge_j.at[slots].set(jnp.asarray(j_idx, jnp.int32), mode="drop"),
        edge_rel=g.edge_rel.at[slots].set(rels, mode="drop"),
        edge_weight=g.edge_weight.at[slots].set(
            jnp.where(valid, w, 0.0), mode="drop"),
        edge_twt=g.edge_twt.at[slots].set(twt, mode="drop"),
        edge_rwt=g.edge_rwt.at[slots].set(jnp.ones((e,), jnp.float32),
                                          mode="drop"),
        edge_valid=g.edge_valid.at[slots].set(valid, mode="drop"),
        num_edges=jnp.minimum(g.num_edges + e, ecap),
    )


def add_odometry_edge(g: PoseGraph, i, j, rel, cfg: PoseGraphConfig,
                      r_weight=1.0) -> PoseGraph:
    """Parity: addOdometryEdge (LoopClosure.cpp:255-273), weight 1.
    r_weight > 1 pins the rotation when it came from the gyro."""
    return _add_edge(g, i, j, rel, jnp.asarray(1.0, jnp.float32),
                     r_weight=r_weight)


def add_loop_edge(g: PoseGraph, i, j, rel, cfg: PoseGraphConfig,
                  t_weight=1.0) -> PoseGraph:
    """Parity: addLoopEdge at 10x information weight (LoopClosure.cpp:275-280).
    t_weight: parallax-derived translation confidence — a revisit at
    near-zero baseline verifies with a perfect rotation but a garbage
    unit translation, which at 10x weight corrupts the graph."""
    return _add_edge(g, i, j, rel, jnp.asarray(cfg.loop_edge_weight, jnp.float32),
                     t_weight)


# ------------------------------------------------------------------ residuals
def _edge_residual(Ti, Tj, Tm, xi_i, xi_j):
    """r = log(Tm^-1 (Ti e^xi_i)^-1 (Tj e^xi_j)) in R^6."""
    Ti_p = Ti @ lie.se3_exp(xi_i)
    Tj_p = Tj @ lie.se3_exp(xi_j)
    return lie.se3_log(lie.se3_inverse(Tm) @ lie.se3_inverse(Ti_p) @ Tj_p)


def _edge_residuals_and_jacobians(g: PoseGraph):
    """Residuals (E, 6) and Jacobian blocks (E, 6, 6) x 2 at xi = 0."""
    Ti = g.node_pose[g.edge_i]
    Tj = g.node_pose[g.edge_j]
    Tm = g.edge_rel
    zero = jnp.zeros(6, jnp.float32)

    def one(ti, tj, tm):
        r = _edge_residual(ti, tj, tm, zero, zero)
        Ji = jax.jacfwd(lambda x: _edge_residual(ti, tj, tm, x, zero))(zero)
        Jj = jax.jacfwd(lambda x: _edge_residual(ti, tj, tm, zero, x))(zero)
        return r, Ji, Jj

    return jax.vmap(one)(Ti, Tj, Tm)


def _edge_weight6(g: PoseGraph):
    """(E, 6) per-residual-component weights: scalar edge weight with
    the translation components (twist [rho, phi]: first 3) scaled by
    the parallax-derived translation confidence edge_twt and the
    rotation components by edge_rwt (gyro-backed chain edges pin
    orientation, see types.PoseGraph)."""
    w = g.edge_weight * g.edge_valid.astype(jnp.float32)  # (E,)
    comp = jnp.stack([g.edge_twt] * 3 + [g.edge_rwt] * 3, -1)  # (E, 6)
    return w[:, None] * comp


def _graph_cost(g: PoseGraph, node_pose):
    Ti = node_pose[g.edge_i]
    Tj = node_pose[g.edge_j]
    zero = jnp.zeros(6, jnp.float32)
    r = jax.vmap(lambda a, b, m: _edge_residual(a, b, m, zero, zero))(Ti, Tj, g.edge_rel)
    return jnp.sum(_edge_weight6(g) * r * r)


# ---------------------------------------------------------------------- solve
def _solve_normal_eqs(g: PoseGraph, r, Ji, Jj, lam, cg_iters):
    """PCG on (J^T W J + lam*I) x = -J^T W r with node 0 gauge-fixed."""
    n = g.node_pose.shape[0]
    w6 = _edge_weight6(g)  # (E, 6) per-residual-component weights
    ei, ej = g.edge_i, g.edge_j
    free = g.node_valid & (jnp.arange(n) != 0)  # (N,) gauge: fix node 0
    freef = free.astype(jnp.float32)[:, None]

    def project(x):
        return x * freef

    def hvp(x):
        """x: (N, 6) -> (J^T W J + lam I) x with gauge projection."""
        x = project(x)
        yi = jnp.einsum("eab,eb->ea", Ji, x[ei])
        yj = jnp.einsum("eab,eb->ea", Jj, x[ej])
        y = (yi + yj) * w6  # (E, 6)
        out = jnp.zeros_like(x)
        out = out.at[ei].add(jnp.einsum("eba,eb->ea", Ji, y))
        out = out.at[ej].add(jnp.einsum("eba,eb->ea", Jj, y))
        return project(out + lam * x)

    b = jnp.zeros((n, 6), jnp.float32)
    wr = r * w6
    b = b.at[ei].add(-jnp.einsum("eba,eb->ea", Ji, wr))
    b = b.at[ej].add(-jnp.einsum("eba,eb->ea", Jj, wr))
    b = project(b)

    # block-Jacobi preconditioner: per-node 6x6 diagonal blocks
    blocks = jnp.zeros((n, 6, 6), jnp.float32)
    blocks = blocks.at[ei].add(jnp.einsum("eba,ebc->eac", Ji, Ji * w6[:, :, None]))
    blocks = blocks.at[ej].add(jnp.einsum("eba,ebc->eac", Jj, Jj * w6[:, :, None]))
    from aria_slam_tpu.ops.linalg import inv_psd

    blocks = blocks + (lam + 1e-6) * jnp.eye(6)[None]
    Minv = inv_psd(blocks)  # unrolled batched 6x6 SPD inverse

    def precond(x):
        return project(jnp.einsum("nab,nb->na", Minv, x))

    # PCG, fixed iterations
    x0 = jnp.zeros_like(b)
    r0 = b  # since x0 = 0
    z0 = precond(r0)
    p0 = z0

    def body(_, st):
        x, rr, z, p = st
        Ap = hvp(p)
        rz = jnp.sum(rr * z)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        x1 = x + alpha * p
        r1 = rr - alpha * Ap
        z1 = precond(r1)
        beta = jnp.sum(r1 * z1) / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        p1 = z1 + beta * p
        return x1, r1, z1, p1

    x, _, _, _ = jax.lax.fori_loop(0, cg_iters, body, (x0, r0, z0, p0))
    return x


def optimize(g: PoseGraph, cfg: PoseGraphConfig, iterations: int | None = None) -> PoseGraph:
    """LM loop (parity: optimizer.optimize(n_iters), LoopClosure.cpp:282-290).

    Fixed iteration budget; each iteration solves the damped normal
    equations by PCG, retracts, and accepts/rejects by cost.
    """
    iters = cfg.lm_iterations if iterations is None else iterations

    def lm_step(state, _):
        poses, lam = state
        gi = g.replace(node_pose=poses)
        r, Ji, Jj = _edge_residuals_and_jacobians(gi)
        dx = _solve_normal_eqs(gi, r, Ji, Jj, lam, cfg.cg_iterations)
        trial = jnp.einsum("nij,njk->nik", poses, lie.se3_exp(dx))
        cost0 = _graph_cost(g, poses)
        cost1 = _graph_cost(g, trial)
        accept = cost1 < cost0
        poses_new = jnp.where(accept, trial, poses)
        lam_new = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam_new = jnp.clip(lam_new, 1e-9, 1e6)
        return (poses_new, lam_new), cost1

    (poses, _), _ = jax.lax.scan(
        lm_step, (g.node_pose, jnp.asarray(cfg.init_lambda, jnp.float32)),
        None, length=iters,
    )
    return g.replace(node_pose=poses)


def get_pose(g: PoseGraph, idx):
    """Parity: getOptimizedPose (LoopClosure.cpp:292-298)."""
    return g.node_pose[jnp.asarray(idx, jnp.int32)]
