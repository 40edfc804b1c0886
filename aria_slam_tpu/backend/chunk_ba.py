"""Chunk-local multiview bundle adjustment (joint Schur form).

The chained two-view VO that both this framework and the reference use
(reference: per-frame recoverPose accumulation, src/main.cpp:187-209)
never reconciles the geometry of overlapping pairs: at consecutive-frame
baselines (~1-2% of scene depth) the essential-matrix translation
DIRECTION is noise-bound (median ~60 deg error measured on the rotloop
benchmark), so chained positions random-walk even though each pair's
rotation is good. This module is the principled fix, and a capability
the reference does not have: refine ALL poses of a chunk against
multi-frame feature tracks.

TPU-first design — the classic CPU sparse-Schur BA becomes 100%
fixed-shape batched linear algebra:

  1. tracks:      one `lax.scan` over the chunk's match indices links
                  epipolar-gated matches into feature tracks (landmark
                  ids), no host loop, no dynamic shapes.
  2. triangulate: every landmark is solved in closed form from ALL its
                  observations (world-frame midpoint: 3x3 solve per
                  landmark, batched over ~10^5 landmarks).
  3. joint step:  Schur-complement Gauss-Newton on all poses with the
                  landmarks' optimal response folded in — the landmark
                  blocks are batched closed-form 3x3 inverses and the
                  Schur cross term is ONE matmul Z^T Z (see
                  _joint_step); plain alternation provably stalls here.
  4. repeat (2)-(3) with a fixed-shape backtracking line search.

All stages are dense batched ops (MXU/VPU friendly); the only scatter
is the per-landmark accumulation, the only gather the landmark lookup —
both linear in observations. Everything jits into ONE program per chunk
with static shapes.

Robustness: Huber weights on the pixel residual, a hard gate for gross
outliers, positive-depth masking, LM-style diagonal damping, and a weak
twist prior toward the initial (scale-chained) poses that anchors the
monocular gauge (global scale) the reprojection cost cannot see.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aria_slam_tpu.core import lie
from aria_slam_tpu.config import ChunkBaConfig
from aria_slam_tpu.ops.linalg import cholesky_solve


def build_tracks(midx, cinl, num_kp):
    """Link per-pair matches into feature tracks.

    midx: (C, N) int32 — match target: current-frame slot k of pair i
          matched prev-frame slot midx[i, k] (frames i+1 -> i).
    cinl: (C, N) bool — match valid AND a RANSAC inlier of its pair.
    Returns ids (C+1, N) int32 landmark ids in [0, (C+1)*N): a track
    keeps the id of its first observation (frame*N + slot).

    Matching is best-per-query only, so two current-frame slots can
    point at the same prev slot; letting both inherit its landmark id
    would put TWO observations of one landmark in the same frame
    (biasing triangulation/BA toward the duplicate). A scatter-min per
    pair keeps exactly one winner per prev slot (the lowest current
    slot); losers start fresh tracks.
    """
    c, n = midx.shape
    ids0 = jnp.arange(n, dtype=jnp.int32)
    slots = jnp.arange(n, dtype=jnp.int32)

    def step(prev_ids, x):
        i, mi, ok = x
        # one-to-one gate: winner per prev slot = min current slot
        win = jnp.full((n,), n, jnp.int32).at[mi].min(
            jnp.where(ok, slots, n), mode="drop")
        keep = ok & (win[mi] == slots)
        fresh = (i + 1) * n + slots
        nxt = jnp.where(keep, prev_ids[mi], fresh)
        return nxt, nxt

    _, rest = jax.lax.scan(
        step, ids0, (jnp.arange(c, dtype=jnp.int32), midx, cinl))
    return jnp.concatenate([ids0[None], rest], 0)


def _cam_rays_world(poses, fxy, K):
    """Unit ray directions in world frame + camera centers.

    poses: (F, 4, 4) world-from-camera; fxy: (F, N, 2) undistorted
    pixel keypoints. Returns d (F, N, 3) unit, c (F, 3)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (fxy[..., 0] - cx) / fx
    y = (fxy[..., 1] - cy) / fy
    rays_cam = jnp.stack([x, y, jnp.ones_like(x)], -1)           # (F, N, 3)
    d = jnp.einsum("fab,fnb->fna", poses[:, :3, :3], rays_cam)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    return d, poses[:, :3, 3]


def triangulate_tracks(poses, fxy, obs_w, ids, K, num_landmarks):
    """Closed-form multiview midpoint triangulation of every track.

    Each observation contributes (I - d d^T) to its landmark's 3x3
    normal matrix (minimizes sum of squared point-to-ray distances).
    obs_w: (F, N) float32 observation weights (0 = ignore).
    Returns X (L, 3) world points, cnt (L,) effective observation count.
    """
    d, c = _cam_rays_world(poses, fxy, K)
    eye = jnp.eye(3, dtype=jnp.float32)
    M = (eye[None, None] - d[..., :, None] * d[..., None, :])     # (F,N,3,3)
    M = M * obs_w[..., None, None]
    Mc = jnp.einsum("fnab,fb->fna", M, c)                         # (F, N, 3)

    flat_ids = ids.reshape(-1)
    A = jnp.zeros((num_landmarks, 3, 3), jnp.float32)
    b = jnp.zeros((num_landmarks, 3), jnp.float32)
    cnt = jnp.zeros((num_landmarks,), jnp.float32)
    A = A.at[flat_ids].add(M.reshape(-1, 3, 3))
    b = b.at[flat_ids].add(Mc.reshape(-1, 3))
    cnt = cnt.at[flat_ids].add(obs_w.reshape(-1))

    # damping keeps single-observation / degenerate tracks finite; they
    # are masked out of the pose step by cnt anyway
    A = A + 1e-5 * eye[None]
    X = jax.vmap(cholesky_solve)(A, b)
    return X, cnt


def _project(poses, X, K):
    """Project world points into each observing camera.

    poses (F,4,4) world-from-cam, X (F,N,3) world points per obs slot.
    Returns uv (F,N,2), z (F,N) camera-frame depth, Xc (F,N,3)."""
    R = poses[:, :3, :3]                                          # (F,3,3)
    t = poses[:, :3, 3]                                           # (F,3)
    Xc = jnp.einsum("fba,fnb->fna", R, X - t[:, None, :])         # R^T (X - t)
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = K[0, 0] * Xc[..., 0] / zs + K[0, 2]
    v = K[1, 1] * Xc[..., 1] / zs + K[1, 2]
    return jnp.stack([u, v], -1), z, Xc


def _joint_step(poses, poses_init, ids, fxy, w_obs, K, num_l,
                cfg: ChunkBaConfig, rot_scale=1.0):
    """One joint Gauss-Newton step on poses AND landmarks via the Schur
    complement — the reason this module works where plain alternation
    stalls: with landmarks triangulated FROM the current (wrong) poses,
    the reconstruction is nearly self-consistent and block-coordinate
    descent barely moves (measured <0.05 m pose change against 0.5 m
    chain error); the reduced camera system moves poses WITH the
    landmarks' optimal response folded in.

    TPU shape: the landmark blocks H_ll are batched 3x3 closed-form
    inverses; the Schur cross term sum_l T_l H_ll^-1 T_l^T is ONE
    matmul Z^T Z with Z = (3L, 6F) built by per-frame scatters; the
    reduced system is a single dense (6F, 6F) solve. No sparse
    bookkeeping anywhere.
    """
    from aria_slam_tpu.ops.linalg import cholesky_unrolled, inv_psd

    f = poses.shape[0]
    X, _ = triangulate_tracks(poses, fxy, w_obs, ids, K, num_l)
    X_obs = X[ids]                                               # (F, N, 3)
    uv, z, Xc = _project(poses, X_obs, K)
    r = uv - fxy                                                 # (F, N, 2)
    rn = jnp.linalg.norm(r, axis=-1)
    huber = jnp.minimum(1.0, cfg.huber_px / jnp.maximum(rn, 1e-9))
    w = w_obs * huber * (z > cfg.min_depth) * (rn < cfg.gate_px)

    fx, fy = K[0, 0], K[1, 1]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    zero = jnp.zeros_like(z)
    P = jnp.stack([
        jnp.stack([fx / zs, zero, -fx * Xc[..., 0] / zs**2], -1),
        jnp.stack([zero, fy / zs, -fy * Xc[..., 1] / zs**2], -1),
    ], -2)                                                       # (F, N, 2, 3)
    sk = lie.skew(Xc)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), sk.shape)
    JX = jnp.concatenate([-eye3, sk], -1)                        # (F, N, 3, 6)
    B = jnp.einsum("fnab,fnbc->fnac", P, JX)                     # pose (2, 6)
    # rot_scale=0 freezes rotations (gyro-backed chains: orientation is
    # ~30x better than vision can make it — let BA solve translations
    # and landmarks only, which also conditions the system better)
    rmask = jnp.concatenate([jnp.ones(3), rot_scale * jnp.ones(3)]).astype(
        jnp.float32)
    B = B * rmask[None, None, None, :]
    A = jnp.einsum("fnab,fcb->fnac", P, poses[:, :3, :3])        # lmk (2, 3)
    # (dXc/dX = R^T: A = P @ R^T)

    wB = B * w[..., None, None]
    # landmark normal blocks + gradients (scatter over track ids)
    AtA = jnp.einsum("fnra,fnrb->fnab", A * w[..., None, None], A)
    Atr = jnp.einsum("fnra,fnr->fna", A * w[..., None, None], r)
    flat = ids.reshape(-1)
    H_ll = jnp.zeros((num_l, 3, 3), jnp.float32).at[flat].add(
        AtA.reshape(-1, 3, 3))
    g_l = jnp.zeros((num_l, 3), jnp.float32).at[flat].add(
        Atr.reshape(-1, 3))
    # trace-relative damping: H_ll entries span ~1e0..1e7 (P ~ f/z
    # squared), an absolute floor leaves near-singular blocks that break
    # the f32 closed-form inverse
    tr = jnp.trace(H_ll, axis1=-2, axis2=-1)[:, None, None] / 3.0
    H_ll = H_ll + (cfg.damping * tr + 1e-5) * jnp.eye(3, dtype=jnp.float32)
    C = jax.vmap(inv_psd)(H_ll)                                  # (L, 3, 3)
    M = jax.vmap(cholesky_unrolled)(C)                           # C = M M^T

    # pose blocks
    H_pp = jnp.einsum("fnra,fnrb->fab", wB, B)                   # (F, 6, 6)
    g_p = jnp.einsum("fnra,fnr->fa", wB, r)                      # (F, 6)
    e_prior = jax.vmap(lambda Ti, T: lie.se3_log(lie.se3_inverse(Ti) @ T))(
        poses_init, poses)
    H_pp = H_pp + cfg.prior_weight * jnp.eye(6, dtype=jnp.float32)[None]
    g_p = g_p + cfg.prior_weight * e_prior

    # Schur cross term via Z^T Z: G_i[l] = sum_obs B^T w A, Z = G M
    BtA = jnp.einsum("fnra,fnrb->fnab", wB, A)                   # (F, N, 6, 3)
    G = jnp.zeros((f, num_l, 6, 3), jnp.float32)
    G = G.at[jnp.arange(f)[:, None], ids].add(BtA)
    Gh = jnp.einsum("flab,lbc->flac", G, M)                      # (F, L, 6, 3)
    Z = Gh.transpose(1, 3, 0, 2).reshape(num_l * 3, f * 6)       # (3L, 6F)
    S = jnp.zeros((f * 6, f * 6), jnp.float32)
    fi = jnp.arange(f)
    S = S.reshape(f, 6, f, 6).at[fi, :, fi, :].set(H_pp).reshape(f * 6, f * 6)
    S = S - Z.T @ Z

    gh = jnp.einsum("lba,lb->la", M, g_l).reshape(-1)            # M^T g_l (3L,)
    rhs = -(g_p.reshape(-1) - Z.T @ gh)

    # gauge: pose 0 fixed
    mask = jnp.concatenate([jnp.zeros(6), jnp.ones((f - 1) * 6)]).astype(
        jnp.float32)
    S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
    rhs = rhs * mask
    diag = jnp.diagonal(S)
    S = S + cfg.damping * jnp.diag(jnp.abs(diag)) + 1e-6 * jnp.eye(f * 6)
    delta = jnp.linalg.solve(S, rhs).reshape(f, 6)
    delta = delta.at[0].set(0.0)
    # fixed-shape backtracking line search on the fixed-weight robust
    # cost (same landmarks): a raw GN step from a far-off linearization
    # overshoots (measured: every full step REJECTED on real chunks);
    # scaled steps still capture most of the descent direction
    def cost(p):
        uv_, z_, _ = _project(p, X_obs, K)
        r_ = uv_ - fxy
        rn_ = jnp.linalg.norm(r_, axis=-1)
        h_ = jnp.minimum(1.0, cfg.huber_px / jnp.maximum(rn_, 1e-9))
        return jnp.sum(w * h_ * rn_ * rn_)

    scales = jnp.array([1.0, 0.5, 0.25, 0.1, 0.03, 0.0], jnp.float32)

    def at_scale(s):
        p = jax.vmap(lambda T, d: T @ lie.se3_exp(s * d))(poses, delta)
        return p, cost(p)

    cands, costs = jax.lax.map(at_scale, scales)
    k = jnp.argmin(costs)
    return jax.tree_util.tree_map(lambda a: a[k], cands)


def _pose_step(poses, poses_init, X_obs, fxy, w_obs, K, cfg: ChunkBaConfig):
    """One damped Gauss-Newton step on all poses (landmarks fixed).

    With landmarks held, the normal equations are block-diagonal over
    poses: accumulate per-frame 6x6 systems and solve them batched.
    Pose 0 (the chunk's overlap frame) is the gauge and stays fixed.
    """
    f = poses.shape[0]
    uv, z, Xc = _project(poses, X_obs, K)
    r = uv - fxy                                                  # (F, N, 2)
    rn = jnp.linalg.norm(r, axis=-1)
    huber = jnp.minimum(1.0, cfg.huber_px / jnp.maximum(rn, 1e-9))
    w = w_obs * huber * (z > cfg.min_depth) * (rn < cfg.gate_px)  # (F, N)

    fx, fy = K[0, 0], K[1, 1]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    # dproj/dXc (F, N, 2, 3)
    zero = jnp.zeros_like(z)
    P = jnp.stack([
        jnp.stack([fx / zs, zero, -fx * Xc[..., 0] / zs**2], -1),
        jnp.stack([zero, fy / zs, -fy * Xc[..., 1] / zs**2], -1),
    ], -2)
    # dXc/dxi for right-perturbation T <- T exp(xi), xi = [rho, phi]:
    # Xc -> Xc - rho - phi x Xc  =>  J = [-I | skew(Xc)]
    sk = lie.skew(Xc)                                             # (F, N, 3, 3)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), sk.shape)
    JX = jnp.concatenate([-eye3, sk], -1)                         # (F, N, 3, 6)
    J = jnp.einsum("fnab,fnbc->fnac", P, JX)                      # (F, N, 2, 6)

    Jw = J * w[..., None, None]
    H = jnp.einsum("fnra,fnrb->fab", Jw, J)                       # (F, 6, 6)
    g = jnp.einsum("fnra,fnr->fa", Jw, r)                         # (F, 6)

    # weak twist prior toward the initial chain poses: anchors the
    # monocular scale gauge and frames with too few observations
    e_prior = jax.vmap(lambda Ti, T: lie.se3_log(lie.se3_inverse(Ti) @ T))(
        poses_init, poses)
    H = H + cfg.prior_weight * jnp.eye(6, dtype=jnp.float32)[None]
    g = g + cfg.prior_weight * e_prior

    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    H = H + cfg.damping * jax.vmap(jnp.diag)(diag) + 1e-8 * jnp.eye(6)[None]
    delta = -jax.vmap(cholesky_solve)(H, g)                       # (F, 6)
    delta = delta.at[0].set(0.0)                                  # gauge
    return jax.vmap(lambda T, d: T @ lie.se3_exp(d))(poses, delta)


def refine(poses_init, fxy, fvalid, midx, cinl, K,
           cfg: ChunkBaConfig, rot_scale=1.0):
    """Refine the chunk's poses against multiview feature tracks.

    poses_init: (F, 4, 4) world-from-camera from the scaled VO chain
    (F = chunk + 1 incl. the overlap frame). fxy/fvalid: (F, N)
    undistorted keypoints. midx/cinl: (F-1, N) consecutive-pair match
    indices and inlier flags (see build_tracks). Returns (poses,
    mean_reproj_px_before, mean_reproj_px_after, geo_depth, depth_cnt).

    geo_depth/depth_cnt: the multi-view landmark-depth PIN statistic —
    masked geometric-mean camera-frame depth over well-conditioned
    observations (>= 3-frame tracks, in-gate, positive depth) of the
    final reconstruction, and the observation count behind it. Two-view
    pair depths at consecutive-frame baselines (~2% b/z) carry a
    resolution-dependent multiplicative bias (r4 edge audits: +21% on
    the low-res rotloop) because the triangulation noise is huge and
    asymmetric; landmarks triangulated from every frame of the chunk
    see up to a chunk-length baseline and land far closer to the true
    depth distribution, so pinning the chain's metric on THIS geomean
    (eval/chunked.py ba_scale_pin) removes most of the prior-pin
    lottery that config.vo_scene_depth otherwise suffers.
    """
    f, n = fvalid.shape
    num_l = f * n
    ids = build_tracks(midx, cinl, n)
    obs_valid = fvalid.astype(jnp.float32)

    # observation weight: only tracks seen in >= 2 frames constrain
    # anything; singles get weight 0 everywhere
    cnt0 = jnp.zeros((num_l,), jnp.float32).at[ids.reshape(-1)].add(
        obs_valid.reshape(-1))
    w_obs = obs_valid * (cnt0 >= 2.0 - 1e-3).astype(jnp.float32)[ids]

    def mean_err(poses, X):
        uv, z, _ = _project(poses, X[ids], K)
        rn = jnp.linalg.norm(uv - fxy, axis=-1)
        ok = (w_obs > 0) & (z > cfg.min_depth) & (rn < cfg.gate_px)
        okf = ok.astype(jnp.float32)
        return jnp.sum(rn * okf) / jnp.maximum(jnp.sum(okf), 1.0)

    X0, _ = triangulate_tracks(poses_init, fxy, w_obs, ids, K, num_l)
    err_before = mean_err(poses_init, X0)

    def outer(_, poses):
        # joint Schur step (triangulation happens inside, against the
        # current poses); see _joint_step for why alternation is not used
        return _joint_step(poses, poses_init, ids, fxy, w_obs, K, num_l,
                           cfg, rot_scale)

    poses = jax.lax.fori_loop(0, cfg.outer_iters, outer, poses_init)

    # monocular scale-gauge repin: reprojection cost is FLAT along the
    # global scale of (trajectory + landmarks), so GN iterations slide
    # along it (measured: reproj 4.4 -> 0.02 px while position error
    # grew). Restore the initial chain's total path length about the
    # gauge pose — BA's job is the SHAPE; scale belongs to the
    # scale-chain estimator (epipolar.pin_scale).
    p_init = poses_init[:, :3, 3]
    p_ref = poses[:, :3, 3]
    len_init = jnp.sum(jnp.linalg.norm(p_init[1:] - p_init[:-1], axis=1))
    len_ref = jnp.sum(jnp.linalg.norm(p_ref[1:] - p_ref[:-1], axis=1))
    s = len_init / jnp.maximum(len_ref, 1e-9)
    poses = poses.at[:, :3, 3].set(p_ref[0] + s * (p_ref - p_ref[0]))

    Xf, cntf = triangulate_tracks(poses, fxy, w_obs, ids, K, num_l)
    err_after = mean_err(poses, Xf)

    # multi-view landmark-depth pin statistic (see docstring): geomean
    # depth of the final reconstruction, PER LANDMARK and gated on ray
    # conditioning, in the chain's current metric (the scale repin above
    # keeps the refined poses on the chain's path length).
    #
    # Gating matters more than the estimator: a naive per-observation
    # geomean is dominated by near-parallel-ray tracks whose midpoint
    # depths scatter to the clip rails asymmetrically (measured on the
    # low-res rotloop: umeyama 0.58 -> 0.36, i.e. WORSE than the
    # two-view pin). The conditioning proxy is the ray spread
    # s2 = cnt - |sum d|^2 / cnt ~= sum_i sin^2(angle to the mean ray):
    # exactly the smallest-eigenvalue direction of the midpoint normal
    # matrix sum(I - d d^T), i.e. how observable the depth actually is.
    uvf, zf, _ = _project(poses, Xf[ids], K)
    rnf = jnp.linalg.norm(uvf - fxy, axis=-1)
    well = ((w_obs > 0) & (zf > cfg.min_depth) & (rnf < cfg.gate_px)
            & ((cntf >= 3.0 - 1e-3)[ids]))
    wellf = well.astype(jnp.float32)
    d, _ = _cam_rays_world(poses, fxy, K)
    flat = ids.reshape(-1)
    ocnt = jnp.zeros((num_l,), jnp.float32).at[flat].add(wellf.reshape(-1))
    dsum = jnp.zeros((num_l, 3), jnp.float32).at[flat].add(
        (d * wellf[..., None]).reshape(-1, 3))
    s2 = ocnt - jnp.sum(dsum * dsum, -1) / jnp.maximum(ocnt, 1.0)
    lzsum = jnp.zeros((num_l,), jnp.float32).at[flat].add(
        jnp.where(well, jnp.log(jnp.clip(zf, 1e-3, 1e4)), 0.0).reshape(-1))
    lz = lzsum / jnp.maximum(ocnt, 1.0)                # per-landmark log z
    # s2 >= 3e-3 ~= a 3-degree total ray spread: below it the midpoint
    # depth is noise (2% per-frame baselines need ~3+ well-spread views)
    lm_ok = (ocnt >= 3.0 - 1e-3) & (s2 >= 3e-3) & jnp.isfinite(lz)
    zcnt = jnp.sum(lm_ok.astype(jnp.float32))
    # aggregate across landmarks with the robust log-median (same
    # rationale as epipolar.pin_scale: small-depth outlier landmarks
    # from surviving mismatches drag a mean-based statistic)
    from aria_slam_tpu.ops.epipolar import masked_log_median

    geo_z, _ = masked_log_median(jnp.exp(lz), lm_ok)
    return poses, err_before, err_after, geo_z, zcnt
