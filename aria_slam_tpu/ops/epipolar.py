"""Essential-matrix RANSAC + pose recovery, fully batched on device.

Parity: cv::findEssentialMat(RANSAC, prob=0.999, thresh=1.0px) +
cv::recoverPose (reference src/main.cpp:187-191, src/euroc_eval.cpp:186-191).

TPU design (SURVEY.md §7.3 item 2): OpenCV's sequential adaptive RANSAC
becomes a fixed budget of `num_hypotheses` 8-point solves, vmapped so
that hypothesis generation, Sampson scoring over all matches, and the
winner reduction are one compiled program. The 9x9 normal-equation
eigendecomposition and the 3x3 SVDs batch cleanly on device.

Conventions: E satisfies x2^T E x1 = 0 for normalized image coords
x = K^-1 [u, v, 1]^T; the recovered (R, t) place camera-2 relative to
camera-1: X_cam2 = R @ X_cam1 + t, |t| = 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aria_slam_tpu.config import RansacConfig
from aria_slam_tpu.core.types import Matches, PoseDelta


def normalize_points(uv: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel (N, 2) -> normalized camera coords (N, 2)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    return jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], -1)


def _homog(p):
    return jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1)


def smallest_eigvec_9(M: jnp.ndarray, iters: int = 3) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of a symmetric PSD
    (..., 9, 9) matrix.

    Regularized inverse iteration on a statically-unrolled batched
    Cholesky (ops/linalg.py): both jnp.linalg.eigh and jnp.linalg.
    cholesky lower to sequential sweeps on this stack (~400 ms / ~30 ms
    latency at 256x9x9); the unrolled form is microseconds. The smallest
    eigenvalue of an 8-point normal matrix is (near-)zero, so inverse
    iteration converges in one or two steps.
    """
    from aria_slam_tpu.ops.linalg import smallest_eigvec

    return smallest_eigvec(M, iters)


def _normal_matrix(p1, p2, w):
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    ones = jnp.ones_like(x1)
    # row: [x2x1, x2y1, x2, y2x1, y2y1, y2, x1, y1, 1]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], -1)
    return (A * w[:, None]).T @ A  # (9, 9)


def project_to_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Force singular values to (1, 1, 0) (one 3x3 SVD — only applied to
    the winning hypothesis, not all of them; unrolled Jacobi svd3
    because jnp.linalg.svd lowers to slow sweeps on this stack)."""
    from aria_slam_tpu.ops.linalg import svd3

    U, S, Vt = svd3(E)
    S_proj = jnp.array([1.0, 1.0, 0.0], E.dtype)
    return (U * S_proj[None, :]) @ Vt


def eight_point(p1: jnp.ndarray, p2: jnp.ndarray, w: jnp.ndarray,
                project: bool = True) -> jnp.ndarray:
    """Weighted 8-point estimate of E from normalized coords.

    p1, p2: (N, 2); w: (N,) weights (0/1 mask or soft). With
    project=False the raw nullspace estimate is returned (fundamental-
    style Sampson scoring is valid on it; the manifold projection is
    deferred to the winner).
    """
    AtA = _normal_matrix(p1, p2, w)
    E = smallest_eigvec_9(AtA).reshape(3, 3)
    return project_to_essential(E) if project else E


def sampson_error(E: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance (N,) in normalized coords."""
    x1 = _homog(p1)  # (N, 3)
    x2 = _homog(p2)
    Ex1 = x1 @ E.T       # (N, 3) = E @ x1
    Etx2 = x2 @ E        # (N, 3) = E^T @ x2
    num = jnp.sum(x2 * Ex1, -1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _sample_indices(key, valid, num_hypotheses, sample_size):
    """(H, S) indices drawn from valid matches (with replacement across
    hypotheses; degenerate duplicate draws within a sample just yield a
    weak hypothesis that loses the inlier vote)."""
    logits = jnp.where(valid, 0.0, -1e30)
    flat = jax.random.categorical(key, logits, shape=(num_hypotheses * sample_size,))
    return flat.reshape(num_hypotheses, sample_size)


def triangulate_depths(R, t, p1, p2):
    """Two-view depths for cheirality. p1, p2 normalized (N, 2).

    For x2 ~ R x1 + t (rays f1 = [p1, 1], f2 = [p2, 1]):
        z1 * (R f1) x f2 = - t x f2  ->  z1 = <c2, c1> / |c1|^2
    with c1 = cross(R f1, f2), c2 = cross(f2, t); z2 from the transport.
    Returns (z1, z2), each (N,).
    """
    f1 = _homog(p1)
    f2 = _homog(p2)
    Rf1 = f1 @ R.T
    c1 = jnp.cross(Rf1, f2)
    c2 = jnp.cross(f2, jnp.broadcast_to(t, f2.shape))
    z1 = jnp.sum(c1 * c2, -1) / jnp.maximum(jnp.sum(c1 * c1, -1), 1e-12)
    pt2 = z1[:, None] * Rf1 + t[None, :]
    z2 = pt2[:, 2]
    return z1, z2


def decompose_essential(E: jnp.ndarray):
    """E -> (R1, R2, t) candidate factors with proper rotations."""
    from aria_slam_tpu.ops.linalg import svd3

    U, _, Vt = svd3(E)
    # force proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return R1, R2, t


def recover_pose(E, p1, p2, weights):
    """Pick the (R, t) chirality candidate with most points in front of
    both cameras (parity: cv::recoverPose). weights: (N,) inlier mask."""
    R1, R2, t = decompose_essential(E)
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t, -t, t, -t])

    def count_front(R, tt):
        z1, z2 = triangulate_depths(R, tt, p1, p2)
        return jnp.sum(((z1 > 0) & (z2 > 0)).astype(jnp.float32) * weights)

    counts = jax.vmap(count_front)(cands_R, cands_t)
    best = jnp.argmax(counts)
    return cands_R[best], cands_t[best], counts[best]


def translation_given_rotation(R, p1, p2, w, refine_rounds: int = 1,
                               thresh_sq=None, valid=None):
    """Unit translation direction with the rotation KNOWN (e.g. from an
    integrated gyro): each correspondence gives the linear constraint
    (x2 x (R x1)) . t = 0, so t is the smallest eigenvector of a 3x3
    normal matrix — cheaper AND better-conditioned than joint (R, t)
    estimation, and it keeps the pair's geometry self-consistent (a
    gyro R glued to a VO t estimated under a different rotation breaks
    downstream reprojection gates — measured on the mapper).

    Returns (t_unit, inlier_mask) — the mask refreshed under [t]x R
    when thresh_sq/valid are given (else the input weights as bool)."""
    from aria_slam_tpu.ops.linalg import eigh3

    x1 = _homog(p1)
    x2 = _homog(p2)
    c = jnp.cross(x2, x1 @ R.T)                     # (N, 3)
    # degenerate-seed guard: when the caller's weights are (near-)empty
    # (e.g. visual RANSAC failed and passed an all-zero inlier mask), M
    # would be ~0 and eigh3 returns an ARBITRARY direction — which the
    # Sampson-gate refresh below can then lock a consensus around,
    # marking the pair successful with a meaningless translation. Seed
    # from all valid correspondences instead (IRLS + the gate refresh
    # still prune outliers).
    fb = (valid.astype(p1.dtype) if valid is not None
          else jnp.ones_like(w))
    ww = jnp.where(jnp.sum(w) >= 3.0, w, fb)

    t = None
    for _ in range(max(1, refine_rounds + 1)):
        M = (c * ww[:, None]).T @ c                 # (3, 3) PSD
        _, vecs = eigh3(M)                          # ascending eigenvalues
        t = vecs[:, 0]
        if thresh_sq is not None and valid is not None:
            errs = sampson_error(lax_skew_E(R, t), p1, p2)
            ww = ((errs < thresh_sq) & valid).astype(p1.dtype)

    # cheirality: pick the sign that puts points in front
    def front(tt):
        z1, z2 = triangulate_depths(R, tt, p1, p2)
        return jnp.sum(((z1 > 0) & (z2 > 0)).astype(jnp.float32) * ww)

    t = jnp.where(front(-t) > front(t), -t, t)
    if thresh_sq is not None and valid is not None:
        errs = sampson_error(lax_skew_E(R, t), p1, p2)
        return t, (errs < thresh_sq) & valid
    return t, w > 0


def _tangent_basis(t):
    """(3, 2) orthonormal basis of the plane normal to unit t (the
    translation's 2-dof update space on the sphere)."""
    # pick the world axis least aligned with t for a stable first leg
    a = jnp.where(jnp.abs(t[0]) < 0.7,
                  jnp.array([1.0, 0.0, 0.0], t.dtype),
                  jnp.array([0.0, 1.0, 0.0], t.dtype))
    b1 = jnp.cross(t, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-9)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], -1)


def polish_pose_sampson(R, t, p1, p2, w, thresh, iters: int = 8,
                        damping: float = 1e-4):
    """Gauss-Newton refinement of (R, t) on the 5-dof essential manifold
    minimizing robust Sampson error — the accuracy stage the linear
    8-point solve cannot provide (it minimizes ALGEBRAIC error, which at
    small baselines is noise-dominated: measured 3.5 deg rotation /
    50+ deg translation-direction error on sub-0.3 px correspondences
    before this polish). The reference's cv::findEssentialMat runs an
    equivalent internal refinement (Nister 5-pt + LM); this is the
    TPU-shaped version: fixed iteration count, jacfwd Jacobians, one
    batched 5x5 solve per step — vmappable across frame pairs.

    p1, p2: (N, 2) normalized coords; w: (N,) weights (inlier mask);
    thresh: Sampson gate (normalized^2) for the Huber width.
    """
    from aria_slam_tpu.core import lie
    from aria_slam_tpu.ops.linalg import cholesky_solve

    huber_delta = jnp.sqrt(thresh)

    def signed_residuals(R_, t_):
        E = lie.skew(t_) @ R_
        x1 = _homog(p1)
        x2 = _homog(p2)
        Ex1 = x1 @ E.T
        Etx2 = x2 @ E
        num = jnp.sum(x2 * Ex1, -1)
        den = (Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2
               + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2)
        return num / jnp.sqrt(jnp.maximum(den, 1e-12))

    def step(_, carry):
        R_, t_ = carry
        B = _tangent_basis(t_)

        def res(delta):
            phi, psi = delta[:3], delta[3:]
            Rn = R_ @ lie.so3_exp(phi)
            tn = lie.so3_exp(B @ psi) @ t_
            return signed_residuals(Rn, tn)

        zero = jnp.zeros(5, p1.dtype)
        r = res(zero)
        J = jax.jacfwd(res)(zero)                       # (N, 5)
        # Huber: w_i = min(1, delta/|r|) on top of the inlier mask
        wr = w * jnp.minimum(1.0, huber_delta / jnp.maximum(jnp.abs(r), 1e-12))
        Jw = J * wr[:, None]
        H = Jw.T @ J + damping * jnp.eye(5, dtype=p1.dtype)
        g = Jw.T @ r
        delta = -cholesky_solve(H, g)
        Rn = R_ @ lie.so3_exp(delta[:3])
        tn = lie.so3_exp(B @ delta[3:]) @ t_
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-9)
        # reject a diverged step (keeps the loop fixed-shape)
        c_old = jnp.sum(wr * r * r)
        r_new = signed_residuals(Rn, tn)
        w_new = w * jnp.minimum(1.0, huber_delta /
                                jnp.maximum(jnp.abs(r_new), 1e-12))
        c_new = jnp.sum(w_new * r_new * r_new)
        ok = c_new <= c_old
        return (jnp.where(ok, Rn, R_), jnp.where(ok, tn, t_))

    return jax.lax.fori_loop(0, iters, step, (R, t))


def estimate_relative_pose(
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    cfg: RansacConfig,
    key: jax.Array,
) -> PoseDelta:
    """Full RANSAC pipeline over padded correspondences.

    xy1, xy2: (N, 2) matched pixel coords (slot i of frame1 matches slot
    i of frame2); valid: (N,) mask.
    """
    p1 = normalize_points(xy1, K)
    p2 = normalize_points(xy2, K)
    n = p1.shape[0]
    focal = 0.5 * (K[0, 0] + K[1, 1])
    thresh_sq = (cfg.inlier_threshold_px / focal) ** 2
    validf = valid.astype(jnp.float32)

    idx = _sample_indices(key, valid, cfg.num_hypotheses, cfg.sample_size)  # (H, S)

    def solve_one(sample_idx):
        sp1 = p1[sample_idx]
        sp2 = p2[sample_idx]
        # unprojected nullspace estimate: Sampson scoring is valid on it,
        # and it avoids H batched 3x3 SVDs (only the winner is projected)
        return eight_point(sp1, sp2, jnp.ones(cfg.sample_size, p1.dtype),
                           project=False)

    Es = jax.vmap(solve_one)(idx)  # (H, 3, 3)
    errs = jax.vmap(lambda E: sampson_error(E, p1, p2))(Es)  # (H, N)
    inl = (errs < thresh_sq).astype(jnp.float32) * validf[None, :]
    scores = jnp.sum(inl, -1)  # (H,)
    best_h = jnp.argmax(scores)
    # keep the raw-estimate consensus: projecting a minimal-sample E onto
    # the essential manifold moves it enough to lose most of its inliers
    # under a 1 px gate, so the manifold projection is applied only after
    # (or as part of) the all-inlier refinement below
    E_best = project_to_essential(Es[best_h])
    inlier_mask = inl[best_h] > 0

    if cfg.refine:
        E_ref = eight_point(p1, p2, inlier_mask.astype(p1.dtype))  # projected
        errs_ref = sampson_error(E_ref, p1, p2)
        inl_ref = (errs_ref < thresh_sq) & valid
        better = jnp.sum(inl_ref) >= jnp.sum(inlier_mask)
        E_best = jnp.where(better, E_ref, E_best)
        inlier_mask = jnp.where(better, inl_ref, inlier_mask)

    R, t, front = recover_pose(E_best, p1, p2, inlier_mask.astype(p1.dtype))

    if cfg.h_fallback:
        # dominant-plane rescue: when a homography explains (nearly) the
        # whole consensus, the E above is degenerate — its translation
        # direction is arbitrary and the informative off-plane points
        # were voted out. Re-derive the motion from the planar structure
        # itself (see ops/homography.py; the reference has no guard for
        # this), then let the Sampson polish below refine it against the
        # refreshed consensus (incl. the re-admitted off-plane points).
        from aria_slam_tpu.ops import homography as homog

        Hm, h_mask, s_h = homog.estimate_homography(
            p1, p2, valid, jax.random.fold_in(key, 77),
            cfg.h_hypotheses, thresh_sq)
        R_h, t_h, strength = homog.best_h_motion(
            Hm, R, p1, p2, h_mask.astype(p1.dtype))
        s_e = jnp.sum(inlier_mask.astype(jnp.int32))
        use_h = ((s_h.astype(jnp.float32)
                  >= cfg.h_support_ratio * s_e.astype(jnp.float32))
                 & (strength > 3e-3))
        R = jnp.where(use_h, R_h, R)
        t = jnp.where(use_h, t_h, t)
        errs_fin = sampson_error(lax_skew_E(R, t), p1, p2)
        mask_fin = (errs_fin < thresh_sq) & valid
        inlier_mask = jnp.where(use_h, mask_fin, inlier_mask)

    if cfg.polish_iters > 0:
        # iterative Sampson GN on the essential manifold: the linear
        # 8-point minimizes algebraic error only — see polish_pose_sampson
        R, t = polish_pose_sampson(
            R, t, p1, p2, inlier_mask.astype(p1.dtype), thresh_sq,
            iters=cfg.polish_iters)
        E_pol = lax_skew_E(R, t)
        errs_pol = sampson_error(E_pol, p1, p2)
        inlier_mask = (errs_pol < thresh_sq) & valid

    num_inliers = jnp.sum(inlier_mask.astype(jnp.int32))
    z1f, z2f = triangulate_depths(R, t, p1, p2)
    front = jnp.sum(((z1f > 0) & (z2f > 0) & inlier_mask).astype(jnp.float32))
    # 0.35, not 0.5: at near-zero parallax the triangulated depth SIGN
    # is noise for many points, so a correct pose can sit near 50%
    # front; a wrong-sign translation puts nearly everything behind
    cheirality_ok = front > 0.35 * num_inliers
    if cfg.rot_only_rescue:
        # at a TRUE ~0-baseline pair even 0.35 is not safe: the depth
        # signs follow the arbitrary t direction and a correct pose
        # lands at front = 0 half the time (see RansacConfig). The
        # rotation-only residual angle(R p1, p2) is t-independent; when
        # it explains >= rot_only_frac of the epipolar consensus under
        # the same pixel threshold, the pair is in the rotation-only
        # regime where cheirality carries no information. Self-gating:
        # real parallax breaks this fit on near points.
        r1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1), p1.dtype)], -1)
        r2 = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1), p2.dtype)], -1)
        r1 = r1 / jnp.maximum(
            jnp.linalg.norm(r1, axis=-1, keepdims=True), 1e-9)
        r2 = r2 / jnp.maximum(
            jnp.linalg.norm(r2, axis=-1, keepdims=True), 1e-9)
        cosang = jnp.clip(jnp.sum((r1 @ R.T) * r2, -1), -1.0, 1.0)
        # small-angle: the pixel gate maps to thresh_px / focal radians
        rot_res_sq = 2.0 * (1.0 - cosang)  # = angle^2 for small angles
        rot_inl = (rot_res_sq < thresh_sq) & inlier_mask
        n_rot = jnp.sum(rot_inl.astype(jnp.float32))
        rot_only = ((n_rot > cfg.min_inliers)
                    & (n_rot >= cfg.rot_only_frac
                       * num_inliers.astype(jnp.float32)))
        cheirality_ok = cheirality_ok | rot_only
    success = (num_inliers > cfg.min_inliers) & cheirality_ok
    return PoseDelta(
        R=R, t=t, num_inliers=num_inliers, inlier_mask=inlier_mask, success=success
    )


def lax_skew_E(R, t):
    """E = [t]x R."""
    from aria_slam_tpu.core import lie

    return lie.skew(t) @ R


def scale_translation(delta: PoseDelta, xy1, xy2, valid, K,
                      scene_depth: float) -> jnp.ndarray:
    """Depth-scale normalization: rescale the unit translation so the
    typical triangulated inlier depth equals `scene_depth`. Keeps
    monocular trajectories metrically consistent up to ONE global scale
    (the reference accumulates |t| = 1 per frame).

    The depth statistic is the masked GEOMETRIC MEAN of clipped depths —
    robust to multiplicative outliers like a median, but a pure
    reduction (a 2000-element sort costs ~20 ms/pair on this stack)."""
    p1 = normalize_points(xy1, K)
    p2 = normalize_points(xy2, K)
    z1, _ = triangulate_depths(delta.R, delta.t, p1, p2)
    good = delta.inlier_mask & valid & (z1 > 1e-3)
    cnt = jnp.sum(good.astype(jnp.float32))
    zlog = jnp.log(jnp.clip(z1, 1e-3, 1e4))
    mean_log = jnp.sum(jnp.where(good, zlog, 0.0)) / jnp.maximum(cnt, 1.0)
    typical = jnp.exp(mean_log)
    ok = cnt >= 20
    scale = jnp.where(ok, scene_depth / jnp.maximum(typical, 1e-3), 1.0)
    return delta.t * jnp.clip(scale, 0.01, 100.0)


def pair_depths(delta: PoseDelta, xy1, xy2, valid, K):
    """Per-correspondence two-view depths under the pair's own unit-|t|
    scale. Returns (z1, z2, good): depths of each matched point in
    camera 1 / camera 2 plus an inlier/positivity/sanity mask. These are
    the raw material for monocular scale propagation: the same physical
    point seen from a shared frame by two different pairs has equal
    METRIC depth, so the ratio of its unit-scale depths is the ratio of
    the pairs' true translation scales."""
    p1 = normalize_points(xy1, K)
    p2 = normalize_points(xy2, K)
    z1, z2 = triangulate_depths(delta.R, delta.t, p1, p2)
    good = (delta.inlier_mask & valid
            & (z1 > 1e-3) & (z1 < 1e4) & (z2 > 1e-3) & (z2 < 1e4))
    return z1, z2, good


def tfree_parallax_depths(delta: PoseDelta, xy1, xy2, valid, K,
                          sigma_px: float):
    """Translation-direction-robust per-correspondence camera-1 z-DEPTHS
    under the pair's unit-|t| scale -> (z, good).

    The triangulated pin (pair_depths + pin_scale) is biased at tiny
    baselines because the estimated t DIRECTION is noise-bound (~60-70
    deg at 2% b/z) and projecting the displacement onto a wrong
    epipolar direction inflates apparent parallax (CLAUDE.md known
    gaps). This estimator never projects: the parallax magnitude is
    the full rotation-compensated angular displacement |u| between the
    unit rays d1 = f1-hat and d2' = (R^T f2)-hat, DEBIASED by the
    keypoint noise via E|u|^2 = beta^2 + 2 sigma^2 (two tangent-plane
    noise dofs), and the range follows from the sine rule with |t|=1:

        range_i = sin(alpha_i) / beta_i,  alpha_i = angle(baseline, d1)

    and the RANGE converts to camera-frame z-depth by the ray's z
    component (z = range * d1_z) so the pin target (vo_scene_depth)
    means the same quantity under both vo_pin_estimator settings —
    pair_depths returns z-depths, and without this factor switching
    estimators would shift the pinned metric by a systematic
    1/cos(ray angle) (few % to ~10% off-axis at this FoV; ADVICE r4).

    sin(alpha) still uses the estimated direction, but enters as a
    bounded multiplicative factor rather than a projection that can
    collapse toward 0. r5 probe (240-pair low-res rotloop, oracle
    |t_gt| ratios, PIN_PROBE_r05.json): triangulated geomean 2.24 /
    log-std 0.55, tfree 1.45 / 0.43 — half the log-bias; full-res
    0.92 vs 0.87 (triangulated stays the default there).
    sigma_px: see PipelineConfig.vo_pin_sigma_px.
    """
    p1 = normalize_points(xy1, K)
    p2 = normalize_points(xy2, K)
    f1 = _homog(p1)
    f2 = _homog(p2)
    d1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True), 1e-9)
    d2p = f2 @ delta.R  # rows: R^T f2 — cur-frame rays in the prev frame
    d2p = d2p / jnp.maximum(
        jnp.linalg.norm(d2p, axis=-1, keepdims=True), 1e-9)
    u = d2p - jnp.sum(d2p * d1, -1, keepdims=True) * d1
    usq = jnp.sum(u * u, -1)

    focal = 0.5 * (K[0, 0] + K[1, 1])
    sig2 = (sigma_px / focal) ** 2
    # soft floor: a feature whose displacement is all noise would get
    # beta ~ 0 (infinite depth); keep 5% of the raw magnitude instead
    beta = jnp.sqrt(jnp.maximum(usq - 2.0 * sig2, 0.05 * usq))

    # baseline direction in the prev frame: cam-2 center = -R^T t
    b = -(delta.t @ delta.R)
    b = b / jnp.maximum(jnp.linalg.norm(b), 1e-12)
    bp = b[None, :] - jnp.sum(b[None, :] * d1, -1, keepdims=True) * d1
    sin_alpha = jnp.linalg.norm(bp, axis=-1)

    # range -> z-depth: d1 is unit, so its z component is 1/|f1|
    z = sin_alpha / jnp.maximum(beta, 1e-9) * d1[:, 2]
    good = (delta.inlier_mask & valid & (z > 1e-3) & (z < 1e4))
    return z, good


def pin_depths(delta: PoseDelta, xy1, xy2, valid, K,
               estimator: str = "triangulated", sigma_px: float = 0.55):
    """Depth statistic feeding the scene-depth pin — dispatches on
    PipelineConfig.vo_pin_estimator (trace-time: configs are frozen).
    Chain ratios keep using pair_depths regardless: shared-frame depth
    RATIOS are scale-free, so the pin bias cancels there."""
    if estimator == "tfree_parallax":
        return tfree_parallax_depths(delta, xy1, xy2, valid, K, sigma_px)
    z1, _, good = pair_depths(delta, xy1, xy2, valid, K)
    return z1, good


def geomean_ratio(num, den, mask):
    """Masked geometric mean of num/den -> (ratio, count). Robust to
    multiplicative outliers like a median, but a pure reduction (sorts
    are slow on this stack, CLAUDE.md)."""
    cnt = jnp.sum(mask.astype(jnp.float32))
    r = jnp.log(jnp.clip(num, 1e-4, 1e5)) - jnp.log(jnp.clip(den, 1e-4, 1e5))
    mean = jnp.sum(jnp.where(mask, r, 0.0)) / jnp.maximum(cnt, 1.0)
    return jnp.exp(mean), cnt


def masked_log_median(z, mask, lo: float = -6.9, hi: float = 9.2,
                      bins: int = 256):
    """Approximate masked median of z in log space -> (median, count).

    A 256-bin histogram of log z + cumsum + within-bin interpolation:
    fixed-shape, one small scatter-add, no sort (lax.top_k/sort lower
    to a full sort network on this stack — CLAUDE.md). Bin width is
    ~6.3% in depth; linear interpolation inside the bin brings the
    quantization error to ~1-2%, far below the statistic's own noise.

    Robust-statistic utility for depth pinning experiments (the
    ba_scale_pin lever aggregates per-landmark depths with it). NOTE:
    switching pin_scale itself to this median was measured to NOT fix
    the low-res pin bias (umeyama 0.58 -> 0.48, slightly worse than the
    geomean): a GT-pose probe showed the matched-feature population is
    fine (geomean 4.19 vs the 4.0 prior) and the bias lives in
    triangulating under the ESTIMATED translation direction (~70 deg
    direction noise at 2% baselines inflates apparent parallax, so the
    BULK of depths reads small — no rank statistic can undo a bias
    that moves the whole distribution)."""
    lz = jnp.clip(jnp.log(jnp.clip(z, 1e-9, 1e9)), lo, hi)
    idx = ((lz - lo) * (bins / (hi - lo))).astype(jnp.int32)
    idx = jnp.clip(idx, 0, bins - 1)
    m = mask.astype(jnp.float32)
    h = jnp.zeros((bins,), jnp.float32).at[idx.reshape(-1)].add(
        m.reshape(-1))
    c = jnp.cumsum(h)
    tot = c[-1]
    half = 0.5 * tot
    k = jnp.sum((c < half).astype(jnp.int32))
    k = jnp.clip(k, 0, bins - 1)
    prev = jnp.where(k > 0, c[jnp.maximum(k - 1, 0)], 0.0)
    frac = jnp.clip((half - prev) / jnp.maximum(h[k], 1e-6), 0.0, 1.0)
    med = lo + (k.astype(jnp.float32) + frac) * ((hi - lo) / bins)
    return jnp.exp(med), tot


def pin_scale(z, mask, scene_depth: float, min_count: int = 20):
    """Absolute scale that pins the masked geometric-mean depth to
    scene_depth -> (scale, ok). The anchor for scale propagation and the
    fallback when too few shared features survive.

    Statistic choice (r4 probe, see masked_log_median): at low-res /
    2%-baseline operating points the pin reads ~1.4-1.8x large because
    the estimated translation DIRECTION is noise-bound and inflates
    triangulated parallax — a distribution-wide bias that the median
    does not reduce (measured slightly worse). The geomean stays; the
    accelerometer (fusion/vi_init) is the absolute-scale authority."""
    ones = jnp.ones_like(z)
    geo, cnt = geomean_ratio(z, ones, mask)
    ok = cnt >= min_count
    scale = jnp.where(ok, scene_depth / jnp.maximum(geo, 1e-3), 1.0)
    return jnp.clip(scale, 0.01, 100.0), ok


def mean_parallax_deg(delta: PoseDelta, xy1, xy2, valid, K):
    """Rotation-compensated mean ray parallax (degrees) over inliers ->
    (parallax_deg, count). Parallax ~ baseline/depth: below ~0.5 deg the
    essential-matrix translation (direction AND any derived scale) is
    noise — a zero-baseline revisit verifies with a perfect rotation but
    a meaningless unit t. This is the per-edge translation-confidence
    signal for the pose graph (PoseGraph.edge_twt)."""
    p1 = normalize_points(xy1, K)
    p2 = normalize_points(xy2, K)
    f1 = _homog(p1)
    f2 = _homog(p2)
    rf = f1 @ delta.R.T  # frame-1 rays expressed in frame 2
    cos = jnp.sum(rf * f2, -1) / jnp.maximum(
        jnp.linalg.norm(rf, axis=-1) * jnp.linalg.norm(f2, axis=-1), 1e-9)
    ang = jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    good = delta.inlier_mask & valid
    cnt = jnp.sum(good.astype(jnp.float32))
    mean = jnp.sum(jnp.where(good, ang, 0.0)) / jnp.maximum(cnt, 1.0)
    return mean, cnt


def parallax_t_weight(parallax_deg, full_at_deg: float = 1.0):
    """Translation confidence in [0, 1]: 0 below 0.2 deg mean parallax,
    ramping to 1 at `full_at_deg`."""
    lo = 0.2
    return jnp.clip((parallax_deg - lo) / jnp.maximum(full_at_deg - lo, 1e-6),
                    0.0, 1.0)


def gather_correspondences(f1_xy, f2_xy, matches: Matches):
    """Matches -> aligned (N, 2) coordinate arrays + mask."""
    xy1 = f1_xy[matches.query_idx]
    xy2 = f2_xy[matches.train_idx]
    return xy1, xy2, matches.valid


def estimate_pose_gyro_fused(xy_prev, xy_cur, valid, K, cfg: RansacConfig,
                             key, gyro_R, has_gyro,
                             in_thresh_sq) -> PoseDelta:
    """RANSAC two-view pose, then — where an integrated-gyro rotation
    is available (has_gyro) — replace the rotation with the gyro's and
    linearly re-solve the translation under that exact rotation,
    re-gating inliers with the Sampson threshold.

    The single fusion semantics shared by eval/chunked.py and
    eval/multi_eval.py (the single-sequence and data-parallel chunk
    paths must fuse identically — they previously carried diverging
    copies of this block). Solving t jointly with a rotation that is
    then discarded corrupts the chained poses; see
    translation_given_rotation.
    """
    delta = estimate_relative_pose(xy_prev, xy_cur, valid, K, cfg, key)
    t_g, mask_g = translation_given_rotation(
        gyro_R, normalize_points(xy_prev, K), normalize_points(xy_cur, K),
        delta.inlier_mask.astype(jnp.float32),
        thresh_sq=in_thresh_sq, valid=valid)
    ninl_g = jnp.sum(mask_g.astype(jnp.int32))
    return delta.replace(
        R=jnp.where(has_gyro, gyro_R, delta.R),
        t=jnp.where(has_gyro, t_g, delta.t),
        inlier_mask=jnp.where(has_gyro, mask_g, delta.inlier_mask),
        num_inliers=jnp.where(has_gyro, ninl_g, delta.num_inliers),
        success=jnp.where(
            has_gyro, ninl_g > cfg.min_inliers, delta.success),
    )
