"""Oracle probe: scene-depth pin estimators vs ground-truth |t|.

Measures, per consecutive pair of a synthetic rotloop scene, the ratio
pin / |t_gt| for the pin estimators (1.0 = the pin recovers the true
translation magnitude given a correct scene-depth prior):

  pin_base   : production pin — triangulate under the estimated pose
               (ops/epipolar.pair_depths + pin_scale)
  pin_gt     : triangulate under the GT pose (oracle upper bound)
  pin_tfree  : t-direction-free debiased parallax ranges
               (ops/epipolar.tfree_parallax_depths) with the estimated
               direction; *_gtdir uses the GT direction (oracle,
               isolates the sin(alpha) error source)

This is the measurement behind PipelineConfig.vo_pin_estimator's
documentation (PIN_PROBE_r05.json, z-depth semantics): at the low-res /
2%-baseline operating point the production pin reads ~2.24x large
(direction noise inflates apparent parallax — CLAUDE.md known gaps)
while tfree reads ~1.45x with lower scatter (log-std 0.43 vs 0.55) —
half the log-bias; at full res production is within ~8% (0.92) and
tfree ~13% low (0.87), so the default stays "triangulated". Even the
GT-pose oracle reads 0.85/0.82 (match-noise floor), so ratios should
be judged against it, not 1.0.

Run (CPU is fine — estimators are backend-agnostic, Pallas/XLA parity
is bit-exact on chip):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python -m aria_slam_tpu.eval.pin_probe [--full-res] [--out F]

Reference comparison: the reference never pins scale (unit-|t|
recoverPose accumulation, src/main.cpp:187-201) — this probe audits a
capability it does not have.
"""

import argparse
import json
import os

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def run(full_res: bool, frames: int = 240, scene_dir: str | None = None,
        verbose: bool = True, lag: int = 1) -> dict:
    """lag: pair frames (i, i+lag). Wider pairs carry lag-x baseline, so
    the translation-direction noise that drives the low-res pin bias
    falls ~lag^2 while the scene depth (the pinned quantity) is
    unchanged — the r5 probe ladder measuring whether a lag-pin
    out-conditions the consecutive pin (VERDICT r5 follow-up to the r4
    'backbone pins read -29%' finding).

    Estimator key (per pair, ratio pin/|t_gt|, 1.0 = perfect):
      pin_base        triangulated, est pose, est inliers (production)
      pin_gt          triangulated, GT pose, est inliers
      pin_gt_gtinl    triangulated, GT pose, GT-epipolar inliers —
                      isolates the RANSAC-selection bias (difference
                      vs pin_gt is pure inlier-selection)
      pin_tfree       t-free parallax, est direction
      pin_tfree_gtdir t-free parallax, GT direction
      pin_rms         moment-debiased RMS parallax, est direction:
                      sqrt(mean(sin^2 a d1z^2)/mean(usq - 2 sig^2)) —
                      the per-point 1/beta floor in tfree biases its
                      geomean; the ratio-of-means form is unbiased in
                      the numerator/denominator moments
      pin_rms_gtdir   same, GT direction
    """
    import jax
    import jax.numpy as jnp

    import aria_slam_tpu  # noqa: F401  (matmul precision pin)
    from aria_slam_tpu.eval.accuracy_benchmark import benchmark_config
    from aria_slam_tpu.io import euroc, synthetic_scene
    from aria_slam_tpu.ops import epipolar as E
    from aria_slam_tpu.ops import match as match_ops, orb

    cfg = benchmark_config(full_res=full_res, frames=frames)
    scene_depth = 4.0
    if scene_dir is None:
        scene_dir = f"/tmp/pin_probe_scene_{frames}_" + (
            "full" if full_res else "low")
    if not os.path.exists(os.path.join(scene_dir, "mav0")):
        synthetic_scene.generate(scene_dir, num_frames=frames, fps=10.0,
                                 cam=cfg.camera, depth=scene_depth,
                                 traj="rotloop", period=20.0)
    data = euroc.load(scene_dir)
    cam = cfg.camera
    K = jnp.asarray([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                    jnp.float32)
    focal = 0.5 * (cam.fx + cam.fy)
    in_thresh_sq = (cfg.ransac.inlier_threshold_px / focal) ** 2

    # GT relative poses, x_cur = R x_prev + t (synthetic body == camera)
    def gt_T(i):
        t = float(np.clip(data.image_ts[i], data.gt_ts[0], data.gt_ts[-1]))
        pos, q = euroc.interpolate_gt(data, t)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
             2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
             2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w),
             1 - 2 * (x * x + y * y)],
        ])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = pos
        return T

    Ts = [gt_T(i) for i in range(frames)]
    n_pairs = frames - lag
    R_gt, t_gt = [], []
    for i in range(n_pairs):
        D = np.linalg.inv(Ts[i + lag]) @ Ts[i]
        R_gt.append(D[:3, :3])
        t_gt.append(D[:3, 3])
    R_gt = np.stack(R_gt).astype(np.float32)
    t_gt = np.stack(t_gt).astype(np.float32)
    t_gt_norm = np.linalg.norm(t_gt, axis=1)
    t_gt_unit = t_gt / np.maximum(t_gt_norm[:, None], 1e-12)

    # batched feature extraction for all frames
    B = 16
    feats = []
    ex = jax.jit(lambda im: orb.extract_batch(im, cfg.orb))
    for s in range(0, frames, B):
        imgs = np.stack([euroc.load_image(p).astype(np.float32)
                         for p in data.image_paths[s:s + B]])
        if imgs.shape[0] < B:
            pad = np.zeros((B - imgs.shape[0],) + imgs.shape[1:],
                           np.float32)
            imgs = np.concatenate([imgs, pad])
        feats.append(ex(jnp.asarray(imgs)))
        if verbose:
            print(f"extracted {min(s + B, frames)}/{frames}", flush=True)
    feats = jax.tree.map(lambda *xs: jnp.concatenate(xs)[:frames], *feats)

    def pair_stats(pf, cf, key, Rg, tg_unit):
        mm = match_ops.match(cf, pf, cfg.matcher.ratio)
        xy_prev = jnp.take_along_axis(pf.xy, mm.train_idx[:, None], 0)
        valid = mm.valid & pf.valid[mm.train_idx] & cf.valid
        delta = E.estimate_pose_gyro_fused(
            xy_prev, cf.xy, valid, K, cfg.ransac, key, Rg,
            jnp.asarray(True), in_thresh_sq)

        z1, _, zgood = E.pair_depths(delta, xy_prev, cf.xy, valid, K)
        pin_base, _ = E.pin_scale(z1, zgood, scene_depth)

        p1 = E.normalize_points(xy_prev, K)
        p2 = E.normalize_points(cf.xy, K)
        z1g, _ = E.triangulate_depths(Rg, tg_unit, p1, p2)
        ggood = valid & delta.inlier_mask & (z1g > 1e-3) & (z1g < 1e4)
        pin_gt, _ = E.pin_scale(z1g, ggood, scene_depth)

        sig = cfg.vo_pin_sigma_px
        zt, tgood = E.tfree_parallax_depths(delta, xy_prev, cf.xy, valid,
                                            K, sig)
        pin_tfree, _ = E.pin_scale(zt, tgood, scene_depth)
        # oracle direction variant: same debiased beta, GT sin(alpha)
        d_gt = delta.replace(t=tg_unit)  # flax.struct dataclass
        ztg, tggood = E.tfree_parallax_depths(d_gt, xy_prev, cf.xy, valid,
                                              K, sig)
        pin_tfree_gtdir, _ = E.pin_scale(ztg, tggood, scene_depth)

        # selection-bias oracle: GT pose AND GT-epipolar inliers (the
        # only difference vs pin_gt is WHICH matches count — any gap is
        # pure RANSAC/Sampson selection bias)
        from aria_slam_tpu.core import lie as lie_mod

        E_gt = lie_mod.skew(tg_unit) @ Rg
        s_err = E.sampson_error(E_gt, p1, p2)
        inl_gt = (s_err < in_thresh_sq) & valid
        ggood2 = inl_gt & (z1g > 1e-3) & (z1g < 1e4)
        pin_gt_gtinl, _ = E.pin_scale(z1g, ggood2, scene_depth)

        # moment-debiased RMS parallax pin (est / GT direction): the
        # ratio-of-means form is unbiased in both moments, unlike the
        # per-point 1/beta geomean that the tfree floor biases
        def rms_pin(t_dir, mask):
            f1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], -1)
            f2 = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], -1)
            d1 = f1 / jnp.maximum(
                jnp.linalg.norm(f1, axis=-1, keepdims=True), 1e-9)
            d2p = f2 @ delta.R
            d2p = d2p / jnp.maximum(
                jnp.linalg.norm(d2p, axis=-1, keepdims=True), 1e-9)
            u = d2p - jnp.sum(d2p * d1, -1, keepdims=True) * d1
            usq = jnp.sum(u * u, -1)
            focal_ = 0.5 * (K[0, 0] + K[1, 1])
            sig2 = (sig / focal_) ** 2
            beta2 = usq - 2.0 * sig2      # unbiased, may be negative
            b = -(t_dir @ delta.R)
            b = b / jnp.maximum(jnp.linalg.norm(b), 1e-12)
            bp = b[None, :] - jnp.sum(b[None, :] * d1, -1,
                                      keepdims=True) * d1
            s2z2 = jnp.sum(bp * bp, -1) * d1[:, 2] ** 2
            m = mask.astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            num = jnp.sum(jnp.where(mask, s2z2, 0.0)) / cnt
            den = jnp.sum(jnp.where(mask, beta2, 0.0)) / cnt
            z_rms = jnp.sqrt(num / jnp.maximum(den, 1e-12))
            return scene_depth / jnp.maximum(z_rms, 1e-3)

        rms_mask = delta.inlier_mask & valid
        pin_rms = rms_pin(delta.t, rms_mask)
        pin_rms_gtdir = rms_pin(tg_unit, rms_mask)

        return dict(pin_base=pin_base, pin_gt=pin_gt, pin_tfree=pin_tfree,
                    pin_tfree_gtdir=pin_tfree_gtdir,
                    pin_gt_gtinl=pin_gt_gtinl,
                    pin_rms=pin_rms, pin_rms_gtdir=pin_rms_gtdir,
                    ok=delta.success)

    pj = jax.jit(pair_stats)
    keys = jax.random.split(jax.random.PRNGKey(0), n_pairs)
    rows = []
    for i in range(n_pairs):
        pf = jax.tree.map(lambda x: x[i], feats)
        cf = jax.tree.map(lambda x: x[i + lag], feats)
        r = pj(pf, cf, keys[i], jnp.asarray(R_gt[i]),
               jnp.asarray(t_gt_unit[i]))
        rows.append({k: float(v) for k, v in r.items()})
        if verbose and i % 40 == 0:
            print(f"pair {i}/{n_pairs}", flush=True)

    ok = np.array([r["ok"] > 0 for r in rows]) & (t_gt_norm > 1e-4)
    out = {"full_res": full_res, "frames": frames, "lag": lag,
           "pairs_ok": int(ok.sum()), "pairs": len(rows),
           "sigma_px": cfg.vo_pin_sigma_px, "estimators": {}}
    for name in ("pin_base", "pin_gt", "pin_gt_gtinl", "pin_tfree",
                 "pin_tfree_gtdir", "pin_rms", "pin_rms_gtdir"):
        ratio = np.array([r[name] for r in rows])[ok] / t_gt_norm[ok]
        lr = np.log(np.clip(ratio, 1e-6, 1e6))
        out["estimators"][name] = {
            "geomean_ratio": round(float(np.exp(lr.mean())), 3),
            "log_std": round(float(lr.std()), 3),
            "median_ratio": round(float(np.exp(np.median(lr))), 3),
        }
        if verbose:
            print(f"{name:16s} {out['estimators'][name]}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full-res", action="store_true")
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--scene", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--lags", type=int, nargs="+", default=[1],
                    help="pair lags to sweep (e.g. --lags 1 2 4 8)")
    args = ap.parse_args()
    if args.lags == [1]:
        rep = run(args.full_res, args.frames, args.scene)
    else:
        rep = {f"lag{g}": run(args.full_res, args.frames, args.scene,
                              lag=g) for g in args.lags}
    print(json.dumps(rep, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=1)


if __name__ == "__main__":
    main()
