"""On-chip Pallas <-> XLA parity gate (VERDICT r1 missing #5).

The CPU test suite always exercises the XLA fallbacks (ops/fast.py
use_pallas routes CPU away from Pallas); the actual TPU hot path is the
~380 LoC of Pallas kernels. This script runs each kernel AND its XLA
fallback on the SAME inputs on the real TPU and checks agreement:

  - match kernel  (ops/pallas/match_kernel.py) : bit-exact best/second/
    index vs hamming_matrix + top2_min (both use the same packed
    (dist << 20 | idx) min-reduction, so ties break identically).
  - patch kernel  (ops/pallas/patch_kernel.py) : near-exact vs the XLA
    one-hot gather (the kernel's selection matmuls run at bf16 pass
    precision: exact for the integer-valued test image, small rounding
    on blurred fractional values).
  - corner kernel (ops/pallas/corner_kernel.py): same corner set + near-
    equal Harris values in the interior vs rank_map_xla (the XLA box
    sums use reduce_window zero padding at borders while the kernel
    edge-replicates, so only the interior is comparable; the ORB
    edge_threshold=31 border mask discards the disputed band anyway).
  - full ORB extract (ops/orb.py both routes): keypoint set overlap and
    descriptor Hamming distance at common keypoints.

Usage (on the TPU rig):
    python tests_tpu/parity.py            # prints one JSON verdict line
Exit code 0 iff all gates pass. The committed artifact is
PARITY_TPU.json (written next to this file's repo root).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def _fetch(*arrays):
    """Force completion + host copy (block_until_ready is lazy on the
    relayed backend, CLAUDE.md)."""
    return [np.asarray(a) for a in arrays]


def check_match(results):
    import jax
    import jax.numpy as jnp

    from aria_slam_tpu.ops.match import hamming_matrix, top2_min
    from aria_slam_tpu.ops.pallas.match_kernel import match_top2_batched

    rng = np.random.default_rng(0)
    n, kq, kt, bits = 4, 2000, 2000, 256
    q = rng.integers(0, 2, (n, kq, bits)).astype(np.int8)
    t = rng.integers(0, 2, (n, kt, bits)).astype(np.int8)
    valid_t = rng.uniform(size=(n, kt)) > 0.1

    qd, td, vd = jnp.asarray(q), jnp.asarray(t), jnp.asarray(valid_t)

    pb, ps, pi = jax.jit(match_top2_batched)(qd, td, vd)

    def xla(qq, tt, vv):
        return jax.vmap(lambda a, b, c: top2_min(hamming_matrix(a, b, c)))(
            qq, tt, vv)

    xb, xs, xi = jax.jit(xla)(qd, td, vd)
    pb, ps, pi, xb, xs, xi = _fetch(pb, ps, pi, xb, xs, xi)

    res = {
        "best_exact": float(np.mean(pb == xb)),
        "second_exact": float(np.mean(ps == xs)),
        "idx_exact": float(np.mean(pi == xi)),
    }
    res["pass"] = (res["best_exact"] == 1.0 and res["second_exact"] == 1.0
                   and res["idx_exact"] == 1.0)
    results["match"] = res


def check_patch(results):
    import jax
    import jax.numpy as jnp

    from aria_slam_tpu.config import CameraConfig
    from aria_slam_tpu.io import synthetic_scene
    from aria_slam_tpu.ops import brief, orient
    from aria_slam_tpu.ops.pallas.patch_kernel import extract_patches

    cam = CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    tex = synthetic_scene._texture(seed=11)
    imgs = np.stack([
        synthetic_scene.render_frame(
            cam, tex, *synthetic_scene.trajectory(k / 10.0)).astype(np.float32)
        for k in range(2)
    ])  # integer-valued 0..255 -> exact under bf16 one-hot matmuls
    rng = np.random.default_rng(1)
    k = 2000
    r = brief.PATCH_R
    xy = np.stack([
        rng.uniform(r + 1, cam.width - r - 2, (2, k)),
        rng.uniform(r + 1, cam.height - r - 2, (2, k)),
    ], -1).astype(np.float32)

    imd, xyd = jnp.asarray(imgs), jnp.asarray(xy)
    pp = jax.jit(lambda a, b: extract_patches(a, b, r))(imd, xyd)
    xp = jax.jit(jax.vmap(lambda a, b: orient.gather_patches(a, b, r)))(imd, xyd)
    pp, xp = _fetch(pp, xp)

    diff = np.abs(pp - xp)
    res = {
        "max_abs_diff": float(diff.max()),
        "mean_abs_diff": float(diff.mean()),
    }
    res["pass"] = res["max_abs_diff"] <= 0.51  # bf16 rounding of 0..255 + blur
    results["patch"] = res


def check_corner(results):
    import jax
    import jax.numpy as jnp

    from aria_slam_tpu.config import CameraConfig
    from aria_slam_tpu.io import synthetic_scene
    from aria_slam_tpu.ops import fast
    from aria_slam_tpu.ops.pallas.corner_kernel import corner_rank_map_batched

    cam = CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    tex = synthetic_scene._texture(seed=12)
    imgs = np.stack([
        synthetic_scene.render_frame(
            cam, tex, *synthetic_scene.trajectory(0.3 + k / 10.0)
        ).astype(np.float32)
        for k in range(2)
    ])
    imd = jnp.asarray(imgs)
    thr = 20.0

    pr = jax.jit(lambda im: corner_rank_map_batched(im, thr))(imd)
    xr = jax.jit(jax.vmap(lambda im: fast.rank_map_xla(im, thr)))(imd)
    pr, xr = _fetch(pr, xr)

    # interior only: the XLA reduce_window zero-pads box sums at the
    # border; ORB masks edge_threshold=31 anyway
    m = 16
    pr = pr[:, m:-m, m:-m]
    xr = xr[:, m:-m, m:-m]
    p_corner = pr > -1e30
    x_corner = xr > -1e30
    agree = float(np.mean(p_corner == x_corner))
    both = p_corner & x_corner
    denom = np.maximum(np.abs(xr[both]), 1e3)
    rel = float(np.max(np.abs(pr[both] - xr[both]) / denom)) if both.any() else 0.0
    iou = float(both.sum() / max((p_corner | x_corner).sum(), 1))
    res = {
        "corner_mask_agreement": agree,
        "corner_set_iou": iou,
        "harris_max_rel_diff": rel,
        "num_corners_pallas": int(p_corner.sum()),
        "num_corners_xla": int(x_corner.sum()),
    }
    res["pass"] = agree > 0.9995 and iou > 0.99 and rel < 1e-3
    results["corner"] = res


def check_extract(results):
    import jax
    import jax.numpy as jnp

    from aria_slam_tpu.config import CameraConfig, OrbConfig
    from aria_slam_tpu.io import synthetic_scene
    from aria_slam_tpu.ops import orb

    cam = CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    cfg = OrbConfig()  # full 2000/8-level production config
    tex = synthetic_scene._texture(seed=13)
    imgs = np.stack([
        synthetic_scene.render_frame(
            cam, tex, *synthetic_scene.trajectory(0.7 + k / 10.0)
        ).astype(np.float32)
        for k in range(2)
    ])
    imd = jnp.asarray(imgs)

    # use_pallas() reads the env at TRACE time: lower/compile each route
    # explicitly so both run on the same TPU inputs
    os.environ["ARIA_SLAM_NO_PALLAS"] = "1"
    f_xla = jax.jit(lambda im: orb.extract_batch(im, cfg)).lower(imd).compile()
    del os.environ["ARIA_SLAM_NO_PALLAS"]
    f_pal = jax.jit(lambda im: orb.extract_batch(im, cfg)).lower(imd).compile()

    fp = f_pal(imd)
    fx = f_xla(imd)
    pxy, pdesc, pval = _fetch(fp.xy, fp.desc, fp.valid)
    xxy, xdesc, xval = _fetch(fx.xy, fx.desc, fx.valid)

    overlaps, dists = [], []
    for b in range(2):
        pset = {tuple(v) for v in pxy[b][pval[b]].astype(int)}
        xmap = {tuple(v): i for i, v in enumerate(xxy[b].astype(int))
                if xval[b][i]}
        common = pset & set(xmap)
        overlaps.append(len(common) / max(len(pset | set(xmap)), 1))
        pmap = {tuple(v): i for i, v in enumerate(pxy[b].astype(int))
                if pval[b][i]}
        for loc in common:
            d = int(np.sum(pdesc[b][pmap[loc]] != xdesc[b][xmap[loc]]))
            dists.append(d)
    dists = np.asarray(dists) if dists else np.zeros(1)
    res = {
        "keypoint_set_iou": float(np.mean(overlaps)),
        "desc_hamming_mean": float(dists.mean()),
        "desc_hamming_p99": float(np.percentile(dists, 99)),
        "num_common_kps": int(dists.size),
    }
    # approx_max_k tie order + bf16 patch rounding allow small slack
    res["pass"] = (res["keypoint_set_iou"] > 0.97
                   and res["desc_hamming_mean"] < 4.0
                   and res["desc_hamming_p99"] <= 24.0)
    results["extract"] = res


def main():
    import jax

    import aria_slam_tpu  # noqa: F401  (pins matmul precision)

    backend = jax.default_backend()
    results = {"backend": backend, "device": str(jax.devices()[0])}
    if backend == "cpu":
        print(json.dumps({"error": "parity gate must run on the TPU backend",
                          **results}))
        sys.exit(2)

    for name, fn in [("match", check_match), ("patch", check_patch),
                     ("corner", check_corner), ("extract", check_extract)]:
        try:
            fn(results)
        except Exception as e:  # pragma: no cover
            results[name] = {"pass": False, "error": repr(e)[:500]}
        print(f"[parity] {name}: {json.dumps(results[name])}", file=sys.stderr)

    results["pass"] = all(
        results[k].get("pass", False)
        for k in ("match", "patch", "corner", "extract")
    )
    print(json.dumps(results))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY_TPU.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    sys.exit(0 if results["pass"] else 1)


if __name__ == "__main__":
    main()
