"""On-chip sweep of chunk-BA outer_iters: after the r5 packed-fetch +
H2D-prefetch work, chunk_ba is ~70% of steady device time (473 ms of
674 ms/chunk-32, PREFETCH_r05.json). Each outer iteration is one joint
Schur GN step (backend/chunk_ba.py); if 4 match 8 on accuracy, the
full-SLAM steady state drops by ~7 ms/frame.

Runs the TIMING scene (240-frame full-res rotloop, full vio_lc config,
prefetch on) at chunk 32 with outer_iters in {4, 6, 8} and reports
steady_frame_ms + the full accuracy panel. -> BA_ITERS_r05.json

Run: python tests_tpu/ba_iters_probe.py   (uses the tunneled TPU).
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

ITERS = (8, 4, 6)  # reference arm first
CHUNK = 32
FRAMES = 240


def main():
    import jax

    from aria_slam_tpu.eval.accuracy_benchmark import benchmark_config
    from aria_slam_tpu.eval import euroc_eval
    from aria_slam_tpu.io import synthetic_scene

    print("device:", jax.devices()[0], flush=True)
    cfg0 = benchmark_config(full_res=True, frames=FRAMES)
    scene = "/tmp/timing_scene_240_full"
    if not os.path.exists(os.path.join(scene, "mav0")):
        synthetic_scene.generate(scene, num_frames=FRAMES, fps=10.0,
                                 cam=cfg0.camera, depth=4.0, traj="rotloop",
                                 period=20.0)
        print("scene generated:", scene, flush=True)

    out = {"frames": FRAMES, "chunk": CHUNK,
           "config": "full stack (accuracy benchmark vio_lc config, "
                     "752x480 / 2000 features), prefetch_h2d on",
           "runs": {}}
    for it in ITERS:
        cfg = dataclasses.replace(
            cfg0, chunk_ba=dataclasses.replace(cfg0.chunk_ba,
                                               outer_iters=it))
        res = euroc_eval.run(scene, out_dir=f"/tmp/ba_it{it}",
                             config=cfg, verbose=False, chunk=CHUNK)
        out["runs"][f"iters{it}"] = {
            "steady_frame_ms": round(res["steady_frame_ms"], 2),
            "loops": res["loops"],
            "ate_rmse_m": round(res["ate_rmse_m"], 4),
            "ate_raw_rmse_m": round(res["ate_raw_rmse_m"], 4),
            "umeyama_scale": round(res["umeyama_scale"], 4),
            "rpe_rot_deg": round(res.get("rpe_rot_deg", float("nan")), 4),
            "chunk_ba_p50_ms": res.get("stage_ms_p50", {}).get("chunk_ba"),
        }
        print(f"iters{it}", json.dumps(out["runs"][f"iters{it}"]),
              flush=True)

    path = os.path.join(os.path.dirname(__file__), "..",
                        "BA_ITERS_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
