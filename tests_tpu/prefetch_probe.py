"""A/B probe: does pipelining the next chunk's H2D under the current
chunk's device work speed up the full-SLAM chunked steady state?

euroc_eval.run(prefetch_h2d=True) moves the uint8 window's
jax.device_put into the decode worker thread, so the ~40 MB/s relay
upload (H2D_TPU.json: ~9-10 ms/frame at 752x480) streams while the
main thread is inside the previous chunk's process_chunk — the
full-pipeline analogue of bench.py's pipelined headline loop.

Runs the TIMING scene (240-frame full-res rotloop, full vio_lc config)
at chunk {32, 64} with prefetch off/on and reports steady_frame_ms +
accuracy so the win is at matched accuracy. -> PREFETCH_r05.json

Run: python tests_tpu/prefetch_probe.py   (uses the tunneled TPU).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

CHUNKS = (32, 64)
FRAMES = 240


def main():
    import jax

    from aria_slam_tpu.eval.accuracy_benchmark import benchmark_config
    from aria_slam_tpu.eval import euroc_eval
    from aria_slam_tpu.io import synthetic_scene

    print("device:", jax.devices()[0], flush=True)
    cfg = benchmark_config(full_res=True, frames=FRAMES)
    scene = "/tmp/timing_scene_240_full"
    if not os.path.exists(os.path.join(scene, "mav0")):
        synthetic_scene.generate(scene, num_frames=FRAMES, fps=10.0,
                                 cam=cfg.camera, depth=4.0, traj="rotloop",
                                 period=20.0)
        print("scene generated:", scene, flush=True)

    out = {"frames": FRAMES, "config": "full stack (accuracy benchmark "
           "vio_lc config, 752x480 / 2000 features)", "runs": {}}
    # off first, then on: any relay warm-up bias favors the OFF arm
    for chunk in CHUNKS:
        for pf in (False, True):
            key = f"chunk{chunk}_{'prefetch' if pf else 'sync'}"
            res = euroc_eval.run(scene, out_dir=f"/tmp/pf_{key}",
                                 config=cfg, verbose=False, chunk=chunk,
                                 prefetch_h2d=pf)
            out["runs"][key] = {
                "steady_frame_ms": round(res["steady_frame_ms"], 2),
                "loops": res["loops"],
                "ate_rmse_m": round(res["ate_rmse_m"], 4),
                "rpe_rot_deg": round(res.get("rpe_rot_deg", float("nan")),
                                     4),
                "stage_ms_p50": res.get("stage_ms_p50", {}),
            }
            print(key, json.dumps(out["runs"][key]), flush=True)

    path = os.path.join(os.path.dirname(__file__), "..",
                        "PREFETCH_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
