"""Full-SLAM steady-state chunk sweep (on-chip) -> TIMING_r05.json.

VERDICT r3 #5: commit a per-stage breakdown of the chunked full-SLAM
steady state at the headline config and attack the dominant line. This
runs the full stack (VO + gyro fusion + chunk BA + IMU scale + loop
closure + mapping) on the same full-res 240-frame rotloop scene the
accuracy benchmark uses, at chunk {16, 32, 64}, and records
steady_frame_ms plus the ChunkedSlam per-stage timers
(eval/chunked.py _st): frontend / chunk_ba / imu_scale / state_update /
loop_query / loop_verify / loop_optimize, and the euroc_eval-level
decode / gyro_prior / device_chunk buckets.

Run: python tests_tpu/steady_timing.py   (uses the tunneled TPU).
Reference comparison: full pipeline ~60+ ms/frame with LC at 500 KF
(/root/reference/docs/milestones/H09_LOOP_CLOSURE_AUDIT.md:685-696).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

CHUNKS = (16, 32, 64)
FRAMES = 240


def main():
    import jax

    from aria_slam_tpu.eval.accuracy_benchmark import benchmark_config
    from aria_slam_tpu.eval import euroc_eval
    from aria_slam_tpu.io import synthetic_scene

    print("device:", jax.devices()[0])
    cfg = benchmark_config(full_res=True, frames=FRAMES)
    scene = "/tmp/timing_scene_240_full"
    if not os.path.exists(os.path.join(scene, "mav0")):
        synthetic_scene.generate(scene, num_frames=FRAMES, fps=10.0,
                                 cam=cfg.camera, depth=4.0, traj="rotloop",
                                 period=20.0)
        print("scene generated:", scene, flush=True)

    out = {"frames": FRAMES, "config": "full stack (accuracy benchmark "
           "vio_lc config, 752x480 / 2000 features)", "chunks": {}}
    for chunk in CHUNKS:
        res = euroc_eval.run(scene, out_dir=f"/tmp/timing_out_{chunk}",
                             config=cfg, verbose=False, chunk=chunk)
        out["chunks"][str(chunk)] = {
            "steady_frame_ms": round(res["steady_frame_ms"], 2),
            "avg_fps": round(res["avg_fps"], 2),
            "loops": res["loops"],
            "ate_rmse_m": round(res["ate_rmse_m"], 4),
            "ate_noscale_rmse_m": round(
                res.get("ate_noscale_rmse_m", float("nan")), 4),
            "umeyama_scale": round(
                res.get("umeyama_scale", float("nan")), 4),
            "rpe_rot_deg": round(res.get("rpe_rot_deg", float("nan")), 4),
            # steady/warm split (VERDICT r4 weak #3): stage_ms means are
            # steady-only; first-event compiles live in stage_ms_warm
            "stage_ms": res["stage_ms"],
            "stage_ms_p50": res.get("stage_ms_p50", {}),
            "stage_ms_warm": res.get("stage_ms_warm", {}),
            "stage_ms_steady_total": res.get("stage_ms_steady_total", {}),
            "stage_n": res.get("stage_n", {}),
            "compile_wall_s": res.get("compile_wall_s", float("nan")),
        }
        print(f"chunk {chunk}: steady {res['steady_frame_ms']:.1f} ms/frame, "
              f"{res['loops']} loops", flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "TIMING_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
