"""euroc_eval: offline full-pipeline evaluation on a EuRoC sequence.

Parity: reference src/euroc_eval.cpp — runs VO + EKF + loop closure +
pose graph + mapping over an ASL dataset, prints per-100-frame progress
(FPS, map size, loop count), runs a final 50-iteration pose-graph
optimization, reports ATE RMSE and RPE@10, and exports
estimated_trajectory.txt (ts x y z), map.ply and trajectory.png.

Usage:
    python -m aria_slam_tpu.eval.euroc_eval <dataset_path> [--out DIR]
        [--max-frames N] [--vo-only] [--no-loop] [--config cfg.yaml]
        [--chunk N] [--profile DIR]

--profile wraps the evaluation loop in a jax.profiler device trace
(open with TensorBoard/xprof — the TPU answer to the reference's
trtexec/nvprof timing, SURVEY.md §5.1); combine with --max-frames to
bound the trace. Host-side per-stage timing (decode / gyro prior /
device step) is always collected and reported as `stage_ms`.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from aria_slam_tpu.config import PipelineConfig
from aria_slam_tpu.eval import metrics
from aria_slam_tpu.io import euroc
from aria_slam_tpu.utils import profiling


def run(dataset_path: str, out_dir: str = ".", max_frames: int | None = None,
        config: PipelineConfig | None = None, verbose: bool = True,
        chunk: int = 0, profile_dir: str | None = None,
        keep_pipe: bool = False, lc_diag: bool = False,
        prefetch_h2d: bool = True) -> dict:
    """chunk = 0: online per-frame pipeline (reference parity).
    chunk > 1: batched offline evaluation (TPU-native chunked windows).
    profile_dir: capture a jax.profiler device trace of the loop.
    keep_pipe: stash the pipeline object under results['_pipe'].
    lc_diag: collect per-chunk loop-closure stage diagnostics on the
    pipe (chunked mode only; see ChunkedSlam.lc_diag).
    prefetch_h2d: chunked mode only — the decode worker thread issues
    an async jax.device_put of the next chunk's uint8 window, so the
    ~10 ms/frame relay upload (H2D_TPU.json) rides UNDER the current
    chunk's device work instead of serializing in front of the next
    frontend call (the full-pipeline analogue of bench.py's pipelined
    headline loop; the reference streams frames the same way,
    Frame.cpp:19 per-frame uploads under its CUDA streams)."""
    import contextlib

    from aria_slam_tpu.pipeline.slam_pipeline import SlamPipeline

    data = euroc.load(dataset_path)
    config = config or PipelineConfig()
    config = dataclasses.replace(
        config, camera=data.camera,
        imu_cam_rotation=tuple(map(tuple, data.R_cam_imu.tolist())))

    n_frames = len(data.image_paths)
    if max_frames:
        n_frames = min(n_frames, max_frames)

    t_start = time.perf_counter()
    frame_times = []
    timer = profiling.StageTimer()
    trace_cm = (profiling.device_trace(profile_dir) if profile_dir
                else contextlib.nullcontext())

    if chunk and chunk > 1:
        from aria_slam_tpu.eval.chunked import ChunkedSlam

        from concurrent.futures import ThreadPoolExecutor

        pipe = ChunkedSlam(config, chunk=chunk, timer=timer)
        if lc_diag:
            pipe.lc_diag = []

        bad_idx: set = set()   # unreadable image indices (dedup: chunk
        last_good = None       # overlaps decode boundary frames twice)

        def load_chunk(k):
            # single-worker pool => calls never overlap; the nonlocal
            # last-good carry is race-free
            nonlocal last_good
            with timer.stage("decode"):
                hi = min(k + chunk, n_frames - 1)
                idxs = list(range(k, hi + 1))
                if len(idxs) < chunk + 1:  # pad by repeating the last frame
                    idxs = idxs + [idxs[-1]] * (chunk + 1 - len(idxs))
                frames = []
                for i in idxs:
                    img = euroc.load_image_safe(data.image_paths[i])
                    if img is None:
                        # unreadable frame: substitute the last good
                        # one (an identity pair the estimator shrugs
                        # off) — the reference reader skips and
                        # continues, EuRoCReader.cpp:287-291; aborting a
                        # whole run on one bad file is the r2-flagged
                        # parity hole. last_good persists across chunks
                        # so a corrupt chunk-BOUNDARY frame reuses the
                        # previous chunk's image instead of zeros.
                        bad_idx.add(i)
                        img = (frames[-1] if frames
                               else last_good if last_good is not None
                               else np.zeros((data.camera.height,
                                              data.camera.width),
                                             np.uint8))
                    else:
                        last_good = img
                    frames.append(img)
                window = np.stack(frames)
                if prefetch_h2d:
                    # async H2D from the worker thread: the transfer
                    # streams while the MAIN thread is still inside the
                    # current chunk's process_chunk (ChunkedSlam only
                    # touches .shape and jnp.asarray on this, so a
                    # committed device array is a drop-in)
                    import jax
                    window = jax.device_put(window)
                return window, [data.image_ts[i] for i in idxs], hi

        # fixed chunk size => one compile; iterate with 1-frame overlap,
        # decoding the next chunk while the device runs the current one
        use_gyro = config.gyro_chain_rotation and len(data.imu_ts) > 0
        if use_gyro:
            from aria_slam_tpu.fusion import gyro_prior
        imu_window = ((data.imu_ts, data.imu_accel, data.imu_gyro)
                      if config.imu_metric_scale and len(data.imu_ts) > 0
                      else None)

        pool = ThreadPoolExecutor(1)
        k = 0
        fut = pool.submit(load_chunk, k)
        with trace_cm:
            while k + 1 < n_frames:
                frames, ts, hi = fut.result()
                if hi + 1 < n_frames:
                    fut = pool.submit(load_chunk, hi)
                gR = gok = None
                if use_gyro:
                    with timer.stage("gyro_prior"):
                        gR, gok = gyro_prior.pair_rotations(
                            data.imu_ts, data.imu_gyro, ts,
                            R_cam_imu=data.R_cam_imu)
                f0 = time.perf_counter()
                with timer.stage("device_chunk"):
                    pipe.process_chunk(frames, ts, gR, gok,
                                       imu_window=imu_window)
                frame_times.append((time.perf_counter() - f0) / chunk)
                k = hi
                if verbose and (k + 1) % 96 < chunk:
                    fps = (k + 1) / (time.perf_counter() - t_start)
                    print(f"[{k + 1}/{n_frames}] fps={fps:.1f} "
                          f"map={int(pipe.map_state.count)} "
                          f"loops={pipe.num_loops}")
        # drop duplicated padding trajectory entries
        pipe.trajectory = pipe.trajectory[:n_frames]
        n_skipped = len(bad_idx)
    else:
        pipe = SlamPipeline(config)
        t_prev = -np.inf
        online_fused = [] if config.enable_fusion else None
        n_skipped = 0
        with trace_cm:
            for k in range(n_frames):
                ts = data.image_ts[k]
                with timer.stage("decode"):
                    img = euroc.load_image_safe(data.image_paths[k])
                if img is None:  # skip-and-continue (EuRoCReader.cpp:287-291)
                    n_skipped += 1
                    continue
                imu_t, imu_a, imu_g = euroc.imu_window(data, t_prev, ts)
                with timer.stage("imu"):
                    for j in range(len(imu_t)):
                        pipe.process_imu(imu_t[j], imu_a[j], imu_g[j])
                f0 = time.perf_counter()
                with timer.stage("frame_step"):
                    pipe.process_frame(img, ts)
                frame_times.append(time.perf_counter() - f0)
                if online_fused is not None:
                    online_fused.append(np.asarray(pipe.last_output.fused_pos))
                t_prev = ts

                if verbose and (k + 1) % 100 == 0:
                    fps = (k + 1) / (time.perf_counter() - t_start)
                    print(
                        f"[{k + 1}/{n_frames}] fps={fps:.1f} "
                        f"map={int(pipe.state.map_state.count)} "
                        f"loops={pipe.num_loops}"
                    )

    pipe.finalize()

    # degrade-don't-crash: every frame unreadable (e.g. a truncated
    # dataset copy) leaves the trajectory empty — report NaN metrics
    # instead of np.stack blowing up on an empty list
    est_T = (np.stack([T for _, T in pipe.trajectory])
             if pipe.trajectory else np.zeros((0, 4, 4), np.float32))
    est_ts = np.array([t for t, _ in pipe.trajectory])
    est_pos = est_T[:, :3, 3]

    # chunked mode handles IMU post-hoc: fuse the 200 Hz stream with the
    # VO poses through the 15-state EKF over the whole sequence at once
    # (SURVEY §3.3's merged-stream lax.scan); the VIO trajectory is
    # reported alongside (the reference's euroc_eval also keeps the raw
    # VO trajectory as its estimate, euroc_eval.cpp:203-209)
    fused_pos = None
    if (not (chunk and chunk > 1)) and config.enable_fusion:
        # online mode: the EKF ran inside every frame step; its position
        # track IS the fused trajectory (mirrors chunked mode's export)
        fused_pos = np.stack(online_fused) if online_fused else None
    if (chunk and chunk > 1 and config.enable_fusion and len(data.imu_ts)
            and len(est_ts)):
        import jax.numpy as jnp

        from aria_slam_tpu.fusion import ekf as ekf_mod

        t0_seq = float(est_ts[0])
        lo = np.searchsorted(data.imu_ts, est_ts[0])
        hi = np.searchsorted(data.imu_ts, est_ts[-1], side="right")
        vo_R = np.array([T[:3, :3] for _, T in pipe.trajectory], np.float32)
        # timestamps stay HOST arrays so run_sequence's sortedness
        # guard actually runs (it skips device arrays — validating
        # those would force a D2H copy of the whole stream)
        fused_p, _ = ekf_mod.run_sequence(
            (data.imu_ts[lo:hi] - t0_seq).astype(np.float32),
            jnp.asarray(data.imu_accel[lo:hi].astype(np.float32)),
            jnp.asarray(data.imu_gyro[lo:hi].astype(np.float32)),
            (est_ts - t0_seq).astype(np.float32),
            jnp.asarray(vo_R),
            jnp.asarray(est_pos.astype(np.float32)),
            config.ekf,
            # RTS backward pass (VERDICT r4 missing #2): pipe.trajectory
            # here is the FINAL-OPTIMIZED chain (finalize() ran above),
            # and a causal filter's output necessarily lags that input —
            # the r4 artifact had ate_fused strictly worse than the
            # chain on vio_lc. Offline smoothing uses the future
            # symmetrically, so the fused track can only add IMU
            # information instead of filter lag.
            smooth=True,
        )
        fused_pos = np.asarray(fused_p)

    # associate with ground truth and score (shared with multi_eval)
    scores, gt_pos, keep = metrics.associate_and_score(data, est_ts, est_T)
    est_kept = est_pos[keep] if keep else est_pos[:0]
    ate = scores["ate_rmse_m"]
    rpe = scores["rpe_rmse_m"]
    rpe_rot = scores["rpe_rot_deg"]
    # median: robust to one-off mid-run compiles (e.g. the first loop
    # closure event compiling the verify/optimize programs)
    mean_frame_ms = float(np.median(frame_times[1:]) * 1000) if len(frame_times) > 1 else 0.0

    os.makedirs(out_dir, exist_ok=True)
    traj_path = os.path.join(out_dir, "estimated_trajectory.txt")
    with open(traj_path, "w") as f:
        for t, T in pipe.trajectory:
            p = T[:3, 3]
            f.write(f"{t:.9f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")

    map_points = pipe.export_map(
        ply_path=os.path.join(out_dir, "map.ply"),
        pcd_path=os.path.join(out_dir, "map.pcd"),
    )

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 6))
        ax.plot(est_pos[:, 0], est_pos[:, 1], label="estimated")
        if len(gt_pos):
            ax.plot(gt_pos[:, 0], gt_pos[:, 1], label="ground truth", alpha=0.7)
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        ax.legend()
        ax.set_title(f"ATE RMSE: {ate:.3f} m")
        fig.savefig(os.path.join(out_dir, "trajectory.png"), dpi=100)
        plt.close(fig)
    except Exception as e:  # headless safety
        if verbose:
            print(f"trajectory.png skipped: {e}")

    results = {
        "frames": n_frames,
        "avg_fps": n_frames / (time.perf_counter() - t_start),
        "steady_frame_ms": mean_frame_ms,
        "loops": pipe.num_loops,
        "map_points": int(map_points),
        "ate_rmse_m": ate,
        "ate_raw_rmse_m": scores["ate_raw_rmse_m"],
        "rpe_rmse_m": rpe,
        "rpe_rot_deg": rpe_rot,
        "skipped_images": n_skipped,
    }
    if len(gt_pos) >= 3:
        # absolute-scale diagnostics: the standard ATE above aligns with
        # a free Umeyama scale, which hides metric-scale errors; the
        # scale itself (1.0 == trajectory already metric) and the
        # scale-fixed (rigid-aligned) ATE expose them (IMU metric scale,
        # vi_init). Three ATE flavors total: ate_raw_rmse_m (reference
        # semantics, no alignment), ate_noscale_rmse_m (rigid SE3
        # Umeyama), ate_rmse_m (Sim3).
        s_um, _, _ = metrics.align_umeyama(est_kept, gt_pos)
        results["umeyama_scale"] = float(s_um)
        results["ate_noscale_rmse_m"] = metrics.ate_rmse(
            est_kept, gt_pos, with_scale=False)
    if fused_pos is not None and len(gt_pos):
        results["ate_fused_rmse_m"] = metrics.ate_rmse(fused_pos[keep], gt_pos)
        results["ate_fused_noscale_rmse_m"] = metrics.ate_rmse(
            fused_pos[keep], gt_pos, with_scale=False)
        results["ate_fused_raw_rmse_m"] = metrics.ate_rmse(
            fused_pos[keep], gt_pos, align=False)
        with open(os.path.join(out_dir, "fused_trajectory.txt"), "w") as f:
            for tt, p in zip(est_ts, fused_pos):
                f.write(f"{tt:.9f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
    # compile/steady split (VERDICT r4 weak #3): stage_ms means are
    # STEADY-ONLY (each stage's first, compile-laden event is excluded
    # and reported in stage_ms_warm), so mean and p50 describe the same
    # population. compile_wall_s + steady frame time reconcile avg_fps
    # with steady_frame_ms inside the artifact: avg_fps counts the
    # warm-up wall clock, steady_frame_ms does not.
    stage_summary = timer.summary()
    results["stage_ms"] = {
        name: round(s["mean_ms"], 3) for name, s in stage_summary.items()
    }
    results["stage_ms_p50"] = {
        name: round(s["p50_ms"], 3) for name, s in stage_summary.items()
    }
    results["stage_ms_warm"] = {
        name: round(s["warm_ms"], 3) for name, s in stage_summary.items()
    }
    results["stage_ms_steady_total"] = {
        name: round(s["total_ms"], 3) for name, s in stage_summary.items()
    }
    # event counts: a count-1 stage's "steady" stats ARE its warm
    # (compile-laden) single event (StageTimer fallback) — e.g. a rare
    # loop_verify at big chunk sizes; without n a reader can't tell a
    # 36 s p50 apart from a genuinely slow steady stage
    results["stage_n"] = {
        name: s["count"] for name, s in stage_summary.items()
    }
    results["compile_wall_s"] = round(timer.warm_total_ms() / 1000.0, 3)
    if verbose:
        print("==== results ====")
        for k_, v in results.items():
            print(f"  {k_}: {v}")
        rep = timer.report()
        if rep:
            print("==== stage timing ====")
            print(rep)
        if profile_dir:
            print(f"device trace written to {profile_dir} "
                  "(open with TensorBoard/xprof)")
    if keep_pipe:
        # non-serializable escape hatch for analysis harnesses
        # (eval/longrun.py reads loop_pairs + keyframe-DB state); added
        # after the print block so artifacts/logs never carry it
        results["_pipe"] = pipe
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", help="EuRoC sequence dir (contains mav0/)")
    ap.add_argument("--out", default="euroc_out")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--config", default=None, help="YAML config overrides")
    ap.add_argument("--vo-only", action="store_true",
                    help="disable fusion/loop/mapping (BASELINE config 1)")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--chunk", type=int, default=0,
                    help=">1: batched offline evaluation with this many "
                         "frame pairs per program call (TPU-native)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace of the "
                         "evaluation loop into DIR (bound with "
                         "--max-frames; open with TensorBoard/xprof)")
    args = ap.parse_args()

    cfg = PipelineConfig.from_yaml(args.config) if args.config else PipelineConfig()
    if args.vo_only:
        cfg = dataclasses.replace(
            cfg, enable_fusion=False, enable_loop_closure=False, enable_mapping=False
        )
    if args.no_loop:
        cfg = dataclasses.replace(cfg, enable_loop_closure=False)
    run(args.dataset, args.out, args.max_frames, cfg, chunk=args.chunk,
        profile_dir=args.profile)


if __name__ == "__main__":
    main()
