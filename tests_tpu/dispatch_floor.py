"""Per-program dispatch-floor probe (on-chip).

CLAUDE.md's perf model claims every program execution costs ~38 ms
through this rig's relay regardless of size. VERDICT r3 #5 asks for a
committed breakdown proving whether the full-SLAM steady-state residual
is compute or this floor — this probe measures the floor directly:

  1. a near-empty program (scalar add) executed N times with varying
     inputs (the relay serves identical (program, args) pairs from a
     cache, so every rep must differ),
  2. the same with a medium program (1k x 1k bf16 matmul),
  3. a K-step computation run as K chained dispatches vs ONE fused
     program, both forced by a SINGLE final fetch — the difference
     isolates the per-dispatch cost that program fusion
     (eval/chunked.py state_update / lc_query) eliminates. (The first
     cut of this probe forced every fused output separately; each
     force is its own relay roundtrip, so the K fetches drowned the
     (K-1)-dispatch saving and the probe read ~0.)

Measured verdict (r4, TPU v5e via relay): the floor is PER HOST SYNC,
not per dispatch — 4 chained dispatches + 1 fetch cost ~25 ms vs ~24 ms
for 1 fused dispatch + 1 fetch (saving ~0.5 ms/dispatch), while every
scalar fetch costs ~26-32 ms. Enqueued programs pipeline through the
relay; intermediate host fetches are what serialize a pipeline. So:
keep values on device between programs, batch the per-chunk fetches
(eval/chunked.py does both), and fuse programs only to save the
dispatch tail, not the floor.

Run: python tests_tpu/dispatch_floor.py   (uses the tunneled TPU).
Writes DISPATCH_FLOOR_TPU.json in the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

REPS = 20


def _force(x):
    # jax.block_until_ready does not actually wait on this backend
    # (CLAUDE.md); fetching a scalar forces completion
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _median_ms(fn, args_stream):
    ts = []
    for a in args_stream:
        t0 = time.perf_counter()
        _force(fn(*a))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), [round(t, 2) for t in ts]


def main():
    import jax
    import jax.numpy as jnp

    import aria_slam_tpu  # noqa: F401  (matmul precision pin)

    dev = jax.devices()[0]
    print("device:", dev)
    rng = np.random.default_rng(0)

    # 1. near-empty program
    tiny = jax.jit(lambda x: x + 1.0)
    stream = [(jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),)
              for _ in range(REPS + 1)]
    _force(tiny(*stream[0]))  # compile
    tiny_ms, tiny_all = _median_ms(tiny, stream[1:])

    # 2. medium program: bf16 1k x 1k matmul
    def mm(a, b):
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    mm_j = jax.jit(mm)
    stream = [tuple(jnp.asarray(rng.normal(size=(1024, 1024))
                                .astype(np.float32)) for _ in range(2))
              for _ in range(REPS + 1)]
    _force(mm_j(*stream[0]))
    mm_ms, mm_all = _median_ms(mm_j, stream[1:])

    # 3. K chained dispatches vs one fused program; ONE final fetch on
    # both sides, matching the pipeline's reality (intermediate program
    # outputs stay on device and feed the next program — no per-program
    # fetch). sep - fused = (K-1) x per-dispatch overhead.
    K = 4

    def piece(x):
        return jnp.tanh(x * 1.0003) + 0.01

    piece_j = jax.jit(piece)

    def fused(x):
        for _ in range(K):
            x = piece(x)
        return x

    fused_j = jax.jit(fused)

    xs = [jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
          for _ in range(REPS + 1)]
    # compile both
    _force(piece_j(xs[0]))
    _force(fused_j(xs[0]))

    sep_ts, fus_ts = [], []
    for x in xs[1:]:
        t0 = time.perf_counter()
        y = x
        for _ in range(K):
            y = piece_j(y)
        _force(y)
        sep_ts.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        _force(fused_j(x))
        fus_ts.append((time.perf_counter() - t0) * 1e3)
    sep_ms = float(np.median(sep_ts))
    fus_ms = float(np.median(fus_ts))

    out = {
        "device": str(dev),
        "reps": REPS,
        "tiny_program_ms": round(tiny_ms, 2),
        "matmul_1k_bf16_ms": round(mm_ms, 2),
        "k_dispatches": K,
        "separate_k_dispatch_ms": round(sep_ms, 2),
        "fused_one_dispatch_ms": round(fus_ms, 2),
        "per_dispatch_saving_ms": round((sep_ms - fus_ms) / (K - 1), 2),
        "tiny_samples_ms": tiny_all,
    }
    path = os.path.join(os.path.dirname(__file__), "..",
                        "DISPATCH_FLOOR_TPU.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
