"""Per-program dispatch-floor probe (on-chip).

CLAUDE.md's perf model claims every program execution costs ~38 ms
through this rig's relay regardless of size. VERDICT r3 #5 asks for a
committed breakdown proving whether the full-SLAM steady-state residual
is compute or this floor — this probe measures the floor directly:

  1. a near-empty program (scalar add) executed N times with varying
     inputs (the relay serves identical (program, args) pairs from a
     cache, so every rep must differ),
  2. the same with a medium program (1k x 1k bf16 matmul),
  3. K DISTINCT trivial programs dispatched back-to-back vs ONE program
     computing all K results — the difference is the per-dispatch cost
     that program fusion (eval/chunked.py state_update / lc_query)
     eliminates.

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

    # 3. K separate dispatches vs one fused program
    K = 4

    def piece(x, s):
        return jnp.tanh(x * s) + s

    piece_j = jax.jit(piece)

    def fused(x, ss):
        return [piece(x, ss[i]) for i in range(K)]

    fused_j = jax.jit(fused)

    xs = [jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
          for _ in range(REPS + 1)]
    ss = [jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
          for _ in range(REPS + 1)]
    # per-rep host scalars so the separate-dispatch loop doesn't pay an
    # extra device-slice program per piece
    s_host = [[jnp.asarray(float(v), jnp.float32) for v in np.asarray(s)]
              for s in ss]
    # compile both
    _force(piece_j(xs[0], s_host[0][0]))
    for y in fused_j(xs[0], ss[0]):
        _force(y)

    sep_ts, fus_ts = [], []
    for x, s, sh in zip(xs[1:], ss[1:], s_host[1:]):
        t0 = time.perf_counter()
        for i in range(K):
            _force(piece_j(x, sh[i]))
        sep_ts.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        ys = fused_j(x, s)
        for y in ys:
            _force(y)
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
