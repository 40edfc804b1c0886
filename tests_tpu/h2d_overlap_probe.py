"""H2D strategy probe: can relay transfers parallelize or overlap compute?

h2d_probe.py measured the relay's effective H2D bandwidth at ~36 MB/s
(chunk-96 uint8 window = 35 MB -> 982 ms), which now bounds the
headline bench (~89 FPS serial). This probe tests the three escape
hatches:

  1. split-N   : one 35 MB jnp.asarray vs N async jax.device_put
                 slices issued back-to-back (parallel relay streams?)
  2. overlap   : device_put of the NEXT window issued while a real
                 compute program runs on the CURRENT one — serial vs
                 interleaved total (does the relay DMA during exec?)
  3. d2h       : fetch of a small vs large result (is D2H symmetric?)

Run: python tests_tpu/h2d_overlap_probe.py  (tunneled TPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import aria_slam_tpu  # noqa: F401

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    h, w, c = 480, 752, 97
    rng = np.random.default_rng(0)
    reps = 3
    out = {}

    @jax.jit
    def consume(x):
        return jnp.sum(x.astype(jnp.float32) * 1e-6)

    def force(v):
        return float(v)

    base = rng.integers(0, 256, (c, h, w), dtype=np.uint8)
    force(consume(jnp.asarray(base)))  # warm compile

    # ---- 1. split-N parallel puts
    for n in (1, 2, 4, 8):
        slices = np.array_split(base, n)
        # warm any per-shape machinery
        parts = [jax.device_put(s) for s in slices]
        force(consume(jnp.concatenate([p.astype(jnp.float32)
                                       for p in parts])) if n > 1
              else consume(parts[0]))
        t0 = time.perf_counter()
        for r in range(reps):
            arr = np.ascontiguousarray(np.roll(base, r + 1, axis=0))
            parts = [jax.device_put(s) for s in np.array_split(arr, n)]
            if n > 1:
                force(consume(jnp.concatenate(
                    [p.astype(jnp.float32) for p in parts])))
            else:
                force(consume(parts[0]))
        dt = (time.perf_counter() - t0) / reps * 1000
        out[f"split{n}_ms"] = round(dt, 1)
        print(f"split {n}: {dt:8.1f} ms", flush=True)

    # ---- 2. transfer/compute overlap
    # compute: a matmul chain sized ~0.5-1 s so overlap is visible
    @jax.jit
    def heavy(x):
        a = x.astype(jnp.bfloat16)
        for _ in range(48):
            a = jnp.tanh(a @ a)
        return jnp.sum(a.astype(jnp.float32))

    mat = jnp.asarray(rng.standard_normal((2048, 2048), dtype=np.float32))
    force(heavy(mat))
    t0 = time.perf_counter()
    for _ in range(reps):
        force(heavy(mat))
    t_heavy = (time.perf_counter() - t0) / reps * 1000
    print(f"heavy compute alone: {t_heavy:8.1f} ms", flush=True)
    out["heavy_ms"] = round(t_heavy, 1)

    # serial: put then compute (dependency-free) then force both
    t0 = time.perf_counter()
    for r in range(reps):
        arr = np.ascontiguousarray(np.roll(base, 10 + r, axis=0))
        d = jax.device_put(arr)
        v = heavy(mat)
        force(consume(d))
        force(v)
    t_serial = (time.perf_counter() - t0) / reps * 1000

    # interleaved: launch compute FIRST (async), then put while it runs
    t0 = time.perf_counter()
    for r in range(reps):
        arr = np.ascontiguousarray(np.roll(base, 20 + r, axis=0))
        v = heavy(mat)          # enqueued, returns immediately
        d = jax.device_put(arr)  # transfer while compute runs?
        force(consume(d))
        force(v)
    t_inter = (time.perf_counter() - t0) / reps * 1000
    out["put_then_compute_ms"] = round(t_serial, 1)
    out["compute_then_put_ms"] = round(t_inter, 1)
    print(f"serial put+compute: {t_serial:8.1f} ms, "
          f"interleaved: {t_inter:8.1f} ms", flush=True)

    # ---- 3. D2H size sensitivity
    big = consume(jnp.asarray(base))  # scalar
    arr_dev = jnp.asarray(base).astype(jnp.float32)

    @jax.jit
    def ident(x):
        return x + 1.0

    warm = ident(arr_dev)
    _ = np.asarray(warm)
    for name, fetch in (("scalar", lambda: float(consume(arr_dev))),
                        ("full35mb", lambda: np.asarray(ident(arr_dev)))):
        t0 = time.perf_counter()
        for _ in range(reps):
            fetch()
        dt = (time.perf_counter() - t0) / reps * 1000
        out[f"d2h_{name}_ms"] = round(dt, 1)
        print(f"d2h {name}: {dt:8.1f} ms", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
