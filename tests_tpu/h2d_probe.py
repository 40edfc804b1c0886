"""H2D transfer probe: quantify shipping frames as uint8 vs float32.

The chunked evaluator sends (C+1, 752, 480) frame windows through the
relay every program call; io/euroc.load_image returns uint8 and every
jitted entry point casts on device (exact for 0..255). This probe
measures the end-to-end (transfer + trivial consume) time for both
dtypes at the production chunk sizes, on the real chip.

Run: python tests_tpu/h2d_probe.py   (no JAX_PLATFORMS override — uses
the tunneled TPU; identical (program, args) re-executions are cached on
this rig, so every rep uses fresh host data.)
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

    import aria_slam_tpu  # noqa: F401  (matmul precision pin)

    h, w = 480, 752
    reps = 4
    rng = np.random.default_rng(0)
    rows = {}

    @jax.jit
    def consume(x):
        # cast like the real frontends, touch every element, return a
        # scalar so the fetch forces completion
        return jnp.sum(x.astype(jnp.float32) * 1e-6)

    for chunk in (16, 96):
        base = rng.integers(0, 256, (chunk + 1, h, w), dtype=np.uint8)
        for name, conv in (("uint8", lambda a: a),
                           ("float32", lambda a: a.astype(np.float32))):
            # warm the compile for this dtype
            float(consume(jnp.asarray(conv(base))))
            t0 = time.perf_counter()
            for r in range(reps):
                arr = conv(np.ascontiguousarray(np.roll(base, r, axis=0)))
                float(consume(jnp.asarray(arr)))
            dt = (time.perf_counter() - t0) / reps * 1000
            rows[f"chunk{chunk}_{name}_ms"] = round(dt, 2)
            print(f"chunk {chunk:3d} {name:8s}: {dt:7.2f} ms/call",
                  flush=True)

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
