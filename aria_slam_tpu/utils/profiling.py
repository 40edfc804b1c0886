"""Profiling and per-stage timing.

Parity: the reference's ad-hoc chrono deltas + HUD prints
(SURVEY.md §5.1; src/main.cpp:123,207-208). Here: a lightweight stage
timer with EMA + percentiles for the host loop, and a context manager
over jax.profiler for device traces (the TPU answer to trtexec /
nvprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import numpy as np


class StageTimer:
    """Accumulates wall-clock per named stage; cheap enough for per-frame use."""

    def __init__(self, window: int = 200):
        self.window = window
        self.samples: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            buf = self.samples[name]
            buf.append(time.perf_counter() - t0)
            if len(buf) > self.window:
                del buf[: len(buf) - self.window]

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, buf in self.samples.items():
            if not buf:
                continue
            arr = np.asarray(buf) * 1000.0
            out[name] = {
                "mean_ms": float(arr.mean()),
                "p50_ms": float(np.percentile(arr, 50)),
                "p95_ms": float(np.percentile(arr, 95)),
                "count": len(arr),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:>20s}: mean {s['mean_ms']:7.2f} ms  "
                f"p50 {s['p50_ms']:7.2f}  p95 {s['p95_ms']:7.2f}  (n={s['count']})"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace around a region (open with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
