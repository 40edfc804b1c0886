"""Async staged SLAM pipeline on the native C++ executor.

Parity: the reference's H13 multithreaded pipeline design (SURVEY.md
row 25: tracking/loop-closure/mapping threads + lock-free SPSC queues +
frame-skip backpressure, claimed 12 -> 28 FPS). The TPU translation:
device compute is already one fused program, so the host stages are

    stage 0 (decode):   bytes -> numpy grayscale (GIL-free cv2)
    stage 1 (dispatch): SlamPipeline.process_frame (enqueues XLA work;
                        jax dispatch overlaps with the next decode)
    stage 2 (collect):  callbacks / stats / recording

connected by the native lock-free SPSC queues (native/src/pipeline.cpp)
with drop-based backpressure at stage 0 — frames are skipped rather
than queued unboundedly when the device falls behind, the reference's
degradation policy (H13 'queue depth > 4 -> drop').
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional

import numpy as np

from aria_slam_tpu import native
from aria_slam_tpu.pipeline.slam_pipeline import SlamPipeline


class AsyncSlamPipeline:
    """Submit frames (raw bytes or arrays); poll results via callback."""

    def __init__(self, pipe: SlamPipeline, drop_threshold: int = 4,
                 on_result: Optional[Callable] = None):
        if not native.available():
            raise RuntimeError("native runtime unavailable")
        self.pipe = pipe
        self.on_result = on_result
        self._items: dict = {}
        self._lock = threading.Lock()
        self._results: list = []
        self._exec = native.AsyncExecutor(
            [self._decode, self._dispatch, self._collect],
            queue_capacity=8, drop_threshold=drop_threshold,
        )
        self._next_id = 0

    # -- stages (called from native worker threads)
    def _decode(self, item_id: int):
        from aria_slam_tpu.io.euroc import _require_cv2
        cv2 = _require_cv2()

        it = self._items[item_id]
        if "bytes" in it:
            buf = np.frombuffer(it.pop("bytes"), np.uint8)
            it["image"] = cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)  # uint8: cheap H2D

    def _dispatch(self, item_id: int):
        it = self._items[item_id]
        it["pose"] = self.pipe.process_frame(it["image"], it["timestamp"])

    def _collect(self, item_id: int):
        it = self._items.pop(item_id)
        with self._lock:
            self._results.append((it["timestamp"], it["pose"]))
        if self.on_result is not None:
            self.on_result(it["timestamp"], it["pose"])

    # -- API
    def submit(self, timestamp: float, image: np.ndarray | None = None,
               raw_bytes: bytes | None = None) -> bool:
        """Returns False if dropped by backpressure (frame skipping)."""
        item_id = self._next_id
        self._next_id += 1
        it = {"timestamp": timestamp}
        if image is not None:
            it["image"] = np.asarray(image)  # native dtype; device casts
        else:
            it["bytes"] = raw_bytes
        self._items[item_id] = it
        accepted = self._exec.submit(item_id)
        if not accepted:
            self._items.pop(item_id, None)
        return accepted

    def drain(self, timeout_s: float = 30.0):
        """Wait until all accepted frames are processed."""
        deadline = time.time() + timeout_s
        while self._items and time.time() < deadline:
            time.sleep(0.005)
        return self.results

    @property
    def results(self):
        with self._lock:
            return list(self._results)

    def stats(self):
        return self._exec.stats()

    def close(self):
        self._exec.stop()
        self._exec.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
