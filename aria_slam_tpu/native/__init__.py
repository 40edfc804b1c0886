"""ctypes bindings for the native C++ runtime (built on first import).

Parity: the reference's runtime layer is native C++ (SURVEY.md §2) —
here the host-side runtime pieces stay native too: the H13-style async
pipeline executor with lock-free SPSC queues (native/src/pipeline.cpp),
fast EuRoC CSV parsing, threaded file preloading, and PLY/PCD export
(native/src/io.cpp). Everything degrades gracefully to pure Python when
no toolchain is available (`native.available() -> False`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# checkout layout: native/ sits beside the package. Wheel installs have
# no native/ — they degrade to the pure-Python fallbacks unless
# ARIA_SLAM_NATIVE_DIR points at a checkout's native directory.
_NATIVE_DIR = os.environ.get(
    "ARIA_SLAM_NATIVE_DIR", os.path.join(_ROOT, "native"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libariaslam_native.so")

_lib = None
_lock = threading.Lock()
_build_failed = False

STAGE_FN = ctypes.CFUNCTYPE(None, ctypes.c_uint64, ctypes.c_void_p)


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _stale() -> bool:
    """True when any native source is newer than the built library, so a
    stale binary is never silently preferred over edited sources."""
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    src_dir = os.path.join(_NATIVE_DIR, "src")
    deps = [os.path.join(_NATIVE_DIR, "Makefile")]
    if os.path.isdir(src_dir):
        deps += [os.path.join(src_dir, f) for f in os.listdir(src_dir)]
    return any(
        os.path.exists(d) and os.path.getmtime(d) > lib_mtime for d in deps
    )


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if _stale() and not _build() and not os.path.exists(_LIB_PATH):
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        # pipeline
        lib.pipeline_create.restype = ctypes.c_void_p
        lib.pipeline_create.argtypes = [ctypes.c_int, ctypes.POINTER(ctypes.c_int),
                                        ctypes.c_int]
        lib.pipeline_set_stage.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           STAGE_FN, ctypes.c_void_p]
        lib.pipeline_start.argtypes = [ctypes.c_void_p]
        lib.pipeline_submit.restype = ctypes.c_int
        lib.pipeline_submit.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.pipeline_stop.argtypes = [ctypes.c_void_p]
        lib.pipeline_stats.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_uint64)] * 3
        lib.pipeline_destroy.argtypes = [ctypes.c_void_p]
        # io
        lib.csv_parse_numeric.restype = ctypes.c_int64
        lib.csv_parse_numeric.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                          ctypes.POINTER(ctypes.c_double),
                                          ctypes.c_int64]
        lib.csv_count_rows.restype = ctypes.c_int64
        lib.csv_count_rows.argtypes = [ctypes.c_char_p]
        lib.ply_write.restype = ctypes.c_int64
        lib.ply_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                  ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.pcd_write.restype = ctypes.c_int64
        lib.pcd_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                  ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.preloader_create.restype = ctypes.c_void_p
        lib.preloader_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
        lib.preloader_poll.restype = ctypes.c_int64
        lib.preloader_poll.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.preloader_take.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_char)]
        lib.preloader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# --------------------------------------------------------------------- CSV
def parse_csv(path: str, num_cols: int) -> np.ndarray | None:
    """Fast numeric CSV parse; None if native lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = lib.csv_count_rows(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty((n, num_cols), np.float64)
    got = lib.csv_parse_numeric(
        path.encode(), num_cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
    )
    return out[:got]


# ------------------------------------------------------------------- export
def write_ply(path: str, xyz: np.ndarray, rgb: np.ndarray) -> int | None:
    lib = _load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    return int(lib.ply_write(
        path.encode(), xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(xyz),
    ))


def write_pcd(path: str, xyz: np.ndarray, rgb: np.ndarray) -> int | None:
    lib = _load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    rgb = np.ascontiguousarray(rgb, np.uint8)
    return int(lib.pcd_write(
        path.encode(), xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(xyz),
    ))


# ----------------------------------------------------------------- executor
class AsyncExecutor:
    """Python wrapper of the native staged pipeline (H13 equivalent).

    stages: list of callables fn(item_id: int). Items are integer ids;
    payloads live in Python dicts owned by the caller. drop_threshold>0
    enables frame-skip backpressure at the first stage.
    """

    def __init__(self, stages, queue_capacity=8, drop_threshold=0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        n = len(stages)
        caps = (ctypes.c_int * n)(*([queue_capacity] * n))
        self._p = lib.pipeline_create(n, caps, drop_threshold)
        self._cbs = []  # keep references alive
        for i, fn in enumerate(stages):
            cb = STAGE_FN(lambda item, _u, f=fn: f(int(item)))
            self._cbs.append(cb)
            lib.pipeline_set_stage(self._p, i, cb, None)
        self._n = n
        lib.pipeline_start(self._p)
        self._stopped = False

    def submit(self, item_id: int) -> bool:
        return bool(self._lib.pipeline_submit(self._p, item_id))

    def stats(self):
        proc = (ctypes.c_uint64 * self._n)()
        drop = (ctypes.c_uint64 * self._n)()
        depth = (ctypes.c_uint64 * self._n)()
        self._lib.pipeline_stats(self._p, proc, drop, depth)
        return {
            "processed": list(proc),
            "dropped": list(drop),
            "queue_depths": list(depth),
        }

    def stop(self):
        if not self._stopped:
            self._lib.pipeline_stop(self._p)
            self._stopped = True

    def close(self):
        self.stop()
        self._lib.pipeline_destroy(self._p)
        self._p = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class Preloader:
    """Threaded file read-ahead; decode stays in Python."""

    def __init__(self, paths):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._p = lib.preloader_create(arr, len(paths))
        self._n = len(paths)

    def get(self, idx: int, timeout_s: float = 10.0) -> bytes:
        import time

        t0 = time.time()
        while True:
            size = self._lib.preloader_poll(self._p, idx)
            if size >= 0:
                buf = ctypes.create_string_buffer(int(size))
                self._lib.preloader_take(self._p, idx, buf)
                return buf.raw
            if size == -1:
                raise FileNotFoundError(f"preload failed for index {idx}")
            if time.time() - t0 > timeout_s:
                raise TimeoutError(f"preload timeout for index {idx}")
            time.sleep(0.0005)

    def close(self):
        if self._p:
            self._lib.preloader_destroy(self._p)
            self._p = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
