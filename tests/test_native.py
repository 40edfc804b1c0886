"""Native C++ runtime: SPSC pipeline executor, CSV parser, PLY/PCD
writers, file preloader (parity: SURVEY.md row 25 H13 design + rows
10/13 native IO)."""

import os
import time

import numpy as np
import pytest

from aria_slam_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_csv_parse_matches_numpy(tmp_path):
    p = tmp_path / "data.csv"
    rng = np.random.default_rng(0)
    data = rng.normal(size=(500, 7))
    with open(p, "w") as f:
        f.write("#timestamp,a,b,c,d,e,f\n")
        for row in data:
            f.write(",".join(f"{v:.9f}" for v in row) + "\n")
    out = native.parse_csv(str(p), 7)
    np.testing.assert_allclose(out, data, atol=1e-9)


def test_ply_pcd_writers(tmp_path):
    xyz = np.array([[1, 2, 3], [4, 5, 6]], np.float32)
    rgb = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    ply = str(tmp_path / "m.ply")
    pcd = str(tmp_path / "m.pcd")
    assert native.write_ply(ply, xyz, rgb) == 2
    assert native.write_pcd(pcd, xyz, rgb) == 2
    lines = open(ply).read().splitlines()
    assert lines[0] == "ply" and "element vertex 2" in lines[2]
    assert lines[-1].startswith("4.000000 5.000000 6.000000 0 255 0")
    assert "POINTS 2" in open(pcd).read()


def test_async_executor_pipeline_order():
    """3-stage pipeline: items flow through all stages exactly once, in
    order per stage."""
    log = {0: [], 1: [], 2: []}

    def mk(stage):
        def fn(item):
            log[stage].append(item)
        return fn

    ex = native.AsyncExecutor([mk(0), mk(1), mk(2)], queue_capacity=4)
    for i in range(20):
        assert ex.submit(i)
    ex.stop()
    stats = ex.stats()
    ex.close()
    assert log[0] == list(range(20))
    assert log[1] == list(range(20))
    assert log[2] == list(range(20))
    assert stats["processed"] == [20, 20, 20]


def test_backpressure_drops_when_overloaded():
    """Parity: H13 frame-skip — with a slow first stage and a drop
    threshold, a burst must drop some frames rather than stall."""
    def slow(item):
        time.sleep(0.01)

    ex = native.AsyncExecutor([slow], queue_capacity=8, drop_threshold=2)
    accepted = sum(ex.submit(i) for i in range(50))
    ex.stop()
    stats = ex.stats()
    ex.close()
    assert accepted < 50
    assert stats["dropped"][0] == 50 - accepted
    assert stats["processed"][0] == accepted


def test_preloader_reads_files(tmp_path):
    paths = []
    for i in range(5):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(bytes([i]) * (100 + i))
        paths.append(str(p))
    with native.Preloader(paths) as pre:
        for i in range(5):
            data = pre.get(i)
            assert data == bytes([i]) * (100 + i)
