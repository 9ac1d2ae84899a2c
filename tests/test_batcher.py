"""Continuous window batcher tests."""

import threading
import time

import numpy as np

from latentsync_tpu.serving.batcher import WindowBatcher


def test_batcher_aggregates_across_clips():
    calls = []

    def batch_fn(stacked):
        calls.append(stacked["x"].shape[0])
        return stacked["x"] * 2.0

    b = WindowBatcher(batch_fn, max_windows=4, max_wait_ms=50)
    # two "clips" submit concurrently
    f1 = b.submit_clip([{"x": np.full((2, 2), i, np.float32)} for i in range(3)])
    f2 = b.submit_clip([{"x": np.full((2, 2), 10 + i, np.float32)} for i in range(3)])
    results1 = [f.result(timeout=5) for f in f1]
    results2 = [f.result(timeout=5) for f in f2]
    for i, r in enumerate(results1):
        np.testing.assert_array_equal(r, np.full((2, 2), 2 * i, np.float32))
    for i, r in enumerate(results2):
        np.testing.assert_array_equal(r, np.full((2, 2), 2 * (10 + i), np.float32))
    # 6 windows over bucket 4 → at most 3 device calls, at least one
    # call carried windows from both clips
    assert sum(calls) >= 6 and len(calls) <= 3
    b.close()


def test_batcher_propagates_errors():
    def batch_fn(stacked):
        raise RuntimeError("boom")

    b = WindowBatcher(batch_fn, max_windows=2, max_wait_ms=5)
    f = b.submit({"x": np.zeros(2, np.float32)})
    try:
        f.result(timeout=5)
        assert False
    except RuntimeError as e:
        assert "boom" in str(e)
    b.close()


def test_batcher_pads_bucket():
    shapes = []

    def batch_fn(stacked):
        shapes.append(stacked["x"].shape)
        return stacked["x"]

    b = WindowBatcher(batch_fn, max_windows=8, max_wait_ms=5)
    f = b.submit({"x": np.ones(3, np.float32)})
    f.result(timeout=5)
    assert shapes[0] == (8, 3)  # padded to the compiled bucket
    b.close()
