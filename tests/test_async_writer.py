"""AsyncWriter: bounded host-side write pool used by the export CLIs.

The reference export loops write PNGs synchronously between device steps
(export_cityscapes_segmentation_results.py:53-127); our exporters overlap
encode+write with the next batch via AsyncWriter. These tests pin its
contract: everything submitted lands on disk, worker errors re-raise on
the caller's thread, and workers=0 degrades to synchronous calls.
"""

import os

import numpy as np
import pytest

from panoptic_forecasting_tpu.data.io import AsyncWriter, load_png, save_png


def test_all_writes_land_and_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    arrays = [
        rng.randint(0, 255, size=(16, 24)).astype(np.uint8)
        for _ in range(20)
    ]
    with AsyncWriter(workers=4, max_pending=8) as w:
        for i, a in enumerate(arrays):
            w.submit(save_png, str(tmp_path / f"city/{i}.png"), a)
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(
            load_png(str(tmp_path / f"city/{i}.png")), a
        )


def test_worker_error_raises_on_close():
    def boom():
        raise RuntimeError("disk full")

    w = AsyncWriter(workers=2)
    w.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        w.close()


def test_worker_error_raises_at_next_submit():
    def boom():
        raise RuntimeError("disk full")

    w = AsyncWriter(workers=1, max_pending=1)
    w.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        # max_pending=1 forces the failed job to finish before this
        # submit acquires a slot, so the error is visible by then.
        w.submit(boom)
        w.submit(boom)
    w = AsyncWriter(workers=1)  # a fresh writer still works
    done = []
    w.submit(done.append, 1)
    w.close()
    assert done == [1]


def test_workers_zero_is_synchronous(tmp_path):
    w = AsyncWriter(workers=0)
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    w.submit(save_png, str(tmp_path / "x.png"), a)
    # Synchronous: the file exists before close().
    np.testing.assert_array_equal(load_png(str(tmp_path / "x.png")), a)
    w.close()

    def boom():
        raise ValueError("sync error")

    with pytest.raises(ValueError, match="sync error"):
        AsyncWriter(workers=0).submit(boom)


def test_writer_overlaps_slow_writes():
    """4 workers must overlap IO-bound writes ≥2x vs in-line calls
    (sleep-simulated IO so the assertion is scheduler-, not CPU-,
    bound — same style as the loader throughput test)."""
    import time

    def slow_write():
        time.sleep(0.02)

    n = 16
    t0 = time.perf_counter()
    w = AsyncWriter(workers=0)
    for _ in range(n):
        w.submit(slow_write)
    w.close()
    sync_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    with AsyncWriter(workers=4, max_pending=8) as w:
        for _ in range(n):
            w.submit(slow_write)
    thr_s = time.perf_counter() - t0
    assert thr_s * 2 < sync_s, (thr_s, sync_s)


def test_body_exception_not_masked(tmp_path):
    """A failure inside the with-body propagates even if a queued write
    also failed."""
    def boom():
        raise RuntimeError("writer error")

    with pytest.raises(KeyError, match="body"):
        with AsyncWriter(workers=1) as w:
            w.submit(boom)
            raise KeyError("body")
