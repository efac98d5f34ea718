"""Loader behaviors: weighted sampling, steps_per_epoch, shuffling."""

import numpy as np
import pytest

from panoptic_forecasting_tpu.data.loader import Loader


class _DS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"inputs": {"x": np.array([i], np.int64)},
                "labels": {}, "meta": {"i": i}}


def test_weighted_sampling_biases_draws():
    """train.py:39-44 parity: per-sample weights drive an infinite sampler."""
    ds = _DS(4)
    w = np.array([0.0, 0.0, 0.0, 1.0])
    loader = Loader(ds, batch_size=2, shuffle=True, weights=w,
                    steps_per_epoch=8, seed=0)
    seen = []
    for batch in loader:
        seen.extend(batch["inputs"]["x"].reshape(-1).tolist())
    assert set(seen) == {3}


def test_steps_per_epoch_wraps_infinitely():
    ds = _DS(3)
    loader = Loader(ds, batch_size=2, shuffle=True, steps_per_epoch=5,
                    seed=0)
    assert len(loader) == 5
    batches = list(loader)
    assert len(batches) == 5  # more draws than one pass over the data


def test_shuffle_changes_with_epoch():
    ds = _DS(16)
    loader = Loader(ds, batch_size=16, shuffle=True, seed=0)
    loader.set_epoch(1)
    a = next(iter(loader))["inputs"]["x"].reshape(-1)
    loader.set_epoch(2)
    b = next(iter(loader))["inputs"]["x"].reshape(-1)
    assert not np.array_equal(a, b)
    assert sorted(a.tolist()) == sorted(b.tolist())


def test_fg_scene_collate_mixed_buckets(tmp_path):
    """Regression: batching scenes whose instance buckets differ must not
    crash (reference handles this with a list collate,
    fg_scene_dataset.py:514-528; we re-pad to the batch max bucket)."""
    from panoptic_forecasting_tpu.core import build_dataset
    from panoptic_forecasting_tpu.data.synthetic import write_fg_fixture

    root = str(tmp_path)
    write_fg_fixture(root, splits=("val",), n_scenes=4, max_instances=12,
                     seed=3)
    cfg = {
        "task": "fg",
        "data": {
            "dataset_type": "fg_scene",
            "data_splits": ["val"],
            "data_dir": root,
            "depth_dir": root,
            "feats_dir": root,
            "info_3d_dir": root,
            "use_3d_info": True,
            "max_depth": 200,
            "instance_pad_multiple": 4,
        },
        "training": {"batch_size": 2},
    }
    data = build_dataset(cfg, test=True)
    ds = data.datasets["val"]
    buckets = {ds[i]["inputs"]["valid"].shape[0] for i in range(len(ds))}
    assert len(buckets) > 1, "fixture must span instance buckets"

    loader = data.loader("val", cfg, test=True)
    total_valid = 0
    for batch in loader:
        v = batch["inputs"]["valid"]
        assert v.ndim == 2  # (S, N) — stacked fine across buckets
        n = v.shape[1]
        for key in ("trajectories", "feats", "classes"):
            assert batch["inputs"][key].shape[1] == n
        for key in ("output_inds", "trajectories", "feats"):
            assert batch["labels"][key].shape[1] == n
        # padded output_inds rows still select a valid decode step
        oi = batch["labels"]["output_inds"]
        assert (oi == oi[:, :1]).all()
        total_valid += int(v.sum())
    assert total_valid == sum(
        ds[i]["meta"]["num_instances"] for i in range(len(ds))
    )


def test_prefetch_and_threads_preserve_order_and_content():
    """Prefetched + thread-fetched epochs yield byte-identical batches in
    the same order as the synchronous loader (single producer thread)."""
    ds = _DS(13)
    sync = Loader(ds, batch_size=4, shuffle=True, seed=7)
    fast = Loader(ds, batch_size=4, shuffle=True, seed=7,
                  prefetch=3, num_threads=2)
    sync.set_epoch(1)
    fast.set_epoch(1)
    a = [b["inputs"]["x"].reshape(-1).tolist() for b in sync]
    b = [b["inputs"]["x"].reshape(-1).tolist() for b in fast]
    assert a == b


def test_prefetch_propagates_worker_exceptions():
    class _Boom(_DS):
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("bad sample")
            return super().__getitem__(i)

    loader = Loader(_Boom(8), batch_size=2, prefetch=2)
    with pytest.raises(RuntimeError, match="bad sample"):
        list(loader)


def test_prefetch_abandoned_iterator_stops_producer():
    loader = Loader(_DS(64), batch_size=1, prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # must not deadlock or leak a blocked producer


def test_prefetch_slow_consumer_terminates():
    """Regression: the end-of-epoch sentinel must be delivered even when
    the queue is full because the consumer is mid-step. A best-effort
    0.1 s sentinel put used to be dropped, deadlocking the consumer's
    next q.get() forever (hit by the trainer as soon as prefetch became
    the default)."""
    import time

    from panoptic_forecasting_tpu.data.loader import _background_prefetch

    items = list(range(5))
    got = []
    it = _background_prefetch(iter(items), depth=1)
    for x in it:
        time.sleep(0.3)  # keep the queue full while the producer finishes
        got.append(x)
    assert got == items


def test_threaded_fetch_overlaps_decode_cost():
    """The parallel input pipeline must actually deliver parallelism: with a
    realistic per-sample decode cost (sleep stands in for PNG/zlib work,
    which releases the GIL in the native module), the threaded+prefetch
    loader finishes an epoch at least 2x faster than the synchronous one
    (reference configs run 2-8 DataLoader workers for the same reason,
    configs/bg/bg_train.yaml num_data_workers)."""
    import time

    class _Slow(_DS):
        def __getitem__(self, i):
            time.sleep(0.01)
            return super().__getitem__(i)

    ds = _Slow(64)
    t0 = time.perf_counter()
    n_sync = sum(1 for _ in Loader(ds, batch_size=8))
    t_sync = time.perf_counter() - t0
    fast = Loader(ds, batch_size=8, prefetch=2, num_threads=8)
    t0 = time.perf_counter()
    n_fast = sum(1 for _ in fast)
    t_fast = time.perf_counter() - t0
    assert n_sync == n_fast == 8
    assert t_sync >= 0.6  # 64 x 10 ms decode, serial
    assert t_fast * 2 < t_sync, (t_fast, t_sync)


def test_lazyh5_concurrent_first_open_single_handle(tmp_path):
    """pf-loader threads hitting the first open concurrently must share ONE
    h5py handle (double-checked lock in LazyH5.handle)."""
    import threading

    import h5py

    from panoptic_forecasting_tpu.data.io import LazyH5

    path = str(tmp_path / "x.h5")
    with h5py.File(path, "w") as f:
        f["d"] = np.arange(8)

    lazy = LazyH5(path)
    got = []
    barrier = threading.Barrier(8)

    def worker():
        barrier.wait()
        got.append(lazy.handle())

    ts = [threading.Thread(target=worker) for _ in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len({id(h) for h in got}) == 1
    np.testing.assert_array_equal(np.asarray(lazy["d"]), np.arange(8))
    lazy.close()

    # pickling transports the path only; the handle reopens lazily
    import pickle

    back = pickle.loads(pickle.dumps(LazyH5(path)))
    np.testing.assert_array_equal(np.asarray(back["d"]), np.arange(8))
    back.close()
