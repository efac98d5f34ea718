"""Loader behaviors: weighted sampling, steps_per_epoch, shuffling."""

import numpy as np

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
