"""Batch loader: map-style datasets → stacked numpy batches.

Reference capability: torch DataLoader + InfiniteDataloader + collate_fns
(training/train.py:25-64,101-122; datasets' module-level ``collate_fn``s).
JAX-native redesign: the loader yields **numpy** dict batches (host-side);
device placement/sharding happens in the trainer via ``shard_batch`` so the
loader stays framework-free. Supports shuffle, drop_last, weighted sampling
(train.py:39-44), and ``steps_per_epoch``-style infinite epochs
(InfiniteDataloader, train.py:25-64).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def _background_prefetch(it: Iterator, depth: int) -> Iterator:
    """Run ``it`` in a daemon thread, buffering up to ``depth`` items.

    Replaces the reference's forked DataLoader workers
    (training/train.py:101-109): decode/collate of batch k+1..k+depth
    overlaps the device step on batch k. Single producer thread → batch
    order is identical to the synchronous path.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    sentinel = object()
    err: List[BaseException] = []

    def producer():
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surfaced to the consumer
            err.append(e)
        finally:
            # The sentinel MUST be delivered on normal completion or the
            # consumer blocks forever on q.get() once it drains the queue
            # (a single 0.1 s best-effort put dropped it whenever the
            # consumer was still busy with an earlier batch — deadlocked
            # the trainer the moment prefetch became the default). Retry
            # until delivered; bail only if the consumer abandoned us.
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def default_collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack 'inputs'/'labels' leaf-wise; 'meta' values become lists.

    Mirrors the reference's per-dataset collate_fns (odom_dataset.py:152-165).
    """

    def stack_tree(items):
        first = items[0]
        if isinstance(first, dict):
            return {k: stack_tree([it[k] for it in items]) for k in first}
        if isinstance(first, np.ndarray) or np.isscalar(first):
            return np.stack([np.asarray(it) for it in items])
        return list(items)

    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key == "meta":
            out[key] = {k: [v[k] for v in vals] for k in vals[0]}
        else:
            out[key] = stack_tree(vals)
    return out


class Loader:
    """Iterate a dataset in batches; one ``__iter__`` = one epoch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        collate_fn: Optional[Callable] = None,
        steps_per_epoch: Optional[int] = None,
        weights: Optional[np.ndarray] = None,
        seed: int = 0,
        prefetch: int = 0,
        num_threads: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate = collate_fn or default_collate
        self.steps_per_epoch = steps_per_epoch
        self.weights = weights
        self._rng = np.random.RandomState(seed)
        self._epoch = 0
        # Input-pipeline parallelism (reference: num_data_workers DataLoader
        # forks, train.py:101-109). Threads instead of forks: h5py handles
        # stay valid, PNG/zlib decode releases the GIL in the native module.
        self.prefetch = int(prefetch)
        self.num_threads = int(num_threads)
        self._pool = None
        if self.num_threads > 0:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self.num_threads,
                thread_name_prefix="pf-loader",
            )

    def _fetch(self, idx) -> List[Dict[str, Any]]:
        """Fetch one batch worth of samples (thread-parallel if configured;
        order always matches ``idx``)."""
        ints = [int(i) for i in idx]
        if self._pool is not None and len(ints) > 1:
            return list(self._pool.map(self.dataset.__getitem__, ints))
        return [self.dataset[i] for i in ints]

    def set_epoch(self, epoch: int) -> None:
        """Reseed shuffling per epoch (reference train.py:172-173,300-305).

        Also forwarded to the dataset so per-sample augmentation RNG
        re-randomizes each epoch (e.g. BGDataset crops/flips)."""
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        if self.steps_per_epoch is not None:
            return self.steps_per_epoch
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        rng = np.random.RandomState(self._rng.randint(2**31) + self._epoch)
        if self.weights is not None:
            p = np.asarray(self.weights, np.float64)
            return rng.choice(n, size=n, replace=True, p=p / p.sum())
        if self.shuffle:
            return rng.permutation(n)
        return np.arange(n)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        it = self._epoch_iter()
        if self.prefetch > 0:
            return _background_prefetch(it, self.prefetch)
        return it

    def _epoch_iter(self) -> Iterator[Dict[str, Any]]:
        if self.steps_per_epoch is None:
            order = self._order()
            stop = (
                len(order) - len(order) % self.batch_size
                if self.drop_last
                else len(order)
            )
            for s in range(0, stop, self.batch_size):
                idx = order[s : s + self.batch_size]
                yield self.collate(self._fetch(idx))
            return
        # Infinite mode: keep drawing fresh shuffles until steps are served.
        served = 0
        order = self._order()
        pos = 0
        while served < self.steps_per_epoch:
            if pos + self.batch_size > len(order):
                order = self._order()
                pos = 0
            idx = order[pos : pos + self.batch_size]
            pos += self.batch_size
            served += 1
            yield self.collate(self._fetch(idx))
