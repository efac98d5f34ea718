"""Shared CLI plumbing: config load, seeding, model/param restore."""

from __future__ import annotations

import os
import random
from typing import Any, Optional, Tuple

import numpy as np

from ..core import build_dataset, build_model
from ..core import checkpoint as ckpt
from ..core.config import Config, load_config, save_config


def seed_everything(seed: int) -> None:
    """Host-side RNG seeding (reference utils/misc.py:15-19); device RNG is
    explicit PRNG keys threaded by the trainer."""
    random.seed(seed)
    np.random.seed(seed)


def maybe_force_platform(cfg) -> None:
    import jax

    if cfg.get("platform"):
        jax.config.update("jax_platforms", cfg["platform"])
    # Persistent compilation cache for every CLI run. Crucial on tunneled
    # TPU attachments where each first-time compile — including the
    # hundreds of eager micro-ops from model/optimizer init — costs a
    # ~0.5 s HTTP round trip; with the cache a repeat run skips them all.
    # Per-user default: a fixed shared /tmp path would be owned by the
    # first user on a multi-user host (permission failures / cache
    # poisoning for everyone else).
    import tempfile

    default_cache = os.path.join(
        tempfile.gettempdir(),
        f"pf_tpu_jax_cache_{os.getuid() if hasattr(os, 'getuid') else 'u'}",
    )
    cache_dir = cfg.get("compilation_cache_dir", default_cache)
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def setup(argv=None, test: bool = False) -> Tuple[Config, Any, Any]:
    """load config → build datasets → build model. Returns (cfg, data, model)."""
    cfg = load_config(argv)
    maybe_force_platform(cfg)
    # Multi-host: must run before any jax backend use so jax.devices()
    # spans all hosts (reference wires init_distributed_mode into every
    # train run, utils/dist.py:12-32 / train.py:76).
    from ..parallel.mesh import init_distributed

    init_distributed(cfg)
    seed_everything(int(cfg.get("seed", 0)))
    task_data = build_dataset(cfg, test=test)
    if cfg.get("load_torch_model"):
        # Reference *.pt checkpoints carry the normalization stats as frozen
        # parameters — inject them into the card BEFORE the model reads it.
        _, stats = _load_torch_checkpoint(cfg)
        for name, (mean, std) in stats.items():
            task_data.card.set_stats(name, mean, std)
    model = build_model(cfg, task_data.card)
    return cfg, task_data, model


def _load_torch_checkpoint(cfg):
    from ..models.reference_import import load_reference_checkpoint

    kw = {}
    if cfg["task"] == "fg":
        m = cfg.get("model", {})
        kw = {
            "instance_feat_channels": int(m.get("instance_feat_channels", 8)),
            "feat_hw": int(m.get("mask_feat_hw", 14)),
        }
    return load_reference_checkpoint(
        cfg["task"], cfg["load_torch_model"], **kw
    )


def restore_params(cfg, model, task_data, example_batch=None):
    """Initialize params, then restore best/latest/explicit checkpoint.

    Reference: models/__init__.py:29-41 (best_model from working_dir unless
    --load_model gives an explicit path).
    """
    import jax

    if example_batch is None:
        split = next(iter(task_data.datasets))
        example_batch = task_data.loader(split, cfg, test=True)
        example_batch = next(iter(example_batch))
    params = model.init(jax.random.PRNGKey(int(cfg.get("seed", 0))), example_batch)
    if cfg.get("load_torch_model"):
        import jax.numpy as jnp

        loaded, _ = _load_torch_checkpoint(cfg)
        loaded = jax.tree_util.tree_map(jnp.asarray, loaded)
        if "params" not in loaded:  # odom/fg importers return bare params
            loaded = {"params": loaded}
        return {**params, **loaded}
    if cfg.get("load_model"):
        return ckpt.load_model(cfg["load_model"], like=params)
    wd = cfg["working_dir"]
    best = os.path.join(wd, ckpt.BEST)
    latest = os.path.join(wd, ckpt.LATEST)
    if os.path.isdir(best):
        return ckpt.load_model(best, like=params)
    if os.path.isdir(latest):
        return ckpt.load_model(latest, like=params)
    return params


def export_writer(cfg):
    """AsyncWriter for an export CLI: host-side PNG/npy writes overlap
    the next batch's device step. ``export_write_threads: 0`` restores
    fully synchronous writes."""
    from ..data.io import AsyncWriter

    return AsyncWriter(workers=int(cfg.get("export_write_threads", 4)))


def pipelined_map(fn, iterable, depth: int = 2):
    """Yield ``(fn(item), item)`` in order, computing the next item's
    ``fn`` on a background thread.

    ``fn`` must be PURE HOST work (IO/decode): dispatching JAX
    computations from a worker thread while the main thread fetches
    results deadlocks the tunneled TPU attachment (observed: export
    hangs with ~0 CPU). Used by the fused-forecast exporter to overlap
    the next frame's pc input fetch with the device step; the iterable
    itself is advanced on the caller's thread.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(max_workers=1)
    try:
        pending = deque()
        for item in iterable:
            pending.append((ex.submit(fn, item), item))
            while len(pending) >= depth:
                fut, it0 = pending.popleft()
                yield fut.result(), it0
        while pending:
            fut, it0 = pending.popleft()
            yield fut.result(), it0
    finally:
        ex.shutdown(wait=True)
