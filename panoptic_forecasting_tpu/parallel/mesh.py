"""Device mesh + sharding helpers: the communication layer.

Reference capability: ``utils/dist.py`` (NCCL process groups, DDP gradient
all-reduce, ``reduce_dict`` metric averaging, master-only checkpointing) and
the DDP data-parallel strategy in training/train.py:99-103. TPU-native
replacement: a ``jax.sharding.Mesh`` with a ``data`` axis; batches are
sharded with ``NamedSharding(P('data', ...))``, parameters are replicated,
and the jitted train step's gradient mean *is* the all-reduce — XLA inserts
the collective over ICI. No explicit process groups, no NCCL analog.

The mesh is 1-D (``data``) because the reference's only strategy is DP
(SURVEY.md §2.3) — but it is constructed explicitly so additional SPMD axes
(e.g. a spatial ``model`` axis for full-res HarDNet) can be added without
touching the trainer.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans slices (DCN) transparently. ``is_main_process`` maps to
``jax.process_index() == 0`` (reference dist.py:70-76).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(cfg) -> bool:
    """Multi-host init (reference utils/dist.py:12-32, NCCL rendezvous).

    With ``distributed`` set, calls ``jax.distributed.initialize`` so
    ``jax.devices()`` spans every host and one ``make_mesh`` covers the
    pod/slice. On TPU pods the topology auto-detects; the explicit
    coordinator/process keys support CPU tests and manual launches.
    Returns True when initialization ran.
    """
    if not cfg.get("distributed"):
        return False
    kw = {}
    for k in ("coordinator_address", "num_processes", "process_id"):
        if cfg.get(k) is not None:
            kw[k] = cfg[k]
    jax.distributed.initialize(**kw)
    _silence_nonmain_prints()
    return True


def _silence_nonmain_prints() -> None:
    """Non-main processes print only with ``print(..., force=True)`` —
    the reference's setup_for_distributed monkey-patch (dist.py:35-47),
    so a pod run emits one progress stream instead of N interleaved."""
    if jax.process_index() == 0:
        return
    import builtins

    orig = builtins.print

    def quiet_print(*args, **kwargs):
        if kwargs.pop("force", False):
            orig(*args, **kwargs)

    builtins.print = quiet_print


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put a host batch pytree with the batch dim sharded.

    Arrays whose leading dim doesn't divide the mesh are replicated instead
    (scalars, ragged metadata that slipped through).
    """
    n = mesh.devices.size
    sharded = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    batch = jax.tree_util.tree_map(np.asarray, batch)
    shardings = jax.tree_util.tree_map(
        lambda x: sharded if (x.ndim >= 1 and x.shape[0] % n == 0) else repl,
        batch,
    )
    # One device_put over the whole tree: transfers issue together
    # (per-leaf calls serialize round trips on tunneled attachments).
    return jax.device_put(batch, shardings)


def is_main_process() -> bool:
    return jax.process_index() == 0
