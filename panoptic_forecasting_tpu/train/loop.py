"""Training loop: jitted SPMD train step + reference-parity epoch protocol.

Reference capability: ``train()`` (training/train.py:66-305). Epoch loop
with per-epoch validation (``val_interval`` with the reference's
``(epoch+1) % val_interval`` gating quirk, train.py:231), best-model
selection on val ``loss`` (train.py:275-280), gradient accumulation
(train.py:202,211-222), grad clipping (214-217), TensorBoard scalars per
split (227-230, 268-271), best/latest/trainer-state checkpoints
(279-289), per-epoch reseeded shuffling (172-173, 300-305), and resume.

TPU re-design:
* one jitted, donated train step — forward+backward+clip+update fused by
  XLA; the gradient mean over the sharded batch *is* the DDP all-reduce;
* gradient accumulation holds the running grad tree on device and applies
  on the boundary (same average semantics: loss scaled by 1/accum);
* metric reduction happens in-graph (sums + sample counts), the host only
  accumulates Python floats — no per-batch device→host sync of vectors;
* LR schedules rewrite an injected hyperparam (no recompile per epoch).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import checkpoint as ckpt
from ..models.base import merge_variables, split_variables
from ..parallel.mesh import make_mesh, replicate, shard_batch
from .optim import build_optimizer, lr_for_epoch, set_lr


def _metric_sums(metrics: Dict[str, jnp.ndarray]):
    """(sums, count): per-key scalar sums + the sample count of 'loss'.

    Mirrors train.py:196-208: vector losses count per-sample, scalars count 1.
    """
    loss = metrics["loss"]
    count = jnp.asarray(loss.size if loss.ndim else 1, jnp.float32)
    sums = {k: jnp.sum(v).astype(jnp.float32) for k, v in metrics.items()}
    return sums, count


def train(model, task_data, cfg: Dict[str, Any], writers=None,
          mesh=None) -> Dict[str, Any]:
    """Train ``model`` on ``task_data``; returns final params + stats."""
    t = cfg.get("training", {})
    num_epochs = int(t.get("num_epochs", 100))
    val_interval = int(t.get("val_interval", 1))
    accum = int(t.get("accumulate_steps", 1))
    seed = int(cfg.get("seed", 0))
    working_dir = cfg["working_dir"]
    verbose = bool(t.get("verbose"))

    if mesh is None:
        # Size the DP mesh to the largest device count that divides the
        # batch — otherwise shard_batch replicates and every device redoes
        # the full batch (8x wasted compute on a virtual-device CPU mesh).
        bs = int(t.get("batch_size", 1))
        n_dev = len(jax.devices())
        n = max(d for d in range(1, n_dev + 1) if bs % d == 0 or d == 1)
        mesh = make_mesh(n_devices=n)
    repl = replicate(mesh)

    train_writer = writers[0] if writers else None
    val_writer = writers[1] if writers and len(writers) > 1 else None

    train_loader = task_data.loader("train", cfg, seed=seed)
    val_loader = (
        task_data.loader("val", cfg, seed=seed)
        if "val" in task_data.datasets
        else None
    )

    opt = build_optimizer(cfg)
    lr_sched = lr_for_epoch(cfg)

    # ---- init / resume ----------------------------------------------------
    rng = jax.random.PRNGKey(seed)
    example = next(iter(task_data.loader("train", cfg, seed=seed)))
    # One jitted init: eagerly, every per-layer RNG/zeros op compiles
    # separately — ~0.5 s each over a tunneled TPU attachment.
    variables = jax.jit(lambda r: model.init(r, example))(rng)
    if cfg.get("load_model"):
        variables = ckpt.load_model(cfg["load_model"], like=variables)
    params, mstate = split_variables(variables)
    opt_state = jax.jit(opt.init)(params)

    start_epoch, best_val_epoch, best_val_result, step = 1, -1, 1e7, 0
    if cfg.get("continue_training") and ckpt.has_trainer_state(working_dir):
        variables = ckpt.load_model(working_dir, like=variables)
        params, mstate = split_variables(variables)
        state = ckpt.load_trainer_state(
            working_dir,
            like={
                "epoch": 0,
                "best_val_result": 0.0,
                "best_val_epoch": 0,
                "step": 0,
                "opt_state": opt_state,
            },
        )
        start_epoch = int(state["epoch"])
        best_val_result = float(state["best_val_result"])
        best_val_epoch = int(state["best_val_epoch"])
        step = int(state["step"])
        opt_state = state["opt_state"]
        print(f"RESUMING TRAINING AT EPOCH {start_epoch}")

    params = jax.device_put(params, repl)
    mstate = jax.device_put(mstate, repl)
    opt_state = jax.device_put(opt_state, repl)

    # ---- compiled steps ---------------------------------------------------
    def loss_fn(p, s, batch, rng):
        mean_loss, metrics, new_s = model.loss(p, s, batch, rng, train=True)
        return mean_loss / accum, (metrics, new_s)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def fused_step(p, s, o, batch, rng):
        (_, (metrics, s)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, s, batch, rng
        )
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        sums, count = _metric_sums(metrics)
        return p, s, o, sums, count

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def grad_step(p, s, acc, batch, rng):
        (_, (metrics, s)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, s, batch, rng
        )
        acc = jax.tree_util.tree_map(jnp.add, acc, grads)
        sums, count = _metric_sums(metrics)
        return s, acc, sums, count

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def apply_step(p, o, acc):
        updates, o = opt.update(acc, o, p)
        return optax.apply_updates(p, updates), o

    @jax.jit
    def eval_step(p, s, batch):
        _, metrics, _ = model.loss(p, s, batch, None, train=False)
        return _metric_sums(metrics)

    zeros_like_grads = jax.jit(
        lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
    )

    # Metric sums accumulate ON DEVICE across an epoch and are fetched
    # once at the end: a per-batch device_get is a full sync barrier — on
    # a tunneled TPU attachment each round trip costs ~0.4 s, and without
    # it the whole epoch's dispatches pipeline asynchronously.
    acc_sums = jax.jit(
        lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)
    )

    def _finish(acc) -> Dict[str, float]:
        if acc is None:
            return {}
        sums, n = jax.device_get(acc)
        n = float(max(n, 1.0))
        return {k: float(v) / n for k, v in sums.items()}

    def run_val(params, mstate) -> Dict[str, float]:
        acc = None
        for batch in val_loader:
            batch = shard_batch(mesh, _strip_meta(batch))
            out = eval_step(params, mstate, batch)
            acc = out if acc is None else acc_sums(acc, out)
        return _finish(acc)

    # ---- optional profiling (reference has none, SURVEY §5.1; here a
    # first-class switch: training.profile_dir captures a jax.profiler
    # trace of the first profile_steps train steps) --------------------------
    profile_dir = t.get("profile_dir")
    profile_steps = int(t.get("profile_steps", 5))
    profiling = False

    # ---- epoch loop -------------------------------------------------------
    history = []
    for epoch in range(start_epoch, num_epochs + 1):
        t0 = time.time()
        train_loader.set_epoch(epoch)
        if profile_dir and epoch == start_epoch:
            jax.profiler.start_trace(profile_dir)
            profiling = True
        # torch schedulers step at epoch end → epoch e runs at sched(e-1).
        opt_state = set_lr(opt_state, lr_sched(epoch - 1))

        acc = None
        micro = 0
        if accum > 1:
            grad_acc = zeros_like_grads(params)
        for batch_ind, batch in enumerate(train_loader):
            rng, sub = jax.random.split(rng)
            batch = shard_batch(mesh, _strip_meta(batch))
            if accum > 1:
                mstate, grad_acc, sums, count = grad_step(
                    params, mstate, grad_acc, batch, sub
                )
                micro += 1
                if micro == accum:
                    params, opt_state = apply_step(params, opt_state, grad_acc)
                    grad_acc = zeros_like_grads(params)
                    micro = 0
                    step += 1
            else:
                params, mstate, opt_state, sums, count = fused_step(
                    params, mstate, opt_state, batch, sub
                )
                step += 1
            if profiling and batch_ind + 1 >= profile_steps:
                jax.block_until_ready(params)
                jax.profiler.stop_trace()
                profiling = False
                print(f"profiler trace written to {profile_dir}")
            acc = (
                (sums, count) if acc is None else acc_sums(acc, (sums, count))
            )
            if verbose:  # forces a per-batch sync; debug only
                print(f"\tBATCH {batch_ind + 1}: {float(jax.device_get(sums['loss'])) / max(float(count), 1):.6f}")

        if profiling:  # epoch shorter than profile_steps
            jax.block_until_ready(params)
            jax.profiler.stop_trace()
            profiling = False
            print(f"profiler trace written to {profile_dir}")
        train_scalars = _finish(acc)
        if train_writer is not None:
            train_writer.add_scalars(train_scalars, epoch)

        # Reference gating quirk preserved: train.py:231.
        if (epoch + 1) % val_interval != 0:
            continue

        if val_loader is not None:
            val_scalars = run_val(params, mstate)
            if val_writer is not None:
                val_writer.add_scalars(val_scalars, epoch)
            epoch_loss = val_scalars["loss"]
        else:
            val_scalars = None
            epoch_loss = train_scalars["loss"]

        if epoch_loss < best_val_result:
            best_val_epoch, best_val_result = epoch, epoch_loss
            ckpt.save_model(working_dir, merge_variables(params, mstate), best=True)
        ckpt.save_model(working_dir, merge_variables(params, mstate), best=False)
        ckpt.save_trainer_state(
            working_dir,
            {
                "epoch": epoch + 1,
                "best_val_result": best_val_result,
                "best_val_epoch": best_val_epoch,
                "step": step,
                "opt_state": opt_state,
            },
        )
        history.append(
            {"epoch": epoch, "train": train_scalars, "val": val_scalars}
        )
        print(
            f"EPOCH {epoch} ({time.time() - t0:.1f}s): "
            f"train loss {train_scalars['loss']:.6f}"
            + (f", val loss {epoch_loss:.6f}" if val_loader is not None else "")
            + f" (best {best_val_result:.6f} @ {best_val_epoch})"
        )

    return {
        "params": merge_variables(params, mstate),
        "best_val_result": best_val_result,
        "best_val_epoch": best_val_epoch,
        "step": step,
        "history": history,
    }


def _strip_meta(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Drop host-only metadata before device transfer (train_utils.py:56-61)."""
    return {k: v for k, v in batch.items() if k != "meta"}
