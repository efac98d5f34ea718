"""Optimizer + LR schedule construction (optax).

Reference capability: the optimizer block at training/train.py:124-136 and
``build_scheduler`` at training/train_utils.py:13-24. Two released-behavior
quirks are preserved *and* fixed (both documented in SURVEY.md §2.4):

* the reference's ``use_adamw`` branch is unreachable (overwritten by the
  un-chained ``use_adam``/SGD if-else, train.py:130-136). Here the selection
  is a proper elif chain — ``use_adamw`` actually yields AdamW — with
  ``use_adam`` taking precedence when both are set, matching what the
  released code effectively did.
* the reference scheduler reads ``lr_decay_type`` while every shipped config
  sets ``lr_scheduler_type`` → constant LR in practice. We honor
  ``lr_decay_type`` (step/poly active) and warn-and-ignore
  ``lr_scheduler_type``, reproducing released behavior for shipped configs.

The per-epoch schedule is applied by the trainer through
``optax.inject_hyperparams`` so the jitted step never recompiles on LR
changes.
"""

from __future__ import annotations

import warnings
from typing import Any, Callable, Dict

import optax


def lr_for_epoch(cfg: Dict[str, Any]) -> Callable[[int], float]:
    """Return an epoch -> learning-rate function matching torch semantics.

    ``step``: StepLR — lr·γ^(epoch // step_size) (train_utils.py:15-18).
    ``poly``: torch MultiplicativeLR with f(e) = 1 − e/N, i.e. a *cumulative
    product* of the per-epoch factors (train_utils.py:19-22) — note this is
    not standard polynomial decay; we reproduce torch's semantics.
    """
    t = cfg.get("training", {})
    base_lr = float(t["lr"])
    decay_type = t.get("lr_decay_type")
    if t.get("lr_scheduler_type") and not decay_type:
        warnings.warn(
            "config sets 'lr_scheduler_type', which the reference trainer "
            "never reads (train_utils.py:14) — using constant LR for parity; "
            "set 'lr_decay_type' to activate a schedule"
        )
    if decay_type == "step":
        gamma = float(t.get("lr_decay_factor", 0.1))
        step_size = int(t.get("lr_decay_steps", 30))
        return lambda epoch: base_lr * gamma ** (epoch // step_size)
    if decay_type == "poly":
        num_epochs = int(t["num_epochs"])

        def sched(epoch: int) -> float:
            m = 1.0
            for e in range(1, epoch + 1):
                m *= max(0.0, 1.0 - e / num_epochs)
            return base_lr * m

        return sched
    if decay_type is None:
        return lambda epoch: base_lr
    raise ValueError(f"unknown lr_decay_type: {decay_type!r}")


def build_optimizer(cfg: Dict[str, Any]) -> optax.GradientTransformation:
    """Gradient clip → weight decay → optimizer chain from the config.

    Torch-parity notes: torch Adam/SGD ``weight_decay`` is L2-added-to-grad
    (before momentum), i.e. ``add_decayed_weights`` *before* the kernel —
    not AdamW's decoupled decay. Value-clip takes precedence over norm-clip
    (train.py:214-217), and clipping applies to the accumulated gradient.
    """
    t = cfg.get("training", {})
    lr = float(t["lr"])
    wd = float(t.get("wd", 0.0))
    mom = float(t.get("mom", 0.0))

    pre = []
    clip_grad = t.get("clip_grad")
    clip_grad_norm = t.get("clip_grad_norm")
    if clip_grad is not None:
        pre.append(optax.clip(float(clip_grad)))
    elif clip_grad_norm is not None:
        pre.append(optax.clip_by_global_norm(float(clip_grad_norm)))

    if t.get("use_adam", False):
        if wd:
            pre.append(optax.add_decayed_weights(wd))
        core = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    elif t.get("use_adamw", False):
        core = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=wd
        )
    else:
        if wd:
            pre.append(optax.add_decayed_weights(wd))
        core = optax.inject_hyperparams(optax.sgd)(
            learning_rate=lr, momentum=mom if mom else None
        )
    return optax.chain(*pre, core) if pre else core


def set_lr(opt_state: Any, lr) -> Any:
    """Rewrite the injected ``learning_rate`` hyperparam in an opt state.

    Works on bare InjectHyperparamsState and on chain tuples of states.
    """
    if hasattr(opt_state, "hyperparams") and "learning_rate" in opt_state.hyperparams:
        hp = dict(opt_state.hyperparams)
        hp["learning_rate"] = hp["learning_rate"] * 0 + lr
        return opt_state._replace(hyperparams=hp)
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "hyperparams"):
        return tuple(set_lr(s, lr) for s in opt_state)
    return opt_state
