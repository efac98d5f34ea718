"""Model protocol: the functional replacement for the reference's BaseModel.

Reference capability (models/base_model.py:11-23): every task model exposes
``loss(inputs, labels) -> dict`` (key 'loss' = per-sample vector or scalar),
``predict(inputs, labels) -> dict``, plus whole-state save/load. In JAX the
state lives outside the model object, so a TaskModel is a *pure-function
bundle*: it owns a flax module + static config, and its methods take the
param pytree explicitly. Trainers jit `loss_fn`; exporters jit `predict`.

Checkpointing of the param pytree is handled by core/checkpoint.py (Orbax),
not here.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


class TaskModel:
    """Base class for task models.

    Subclasses set ``self.module`` (a flax.linen.Module) and implement
    ``loss`` / ``predict``. State protocol: ``init`` returns a *variables*
    dict (``{'params': ..., 'batch_stats': ...}``); the trainer
    differentiates w.r.t. ``variables['params']`` and threads the rest
    (mutable collections like BatchNorm statistics) through ``loss``:

        loss(params, state, batch, rng, train) -> (mean_loss, metrics, new_state)

    ``metrics['loss']`` is the per-sample loss vector (the trainer averages
    it sample-weighted across grad-accumulation steps and hosts, mirroring
    the reference's vector-loss protocol, train.py:196-202). ``predict``
    takes the full variables dict.
    """

    module: Any = None

    def init(self, rng: jax.Array, batch: Dict[str, Any]) -> Any:
        """Initialize the variables dict from a (host) example batch."""
        raise NotImplementedError

    def loss(self, params: Any, state: Dict[str, Any], batch: Dict[str, Any],
             rng: Optional[jax.Array] = None, train: bool = True
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
        raise NotImplementedError

    def predict(self, variables: Any, batch: Dict[str, Any]) -> Dict[str, Any]:
        raise NotImplementedError


def split_variables(variables: Dict[str, Any]) -> Tuple[Any, Dict[str, Any]]:
    """(params, non-param state collections)."""
    params = variables.get("params", {})
    state = {k: v for k, v in variables.items() if k != "params"}
    return params, state


def merge_variables(params: Any, state: Dict[str, Any]) -> Dict[str, Any]:
    return {"params": params, **state}


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise SmoothL1 (beta=1), matching torch.nn.SmoothL1Loss."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = pred - target
    return d * d


LOSS_FNS = {"smooth_l1": smooth_l1, "mse": mse}
