"""Shared NN building blocks (MLPs, scanned GRU)."""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    """Dense stack. ``relu_first`` inserts ReLU *before* layers 1.. (the
    reference's output-head pattern, odom_model.py:46-52); ``relu_last``
    appends ReLU after every layer (the input-embedding pattern,
    odom_model.py:31-35)."""

    features: Sequence[int]
    relu_first: bool = False
    relu_last: bool = False

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            if self.relu_first and i > 0:
                x = nn.relu(x)
            x = nn.Dense(f, name=f"dense_{i}")(x)
            if self.relu_last:
                x = nn.relu(x)
        return x


class ScannedGRU(nn.Module):
    """GRU encoder over a (B, T, D) sequence via nn.scan — returns all
    hidden states and the final hidden. Replaces torch.nn.GRU(batch_first)
    rollouts (odom_model.py:42, fg_model.py:47-52) with a single compiled
    scan instead of a Python loop."""

    hidden: int

    @nn.compact
    def __call__(self, xs, h0: Optional[jax.Array] = None):
        b = xs.shape[0]
        if h0 is None:
            h0 = jnp.zeros((b, self.hidden), xs.dtype)
        cell = nn.scan(
            nn.GRUCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(features=self.hidden, name="cell")
        h_final, ys = cell(h0, xs)
        return ys, h_final
