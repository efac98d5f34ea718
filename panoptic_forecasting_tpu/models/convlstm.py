"""ConvLSTM (NHWC) — cell + stacked layers, scan-friendly.

Reference capability: ``models/fg/convlstm.py`` (adapted there from
ndrplz/ConvLSTM_pytorch): cell = one 3×3 conv over concat([x, h]) producing
4 gates in (i, f, o, g) order (convlstm.py:39-68 — the order matters for
torch weight import); multi-layer stacking feeds layer l the output
sequence of layer l−1; "stateful" decoding passes the encoder's final
(h, c) list back in (convlstm.py:152-154).

TPU re-design: single-step cells composed into a stack; the time dimension
is rolled by the *caller* with ``nn.scan`` (models/fg.py) so the encoder
rollout and the coupled decoder share one compiled scan body instead of
Python loops over T (convlstm.py:166-179).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvLSTMCell(nn.Module):
    """One step. x (B, H, W, Cin), state ((B, H, W, Ch), (B, H, W, Ch))."""

    hidden: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, state, x):
        h, c = state
        kh, kw = self.kernel
        z = nn.Conv(
            4 * self.hidden,
            self.kernel,
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            use_bias=True,
            dtype=self.dtype,
            name="conv",
        )(jnp.concatenate([x, h], axis=-1).astype(self.dtype))
        i, f, o, g = jnp.split(z, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        o = jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_next = f * c + i * g
        h_next = o * jnp.tanh(c_next)
        return (h_next, c_next), h_next

    @staticmethod
    def init_state(batch: int, height: int, width: int, hidden: int, dtype=jnp.float32):
        z = jnp.zeros((batch, height, width, hidden), dtype)
        return (z, z)


class ConvLSTMStack(nn.Module):
    """num_layers stacked cells, one time step. Carries a tuple of per-layer
    (h, c) states; returns the last layer's output."""

    hidden: int
    num_layers: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, states, x):
        new_states = []
        out = x
        for l in range(self.num_layers):
            state, out = ConvLSTMCell(
                self.hidden, self.kernel, dtype=self.dtype,
                name=f"cell_{l}"
            )(states[l], out)
            new_states.append(state)
        return tuple(new_states), out

    @staticmethod
    def init_state(num_layers, batch, height, width, hidden, dtype=jnp.float32):
        return tuple(
            ConvLSTMCell.init_state(batch, height, width, hidden, dtype)
            for _ in range(num_layers)
        )
