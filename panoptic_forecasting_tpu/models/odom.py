"""Egomotion (odometry) forecaster: GRU encoder + autoregressive decoder.

Reference capability: ``OdomModel`` (models/odom/odom_model.py:12-121) —
optional MLP input embedding, single-layer GRU (hidden 128), MLP head to a
2-d (speed, yaw_rate) output; encode the first T−1 observations, then roll
``output_len`` steps feeding back the prediction (``direct``) or the
accumulated value (``offset``); normalization stats are dataset-provided
constants; loss is mse/smooth_l1, optionally in normalized space.

TPU re-design: the whole encode+decode is two ``lax.scan``s inside one jit
(no per-step Python), stats live in the DataCard, and ``output_len`` is a
static module attribute so shapes stay fixed under jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import LOSS_FNS, TaskModel
from .layers import MLP


class _OdomCore(nn.Module):
    """Shared cell/embedding/head with single-step encode/decode methods;
    rolled out with lifted ``nn.scan`` so the same params serve both phases
    (the reference rolls the decoder with the encoder's GRU,
    odom_model.py:84-96)."""

    rnn_hidden: int
    predict_type: str
    inp_emb_layers: Optional[Sequence[int]]
    out_layers: Sequence[int]

    def setup(self):
        self.cell = nn.GRUCell(features=self.rnn_hidden)
        self.emb = (
            MLP(tuple(self.inp_emb_layers), relu_last=True)
            if self.inp_emb_layers
            else None
        )
        self.head = MLP(tuple(self.out_layers) + (2,), relu_first=True)

    def encode(self, h, x):
        x = self.emb(x) if self.emb is not None else x
        h, _ = self.cell(h, x)
        return h, None

    def decode(self, carry, _):
        h, cur = carry
        x = self.emb(cur) if self.emb is not None else cur
        h, out = self.cell(h, x)
        out = self.head(out)
        nxt = cur + out if self.predict_type == "offset" else out
        return (h, nxt), nxt


class OdomNet(nn.Module):
    """Forecast ``output_len`` odometry steps from a (B, T, 2) history."""

    rnn_hidden: int = 128
    output_len: int = 9
    predict_type: str = "direct"  # or 'offset'
    inp_emb_layers: Optional[Sequence[int]] = None
    out_layers: Sequence[int] = ()

    @nn.compact
    def __call__(self, inps: jax.Array) -> jax.Array:
        """inps: (B, T, 2) already-normalized odometry. Returns (B, L, 2)
        normalized forecasts."""
        b = inps.shape[0]
        core = _OdomCore(
            rnn_hidden=self.rnn_hidden,
            predict_type=self.predict_type,
            inp_emb_layers=self.inp_emb_layers,
            out_layers=self.out_layers,
            name="core",
        )
        scan_kw = dict(variable_broadcast="params", split_rngs={"params": False})
        h0 = jnp.zeros((b, self.rnn_hidden), inps.dtype)
        enc = nn.scan(
            lambda m, c, x: m.encode(c, x), in_axes=1, out_axes=1, **scan_kw
        )
        h, _ = enc(core, h0, inps[:, :-1])
        dec = nn.scan(
            lambda m, c, x: m.decode(c, x),
            in_axes=0,
            out_axes=1,
            length=self.output_len,
            **scan_kw,
        )
        (_, _), ys = dec(core, (h, inps[:, -1]), None)
        return ys  # (B, L, 2)


class OdomModel(TaskModel):
    def __init__(self, cfg: Dict[str, Any], data_card=None):
        m = cfg.get("model", {})
        self.predict_type = m.get("predict_type", "direct")
        if self.predict_type not in ("direct", "offset"):
            raise ValueError(f"predict_type not recognized: {self.predict_type}")
        self.normalize_input = bool(m.get("normalize_input"))
        self.use_normalized_loss = bool(m.get("use_normalized_loss"))
        loss_type = m.get("loss_fn", "mse")
        if loss_type not in LOSS_FNS:
            raise ValueError(f"loss_fn not recognized: {loss_type}")
        self.loss_fn = LOSS_FNS[loss_type]
        self.output_len = int(cfg.get("data", {}).get("output_len", 9))

        if self.normalize_input or True:
            # Stats are always materialized so normalized metrics exist even
            # when inputs are fed raw (parity: odom_model.py:97-101).
            if data_card is not None and "odom" in getattr(data_card, "stats", {}):
                self.mean = jnp.asarray(data_card.mean("odom"))
                self.std = jnp.asarray(data_card.std("odom"))
            else:
                self.mean = jnp.zeros(2)
                self.std = jnp.ones(2)

        self.module = OdomNet(
            rnn_hidden=int(m.get("rnn_hidden", 128)),
            output_len=self.output_len,
            predict_type=self.predict_type,
            inp_emb_layers=tuple(m["inp_emb_layers"]) if m.get("inp_emb_layers") else None,
            out_layers=tuple(m.get("out_layers", [])),
        )

    # -- pure functions ----------------------------------------------------
    def _normalize(self, x):
        return (x - self.mean) / self.std

    def _unnormalize(self, x):
        return x * self.std + self.mean

    def init(self, rng, batch):
        inp = jnp.asarray(batch["inputs"]["odometry"])
        return self.module.init(rng, inp)

    def forward(self, variables, inp_odom) -> Tuple[jax.Array, jax.Array]:
        """Returns (unnormalized, normalized) forecasts, (B, L, 2)."""
        x = self._normalize(inp_odom) if self.normalize_input else inp_odom
        y = self.module.apply(variables, x)
        if self.normalize_input:
            return self._unnormalize(y), y
        return y, self._normalize(y)

    def loss(self, params, state, batch, rng=None, train=True):
        inp = batch["inputs"]["odometry"]
        lab = batch["labels"]["odometry"]
        preds, normalized_preds = self.forward({"params": params, **state}, inp)
        if self.use_normalized_loss:
            per_elem = self.loss_fn(normalized_preds, self._normalize(lab))
        else:
            per_elem = self.loss_fn(preds, lab)
        per_sample = per_elem.reshape(per_elem.shape[0], -1).mean(axis=1)
        return per_sample.mean(), {"loss": per_sample}, state

    def predict(self, variables, batch):
        preds, _ = self.forward(variables, batch["inputs"]["odometry"])
        return {"odometry": preds}
