"""Foreground forecaster: coupled GRU/LSTM trajectory + ConvLSTM feature
rollouts over MaskRCNN ROI features.

Reference capability: ``FGModel`` (models/fg/fg_model.py:21-746) with losses
(models/fg/losses.py). Architecture (fg_model.py:216-339):

* trajectory branch — RNN encoder over per-step [normalized bbox-state(8) ⊕
  depth(2) ⊕ validity mask(1) ⊕ 64-d compressed instance-feature embedding ⊕
  odometry(5)]; decoder rolls ``out_t`` steps autoregressive-residual
  (current += Δ) cross-fed with the mask branch;
* mask branch — ConvLSTM encoder/decoder over 14×14×256 ROI features ⊕ 16-d
  broadcast trajectory feature; decoder output feats feed the next traj
  step's instance embedding and vice versa (fg_model.py:294-324);
* re-anchor — encoder heads predict the state at the last *input* frame
  before decoding (handles occluded last observations, fg_model.py:273-283);
* mask head — frozen-architecture MaskRCNNConvUpsampleHead applied at the
  requested output index, class channel selected (fg_model.py:329-331).

Losses (losses.py): masked SmoothL1/MSE on unnormalized trajectories+depths
incl. the last input frame (supervise_last_inp), with center-L2 / FDE /
size-L1 / depth-L2 metrics; masked MSE distillation of predicted features
against the teacher MaskRCNN features of future frames. Total =
traj_coef·traj + mask_distill_coef·distill (fg_model.py:374-386).

TPU re-design: the entire coupled decode is ONE ``nn.scan`` carrying
(traj RNN state, ConvLSTM states, current traj, current feats) — no Python
per-step loops; variable instance counts are handled by padding to static
bucket sizes with validity masks (the list collate of
fg_scene_dataset.py:514-528 becomes bucketed dense batches; fusion in
eval/fusion.py masks padded slots).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import LOSS_FNS, TaskModel
from .convlstm import ConvLSTMStack
from .mask_head import MaskRCNNConvUpsampleHead


def expand_traj_mask(mask, vel_mask=None, result_size: int = 4,
                     no_vel: bool = False):
    """(B, T) validity -> (B, T, result_size[*2]) loc+velocity mask.

    Velocity entries are valid only when both adjacent frames are
    (model_utils.py:11-27); velocity at t=0 is always invalid.
    """
    mask = mask.astype(jnp.float32)
    loc = jnp.repeat(mask[..., None], result_size, axis=-1)
    if no_vel:
        return loc
    if vel_mask is None:
        vel_mask = jnp.concatenate(
            [jnp.zeros_like(mask[:, :1]), mask[:, 1:] * mask[:, :-1]], axis=1
        )
    vel = jnp.repeat(vel_mask.astype(jnp.float32)[..., None], result_size, axis=-1)
    return jnp.concatenate([loc, vel], axis=-1)


class _TrajOutHead(nn.Module):
    """num_layers−1 × (Dense+ReLU) then Dense(out) (fg_model.py:118-132)."""

    out_size: int
    hidden: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f"hidden_{i}")(x))
        return nn.Dense(self.out_size, name="out")(x)


class FGCore(nn.Module):
    """All FG submodules + the full encode/re-anchor/decode rollout."""

    rnn_hidden: int = 128
    rnn_type: str = "gru"
    out_size: int = 10  # 8 traj + 2 depth with defaults
    instance_feat_channels: int = 8
    instance_feat_hidden: int = 64
    traj_feat_channels: int = 16
    num_convlstm_layers: int = 2
    num_traj_out_layers: int = 2
    use_traj_inst_feats: bool = True
    use_mask_traj_feats: bool = True
    # ROI feature geometry: 256x14x14 MaskRCNN features in production
    # (fg_model.py shapes); configurable so tiny CI/dryrun shapes compile
    # and run fast on hosts with few cores.
    mask_feat_channels: int = 256
    mask_feat_hw: int = 14
    mask_head_conv_dim: int = 256
    # compute dtype for the ConvLSTM branch (the FLOP-heavy part); the
    # trajectory GRUs and heads stay float32 (tiny, precision-sensitive).
    dtype: Any = jnp.float32

    def setup(self):
        if self.rnn_type == "gru":
            cell = nn.GRUCell
        elif self.rnn_type == "lstm":
            cell = nn.OptimizedLSTMCell
        else:
            raise ValueError(f"rnn_type not recognized: {self.rnn_type}")
        self.traj_encoder = cell(features=self.rnn_hidden)
        self.traj_decoder = cell(features=self.rnn_hidden)
        self.traj_encoder_out = _TrajOutHead(
            self.out_size, self.rnn_hidden, self.num_traj_out_layers
        )
        self.traj_decoder_out = _TrajOutHead(
            self.out_size, self.rnn_hidden, self.num_traj_out_layers
        )
        self.traj_feat_out = nn.Dense(self.traj_feat_channels)
        self.instance_compressor = nn.Conv(
            self.instance_feat_channels, (1, 1), use_bias=True
        )
        self.instance_feat_model = nn.Dense(self.instance_feat_hidden)
        c = self.mask_feat_channels
        self.mask_encoder = ConvLSTMStack(
            c, self.num_convlstm_layers, dtype=self.dtype
        )
        self.mask_decoder = ConvLSTMStack(
            c, self.num_convlstm_layers, dtype=self.dtype
        )
        self.mask_encoder_out = nn.Conv(c, (1, 1), use_bias=True)
        self.mask_decoder_out = nn.Conv(c, (1, 1), use_bias=True)
        self.mask_head = MaskRCNNConvUpsampleHead(
            conv_dim=self.mask_head_conv_dim
        )

    def compress_inst_feats(self, feats, mask):
        """(..., 14, 14, 256) -> (..., instance_feat_hidden), masked.

        Mirrors _compute_traj_inst_feats (fg_model.py:206-214). Flattening is
        (h, w, c) order here vs torch's (c, h, w) — the torch weight importer
        permutes the Dense kernel accordingly.
        """
        x = nn.relu(self.instance_compressor(feats))
        x = x.reshape(x.shape[:-3] + (-1,))
        x = self.instance_feat_model(x)
        return x * mask

    def _rnn_init(self, b, dtype):
        z = jnp.zeros((b, self.rnn_hidden), dtype)
        return z if self.rnn_type == "gru" else (z, z)

    def encode_traj_step(self, state, x):
        return self.traj_encoder(state, x)

    def encode_mask_step(self, states, x):
        return self.mask_encoder(states, x)

    def decode_step(self, carry, odom_t):
        traj_state, mask_states, current_traj, current_feats = carry
        inp = [current_traj]
        if self.use_traj_inst_feats:
            ones = jnp.ones(current_traj.shape[:1] + (1,), current_traj.dtype)
            inp.append(self.compress_inst_feats(current_feats, ones))
        if odom_t is not None:
            inp.append(odom_t)
        traj_state, dec_out = self.traj_decoder(
            traj_state, jnp.concatenate(inp, axis=-1)
        )
        current_traj = current_traj + self.traj_decoder_out(dec_out)
        if self.use_mask_traj_feats:
            tf = self.traj_feat_out(dec_out)
            hw = self.mask_feat_hw
            tf = jnp.broadcast_to(
                tf[:, None, None, :], tf.shape[:1] + (hw, hw, tf.shape[-1])
            )
            mask_inp = jnp.concatenate([tf, current_feats], axis=-1)
        else:
            mask_inp = current_feats
        mask_states, h_last = self.mask_decoder(mask_states, mask_inp)
        current_feats = self.mask_decoder_out(h_last)
        return (
            (traj_state, mask_states, current_traj, current_feats),
            (current_traj, current_feats),
        )

    def __call__(self, enc_traj_inp, feats, odom_out, out_t: int):
        """enc_traj_inp (B, T_in, D) assembled encoder input; feats
        (B, T_in, 14, 14, 256) ROI features; odom_out (B, out_t, 5) or None.
        Returns (traj_preds (B, out_t+1, out_size),
                 feat_preds (B, out_t+1, 14, 14, 256))."""
        b = enc_traj_inp.shape[0]
        scan_kw = dict(variable_broadcast="params", split_rngs={"params": False})

        enc = nn.scan(
            lambda m, c, x: m.encode_traj_step(c, x), in_axes=1, out_axes=1,
            **scan_kw,
        )
        traj_state, enc_outs = enc(
            self, self._rnn_init(b, enc_traj_inp.dtype), enc_traj_inp
        )

        if self.use_mask_traj_feats:
            tf = self.traj_feat_out(enc_outs)  # (B, T, 16)
            hw = self.mask_feat_hw
            tf = jnp.broadcast_to(
                tf[:, :, None, None, :], tf.shape[:2] + (hw, hw, tf.shape[-1])
            )
            enc_mask_inp = jnp.concatenate([tf, feats], axis=-1)
        else:
            enc_mask_inp = feats
        m0 = ConvLSTMStack.init_state(
            self.num_convlstm_layers, b, self.mask_feat_hw,
            self.mask_feat_hw, self.mask_feat_channels, feats.dtype,
        )
        menc = nn.scan(
            lambda m, c, x: m.encode_mask_step(c, x), in_axes=1, out_axes=1,
            **scan_kw,
        )
        mask_states, mask_outs = menc(self, m0, enc_mask_inp)

        # Re-anchor at the most recent input frame (fg_model.py:279-283).
        current_traj = self.traj_encoder_out(enc_outs[:, -1])
        current_feats = self.mask_encoder_out(mask_outs[:, -1])

        dec = nn.scan(
            lambda m, c, x: m.decode_step(c, x),
            in_axes=1 if odom_out is not None else None,
            out_axes=1,
            length=out_t,
            **scan_kw,
        )
        carry = (traj_state, mask_states, current_traj, current_feats)
        _, (traj_steps, feat_steps) = dec(self, carry, odom_out)
        traj_preds = jnp.concatenate([current_traj[:, None], traj_steps], axis=1)
        feat_preds = jnp.concatenate([current_feats[:, None], feat_steps], axis=1)
        return traj_preds, feat_preds

    def apply_mask_head(self, feats):
        return self.mask_head(feats)


class FGModel(TaskModel):
    def __init__(self, cfg: Dict[str, Any], data_card=None):
        m = cfg.get("model", {})
        self.traj_coef = float(m.get("traj_coef", 1.0))
        self.mask_distill_coef = float(m.get("mask_distill_coef", 1.0))
        self.use_odometry = bool(m.get("use_odometry"))
        self.only_input_odometry = bool(m.get("only_input_odometry"))
        self.use_bbox_ulbr = bool(cfg.get("use_bbox_ulbr"))
        self.use_depth_inp = bool(m.get("use_depth_inp"))
        self.use_depth_sorting = bool(m.get("use_depth_sorting"))
        self.only_loc_feats = bool(m.get("only_loc_feats"))
        self.supervise_last_inp = True
        mh = m.get("mask_head", {}) or {}
        self.maskrcnn_pretrain_path = mh.get("maskrcnn_pretrain_path")
        if self.maskrcnn_pretrain_path:
            import os

            if not os.path.exists(self.maskrcnn_pretrain_path):
                print(
                    "WARNING: mask head pretrain "
                    f"{self.maskrcnn_pretrain_path} not found; fresh init"
                )
                self.maskrcnn_pretrain_path = None
        loss_type = m.get("loss_type", "smoothl1")
        key = {"smoothl1": "smooth_l1", "mse": "mse"}.get(loss_type)
        if key is None:
            raise ValueError(f"loss_type not recognized: {loss_type}")
        self.loss_fn = LOSS_FNS[key]

        base = 4 if self.only_loc_feats else 8
        self.traj_dim = base
        self.depth_dim = (1 if self.only_loc_feats else 2) if self.use_depth_inp else 0
        out_size = base + self.depth_dim

        def stat(name, default_dim):
            if data_card is not None and name in getattr(data_card, "stats", {}):
                return (
                    jnp.asarray(data_card.mean(name)),
                    jnp.asarray(data_card.std(name)),
                )
            return jnp.zeros(default_dim), jnp.ones(default_dim)

        tm, ts = stat("traj", 8)
        self.traj_mean, self.traj_std = tm[:base], ts[:base]
        if self.use_depth_inp:
            dm, ds = stat("depth", 2)
            self.depth_mean = dm[: self.depth_dim]
            self.depth_std = ds[: self.depth_dim]
        if self.use_odometry:
            self.odom_mean, self.odom_std = stat("odom", 5)

        self.module = FGCore(
            rnn_hidden=int(m.get("rnn_hidden", 128)),
            rnn_type=m.get("rnn_type", "gru"),
            out_size=out_size,
            instance_feat_channels=int(m.get("instance_feat_channels", 8)),
            instance_feat_hidden=int(m.get("instance_feat_hidden", 64)),
            traj_feat_channels=int(m.get("traj_feat_channels", 16)),
            num_convlstm_layers=int(m.get("num_convlstm_layers", 1)),
            num_traj_out_layers=int(m.get("num_traj_out_layers", 1)),
            use_traj_inst_feats=not m.get("no_traj_inst_feats", False),
            use_mask_traj_feats=not m.get("no_mask_traj_feats", False),
            mask_feat_channels=int(m.get("mask_feat_channels", 256)),
            mask_feat_hw=int(m.get("mask_feat_hw", 14)),
            mask_head_conv_dim=int(
                mh.get("conv_dim", m.get("mask_feat_channels", 256))
            ),
            dtype=(
                jnp.bfloat16
                if m.get("compute_dtype") in ("bfloat16", "bf16")
                else jnp.float32
            ),
        )
        self.mask_feat_channels = self.module.mask_feat_channels

    # -- normalization -----------------------------------------------------
    def _full_stats(self):
        if self.use_depth_inp:
            mean = jnp.concatenate([self.traj_mean, self.depth_mean])
            std = jnp.concatenate([self.traj_std, self.depth_std])
        else:
            mean, std = self.traj_mean, self.traj_std
        return mean, jnp.where(std == 0, 1.0, std)

    def _norm_traj(self, trajs, depths):
        x = (
            jnp.concatenate([trajs, depths], axis=-1)
            if self.use_depth_inp
            else trajs
        )
        mean, std = self._full_stats()
        return (x - mean) / std

    def _unnorm_traj(self, x):
        mean, std = self._full_stats()
        return x * std + mean

    # -- forward -----------------------------------------------------------
    def _run(self, module: FGCore, inputs, out_t: int) -> Dict[str, jnp.ndarray]:
        trajs = jnp.asarray(inputs["trajectories"], jnp.float32)[..., : self.traj_dim]
        feats = jnp.asarray(inputs["feats"], jnp.float32)
        if feats.shape[-1] != self.mask_feat_channels:  # NCHW -> NHWC
            feats = jnp.moveaxis(feats, -3, -1)
        inp_t = trajs.shape[1]
        bbox_masks = jnp.asarray(inputs["bbox_masks"], jnp.float32)[:, :inp_t]
        vel_masks = jnp.asarray(inputs["bbox_vel_masks"], jnp.float32)[:, :inp_t]
        depths = (
            jnp.asarray(inputs["depths"], jnp.float32)[..., : self.depth_dim]
            if self.use_depth_inp
            else None
        )
        normalized = self._norm_traj(trajs, depths)
        emask = expand_traj_mask(
            bbox_masks, vel_mask=vel_masks, no_vel=self.only_loc_feats
        )
        if self.use_depth_inp:
            dmask = jnp.asarray(inputs["depth_masks"], jnp.float32)
            dmask = dmask.reshape(dmask.shape[0], dmask.shape[1])
            emask = jnp.concatenate(
                [
                    emask,
                    expand_traj_mask(dmask, result_size=1, no_vel=self.only_loc_feats),
                ],
                axis=-1,
            )
        normalized = normalized * emask

        enc = [normalized]
        if module.use_traj_inst_feats:
            enc.append(module.compress_inst_feats(feats, bbox_masks[..., None]))
        enc.append(bbox_masks[..., None])
        odom = None
        if self.use_odometry:
            odom = jnp.asarray(inputs["odometry"], jnp.float32)
            odom = (odom - self.odom_mean) / jnp.where(
                self.odom_std == 0, 1.0, self.odom_std
            )
            enc.append(odom[:, :inp_t])
        enc_traj_inp = jnp.concatenate(enc, axis=-1)

        odom_out = None
        if self.use_odometry and not self.only_input_odometry:
            odom_out = odom[:, inp_t : inp_t + out_t]
        traj_preds, feat_preds = module(enc_traj_inp, feats, odom_out, out_t)

        output_inds = jnp.asarray(inputs["output_inds"], jnp.int32).reshape(-1)
        b = traj_preds.shape[0]
        out_feats = feat_preds[:, -out_t:][jnp.arange(b), output_inds]
        mask_logits = module.apply_mask_head(out_feats)
        classes = jnp.asarray(inputs["classes"], jnp.int32).reshape(-1)
        masks = jnp.take_along_axis(
            mask_logits, jnp.clip(classes, 0, 7)[:, None, None, None], axis=-1
        )[..., 0]
        return {
            "normalized_trajectory": traj_preds,
            "unnormalized_trajectory": self._unnorm_traj(traj_preds),
            "mask_feats": feat_preds,
            "output_feats": out_feats,
            "masks": masks,
        }

    def forward(self, variables, inputs, out_t: int) -> Dict[str, jnp.ndarray]:
        return nn.apply(
            lambda m: self._run(m, inputs, int(out_t)), self.module
        )(variables)

    # -- TaskModel protocol -------------------------------------------------
    def init(self, rng, batch):
        inputs = {**batch["inputs"], "output_inds": batch["labels"]["output_inds"]}
        lab_tr = np.asarray(batch["labels"]["trajectories"])
        if lab_tr.ndim == 4:
            # Scene-shaped batch (S, N, T, ...): flatten scene/instance dims
            # to the instance axis the forward expects (see eval/fusion.py
            # _flatten_scenes; reference list-collate fg_model.py:404-414).
            inputs = {
                k: v for k, v in inputs.items()
                if k not in ("background", "valid")
            }
            inputs = {
                k: np.asarray(v).reshape((-1,) + np.asarray(v).shape[2:])
                for k, v in inputs.items()
            }
            out_t = int(lab_tr.shape[2])
        else:
            out_t = int(lab_tr.shape[1])
        inputs = jax.tree_util.tree_map(jnp.asarray, dict(inputs))
        variables = nn.init(
            lambda m: self._run(m, inputs, out_t), self.module
        )(rng)
        if self.maskrcnn_pretrain_path:
            # detectron2 roi_heads.mask_head.* weights
            # (mask_rcnn_conv_upsample_head.py:52-61)
            import flax

            from .torch_import import load_maskrcnn_head_pickle

            params = flax.core.unfreeze(variables["params"])
            params["mask_head"] = jax.tree_util.tree_map(
                jnp.asarray,
                load_maskrcnn_head_pickle(self.maskrcnn_pretrain_path),
            )
            variables = {**variables, "params": params}
        return variables

    def loss(self, params, state, batch, rng=None, train=True):
        variables = {"params": params, **state}
        inputs = batch["inputs"]
        labels = batch["labels"]
        out_t = int(np.asarray(labels["trajectories"]).shape[1]) if isinstance(
            labels["trajectories"], np.ndarray
        ) else int(labels["trajectories"].shape[1])
        fwd_inputs = {**inputs, "output_inds": labels["output_inds"]}
        preds = self.forward(variables, fwd_inputs, out_t)

        traj_loss, metrics = self._traj_loss(inputs, labels, preds, out_t)
        distill, dmetrics = self._mask_loss(inputs, labels, preds, out_t)
        metrics.update(dmetrics)
        per_sample = self.traj_coef * traj_loss + self.mask_distill_coef * distill
        metrics["loss"] = per_sample
        return per_sample.mean(), metrics, state

    # -- losses (losses.py parity) -----------------------------------------
    def _traj_loss(self, inputs, labels, preds, out_t):
        bbox_masks = jnp.asarray(inputs["bbox_masks"], jnp.float32)
        vel_masks = jnp.asarray(inputs["bbox_vel_masks"], jnp.float32)
        inp_tr = jnp.asarray(inputs["trajectories"], jnp.float32)[..., : self.traj_dim]
        lab_tr = jnp.asarray(labels["trajectories"], jnp.float32)[..., : self.traj_dim]
        upreds = preds["unnormalized_trajectory"]

        tmask = expand_traj_mask(bbox_masks, vel_mask=vel_masks)[:, -(out_t + 1) :]
        if self.only_loc_feats:
            tmask = tmask[..., :4]
        gt = jnp.concatenate([inp_tr[:, -1:], lab_tr], axis=1)
        gt_d = gt_dm = None
        if self.use_depth_inp:
            inp_d = jnp.asarray(inputs["depths"], jnp.float32)[..., : self.depth_dim]
            lab_d = jnp.asarray(labels["depths"], jnp.float32)[..., : self.depth_dim]
            inp_dm = jnp.asarray(inputs["depth_masks"], jnp.float32)
            lab_dm = jnp.asarray(labels["depth_masks"], jnp.float32)
            gt_d = jnp.concatenate([inp_d[:, -1:], lab_d], axis=1)
            dm = jnp.concatenate([inp_dm, lab_dm], axis=1)
            dm = dm.reshape(dm.shape[0], dm.shape[1], -1)[..., 0]
            gt_dm = expand_traj_mask(dm, result_size=1)[
                :, -(out_t + 1) :, : self.depth_dim
            ]
            gt = jnp.concatenate([gt, gt_d], axis=-1)
            tmask = jnp.concatenate([tmask, gt_dm], axis=-1)

        per_elem = self.loss_fn(upreds, gt) * tmask
        flat = per_elem.reshape(per_elem.shape[0], -1)
        msum = tmask.reshape(tmask.shape[0], -1).sum(-1)
        traj_loss = flat.sum(-1) / (msum + 1e-8)

        # metrics (losses.py:119-147)
        bm = bbox_masks[:, -(out_t + 1) :]
        pred_cwh = upreds[..., :4]
        gt_cwh = gt[..., :4]
        if self.use_bbox_ulbr:
            from ..geometry.boxes import bbox_ulbr_to_cwh

            pred_cwh = bbox_ulbr_to_cwh(pred_cwh)
            gt_cwh = bbox_ulbr_to_cwh(gt_cwh)
        center_l2 = jnp.linalg.norm(pred_cwh[..., :2] - gt_cwh[..., :2], axis=-1)
        center_l2 = (center_l2 * bm).sum(-1) / (bm.sum(-1) + 1e-8)
        fde = jnp.linalg.norm(pred_cwh[:, -1, :2] - gt_cwh[:, -1, :2], axis=-1)
        fde = fde * bm[:, -1]
        size_l1 = jnp.abs(pred_cwh[..., 2:4] - gt_cwh[..., 2:4])
        size_l1 = (size_l1 * bm[..., None]).reshape(size_l1.shape[0], -1).sum(
            -1
        ) / (bm.sum(-1) + 1e-8)
        out = {
            "traj_2d_loss": traj_loss,
            "center_pixel_l2": center_l2,
            "center_pixel_fde": fde,
            "size_pixel_l1": size_l1,
        }
        if self.use_depth_inp:
            dpred = upreds[..., self.traj_dim : self.traj_dim + 1]
            depth_l2 = jnp.linalg.norm(dpred - gt_d[..., :1], axis=-1)
            dmm = gt_dm[..., 0]
            div = jnp.where(dmm.sum(-1) == 0, 1.0, dmm.sum(-1))
            out["depth_l2"] = (depth_l2 * dmm).sum(-1) / div
        return traj_loss, out

    def _mask_loss(self, inputs, labels, preds, out_t):
        feat_masks = jnp.asarray(inputs["feat_masks"], jnp.float32)[
            :, -(out_t + 1) :
        ]
        inp_f = jnp.asarray(inputs["feats"], jnp.float32)
        lab_f = jnp.asarray(labels["feats"], jnp.float32)
        if inp_f.shape[-1] != self.mask_feat_channels:
            inp_f = jnp.moveaxis(inp_f, -3, -1)
            lab_f = jnp.moveaxis(lab_f, -3, -1)
        target = jnp.concatenate([inp_f[:, -1:], lab_f], axis=1)
        diff = (preds["mask_feats"] - target) ** 2
        b, t = diff.shape[:2]
        per_t = diff.reshape(b, t, -1).sum(-1) * feat_masks
        denom = feat_masks.sum(-1) * float(np.prod(diff.shape[2:])) + 1e-8
        distill = per_t.sum(-1) / denom
        return distill, {"mask_distill_loss": distill}

    def predict(self, variables, batch):
        """Raw forward on a dense batch; panoptic/semantic/instance fusion
        lives in eval/fusion.py."""
        inputs = {**batch["inputs"], "output_inds": batch["labels"]["output_inds"]}
        out_t = int(np.asarray(batch["labels"]["trajectories"]).shape[1])
        return self.forward(variables, inputs, out_t)
