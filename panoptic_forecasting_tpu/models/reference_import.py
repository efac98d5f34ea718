"""Import the reference's own trained ``*.pt`` checkpoints.

Reference capability: ``BaseModel.save/load`` stores whole torch
``state_dict``s (base_model.py:19-23); the released pretrained models are
``pretrained_models/{odom,bg,fg}/*.pt``. These functions map those state
dicts onto this framework's Flax trees so a user can drop the published
weights straight into the TPU pipeline:

* odom  — GRU ``rnn.*``, head Sequential ``out.{k}.*`` (Linear at even k),
  optional ``inp_emb.{k}.*``, frozen stats ``odom_mean/odom_std``
  (odom_model.py:17-52).
* bg    — ``model.`` prefixed FCHarDNet (bg_model.py:45), frozen
  ``depth_mean/depth_std`` (bg_model.py:40-41).
* fg    — coupled forecaster modules (fg_model.py:101-152): GRUs
  ``traj_{en,de}coder``, heads ``traj_{en,de}coder_out`` (Linear or
  Sequential), ``traj_feat_out``, ``instance_compressor`` (1×1 Conv2d),
  ``instance_feat_model`` (Linear over a **c-major** flattened 256×14×14 —
  permuted here to this package's h,w,c-major flattening),
  ConvLSTM ``mask_{en,de}coder.cell_list.{i}.conv``,
  ``mask_{en,de}coder_out`` 1×1 convs, ``mask_head.*``, and the six frozen
  normalization stats.

Each importer returns ``(params-or-variables, stats)`` where ``stats`` maps
stat names to (mean, std) numpy arrays for injection into the DataCard
(the stats live in the checkpoint as frozen nn.Parameters, so datasets
need not recompute them).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from .torch_import import (
    _np,
    conv_params,
    convlstm_cell_params,
    gru_cell_params,
    hardnet_variables,
    linear_params,
    maskrcnn_head_params,
    strip_prefix,
)


def _sequential_mlp(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """torch Sequential of Linears (ReLU between) -> MLP dense_{i} params."""
    ks = sorted(
        int(k[len(prefix) + 1:].split(".")[0])
        for k in sd
        if k.startswith(prefix + ".") and k.endswith(".weight")
    )
    return {
        f"dense_{i}": linear_params(sd, f"{prefix}.{k}")
        for i, k in enumerate(ks)
    }


def _stat(sd: Mapping[str, Any], name: str) -> Optional[np.ndarray]:
    if name in sd:
        return _np(sd[name]).reshape(-1)
    return None


def odom_from_reference(sd: Mapping[str, Any]
                        ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """-> (OdomModel params['params'], {'odom': (mean, std)})."""
    core: Dict[str, Any] = {
        "cell": gru_cell_params(sd, "rnn"),
        "head": _sequential_mlp(sd, "out"),
    }
    if any(k.startswith("inp_emb.") for k in sd):
        core["emb"] = _sequential_mlp(sd, "inp_emb")
    stats = {}
    m, s = _stat(sd, "odom_mean"), _stat(sd, "odom_std")
    if m is not None:
        stats["odom"] = (m, s)
    return {"core": core}, stats


def bg_from_reference(sd: Mapping[str, Any]
                      ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """-> (BGModel variables {'params','batch_stats'}, {'depth': (m, s)})."""
    variables = hardnet_variables(strip_prefix(sd, "model."))
    stats = {}
    m, s = _stat(sd, "depth_mean"), _stat(sd, "depth_std")
    if m is not None:
        stats["depth"] = (m, s)
    return variables, stats


def _traj_out_head(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Linear (1-layer) or Sequential [Linear, ReLU]* -> _TrajOutHead."""
    if f"{prefix}.weight" in sd:
        return {"out": linear_params(sd, prefix)}
    dense = _sequential_mlp(sd, prefix)
    n = len(dense)
    out: Dict[str, Any] = {"out": dense[f"dense_{n - 1}"]}
    for i in range(n - 1):
        out[f"hidden_{i}"] = dense[f"dense_{i}"]
    return out


def _permute_cmajor_dense(p: Dict[str, np.ndarray], c: int, h: int,
                          w: int) -> Dict[str, np.ndarray]:
    """Reorder a Dense kernel whose torch input was flattened (c, h, w) to
    this package's (h, w, c) flattening (models/fg.py compress_inst_feats)."""
    k = p["kernel"]  # (c*h*w, O) after linear_params transpose
    k = k.reshape(c, h, w, -1).transpose(1, 2, 0, 3).reshape(h * w * c, -1)
    out = dict(p)
    out["kernel"] = k
    return out


def fg_from_reference(sd: Mapping[str, Any],
                      instance_feat_channels: int = 8,
                      feat_hw: int = 14,
                      ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """-> (FGCore params['params'], stats {'traj','depth','odom'})."""
    if "traj_encoder.weight_ih_l0" not in sd:
        raise KeyError("not an FG checkpoint (no traj_encoder GRU)")
    params: Dict[str, Any] = {
        "traj_encoder": gru_cell_params(sd, "traj_encoder"),
        "traj_decoder": gru_cell_params(sd, "traj_decoder"),
        "traj_encoder_out": _traj_out_head(sd, "traj_encoder_out"),
        "traj_decoder_out": _traj_out_head(sd, "traj_decoder_out"),
        "traj_feat_out": linear_params(sd, "traj_feat_out"),
        "instance_compressor": conv_params(sd, "instance_compressor"),
        "instance_feat_model": _permute_cmajor_dense(
            linear_params(sd, "instance_feat_model"),
            instance_feat_channels, feat_hw, feat_hw,
        ),
        "mask_encoder_out": conv_params(sd, "mask_encoder_out"),
        "mask_decoder_out": conv_params(sd, "mask_decoder_out"),
    }
    for side in ("mask_encoder", "mask_decoder"):
        cells: Dict[str, Any] = {}
        i = 0
        while f"{side}.cell_list.{i}.conv.weight" in sd:
            cells[f"cell_{i}"] = convlstm_cell_params(
                sd, f"{side}.cell_list.{i}"
            )
            i += 1
        if i == 0:
            raise KeyError(f"no ConvLSTM cells under {side}")
        params[side] = cells
    if any(k.startswith("mask_head.") for k in sd):
        params["mask_head"] = maskrcnn_head_params(
            {f"roi_heads.mask_head.{k[len('mask_head.'):]}": v
             for k, v in sd.items() if k.startswith("mask_head.")}
        )
    stats = {}
    for name in ("traj", "depth", "odom"):
        m, s = _stat(sd, f"{name}_mean"), _stat(sd, f"{name}_std")
        if m is not None:
            stats[name] = (m, s)
    return params, stats


def load_reference_checkpoint(task: str, path: str, **kw):
    """torch.load a reference ``*.pt`` and convert for ``task``."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if task == "odom":
        return odom_from_reference(sd)
    if task == "bg":
        return bg_from_reference(sd)
    if task == "fg":
        return fg_from_reference(sd, **kw)
    raise ValueError(f"no reference importer for task {task!r}")
