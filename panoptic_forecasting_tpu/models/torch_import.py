"""Torch / detectron2 checkpoint importers → Flax parameter trees.

Reference capability: the three pretrained-pickle loaders the reference
depends on —
* FCHarDNet-70 Cityscapes weights: ``torch.load(path)['model_state']`` with
  ``module.`` prefixes stripped (hardnet.py:390-404),
* detectron2 MaskRCNN head: ``pickle.load(path)['model']`` filtered to
  ``roi_heads.mask_head.*`` numpy arrays (mask_rcnn_conv_upsample_head.py:52-61),
* the reference's own ``*.pt`` model checkpoints (whole ``state_dict``,
  base_model.py:19-23).

Layout conversions (torch → flax):
* Conv2d weight (O, I, kh, kw) → HWIO (kh, kw, I, O); Linear (O, I) → (I, O).
* ConvTranspose2d weight (I, O, kh, kw) → flax ``ConvTranspose``
  (transpose_kernel=False) kernel (kh, kw, I, O) **with spatial flip** —
  torch's transposed conv is the gradient of a correlation, i.e. a
  convolution; flax's default applies the kernel unflipped
  (validated numerically in tests/test_torch_import.py).
* BatchNorm weight/bias → scale/bias params; running stats → batch_stats.
* nn.GRU gate rows are (r | z | n) stacked along dim 0
  (odom_model.py:42, fg_model.py:47-52). flax ``GRUCell`` keeps biases on
  the hidden Denses for r/z (so ``b_ir`` folds into ``hr.bias``) and on the
  input Dense for n (``b_in`` stays separate because of the ``r *`` gating).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def conv_kernel(w) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return _np(w).transpose(2, 3, 1, 0)


def deconv_kernel(w) -> np.ndarray:
    """ConvTranspose2d (I, O, kh, kw) -> flax (kh, kw, I, O), flipped."""
    return _np(w)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)


def linear_kernel(w) -> np.ndarray:
    """(O, I) -> (I, O)."""
    return _np(w).T


def _key(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def conv_params(sd: Mapping[str, Any], prefix: str,
                bias: bool = True) -> Dict[str, np.ndarray]:
    p = {"kernel": conv_kernel(sd[_key(prefix, "weight")])}
    if bias and _key(prefix, "bias") in sd:
        p["bias"] = _np(sd[_key(prefix, "bias")])
    return p


def linear_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    p = {"kernel": linear_kernel(sd[_key(prefix, "weight")])}
    if _key(prefix, "bias") in sd:
        p["bias"] = _np(sd[_key(prefix, "bias")])
    return p


def batchnorm_params(sd: Mapping[str, Any], prefix: str
                     ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Returns (params, batch_stats) for one BatchNorm."""
    return (
        {"scale": _np(sd[f"{prefix}.weight"]),
         "bias": _np(sd[f"{prefix}.bias"])},
        {"mean": _np(sd[f"{prefix}.running_mean"]),
         "var": _np(sd[f"{prefix}.running_var"])},
    )


def gru_cell_params(sd: Mapping[str, Any], prefix: str,
                    layer: int = 0) -> Dict[str, Any]:
    """torch nn.GRU layer -> flax nn.GRUCell param dict."""
    w_ih = _np(sd[_key(prefix, f"weight_ih_l{layer}")])
    w_hh = _np(sd[_key(prefix, f"weight_hh_l{layer}")])
    b_ih = _np(sd[_key(prefix, f"bias_ih_l{layer}")])
    b_hh = _np(sd[_key(prefix, f"bias_hh_l{layer}")])
    h = w_hh.shape[1]
    wir, wiz, win = w_ih[:h], w_ih[h:2 * h], w_ih[2 * h:]
    whr, whz, whn = w_hh[:h], w_hh[h:2 * h], w_hh[2 * h:]
    bir, biz, bin_ = b_ih[:h], b_ih[h:2 * h], b_ih[2 * h:]
    bhr, bhz, bhn = b_hh[:h], b_hh[h:2 * h], b_hh[2 * h:]
    # This flax GRUCell keeps biases on ir/iz/in and hn (not hr/hz), so the
    # torch hidden-side r/z biases fold into the input Denses.
    return {
        "ir": {"kernel": wir.T, "bias": bir + bhr},
        "iz": {"kernel": wiz.T, "bias": biz + bhz},
        "in": {"kernel": win.T, "bias": bin_},
        "hr": {"kernel": whr.T},
        "hz": {"kernel": whz.T},
        "hn": {"kernel": whn.T, "bias": bhn},
    }


def convlstm_cell_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference ConvLSTMCell (one conv, gates i,f,o,g — convlstm.py:39-68)
    -> kernels match our ConvLSTMCell gate order directly."""
    return {"conv": conv_params(sd, f"{prefix}.conv")}


def strip_prefix(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# HarDNet-70 (hardnet.py module tree -> models/hardnet.HarDNet names)
# ---------------------------------------------------------------------------

def _convlayer(sd, torch_prefix):
    params_bn, stats_bn = batchnorm_params(sd, f"{torch_prefix}.norm")
    return (
        {"conv": conv_params(sd, f"{torch_prefix}.conv", bias=False),
         "norm": params_bn},
        {"norm": stats_bn},
    )


def _hardblock(sd, torch_prefix):
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    i = 0
    while f"{torch_prefix}.layers.{i}.conv.weight" in sd:
        p, s = _convlayer(sd, f"{torch_prefix}.layers.{i}")
        params[f"layer_{i}"] = p
        stats[f"layer_{i}"] = s
        i += 1
    if i == 0:
        raise KeyError(f"no HarDBlock layers under {torch_prefix}")
    return params, stats


def hardnet_variables(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Full torch FCHarDNet state_dict -> flax {'params', 'batch_stats'}."""
    sd = state_dict
    if any(k.startswith("module.") for k in sd):
        sd = strip_prefix(sd, "module.")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    i = 0
    while True:
        if f"base.{i}.conv.weight" in sd:
            p, s = _convlayer(sd, f"base.{i}")
        elif f"base.{i}.layers.0.conv.weight" in sd:
            p, s = _hardblock(sd, f"base.{i}")
        elif any(k.startswith(f"base.{i + 1}.") for k in sd) or any(
            k.startswith(f"base.{i + 2}.") for k in sd
        ):
            i += 1  # parameterless AvgPool slot in the ModuleList
            continue
        else:
            break
        params[f"base_{i}"] = p
        stats[f"base_{i}"] = s
        i += 1

    j = 0
    while f"conv1x1_up.{j}.conv.weight" in sd:
        p, s = _convlayer(sd, f"conv1x1_up.{j}")
        params[f"conv1x1_up_{j}"] = p
        stats[f"conv1x1_up_{j}"] = s
        p, s = _hardblock(sd, f"denseBlocksUp.{j}")
        params[f"denseBlocksUp_{j}"] = p
        stats[f"denseBlocksUp_{j}"] = s
        j += 1
    if i == 0 or j == 0:
        raise KeyError(
            f"state dict is not an FCHarDNet checkpoint (found {i} base "
            f"stages, {j} decoder stages)"
        )

    params["finalConv"] = conv_params(sd, "finalConv")
    return {"params": params, "batch_stats": stats}


def load_hardnet_pickle(path: str) -> Dict[str, Any]:
    """hardnet70_cityscapes_model.pkl -> flax variables
    (hardnet.py:390-404: torch.load(...)['model_state'], module. prefixes)."""
    sd = _torch_load(path)
    if isinstance(sd, dict) and "model_state" in sd:
        sd = sd["model_state"]
    return hardnet_variables(sd)


# ---------------------------------------------------------------------------
# detectron2 MaskRCNN head
# ---------------------------------------------------------------------------

def maskrcnn_head_params(model_dict: Mapping[str, Any]) -> Dict[str, Any]:
    sd = strip_prefix(model_dict, "roi_heads.mask_head.")
    params: Dict[str, Any] = {}
    for k in range(1, 5):
        params[f"mask_fcn{k}"] = conv_params(sd, f"mask_fcn{k}")
    params["deconv"] = {
        "kernel": deconv_kernel(sd["deconv.weight"]),
        "bias": _np(sd["deconv.bias"]),
    }
    params["predictor"] = conv_params(sd, "predictor")
    return params


def load_maskrcnn_head_pickle(path: str) -> Dict[str, Any]:
    """mask_rcnn_pretrain.pkl -> flax params for MaskRCNNConvUpsampleHead
    (mask_rcnn_conv_upsample_head.py:52-61: pickle['model'] numpy arrays)."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    return maskrcnn_head_params(data["model"])


def _torch_load(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
