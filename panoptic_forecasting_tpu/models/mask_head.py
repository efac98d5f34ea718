"""MaskRCNN conv-upsample head (frozen detectron2 architecture), NHWC.

Reference capability: ``MaskRCNNConvUpsampleHead``
(models/fg/mask_rcnn_conv_upsample_head.py:14-68, itself the detectron2
architecture): 4×(3×3 conv 256 + ReLU) → 2×2 stride-2 deconv + ReLU → 1×1
predictor to 8 thing-class logits at 28×28. Kaiming(fan_out) conv init and
N(0, 0.001) predictor init match detectron2; pretrained detectron2
``roi_heads.mask_head.*`` weights load via the torch importer
(models/torch_import.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _kaiming_fan_out(key, shape, dtype=jnp.float32):
    # flax conv kernels are HWIO: fan_out = out_ch * kh * kw
    fan_out = shape[-1] * shape[0] * shape[1]
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class MaskRCNNConvUpsampleHead(nn.Module):
    num_classes: int = 8
    conv_dim: int = 256

    @nn.compact
    def __call__(self, x):
        """x (B, 14, 14, 256) -> logits (B, 28, 28, num_classes)."""
        for k in range(4):
            x = nn.Conv(
                self.conv_dim,
                (3, 3),
                padding=((1, 1), (1, 1)),
                use_bias=True,
                kernel_init=_kaiming_fan_out,
                name=f"mask_fcn{k + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.conv_dim,
            (2, 2),
            strides=(2, 2),
            use_bias=True,
            kernel_init=_kaiming_fan_out,
            name="deconv",
        )(x)
        x = nn.relu(x)
        return nn.Conv(
            self.num_classes,
            (1, 1),
            use_bias=True,
            kernel_init=nn.initializers.normal(0.001),
            name="predictor",
        )(x)
