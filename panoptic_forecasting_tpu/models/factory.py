"""Model registry wiring (reference: models/__init__.py:16-41)."""

from __future__ import annotations

from ..core.registry import register_model
from .odom import OdomModel
from .pc_transform import PCTransformModel


@register_model("odom")
def build_odom_model(cfg, data_card=None):
    return OdomModel(cfg, data_card)


@register_model("pc_transform")
def build_pc_transform_model(cfg, data_card=None):
    return PCTransformModel(cfg, data_card)


@register_model("bg")
def build_bg_model(cfg, data_card=None):
    from .bg import BGModel

    return BGModel(cfg, data_card)


@register_model("fg")
def build_fg_model(cfg, data_card=None):
    from .fg import FGModel

    return FGModel(cfg, data_card)
