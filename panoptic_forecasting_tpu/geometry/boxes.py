"""Bounding-box format conversions (batched, backend-agnostic).

Reference capability: ``data_utils.convert_bbox_ulbr_cwh`` /
``convert_bbox_cwh_ulbr`` (data_utils.py:19-49). Works on any array whose
last dimension is 4; numpy and jax arrays both pass through unchanged in type.
"""

from __future__ import annotations


def bbox_ulbr_to_cwh(boxes):
    """(x0, y0, x1, y1) -> (cx, cy, w, h) along the last axis."""
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    if hasattr(boxes, "at"):  # jax
        import jax.numpy as xp
    else:
        import numpy as xp
    return xp.stack([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def bbox_cwh_to_ulbr(boxes):
    """(cx, cy, w, h) -> (x0, y0, x1, y1) along the last axis."""
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    if hasattr(boxes, "at"):
        import jax.numpy as xp
    else:
        import numpy as xp
    return xp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
