"""Mask pasting: bilinear resample of a small mask into image space.

Reference capability: ``model_utils.paste_mask`` (model_utils.py:30-57), a
``F.grid_sample(align_corners=False)`` over the full image grid per instance
(detectron2-style paste_masks_in_image). TPU re-design: the sample is a pure
dense gather-interpolate with static shapes — exactly what XLA fuses well —
and fusion composites instances through a ``lax.scan`` that keeps only one
(label, depth) canvas live instead of materializing an (N, H, W) stack.

Bilinear semantics replicated exactly (align_corners=False, zeros padding):
  src = ((g + 1) * size - 1) / 2  for normalized coord g ∈ [−1, 1],
with out-of-range taps contributing 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _grid_sample_bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Sample img (H, W) at float pixel coords (x, y) with zeros padding.

    x, y are unnormalized source-pixel coordinates (already mapped from the
    [-1, 1] grid via the align_corners=False rule).
    """
    h, w = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        return jnp.where(inb, img[yi_c, xi_c], 0.0)

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


@functools.partial(jax.jit, static_argnames=("img_h", "img_w"))
def paste_mask_bilinear(mask: jnp.ndarray, bbox_ulbr: jnp.ndarray,
                        *, img_h: int, img_w: int) -> jnp.ndarray:
    """Paste one (Hm, Wm) mask into an (img_h, img_w) canvas at bbox.

    bbox_ulbr = (x0, y0, x1, y1) in image pixels. Matches
    ``F.grid_sample(..., align_corners=False)`` over the normalized-bbox grid
    (model_utils.py:41-50). Degenerate boxes (zero extent) produce zeros.

    TPU formulation: bilinear resampling on an axis-aligned grid is
    **separable** — ``out = Wy @ mask @ Wx^T`` where ``Wy[y, a] =
    max(0, 1 − |sy[y] − a|)`` is the hat-function weight of source row
    ``a`` at target row ``y`` (likewise Wx). Out-of-range taps contribute 0
    automatically (the hat is 0 for every in-range a). Two small matmuls on
    the MXU replace a 2M-point 4-tap gather, which XLA:TPU lowers
    pathologically (~70 ms/instance gathered vs <1 ms here).
    """
    mh, mw = mask.shape
    x0, y0, x1, y1 = bbox_ulbr[0], bbox_ulbr[1], bbox_ulbr[2], bbox_ulbr[3]
    bw = x1 - x0
    bh = y1 - y0
    safe_bw = jnp.where(jnp.abs(bw) < 1e-6, 1.0, bw)
    safe_bh = jnp.where(jnp.abs(bh) < 1e-6, 1.0, bh)
    gx = ((jnp.arange(img_w, dtype=jnp.float32) + 0.5) - x0) / safe_bw * 2 - 1
    gy = ((jnp.arange(img_h, dtype=jnp.float32) + 0.5) - y0) / safe_bh * 2 - 1
    # align_corners=False: normalized -> source pixel coords.
    sx = ((gx + 1) * mw - 1) / 2
    sy = ((gy + 1) * mh - 1) / 2
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(sy[:, None] - jnp.arange(mh, dtype=jnp.float32))
    )  # (img_h, mh)
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(sx[:, None] - jnp.arange(mw, dtype=jnp.float32))
    )  # (img_w, mw)
    out = wy @ mask.astype(jnp.float32) @ wx.T
    degenerate = (jnp.abs(bw) < 1e-6) | (jnp.abs(bh) < 1e-6)
    return jnp.where(degenerate, 0.0, out)


@functools.partial(
    jax.jit, static_argnames=("img_h", "img_w", "threshold", "use_depth")
)
def paste_and_composite(masks, bboxes_ulbr, depths, ids, valid,
                        bg_labels, bg_depth, *, img_h: int, img_w: int,
                        threshold: float = 0.5, use_depth: bool = True):
    """Depth-ordered panoptic compositing of N instances over a background.

    Reference capability: the per-instance Python paste/composite loop in
    ``FGModel.predict_panoptic`` (fg_model.py:557-588). Instances must
    already be in paint order (far-to-near, i.e. descending predicted depth —
    the ordering and per-class id assignment happen in eval/fusion.py because
    the reference assigns ``(class+11)*1000 + k`` ids in visit order,
    fg_model.py:569-577). A pixel takes an instance's id when its pasted
    sigmoid prob ≥ threshold and the instance is *strictly nearer* than the
    current z-buffer value (``inst_depth < current_depth``,
    fg_model.py:582-585). Callers initialize ``bg_depth`` to 1e9 where the
    background depth is unknown so instances always paint there
    (fg_model.py:563-566).

    With ``use_depth=False`` the z-buffer test is skipped and later instances
    simply overwrite (fg_model.py:586-588).

    Args:
      masks:       (N, Hm, Wm) sigmoid probabilities, already ordered.
      bboxes_ulbr: (N, 4) boxes in image pixels.
      depths:      (N,) predicted instance depths (metric).
      ids:         (N,) int32 panoptic ids to write.
      valid:       (N,) bool — padding slots are False.
      bg_labels:   (H, W) int32 background canvas.
      bg_depth:    (H, W) float32 z-buffer init.

    Returns (label_canvas (H, W) int32, depth_canvas (H, W) float32).
    """

    def body(carry, inst):
        label_c, depth_c = carry
        mask, bbox, depth, pid, ok = inst
        m = paste_mask_bilinear(mask, bbox, img_h=img_h, img_w=img_w)
        on = (m >= threshold) & ok
        if use_depth:
            write = on & (depth < depth_c)
            depth_c = jnp.where(write, depth, depth_c)
        else:
            write = on
        label_c = jnp.where(write, pid, label_c)
        return (label_c, depth_c), None

    (label_c, depth_c), _ = jax.lax.scan(
        body, (bg_labels, bg_depth), (masks, bboxes_ulbr, depths, ids, valid)
    )
    return label_c, depth_c
