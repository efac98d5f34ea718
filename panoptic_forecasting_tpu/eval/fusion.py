"""Panoptic / semantic / instance fusion of FG forecasts over BG canvases.

Reference capability: ``FGModel.predict_semantics`` (fg_model.py:389-487),
``predict_panoptic`` (489-595), ``predict_instances`` (597-746). Common
algorithm: forward the scene's instances, sigmoid the mask logits, paste
each 28×28 mask into the full image at its predicted bbox, threshold at
0.5, and composite far-to-near (descending predicted depth) over the
background canvas. Panoptic ids are ``(class+11)·1000 + k`` with per-class
counters assigned in **visit order** (fg_model.py:569-577); the background
canvas has thing pixels (≥11) reset to 255 void first (fg_model.py:516-518).
When a background depth map is provided the composite z-buffers against it
(strict ``<``, unknown depth → 1e9, fg_model.py:563-566, 580-585);
otherwise later (nearer) instances simply overwrite (586-588).

TPU re-design: the reference's per-instance Python paste loop becomes one
``lax.scan`` composite per scene (kernels/mask_paste.paste_and_composite)
over dense padded instance arrays; ordering + id assignment stay host-side
(tiny), everything pixel-sized runs on device.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.boxes import bbox_cwh_to_ulbr
from ..kernels.mask_paste import paste_and_composite, paste_mask_bilinear

IMG_H, IMG_W = 1024, 2048


def _flatten_scenes(tree):
    """(S, N, ...) arrays -> (S*N, ...)."""

    def f(x):
        x = np.asarray(x)
        return x.reshape((-1,) + x.shape[2:])

    return jax.tree_util.tree_map(f, tree)


def run_scene_forward(model, variables, batch) -> Dict[str, np.ndarray]:
    """Forward all scenes' padded instances in one jitted call.

    Returns preds with a leading (S, N) shape restored on the trajectory /
    mask outputs.
    """
    inputs = dict(batch["inputs"])
    labels = batch["labels"]
    s, n = np.asarray(inputs["trajectories"]).shape[:2]
    flat = _flatten_scenes(
        {k: v for k, v in inputs.items() if k not in ("background", "valid")}
    )
    flat["output_inds"] = np.asarray(labels["output_inds"]).reshape(-1)
    out_t = int(np.asarray(labels["trajectories"]).shape[2])
    preds = model.forward(variables, flat, out_t)
    out = {}
    for k, v in preds.items():
        v = np.asarray(v)
        out[k] = v.reshape((s, n) + v.shape[1:])
    return out


def _pred_boxes_depths(model, preds, output_inds, out_t):
    """Select per-instance bbox (ULBR) + depth at the requested output index.

    The trajectory rollout includes the re-anchored last-input state at
    position 0; the reference slices ``traj_preds[:, -out_t:]`` before
    indexing with output_inds (fg_model.py:439-443, 542-546) so index 0 is
    the FIRST FORECAST step — same convention as the mask-feature path.
    """
    traj = preds["unnormalized_trajectory"][:, :, -out_t:]  # (S, N, out_t, D)
    s, n = traj.shape[:2]
    idx = np.asarray(output_inds).reshape(s, n)
    sel = np.take_along_axis(
        traj, idx[:, :, None, None], axis=2
    )[:, :, 0]  # (S, N, D)
    boxes = sel[..., :4]
    if not model.use_bbox_ulbr:
        boxes = np.asarray(bbox_cwh_to_ulbr(boxes))
    depth_col = 4 if model.only_loc_feats else 8
    depths = (
        sel[..., depth_col] if model.use_depth_inp else np.zeros(sel.shape[:2])
    )
    return boxes.astype(np.float32), depths.astype(np.float32)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _order_and_ids(model, depths, classes, valid, panoptic):
    """Host-side visit order + painted ids for one scene (tiny arrays)."""
    n = depths.shape[0]
    if model.use_depth_sorting:
        order = np.argsort(np.where(valid, -depths, np.inf), kind="stable")
    else:
        order = np.arange(n)
    ids = np.zeros(n, np.int64)
    counters: Dict[int, int] = {}
    for k in order:
        if not valid[k]:
            continue
        cl = int(classes[k]) + 11
        if panoptic:
            c = counters.get(cl, 0)
            counters[cl] = c + 1
            ids[k] = cl * 1000 + c
        else:
            ids[k] = cl
    return order, ids


@functools.lru_cache(maxsize=None)
def _paste_batch(img_h, img_w):
    def one(m, b):
        return paste_mask_bilinear(m, b, img_h=img_h, img_w=img_w)

    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=None)
def _composite_batch(img_h, img_w, threshold, use_depth):
    def one(m, b, d, i, v, bl, bd):
        return paste_and_composite(
            m, b, d, i, v, bl, bd, img_h=img_h, img_w=img_w,
            threshold=threshold, use_depth=use_depth,
        )

    return jax.jit(jax.vmap(one))


def fuse_scenes(model, masks, boxes, depths, classes, valid, bg_labels,
                bg_depths=None, panoptic=True, threshold=0.5):
    """Composite a batch of scenes in ONE vmapped device call.

    All arrays dense (S, N, ...) / (S, H, W); returns (segs (S, H, W),
    ids (S, N)). ``ids[b, k]`` is the painted id of instance k (0 for
    padded slots). Ordering + id assignment stay host-side (tiny);
    everything pixel-sized runs batched on device — the per-scene
    composite loop cost one device round-trip per scene before.
    """
    s, n = masks.shape[:2]
    orders = np.zeros((s, n), np.int64)
    ids = np.zeros((s, n), np.int64)
    for b in range(s):
        orders[b], ids[b] = _order_and_ids(
            model, depths[b], classes[b], valid[b], panoptic
        )
    take = np.arange(s)[:, None]
    img_h, img_w = bg_labels.shape[-2], bg_labels.shape[-1]
    use_depth = bool(model.use_depth_sorting and bg_depths is not None)
    if bg_depths is None:
        bgd = np.full((s, img_h, img_w), 1e9, np.float32)
    else:
        bgd = np.asarray(bg_depths, np.float32)
        bgd = np.where(bgd > 0, bgd, 1e9)
    segs, _ = _composite_batch(img_h, img_w, threshold, use_depth)(
        jnp.asarray(masks[take, orders]),
        jnp.asarray(boxes[take, orders]),
        jnp.asarray(depths[take, orders]),
        jnp.asarray(ids[take, orders].astype(np.int32)),
        jnp.asarray(valid[take, orders]),
        jnp.asarray(bg_labels.astype(np.int32)),
        jnp.asarray(bgd),
    )
    return np.asarray(segs), ids


def fuse_scene(model, masks, boxes, depths, classes, valid, bg_labels,
               bg_depth=None, panoptic=True, threshold=0.5):
    """Composite one scene (thin wrapper over the batched path)."""
    segs, ids = fuse_scenes(
        model, masks[None], boxes[None], depths[None], classes[None],
        valid[None], np.asarray(bg_labels)[None],
        None if bg_depth is None else np.asarray(bg_depth)[None],
        panoptic=panoptic, threshold=threshold,
    )
    return segs[0], ids[0]


def _bg_depths_from_batch(batch) -> Optional[np.ndarray]:
    """Optional per-scene background depth canvas for the composite's
    z-buffer (fg_model.py:522-527, 563-566, 580-585). With a
    ``background_depth_mask`` the masked-out pixels become unknown (the
    reference's INTENT at :565-566 — its shipped code crashes on that
    path with a (H, W)-mask-vs-(1, H, W) IndexError, so the intended
    semantics are implemented here and the working depth-only path is
    golden-pinned cross-framework)."""
    bg_depths = batch["inputs"].get("background_depth")
    if bg_depths is None:
        return None
    bgd = np.asarray(bg_depths, np.float32)
    m = batch["inputs"].get("background_depth_mask")
    if m is not None:
        bgd = np.where(np.asarray(m, bool), bgd, -1.0)  # -> unknown (1e9)
    return bgd


def predict_panoptic(model, variables, batch) -> Dict[str, Any]:
    """Batched panoptic fusion. Returns seg (S, H, W) int64 panoptic maps in
    trainId·1000+inst space, plus per-scene instance ids/boxes/depths."""
    preds = run_scene_forward(model, variables, batch)
    out_t = int(np.asarray(batch["labels"]["trajectories"]).shape[2])
    boxes, depths = _pred_boxes_depths(
        model, preds, batch["labels"]["output_inds"], out_t
    )
    masks = _sigmoid(preds["masks"])  # (S, N, 28, 28)
    valid = np.asarray(batch["inputs"]["valid"], bool)
    classes = np.asarray(batch["inputs"]["classes"])
    s = masks.shape[0]
    backgrounds = batch["inputs"].get("background")
    if backgrounds is not None:
        bg = np.asarray(backgrounds).astype(np.int64)
        # thing pixels (>= 11) reset to void first (fg_model.py:516-518)
        bg = np.where(bg >= 11, 255, bg)
    else:
        bg = np.full((s, IMG_H, IMG_W), 255, np.int64)
    segs, ids = fuse_scenes(
        model, masks, boxes, depths, classes, valid, bg,
        bg_depths=_bg_depths_from_batch(batch), panoptic=True
    )
    return {
        "seg": segs,
        "ids": list(ids),
        "bbox": boxes,
        "depths": depths,
        "masks": masks,
    }


def predict_semantics(model, variables, batch) -> Dict[str, Any]:
    """Semantic fusion: instance pixels take trainId class+11
    (fg_model.py:454-480); background canvas is used as-is."""
    preds = run_scene_forward(model, variables, batch)
    out_t = int(np.asarray(batch["labels"]["trajectories"]).shape[2])
    boxes, depths = _pred_boxes_depths(
        model, preds, batch["labels"]["output_inds"], out_t
    )
    masks = _sigmoid(preds["masks"])
    valid = np.asarray(batch["inputs"]["valid"], bool)
    classes = np.asarray(batch["inputs"]["classes"])
    s = masks.shape[0]
    backgrounds = batch["inputs"].get("background")
    if backgrounds is not None:
        bg = np.asarray(backgrounds).astype(np.int64)
    else:
        bg = np.full((s, IMG_H, IMG_W), 255, np.int64)
    segs, _ = fuse_scenes(
        model, masks, boxes, depths, classes, valid, bg,
        bg_depths=_bg_depths_from_batch(batch), panoptic=False
    )
    return {"seg": segs, "bbox": boxes, "depths": depths}


def predict_instances(model, variables, batch) -> Dict[str, Any]:
    """Per-instance pasted masks for AP-style export (fg_model.py:597-746).

    Matches the reference's occlusion semantics: all instances are
    composited into ONE scene seg in visit order (descending predicted
    depth; later = nearer instances overwrite, fg_model.py:712-729), then
    each instance's binary mask is extracted from the composite
    (``scene_seg == (id+1)*1000``) — overlapped pixels belong to the
    nearer instance, and fully-occluded instances are dropped
    (fg_model.py:731-736). Output order is visit order. The score is the
    dataset-provided ``inst_scores`` pass-through when present, else 1.0
    (the export default, export_cityscapes_instance_results.py:75-78).

    Deliberate divergence: the reference hardcodes a 1024x2048 canvas
    (fg_model.py:646, 712); we follow the scene background's shape when one
    is provided so reduced-resolution fixtures run end to end — identical
    at Cityscapes scale."""
    preds = run_scene_forward(model, variables, batch)
    out_t = int(np.asarray(batch["labels"]["trajectories"]).shape[2])
    boxes, depths = _pred_boxes_depths(
        model, preds, batch["labels"]["output_inds"], out_t
    )
    masks = _sigmoid(preds["masks"])
    valid = np.asarray(batch["inputs"]["valid"], bool)
    classes = np.asarray(batch["inputs"]["classes"])
    s, n = masks.shape[:2]
    backgrounds = batch["inputs"].get("background")
    if backgrounds is not None:
        img_h, img_w = np.asarray(backgrounds).shape[-2:]
    else:
        img_h, img_w = IMG_H, IMG_W
    orders = np.zeros((s, n), np.int64)
    visit_ids = np.zeros((s, n), np.int64)  # ids in VISIT-position space
    for b in range(s):
        if model.use_depth_sorting:
            orders[b] = np.argsort(
                np.where(valid[b], -depths[b], np.inf), kind="stable"
            )
        else:
            orders[b] = np.arange(n)
        visit_ids[b] = np.where(
            valid[b][orders[b]], (np.arange(n) + 1) * 1000, 0
        )
    take = np.arange(s)[:, None]
    # No z-buffer: the reference's instance composite is pure overwrite in
    # visit order (its depth+background variant raises NotImplementedError,
    # fg_model.py:724-725).
    segs, _ = _composite_batch(img_h, img_w, 0.5, False)(
        jnp.asarray(masks[take, orders]),
        jnp.asarray(boxes[take, orders]),
        jnp.asarray(depths[take, orders]),
        jnp.asarray(visit_ids.astype(np.int32)),
        jnp.asarray(valid[take, orders]),
        jnp.zeros((s, img_h, img_w), jnp.int32),
        jnp.full((s, img_h, img_w), 1e9, jnp.float32),
    )
    segs = np.asarray(segs)
    inst_scores = batch["inputs"].get("inst_scores")
    scenes: List[List[Dict[str, Any]]] = []
    for b in range(s):
        insts = []
        for pos in range(n):
            k = orders[b, pos]
            if not valid[b, k]:
                continue
            binary = segs[b] == (pos + 1) * 1000
            if not binary.any():
                continue  # fully occluded: dropped (fg_model.py:731-736)
            score = 1.0 if inst_scores is None else float(inst_scores[b][k])
            insts.append(
                {
                    "mask": binary,
                    "class_train_id": int(classes[b, k]) + 11,
                    "bbox_ulbr": boxes[b, k],
                    "depth": float(depths[b, k]),
                    "score": score,
                }
            )
        scenes.append(insts)
    return {"instances": scenes}
