"""Single-jit end-to-end panoptic forecast: pc → bg → fg → fusion.

The staged pipeline (cli exporters) mirrors the reference's file-interface
stages (SURVEY §1 dataflow). For serving, this module fuses the whole
forecast for one target frame into ONE jitted program with zero host
round trips:

  1. per-input-frame point-cloud reprojection (the bg model consumes one
     canvas per past frame, like the reference's ind0/1/2 exports) —
     models/pc_transform + the Pallas placement kernel;
  2. background refinement: one-hot + depth stack → FCHarDNet → argmax,
     with the combined z-buffer depth = min over the per-frame depths
     (identical to the 3-frame z-buffer by associativity of min);
  3. foreground rollout: coupled GRU⇄ConvLSTM + mask head over the dense
     padded instance batch;
  4. fusion IN-GRAPH: depth-sort, per-class visit-order panoptic id
     assignment (a rank matrix over the tiny instance axis replaces the
     reference's host-side counters, fg_model.py:569-577), masked paste +
     composite.

Reference capability: the chained scripts of
scripts/fg/run_fg_eval_panoptic.sh (odom export → pc export → bg export →
panoptic export); here the chain is one XLA program.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..geometry.boxes import bbox_cwh_to_ulbr
from ..kernels.mask_paste import paste_and_composite
from ..models.pc_transform import pc_transform_predict


def _instance_ids(classes, depths, valid, use_depth_sorting: bool):
    """Visit order + panoptic ids for one scene, in-graph.

    Matches eval/fusion._order_and_ids: far-to-near stable order, id =
    (class+11)*1000 + per-class visit rank; padded slots get id 0.
    """
    n = classes.shape[0]
    if use_depth_sorting:
        order = jnp.argsort(jnp.where(valid, -depths, jnp.inf))
    else:
        order = jnp.arange(n)
    cls_s = classes[order]
    val_s = valid[order]
    idx = jnp.arange(n)
    earlier_same = (
        (cls_s[None, :] == cls_s[:, None])
        & (idx[None, :] < idx[:, None])
        & val_s[None, :]
    )
    rank = jnp.sum(earlier_same, axis=1)
    ids = jnp.where(val_s, (cls_s + 11) * 1000 + rank, 0).astype(jnp.int32)
    return order, ids


def build_forecast_step(bg_model, fg_model, *, height: int, width: int,
                        out_t: int, threshold: float = 0.5,
                        use_bg_depth: bool = False):
    """Returns a jitted ``step(bg_vars, fg_vars, pc_in, fg_in)``.

    pc_in: seg/depth/depth_mask (B, T, H, W), intrinsics (B, 3, 3),
      extrinsics (B, 4, 4), target_T (B, T, 4, 4).
    fg_in: the dense padded fg-scene inputs (trajectories, bbox_masks,
      bbox_vel_masks, depths, depth_masks, feats, odometry, classes,
      output_inds, valid) with leading (B, N).

    Returns dict with ``panoptic`` (B, H, W) int32 trainId·1000+inst maps,
    ``bg_seg``, ``bg_depth``, ``ids``. ``ids``/``bbox``/``depths`` are all
    indexed by ORIGINAL instance slot (ids[b, k] is the painted id of
    input instance k; 0 for padded slots) — same contract as the staged
    eval/fusion.predict_panoptic.

    ``use_bg_depth`` z-buffers instances against the combined reprojected
    depth (the reference FGModel supports a ``background_depth`` input,
    fg_model.py:563-566, but no shipped dataset feeds it — so the parity
    default is False: instances always paint over the background).
    """

    def step(bg_vars, fg_vars, pc_in: Dict[str, Any], fg_in: Dict[str, Any]):
        seg = jnp.asarray(pc_in["seg"])
        b, t = seg.shape[:2]

        # ---- 1. per-frame reprojection (reference ind0/1/2 exports) -----
        def flat(x):
            x = jnp.asarray(x)
            return x.reshape((b * t, 1) + x.shape[2:])

        rep = pc_transform_predict(
            flat(seg),
            flat(pc_in["depth"]),
            flat(pc_in["depth_mask"]),
            jnp.repeat(jnp.asarray(pc_in["intrinsics"], jnp.float32), t, 0),
            jnp.repeat(jnp.asarray(pc_in["extrinsics"], jnp.float32), t, 0),
            flat(pc_in["target_T"]).astype(jnp.float32),
            height=height,
            width=width,
        )
        rep_seg = rep["seg"].reshape(b, t, height, width)
        rep_depth = rep["depth"].reshape(b, t, height, width)

        # ---- 2. background refinement -----------------------------------
        bg_batch = {
            "inputs": {
                "seg": rep_seg,
                "depth": jnp.maximum(rep_depth, 0.0),
                "depth_mask": rep_depth > 0,
            }
        }
        # return_argmax resizes the logits in CHW and reduces in-graph —
        # the (B, H, W, C) full-res logits would lane-pad C -> 128
        # (~1 GB of HBM traffic at 1024x2048 per forecast).
        bg_seg = bg_model.forward(bg_vars, bg_batch, return_argmax=True)
        # Combined z-buffer depth over the input frames; empty -> 1e9 so
        # instances always paint there (fusion strict-< rule).
        dvalid = rep_depth > 0
        bg_depth = jnp.min(
            jnp.where(dvalid, rep_depth, jnp.inf), axis=1
        )
        bg_depth = jnp.where(jnp.isfinite(bg_depth), bg_depth, 1e9)

        # ---- 3. foreground rollout --------------------------------------
        n = jnp.asarray(fg_in["trajectories"]).shape[1]

        def fg_flat(x):
            x = jnp.asarray(x)
            return x.reshape((b * n,) + x.shape[2:])

        flat_in = {
            k: fg_flat(v)
            for k, v in fg_in.items()
            if k not in ("valid",)
        }
        preds = fg_model.forward(fg_vars, flat_in, out_t)
        traj = preds["unnormalized_trajectory"][:, -out_t:]
        oidx = fg_flat(fg_in["output_inds"]).astype(jnp.int32)
        sel = jnp.take_along_axis(
            traj, oidx[:, None, None], axis=1
        )[:, 0]
        boxes = sel[..., :4]
        if not fg_model.use_bbox_ulbr:
            boxes = bbox_cwh_to_ulbr(boxes)
        depth_col = 4 if fg_model.only_loc_feats else 8
        inst_depth = (
            sel[..., depth_col]
            if fg_model.use_depth_inp
            else jnp.zeros(sel.shape[:1])
        )
        masks = jax.nn.sigmoid(preds["masks"])
        mh = masks.shape[-1]
        masks = masks.reshape(b, n, mh, mh)
        boxes = boxes.reshape(b, n, 4).astype(jnp.float32)
        inst_depth = inst_depth.reshape(b, n).astype(jnp.float32)

        # ---- 4. fusion in-graph -----------------------------------------
        classes = jnp.asarray(fg_in["classes"]).reshape(b, n)
        valid = jnp.asarray(fg_in["valid"]).reshape(b, n)
        canvas = jnp.where(bg_seg >= 11, 255, bg_seg).astype(jnp.int32)

        fusion_depth = (
            bg_depth
            if use_bg_depth
            else jnp.full_like(bg_depth, 1e9)
        )

        def fuse_one(m, bx, dp, cl, vl, cv, cvd):
            order, ids = _instance_ids(
                cl, dp, vl, fg_model.use_depth_sorting
            )
            pan = paste_and_composite(
                m[order], bx[order], dp[order], ids, vl[order], cv, cvd,
                img_h=height, img_w=width, threshold=threshold,
                use_depth=fg_model.use_depth_sorting and use_bg_depth,
            )[0]
            # Scatter ids back to ORIGINAL slot order so ids[k] pairs with
            # bbox[k]/depths[k] exactly like the staged
            # fusion.predict_panoptic output (_order_and_ids writes ids[k]
            # per original slot k).
            ids_slot = jnp.zeros_like(ids).at[order].set(ids)
            return pan, ids_slot

        pan, ids = jax.vmap(fuse_one)(
            masks, boxes, inst_depth, classes, valid, canvas, fusion_depth
        )
        return {
            "panoptic": pan,
            "ids": ids,
            "bg_seg": bg_seg,
            "bg_depth": bg_depth,
            "bbox": boxes,
            "depths": inst_depth,
        }

    return jax.jit(step)
