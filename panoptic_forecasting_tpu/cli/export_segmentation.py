"""Export segmentation predictions (pc_transform or bg) as Cityscapes PNGs.

Reference capability: experiments/export_cityscapes_segmentation_results.py —
writes ``{city}_{seq}_{frame:06d}_gtFine_labelIds.png`` per target frame
(trainId→labelId converted unless ``no_convert``), optional depth exports
(npy / depth PNG / disparity PNG, :111-127), color viz, and backfills
missing frames against the gtFine listing with background / zeros / 255
(:131-166).

Layout: ``working_dir/{export_name|exported_predictions}/{split}/{city}/``.
"""

from __future__ import annotations

import glob
import os
import sys

import jax
import numpy as np

from ..data.cityscapes import train_id_color_palette, train_id_to_id_lut
from ..data.io import (
    PNG_IDS,
    PNG_SMOOTH16,
    encode_depth_png,
    encode_disparity_from_depth,
    save_png,
)
from ..train.loop import _strip_meta
from .common import export_writer, restore_params, setup


def export_split(model, params, task_data, split, cfg) -> str:
    wd = cfg["working_dir"]
    export_name = cfg.get("export_name")
    viz = bool(cfg.get("viz"))
    if export_name:
        base = os.path.join(wd, export_name, split)
    elif viz:
        base = os.path.join(wd, "exported_predictions_viz", split)
    else:
        base = os.path.join(wd, "exported_predictions", split)
    no_convert = bool(cfg.get("no_convert"))
    convert_to_trainid = bool(cfg.get("convert_to_trainid"))
    is_img = bool(cfg.get("is_img"))
    save_depth = bool(cfg.get("save_depth"))
    save_disp_as_png = bool(cfg.get("save_disp_as_png"))
    save_depth_as_png = bool(cfg.get("save_depth_as_png"))
    disp_factor = float(cfg.get("disp_factor") or 0.0)
    lut = train_id_to_id_lut()
    # labelId -> trainId with the reference's zeros-init edge behavior:
    # values outside the label table -> 0, trainId -1 wraps to 255 on the
    # uint8 PNG write (convert_labels_to_trainid,
    # export_cityscapes_segmentation_results.py:34-38).
    from ..data.cityscapes import ID_TO_LABEL

    id_lut = np.zeros(256, np.uint8)
    for i, lbl in ID_TO_LABEL.items():
        if 0 <= i < 256:
            id_lut[i] = np.uint8(lbl.train_id % 256)
    palette = train_id_color_palette()

    loader = task_data.loader(split, cfg, test=True)
    # Host-side PNG/npy writes run on a bounded pool so they overlap the
    # next batch's predict; JAX stays on this thread (AsyncWriter docs).
    with export_writer(cfg) as w:
        for batch in loader:
            preds = model.predict(params, _strip_meta(batch))
            segs = np.asarray(preds["seg"])
            depths = np.asarray(preds["depth"]) if "depth" in preds else None
            meta = batch["meta"]
            for i in range(len(segs)):
                city = meta["city"][i]
                seq = meta["seq"][i]
                tgt = int(meta["target_frame"][i]) if "target_frame" in meta else int(
                    meta["frame"][i]
                )
                name = f"{city}_{seq}_{tgt:06d}"
                out_dir = os.path.join(base, city)
                seg = segs[i]
                if viz:
                    w.submit(
                        save_png,
                        os.path.join(out_dir, f"{name}_gtFine_color.png"),
                        palette[np.clip(seg, 0, 255)],
                    )
                elif is_img:
                    w.submit(
                        save_png,
                        os.path.join(out_dir, f"{name}_leftImg8bit.png"),
                        seg.astype(np.uint8),
                    )
                else:
                    if not no_convert:
                        seg = lut[np.clip(seg, 0, 255)]
                    elif convert_to_trainid:
                        # labelId -> trainId re-encode (reference
                        # export_cityscapes_segmentation_results.py:34-38,91-92)
                        seg = id_lut[np.clip(seg, 0, 255)]
                    w.submit(
                        save_png,
                        os.path.join(out_dir, f"{name}_gtFine_labelIds.png"),
                        seg.astype(np.uint8),
                        **PNG_IDS,
                    )
                if save_depth and depths is not None:
                    d = depths[i]
                    if save_disp_as_png:
                        w.submit(
                            save_png,
                            os.path.join(out_dir, f"{name}_disps.png"),
                            encode_disparity_from_depth(d, disp_factor),
                            **PNG_SMOOTH16,
                        )
                    elif save_depth_as_png:
                        w.submit(
                            save_png,
                            os.path.join(out_dir, f"{name}_depths.png"),
                            encode_depth_png(d),
                            **PNG_SMOOTH16,
                        )
                    else:
                        os.makedirs(out_dir, exist_ok=True)
                        # d.copy(): a batch-array view would pin the whole
                        # batch in the write queue (AsyncWriter max_pending
                        # bounds per-frame memory, not per-batch).
                        w.submit(
                            np.save,
                            os.path.join(out_dir, f"{name}_depths.npy"),
                            d.copy(),
                        )
    if not (viz or is_img):
        backfill_missing(base, split, cfg)
    return base


def backfill_missing(base: str, split: str, cfg) -> int:
    """Fill frames with no prediction: background export if available, else
    zeros (or 255 with ``no_convert``). Reference :131-166."""
    cs_dir = cfg.get("data", {}).get("cityscapes_dir")
    if not cs_dir:
        return 0
    bg_dir = cfg.get("data", {}).get("background_dir")
    no_convert = bool(cfg.get("no_convert"))
    lut = train_id_to_id_lut()
    count = 0
    gt_dir = os.path.join(cs_dir, "gtFine", split)
    if not os.path.isdir(gt_dir):
        return 0
    cities = cfg.get("data", {}).get("cities")
    from PIL import Image

    with export_writer(cfg) as w:
        for city in os.listdir(gt_dir):
            if cities is not None and city not in cities:
                continue
            for path in glob.glob(
                os.path.join(gt_dir, city, "*_gtFine_labelIds.png")
            ):
                fname = os.path.basename(path)
                out = os.path.join(base, city, fname)
                if os.path.exists(out):
                    continue
                count += 1
                arr = None
                if bg_dir:
                    bg_path = os.path.join(bg_dir, city, fname)
                    if os.path.exists(bg_path):
                        arr = lut[
                            np.clip(np.array(Image.open(bg_path)), 0, 255)
                        ]
                if arr is None:
                    shape = np.array(Image.open(path)).shape
                    fill = 255 if no_convert else 0
                    arr = np.full(shape, fill, np.uint8)
                w.submit(save_png, out, arr.astype(np.uint8), **PNG_IDS)
    return count


def main(argv=None) -> None:
    cfg, task_data, model = setup(argv, test=True)
    params = (
        restore_params(cfg, model, task_data)
        if cfg["task"] != "pc_transform"
        else {}
    )
    # BG serving folds conv+BN by default (BGModel.maybe_fold; disable
    # with --set model.fold_bn false). pc_transform has no fold.
    if hasattr(model, "maybe_fold"):
        params = model.maybe_fold(params)
    for split in task_data.datasets:
        out = export_split(model, params, task_data, split, cfg)
        print(f"exported {split} -> {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
