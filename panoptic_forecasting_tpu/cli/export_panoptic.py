"""Export forecast panoptic segmentations as COCO-panoptic PNGs + json.

Reference capability: experiments/export_cityscapes_panoptic_results.py —
per target frame writes ``{city}_{seq}_{frame:06d}_pred_panoptic.png``
(labelId-space ids encoded base-256 into RGB, :43-52), accumulates COCO
annotations into ``{export_name}.json`` (:112-173), and backfills frames
the scene dataset skipped with the background canvas (or zeros) against
the gtFine listing (:124-168).

Usage:
    python -m panoptic_forecasting_tpu.cli.export_panoptic \
        --working_dir DIR --config_file cfg.yaml [--set export_name NAME] \
        [--set no_convert true]
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

from ..data.io import load_png
from ..eval import fusion
from ..eval.panoptic_protocol import (
    relabel_panoptic_trainid_to_labelid,
    segments_info_from_labelid_seg,
    write_panoptic_png,
)
from ..train.loop import _strip_meta
from .common import export_writer, restore_params, setup


def export_split(model, params, task_data, split, cfg) -> str:
    wd = cfg["working_dir"]
    export_name = cfg.get("export_name") or "exported_panoptics"
    export_name = f"{export_name}_{split}"
    result_dir = os.path.join(wd, export_name)
    seg_dir = os.path.join(result_dir, export_name)
    os.makedirs(seg_dir, exist_ok=True)
    no_convert = bool(cfg.get("no_convert"))

    annotations = []
    exported = set()
    loader = task_data.loader(split, cfg, test=True)
    # PNG encode+write overlaps the next batch's device step (JAX stays
    # on this thread — AsyncWriter docs).
    with export_writer(cfg) as w:
        for batch in loader:
            preds = fusion.predict_panoptic(model, params, _strip_meta(batch))
            segs = np.asarray(preds["seg"])
            meta = batch["meta"]
            for i in range(len(segs)):
                city = meta["city"][i]
                seq = meta["seq"][i]
                target = int(meta["target_frame"][i])
                name = f"{city}_{seq}_{target:06d}"
                seg = segs[i]
                if not no_convert:
                    seg = relabel_panoptic_trainid_to_labelid(seg)
                else:
                    # A batch-array view would pin the whole batch in the
                    # write queue; copy so max_pending bounds per-frame
                    # memory as documented.
                    seg = seg.copy()
                file_name = f"{name}_pred_panoptic.png"
                w.submit(
                    write_panoptic_png, os.path.join(seg_dir, file_name), seg
                )
                annotations.append({
                    "image_id": name,
                    "file_name": file_name,
                    "segments_info": segments_info_from_labelid_seg(seg),
                })
                exported.add(name)

    backfill_missing(cfg, split, seg_dir, exported, annotations)

    with open(os.path.join(result_dir, f"{export_name}.json"), "w",
              encoding="utf-8") as f:
        json.dump({"annotations": annotations}, f, ensure_ascii=False,
                  indent=4)
    print(f"[{split}] exported {len(exported)} frames -> {seg_dir}")
    return result_dir


def backfill_missing(cfg, split, seg_dir, exported, annotations):
    """Fill frames missing from the export with the bg canvas / zeros
    (reference :124-168) so the PQ tool sees every gt frame."""
    cityscapes_dir = cfg.get("data", {}).get("cityscapes_dir")
    if not cityscapes_dir:
        print("DID NOT RECEIVE CITYSCAPES DIR. SKIPPING BACKFILL.")
        return
    background_dir = cfg.get("data", {}).get("background_dir")
    gt_dir = os.path.join(cityscapes_dir, "gtFine", split)
    count = 0
    with export_writer(cfg) as w:
        for path in sorted(
            glob.glob(os.path.join(gt_dir, "*", "*_gtFine_labelIds.png"))
        ):
            parts = os.path.basename(path).split("_")
            name = f"{parts[0]}_{parts[1]}_{parts[2]}"
            if name in exported:
                continue
            count += 1
            seg = None
            if background_dir:
                # canvases live under background_dir/{split}/{city}/ (the
                # loader appends split too; reference fg_scene_dataset.py:51-53
                # + export_cityscapes_panoptic_results.py:143-146)
                bg_path = os.path.join(
                    background_dir, split, parts[0], os.path.basename(path)
                )
                if os.path.exists(bg_path):
                    # bg export is already trainId-space labelIds PNG; treat
                    # as a pure-stuff panoptic canvas.
                    seg = relabel_panoptic_trainid_to_labelid(
                        load_png(bg_path).astype(np.int64)
                    )
            if seg is None:
                seg = np.zeros((fusion.IMG_H, fusion.IMG_W), np.int64)
            file_name = f"{name}_pred_panoptic.png"
            w.submit(
                write_panoptic_png, os.path.join(seg_dir, file_name), seg
            )
            annotations.append({
                "image_id": name,
                "file_name": file_name,
                "segments_info": segments_info_from_labelid_seg(seg),
            })
    print("NUM MISSING:", count)


def main(argv=None) -> None:
    cfg, task_data, model = setup(argv, test=True)
    params = restore_params(cfg, model, task_data)
    for split in task_data.datasets:
        export_split(model, params, task_data, split, cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
