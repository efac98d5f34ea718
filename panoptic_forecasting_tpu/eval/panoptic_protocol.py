"""Cityscapes panoptic file protocol: relabeling, segments_info, GT prep.

Reference capability:
* ``convert_labels`` / ``get_segments_info`` / ``create_pan_img`` in
  experiments/export_cityscapes_panoptic_results.py:27-68 — per-unique-value
  Python loops there; vectorized LUT arithmetic here.
* GT preparation is done upstream by ``cityscapesscripts
  preparation/createPanopticImgs.py`` (not in the reference repo); the same
  conversion from ``*_gtFine_instanceIds.png`` is provided in-tree so the
  PQ evaluator (eval/pq.py) is self-contained.

Fused panoptic maps live in **trainId space**: stuff pixels hold trainId
(0..10), things hold ``trainId*1000 + instance`` (trainId 11..18), void is
255 (eval/fusion.py). The exported COCO-panoptic files live in **labelId
space**: stuff = labelId, things = ``labelId*1000 + instance``, void/ignored
= 0.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..data.cityscapes import (
    ID_TO_LABEL,
    LABELS,
    train_id_to_id_lut,
)
from ..data.io import PNG_IDS, load_png, save_png
from .pq import encode_panoptic_png


def relabel_panoptic_trainid_to_labelid(seg: np.ndarray) -> np.ndarray:
    """Vectorized convert_labels (export_cityscapes_panoptic_results.py:27-41).

    255 -> 0; stuff trainId -> labelId; ``trainId*1000+inst`` ->
    ``labelId*1000+inst`` (the reference's ``> 100`` threshold means any
    thing-encoded value; trainIds stop at 18).
    """
    seg = seg.astype(np.int64)
    lut = train_id_to_id_lut(void_id=0).astype(np.int64)
    is_thing = (seg > 100) & (seg != 255)
    cat = np.where(is_thing, seg // 1000, np.where(seg == 255, 255, seg))
    inst = np.where(is_thing, seg % 1000, 0)
    new_cat = lut[np.clip(cat, 0, 255)]
    return np.where(is_thing, new_cat * 1000 + inst, new_cat)


def segments_info_from_labelid_seg(seg: np.ndarray) -> List[Dict[str, Any]]:
    """get_segments_info parity (:54-68): one entry per non-zero segment id,
    category = id//1000 for thing encodings (>100), else the id itself."""
    out: List[Dict[str, Any]] = []
    ids, areas = np.unique(seg, return_counts=True)
    for sid, area in zip(ids.tolist(), areas.tolist()):
        if sid == 0:
            continue
        cat = sid // 1000 if sid > 100 else sid
        out.append({"id": int(sid), "category_id": int(cat),
                    "area": int(area)})
    return out


def write_panoptic_png(path: str, seg_labelid: np.ndarray) -> None:
    save_png(path, encode_panoptic_png(seg_labelid), **PNG_IDS)


# ---------------------------------------------------------------------------
# GT conversion: gtFine *_instanceIds.png -> COCO panoptic (PNG + json).
# Same semantics as cityscapesscripts/preparation/createPanopticImgs.py:
# pixel < 1000 holds a plain labelId (a thing labelId there means a crowd
# region), >= 1000 holds labelId*1000+instance; only eval categories are
# kept, everything else becomes void 0.
# ---------------------------------------------------------------------------

def gt_panoptic_from_instance_ids(inst_ids: np.ndarray
                                  ) -> Tuple[np.ndarray, List[Dict[str, Any]]]:
    inst_ids = inst_ids.astype(np.int64)
    out = np.zeros_like(inst_ids)
    segments: List[Dict[str, Any]] = []
    for sid in np.unique(inst_ids):
        label_id = int(sid // 1000) if sid >= 1000 else int(sid)
        label = ID_TO_LABEL.get(label_id)
        if label is None or label.ignore_in_eval:
            continue
        mask = inst_ids == sid
        out[mask] = int(sid)
        segments.append({
            "id": int(sid),
            "category_id": label_id,
            "area": int(mask.sum()),
            "iscrowd": int(sid < 1000 and label.has_instances),
        })
    return out, segments


def convert_gt_split(cityscapes_dir: str, split: str, out_dir: str,
                     frames: Optional[set] = None) -> str:
    """Convert a gtFine split to COCO panoptic files under ``out_dir``.

    Returns the json path. ``frames`` optionally restricts to a set of
    ``city_seq_frame`` image ids.
    """
    gt_root = os.path.join(cityscapes_dir, "gtFine", split)
    png_dir = os.path.join(out_dir, f"cityscapes_panoptic_{split}")
    os.makedirs(png_dir, exist_ok=True)
    annotations = []
    paths = sorted(glob.glob(os.path.join(gt_root, "*",
                                          "*_gtFine_instanceIds.png")))
    json_path = os.path.join(out_dir, f"cityscapes_panoptic_{split}.json")

    # Reuse a previous conversion when it covers exactly the requested
    # frame set (GT is immutable; reconverting ~500 full-res frames costs
    # about a minute per eval run otherwise).
    wanted = {
        "_".join(os.path.basename(p).split("_")[:3])
        for p in paths
        if frames is None or "_".join(os.path.basename(p).split("_")[:3])
        in frames
    }
    if os.path.exists(json_path):
        try:
            with open(json_path) as f:
                prev = json.load(f)["annotations"]
            if {a["image_id"] for a in prev} == wanted and all(
                os.path.exists(os.path.join(png_dir, a["file_name"]))
                for a in prev
            ):
                return json_path
        except (ValueError, KeyError, OSError):
            pass  # corrupt/partial previous conversion: redo it

    for path in paths:
        name = os.path.basename(path)
        image_id = "_".join(name.split("_")[:3])
        if frames is not None and image_id not in frames:
            continue
        seg, segments = gt_panoptic_from_instance_ids(load_png(path))
        file_name = f"{image_id}_gtFine_panoptic.png"
        write_panoptic_png(os.path.join(png_dir, file_name), seg)
        annotations.append({
            "image_id": image_id,
            "file_name": file_name,
            "segments_info": segments,
        })
    with open(json_path, "w") as f:
        json.dump({"annotations": annotations}, f)
    return json_path
