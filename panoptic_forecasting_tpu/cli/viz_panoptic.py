"""Visualize exported panoptic predictions as color overlays.

Reference capability: experiments/viz_cityscapes_panoptic.py — decode
panoptic PNGs (:17-35), color each segment by its category, blend 50/50
with the (grayscale) camera image, and mark thing-instance boundaries in
inverted color (:100-171). The reference uses cv2 contours; here instance
boundaries come from a 4-neighbor label-difference test (pure numpy) so
cv2 stays optional.

Usage:
    python -m panoptic_forecasting_tpu.cli.viz_panoptic \
        --annotations EXPORT.json --label_dir PNG_DIR --output_dir OUT \
        [--rgb_dir LEFTIMG8BIT_DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from ..data.cityscapes import ID_TO_LABEL
from ..data.io import load_png, save_png
from ..eval.pq import decode_panoptic_png


def color_panoptic(seg: np.ndarray, segments_info) -> np.ndarray:
    """(H, W, 3) uint8: each segment painted its category color."""
    img = np.zeros(seg.shape + (3,), np.uint8)
    for s in segments_info:
        label = ID_TO_LABEL.get(int(s["category_id"]))
        if label is None:
            continue
        img[seg == int(s["id"])] = label.color
    return img


def instance_boundaries(seg: np.ndarray, segments_info) -> np.ndarray:
    """Boolean mask of thing-instance boundary pixels (4-neighbor)."""
    thing_ids = {
        int(s["id"])
        for s in segments_info
        if ID_TO_LABEL.get(int(s["category_id"]), None) is not None
        and ID_TO_LABEL[int(s["category_id"])].has_instances
    }
    if not thing_ids:
        return np.zeros(seg.shape, bool)
    is_thing = np.isin(seg, np.array(sorted(thing_ids)))
    edge = np.zeros(seg.shape, bool)
    edge[:, 1:] |= (seg[:, 1:] != seg[:, :-1]) & is_thing[:, 1:]
    edge[:, :-1] |= (seg[:, :-1] != seg[:, 1:]) & is_thing[:, :-1]
    edge[1:, :] |= (seg[1:] != seg[:-1]) & is_thing[1:]
    edge[:-1, :] |= (seg[:-1] != seg[1:]) & is_thing[:-1]
    return edge


def visualize_one(seg: np.ndarray, segments_info,
                  rgb: np.ndarray = None) -> np.ndarray:
    color = color_panoptic(seg, segments_info)
    if rgb is None:
        overlay = color
    else:
        gray = rgb.mean(axis=-1, keepdims=True).astype(np.uint8)
        overlay = (0.5 * gray + 0.5 * color).astype(np.uint8)
    edges = instance_boundaries(seg, segments_info)
    overlay[edges] = 255 - color[edges]
    return overlay


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--annotations", required=True)
    p.add_argument("--label_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--rgb_dir")
    args = p.parse_args(argv)

    with open(args.annotations) as f:
        data = json.load(f)
    anns = data["annotations"] if isinstance(data, dict) else data
    os.makedirs(args.output_dir, exist_ok=True)
    for a in anns:
        seg = decode_panoptic_png(
            load_png(os.path.join(args.label_dir, a["file_name"]))
        )
        rgb = None
        if args.rgb_dir:
            city = a["image_id"].split("_")[0]
            path = os.path.join(
                args.rgb_dir, city, a["image_id"] + "_leftImg8bit.png"
            )
            if os.path.exists(path):
                rgb = load_png(path)
        out = visualize_one(seg, a["segments_info"], rgb)
        save_png(
            os.path.join(args.output_dir, a["image_id"] + "_viz.png"), out
        )
    print(f"wrote {len(anns)} overlays -> {args.output_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
