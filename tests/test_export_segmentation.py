"""Export CLI: pc_transform reprojections → Cityscapes labelId PNGs."""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from panoptic_forecasting_tpu.cli.export_segmentation import export_split
from panoptic_forecasting_tpu.core import build_dataset, build_model
from panoptic_forecasting_tpu.data.synthetic import write_cityscapes_fixture


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cs_export"))
    write_cityscapes_fixture(root, split="val", n_snippets=2, height=64, width=128)
    return {
        "task": "pc_transform",
        "seed": 0,
        "working_dir": root + "/run",
        "no_convert": True,  # pc inputs are already labelIds
        "save_depth": True,
        "save_depth_as_png": True,
        "data": {
            "data_splits": ["val"],
            "data_dir": root,
            "cityscapes_dir": root,
            "seg_dir": root + "/seg",
            "gap_len": 9,
        },
        "model": {},
        "training": {"batch_size": 2},
    }


def test_export_writes_pngs_and_depth(cfg):
    data = build_dataset(cfg, test=True)
    model = build_model(cfg, data.card)
    base = export_split(model, {}, data, "val", cfg)
    pngs = sorted(glob.glob(os.path.join(base, "*", "*_gtFine_labelIds.png")))
    assert len(pngs) == 2
    arr = np.array(Image.open(pngs[0]))
    assert arr.shape == (64, 128)
    # labelId space: road=7 and sky=23 should appear
    vals = set(np.unique(arr).tolist())
    assert 7 in vals and 23 in vals
    depth_pngs = glob.glob(os.path.join(base, "*", "*_depths.png"))
    assert len(depth_pngs) == 2
    d = np.array(Image.open(depth_pngs[0]))
    assert d.dtype == np.uint16
    # decoded depth plausible (road a few meters, far stuff clamped)
    dd = d[d > 0] / 256.0 - 1.0
    assert 0.5 < dd.min() < 10


def test_backfill_missing_fills_from_background(tmp_path, cfg):
    """Missing prediction frames backfill from the bg canvas, else zeros
    (reference export_cityscapes_segmentation_results.py:131-166)."""
    import numpy as np

    from panoptic_forecasting_tpu.cli.export_segmentation import (
        backfill_missing,
    )
    from panoptic_forecasting_tpu.data.io import load_png, save_png

    cs = cfg["data"]["cityscapes_dir"]
    base = str(tmp_path / "export")
    # background canvas for exactly one gt frame
    gt_pngs = sorted(
        glob.glob(os.path.join(cs, "gtFine", "val", "*", "*_labelIds.png"))
    )
    assert len(gt_pngs) >= 2
    city = os.path.basename(os.path.dirname(gt_pngs[0]))
    bg_dir = str(tmp_path / "bg")
    canvas = np.full((16, 16), 10, np.uint8)  # sky trainId
    save_png(
        os.path.join(bg_dir, city, os.path.basename(gt_pngs[0])), canvas
    )
    cfg2 = {**cfg, "data": {**cfg["data"], "background_dir": bg_dir}}
    n = backfill_missing(base, "val", cfg2)
    assert n == len(gt_pngs)
    filled = load_png(
        os.path.join(base, city, os.path.basename(gt_pngs[0]))
    )
    assert (filled == 23).all()  # sky trainId 10 -> labelId 23
    other = load_png(
        os.path.join(
            base,
            os.path.basename(os.path.dirname(gt_pngs[1])),
            os.path.basename(gt_pngs[1]),
        )
    )
    # cfg uses no_convert -> canvas-less frames fill with 255 void
    # (reference :160-164; canvases always go through convert_labels)
    assert (other == 255).all()
