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
