"""Panoptic / instance export CLIs: file protocol over a stubbed predictor.

The fusion math itself is covered by tests/test_fg_slice.py; these tests
pin the on-disk protocol (PNG encoding, json annotations, manifests,
backfill) without a second FG compile.
"""

import json
import os

import numpy as np
import pytest

from panoptic_forecasting_tpu.cli import export_instances, export_panoptic
from panoptic_forecasting_tpu.core import build_dataset, build_model
from panoptic_forecasting_tpu.data.io import load_png
from panoptic_forecasting_tpu.data.synthetic import write_fg_fixture
from panoptic_forecasting_tpu.eval import fusion, pq


@pytest.fixture(scope="module")
def scene_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pan"))
    # max_instances > pad_multiple so the two scenes land in DIFFERENT
    # instance buckets (8 vs 4 at seed 0) — with batch_size 2 below, the
    # export CLIs run through fg_scene_collate's batch-max re-padding.
    write_fg_fixture(root, splits=("val",), n_scenes=2, max_instances=10)
    cfg = {
        "task": "fg",
        "seed": 0,
        "working_dir": root + "/run",
        "data": {
            "dataset_type": "fg_scene",
            "data_splits": ["val"],
            "data_dir": root,
            "depth_dir": root,
            "feats_dir": root,
            "info_3d_dir": root,
            "use_3d_info": True,
            "max_depth": 200,
            "instance_pad_multiple": 4,
        },
        "model": {
            "rnn_hidden": 32,
            "use_depth_inp": True,
            "use_odometry": True,
            "use_depth_sorting": True,
            "mask_head": {},
        },
        "training": {"batch_size": 2},
    }
    os.makedirs(cfg["working_dir"], exist_ok=True)
    data = build_dataset(cfg, test=True)
    ds = data.datasets["val"]
    buckets = {ds[i]["inputs"]["valid"].shape[0] for i in range(len(ds))}
    assert len(buckets) > 1, "fixture must span instance buckets"
    model = build_model(cfg, data.card)
    return cfg, data, model


def _stub_panoptic(model, params, batch):
    """Deterministic fused scenes: one car strip + road background."""
    s = len(np.asarray(batch["inputs"]["classes"]))
    segs, ids = [], []
    for b in range(s):
        seg = np.full((fusion.IMG_H, fusion.IMG_W), 255, np.int64)
        seg[:200] = 10              # sky (trainId)
        seg[200:400] = 0            # road (trainId)
        seg[400:500, :300] = 13 * 1000 + 0  # one car instance
        segs.append(seg)
        ids.append(np.array([13000, 0, 0, 0]))
    return {"seg": np.stack(segs), "ids": ids, "bbox": None,
            "depths": None, "masks": None}


def _stub_instances(model, params, batch):
    s = len(np.asarray(batch["inputs"]["classes"]))
    scenes = []
    for b in range(s):
        mask = np.zeros((fusion.IMG_H, fusion.IMG_W), bool)
        mask[100:200, 100:300] = True
        scenes.append([
            {"mask": mask, "prob": mask.astype(np.float32),
             "class_train_id": 13, "bbox_ulbr": np.zeros(4, np.float32),
             "depth": 5.0, "score": 0.9},
        ])
    return {"instances": scenes}


def test_export_panoptic_protocol(scene_setup, monkeypatch):
    cfg, data, model = scene_setup
    monkeypatch.setattr(fusion, "predict_panoptic", _stub_panoptic)
    result_dir = export_panoptic.export_split(model, None, data, "val", cfg)

    name = "exported_panoptics_val"
    seg_dir = os.path.join(result_dir, name)
    pngs = sorted(os.listdir(seg_dir))
    assert len(pngs) == 2
    with open(os.path.join(result_dir, f"{name}.json")) as f:
        anns = json.load(f)["annotations"]
    assert len(anns) == 2

    seg = pq.decode_panoptic_png(load_png(os.path.join(seg_dir, pngs[0])))
    vals = set(np.unique(seg).tolist())
    # trainId space relabeled: sky 10 -> 23, road 0 -> 7, car 13 -> 26xxx,
    # void 255 -> 0
    assert vals == {0, 23, 7, 26 * 1000}
    info = {s["id"]: s for s in anns[0]["segments_info"]}
    assert info[26 * 1000]["category_id"] == 26
    assert set(info) == {23, 7, 26 * 1000}

    # self-eval through the full folder protocol must be perfect
    jp = os.path.join(result_dir, f"{name}.json")
    res = pq.pq_compute_folders(jp, seg_dir, jp, seg_dir)
    assert res["All"]["pq"] == pytest.approx(1.0)
    assert res["per_class"]["car"]["pq"] == pytest.approx(1.0)


def test_export_instances_protocol(scene_setup, monkeypatch):
    cfg, data, model = scene_setup
    monkeypatch.setattr(fusion, "predict_instances", _stub_instances)
    base = export_instances.export_split(model, None, data, "val", cfg)
    txts = [f for f in os.listdir(base) if f.endswith(".txt")]
    pngs = [f for f in os.listdir(base) if f.endswith(".png")]
    assert len(txts) == 2 and len(pngs) == 2
    line = open(os.path.join(base, txts[0])).read().split()
    assert line[1] == "26"  # car labelId
    assert float(line[2]) == pytest.approx(0.9)
    mask = load_png(os.path.join(base, pngs[0]))
    assert set(np.unique(mask).tolist()) <= {0, 255}


def test_viz_panoptic_overlay(tmp_path):
    from panoptic_forecasting_tpu.cli import viz_panoptic
    from panoptic_forecasting_tpu.eval.panoptic_protocol import (
        segments_info_from_labelid_seg, write_panoptic_png)

    seg = np.zeros((32, 64), np.int64)
    seg[:16] = 7                 # road
    seg[16:, :30] = 26 * 1000    # car instance
    seg[16:, 30:] = 26 * 1000 + 1
    info = segments_info_from_labelid_seg(seg)
    label_dir = tmp_path / "labels"
    os.makedirs(label_dir)
    write_panoptic_png(str(label_dir / "c_000000_000019_pred_panoptic.png"),
                       seg)
    ann = {"annotations": [{"image_id": "c_000000_000019",
                            "file_name": "c_000000_000019_pred_panoptic.png",
                            "segments_info": info}]}
    ann_path = tmp_path / "ann.json"
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    out_dir = tmp_path / "viz"
    viz_panoptic.main(["--annotations", str(ann_path),
                       "--label_dir", str(label_dir),
                       "--output_dir", str(out_dir)])
    out = load_png(str(out_dir / "c_000000_000019_viz.png"))
    assert out.shape == (32, 64, 3)
    # road colored (128, 64, 128); car region (0, 0, 142)
    assert tuple(out[2, 2]) == (128, 64, 128)
    assert tuple(out[20, 5]) == (0, 0, 142)
    # boundary between the two car instances is inverted color
    assert tuple(out[20, 30]) != (0, 0, 142)


def test_viz_panoptic_mask_blanking(tmp_path):
    """--mask_dir blanks unlabeled/ego/rectification pixels (labelIds
    0-2) found via the 30-frame snippet search (reference
    viz_cityscapes_panoptic.py:43-59,166-171)."""
    from panoptic_forecasting_tpu.cli import viz_panoptic
    from panoptic_forecasting_tpu.data.io import save_png
    from panoptic_forecasting_tpu.eval.panoptic_protocol import (
        segments_info_from_labelid_seg, write_panoptic_png)

    seg = np.full((32, 64), 7, np.int64)  # all road
    info = segments_info_from_labelid_seg(seg)
    label_dir = tmp_path / "labels"
    os.makedirs(label_dir)
    write_panoptic_png(str(label_dir / "c_000000_000019_pred_panoptic.png"),
                       seg)
    ann_path = tmp_path / "ann.json"
    with open(ann_path, "w") as f:
        json.dump({"annotations": [
            {"image_id": "c_000000_000019",
             "file_name": "c_000000_000019_pred_panoptic.png",
             "segments_info": info}]}, f)

    # gt labelIds at the snippet's annotated frame (19 back): ego-vehicle
    # (id 1) bottom rows, road elsewhere.
    gt_ids = np.full((32, 64), 7, np.uint8)
    gt_ids[-8:] = 1
    save_png(str(tmp_path / "gtFine" / "c" /
                 "c_000000_000000_gtFine_labelIds.png"), gt_ids)

    out_dir = tmp_path / "viz"
    viz_panoptic.main(["--annotations", str(ann_path),
                       "--label_dir", str(label_dir),
                       "--output_dir", str(out_dir),
                       "--mask_dir", str(tmp_path / "gtFine")])
    out = load_png(str(out_dir / "c_000000_000019_viz.png"))
    assert tuple(out[2, 2]) == (128, 64, 128)   # road survives
    assert tuple(out[-2, 2]) == (0, 0, 0)       # ego band blanked
