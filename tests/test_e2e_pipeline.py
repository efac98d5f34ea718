"""Full pipeline E2E smoke: odom → pc reprojection → bg → fg → panoptic → PQ.

Drives the REAL CLI entry points over a micro-Cityscapes fixture (64×128,
synthetic), mirroring the reference's shell-script chain
(scripts/{odom,bg,fg}/*.sh) end to end, including the bg-data preparation
step the reference only shipped as downloaded artifacts.
"""

import glob
import json
import os

import numpy as np
import pytest
import yaml

from panoptic_forecasting_tpu.data.synthetic import (
    write_cityscapes_fixture,
    write_fg_fixture,
)

H, W = 64, 128


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    cs = os.path.join(root, "cityscapes")
    for split in ("train", "val"):
        write_cityscapes_fixture(cs, split=split, n_snippets=2,
                                 height=H, width=W)
    fg = os.path.join(root, "fg")
    write_fg_fixture(fg, splits=("train", "val"), n_scenes=2,
                     max_instances=2, feat_channels=32, feat_hw=7)
    return {"root": root, "cs": cs, "fg": fg}


def _write_cfg(path, cfg):
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.mark.slow
def test_full_chain(world):
    root, cs = world["root"], world["cs"]
    from panoptic_forecasting_tpu.cli import (
        evaluate_panoptic,
        export_odom,
        export_panoptic,
        export_segmentation,
        prepare_bg_data,
        prepare_gt_nofg,
        train,
    )

    # ---- 1. odometry: train 1 epoch + export val predictions -------------
    odom_dir = os.path.join(root, "runs", "odom")
    os.makedirs(odom_dir, exist_ok=True)
    odom_cfg = _write_cfg(os.path.join(root, "odom.yaml"), {
        "task": "odom",
        "data": {"dataset_type": "odom", "data_splits": ["train", "val"],
                 "data_dir": cs, "input_len": 9, "output_len": 9},
        "model": {"predict_type": "direct", "normalize_input": True,
                  "use_normalized_loss": True, "rnn_hidden": 16,
                  "loss_fn": "mse"},
        "training": {"batch_size": 4, "steps_per_epoch": 2, "num_epochs": 1,
                     "lr": 5e-4, "use_adam": True},
    })
    train.main(["--working_dir", odom_dir, "--config_file", odom_cfg])
    export_odom.main(["--working_dir", odom_dir, "--config_file", odom_cfg])
    for split in ("train", "val"):
        assert os.path.exists(
            os.path.join(odom_dir, f"odometry_{split}.h5")
        )

    # ---- 2. bg training data from pc reprojections (predicted odom) ------
    pc_cfg = _write_cfg(os.path.join(root, "pc.yaml"), {
        "task": "pc_transform",
        "data": {"dataset_type": "pc_transform",
                 "data_splits": ["train", "val"],
                 "data_dir": cs, "cityscapes_dir": cs,
                 "seg_dir": cs + "/seg", "gap_len": 9,
                 "odom_pred_dir": odom_dir},
        "model": {},
        "training": {"batch_size": 1},
    })
    bg_data = os.path.join(root, "bg_data")
    prepare_bg_data.main(["--working_dir", os.path.join(root, "runs", "pc"),
                          "--config_file", pc_cfg,
                          "--set", "bg_out", bg_data])
    ind_dirs = [
        os.path.join(bg_data, f"point_cloud_static_ind{i}_all",
                     "exported_predictions")
        for i in range(3)
    ]
    for d in ind_dirs:
        assert glob.glob(os.path.join(d, "val", "*", "*.png")), d

    # ---- 3. gtFine_nofg + bg model: 1 train step + canvas export ---------
    prepare_gt_nofg.main(["--cityscapes_dir", cs, "--splits", "train",
                          "val"])
    assert glob.glob(os.path.join(cs, "gtFine_nofg", "val", "*", "*.png"))

    bg_dir = os.path.join(root, "runs", "bg")
    os.makedirs(bg_dir, exist_ok=True)
    bg_cfg = _write_cfg(os.path.join(root, "bg.yaml"), {
        "task": "bg",
        "data": {"data_splits": ["train", "val"], "data_dir": ind_dirs,
                 "data_inp_size": 3, "gap_len": [9],
                 "cityscapes_dir": cs,
                 "gt_dir": os.path.join(cs, "gtFine_nofg"),
                 "depth_h5_path": os.path.join(
                     bg_data, "depths_decompressed_%s.h5"),
                 "use_depths": True, "load_depths": True,
                 "min_depth": 0.1, "max_depth": 200,
                 "only_background": True, "no_resize_crop": True},
        "model": {"num_inputs": 3, "use_depth_inps": True,
                  "convert2onehot": True},
        "training": {"batch_size": 1, "steps_per_epoch": 1, "num_epochs": 1,
                     "lr": 2e-3, "mom": 0.9, "wd": 1e-4},
    })
    train.main(["--working_dir", bg_dir, "--config_file", bg_cfg])
    export_segmentation.main(["--working_dir", bg_dir,
                              "--config_file", bg_cfg,
                              "--set", "data.data_splits", "[val]",
                              "--set", "no_convert", "true",
                              "--set", "export_name", "bg_export"])
    canvas_root = os.path.join(bg_dir, "bg_export")
    canvases = glob.glob(os.path.join(canvas_root, "val", "*", "*.png"))
    assert canvases

    # ---- 4. fg panoptic export over the bg canvases ----------------------
    fg_dir = os.path.join(root, "runs", "fg")
    os.makedirs(fg_dir, exist_ok=True)
    fgroot = world["fg"]
    fg_cfg = _write_cfg(os.path.join(root, "fg.yaml"), {
        "task": "fg",
        "data": {"dataset_type": "fg_scene", "data_splits": ["val"],
                 "data_dir": fgroot, "depth_dir": fgroot,
                 "feats_dir": fgroot, "info_3d_dir": fgroot,
                 "use_3d_info": True, "max_depth": 200,
                 "instance_pad_multiple": 4,
                 "background_dir": canvas_root,
                 "cityscapes_dir": cs},
        "model": {"rnn_hidden": 16, "mask_feat_channels": 32,
                  "mask_feat_hw": 7, "mask_head": {"conv_dim": 32},
                  "use_depth_inp": True, "use_odometry": True,
                  "use_depth_sorting": True},
        "training": {"batch_size": 1},
    })
    export_panoptic.main(["--working_dir", fg_dir, "--config_file", fg_cfg])
    name = "exported_panoptics_val"
    pred_json = os.path.join(fg_dir, name, f"{name}.json")
    pred_dir = os.path.join(fg_dir, name, name)
    assert os.path.exists(pred_json)
    with open(pred_json) as f:
        anns = json.load(f)["annotations"]
    # 2 fg fixture scenes + backfill for the 2 cityscapes-fixture gt frames
    assert len(anns) >= 2

    # ---- 5. PQ against the fixture GT -------------------------------------
    results = evaluate_panoptic.main([
        "--pred_json", pred_json, "--pred_dir", pred_dir,
        "--cityscapes_dir", cs, "--split", "val",
        "--results_json", os.path.join(root, "pq.json"),
        "--gt_out", os.path.join(root, "gt_panoptic"),
    ])
    assert np.isfinite(results["All"]["pq"])
    assert results["All"]["n"] >= 1

    # ---- 5b. instance-mask export + in-tree AP scoring --------------------
    # Reference chain: export_cityscapes_instance_results.py then the
    # external cityscapesscripts instance-level eval; here both run in-tree.
    # The fixture GT has no thing instances, so every class is have-gt-false
    # (nan per class, allAp 0) — the binding under test is that the export
    # layout and the scorer's file protocol agree end to end.
    from panoptic_forecasting_tpu.cli import evaluate_instances, \
        export_instances
    export_instances.main(["--working_dir", fg_dir, "--config_file", fg_cfg])
    inst_dir = os.path.join(fg_dir, "exported_instances_val")
    manifests = glob.glob(os.path.join(inst_dir, "*.txt"))
    assert manifests, "instance export wrote no manifests"
    ap = evaluate_instances.main([
        "--pred_dir", inst_dir, "--cityscapes_dir", cs, "--split", "val",
        "--results_json", os.path.join(root, "ap.json"),
    ])
    assert ap["allAp"] == 0.0
    assert all(np.isnan(v["ap"]) for v in ap["per_class"].values())
    assert os.path.exists(os.path.join(root, "ap.json"))

    # ---- 6. fused serving CLI == staged export ----------------------------
    # The single-jit forecast CLI (cli/forecast_fused.py) fed the same raw
    # inputs and the same trained weights must reproduce the staged
    # per-stage export chain's panoptic PNGs. The staged chain round-trips
    # the reprojection through PNG/h5 interfaces ((depth+1)*256 uint16
    # quantization, prepare_bg_data), and fused/staged are different XLA
    # programs (fp-level logit ties may flip an argmax) — so stuff pixels
    # get a small mismatch allowance; segment id sets must agree exactly.
    from panoptic_forecasting_tpu.cli import forecast_fused
    from panoptic_forecasting_tpu.data.io import load_png
    from panoptic_forecasting_tpu.eval.pq import decode_panoptic_png

    forecast_fused.main([
        "--working_dir", fg_dir, "--config_file", fg_cfg,
        "--set", "fused.bg_config", bg_cfg,
        "--set", "fused.bg_dir", bg_dir,
        "--set", "fused.pc_config", pc_cfg,
        "--set", "fused.height", str(H),
        "--set", "fused.width", str(W),
    ])
    fused_dir = os.path.join(
        fg_dir, "fused_panoptics_val", "fused_panoptics_val"
    )
    fused_pngs = sorted(glob.glob(os.path.join(fused_dir, "*.png")))
    assert len(fused_pngs) >= 2, "fused CLI exported no frames"
    for path in fused_pngs:
        staged_path = os.path.join(pred_dir, os.path.basename(path))
        assert os.path.exists(staged_path), staged_path
        got = decode_panoptic_png(load_png(path))
        want = decode_panoptic_png(load_png(staged_path))
        assert set(np.unique(got)) == set(np.unique(want)), path
        mismatch = float((got != want).mean())
        assert mismatch < 0.02, f"{path}: {mismatch:.2%} pixels differ"
    fused_json = os.path.join(
        fg_dir, "fused_panoptics_val", "fused_panoptics_val.json"
    )
    with open(fused_json) as f:
        assert len(json.load(f)["annotations"]) == len(fused_pngs)

    # The fused export must score through the same PQ protocol as the
    # staged one (incl. the backfill of gt frames the fused loader
    # skipped — without it pq_compute_folders raises on the first
    # un-forecast frame, scripts/fg/run_fused_eval_panoptic.sh).
    fused_results = evaluate_panoptic.main([
        "--pred_json", fused_json, "--pred_dir", fused_dir,
        "--cityscapes_dir", cs, "--split", "val",
        "--results_json", os.path.join(root, "pq_fused.json"),
        # shared gt_out: the fused eval must REUSE the staged eval's
        # GT conversion (convert_gt_split idempotence)
        "--gt_out", os.path.join(root, "gt_panoptic"),
    ])
    assert np.isfinite(fused_results["All"]["pq"])
    assert fused_results["All"]["n"] >= 1
