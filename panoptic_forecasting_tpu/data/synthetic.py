"""Synthetic micro-Cityscapes fixtures for tests and benchmarks.

The reference ships no test data (its artifacts come from GCS,
download_data.sh:9-21). These generators fabricate artifacts that are
format-compatible with every reader in this package: ``{split}_3d_info.pkl``
odometry tables, camera JSONs, disparity/segmentation PNG sequences,
MaskRCNN-style feature h5s, and bbox/depth instance tables — at reduced
resolution so the full pipeline runs in CI.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np


def make_odom_table(
    n_snippets: int = 6,
    n_frames: int = 30,
    seed: int = 0,
    cities=("synthcity",),
):
    """Pandas table matching ``{split}_3d_info.pkl``: columns city, seq,
    frame, odometry (n_frames, 5) float — [speed, yaw_rate, *unused]."""
    import pandas as pd

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_snippets):
        t = np.linspace(0, 1, n_frames)
        speed = 8.0 + 4.0 * np.sin(2 * np.pi * (t + rng.rand())) + rng.randn() * 0.5
        yaw = 0.1 * np.sin(2 * np.pi * (t * 2 + rng.rand())) + rng.randn() * 0.01
        odom = np.zeros((n_frames, 5), np.float32)
        odom[:, 0] = np.maximum(speed, 0.0)
        odom[:, 1] = yaw
        rows.append(
            {
                "city": cities[i % len(cities)],
                "seq": f"{i:06d}",
                "frame": 19,
                "odometry": odom,
            }
        )
    return pd.DataFrame(rows)


def write_odom_fixture(data_dir: str, splits=("train", "val"), seed: int = 0,
                       n_snippets: int = 6) -> None:
    os.makedirs(data_dir, exist_ok=True)
    for k, split in enumerate(splits):
        tbl = make_odom_table(n_snippets=n_snippets, seed=seed + k)
        tbl.to_pickle(os.path.join(data_dir, f"{split}_3d_info.pkl"))


def make_camera_json(height: int = 128, width: int = 256) -> Dict:
    """A Cityscapes-style camera scaled to a small image."""
    s = width / 2048.0
    return {
        "intrinsic": {
            "fx": 2262.52 * s,
            "fy": 2265.30 * s,
            "u0": 1096.98 * s,
            "v0": 513.137 * s,
        },
        "extrinsic": {
            "baseline": 0.209313,
            "pitch": 0.038,
            "roll": 0.0,
            "yaw": -0.0195,
            "x": 1.7,
            "y": 0.1,
            "z": 1.22,
        },
    }


def write_cityscapes_fixture(
    root: str,
    split: str = "val",
    n_snippets: int = 2,
    height: int = 64,
    width: int = 128,
    seed: int = 0,
) -> None:
    """Write a miniature Cityscapes directory tree + ``{split}_3d_info.pkl``.

    Produces everything PCTransformDataset reads: ``camera/``,
    ``timestamp_sequence/``, ``vehicle_sequence/``, ``disparity_sequence/``
    (uint16 PNGs in the official encoding), a ``seg/{split}`` directory of
    ``pred_mask_*`` labelId PNGs, and ``gtFine/{split}`` labelId +
    labelTrainId PNGs for the annotated frame.
    """
    from PIL import Image

    from .cityscapes import train_id_to_id_lut

    rng = np.random.RandomState(seed)
    cam = make_camera_json(height, width)
    fx = cam["intrinsic"]["fx"]
    baseline = cam["extrinsic"]["baseline"]
    lut = train_id_to_id_lut()
    city = "synthcity"
    rows = []
    for snip in range(n_snippets):
        seq = f"{snip:06d}"
        frame = 19
        segs, depths = make_scene_sequence(30, height, width, seed=seed + snip)
        speed = 8.0 + rng.rand()
        yaw = 0.02 * rng.randn()
        odom = np.zeros((30, 5), np.float32)
        odom[:, 0] = speed
        odom[:, 1] = yaw
        rows.append({"city": city, "seq": seq, "frame": frame, "odometry": odom})
        for ind in range(30):
            fr = frame - 19 + ind
            name = f"{city}_{seq}_{fr:06d}"
            cam_p = os.path.join(root, "camera", split, city)
            os.makedirs(cam_p, exist_ok=True)
            with open(os.path.join(cam_p, f"{name}_camera.json"), "w") as f:
                json.dump(cam, f)
            ts_p = os.path.join(root, "timestamp_sequence", split, city)
            os.makedirs(ts_p, exist_ok=True)
            with open(os.path.join(ts_p, f"{name}_timestamp.txt"), "w") as f:
                f.write(str(int(ind * 0.0589 * 1e9)))
            ve_p = os.path.join(root, "vehicle_sequence", split, city)
            os.makedirs(ve_p, exist_ok=True)
            with open(os.path.join(ve_p, f"{name}_vehicle.json"), "w") as f:
                json.dump({"speed": float(speed), "yawRate": float(yaw)}, f)
            # disparity: official encoding p = d*256 + 1 (0 = invalid)
            disp = baseline * fx / np.maximum(depths[ind], 0.5)
            png = (disp * 256 + 1).astype(np.uint16)
            png[depths[ind] <= 0] = 0
            di_p = os.path.join(root, "disparity_sequence", split, city)
            os.makedirs(di_p, exist_ok=True)
            Image.fromarray(png).save(os.path.join(di_p, f"{name}_disparity.png"))
            # predicted-seg input (labelId space)
            seg_id = lut[segs[ind]]
            se_p = os.path.join(root, "seg", split, city)
            os.makedirs(se_p, exist_ok=True)
            Image.fromarray(seg_id).save(
                os.path.join(se_p, f"pred_mask_{name}_leftImg8bit.png")
            )
            # RGB frames for the use_imgs reprojection mode
            sid = seg_id.astype(np.int32)
            rgb = np.stack([sid * 7 % 256, sid * 13 % 256,
                            sid * 29 % 256], axis=-1).astype(np.uint8)
            im_p = os.path.join(root, "leftImg8bit_sequence", split, city)
            os.makedirs(im_p, exist_ok=True)
            Image.fromarray(rgb).save(
                os.path.join(im_p, f"{name}_leftImg8bit.png")
            )
        # GT for the annotated frame
        gt_p = os.path.join(root, "gtFine", split, city)
        os.makedirs(gt_p, exist_ok=True)
        name = f"{city}_{seq}_{frame:06d}"
        Image.fromarray(lut[segs[19]]).save(
            os.path.join(gt_p, f"{name}_gtFine_labelIds.png")
        )
        Image.fromarray(segs[19].astype(np.uint8)).save(
            os.path.join(gt_p, f"{name}_gtFine_labelTrainIds.png")
        )
        # instanceIds: stuff scenes -> plain labelIds (valid panoptic GT
        # for the in-tree evaluator; no thing instances in the fixture)
        Image.fromarray(lut[segs[19]].astype(np.uint16)).save(
            os.path.join(gt_p, f"{name}_gtFine_instanceIds.png")
        )
    import pandas as pd

    pd.DataFrame(rows).to_pickle(os.path.join(root, f"{split}_3d_info.pkl"))


def write_bg_fixture(
    root: str,
    splits=("train", "val"),
    n_snippets: int = 2,
    height: int = 64,
    width: int = 128,
    seed: int = 0,
) -> dict:
    """BG-training artifact tree: 3 reprojected-seg dirs (ind0/1/2, trainId
    content under the reference's labelIds naming), fg-removed GT
    labelTrainIds, and a depth h5 keyed ``city/seq/frame06d/start_fr``.

    Returns the config 'data' fragment pointing at it.
    """
    import h5py
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    city = "synthcity"
    data_dirs = [os.path.join(root, f"pc_ind{i}") for i in range(3)]
    gt_dir = os.path.join(root, "gtFine_nofg")
    for split in splits:
        with h5py.File(os.path.join(root, f"depths_{split}.h5"), "a") as h5:
            for snip in range(n_snippets):
                seq = f"{snip:06d}"
                frame = 19
                segs, depths = make_scene_sequence(
                    30, height, width, seed=seed + snip + splits.index(split) * 100
                )
                name = f"{city}_{seq}_{frame:06d}"
                # GT: things (trainId >= 11) -> 255 (remove_fg_from_gt.py:15-33)
                gt = segs[19].copy()
                gt[gt >= 11] = 255
                os.makedirs(os.path.join(gt_dir, split, city), exist_ok=True)
                Image.fromarray(gt.astype(np.uint8)).save(
                    os.path.join(
                        gt_dir, split, city, f"{name}_gtFine_labelTrainIds.png"
                    )
                )
                # reprojected inputs: frames {4, 7, 10} stand in for the
                # mid-term reprojections of input inds 0/1/2
                dep_block = np.zeros((height, width, 3), np.uint16)
                for i, fr in enumerate([4, 7, 10]):
                    os.makedirs(
                        os.path.join(data_dirs[i], split, city), exist_ok=True
                    )
                    arr = segs[fr].copy()
                    arr[arr >= 11] = 255  # reprojections are fg-free
                    Image.fromarray(arr.astype(np.uint8)).save(
                        os.path.join(
                            data_dirs[i], split, city,
                            f"{name}_gtFine_labelIds.png",
                        )
                    )
                    dep_block[:, :, i] = (
                        np.clip(depths[fr] + 1.0, 0, 255) * 256
                    ).astype(np.uint16)
                h5.create_dataset(
                    f"{city}/{seq}/{frame:06d}/0", data=dep_block
                )
    return {
        "data_dir": data_dirs,
        "gt_dir": gt_dir,
        "depth_h5_path": os.path.join(root, "depths_%s.h5"),
        "cityscapes_dir": root,
    }


def write_fg_fixture(
    root: str,
    splits=("train", "val"),
    n_scenes: int = 3,
    max_instances: int = 4,
    seed: int = 0,
    feat_channels: int = 256,
    feat_hw: int = 14,
) -> dict:
    """FG artifact tree: instance/seq meta pkls, depth info pkls, feats h5,
    3d info pkl — all format-compatible with data/fg_data.py readers.

    Instances are moving boxes with smooth trajectories; features are
    low-rank random fields so the distillation loss has structure.
    Returns the config 'data' fragment.
    """
    import h5py
    import pandas as pd

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    city = "synthcity"
    for split in splits:
        inst_rows, scene_rows, inst_depth_rows, scene_depth_rows, d3_rows = (
            [], [], [], [], []
        )
        with h5py.File(os.path.join(root, f"{split}_feats.h5"), "w") as h5:
            for s in range(n_scenes):
                seq = f"{s:06d}"
                frame = 19
                n_inst = rng.randint(2, max_instances + 1)
                scene_bboxes, scene_masks, scene_finds, scene_depths = (
                    [], [], [], []
                )
                scene_tracks, scene_classes = [], []
                all_feats = []
                feat_counter = 0
                for k in range(n_inst):
                    cls = int(rng.choice([11, 13, 13, 14]))  # person/car/truck
                    cx = rng.rand() * 1500 + 200
                    cy = rng.rand() * 300 + 400
                    vx = rng.randn() * 15
                    vy = rng.randn() * 3
                    w = rng.rand() * 150 + 60
                    h = rng.rand() * 120 + 60
                    boxes = np.zeros((30, 4), np.float32)
                    mask = np.zeros(30, bool)
                    finds = np.full(30, -1, np.int64)
                    depth = np.full(30, -1.0, np.float32)
                    d0 = rng.rand() * 30 + 8
                    for t in range(30):
                        x = cx + vx * t
                        y = cy + vy * t
                        boxes[t] = [x - w / 2, y - h / 2, x + w / 2, y + h / 2]
                        visible = 0 < x < 2048 and rng.rand() > 0.1
                        mask[t] = visible
                        if visible:
                            depth[t] = max(d0 - 0.2 * t, 1.0)
                            finds[t] = feat_counter
                            feat_counter += 1
                    # low-rank features per instance, drifting over time
                    u = rng.randn(feat_hw, 1, 8) * 0.5
                    v = rng.randn(1, feat_hw, 8) * 0.5
                    base_feat = np.einsum("hxc,xwc->hwc", u, v)
                    for t in range(30):
                        if mask[t]:
                            f = np.zeros(
                                (feat_channels, feat_hw, feat_hw), np.float32
                            )
                            f[:8] = np.moveaxis(base_feat, -1, 0) * (1 + 0.02 * t)
                            all_feats.append(f)
                    scene_bboxes.append(boxes)
                    scene_masks.append(mask)
                    scene_finds.append(finds)
                    scene_depths.append(depth)
                    scene_tracks.append(1000 + k)
                    scene_classes.append(cls)
                    inst_rows.append(
                        {
                            "city": city, "seq": seq, "frame": frame,
                            "track_id": 1000 + k, "class": cls,
                            "bboxes": boxes, "feat_mask": mask,
                            "feat_ind": finds, "inst_ind": k,
                        }
                    )
                    inst_depth_rows.append({"depth": depth})
                h5.create_dataset(
                    f"{city}/{seq}/{frame}",
                    data=np.stack(all_feats) if all_feats else
                    np.zeros((1, feat_channels, feat_hw, feat_hw), np.float32),
                )
                scene_rows.append(
                    {
                        "city": city, "seq": seq, "frame": frame,
                        "track_id": np.asarray(scene_tracks),
                        "class": np.asarray(scene_classes),
                        "bboxes": np.stack(scene_bboxes),
                        "feat_mask": np.stack(scene_masks),
                        "feat_ind": np.stack(scene_finds),
                    }
                )
                scene_depth_rows.append({"depth": np.stack(scene_depths)})
                odom = np.zeros((30, 5), np.float32)
                odom[:, 0] = 8.0 + rng.rand()
                odom[:, 1] = 0.01 * rng.randn()
                odom[:, 2] = odom[:, 0] * 0.059
                d3_rows.append(
                    {
                        "city": city, "seq": seq, "frame": frame,
                        "odometry": odom,
                        "times": np.arange(30) * 0.0589,
                    }
                )
        pd.DataFrame(inst_rows).to_pickle(
            os.path.join(root, f"{split}_instance_meta.pkl")
        )
        pd.DataFrame(inst_depth_rows).to_pickle(
            os.path.join(root, f"{split}_depth_instance_info.pkl")
        )
        pd.DataFrame(scene_rows).to_pickle(
            os.path.join(root, f"{split}_seq_meta.pkl")
        )
        pd.DataFrame(scene_depth_rows).to_pickle(
            os.path.join(root, f"{split}_depth_seq_info.pkl")
        )
        pd.DataFrame(d3_rows).to_pickle(os.path.join(root, f"{split}_3d_info.pkl"))
    return {"data_dir": root, "depth_dir": root, "feats_dir": root,
            "info_3d_dir": root}


def make_scene_sequence(
    n_frames: int,
    height: int = 64,
    width: int = 128,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(T, H, W) int32 trainId maps + (T, H, W) float32 depth, a toy street:
    road at the bottom, buildings left/right, sky top, a moving car blob."""
    rng = np.random.RandomState(seed)
    segs = np.zeros((n_frames, height, width), np.int32)
    depths = np.zeros((n_frames, height, width), np.float32)
    horizon = height // 2
    for t in range(n_frames):
        seg = np.full((height, width), 10, np.int32)  # sky
        dep = np.full((height, width), 200.0, np.float32)
        # road: lower half, depth grows toward horizon
        for r in range(horizon, height):
            seg[r, :] = 0
            dep[r, :] = 1.5 * height / (r - horizon + 2)
        # buildings: left/right vertical bands above horizon
        bw = width // 6
        seg[:horizon, :bw] = 2
        dep[:horizon, :bw] = 12.0
        seg[:horizon, -bw:] = 2
        dep[:horizon, -bw:] = 15.0
        # a car (trainId 13) sliding right as frames advance
        cw, ch = width // 8, height // 8
        cx = width // 3 + t * 2
        cy = horizon + height // 8
        seg[cy : cy + ch, cx : cx + cw] = 13
        dep[cy : cy + ch, cx : cx + cw] = 9.0 - 0.2 * t
        segs[t] = seg
        depths[t] = dep
    return segs, depths
