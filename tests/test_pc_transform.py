"""PC-transform slice: dataset fixture → reprojection → splat canvas."""

import numpy as np
import pytest

from panoptic_forecasting_tpu.core import build_dataset, build_model
from panoptic_forecasting_tpu.data.loader import Loader, default_collate
from panoptic_forecasting_tpu.data.synthetic import write_cityscapes_fixture


@pytest.fixture(scope="module")
def pc_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cs"))
    write_cityscapes_fixture(root, split="val", n_snippets=2, height=64, width=128)
    return {
        "task": "pc_transform",
        "seed": 0,
        "working_dir": root + "/run",
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


def test_dataset_sample_shapes(pc_cfg):
    data = build_dataset(pc_cfg, test=True)
    ds = data.datasets["val"]
    assert len(ds) == 2  # one target (19) per snippet
    s = ds[0]
    assert s["inputs"]["seg"].shape == (3, 64, 128)
    assert s["inputs"]["depth"].shape == (3, 64, 128)
    assert s["inputs"]["target_T"].shape == (3, 4, 4)
    assert s["meta"]["target_frame"] == 19
    # mid-term: inputs are frames {4, 7, 10} → last input gap 9 from target
    _, input_inds, target = ds.items[0]
    assert list(input_inds) == [4, 7, 10] and target == 19


def test_cumulative_transform_magnitude(pc_cfg):
    """Driving ~8 m/s for 9 frames (~0.53 s) moves ~4.2 m; the cumulative
    transform for the last input frame must translate about that much."""
    data = build_dataset(pc_cfg, test=True)
    s = data.datasets["val"][0]
    T_last = s["inputs"]["target_T"][2]  # frame 10 -> 19
    dist = np.linalg.norm(T_last[:3, 3])
    assert 3.0 < dist < 6.0
    T_first = s["inputs"]["target_T"][0]  # frame 4 -> 19, ~15 frames
    assert np.linalg.norm(T_first[:3, 3]) > dist


def test_identity_transform_roundtrips_seg(pc_cfg):
    """With target_T = I the reprojection must reproduce the input frame
    exactly wherever depth is valid (integer grid → exact splat)."""
    import jax.numpy as jnp

    data = build_dataset(pc_cfg, test=True)
    model = build_model(pc_cfg, data.card)
    s = data.datasets["val"][0]
    batch = default_collate([s])
    batch["inputs"]["target_T"] = np.broadcast_to(
        np.eye(4, dtype=np.float32), (1, 3, 4, 4)
    ).copy()
    # use only the last input frame so nearer frames can't occlude
    model.only_this_ind = 2
    preds = model.predict({}, batch)
    seg_out = np.asarray(preds["seg"][0])
    seg_in = batch["inputs"]["seg"][0, 2]
    valid = batch["inputs"]["depth_mask"][0, 2]
    # f32 rounding can push a coordinate across an integer boundary and
    # splat into the neighboring pixel, so region borders may leak a little
    # (the reference has the same property with different rounding).
    assert (seg_out[valid] == seg_in[valid]).mean() > 0.99
    d_out = np.asarray(preds["depth"][0])
    d_in = batch["inputs"]["depth"][0, 2]
    ok = valid & (d_out > 0)
    rel = np.abs(d_out[ok] - d_in[ok]) / d_in[ok]
    assert np.median(rel) < 1e-4  # most pixels keep their own depth
    # The 4-neighbor splat means a pixel may legitimately carry any
    # 3x3-neighbor's depth (when f32 rounding crosses an integer boundary);
    # every output depth must match SOME neighboring input depth.
    h, w = d_in.shape
    pad = np.pad(d_in, 1, constant_values=1e9)
    best = np.full_like(d_in, np.inf)
    for dv in range(3):
        for du in range(3):
            n = pad[dv : dv + h, du : du + w]
            best = np.minimum(best, np.abs(d_out - n) / np.maximum(n, 1e-6))
    assert (best[ok] < 1e-3).mean() > 0.999


def test_forward_motion_shifts_content(pc_cfg):
    """Real ego-motion: reprojected canvas must differ from the input and
    keep plausible coverage."""
    data = build_dataset(pc_cfg, test=True)
    model = build_model(pc_cfg, data.card)
    batch = default_collate([data.datasets["val"][0]])
    preds = model.predict({}, batch)
    seg = np.asarray(preds["seg"][0])
    depth = np.asarray(preds["depth"][0])
    cover = (depth > 0).mean()
    assert cover > 0.5
    # road (id 7) and sky (23) must both survive the reprojection
    assert (seg == 7).any() and (seg == 23).any()


def test_moving_object_removal(pc_cfg):
    cfg = dict(pc_cfg)
    cfg["data"] = dict(cfg["data"], no_moving_objects=True)
    data = build_dataset(cfg, test=True)
    s = data.datasets["val"][0]
    seg = s["inputs"]["seg"]
    mask = s["inputs"]["depth_mask"]
    # car pixels (labelId 26) must be masked out
    assert not mask[seg == 26].any()
    assert mask[seg == 7].any()


def test_use_imgs_rgb_reprojection(tmp_path):
    """RGB payload mode (pc_transform_dataset.py:237-242 + is_img model):
    reproject leftImg8bit frames instead of label maps."""
    from panoptic_forecasting_tpu.core import build_dataset, build_model
    from panoptic_forecasting_tpu.data.synthetic import (
        write_cityscapes_fixture,
    )

    root = str(tmp_path / "cs")
    write_cityscapes_fixture(root, split="val", n_snippets=1,
                             height=64, width=128)
    cfg = {
        "task": "pc_transform",
        "seed": 0,
        "data": {"dataset_type": "pc_transform", "data_splits": ["val"],
                 "data_dir": root, "cityscapes_dir": root,
                 "seg_dir": root + "/seg", "gap_len": 9,
                 "use_imgs": True, "no_moving_objects": True},
        "model": {"is_img": True},
        "training": {"batch_size": 1},
    }
    data = build_dataset(cfg, test=True)
    model = build_model(cfg, data.card)
    sample = data.datasets["val"][0]
    assert sample["inputs"]["seg"].shape == (3, 64, 128, 3)  # RGB payload
    from panoptic_forecasting_tpu.data.loader import default_collate

    batch = default_collate([sample])
    preds = model.predict(None, {"inputs": batch["inputs"]})
    seg = np.asarray(preds["seg"])
    assert seg.shape == (1, 64, 128, 3)
    assert seg.max() > 0  # some RGB content landed


def test_check_output_dir_skips_done_frames(pc_cfg, tmp_path):
    """Resumable exports: samples whose output PNG exists are dropped at
    index-build time (pc_transform_dataset.py:95-100)."""
    import copy
    import os

    from panoptic_forecasting_tpu.data.io import save_png

    base = build_dataset(pc_cfg, test=True).datasets["val"]
    assert len(base) > 0
    idx0, _, target0 = base.items[0]
    rec = base.data.iloc[idx0]
    done_dir = str(tmp_path / "done")
    fr = int(rec["frame"]) - 19 + int(target0)
    out = os.path.join(
        done_dir, "val", rec["city"],
        f"{rec['city']}_{rec['seq']}_{fr:06d}_gtFine_labelIds.png",
    )
    save_png(out, np.zeros((4, 4), np.uint8))

    cfg = copy.deepcopy(pc_cfg)
    cfg["data"]["check_output_dir"] = done_dir
    pruned = build_dataset(cfg, test=True).datasets["val"]
    assert len(pruned) == len(base) - 1


def test_fg_cascade_and_monodepth_select_alternate_pkls(tmp_path):
    """use_cascade_depths / use_monodepth swap the depth pkl stems
    (fg_instance_dataset.py:58-62, fg_scene_dataset.py:60-66)."""
    import os
    import shutil

    from panoptic_forecasting_tpu.data.synthetic import write_fg_fixture

    root = str(tmp_path)
    write_fg_fixture(root, splits=("val",), n_scenes=1, max_instances=2)
    for src, dst in (
        ("val_depth_instance_info.pkl", "val_cascadedepth_instance_info.pkl"),
        ("val_depth_seq_info.pkl", "val_monodepth_seq_info.pkl"),
    ):
        shutil.copy(os.path.join(root, src), os.path.join(root, dst))
        os.remove(os.path.join(root, src))

    base = {
        "data_splits": ["val"], "data_dir": root, "depth_dir": root,
        "feats_dir": root, "info_3d_dir": root, "use_3d_info": True,
        "max_depth": 200,
    }
    inst = build_dataset(
        {"task": "fg",
         "data": dict(base, use_cascade_depths=True),
         "training": {"batch_size": 1}},
        test=True,
    ).datasets["val"]
    assert len(inst) > 0 and inst[0]["inputs"]["depths"].shape[-1] == 2
    scene = build_dataset(
        {"task": "fg",
         "data": dict(base, dataset_type="fg_scene", use_monodepth=True),
         "training": {"batch_size": 1}},
        test=True,
    ).datasets["val"]
    assert len(scene) > 0 and scene[0]["inputs"]["valid"].ndim == 1
