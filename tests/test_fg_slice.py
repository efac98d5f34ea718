"""FG forecaster slice: datasets, coupled rollout, losses, fusion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from panoptic_forecasting_tpu.core import build_dataset, build_model
from panoptic_forecasting_tpu.data.loader import default_collate
from panoptic_forecasting_tpu.data.synthetic import write_fg_fixture
from panoptic_forecasting_tpu.models.fg import expand_traj_mask


def _fg_model_cfg():
    # Tiny ROI-feature geometry (32ch 7x7 vs production 256ch 14x14): same
    # structure, ~50x less ConvLSTM compute on the 1-core CI host. The
    # production geometry is exercised by __graft_entry__.entry().
    return {
        "mask_feat_channels": 32,
        "mask_feat_hw": 7,
        "mask_head": {"conv_dim": 32},
        "instance_feat_channels": 8,
        "instance_feat_hidden": 32,
        "loss_type": "smoothl1",
        "mask_distill_coef": 1.0,
        "num_convlstm_layers": 2,
        "num_traj_out_layers": 2,
        "rnn_hidden": 64,
        "rnn_type": "gru",
        "traj_coef": 0.1,
        "traj_feat_channels": 16,
        "use_depth_inp": True,
        "use_odometry": True,
        "use_depth_sorting": True,
    }


@pytest.fixture(scope="module")
def fg_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fg"))
    write_fg_fixture(root, n_scenes=3, max_instances=3, feat_channels=32,
                     feat_hw=7)
    return root


@pytest.fixture(scope="module")
def fg_cfg(fg_root):
    return {
        "task": "fg",
        "seed": 0,
        "working_dir": fg_root + "/run",
        "data": {
            "dataset_type": "fg_instance",
            "data_splits": ["train", "val"],
            "data_dir": fg_root,
            "depth_dir": fg_root,
            "feats_dir": fg_root,
            "info_3d_dir": fg_root,
            "use_3d_info": True,
            "max_depth": 200,
            "require_most_recent": True,
            "filter_car_gap": 20,
            "filter_car_gap_borderdist": 250,
            "add_car_offscreen_loc": True,
            "input_len": 3,
        },
        "model": _fg_model_cfg(),
        "training": {
            "batch_size": 4,
            "steps_per_epoch": 4,
            "num_epochs": 2,
            "lr": 1e-3,
            "use_adam": True,
            "clip_grad_norm": 5.0,
        },
    }


def test_expand_traj_mask():
    m = jnp.asarray(np.array([[1, 0, 1, 1]], np.float32))
    out = expand_traj_mask(m)
    assert out.shape == (1, 4, 8)
    # vel valid only when both adjacent frames valid; t=0 never
    np.testing.assert_array_equal(
        np.asarray(out[0, :, 4]), [0, 0, 0, 1]
    )
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]), [1, 0, 1, 1])


def test_instance_dataset_sample(fg_cfg):
    data = build_dataset(fg_cfg)
    assert "traj" in data.card.stats and "odom" in data.card.stats
    assert data.card.stats["traj"]["mean"].shape == (8,)
    ds = data.datasets["train"]
    assert len(ds) > 0
    s = ds[0]
    assert s["inputs"]["trajectories"].shape == (3, 8)
    assert s["inputs"]["feats"].shape == (3, 32, 7, 7)
    assert s["inputs"]["odometry"].shape == (6, 5)
    assert s["labels"]["trajectories"].shape == (3, 8)
    assert s["labels"]["feats"].shape == (3, 32, 7, 7)
    assert s["inputs"]["depths"].shape == (3, 2)
    assert 0 <= int(s["inputs"]["classes"]) <= 7


def test_fg_forward_shapes_and_loss(fg_cfg):
    data = build_dataset(fg_cfg)
    model = build_model(fg_cfg, data.card)
    loader = data.loader("train", fg_cfg)
    batch = next(iter(loader))
    variables = model.init(jax.random.PRNGKey(0), batch)
    from panoptic_forecasting_tpu.models.base import split_variables

    params, state = split_variables(variables)
    loss, metrics, _ = model.loss(params, state, batch, train=True)
    assert np.isfinite(float(loss))
    assert metrics["loss"].shape == (4,)
    for k in ("traj_2d_loss", "center_pixel_l2", "center_pixel_fde",
              "size_pixel_l1", "depth_l2", "mask_distill_loss"):
        assert k in metrics, k
    preds = model.forward(
        variables,
        {**batch["inputs"], "output_inds": batch["labels"]["output_inds"]},
        3,
    )
    assert preds["unnormalized_trajectory"].shape == (4, 4, 10)
    assert preds["mask_feats"].shape == (4, 4, 7, 7, 32)
    assert preds["masks"].shape == (4, 14, 14)


def test_fg_training_single_step(fg_cfg):
    """One optimizer step + val through the real trainer.

    CPU-only caveat: AFTER the first update, FG backward passes hit x86
    subnormal-float stalls (tiny cotangents through saturated ConvLSTM
    gates — ~250 s/step on this host; TPUs flush subnormals in hardware,
    so real training is unaffected). The multi-step loss-decrease check
    therefore runs on accelerator benchmarks, not in CPU CI.
    """
    from panoptic_forecasting_tpu.train.loop import train
    import os

    data = build_dataset(fg_cfg)
    model = build_model(fg_cfg, data.card)
    cfg = dict(fg_cfg)
    cfg["training"] = dict(cfg["training"], steps_per_epoch=1, num_epochs=1)
    os.makedirs(cfg["working_dir"], exist_ok=True)
    result = train(model, data, cfg)
    assert np.isfinite(result["history"][0]["train"]["loss"])
    assert np.isfinite(result["best_val_result"])
    assert os.path.isdir(os.path.join(cfg["working_dir"], "best_model"))


@pytest.fixture(scope="module")
def fg_scene_cfg(fg_root):
    cfg = {
        "task": "fg",
        "seed": 0,
        "working_dir": fg_root + "/scene_run",
        "data": {
            "dataset_type": "fg_scene",
            "data_splits": ["val"],
            "data_dir": fg_root,
            "depth_dir": fg_root,
            "feats_dir": fg_root,
            "info_3d_dir": fg_root,
            "use_3d_info": True,
            "max_depth": 200,
            "require_most_recent": True,
            "instance_pad_multiple": 4,
        },
        "model": _fg_model_cfg(),
        "training": {"batch_size": 2},
    }
    return cfg


def test_scene_dataset_padding(fg_scene_cfg):
    data = build_dataset(fg_scene_cfg, test=True)
    ds = data.datasets["val"]
    s = ds[0]
    n_pad = s["inputs"]["valid"].shape[0]
    assert n_pad % 4 == 0
    assert s["inputs"]["trajectories"].shape == (n_pad, 3, 8)
    assert s["inputs"]["feats"].shape == (n_pad, 3, 32, 7, 7)
    assert s["inputs"]["odometry"].shape == (n_pad, 6, 5)
    n = s["meta"]["num_instances"]
    assert s["inputs"]["valid"][:n].all()
    assert not s["inputs"]["valid"][n:].any()
    assert s["meta"]["target_frame"] == 19


def test_panoptic_fusion_end_to_end(fg_root, fg_cfg, fg_scene_cfg):
    """Train-free smoke: random-init FG + fusion produces a plausible
    panoptic map with correctly-formed ids."""
    from panoptic_forecasting_tpu.eval import fusion

    # Use a tiny canvas patch: the fusion module works on 1024x2048; we
    # keep real size but only 2 scenes so it stays fast on CPU.
    inst_data = build_dataset(fg_cfg)
    data = build_dataset(fg_scene_cfg, test=True)
    model = build_model(fg_scene_cfg, inst_data.card)
    loader = data.loader("val", fg_scene_cfg, test=True)
    batch = next(iter(loader))
    variables = model.init(jax.random.PRNGKey(0), _scene_init_batch(batch))
    out = fusion.predict_panoptic(model, variables, batch)
    segs = out["seg"]
    assert segs.shape[1:] == (1024, 2048)
    vals = np.unique(segs)
    # background void (255) plus any painted ids in (trainId*1000 + k) space
    painted = vals[vals >= 1000]
    for v in painted:
        assert 11 <= v // 1000 <= 18
    # ids are unique per (class, instance)
    for ids in out["ids"]:
        nz = ids[ids > 0]
        assert len(set(nz.tolist())) == len(nz)


def _scene_init_batch(batch):
    """Flatten a scene batch to the dense instance layout init expects."""
    import jax

    def f(x):
        x = np.asarray(x)
        return x.reshape((-1,) + x.shape[2:])

    return {
        "inputs": {
            k: f(v)
            for k, v in batch["inputs"].items()
            if k not in ("background", "valid")
        },
        "labels": {
            "trajectories": f(batch["labels"]["trajectories"]),
            "output_inds": np.asarray(batch["labels"]["output_inds"]).reshape(-1),
        },
    }


def test_condensed_feats_variant(tmp_path):
    """use_condensed_feats: alternate h5 + row-aligned feat_ind table
    (fg_instance_dataset.py:64-68, fg_scene_dataset.py:68-72)."""
    import shutil

    import pandas as pd

    root = str(tmp_path / "fix")
    write_fg_fixture(root, splits=("val",), n_scenes=2, max_instances=2)
    shutil.copy(f"{root}/val_feats.h5", f"{root}/val_condensed_feats.h5")
    imeta = pd.read_pickle(f"{root}/val_instance_meta.pkl")
    pd.to_pickle(imeta[["feat_ind"]],
                 f"{root}/val_instance_condensed_feat_info.pkl")
    smeta = pd.read_pickle(f"{root}/val_seq_meta.pkl")
    pd.to_pickle(smeta[["feat_ind"]],
                 f"{root}/val_seq_condensed_feat_info.pkl")

    base = {
        "task": "fg", "seed": 0, "working_dir": root + "/run",
        "data": {"dataset_type": "fg_instance", "data_splits": ["val"],
                 "data_dir": root, "depth_dir": root, "feats_dir": root,
                 "info_3d_dir": root, "use_3d_info": True, "max_depth": 200},
        "model": {"mask_head": {}}, "training": {"batch_size": 1},
    }
    import copy

    for dstype in ("fg_instance", "fg_scene"):
        cfg_a = copy.deepcopy(base)
        cfg_a["data"]["dataset_type"] = dstype
        cfg_b = copy.deepcopy(cfg_a)
        cfg_b["data"]["use_condensed_feats"] = True
        da = build_dataset(cfg_a, test=True).datasets["val"]
        db = build_dataset(cfg_b, test=True).datasets["val"]
        sa, sb = da[0], db[0]
        np.testing.assert_array_equal(
            sa["inputs"]["feats"], sb["inputs"]["feats"]
        )


def test_scene_dataset_loads_real_feats(fg_scene_cfg):
    """Regression: scene feats must come from the h5, not stay zero."""
    data = build_dataset(fg_scene_cfg, test=True)
    s = data.datasets["val"][0]
    n = int(s["meta"]["num_instances"])
    feats = np.asarray(s["inputs"]["feats"])[:n]
    assert np.abs(feats).sum() > 0


def test_pred_boxes_depths_slices_like_reference():
    """Regression: output_inds index into traj[:, -out_t:], not the raw
    (out_t+1)-step rollout (fg_model.py:439-443)."""
    from panoptic_forecasting_tpu.eval.fusion import _pred_boxes_depths

    class M:
        use_bbox_ulbr = True
        only_loc_feats = False
        use_depth_inp = True

    out_t = 3
    # (S=1, N=1, out_t+1=4, 9): step k has value k in every channel
    traj = np.tile(
        np.arange(4, dtype=np.float32)[None, None, :, None], (1, 1, 1, 9)
    )
    preds = {"unnormalized_trajectory": traj}
    boxes, depths = _pred_boxes_depths(M(), preds, np.array([[0]]), out_t)
    # index 0 must select the FIRST FORECAST step (value 1), not the
    # re-anchored input state (value 0)
    assert boxes[0, 0, 0] == 1.0
    boxes, depths = _pred_boxes_depths(M(), preds, np.array([[2]]), out_t)
    assert depths[0, 0] == 3.0


def test_scene_dataset_train_windows(fg_root):
    """Train split enumerates start windows with coverage filtering
    (fg_scene_dataset.py:185-206)."""
    cfg = {
        "task": "fg", "seed": 0, "working_dir": fg_root + "/tw",
        "data": {"dataset_type": "fg_scene", "data_splits": ["train"],
                 "data_dir": fg_root, "depth_dir": fg_root,
                 "feats_dir": fg_root, "info_3d_dir": fg_root,
                 "use_3d_info": True, "max_depth": 200,
                 "require_most_recent": True},
        "model": {"mask_head": {}},
        "training": {"batch_size": 1},
    }
    data = build_dataset(cfg)
    ds = data.datasets["train"]
    # 3 scenes x up to 3 start inds {4,7,10}; coverage filter keeps >= 1 each
    assert len(ds) > 3
    s = ds[0]
    assert s["inputs"]["trajectories"].shape[1] == 3  # input_len
