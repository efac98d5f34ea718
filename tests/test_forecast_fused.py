"""Fused single-jit forecast == the staged pc → bg → fusion pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from panoptic_forecasting_tpu.core import build_dataset, build_model
from panoptic_forecasting_tpu.data.synthetic import write_fg_fixture
from panoptic_forecasting_tpu.eval import fusion
from panoptic_forecasting_tpu.eval.forecast import build_forecast_step
from panoptic_forecasting_tpu.geometry import unicycle_now_T_prev, rdf_T_flu
from panoptic_forecasting_tpu.models.bg import BGModel
from panoptic_forecasting_tpu.models.pc_transform import pc_transform_predict

H, W, T = 64, 128, 3


@pytest.fixture(scope="module")
def fg_parts(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fgf"))
    write_fg_fixture(root, n_scenes=3, max_instances=3, feat_channels=32,
                     feat_hw=7)
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
            "require_most_recent": True,
            "instance_pad_multiple": 4,
        },
        "model": {
            "mask_feat_channels": 32,
            "mask_feat_hw": 7,
            "mask_head": {"conv_dim": 32},
            "instance_feat_channels": 8,
            "instance_feat_hidden": 32,
            "loss_type": "smoothl1",
            "num_convlstm_layers": 1,
            "num_traj_out_layers": 1,
            "rnn_hidden": 32,
            "rnn_type": "gru",
            "traj_feat_channels": 16,
            "use_depth_inp": True,
            "use_odometry": True,
            "use_depth_sorting": True,
        },
        "training": {"batch_size": 2},
    }
    inst_cfg = dict(cfg, data=dict(cfg["data"], dataset_type="fg_instance",
                                   data_splits=["train", "val"]))
    inst_data = build_dataset(inst_cfg)
    data = build_dataset(cfg, test=True)
    model = build_model(cfg, inst_data.card)
    loader = data.loader("val", cfg, test=True)
    batch = next(iter(loader))

    def f(x):
        x = np.asarray(x)
        return x.reshape((-1,) + x.shape[2:])

    init_batch = {
        "inputs": {
            k: f(v)
            for k, v in batch["inputs"].items()
            if k not in ("background", "valid")
        },
        "labels": {
            "trajectories": f(batch["labels"]["trajectories"]),
            "output_inds": np.asarray(
                batch["labels"]["output_inds"]
            ).reshape(-1),
        },
    }
    variables = model.init(jax.random.PRNGKey(0), init_batch)
    return model, variables, batch


def test_fused_forecast_matches_staged(fg_parts):
    fg_model, fg_vars, scene_batch = fg_parts
    rng = np.random.RandomState(0)
    s = np.asarray(scene_batch["inputs"]["trajectories"]).shape[0]

    # --- synthetic pc inputs (labels in the 11-class stuff space) --------
    seg = rng.randint(0, 11, size=(s, T, H, W)).astype(np.int32)
    depth = (rng.rand(s, T, H, W) * 40 + 2).astype(np.float32)
    depth_mask = rng.rand(s, T, H, W) > 0.1
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    E = (np.array(
        [[1, 0, 0, 0.3], [0, 1, 0, 0.0], [0, 0, 1, 1.1], [0, 0, 0, 1]],
        np.float32) @ rdf_T_flu()).astype(np.float32)
    Ts = np.asarray(
        unicycle_now_T_prev(
            np.array([3.0, 2.0, 1.0], np.float32),
            np.array([0.02, 0.0, -0.01], np.float32),
            0.35,
        ),
        np.float32,
    )
    pc_in = {
        "seg": seg,
        "depth": depth,
        "depth_mask": depth_mask,
        "intrinsics": np.tile(K[None], (s, 1, 1)),
        "extrinsics": np.tile(E[None], (s, 1, 1)),
        "target_T": np.tile(Ts[None], (s, 1, 1, 1)),
    }

    # --- bg model (fresh init) -------------------------------------------
    bg_model = BGModel(
        {
            "model": {
                "num_inputs": T,
                "convert2onehot": True,
                "use_depth_inps": True,
            },
            "data": {"num_classes": 11},
        }
    )
    bg_vars = bg_model.init(
        jax.random.PRNGKey(1),
        {
            "inputs": {
                "seg": jnp.asarray(seg),
                "depth": jnp.asarray(depth),
                "depth_mask": jnp.asarray(depth_mask),
            }
        },
    )

    out_t = int(np.asarray(scene_batch["labels"]["trajectories"]).shape[2])
    fg_in = {
        **{
            k: np.asarray(v)
            for k, v in scene_batch["inputs"].items()
            if k not in ("background",)
        },
        "output_inds": np.asarray(scene_batch["labels"]["output_inds"]),
    }

    # --- fused ------------------------------------------------------------
    step = build_forecast_step(
        bg_model, fg_model, height=H, width=W, out_t=out_t
    )
    fused = step(bg_vars, fg_vars, pc_in, fg_in)
    pan_fused = np.asarray(fused["panoptic"])

    # --- staged ------------------------------------------------------------
    def flat(x):
        return jnp.asarray(x).reshape((s * T, 1) + x.shape[2:])

    rep = pc_transform_predict(
        flat(seg), flat(depth), flat(depth_mask),
        jnp.asarray(pc_in["intrinsics"]).repeat(T, 0),
        jnp.asarray(pc_in["extrinsics"]).repeat(T, 0),
        flat(pc_in["target_T"]),
        height=H, width=W,
    )
    rep_seg = np.asarray(rep["seg"]).reshape(s, T, H, W)
    rep_depth = np.asarray(rep["depth"]).reshape(s, T, H, W)
    logits = bg_model.forward(
        bg_vars,
        {
            "inputs": {
                "seg": jnp.asarray(rep_seg),
                "depth": jnp.asarray(np.maximum(rep_depth, 0.0)),
                "depth_mask": jnp.asarray(rep_depth > 0),
            }
        },
    )
    bg_seg = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
    staged_batch = {
        "inputs": dict(scene_batch["inputs"], background=bg_seg),
        "labels": scene_batch["labels"],
    }
    staged = fusion.predict_panoptic(fg_model, fg_vars, staged_batch)
    pan_staged = np.asarray(staged["seg"])

    assert pan_fused.shape == pan_staged.shape == (s, H, W)
    mismatch = float((pan_fused != pan_staged).mean())
    # identical math modulo XLA fusion rounding; only threshold-boundary
    # pixels may flip
    assert mismatch < 1e-3, f"{mismatch:.2%} pixels differ"
    for b in range(s):
        assert set(np.unique(pan_fused[b])) == set(np.unique(pan_staged[b]))
    # ids in ORIGINAL slot order, exactly the staged assignment — so
    # fused['ids'][b][k] pairs with fused['bbox'][b][k] like the staged API
    ids = np.asarray(fused["ids"])
    ids_staged = np.stack(staged["ids"])
    np.testing.assert_array_equal(ids, ids_staged.astype(ids.dtype))
    np.testing.assert_allclose(
        np.asarray(fused["bbox"]), staged["bbox"], rtol=1e-5, atol=1e-4
    )
    for b in range(s):
        nz = ids[b][ids[b] > 0]
        assert len(set(nz.tolist())) == len(nz)
        for v in nz:
            assert 11 <= v // 1000 <= 18
