"""Torch→Flax weight import: numerical equivalence against torch modules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from panoptic_forecasting_tpu.models import torch_import as ti


def _j(x):
    return jnp.asarray(np.asarray(x.detach()))


def test_conv_bn_matches_torch():
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False).eval()
    bn = torch.nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_()
        bn.bias.normal_()
    x = torch.randn(2, 3, 10, 12)
    ref = torch.relu(bn(conv(x))).permute(0, 2, 3, 1).detach().numpy()

    from panoptic_forecasting_tpu.models.hardnet import ConvLayer

    sd = {f"m.conv.{k}": v for k, v in conv.state_dict().items()}
    sd.update({f"m.norm.{k}": v for k, v in bn.state_dict().items()})
    params, stats = ti._convlayer(sd, "m")
    out = ConvLayer(8).apply(
        {"params": params, "batch_stats": stats},
        _j(x.permute(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_gru_matches_torch():
    torch.manual_seed(1)
    d, h, b, t = 5, 7, 3, 6
    gru = torch.nn.GRU(d, h, batch_first=True)
    x = torch.randn(b, t, d)
    ref, ref_h = gru(x)

    from panoptic_forecasting_tpu.models.layers import ScannedGRU

    cell_params = ti.gru_cell_params(gru.state_dict(), "", layer=0)
    # strip the leading '.' the empty prefix leaves in key lookups
    mod = ScannedGRU(hidden=h)
    ys, h_final = mod.apply({"params": {"cell": cell_params}}, _j(x))
    np.testing.assert_allclose(
        np.asarray(ys), ref.detach().numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_final), ref_h[0].detach().numpy(), atol=1e-5
    )


def test_deconv_matches_torch():
    torch.manual_seed(2)
    dec = torch.nn.ConvTranspose2d(4, 6, 2, stride=2)
    x = torch.randn(2, 4, 5, 5)
    ref = dec(x).permute(0, 2, 3, 1).detach().numpy()

    import flax.linen as nn

    kernel = ti.deconv_kernel(dec.weight)
    out = nn.ConvTranspose(6, (2, 2), strides=(2, 2)).apply(
        {"params": {"kernel": jnp.asarray(kernel),
                    "bias": _j(dec.bias)}},
        _j(x.permute(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_linear_matches_torch():
    torch.manual_seed(3)
    lin = torch.nn.Linear(9, 4)
    x = torch.randn(5, 9)
    ref = lin(x).detach().numpy()

    import flax.linen as nn

    out = nn.Dense(4).apply(
        {"params": ti.linear_params(lin.state_dict(), "")}, _j(x)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_convlstm_cell_matches_reference_semantics():
    """Reference cell (convlstm.py:39-68): conv(cat(x,h)) -> i,f,o,g."""
    torch.manual_seed(4)
    cin, ch = 3, 5
    conv = torch.nn.Conv2d(cin + ch, 4 * ch, 3, padding=1)
    x = torch.randn(2, cin, 6, 6)
    h = torch.randn(2, ch, 6, 6)
    c = torch.randn(2, ch, 6, 6)
    z = conv(torch.cat([x, h], dim=1))
    ci, cf, co, cg = torch.split(z, ch, dim=1)
    c_next = torch.sigmoid(cf) * c + torch.sigmoid(ci) * torch.tanh(cg)
    h_next = torch.sigmoid(co) * torch.tanh(c_next)

    from panoptic_forecasting_tpu.models.convlstm import ConvLSTMCell

    params = ti.convlstm_cell_params(
        {f"cell.conv.{k}": v for k, v in conv.state_dict().items()}, "cell"
    )
    state = (_j(h.permute(0, 2, 3, 1)), _j(c.permute(0, 2, 3, 1)))
    (h2, c2), _ = ConvLSTMCell(hidden=ch).apply(
        {"params": params}, state, _j(x.permute(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(h2), h_next.permute(0, 2, 3, 1).detach().numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(c2), c_next.permute(0, 2, 3, 1).detach().numpy(),
        atol=1e-5,
    )


def _export_convlayer_to_torch_sd(sd, params, stats, torch_prefix):
    sd[f"{torch_prefix}.conv.weight"] = np.transpose(
        params["conv"]["kernel"], (3, 2, 0, 1)
    )
    sd[f"{torch_prefix}.norm.weight"] = params["norm"]["scale"]
    sd[f"{torch_prefix}.norm.bias"] = params["norm"]["bias"]
    sd[f"{torch_prefix}.norm.running_mean"] = stats["norm"]["mean"]
    sd[f"{torch_prefix}.norm.running_var"] = stats["norm"]["var"]


@pytest.mark.slow
def test_hardnet_import_roundtrip_tree():
    """Synthesize a torch-style HarDNet state dict from our init tree
    (inverse layout transforms), import it, and require exact equality —
    validates the name mapping incl. the AvgPool ModuleList index skips."""
    from panoptic_forecasting_tpu.models.hardnet import HarDNet

    model = HarDNet(n_classes=19)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3))
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    sd = {}
    # torch base indices: avg-pools occupy slots after each 1x1 down conv
    # except the last block (hardnet.py:292-296)
    for name, p in params.items():
        s = stats.get(name, {})
        if name.startswith("base_"):
            idx = int(name.split("_")[1])
            tp = f"module.base.{idx}"
        elif name.startswith("conv1x1_up_"):
            tp = f"module.conv1x1_up.{name.split('_')[-1]}"
        elif name.startswith("denseBlocksUp_"):
            tp = f"module.denseBlocksUp.{name.split('_')[-1]}"
        elif name == "finalConv":
            sd["module.finalConv.weight"] = np.transpose(
                p["kernel"], (3, 2, 0, 1)
            )
            sd["module.finalConv.bias"] = p["bias"]
            continue
        else:
            raise AssertionError(name)
        if "conv" in p:  # plain ConvLayer
            _export_convlayer_to_torch_sd(sd, p, s, tp)
        else:  # HarDBlock
            for lname, lp in p.items():
                j = lname.split("_")[-1]
                _export_convlayer_to_torch_sd(
                    sd, lp, s[lname], f"{tp}.layers.{j}"
                )

    imported = ti.hardnet_variables(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(imported["params"])
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    np.testing.assert_array_equal(
        np.asarray(
            jax.tree_util.tree_leaves(variables["batch_stats"])[0]
        ),
        np.asarray(jax.tree_util.tree_leaves(imported["batch_stats"])[0]),
    )


def test_maskrcnn_head_import_tree_matches_init():
    from panoptic_forecasting_tpu.models.mask_head import (
        MaskRCNNConvUpsampleHead,
    )

    head = MaskRCNNConvUpsampleHead()
    variables = head.init(jax.random.PRNGKey(0), jnp.zeros((1, 14, 14, 256)))

    rng = np.random.RandomState(0)
    model_dict = {}
    pre = "roi_heads.mask_head."
    for k in range(1, 5):
        model_dict[f"{pre}mask_fcn{k}.weight"] = rng.randn(
            256, 256, 3, 3
        ).astype(np.float32)
        model_dict[f"{pre}mask_fcn{k}.bias"] = rng.randn(256).astype(
            np.float32
        )
    model_dict[f"{pre}deconv.weight"] = rng.randn(256, 256, 2, 2).astype(
        np.float32
    )
    model_dict[f"{pre}deconv.bias"] = rng.randn(256).astype(np.float32)
    model_dict[f"{pre}predictor.weight"] = rng.randn(8, 256, 1, 1).astype(
        np.float32
    )
    model_dict[f"{pre}predictor.bias"] = rng.randn(8).astype(np.float32)

    imported = ti.maskrcnn_head_params(model_dict)
    ref_shapes = jax.tree_util.tree_map(jnp.shape, variables["params"])
    got_shapes = jax.tree_util.tree_map(np.shape, imported)
    assert ref_shapes == got_shapes
    # And the head actually runs with imported weights.
    out = head.apply({"params": imported}, jnp.zeros((2, 14, 14, 256)))
    assert out.shape == (2, 28, 28, 8)


def test_bg_model_loads_hardnet_pickle(tmp_path):
    """End-to-end: BGModel.init pulls pickle weights, widens the stem conv
    by mean-replication, keeps the fresh 11-class head."""
    from panoptic_forecasting_tpu.models.bg import BGModel
    from panoptic_forecasting_tpu.models.hardnet import HarDNet

    # synthesize a torch-format checkpoint from a 19-class 3-channel init
    src = HarDNet(n_classes=19).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 128, 3))
    )
    params = jax.tree_util.tree_map(np.asarray, src["params"])
    stats = jax.tree_util.tree_map(np.asarray, src["batch_stats"])
    sd = {}
    for name, p in params.items():
        s = stats.get(name, {})
        if name == "finalConv":
            sd["module.finalConv.weight"] = torch.tensor(
                np.transpose(p["kernel"], (3, 2, 0, 1))
            )
            sd["module.finalConv.bias"] = torch.tensor(p["bias"])
        else:
            stem, idx = name.rsplit("_", 1)
            tp = f"module.{stem.replace('base', 'base')}.{idx}"
            if "conv" in p:
                _export_convlayer_to_torch_sd(sd, p, s, tp)
            else:
                for lname, lp in p.items():
                    j = lname.split("_")[-1]
                    _export_convlayer_to_torch_sd(
                        sd, lp, s[lname], f"{tp}.layers.{j}"
                    )
    sd = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}
    path = str(tmp_path / "hardnet70_cityscapes_model.pkl")
    torch.save({"model_state": sd}, path)

    cfg = {
        "task": "bg",
        "data": {"num_classes": 11},
        "model": {"num_inputs": 3, "use_depth_inps": True,
                  "convert2onehot": True,
                  "hardnet": {"pretrain_path": path}},
    }
    model = BGModel(cfg)
    batch = {"inputs": {
        "seg": np.zeros((1, 3, 64, 128), np.int32),
        "depth": np.ones((1, 3, 64, 128), np.float32),
        "depth_mask": np.ones((1, 3, 64, 128), np.float32),
    }}
    variables = model.init(jax.random.PRNGKey(0), batch)
    stem = np.asarray(variables["params"]["base_0"]["conv"]["kernel"])
    assert stem.shape[2] == 3 * 11 + 3  # one-hot channels + depths
    # all expanded input channels carry the mean of the source RGB kernel
    src_mean = np.asarray(params["base_0"]["conv"]["kernel"]).mean(2)
    np.testing.assert_allclose(stem[:, :, 0], src_mean, atol=1e-6)
    np.testing.assert_allclose(stem[:, :, -1], src_mean, atol=1e-6)
    # deeper layer imported verbatim
    np.testing.assert_allclose(
        np.asarray(variables["params"]["base_1"]["conv"]["kernel"]),
        params["base_1"]["conv"]["kernel"], atol=0,
    )
    # decoder weights imported verbatim
    np.testing.assert_allclose(
        np.asarray(
            variables["params"]["conv1x1_up_0"]["conv"]["kernel"]
        ),
        params["conv1x1_up_0"]["conv"]["kernel"], atol=0,
    )
    # fresh 11-class head kept (source head is 19-class)
    assert variables["params"]["finalConv"]["kernel"].shape[-1] == 11
    # batch stats imported
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["base_1"]["norm"]["var"]),
        stats["base_1"]["norm"]["var"], atol=0,
    )


def test_fg_mask_head_loads_detectron2_pickle(tmp_path):
    import pickle as pkl

    rng = np.random.RandomState(7)
    model_dict = {}
    pre = "roi_heads.mask_head."
    for k in range(1, 5):
        model_dict[f"{pre}mask_fcn{k}.weight"] = rng.randn(
            256, 256, 3, 3).astype(np.float32)
        model_dict[f"{pre}mask_fcn{k}.bias"] = rng.randn(256).astype(
            np.float32)
    model_dict[f"{pre}deconv.weight"] = rng.randn(256, 256, 2, 2).astype(
        np.float32)
    model_dict[f"{pre}deconv.bias"] = rng.randn(256).astype(np.float32)
    model_dict[f"{pre}predictor.weight"] = rng.randn(8, 256, 1, 1).astype(
        np.float32)
    model_dict[f"{pre}predictor.bias"] = rng.randn(8).astype(np.float32)
    model_dict["backbone.stem.conv1.weight"] = rng.randn(2).astype(
        np.float32)  # unrelated key must be ignored
    path = str(tmp_path / "mask_rcnn_pretrain.pkl")
    with open(path, "wb") as f:
        pkl.dump({"model": model_dict}, f)

    from panoptic_forecasting_tpu.core import build_dataset, build_model
    from panoptic_forecasting_tpu.data.synthetic import write_fg_fixture

    root = str(tmp_path / "fix")
    write_fg_fixture(root, splits=("train",), n_scenes=2, max_instances=2)
    cfg = {
        "task": "fg", "seed": 0, "working_dir": root + "/run",
        "data": {"dataset_type": "fg_instance", "data_splits": ["train"],
                 "data_dir": root, "depth_dir": root, "feats_dir": root,
                 "info_3d_dir": root, "use_3d_info": True,
                 "max_depth": 200},
        "model": {"rnn_hidden": 16, "use_depth_inp": True,
                  "use_odometry": True,
                  "mask_head": {"maskrcnn_pretrain_path": path,
                                "no_finetune": True}},
        "training": {"batch_size": 2},
    }
    data = build_dataset(cfg)
    model = build_model(cfg, data.card)
    batch = next(iter(data.loader("train", cfg, seed=0)))
    variables = model.init(jax.random.PRNGKey(0), batch)
    got = np.asarray(
        variables["params"]["mask_head"]["mask_fcn1"]["kernel"]
    )
    want = ti.conv_kernel(model_dict[f"{pre}mask_fcn1.weight"])
    np.testing.assert_allclose(got, want, atol=0)
