"""BG model slice: HarDNet shapes, dataset, one-hot assembly, training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from panoptic_forecasting_tpu.core import build_dataset, build_model
from panoptic_forecasting_tpu.data.loader import default_collate
from panoptic_forecasting_tpu.data.synthetic import write_bg_fixture
from panoptic_forecasting_tpu.models.hardnet import (
    HarDNet,
    hard_block_links,
    resize_bilinear_align_corners,
)


def test_hard_block_links_match_reference_algorithm():
    # independently computed from the published FCHarDNet rule for
    # n_layers=4, base=48, growth=10, grmul=1.7
    layers, out_ch = hard_block_links(4, 48, 10, 1.7)
    # layer 1: links [0] -> in 48
    assert layers[0][2] == [0] and layers[0][1] == 48
    # layer 2: links [1, 0] (2-1, 2-2)
    assert sorted(layers[1][2]) == [0, 1]
    # layer 4: links [3, 2, 0]
    assert sorted(layers[3][2]) == [0, 2, 3]
    # out channels: layers 1,3 are odd-ind... indices 0,2 (0-based) + last
    assert out_ch == layers[0][0] + layers[2][0] + layers[3][0]


def test_hardnet70_output_channels_19_classes():
    # eval_shape: structural check without a 100s+ CPU compile+execute
    net = HarDNet(n_classes=19)
    x = jax.ShapeDtypeStruct((1, 64, 128, 3), jnp.float32)
    variables = jax.eval_shape(net.init, jax.random.PRNGKey(0), x)
    out = jax.eval_shape(
        lambda v, x: net.apply(v, x), variables, x
    )
    assert out.shape == (1, 64, 128, 19)
    n_params = sum(
        np.prod(p.shape)
        for p in jax.tree_util.tree_leaves(variables["params"])
    )
    # FCHarDNet-70 has ~4.1M params; sanity-band the reimplementation
    assert 3.5e6 < n_params < 4.7e6


def test_resize_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.rand(1, 8, 12, 3).astype(np.float32)
    ours = resize_bilinear_align_corners(jnp.asarray(x), (17, 33))
    theirs = (
        F.interpolate(
            torch.tensor(x).permute(0, 3, 1, 2),
            size=(17, 33),
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


@pytest.fixture(scope="module")
def bg_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bg"))
    frag = write_bg_fixture(root, n_snippets=2, height=64, width=128)
    return {
        "task": "bg",
        "seed": 0,
        "working_dir": root + "/run",
        "data": {
            "data_splits": ["train", "val"],
            "data_inp_size": 3,
            "gap_len": [9],
            "only_background": True,
            "use_depths": True,
            "min_depth": 0.1,
            "max_depth": 200.0,
            # crop must stay >= 32 px after scaling (HarDNet downsamples 1/32)
            "crop_size": 64,
            "scale_min": 1.0,
            "scale_max": 1.0,
            "depth_norm_params_file": root + "/depth_norm.npy",
            **frag,
        },
        "model": {
            "num_inputs": 3,
            "convert2onehot": True,
            "use_depth_inps": True,
        },
        "training": {
            "batch_size": 2,
            "num_epochs": 1,
            "steps_per_epoch": 1,
            "lr": 2e-3,
            "mom": 0.9,
            "wd": 1e-4,
            "clip_grad_norm": 5.0,
        },
    }


def test_bg_dataset_and_card(bg_cfg):
    data = build_dataset(bg_cfg)
    assert data.card.num_classes == 11
    assert "depth" in data.card.stats
    s = data.datasets["train"][0]
    assert s["inputs"]["seg"].shape == (3, 64, 64)  # cropped
    assert s["inputs"]["depth"].shape == (3, 64, 64)
    v = data.datasets["val"][0]
    assert v["inputs"]["seg"].shape == (3, 64, 128)  # full size, no aug
    assert set(np.unique(v["labels"]["seg"])) <= set(range(11)) | {255}


def test_bg_model_input_assembly_channel_order(bg_cfg):
    data = build_dataset(bg_cfg)
    model = build_model(bg_cfg, data.card)
    seg = jnp.asarray(np.array([[[[1, 12]], [[2, 255]], [[0, 3]]]]))  # (1,3,1,2)
    x = model._inp2onehot(seg)
    assert x.shape == (1, 3, 1, 2, 11)
    # id >= num_classes is zeroed entirely
    assert float(x[0, 0, 0, 1].sum()) == 0.0
    assert float(x[0, 1, 0, 1].sum()) == 0.0
    assert float(x[0, 0, 0, 0, 1]) == 1.0
    full = model._assemble(
        seg,
        jnp.ones((1, 3, 1, 2)),
        jnp.ones((1, 3, 1, 2), bool),
    )
    # t-major layout + 3 depth channels at the end
    assert full.shape == (1, 1, 2, 3 * 11 + 3)
    assert float(full[0, 0, 0, 1]) == 1.0  # t0 class1
    assert float(full[0, 0, 0, 11 + 2]) == 1.0  # t1 class2


def test_bg_npy_seg_format_matches_png(bg_cfg, tmp_path):
    """prepare_bg_data's raw .npy seg format (zero-decode mmap reads)
    must yield bit-identical samples to the PNG tree."""
    import copy
    import glob
    import os
    import shutil

    from PIL import Image

    png_root = bg_cfg["data"]["data_dir"][0]
    base = os.path.dirname(png_root)  # the bg fixture root (pc_ind* parent)
    npy_base = str(tmp_path / "npy_tree")
    shutil.copytree(base, npy_base)
    cfg_npy = copy.deepcopy(bg_cfg)
    cfg_npy["data"]["data_dir"] = [
        d.replace(base, npy_base) for d in bg_cfg["data"]["data_dir"]
    ]
    cfg_npy["data"]["gt_dir"] = bg_cfg["data"]["gt_dir"]
    n_conv = 0
    for d in cfg_npy["data"]["data_dir"]:
        for p in glob.glob(os.path.join(d, "*", "*", "*_gtFine_labelIds.png")):
            np.save(p[:-4] + ".npy", np.array(Image.open(p)))
            os.remove(p)
            n_conv += 1
    assert n_conv > 0
    data_png = build_dataset(bg_cfg)
    data_npy = build_dataset(cfg_npy)
    assert data_npy.datasets["train"].seg_npy
    assert not data_png.datasets["train"].seg_npy
    for split in ("train", "val"):
        for i in range(len(data_png.datasets[split])):
            a = data_png.datasets[split][i]
            b = data_npy.datasets[split][i]
            np.testing.assert_array_equal(
                a["inputs"]["seg"], b["inputs"]["seg"]
            )
            np.testing.assert_array_equal(
                a["labels"]["seg"], b["labels"]["seg"]
            )


def test_bg_raw_depth_device_decode_matches_host(bg_cfg):
    """The loader's default RAW-uint16 depth path (decoded in-graph by
    BGModel._prep_inputs) must be bit-identical to the host-decoded float
    path: /256 is exact in f32 and the decode commutes with the NEAREST
    crop/flip/pad transforms (pad 0 decodes to invalid)."""
    import copy

    cfg_host = copy.deepcopy(bg_cfg)
    cfg_host["data"]["host_depth_decode"] = True
    data_raw = build_dataset(bg_cfg)
    data_host = build_dataset(cfg_host)
    model = build_model(bg_cfg, data_raw.card)
    for idx in (0, 1):
        raw = data_raw.datasets["train"][idx]
        host = data_host.datasets["train"][idx]
        assert raw["inputs"]["depth"].dtype == np.uint16
        assert raw["inputs"]["seg"].dtype == np.uint8
        assert "depth_mask" not in raw["inputs"]
        b_raw = default_collate([raw])
        b_host = default_collate([host])
        _, dep_r, mask_r = model._prep_inputs(b_raw["inputs"])
        _, dep_h, mask_h = model._prep_inputs(b_host["inputs"])
        np.testing.assert_array_equal(np.asarray(dep_r), np.asarray(dep_h))
        np.testing.assert_array_equal(np.asarray(mask_r), np.asarray(mask_h))
        variables = model.init(jax.random.PRNGKey(0), b_raw)
        out_r = model.forward(variables, b_raw)
        out_h = model.forward(variables, b_host)
        np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_h))


@pytest.mark.slow
def test_bg_train_step_and_predict(bg_cfg):
    from panoptic_forecasting_tpu.train.loop import train

    data = build_dataset(bg_cfg)
    model = build_model(bg_cfg, data.card)
    import os

    os.makedirs(bg_cfg["working_dir"], exist_ok=True)
    result = train(model, data, bg_cfg)
    assert np.isfinite(result["best_val_result"])
    # batch_stats were updated during training
    bs = result["params"]["batch_stats"]
    leaf = jax.tree_util.tree_leaves(bs)[0]
    assert np.isfinite(np.asarray(leaf)).all()

    batch = default_collate([data.datasets["val"][0]])
    preds = model.predict(result["params"], {"inputs": batch["inputs"]})
    assert preds["seg"].shape == (1, 64, 128)
    assert preds["logits"].shape == (1, 64, 128, 11)
    assert preds["orig_size_logits"].shape[1:3] == (16, 32)  # 1/4 resolution


def test_bg_augmentation_reseeds_per_epoch(bg_cfg):
    """Regression: Loader.set_epoch must reach the dataset RNG."""
    from panoptic_forecasting_tpu.data.loader import Loader

    data = build_dataset(bg_cfg)
    ds = data.datasets["train"]
    loader = Loader(ds, batch_size=1, shuffle=False)
    loader.set_epoch(1)
    a = ds[0]["inputs"]["seg"]
    loader.set_epoch(2)
    b = ds[0]["inputs"]["seg"]
    assert not np.array_equal(a, b), "augmentation identical across epochs"


def test_bg_bf16_compute_dtype():
    """model.compute_dtype=bfloat16: params stay f32, output back to f32.

    eval_shape only — a real bf16 forward would add another ~100s HarDNet
    CPU compile to CI; numerics ride the same code path as f32."""
    import jax

    from panoptic_forecasting_tpu.models.bg import BGModel

    cfg = {"task": "bg", "data": {"num_classes": 11},
           "model": {"num_inputs": 3, "use_depth_inps": True,
                     "convert2onehot": True, "compute_dtype": "bfloat16"}}
    model = BGModel(cfg)
    assert model.compute_dtype == jnp.bfloat16
    x = jax.ShapeDtypeStruct((1, 64, 128, 36), jnp.float32)
    v = jax.eval_shape(model.module.init, jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_leaves(v["params"])[0].dtype == jnp.float32
    out = jax.eval_shape(lambda v, x: model.module.apply(v, x), v, x)
    assert out.dtype == jnp.float32


def test_packed_weight_transforms_match_plain_convs():
    """Each packed-space weight transform is an exact re-indexing of the
    plain conv: stride-1 3×3 (segment-aware), stride-2 3×3 packed→packed,
    1×1 block-diagonal, the packed-output resize, and the pack/unpack
    roundtrip."""
    import jax
    import numpy as np

    from panoptic_forecasting_tpu.models.hardnet import (
        _pack_1x1_weights,
        _pack_s1_weights,
        _pack_s2_weights,
        pack_space2,
        resize_bilinear_align_corners,
        resize_bilinear_packed_out,
        unpack_space2,
    )

    rng = np.random.RandomState(5)
    conv = lambda x, w, s, p: jax.lax.conv_general_dilated(
        x, w, (s, s), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # two logical inputs (segments) of 3 and 5 channels, 8x12 spatial
    xa = jnp.asarray(rng.randn(2, 8, 12, 3).astype(np.float32))
    xb = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    x = jnp.concatenate([xa, xb], axis=-1)
    xp = jnp.concatenate([pack_space2(xa), pack_space2(xb)], axis=-1)
    segs = (3, 5)

    np.testing.assert_array_equal(
        np.asarray(unpack_space2(xp, segs)), np.asarray(x)
    )

    w = jnp.asarray(rng.randn(3, 3, 8, 6).astype(np.float32))
    b = jnp.asarray(rng.randn(6).astype(np.float32))
    ref = conv(x, w, 1, 1) + b
    wp, bp = _pack_s1_weights(w, b, segs)
    got = unpack_space2(conv(xp, wp, 1, 1) + bp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    ref2 = conv(x, w, 2, 1) + b
    wp2, bp2 = _pack_s2_weights(w, b, segs)
    got2 = unpack_space2(conv(xp, wp2, 2, 1) + bp2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)

    w1 = jnp.asarray(rng.randn(1, 1, 8, 4).astype(np.float32))
    b1 = jnp.asarray(rng.randn(4).astype(np.float32))
    ref3 = conv(x, w1, 1, 0) + b1
    wp3, bp3 = _pack_1x1_weights(w1, b1, segs)
    got3 = unpack_space2(conv(xp, wp3, 1, 0) + bp3)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref3),
                               rtol=1e-5, atol=1e-5)

    ref4 = resize_bilinear_align_corners(x, (16, 24))
    got4 = unpack_space2(resize_bilinear_packed_out(x, (16, 24)))
    np.testing.assert_allclose(np.asarray(got4), np.asarray(ref4),
                               rtol=1e-5, atol=1e-5)


def test_hardnet_packed_stem_matches_plain():
    """packed_stem (2×2 space-to-depth base_1/base_2) == plain path.

    The packed-space weight transforms (_pack_s1_weights /
    _prepacked_s2d_weights) are exact re-indexings of the same conv sums;
    logits must agree to f32-reassociation tolerance and the argmax must
    be identical (docs/perf_notes.md round 5 layout experiment)."""
    import jax
    import numpy as np

    from panoptic_forecasting_tpu.models.hardnet import (
        HarDNet,
        fold_batchnorm_variables,
    )

    rng = np.random.RandomState(0)
    net = HarDNet(n_classes=7)
    v = jax.eval_shape(
        net.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 12))
    )
    v = jax.tree_util.tree_map(
        lambda s: jnp.asarray(rng.randn(*s.shape).astype(s.dtype) * 0.05), v
    )
    v = jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.abs(x) + 0.5
        if any(getattr(k, "key", None) == "var" for k in path) else x,
        v,
    )
    vf = fold_batchnorm_variables(v)
    x0 = jnp.asarray(rng.randn(1, 64, 128, 16).astype(np.float32))
    plain = HarDNet(n_classes=7, folded=True, skip_stem0=True)
    a = plain.apply(vf, x0)
    for lvl in (1, 2):
        packed = HarDNet(n_classes=7, folded=True, skip_stem0=True,
                         packed_stem=True, packed_levels=lvl)
        b = packed.apply(vf, x0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(plain.apply(vf, x0, return_argmax=True)),
            np.asarray(packed.apply(vf, x0, return_argmax=True)),
        )


def test_hardnet_packed_train_path_exact_f64():
    """packed_full (training path: 5×5 stride-4 entry conv + packed BN
    with per-logical-channel stats) is mathematically exact: in f64 the
    train-mode forward matches the plain path to 0 and gradients to
    ~1e-10. (In f32 the train-mode BN chain amplifies reassociation to
    ~1e-3 — training equivalence is statistical, like the reference's
    DDP-vs-single-GPU.)"""
    import jax
    import numpy as np

    from panoptic_forecasting_tpu.models.hardnet import HarDNet

    with jax.enable_x64(True):
        rng = np.random.RandomState(0)
        x0 = jnp.asarray(rng.randn(1, 64, 128, 12).astype(np.float64))
        plain = HarDNet(n_classes=7, dtype=jnp.float64)
        packed = HarDNet(n_classes=7, dtype=jnp.float64,
                         packed_full=True, packed_levels=1)
        v = plain.init(jax.random.PRNGKey(0), x0)
        v = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64)
            if a.dtype == jnp.float32 else a, v,
        )
        out_a, st_a = plain.apply(v, x0, train=True,
                                  mutable=["batch_stats"])
        out_b, st_b = packed.apply(v, x0, train=True,
                                   mutable=["batch_stats"])
        # Interactive f64 runs measured fwd diff exactly 0.0; under the
        # test harness XLA:CPU may load AOT-cached executables with
        # different instruction selection (~1e-7 drift on 0.2% of
        # elements) — still far beyond anything f32 arithmetic could hit.
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   rtol=1e-5, atol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-9
            ),
            st_a, st_b,
        )

        def loss(p, net):
            out = net.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x0, train=True, mutable=["batch_stats"],
            )[0]
            return (out ** 2).mean()

        ga = jax.grad(loss)(v["params"], plain)
        gb = jax.grad(loss)(v["params"], packed)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
            ),
            ga, gb,
        )


def test_bg_fold_inference_matches(bg_cfg):
    """fold_batchnorm_variables + folded graph == standard predict
    (v2_transform capability: no BN ops in the inference graph)."""
    import jax
    import numpy as np
    from panoptic_forecasting_tpu.core import build_dataset, build_model

    data = build_dataset(bg_cfg)
    model = build_model(bg_cfg, data.card)
    batch = next(iter(data.loader("val", bg_cfg)))
    variables = model.init(jax.random.PRNGKey(0), batch)
    ref = model.predict(variables, batch)
    folded = model.fold_variables(variables)
    assert "batch_stats" not in folded
    out = model.predict(folded, batch)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(ref["logits"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(out["seg"]), np.asarray(ref["seg"])
    )
