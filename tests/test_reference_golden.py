"""Golden forward-parity vs the reference's OWN code.

These tests import ``/root/reference/panoptic_forecasting`` (the original
torch implementation), build its models with random weights, transfer those
weights through ``models/reference_import.py``, and assert forward equality.
Unlike tests/test_torch_import.py (which validates weight-layout math against
rebuilt torch modules), these pin the reference's *semantics*: encoder input
concat order, re-anchor indexing, coupled decode cross-feeding
(fg_model.py:216-339), autoregressive odom rollout (odom_model.py:74-102),
HarDNet dataflow (hardnet.py:353-387), and the fused panoptic composite
(fg_model.py:489-595).

The reference needs ``cityscapesscripts``/``torchvision`` at import time
only for label tables / dataset transforms; both are stubbed (the label
table from our in-tree copy of the public Cityscapes taxonomy).
"""

import collections
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "panoptic_forecasting")),
    reason="reference checkout not available",
)


def _install_reference_stubs():
    """Stub cityscapesscripts.helpers.labels (+ torchvision) so the
    reference package imports; the label table is the public Cityscapes
    taxonomy restated in data/cityscapes.py."""
    if "cityscapesscripts.helpers.labels" not in sys.modules:
        from panoptic_forecasting_tpu.data.cityscapes import LABELS

        CsLabel = collections.namedtuple(
            "Label",
            ["name", "id", "trainId", "category", "categoryId",
             "hasInstances", "ignoreInEval", "color"],
        )
        cs = [
            CsLabel(l.name, l.id, l.train_id, l.category, 0,
                    l.has_instances, l.ignore_in_eval, l.color)
            for l in LABELS
        ]
        mod = types.ModuleType("cityscapesscripts.helpers.labels")
        mod.labels = cs
        mod.id2label = {l.id: l for l in cs}
        mod.trainId2label = {l.trainId: l for l in cs}
        mod.name2label = {l.name: l for l in cs}
        pkg = types.ModuleType("cityscapesscripts")
        helpers = types.ModuleType("cityscapesscripts.helpers")
        pkg.helpers = helpers
        helpers.labels = mod
        sys.modules["cityscapesscripts"] = pkg
        sys.modules["cityscapesscripts.helpers"] = helpers
        sys.modules["cityscapesscripts.helpers.labels"] = mod
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


@pytest.fixture(scope="module")
def ref():
    _install_reference_stubs()
    from panoptic_forecasting.models.bg import hardnet as ref_hardnet
    from panoptic_forecasting.models.fg.fg_model import FGModel
    from panoptic_forecasting.models.odom.odom_model import OdomModel

    return types.SimpleNamespace(
        OdomModel=OdomModel, FGModel=FGModel, hardnet=ref_hardnet
    )


# ---------------------------------------------------------------------------
# Odometry: autoregressive predict (odom_model.py:74-102)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("predict_type", ["direct", "offset"])
def test_odom_forecast_golden(ref, predict_type):
    torch.manual_seed(0)
    mean = torch.tensor([1.5, -0.2])
    std = torch.tensor([2.0, 0.5])
    params = {
        "model": {"predict_type": predict_type, "normalize_input": True,
                  "rnn_hidden": 16, "loss_fn": "mse", "out_layers": []},
        "data": {"odom_norm_params": (mean, std)},
    }
    rmodel = ref.OdomModel(params).eval()
    rng = np.random.RandomState(1)
    x = rng.randn(4, 9, 2).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_norm = rmodel(torch.from_numpy(x), 9)

    from panoptic_forecasting_tpu.data.cards import DataCard
    from panoptic_forecasting_tpu.models import reference_import as ri
    from panoptic_forecasting_tpu.models.odom import OdomModel as MyOdom

    jparams, stats = ri.odom_from_reference(rmodel.state_dict())
    card = DataCard(task="odom")
    for name, (m, s) in stats.items():
        card.set_stats(name, m, s)
    mine = MyOdom(
        {"model": {"predict_type": predict_type, "rnn_hidden": 16,
                   "loss_fn": "mse", "normalize_input": True},
         "data": {"output_len": 9}},
        card,
    )
    out, norm = mine.forward({"params": jparams}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(norm), ref_norm.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# HarDNet: full FCHarDNet-70 logits (hardnet.py:353-387)
# ---------------------------------------------------------------------------


def test_hardnet_logits_golden(ref):
    torch.manual_seed(0)
    rnet = ref.hardnet.hardnet(n_classes=19).eval()
    # randomize BN running stats so eval-mode normalization is exercised
    with torch.no_grad():
        for m in rnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 64, 128).astype(np.float32)
    with torch.no_grad():
        ref_logits = rnet(torch.from_numpy(x)).numpy()

    from panoptic_forecasting_tpu.models.hardnet import HarDNet
    from panoptic_forecasting_tpu.models.torch_import import hardnet_variables

    variables = hardnet_variables(rnet.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    net = HarDNet(n_classes=19)
    out = net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref_logits, atol=2e-4)


# ---------------------------------------------------------------------------
# FG: coupled GRU+ConvLSTM rollout + mask head (fg_model.py:216-339)
# ---------------------------------------------------------------------------

FG_STATS = {
    "traj": (np.linspace(10, 900, 8).astype(np.float32),
             np.linspace(5, 300, 8).astype(np.float32)),
    "depth": (np.array([12.0, 0.1], np.float32),
              np.array([8.0, 0.6], np.float32)),
    "odom": (np.array([5.0, 0.01, 1.0, 0.0, 0.01], np.float32),
             np.array([3.0, 0.05, 0.7, 0.1, 0.04], np.float32)),
}


def _build_ref_fg(ref, num_convlstm_layers=1, rnn_hidden=32):
    params = {
        "model": {
            "rnn_hidden": rnn_hidden,
            "loss_type": "smoothl1",
            "instance_feat_channels": 8,
            "traj_feat_channels": 16,
            "instance_feat_hidden": 64,
            "use_odometry": True,
            "rnn_type": "gru",
            "use_depth_inp": True,
            "use_depth_sorting": True,
            "num_traj_out_layers": 1,
            "num_convlstm_layers": num_convlstm_layers,
            "mask_head": {},
        },
        "data": {
            "odom_size": 5,
            "norm_params": tuple(torch.from_numpy(a) for a in FG_STATS["traj"]),
            "depth_norm_params": tuple(
                torch.from_numpy(a) for a in FG_STATS["depth"]
            ),
            "odom_norm_params": tuple(
                torch.from_numpy(a) for a in FG_STATS["odom"]
            ),
        },
    }
    torch.manual_seed(0)
    rmodel = ref.FGModel(params).eval()
    # the fresh-init predictor has std 1e-3 weights + zero bias -> all mask
    # logits ~0 (sigmoid ~0.5, i.e. ON the paste threshold). Re-randomize so
    # thresholding is well-conditioned for the fusion comparison.
    with torch.no_grad():
        rmodel.mask_head.predictor.weight.normal_(0, 0.05)
        rmodel.mask_head.predictor.bias.normal_(0, 1.0)
    return rmodel, params


def _my_fg(rmodel, num_convlstm_layers=1, rnn_hidden=32):
    from panoptic_forecasting_tpu.data.cards import DataCard
    from panoptic_forecasting_tpu.models import reference_import as ri
    from panoptic_forecasting_tpu.models.fg import FGModel as MyFG

    jparams, stats = ri.fg_from_reference(
        rmodel.state_dict(), instance_feat_channels=8, feat_hw=14
    )
    card = DataCard(task="fg")
    for name, (m, s) in stats.items():
        card.set_stats(name, m, s)
    assert set(stats) == {"traj", "depth", "odom"}
    cfg = {
        "model": {
            "rnn_hidden": rnn_hidden,
            "loss_type": "smoothl1",
            "instance_feat_channels": 8,
            "traj_feat_channels": 16,
            "instance_feat_hidden": 64,
            "use_odometry": True,
            "rnn_type": "gru",
            "use_depth_inp": True,
            "use_depth_sorting": True,
            "num_convlstm_layers": num_convlstm_layers,
            "mask_head": {},
        },
    }
    return MyFG(cfg, card), {"params": jparams}


def _fg_inputs(n, rng, t_in=3, t_out=3):
    t = t_in + t_out
    trajs = (rng.rand(n, t, 8).astype(np.float32) * 400 + 50)
    bbox_masks = rng.rand(n, t) > 0.2
    bbox_masks[:, 0] = True
    vel_masks = np.concatenate(
        [np.zeros((n, 1), bool), bbox_masks[:, 1:] & bbox_masks[:, :-1]], 1
    )
    depths = (rng.rand(n, t_in, 2).astype(np.float32) * 30 + 1)
    depth_masks = (rng.rand(n, t_in, 1) > 0.2)
    feats = rng.randn(n, t_in, 256, 14, 14).astype(np.float32)
    odom = rng.randn(n, t, 5).astype(np.float32)
    classes = rng.randint(0, 8, size=n)
    output_inds = np.full(n, t_out - 1, np.int64)
    return dict(trajectories=trajs, bbox_masks=bbox_masks,
                bbox_vel_masks=vel_masks, depths=depths,
                depth_masks=depth_masks, feats=feats, odom=odom,
                classes=classes, output_inds=output_inds)


def test_fg_rollout_golden(ref):
    """Full coupled rollout + mask head forward equality, reference code vs
    imported weights, including re-anchor step and decode cross-feeding."""
    rmodel, _ = _build_ref_fg(ref)
    rng = np.random.RandomState(3)
    n, t_in, t_out = 3, 3, 3
    d = _fg_inputs(n, rng, t_in, t_out)
    with torch.no_grad():
        ref_out = rmodel(
            torch.from_numpy(d["trajectories"][:, :t_in]),
            torch.from_numpy(d["bbox_masks"][:, :t_in].astype(np.float32)),
            torch.from_numpy(d["bbox_vel_masks"][:, :t_in].astype(np.float32)),
            torch.from_numpy(d["feats"]),
            torch.from_numpy(d["output_inds"]),
            torch.from_numpy(d["odom"]),
            torch.from_numpy(d["depths"]),
            torch.from_numpy(d["depth_masks"].astype(np.float32)),
            torch.from_numpy(d["classes"]),
            t_out,
        )

    mine, variables = _my_fg(rmodel)
    inputs = {
        "trajectories": d["trajectories"][:, :t_in],
        "bbox_masks": d["bbox_masks"][:, :t_in],
        "bbox_vel_masks": d["bbox_vel_masks"][:, :t_in],
        "depths": d["depths"],
        "depth_masks": d["depth_masks"],
        "feats": d["feats"],
        "odometry": d["odom"],
        "classes": d["classes"],
        "output_inds": d["output_inds"],
    }
    out = mine.forward(variables, inputs, t_out)

    np.testing.assert_allclose(
        np.asarray(out["normalized_trajectory"]),
        ref_out["normalized_trajectory"].numpy(), atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["unnormalized_trajectory"]),
        ref_out["unnormalized_trajectory"].numpy(), rtol=1e-4, atol=1e-3,
    )
    # mask feats: reference NCHW, ours NHWC
    mf = np.asarray(out["mask_feats"]).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(
        mf, ref_out["mask_feats"].numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["masks"]), ref_out["masks"].numpy(), atol=1e-4
    )


# ---------------------------------------------------------------------------
# Fusion: predict_panoptic end-to-end (fg_model.py:489-595)
# ---------------------------------------------------------------------------


def _fusion_batches(seed=7, scene_sizes=(2, 3), t_in=3, t_out=3,
                    with_scores=False, with_bg_depth=False):
    """Shared scene-batch builder for the three fusion goldens: the SAME
    random scenes as (a) the reference's list-collated batch and (b) our
    dense padded batch. Two scenes with different instance counts exercise
    the batch-max collate padding path through run_scene_forward."""
    rng = np.random.RandomState(seed)
    scenes = [_fg_inputs(n, rng, t_in, t_out) for n in scene_sizes]
    backgrounds = [
        rng.randint(0, 19, size=(1024, 2048)).astype(np.int64)
        for _ in scene_sizes
    ]
    scores = [rng.rand(n).astype(np.float32) for n in scene_sizes]
    # spread predicted depths: keep the raw depth inputs distinct per inst
    for d in scenes:
        d["depths"][:, :, 0] += np.arange(len(d["depths"]), dtype=np.float32)[
            :, None
        ] * 7.3

    # ---- reference: list-collated scene batch ----
    t = lambda x: torch.from_numpy(np.asarray(x))
    ref_inputs = {
        "trajectories": [t(d["trajectories"][:, :t_in]) for d in scenes],
        "depths": [t(d["depths"]) for d in scenes],
        "depth_masks": [t(d["depth_masks"].astype(np.float32))
                        for d in scenes],
        "bbox_masks": [t(d["bbox_masks"]) for d in scenes],
        "bbox_vel_masks": [t(d["bbox_vel_masks"]) for d in scenes],
        "odometry": [t(d["odom"]) for d in scenes],
        "feats": [t(d["feats"]) for d in scenes],
        "classes": [t(d["classes"]) for d in scenes],
        "background": [t(bg) for bg in backgrounds],
    }
    ref_labels = {
        "trajectories": [t(d["trajectories"][:, t_in:]) for d in scenes],
        "output_inds": [t(d["output_inds"]) for d in scenes],
    }
    if with_scores:
        ref_inputs["inst_scores"] = [t(s) for s in scores]
    bg_depths = [
        (rng.rand(1024, 2048) * 40 + 1).astype(np.float32)
        for _ in scene_sizes
    ]
    if with_bg_depth:
        # the reference mutates current_depths in place (:585) — clone
        ref_inputs["background_depth"] = [t(d.copy()) for d in bg_depths]

    # ---- ours: dense padded scene batch ----
    n_max = max(scene_sizes)

    def pad(x, fill=0):
        if x.shape[0] == n_max:
            return x
        padding = np.full((n_max - x.shape[0],) + x.shape[1:], fill, x.dtype)
        return np.concatenate([x, padding])

    batch = {
        "inputs": {
            "valid": np.stack([
                pad(np.ones(n, bool)) for n in scene_sizes
            ]),
            "trajectories": np.stack([
                pad(d["trajectories"][:, :t_in]) for d in scenes
            ]),
            "depths": np.stack([pad(d["depths"]) for d in scenes]),
            "depth_masks": np.stack([pad(d["depth_masks"]) for d in scenes]),
            "bbox_masks": np.stack([pad(d["bbox_masks"]) for d in scenes]),
            "bbox_vel_masks": np.stack([
                pad(d["bbox_vel_masks"]) for d in scenes
            ]),
            "odometry": np.stack([pad(d["odom"]) for d in scenes]),
            "feats": np.stack([pad(d["feats"]) for d in scenes]),
            "classes": np.stack([pad(d["classes"]) for d in scenes]),
            "background": np.stack(backgrounds),
        },
        "labels": {
            "trajectories": np.stack([
                pad(d["trajectories"][:, t_in:]) for d in scenes
            ]),
            "output_inds": np.stack([
                pad(d["output_inds"], fill=t_out - 1) for d in scenes
            ]),
        },
    }
    if with_scores:
        batch["inputs"]["inst_scores"] = np.stack([pad(s) for s in scores])
    if with_bg_depth:
        batch["inputs"]["background_depth"] = np.stack(bg_depths)
    return ref_inputs, ref_labels, batch


def test_fusion_panoptic_golden(ref):
    """Fused panoptic maps: reference per-instance paste/composite loop vs
    our batched separable-matmul paste + masked composite, same weights."""
    rmodel, _ = _build_ref_fg(ref)
    mine, variables = _my_fg(rmodel)
    ref_inputs, ref_labels, batch = _fusion_batches()
    with torch.no_grad():
        ref_res = rmodel.predict_panoptic(ref_inputs, ref_labels)
    ref_seg = ref_res["seg"].numpy()

    from panoptic_forecasting_tpu.eval import fusion

    res = fusion.predict_panoptic(mine, variables, batch)
    seg = np.asarray(res["seg"])

    assert seg.shape == ref_seg.shape
    mismatch = float((seg != ref_seg).mean())
    # bilinear paste differs from grid_sample at ~1e-6; only pixels whose
    # mask prob sits exactly on the 0.5 threshold may flip.
    assert mismatch < 1e-4, f"panoptic maps differ on {mismatch:.2%} pixels"
    for b in range(seg.shape[0]):
        assert set(np.unique(seg[b])) == set(np.unique(ref_seg[b]))


def test_fusion_panoptic_bgdepth_golden(ref):
    """The composite's background-depth z-buffer path (fg_model.py:522-527,
    580-585): instances paint only where strictly nearer than the bg depth
    canvas, which updates as they land. Depth-only variant — the
    reference's background_depth_mask path crashes in its own code
    ((H, W) mask vs (1, H, W) tensor at :566), so only the working path
    can be pinned cross-framework."""
    rmodel, _ = _build_ref_fg(ref)
    mine, variables = _my_fg(rmodel)
    ref_inputs, ref_labels, batch = _fusion_batches(seed=17,
                                                    with_bg_depth=True)
    with torch.no_grad():
        ref_res = rmodel.predict_panoptic(ref_inputs, ref_labels)
    ref_seg = ref_res["seg"].numpy()

    from panoptic_forecasting_tpu.eval import fusion

    res = fusion.predict_panoptic(mine, variables, batch)
    seg = np.asarray(res["seg"])

    assert seg.shape == ref_seg.shape
    # the z-buffer must actually bite: some instance pixels are occluded
    # by the bg canvas vs the no-depth composite
    no_depth = fusion.predict_panoptic(
        mine, variables,
        {**batch, "inputs": {k: v for k, v in batch["inputs"].items()
                             if k != "background_depth"}},
    )
    assert (np.asarray(no_depth["seg"]) != seg).any()
    mismatch = float((seg != ref_seg).mean())
    assert mismatch < 1e-4, f"bg-depth maps differ on {mismatch:.2%} pixels"
    for b in range(seg.shape[0]):
        assert set(np.unique(seg[b])) == set(np.unique(ref_seg[b]))


def test_fusion_semantics_golden(ref):
    """predict_semantics (fg_model.py:389-487): instance pixels take trainId
    class+11 composited in depth order over the UNMODIFIED background canvas
    (no thing-pixel void reset, unlike predict_panoptic)."""
    rmodel, _ = _build_ref_fg(ref)
    mine, variables = _my_fg(rmodel)
    ref_inputs, ref_labels, batch = _fusion_batches(seed=11)
    with torch.no_grad():
        ref_res = rmodel.predict_semantics(ref_inputs, ref_labels)
    ref_seg = ref_res["seg"].numpy()

    from panoptic_forecasting_tpu.eval import fusion

    res = fusion.predict_semantics(mine, variables, batch)
    seg = np.asarray(res["seg"])

    assert seg.shape == ref_seg.shape
    mismatch = float((seg != ref_seg).mean())
    assert mismatch < 1e-4, f"semantic maps differ on {mismatch:.2%} pixels"
    for b in range(seg.shape[0]):
        assert set(np.unique(seg[b])) == set(np.unique(ref_seg[b]))


def test_fusion_instances_golden(ref):
    """predict_instances (fg_model.py:597-746): per-instance binary masks
    extracted from the visit-order overwrite composite, fully-occluded
    instances dropped, classes as trainId+11, dataset inst_scores passed
    through — the payload export_cityscapes_instance_results.py:61-92 writes
    in Cityscapes AP format."""
    rmodel, _ = _build_ref_fg(ref)
    mine, variables = _my_fg(rmodel)
    ref_inputs, ref_labels, batch = _fusion_batches(seed=13, with_scores=True)
    with torch.no_grad():
        ref_res = rmodel.predict_instances(ref_inputs, ref_labels)

    from panoptic_forecasting_tpu.eval import fusion

    res = fusion.predict_instances(mine, variables, batch)

    assert len(res["instances"]) == len(ref_res["instances"])
    for b, (mine_insts, ref_masks) in enumerate(
        zip(res["instances"], ref_res["instances"])
    ):
        ref_classes = ref_res["instance_classes"][b]
        ref_scores = ref_res["instance_scores"][b]
        assert len(mine_insts) == len(ref_masks), f"scene {b} count"
        for i, inst in enumerate(mine_insts):
            ref_mask = ref_masks[i].numpy().astype(bool)
            mismatch = float((inst["mask"] != ref_mask).mean())
            assert mismatch < 1e-4, (
                f"scene {b} inst {i} masks differ on {mismatch:.2%} pixels"
            )
            assert inst["class_train_id"] == int(ref_classes[i])
            np.testing.assert_allclose(inst["score"], ref_scores[i],
                                       rtol=1e-6)


# ---------------------------------------------------------------------------
# PC transform: reference predict with a scatter_min stub
# (pc_transform_model.py:26-150)
# ---------------------------------------------------------------------------


def _install_torch_scatter_stub():
    """torch_scatter.scatter_min CPU stand-in with the same contract:
    (min, argmin) per index; untouched slots keep argmin == src.size(dim).
    Ties resolve to the smallest source index (CPU-deterministic)."""
    if "torch_scatter" in sys.modules:
        return
    mod = types.ModuleType("torch_scatter")

    def scatter_min(src, index, dim=-1, dim_size=None):
        assert dim in (-1, src.dim() - 1)
        s = src.numpy()
        ix = index.numpy()
        b = s.shape[0]
        n = s.shape[-1]
        out = np.full((b, dim_size), np.inf, s.dtype)
        arg = np.full((b, dim_size), n, np.int64)
        for bi in range(b):
            np.minimum.at(out[bi], ix[bi], s[bi])
            won = s[bi] == out[bi][ix[bi]]
            np.minimum.at(
                arg[bi], ix[bi][won], np.nonzero(won)[0].astype(np.int64)
            )
        out[~np.isfinite(out)] = 0
        return torch.from_numpy(out), torch.from_numpy(arg)

    mod.scatter_min = scatter_min
    sys.modules["torch_scatter"] = mod


def test_pc_transform_golden(ref):
    """Reference PCTransformModel.predict (4-neighbor splat + z-buffer,
    with a deterministic scatter_min stub) == our pc_transform_predict.

    Depths are unique multiples of 1/64 below 128 m, so the packed path's
    8-low-mantissa-bit truncation is lossless and no depth ties occur."""
    _install_torch_scatter_stub()
    from panoptic_forecasting.models.pc_transform import (
        pc_transform_model as ref_pc_mod,
    )

    # The module may have been imported before the stub existed (its
    # guarded ``import torch_scatter`` failed silently) — inject it.
    ref_pc_mod.torch_scatter = sys.modules["torch_scatter"]
    PCTransformModel = ref_pc_mod.PCTransformModel

    from panoptic_forecasting_tpu.geometry import (
        rdf_T_flu,
        unicycle_now_T_prev,
    )
    from panoptic_forecasting_tpu.models.pc_transform import (
        pc_transform_predict,
    )

    rng = np.random.RandomState(5)
    b_sz, t_in, h, w = 1, 2, 40, 64
    n = t_in * h * w
    depth = (
        2.0 + rng.permutation(n).astype(np.float32) / 64.0
    ).reshape(1, t_in, h, w)
    mask = (rng.rand(1, t_in, h, w) > 0.15)
    seg = rng.randint(0, 19, size=(1, t_in, h, w)).astype(np.int64)
    K = np.array(
        [[70.0, 0, w / 2], [0, 70.0, h / 2], [0, 0, 1]], np.float32
    )[None]
    # vehicle_T_camera for an RDF camera: 1.2 m up, slight yaw offset
    E = (np.array(
        [[0.998, -0.06, 0, 0.5],
         [0.06, 0.998, 0, 0.1],
         [0, 0, 1, 1.2],
         [0, 0, 0, 1]], np.float32) @ rdf_T_flu()).astype(np.float32)[None]
    Ts = np.asarray(
        unicycle_now_T_prev(
            np.array([4.0, 2.0], np.float32),
            np.array([0.05, -0.02], np.float32),
            0.35,
        ),
        np.float32,
    )[None]

    rmodel = ref_pc = PCTransformModel({"model": {}})
    with torch.no_grad():
        ref_out = ref_pc.predict(
            {
                "intrinsics": torch.from_numpy(K),
                "extrinsics": torch.from_numpy(E),
                "depth": torch.from_numpy(depth),
                "depth_mask": torch.from_numpy(mask),
                "target_T": torch.from_numpy(Ts),
                "seg": torch.from_numpy(seg),
            },
            None,
        )

    import jax.numpy as jnp

    mine = pc_transform_predict(
        jnp.asarray(seg.astype(np.int32)),
        jnp.asarray(depth),
        jnp.asarray(mask),
        jnp.asarray(K),
        jnp.asarray(E),
        jnp.asarray(Ts),
        height=h,
        width=w,
        method="packed",
    )
    ref_seg = ref_out["seg"][0].numpy()
    my_seg = np.asarray(mine["seg"][0])
    mismatch = (my_seg != ref_seg).sum()
    assert mismatch == 0, f"{mismatch} label pixels differ"
    # Depths: compare where a valid point won (the reference's empty-pixel
    # sentinel is max-over-all+1, ours is max-over-valid+1 — both above
    # every valid depth, values differ only on invalid-only pixels).
    ref_d = ref_out["depth"][0].numpy()
    my_d = np.asarray(mine["depth"][0])
    valid_px = (ref_d > 0) & (ref_d <= depth.max() + 0.5)
    # The packed path truncates the forecast depth's 8 low mantissa bits
    # (<= 255/2^23 ~ 3.04e-5 relative — far below the 1/256 m export PNG
    # quantization).
    np.testing.assert_allclose(
        my_d[valid_px], ref_d[valid_px], rtol=3.1e-5, atol=1e-5
    )
    assert valid_px.mean() > 0.3  # the comparison actually covers pixels


# ---------------------------------------------------------------------------
# Golden LOSS parity: loss() dicts vs the reference's own losses on shared
# random weights/batches (odom_model.py:104-115, bg_model.py:73-89,
# losses.py:14-189 + fg_model.py:341-386).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_normalized_loss", [True, False])
@pytest.mark.parametrize("loss_fn", ["mse", "smooth_l1"])
def test_odom_loss_golden(ref, use_normalized_loss, loss_fn):
    torch.manual_seed(0)
    mean = torch.tensor([1.5, -0.2])
    std = torch.tensor([2.0, 0.5])
    params = {
        "model": {"predict_type": "direct", "normalize_input": True,
                  "use_normalized_loss": use_normalized_loss,
                  "rnn_hidden": 16, "loss_fn": loss_fn, "out_layers": []},
        "data": {"odom_norm_params": (mean, std)},
    }
    rmodel = ref.OdomModel(params).eval()
    rng = np.random.RandomState(11)
    x = rng.randn(4, 9, 2).astype(np.float32)
    y = rng.randn(4, 9, 2).astype(np.float32)
    with torch.no_grad():
        ref_loss = rmodel.loss(
            {"odometry": torch.from_numpy(x)},
            {"odometry": torch.from_numpy(y)},
        )["loss"].numpy()

    from panoptic_forecasting_tpu.data.cards import DataCard
    from panoptic_forecasting_tpu.models import reference_import as ri
    from panoptic_forecasting_tpu.models.odom import OdomModel as MyOdom

    jparams, stats = ri.odom_from_reference(rmodel.state_dict())
    card = DataCard(task="odom")
    for name, (m, s) in stats.items():
        card.set_stats(name, m, s)
    mine = MyOdom(
        {"model": {"predict_type": "direct", "rnn_hidden": 16,
                   "loss_fn": loss_fn, "normalize_input": True,
                   "use_normalized_loss": use_normalized_loss},
         "data": {"output_len": 9}},
        card,
    )
    _, metrics, _ = mine.loss(
        jparams, {},
        {"inputs": {"odometry": jnp.asarray(x)},
         "labels": {"odometry": jnp.asarray(y)}},
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), ref_loss, rtol=1e-5, atol=1e-6
    )


def test_bg_loss_golden(ref):
    """BG CrossEntropy(ignore 255) + accuracy vs the reference BGModel
    (bg_model.py:73-89) with imported weights, 36-ch one-hot+depth stack."""
    from panoptic_forecasting.models.bg.bg_model import BGModel as RefBG

    torch.manual_seed(0)
    params = {
        "model": {"num_inputs": 3, "convert2onehot": True,
                  "use_depth_inps": True, "hardnet": {}},
        "data": {"num_classes": 11,
                 "depth_norm_params": (torch.tensor([12.0]),
                                       torch.tensor([7.0]))},
    }
    rmodel = RefBG(params).eval()
    with torch.no_grad():
        for m in rmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(13)
    b, t, h, w = 2, 3, 64, 128
    seg = rng.randint(0, 14, size=(b, t, h, w))  # some ids >= 11 -> zeroed
    depth = (rng.rand(b, t, h, w) * 40 + 1).astype(np.float32)
    dmask = rng.rand(b, t, h, w) > 0.2
    labels = rng.randint(0, 11, size=(b, h, w))
    labels[rng.rand(b, h, w) > 0.8] = 255  # ignore_index pixels

    with torch.no_grad():
        ref_res = rmodel.loss(
            {"seg": torch.from_numpy(seg.copy()),
             "depth": torch.from_numpy(depth),
             "depth_mask": torch.from_numpy(dmask.astype(np.float32))},
            {"seg": torch.from_numpy(labels)},
        )

    from panoptic_forecasting_tpu.data.cards import DataCard
    from panoptic_forecasting_tpu.models import reference_import as ri
    from panoptic_forecasting_tpu.models.base import split_variables
    from panoptic_forecasting_tpu.models.bg import BGModel as MyBG

    variables, stats = ri.bg_from_reference(rmodel.state_dict())
    card = DataCard(task="bg", num_classes=11)
    for name, (m, s) in stats.items():
        card.set_stats(name, m, s)
    mine = MyBG(
        {"model": {"num_inputs": 3, "convert2onehot": True,
                   "use_depth_inps": True},
         "data": {"num_classes": 11}},
        card,
    )
    jparams, state = split_variables(
        jax.tree_util.tree_map(jnp.asarray, variables)
    )
    loss, metrics, _ = mine.loss(
        jparams, state,
        {"inputs": {"seg": jnp.asarray(seg),
                    "depth": jnp.asarray(depth),
                    "depth_mask": jnp.asarray(dmask)},
         "labels": {"seg": jnp.asarray(labels)}},
        train=False,
    )
    np.testing.assert_allclose(
        float(loss), float(ref_res["loss"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["accuracy"]), float(ref_res["accuracy"]),
        rtol=1e-6, atol=1e-6,
    )


def test_fg_loss_golden(ref):
    """All fg loss/metric keys (traj smoothl1, center L2, FDE, size L1,
    depth L2, mask distill, combined loss) vs the reference's own
    TrajectoryLoss/DefaultMaskLoss reductions (losses.py:14-189)."""
    rmodel, _ = _build_ref_fg(ref)
    rng = np.random.RandomState(17)
    n, t_in, t_out = 4, 3, 3
    d = _fg_inputs(n, rng, t_in, t_out)
    feat_masks = (rng.rand(n, t_in + t_out) > 0.2)
    feat_masks[:, 0] = True
    lab_feats = rng.randn(n, t_out, 256, 14, 14).astype(np.float32)
    lab_depths = (rng.rand(n, t_out, 2).astype(np.float32) * 30 + 1)
    lab_dmask = (rng.rand(n, t_out, 1) > 0.2)

    t = torch.from_numpy
    ref_inputs = {
        "trajectories": t(d["trajectories"][:, :t_in]),
        "bbox_masks": t(d["bbox_masks"].astype(np.float32)),
        "bbox_vel_masks": t(d["bbox_vel_masks"].astype(np.float32)),
        "depths": t(d["depths"]),
        "depth_masks": t(d["depth_masks"].astype(np.float32)),
        "feats": t(d["feats"]),
        "feat_masks": t(feat_masks.astype(np.float32)),
        "odometry": t(d["odom"]),
        "classes": t(d["classes"]),
    }
    ref_labels = {
        "trajectories": t(d["trajectories"][:, t_in:]),
        "depths": t(lab_depths),
        "depth_masks": t(lab_dmask.astype(np.float32)),
        "feats": t(lab_feats),
        "output_inds": t(d["output_inds"]),
    }
    with torch.no_grad():
        ref_res = rmodel.loss(ref_inputs, ref_labels)

    mine, variables = _my_fg(rmodel)
    from panoptic_forecasting_tpu.models.base import split_variables

    jparams, state = split_variables(variables)
    batch = {
        "inputs": {
            "trajectories": d["trajectories"][:, :t_in],
            "bbox_masks": d["bbox_masks"],
            "bbox_vel_masks": d["bbox_vel_masks"],
            "depths": d["depths"],
            "depth_masks": d["depth_masks"],
            "feats": d["feats"],
            "feat_masks": feat_masks,
            "odometry": d["odom"],
            "classes": d["classes"],
        },
        "labels": {
            "trajectories": d["trajectories"][:, t_in:],
            "depths": lab_depths,
            "depth_masks": lab_dmask,
            "feats": lab_feats,
            "output_inds": d["output_inds"],
        },
    }
    _, metrics, _ = mine.loss(jparams, state, batch, train=False)

    keys = ["loss", "traj_2d_loss", "center_pixel_l2", "center_pixel_fde",
            "size_pixel_l1", "depth_l2", "mask_distill_loss"]
    for k in keys:
        ref_v = ref_res[k].numpy()
        my_v = np.asarray(metrics[k])
        np.testing.assert_allclose(
            my_v, ref_v, rtol=1e-5, atol=1e-6,
            err_msg=f"loss key {k} diverged",
        )


# ---------------------------------------------------------------------------
# Golden GRADIENT parity: d loss / d params vs the reference's own autograd.
# Every importer transform (transpose / reshape / gate-split / permutation)
# is linear, so mapping the torch *gradient* state_dict through the same
# importer yields the gradient in this package's parameter layout — the
# strongest available check that training dynamics match the reference
# (odom_model.py:104-115, bg_model.py:73-89, losses.py:14-189).
# ---------------------------------------------------------------------------


def _torch_grad_sd(rmodel, loss):
    """Backprop ``loss`` and return a state_dict-shaped mapping of grads
    (zeros for grad-less parameters and for buffers, so the importers see
    the full key set they expect)."""
    rmodel.zero_grad(set_to_none=True)
    # odom/fg losses are per-sample vectors; this package's train scalar is
    # their mean (models/odom.py:159-161, fg.py:461), so backprop the mean.
    loss.mean().backward()
    sd = {}
    for k, v in rmodel.named_parameters():
        sd[k] = (v.grad.detach().clone() if v.grad is not None
                 else torch.zeros_like(v))
    for k, v in rmodel.named_buffers():
        sd[k] = torch.zeros_like(v)
    return sd


_GRU_KEYS = {"ir", "iz", "in", "hr", "hz", "hn"}


def _fix_gru_bias_grads(tree):
    """gru_cell_params folds torch's duplicated r/z gate biases as
    ``b_ih + b_hh`` (torch_import.py:97-101). That map is linear but
    non-injective: both torch biases add into the same pre-activation, so
    their gradients are identical and the mapped SUM is 2x the gradient of
    the folded parameter. Halve ir/iz bias grads to undo it."""
    if isinstance(tree, dict):
        if _GRU_KEYS <= set(tree):
            out = dict(tree)
            for g in ("ir", "iz"):
                out[g] = dict(tree[g])
                out[g]["bias"] = tree[g]["bias"] * 0.5
            return out
        return {k: _fix_gru_bias_grads(v) for k, v in tree.items()}
    return tree


def _assert_grad_trees_close(my_grads, ref_grads, rtol=2e-4, atol=1e-6):
    ref_grads = _fix_gru_bias_grads(ref_grads)
    my_leaves = jax.tree_util.tree_flatten_with_path(my_grads)[0]
    ref_flat = {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    }
    assert my_leaves, "empty gradient tree"
    # Key sets must match BOTH ways: a leaf missing from my_grads (e.g. an
    # importer change silently dropping a parameter from the flax tree)
    # must fail, not pass vacuously.
    my_keys = {jax.tree_util.keystr(p) for p, _ in my_leaves}
    missing = set(ref_flat) - my_keys
    assert not missing, f"reference gradients with no flax leaf: {missing}"
    for path, leaf in my_leaves:
        key = jax.tree_util.keystr(path)
        assert key in ref_flat, f"no reference gradient for {key}"
        np.testing.assert_allclose(
            np.asarray(leaf), ref_flat[key], rtol=rtol, atol=atol,
            err_msg=f"gradient diverged at {key}",
        )


def test_odom_grad_golden(ref):
    torch.manual_seed(0)
    mean = torch.tensor([1.5, -0.2])
    std = torch.tensor([2.0, 0.5])
    params = {
        "model": {"predict_type": "direct", "normalize_input": True,
                  "use_normalized_loss": True, "rnn_hidden": 16,
                  "loss_fn": "mse", "out_layers": []},
        "data": {"odom_norm_params": (mean, std)},
    }
    rmodel = ref.OdomModel(params).eval()
    rng = np.random.RandomState(11)
    x = rng.randn(4, 9, 2).astype(np.float32)
    y = rng.randn(4, 9, 2).astype(np.float32)
    ref_loss = rmodel.loss(
        {"odometry": torch.from_numpy(x)},
        {"odometry": torch.from_numpy(y)},
    )["loss"]

    from panoptic_forecasting_tpu.data.cards import DataCard
    from panoptic_forecasting_tpu.models import reference_import as ri
    from panoptic_forecasting_tpu.models.odom import OdomModel as MyOdom

    ref_grads, _ = ri.odom_from_reference(_torch_grad_sd(rmodel, ref_loss))

    jparams, stats = ri.odom_from_reference(rmodel.state_dict())
    card = DataCard(task="odom")
    for name, (m, s) in stats.items():
        card.set_stats(name, m, s)
    mine = MyOdom(
        {"model": {"predict_type": "direct", "rnn_hidden": 16,
                   "loss_fn": "mse", "normalize_input": True,
                   "use_normalized_loss": True},
         "data": {"output_len": 9}},
        card,
    )
    batch = {"inputs": {"odometry": jnp.asarray(x)},
             "labels": {"odometry": jnp.asarray(y)}}
    my_grads = jax.grad(lambda p: mine.loss(p, {}, batch, train=False)[0])(
        jparams
    )
    _assert_grad_trees_close(my_grads, ref_grads)


def test_bg_grad_golden(ref):
    """HarDNet conv + BN scale/bias gradients of the CE loss (eval-mode BN
    on both sides; running stats carry no gradient and are excluded)."""
    from panoptic_forecasting.models.bg.bg_model import BGModel as RefBG

    torch.manual_seed(0)
    params = {
        "model": {"num_inputs": 3, "convert2onehot": True,
                  "use_depth_inps": True, "hardnet": {}},
        "data": {"num_classes": 11,
                 "depth_norm_params": (torch.tensor([12.0]),
                                       torch.tensor([7.0]))},
    }
    rmodel = RefBG(params).eval()
    with torch.no_grad():
        for m in rmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(13)
    b, t, h, w = 2, 3, 64, 128
    seg = rng.randint(0, 14, size=(b, t, h, w))
    depth = (rng.rand(b, t, h, w) * 40 + 1).astype(np.float32)
    dmask = rng.rand(b, t, h, w) > 0.2
    labels = rng.randint(0, 11, size=(b, h, w))
    labels[rng.rand(b, h, w) > 0.8] = 255

    ref_res = rmodel.loss(
        {"seg": torch.from_numpy(seg.copy()),
         "depth": torch.from_numpy(depth),
         "depth_mask": torch.from_numpy(dmask.astype(np.float32))},
        {"seg": torch.from_numpy(labels)},
    )

    from panoptic_forecasting_tpu.data.cards import DataCard
    from panoptic_forecasting_tpu.models import reference_import as ri
    from panoptic_forecasting_tpu.models.base import split_variables
    from panoptic_forecasting_tpu.models.bg import BGModel as MyBG

    ref_gvars, _ = ri.bg_from_reference(
        _torch_grad_sd(rmodel, ref_res["loss"])
    )
    ref_grads, _ = split_variables(ref_gvars)

    variables, stats = ri.bg_from_reference(rmodel.state_dict())
    card = DataCard(task="bg", num_classes=11)
    for name, (m, s) in stats.items():
        card.set_stats(name, m, s)
    mine = MyBG(
        {"model": {"num_inputs": 3, "convert2onehot": True,
                   "use_depth_inps": True},
         "data": {"num_classes": 11}},
        card,
    )
    jparams, state = split_variables(
        jax.tree_util.tree_map(jnp.asarray, variables)
    )
    batch = {"inputs": {"seg": jnp.asarray(seg),
                        "depth": jnp.asarray(depth),
                        "depth_mask": jnp.asarray(dmask)},
             "labels": {"seg": jnp.asarray(labels)}}
    my_grads = jax.grad(
        lambda p: mine.loss(p, state, batch, train=False)[0]
    )(jparams)
    # CE through a 70-layer net: slightly looser than the shallow models.
    _assert_grad_trees_close(my_grads, ref_grads, rtol=5e-3, atol=2e-5)


def test_fg_grad_golden(ref):
    """Gradients of the combined traj+distill fg loss through the coupled
    encoder/decoder, ConvLSTMs, and mask head (losses.py:14-189)."""
    rmodel, _ = _build_ref_fg(ref)
    rng = np.random.RandomState(17)
    n, t_in, t_out = 4, 3, 3
    d = _fg_inputs(n, rng, t_in, t_out)
    feat_masks = (rng.rand(n, t_in + t_out) > 0.2)
    feat_masks[:, 0] = True
    lab_feats = rng.randn(n, t_out, 256, 14, 14).astype(np.float32)
    lab_depths = (rng.rand(n, t_out, 2).astype(np.float32) * 30 + 1)
    lab_dmask = (rng.rand(n, t_out, 1) > 0.2)

    t = torch.from_numpy
    ref_inputs = {
        "trajectories": t(d["trajectories"][:, :t_in]),
        "bbox_masks": t(d["bbox_masks"].astype(np.float32)),
        "bbox_vel_masks": t(d["bbox_vel_masks"].astype(np.float32)),
        "depths": t(d["depths"]),
        "depth_masks": t(d["depth_masks"].astype(np.float32)),
        "feats": t(d["feats"]),
        "feat_masks": t(feat_masks.astype(np.float32)),
        "odometry": t(d["odom"]),
        "classes": t(d["classes"]),
    }
    ref_labels = {
        "trajectories": t(d["trajectories"][:, t_in:]),
        "depths": t(lab_depths),
        "depth_masks": t(lab_dmask.astype(np.float32)),
        "feats": t(lab_feats),
        "output_inds": t(d["output_inds"]),
    }
    ref_res = rmodel.loss(ref_inputs, ref_labels)

    from panoptic_forecasting_tpu.models import reference_import as ri
    from panoptic_forecasting_tpu.models.base import split_variables

    ref_grads, _ = ri.fg_from_reference(
        _torch_grad_sd(rmodel, ref_res["loss"]),
        instance_feat_channels=8, feat_hw=14,
    )

    mine, variables = _my_fg(rmodel)
    jparams, state = split_variables(variables)
    batch = {
        "inputs": {
            "trajectories": d["trajectories"][:, :t_in],
            "bbox_masks": d["bbox_masks"],
            "bbox_vel_masks": d["bbox_vel_masks"],
            "depths": d["depths"],
            "depth_masks": d["depth_masks"],
            "feats": d["feats"],
            "feat_masks": feat_masks,
            "odometry": d["odom"],
            "classes": d["classes"],
        },
        "labels": {
            "trajectories": d["trajectories"][:, t_in:],
            "depths": lab_depths,
            "depth_masks": lab_dmask,
            "feats": lab_feats,
            "output_inds": d["output_inds"],
        },
    }
    my_grads = jax.grad(
        lambda p: mine.loss(p, state, batch, train=False)[0]
    )(jparams)
    # atol covers float-noise on near-zero elements of O(100) gradients
    # flowing through the unrolled coupled scan (measured max 2.3e-5).
    _assert_grad_trees_close(my_grads, ref_grads, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# Data transforms: pad/crop/flip geometry vs the reference's own transforms
# ---------------------------------------------------------------------------


def _ref_transforms(monkeypatch, s_val, ints):
    """Import the reference transforms with its random draws pinned:
    random.uniform -> s_val, random.randint -> successive ``ints``."""
    _install_reference_stubs()
    from panoptic_forecasting.data import transforms as ref_t

    it = iter(ints)
    monkeypatch.setattr(ref_t.random, "uniform", lambda a, b: s_val)
    monkeypatch.setattr(ref_t.random, "randint", lambda a, b: next(it))
    return ref_t


class _FixedRng:
    """np.random.RandomState stand-in yielding the same pinned draws."""

    def __init__(self, s_val, ints, rand=0.9):
        self.s_val, self._ints, self._rand = s_val, iter(ints), rand

    def uniform(self, a, b):
        return self.s_val

    def randint(self, a, b):  # ours is exclusive-high; same value fits both
        return next(self._ints)

    def rand(self):
        return self._rand


def _sample(h=40, w=60, seed=3):
    rng = np.random.RandomState(seed)
    segs = [rng.randint(0, 34, (h, w)).astype(np.uint8) for _ in range(3)]
    gt = rng.randint(0, 34, (h, w)).astype(np.uint8)
    arrs = [rng.rand(h, w, 1).astype(np.float32)]
    return segs, gt, arrs


def _as_pil(segs, gt):
    from PIL import Image

    return [Image.fromarray(x) for x in segs], Image.fromarray(gt)


def test_transforms_crop_golden_no_resize(monkeypatch):
    """Crop smaller than the image at scale 1 (crop == target, resize is
    identity): geometry and content must match the reference exactly
    (RandomSizeAndCropMasks_Faster, transforms.py:169-274)."""
    from panoptic_forecasting_tpu.data.transforms import RandomScaleCrop

    segs, gt, arrs = _sample()
    x1, y1 = 5, 3
    ref_t = _ref_transforms(monkeypatch, 1.0, [x1, y1])
    ref_crop = ref_t.RandomSizeAndCropMasks_Faster(
        32, crop_nopad=False, scale_min=0.5, scale_max=2.0,
        ignore_index=255,
    )
    psegs, pgt = _as_pil(segs, gt)
    r_segs, r_gt, r_arrs = ref_crop(psegs, pgt, [a.copy() for a in arrs])

    mine = RandomScaleCrop(32, 0.5, 2.0, ignore_index=255)
    m_segs, m_gt, m_arrs = mine(
        [x.copy() for x in segs], gt.copy(), [a.copy() for a in arrs],
        _FixedRng(1.0, [x1, y1]),
    )
    for r, m in zip(r_segs, m_segs):
        np.testing.assert_array_equal(np.array(r), m)
    np.testing.assert_array_equal(np.array(r_gt), m_gt)
    for r, m in zip(r_arrs, m_arrs):
        np.testing.assert_allclose(np.asarray(r).reshape(m.shape), m)


def test_transforms_crop_golden_with_padding(monkeypatch):
    """Crop taller than the image: the ignore-index padding geometry must
    match the reference (border (crop-h)//2+1, fill 255 for labels, 0 for
    float arrays; transforms.py:197-222)."""
    from panoptic_forecasting_tpu.data.transforms import RandomScaleCrop

    segs, gt, arrs = _sample(h=40, w=60)
    # size 48 at s=1: crop_h 48 > 40 -> pad; crop_w 48 < 60 -> random x1.
    x1, y1 = 7, 1
    ref_t = _ref_transforms(monkeypatch, 1.0, [x1, y1])
    ref_crop = ref_t.RandomSizeAndCropMasks_Faster(
        48, crop_nopad=False, scale_min=0.5, scale_max=2.0,
        ignore_index=255,
    )
    psegs, pgt = _as_pil(segs, gt)
    r_segs, r_gt, r_arrs = ref_crop(psegs, pgt, [a.copy() for a in arrs])

    mine = RandomScaleCrop(48, 0.5, 2.0, ignore_index=255)
    m_segs, m_gt, m_arrs = mine(
        [x.copy() for x in segs], gt.copy(), [a.copy() for a in arrs],
        _FixedRng(1.0, [x1, y1]),
    )
    for r, m in zip(r_segs, m_segs):
        np.testing.assert_array_equal(np.array(r), m)
    np.testing.assert_array_equal(np.array(r_gt), m_gt)
    for r, m in zip(r_arrs, m_arrs):
        np.testing.assert_allclose(np.asarray(r).reshape(m.shape), m)
    assert (m_gt == 255).any()  # padding actually happened


def test_transforms_crop_golden_scaled_arrs(monkeypatch):
    """Scaled crop (s != 1, real resize): float arrays must match exactly —
    both sides resize arrs with cv2 INTER_NEAREST. (Label maps go through
    PIL in the reference vs cv2 here; PIL and cv2 nearest disagree on
    boundary pixels, so labels are compared in the no-resize cases.)"""
    from panoptic_forecasting_tpu.data.transforms import RandomScaleCrop

    segs, gt, arrs = _sample(h=50, w=70)
    s = 1.4  # crop 44x44 -> resized back to 32x32
    x1, y1 = 11, 2
    ref_t = _ref_transforms(monkeypatch, s, [x1, y1])
    ref_crop = ref_t.RandomSizeAndCropMasks_Faster(
        32, crop_nopad=False, scale_min=0.5, scale_max=2.0,
        ignore_index=255,
    )
    psegs, pgt = _as_pil(segs, gt)
    _, _, r_arrs = ref_crop(psegs, pgt, [a.copy() for a in arrs])

    mine = RandomScaleCrop(32, 0.5, 2.0, ignore_index=255)
    _, _, m_arrs = mine(
        [x.copy() for x in segs], gt.copy(), [a.copy() for a in arrs],
        _FixedRng(s, [x1, y1]),
    )
    for r, m in zip(r_arrs, m_arrs):
        np.testing.assert_allclose(np.asarray(r).reshape(m.shape), m)


def test_transforms_flip_golden(monkeypatch):
    """Forced flip matches the reference's FLIP_LEFT_RIGHT exactly
    (transforms.py:276-293)."""
    from panoptic_forecasting_tpu.data.transforms import (
        RandomHorizontalFlip,
    )

    segs, gt, arrs = _sample()
    _install_reference_stubs()
    from panoptic_forecasting.data import transforms as ref_t

    monkeypatch.setattr(ref_t.random, "random", lambda: 0.1)  # flips
    psegs, pgt = _as_pil(segs, gt)
    r_segs, r_gt, r_arrs = ref_t.RandomHorizontallyFlip()(
        psegs, pgt, [a.copy() for a in arrs]
    )

    m_segs, m_gt, m_arrs = RandomHorizontalFlip()(
        [x.copy() for x in segs], gt.copy(), [a.copy() for a in arrs],
        _FixedRng(0, [], rand=0.1),  # < 0.5 flips, same convention
    )
    for r, m in zip(r_segs, m_segs):
        np.testing.assert_array_equal(np.array(r), m)
    np.testing.assert_array_equal(np.array(r_gt), m_gt)
    for r, m in zip(r_arrs, m_arrs):
        np.testing.assert_allclose(np.asarray(r).reshape(m.shape), m)
