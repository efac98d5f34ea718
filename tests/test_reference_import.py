"""Reference *.pt checkpoint importers: numerics vs torch, tree roundtrips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from panoptic_forecasting_tpu.models import reference_import as ri


def test_odom_checkpoint_forecast_matches_torch():
    """Full autoregressive forecast equality: torch GRU+head rolled the
    reference way (odom_model.py:74-102) vs our scanned OdomNet with
    imported weights."""
    torch.manual_seed(0)
    h, L = 16, 9
    gru = torch.nn.GRU(2, h, batch_first=True)
    head = torch.nn.Sequential(torch.nn.Linear(h, 2))
    x = torch.randn(3, 9, 2)

    with torch.no_grad():
        _, state = gru(x[:, :-1])
        cur = x[:, -1:]
        preds = []
        for _ in range(L):
            o, state = gru(cur, state)
            p = head(o)
            preds.append(p)
            cur = p
        ref = torch.cat(preds, dim=1).numpy()

    sd = {f"rnn.{k}": v for k, v in gru.state_dict().items()}
    sd.update({f"out.{k}": v for k, v in head.state_dict().items()})
    sd["odom_mean"] = torch.zeros(1, 2)
    sd["odom_std"] = torch.ones(1, 2)
    params, stats = ri.odom_from_reference(sd)
    assert "odom" in stats

    from panoptic_forecasting_tpu.models.odom import OdomNet

    net = OdomNet(rnn_hidden=h, output_len=L, predict_type="direct")
    out = net.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def _export_linear(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _export_conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _export_gru(sd, prefix, p):
    wir, wiz, win = (np.asarray(p[k]["kernel"]).T for k in ("ir", "iz", "in"))
    whr, whz, whn = (np.asarray(p[k]["kernel"]).T for k in ("hr", "hz", "hn"))
    h = whr.shape[0]
    sd[f"{prefix}.weight_ih_l0"] = np.concatenate([wir, wiz, win])
    sd[f"{prefix}.weight_hh_l0"] = np.concatenate([whr, whz, whn])
    # split the folded biases arbitrarily: all on the ih side for r/z
    sd[f"{prefix}.bias_ih_l0"] = np.concatenate(
        [np.asarray(p["ir"]["bias"]), np.asarray(p["iz"]["bias"]),
         np.asarray(p["in"]["bias"])]
    )
    sd[f"{prefix}.bias_hh_l0"] = np.concatenate(
        [np.zeros(h, np.float32), np.zeros(h, np.float32),
         np.asarray(p["hn"]["bias"])]
    )


def test_fg_checkpoint_roundtrip_tree():
    """Synthesize a reference-named FG state dict from our FGCore init and
    import it back — exact tree + value equality."""
    from panoptic_forecasting_tpu.models.fg import FGCore

    core = FGCore(rnn_hidden=32, mask_feat_channels=32, mask_feat_hw=7,
                  mask_head_conv_dim=32, instance_feat_hidden=16)
    rng = np.random.RandomState(0)
    enc_inp = jnp.asarray(rng.randn(2, 3, 60).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 3, 7, 7, 32).astype(np.float32))
    odom = jnp.asarray(rng.randn(2, 3, 5).astype(np.float32))
    import flax.linen as nn

    variables = nn.init(
        lambda m: (m(enc_inp, feats, odom, 3),
                   m.apply_mask_head(feats[:, 0])),
        core,
    )(jax.random.PRNGKey(0))
    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    sd = {}
    _export_gru(sd, "traj_encoder", p["traj_encoder"])
    _export_gru(sd, "traj_decoder", p["traj_decoder"])
    for side in ("traj_encoder_out", "traj_decoder_out"):
        head = p[side]
        if set(head) == {"out"}:
            _export_linear(sd, side, head["out"])
        else:
            n = len(head)
            for i in range(n - 1):
                _export_linear(sd, f"{side}.{2 * i}", head[f"hidden_{i}"])
            _export_linear(sd, f"{side}.{2 * (n - 1)}", head["out"])
    _export_linear(sd, "traj_feat_out", p["traj_feat_out"])
    _export_conv(sd, "instance_compressor", p["instance_compressor"])
    # inverse of the (h, w, c)->(c, h, w) flattening permutation
    k = np.asarray(p["instance_feat_model"]["kernel"])
    c, hw = core.instance_feat_channels, core.mask_feat_hw
    k_cmajor = k.reshape(hw, hw, c, -1).transpose(2, 0, 1, 3).reshape(
        c * hw * hw, -1
    )
    sd["instance_feat_model.weight"] = k_cmajor.T
    sd["instance_feat_model.bias"] = np.asarray(
        p["instance_feat_model"]["bias"]
    )
    for side in ("mask_encoder", "mask_decoder"):
        for i, cell in enumerate(sorted(p[side])):
            _export_conv(sd, f"{side}.cell_list.{i}.conv",
                         p[side][cell]["conv"])
    _export_conv(sd, "mask_encoder_out", p["mask_encoder_out"])
    _export_conv(sd, "mask_decoder_out", p["mask_decoder_out"])
    for kk in range(1, 5):
        _export_conv(sd, f"mask_head.mask_fcn{kk}", p["mask_head"][f"mask_fcn{kk}"])
    # deconv: inverse of deconv_kernel (flip + transpose)
    dk = np.asarray(p["mask_head"]["deconv"]["kernel"])
    sd["mask_head.deconv.weight"] = dk.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
    sd["mask_head.deconv.bias"] = np.asarray(p["mask_head"]["deconv"]["bias"])
    _export_conv(sd, "mask_head.predictor", p["mask_head"]["predictor"])
    sd["traj_mean"] = np.zeros((1, 8), np.float32)
    sd["traj_std"] = np.ones((1, 8), np.float32)
    sd = {k2: torch.as_tensor(np.ascontiguousarray(v)) for k2, v in sd.items()}

    imported, stats = ri.fg_from_reference(
        sd, instance_feat_channels=c, feat_hw=hw
    )
    assert "traj" in stats

    flat_a = dict(
        (jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree_util.tree_leaves_with_path(p)
    )
    flat_b = dict(
        (jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree_util.tree_leaves_with_path(imported)
    )
    assert set(flat_a) == set(flat_b)
    for kk, va in flat_a.items():
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(flat_b[kk]), atol=1e-6, err_msg=kk
        )
    # and the imported tree actually drives the forward
    out_tr, out_fe = core.apply(
        {"params": imported}, enc_inp, feats, odom, 3
    )
    ref_tr, ref_fe = core.apply({"params": p}, enc_inp, feats, odom, 3)
    np.testing.assert_allclose(np.asarray(out_tr), np.asarray(ref_tr),
                               atol=1e-5)
