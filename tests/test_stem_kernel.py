"""Fused one-hot stem kernel (kernels/stem.py) vs the XLA reference.

The kernel replaces BGModel._assemble + the folded base_0 ConvLayer
(reference semantics: bg_model.py:53-69 + hardnet.py:274) for serving.
Interpret mode runs the real kernel logic on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from panoptic_forecasting_tpu.kernels.stem import (
    onehot_stem_conv,
    stem_reference,
)


def _rand_case(rng, b, t, h, w, c, c_out, with_depth=True):
    seg = rng.randint(0, c + 3, (b, t, h, w)).astype(np.int32)
    depth = (
        rng.randn(b, t, h, w).astype(np.float32) if with_depth else None
    )
    c_in = t * c + (t if with_depth else 0)
    kern = rng.randn(3, 3, c_in, c_out).astype(np.float32) * 0.2
    bias = rng.randn(c_out).astype(np.float32)
    return seg, depth, kern, bias


@pytest.mark.parametrize(
    "b,t,h,w,c,c_out",
    [
        (1, 3, 32, 64, 11, 16),  # shipped shape family
        (2, 3, 32, 32, 11, 16),  # batched
        (1, 2, 16, 48, 5, 8),    # odd class/frame counts
    ],
)
def test_stem_kernel_matches_reference(b, t, h, w, c, c_out):
    rng = np.random.RandomState(b * 100 + h + c)
    seg, depth, kern, bias = _rand_case(rng, b, t, h, w, c, c_out)
    ref = stem_reference(seg, depth, kern, bias, num_classes=c)
    got = onehot_stem_conv(
        seg, depth, kern, bias, num_classes=c, interpret=True
    )
    assert got.shape == (b, h // 2, w // 2, c_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_stem_kernel_packed_out():
    """packed_out returns exactly pack_space2(plain output) — the
    phase-major 2×2-packed layout HarDNet's packed_stem path consumes."""
    from panoptic_forecasting_tpu.models.hardnet import pack_space2

    rng = np.random.RandomState(3)
    seg, depth, kern, bias = _rand_case(rng, 2, 3, 32, 64, 7, 16)
    plain = onehot_stem_conv(
        seg, depth, kern, bias, num_classes=7, interpret=True
    )
    packed = onehot_stem_conv(
        seg, depth, kern, bias, num_classes=7, interpret=True,
        packed_out=True,
    )
    np.testing.assert_array_equal(
        np.asarray(packed), np.asarray(pack_space2(plain))
    )


def test_stem_kernel_no_depth():
    rng = np.random.RandomState(7)
    seg, _, kern, bias = _rand_case(
        rng, 1, 3, 32, 64, 11, 16, with_depth=False
    )
    ref = stem_reference(seg, None, kern, bias, num_classes=11)
    got = onehot_stem_conv(
        seg, None, kern, bias, num_classes=11, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_stem_kernel_masks_high_ids():
    """ids >= num_classes one-hot to all-zero rows (bg_model.py:53-59)."""
    rng = np.random.RandomState(3)
    seg, depth, kern, bias = _rand_case(rng, 1, 3, 16, 32, 11, 16)
    seg[0, :, :4] = 255  # void band
    ref = stem_reference(seg, depth, kern, bias, num_classes=11)
    got = onehot_stem_conv(
        seg, depth, kern, bias, num_classes=11, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bgmodel_forward_stem_kernel_route():
    """BGModel.forward with the stem kernel forced (interpret) equals the
    plain assembled XLA route on folded variables — binds the serving
    gate (_stem_kernel_on) to the kernel's numerics."""
    import jax
    from panoptic_forecasting_tpu.models.bg import BGModel

    rng = np.random.RandomState(5)
    base = {
        "data": {"num_classes": 11},
        "model": {"num_inputs": 3, "use_depth_inps": True,
                  "convert2onehot": True, "hardnet": {}},
    }
    batch = {
        "inputs": {
            "seg": rng.randint(0, 14, (1, 3, 64, 128)).astype(np.int32),
            "depth": (rng.rand(1, 3, 64, 128) * 60).astype(np.float32),
            "depth_mask": (rng.rand(1, 3, 64, 128) > 0.2),
        }
    }
    model = BGModel(base)
    variables = model.init(jax.random.PRNGKey(0), batch)
    folded = model.maybe_fold(variables)
    ref = model.forward(folded, batch)  # stem_kernel='auto' -> off on CPU

    cfg_k = dict(base, model=dict(base["model"], stem_kernel="interpret"))
    model_k = BGModel(cfg_k)
    got = model_k.forward(folded, batch)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4
    )


def test_stem_kernel_matches_bg_assemble_plus_conv():
    """End-to-end vs BGModel._assemble + folded base_0 ConvLayer."""
    import jax
    from panoptic_forecasting_tpu.models.bg import BGModel
    from panoptic_forecasting_tpu.models.hardnet import ConvLayer

    rng = np.random.RandomState(11)
    params = {
        "data": {"num_classes": 11},
        "model": {"num_inputs": 3, "use_depth_inps": True,
                  "convert2onehot": True, "hardnet": {}},
    }
    model = BGModel(params)
    seg = rng.randint(0, 14, (1, 3, 32, 64)).astype(np.int32)
    depth = (rng.rand(1, 3, 32, 64) * 60).astype(np.float32)
    dmask = (rng.rand(1, 3, 32, 64) > 0.2).astype(np.float32)
    x = model._assemble(
        jnp.asarray(seg), jnp.asarray(depth), jnp.asarray(dmask)
    )
    layer = ConvLayer(16, kernel=3, stride=2, folded=True)
    varbs = layer.init(jax.random.PRNGKey(0), x)
    ref = layer.apply(varbs, x)
    kern = varbs["params"]["conv"]["kernel"]
    bias = varbs["params"]["conv"]["bias"]
    dep_assembled = depth * dmask  # no data card: mean 0, std 1
    got = onehot_stem_conv(
        seg, dep_assembled, kern, bias, num_classes=11, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5
    )


def test_bgmodel_return_argmax_parity():
    """forward(return_argmax=True) (CHW resize + in-graph argmax) equals
    argmax of the logits path — same interp matrices, same f32 numerics,
    same tie behavior."""
    import jax
    from panoptic_forecasting_tpu.models.bg import BGModel

    rng = np.random.RandomState(9)
    base = {
        "data": {"num_classes": 11},
        "model": {"num_inputs": 3, "use_depth_inps": True,
                  "convert2onehot": True, "hardnet": {}},
    }
    batch = {
        "inputs": {
            "seg": rng.randint(0, 14, (1, 3, 64, 128)).astype(np.int32),
            "depth": (rng.rand(1, 3, 64, 128) * 60).astype(np.float32),
            "depth_mask": (rng.rand(1, 3, 64, 128) > 0.2),
        }
    }
    model = BGModel(base)
    variables = model.init(jax.random.PRNGKey(1), batch)
    folded = model.maybe_fold(variables)
    logits = model.forward(folded, batch)
    seg_ref = np.argmax(np.asarray(logits), axis=-1)
    seg_fast = np.asarray(
        model.forward(folded, batch, return_argmax=True)
    )
    assert seg_fast.dtype == np.int32
    np.testing.assert_array_equal(seg_fast, seg_ref)
