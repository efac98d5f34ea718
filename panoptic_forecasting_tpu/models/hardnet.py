"""FCHarDNet-70 semantic segmentation network, NHWC / XLA-native.

Reference capability: ``models/bg/hardnet.py`` (itself adapted from the
public FCHarDNet, MIT-licensed). Architecture (hardnet.py:261-327):
4-conv stem → 5 HarDBlocks with 1×1 transitions and 2×2 avg-pool
downsampling → 4-stage decoder of bilinear-upsample(align_corners=True) +
skip-concat + 1×1 halving conv + HarDBlock → 1×1 class head → bilinear
resize to input (or ``final_size``).

HarDBlock "harmonic" connectivity (hardnet.py:177-240): layer L takes input
from layers L−2ⁱ for every i with 2ⁱ | L; growth channels scale by
grmul^i, rounded to even; block output concatenates the last layer + every
odd-indexed layer (+ base if keepBase).

TPU re-design notes: NHWC layout (TPU-native), explicit torch-equivalent
conv padding (k//2 each side) so imported weights are bit-compatible,
BatchNorm with torch momentum/eps, and a hand-rolled separable
align_corners=True bilinear resize (jax.image.resize implements only
half-pixel sampling). ``expand_first_layer``/``expand_last_layer``
(hardnet.py:329-339) are handled at weight-import/init time by the BG model.
The reference's inference-only ``HarDBlock_v2``/``v2_transform`` conv+BN
weight folding (hardnet.py:38-173,341-351 — dead code there, never called)
is realized live here as ``fold_batchnorm_variables`` + ``folded=True``:
the inference graph runs bias-convs with no BN ops at all.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def hard_block_links(n_layers: int, base_ch: int, growth: int, grmul: float):
    """Per-layer (out_ch, in_ch, link) + block out channels.

    Pure reimplementation of the harmonic link rule (hardnet.py:177-194).
    """

    def get_link(layer):
        if layer == 0:
            return base_ch, 0, []
        out_channels = float(growth)
        link = []
        for i in range(10):
            dv = 2 ** i
            if layer % dv == 0:
                link.append(layer - dv)
                if i > 0:
                    out_channels *= grmul
        out_channels = int(int(out_channels + 1) / 2) * 2
        in_channels = sum(get_link(l)[0] for l in link)
        return out_channels, in_channels, link

    layers = [get_link(i + 1) for i in range(n_layers)]
    out_ch = sum(
        oc for i, (oc, _, _) in enumerate(layers)
        if i % 2 == 0 or i == n_layers - 1
    )
    return layers, out_ch


def _interp_matrix(n_in: int, n_out: int, dtype) -> jnp.ndarray:
    """(n_out, n_in) align_corners=True linear-interp matrix.

    Row o holds (1−w) at lo(o) and w at hi(o) — the exact lerp weights of
    torch ``F.interpolate(align_corners=True)``. Expressing the resize as
    two small matmuls keeps it on the MXU; the previous two-gather
    formulation cost ~3 ms/frame in gather + layout-copy churn at
    1024x2048 (profiled on v5e).
    """
    if n_out == 1 or n_in == 1:
        r = jnp.zeros((n_out, n_in), dtype)
        return r.at[:, 0].set(1)
    src = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.clip(lo + 1, 0, n_in - 1)
    w = src - lo.astype(jnp.float32)
    cols = jnp.arange(n_in, dtype=jnp.int32)[None, :]
    r = jnp.where(cols == lo[:, None], (1 - w)[:, None], 0.0) + jnp.where(
        cols == hi[:, None], w[:, None], 0.0
    )
    return r.astype(dtype)


def resize_bilinear_align_corners(x: jnp.ndarray, size: Tuple[int, int]):
    """Bilinear resize with align_corners=True on (..., H, W, C) arrays.

    Matches ``F.interpolate(mode='bilinear', align_corners=True)``:
    src = dst * (H_in − 1) / (H_out − 1). Separable interp-matrix matmuls
    (MXU) instead of gathers.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    if h_out != h_in:
        rh = _interp_matrix(h_in, h_out, x.dtype)
        x = jnp.einsum("oh,...hwc->...owc", rh, x)
    if w_out != w_in:
        rw = _interp_matrix(w_in, w_out, x.dtype)
        x = jnp.einsum("ow,...hwc->...hoc", rw, x)
    return x


def resize_bilinear_packed_out(x: jnp.ndarray, size: Tuple[int, int]):
    """align_corners resize of (..., H, W, C) emitting the 2×2-packed
    (..., H_out/2, W_out/2, 4C) layout directly: the packed output's
    phase (ph, pw) rows are just the odd/even rows of the interp
    matrices, so packing costs 4 quarter-size einsums instead of a
    full-size relayout after the resize."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    assert h_out % 2 == 0 and w_out % 2 == 0, size
    rh = _interp_matrix(h_in, h_out, x.dtype)
    rw = _interp_matrix(w_in, w_out, x.dtype)
    outs = []
    for ph in (0, 1):
        xh = jnp.einsum("oh,...hwc->...owc", rh[ph::2], x)
        for pw in (0, 1):
            outs.append(jnp.einsum("ow,...hwc->...hoc", rw[pw::2], xh))
    return jnp.concatenate(outs, axis=-1)


def resize_bilinear_hw(x: jnp.ndarray, size: Tuple[int, int]):
    """Same align_corners resize on channels-leading (..., H, W) arrays.

    At full Cityscapes resolution a (B, H, W, 11) logits tensor lane-pads
    11 -> 128 (~1 GB of hidden traffic); with channels as leading pages
    and W on lanes the arrays are exact-sized. Numerics are identical
    (same interp matrices, per-channel separable matmuls)."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    if h_out != h_in:
        rh = _interp_matrix(h_in, h_out, x.dtype)
        x = jnp.einsum("oh,...hw->...ow", rh, x)
    if w_out != w_in:
        rw = _interp_matrix(w_in, w_out, x.dtype)
        x = jnp.einsum("ow,...hw->...ho", rw, x)
    return x


def _space_to_depth_conv(x, w, bias, dtype):
    """3×3 stride-2 conv evaluated as a 2×2 conv over 2×2-packed input.

    The 36-channel full-resolution stem conv pays ~2.7 ms at 1024×2048 in
    input relayout (profiled round 2, docs/perf_notes.md): 36 channels tile
    poorly onto the MXU's 128-lane axis. Packing 2×2 pixel blocks into
    channels (H, W, C) → (H/2, W/2, 4C) makes the channel axis 144 and the
    conv stride-1 — same math (each output pixel of a stride-2/pad-1 3×3
    conv reads rows 2i−1..2i+1, which the 2×2 window over packed blocks
    a−1..a covers), with the kernel re-indexed as
    ``w2[p, q, (dr, dc, c)] = w[2p+dr−1, 2q+dc−1, c]`` (zero outside the
    3×3 support). Requires even H, W.
    """
    c_in, c_out = w.shape[2], w.shape[3]
    b, h, wd = x.shape[0], x.shape[1], x.shape[2]
    xp = x.reshape(b, h // 2, 2, wd // 2, 2, c_in)
    xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c_in)
    w2 = jnp.zeros((2, 2, 4 * c_in, c_out), w.dtype)
    for p in (0, 1):
        for dr in (0, 1):
            r = 2 * p + dr - 1
            if not 0 <= r <= 2:
                continue
            for q in (0, 1):
                for dc in (0, 1):
                    cc = 2 * q + dc - 1
                    if not 0 <= cc <= 2:
                        continue
                    sl = (dr * 2 + dc) * c_in
                    w2 = w2.at[p, q, sl : sl + c_in, :].set(w[r, cc])
    out = jax.lax.conv_general_dilated(
        xp.astype(dtype), w2.astype(dtype), (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


def _seg_scatter(wp, u, v, q, oc, c_out, w_tap, segments):
    """Place logical-channel rows of one kernel tap into the packed
    kernel, honouring the segment layout of a CONCAT of packed tensors:
    segment m's phase-q channels live at ``4·Σc_<m + q·c_m``."""
    base = lg = 0
    for cm in segments:
        ic = base + q * cm
        wp = wp.at[u, v, ic : ic + cm, oc : oc + c_out].add(
            w_tap[lg : lg + cm]
        )
        base += 4 * cm
        lg += cm
    return wp


def _pack_s1_weights(w, bias, segments=None):
    """3×3 stride-1 conv weights re-expressed over 2×2-packed space.

    With (H, W, C) packed to (H/2, W/2, 4C) (phase-major channel layout:
    ``(row_phase·2 + col_phase)·C + c``), the stride-1 conv becomes a 3×3
    conv over packed blocks producing all 4 output phases at once:
    output phase (ph, pw) at packed (a, b) is the original output pixel
    (2a+ph, 2b+pw), whose 3×3 support rows 2a+ph−1..2a+ph+1 live in
    packed blocks a−1..a+1 at row-phase (ph+dr−1) mod 2. Same math,
    4× the MACs (the MXU does not skip the structural zeros) — but the
    channel axis grows 4×, which is what makes XLA's conv emitter stop
    relayouting every small-channel tensor (docs/perf_notes.md round 5).

    ``segments`` describes the input as a channel-concat of independently
    packed tensors (HarDBlock link concats): logical sizes, summing to
    the kernel's C_in.
    """
    c_in, c_out = w.shape[2], w.shape[3]
    segments = tuple(segments) if segments else (c_in,)
    assert sum(segments) == c_in, (segments, c_in)
    wp = jnp.zeros((3, 3, 4 * c_in, 4 * c_out), w.dtype)
    for ph in (0, 1):
        for pw_ in (0, 1):
            oc = (ph * 2 + pw_) * c_out
            for dr in range(3):
                r_off = ph + dr - 1
                u, qr = r_off // 2 + 1, r_off % 2
                for dc in range(3):
                    c_off = pw_ + dc - 1
                    v, qc = c_off // 2 + 1, c_off % 2
                    wp = _seg_scatter(wp, u, v, qr * 2 + qc, oc, c_out,
                                      w[dr, dc], segments)
    bias_p = jnp.tile(bias, 4) if bias is not None else None
    return wp, bias_p


def _pack_s2_weights(w, bias, segments=None):
    """3×3 stride-2 conv weights, packed input AND packed output.

    Output phase (ph, pw) of packed output block a is original output
    pixel (2a+ph, ·), whose stride-2 3×3 support rows 2(2a+ph)−1..+1 sit
    in packed input blocks 2a−1..2a+1 — a 3×3 conv over the packed grid
    with stride 2, padding 1."""
    c_in, c_out = w.shape[2], w.shape[3]
    segments = tuple(segments) if segments else (c_in,)
    assert sum(segments) == c_in, (segments, c_in)
    wp = jnp.zeros((3, 3, 4 * c_in, 4 * c_out), w.dtype)
    for ph in (0, 1):
        for pw_ in (0, 1):
            oc = (ph * 2 + pw_) * c_out
            for dr in range(3):
                r_off = 2 * ph + dr - 1
                u, qr = r_off // 2 + 1, r_off % 2
                for dc in range(3):
                    c_off = 2 * pw_ + dc - 1
                    v, qc = c_off // 2 + 1, c_off % 2
                    wp = _seg_scatter(wp, u, v, qr * 2 + qc, oc, c_out,
                                      w[dr, dc], segments)
    bias_p = jnp.tile(bias, 4) if bias is not None else None
    return wp, bias_p


def _pack_entry_weights(w, bias):
    """3×3 stride-1 conv weights as a 4×4 stride-2 conv from UNPACKED
    input emitting the packed (4C_out) layout directly.

    Output phase (ph, pw) at packed (a, b) is original output pixel
    (2a+ph, 2b+pw); its 3×3 support rows 2a+ph−1..2a+ph+1 sit inside the
    4-row window 2a−1..2a+2 at offset ph+dr. One conv replaces
    pack_space2 (a measured 0.43 ms/frame of relayout copies at
    1024×2048) plus the packed stride-1 conv."""
    c_in, c_out = w.shape[2], w.shape[3]
    w4 = jnp.zeros((4, 4, c_in, 4 * c_out), w.dtype)
    for ph in (0, 1):
        for pw_ in (0, 1):
            oc = (ph * 2 + pw_) * c_out
            for dr in range(3):
                for dc in range(3):
                    w4 = w4.at[ph + dr, pw_ + dc, :, oc : oc + c_out].add(
                        w[dr, dc]
                    )
    bias_p = jnp.tile(bias, 4) if bias is not None else None
    return w4, bias_p


def _pack_entry_s2_weights(w, bias):
    """3×3 STRIDE-2 conv weights as a 5×5 stride-4 conv from UNPACKED
    input emitting the packed (4C_out) layout directly — the base_0 entry
    of the packed TRAINING path. Output phase (ph, pw) at packed (a, b)
    is stride-2 output pixel (2a+ph, ·), reading input rows
    4a+2ph−1..4a+2ph+1 inside the 5-row window 4a−1..4a+3 at offset
    2ph+dr. Padding (1, 0) on each spatial dim (torch stride-2/pad-1
    geometry; needs H, W ≡ 0 mod 4)."""
    c_in, c_out = w.shape[2], w.shape[3]
    w5 = jnp.zeros((5, 5, c_in, 4 * c_out), w.dtype)
    for ph in (0, 1):
        for pw_ in (0, 1):
            oc = (ph * 2 + pw_) * c_out
            for dr in range(3):
                for dc in range(3):
                    w5 = w5.at[2 * ph + dr, 2 * pw_ + dc, :,
                               oc : oc + c_out].add(w[dr, dc])
    bias_p = jnp.tile(bias, 4) if bias is not None else None
    return w5, bias_p


def _pack_1x1_weights(w, bias, segments=None):
    """1×1 conv weights over packed input: phase-block-diagonal kernel
    (a 1×1 conv commutes with packing)."""
    c_in, c_out = w.shape[2], w.shape[3]
    segments = tuple(segments) if segments else (c_in,)
    assert sum(segments) == c_in, (segments, c_in)
    wp = jnp.zeros((1, 1, 4 * c_in, 4 * c_out), w.dtype)
    for q in range(4):
        wp = _seg_scatter(wp, 0, 0, q, q * c_out, c_out, w[0, 0], segments)
    bias_p = jnp.tile(bias, 4) if bias is not None else None
    return wp, bias_p


def _prepacked_s2d_weights(w):
    """3×3 stride-2 conv weights over ALREADY-packed input (2×2 conv).

    The weight re-indexing of ``_space_to_depth_conv`` without the input
    packing step: output pixel (i, j) of the stride-2/pad-1 conv reads
    rows 2i−1..2i+1 == packed blocks i−1..i at row-phase (2p+dr−1) mod 2.
    Output is at half resolution, UNPACKED — consuming packed input with
    this conv is what lets the packed stem section end with zero unpack
    relayout."""
    c_in, c_out = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 4 * c_in, c_out), w.dtype)
    for p in (0, 1):
        for dr in (0, 1):
            r = 2 * p + dr - 1
            if not 0 <= r <= 2:
                continue
            for q in (0, 1):
                for dc in (0, 1):
                    cc = 2 * q + dc - 1
                    if not 0 <= cc <= 2:
                        continue
                    sl = (dr * 2 + dc) * c_in
                    w2 = w2.at[p, q, sl : sl + c_in, :].set(w[r, cc])
    return w2


def pack_space2(x):
    """(B, H, W, C) → (B, H/2, W/2, 4C), phase-major channel layout."""
    b, h, w, c = x.shape
    xp = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def unpack_space2(xp, segments=None):
    """Inverse of pack_space2 on a (possibly segment-concat) packed
    tensor: (B, A, J, 4·ΣC) → (B, 2A, 2J, ΣC)."""
    b, a, j, c4 = xp.shape
    segments = tuple(segments) if segments else (c4 // 4,)
    assert sum(segments) * 4 == c4, (segments, c4)
    outs = []
    base = 0
    for cm in segments:
        s = xp[..., base : base + 4 * cm].reshape(b, a, j, 2, 2, cm)
        s = s.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * a, 2 * j, cm)
        outs.append(s)
        base += 4 * cm
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


class _RawConvParams(nn.Module):
    """Declares {kernel, bias} at this module's own scope — the exact
    param tree of an nn.Conv of the same name (used by the packed
    finalConv path so variables stay interchangeable)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _ConvParams(nn.Module):
    """Declares conv params with nn.Conv's exact tree/shape/init so this
    layer's variables stay interchangeable with an nn.Conv("conv")."""

    features: int
    kernel: int
    in_features: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.in_features, self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return k, b


class ConvLayer(nn.Module):
    """conv(no bias, torch-style k//2 padding) → BN → ReLU (hardnet.py:16-25).

    ``dtype`` is the compute dtype (bf16 keeps convs on the MXU fast path
    and halves HBM traffic); params stay float32.

    ``folded`` is the inference variant: conv WITH bias, no BN — fed by
    ``fold_batchnorm_variables`` (the live re-design of the reference's
    dead ``HarDBlock_v2``/``v2_transform`` conv+BN weight folding,
    hardnet.py:38-173,341-351). ``s2d`` evaluates a 3×3 stride-2 conv via
    space-to-depth packing (see _space_to_depth_conv)."""

    out_channels: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    folded: bool = False
    s2d: bool = False
    # Input arrives 2×2-packed (pack_space2 layout). Params are declared
    # at the LOGICAL (unpacked) shape so folded variables stay
    # interchangeable with the plain layer; the packed-space weight
    # transform is applied at trace time. stride-1 (and 1×1) stay packed;
    # stride-2 consumes the packed blocks and emits unpacked half-res
    # output unless ``packed_out`` keeps it packed. ``segments`` is the
    # logical channel split when the input is a concat of packed tensors.
    packed_in: bool = False
    packed_out: bool = False
    segments: Optional[Tuple[int, ...]] = None
    # UNPACKED input → packed output via the 4×4 stride-2 entry conv
    # (_pack_entry_weights); replaces pack_space2 + a packed_in conv.
    pack_entry: bool = False
    # UNPACKED input → packed output for a STRIDE-2 layer via the 5×5
    # stride-4 entry conv (_pack_entry_s2_weights) — the base_0 entry of
    # the packed training path.
    pack_entry_s2: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        in_feat = x.shape[-1] // 4 if self.packed_in else x.shape[-1]
        k, b = _ConvParams(
            self.out_channels, self.kernel, in_feat, self.folded,
            name="conv",
        )()
        use_s2d = (
            self.s2d
            and self.kernel == 3
            and self.stride == 2
            and x.shape[-3] % 2 == 0
            and x.shape[-2] % 2 == 0
        )
        # Does this layer's OUTPUT carry the packed layout? (Everything
        # except the prepacked-s2d exit, which emits unpacked half-res.)
        packs_out = (
            self.pack_entry
            or self.pack_entry_s2
            or (self.packed_in
                and (self.kernel == 1 or self.stride == 1 or self.packed_out))
        )
        if self.pack_entry or self.pack_entry_s2:
            assert self.kernel == 3
            if self.pack_entry_s2:
                assert self.stride == 2
                we, bp = _pack_entry_s2_weights(k, b)
                stride, pad = (4, 4), ((1, 0), (1, 0))
            else:
                assert self.stride == 1
                we, bp = _pack_entry_weights(k, b)
                stride, pad = (2, 2), ((1, 1), (1, 1))
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), we.astype(self.dtype), stride, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bp is not None:
                x = x + bp.astype(self.dtype)
        elif self.packed_in:
            assert self.kernel in (1, 3) and self.stride in (1, 2)
            if self.kernel == 1:
                wp, bp = _pack_1x1_weights(k, b, self.segments)
                stride, pad = (1, 1), ((0, 0), (0, 0))
            elif self.stride == 1:
                wp, bp = _pack_s1_weights(k, b, self.segments)
                stride, pad = (1, 1), ((1, 1), (1, 1))
            elif self.packed_out:
                wp, bp = _pack_s2_weights(k, b, self.segments)
                stride, pad = (2, 2), ((1, 1), (1, 1))
            else:
                assert self.segments is None
                wp, bp = _prepacked_s2d_weights(k), b
                stride, pad = (1, 1), ((1, 0), (1, 0))
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), wp.astype(self.dtype), stride, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bp is not None:
                x = x + bp.astype(self.dtype)
        elif use_s2d:
            x = _space_to_depth_conv(x.astype(self.dtype), k, b, self.dtype)
        else:
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                k.astype(self.dtype),
                (self.stride, self.stride),
                ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if b is not None:
                x = x + b.astype(self.dtype)
        if not self.folded:
            bn = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="norm",
            )
            if packs_out:
                # BN over a packed tensor: expose the 4 phase slots as a
                # reduction axis so the stats are per LOGICAL channel —
                # same elements, same counts, and the same (C,) variable
                # shapes as the unpacked layer (training-path packing).
                shp = x.shape
                x = bn(x.reshape(shp[:-1] + (4, shp[-1] // 4))).reshape(shp)
            else:
                x = bn(x)
        return nn.relu(x)


class HarDBlock(nn.Module):
    in_channels: int
    growth: int
    grmul: float
    n_layers: int
    keep_base: bool = False
    dtype: Any = jnp.float32
    folded: bool = False
    # Run every layer over 2×2-packed space: each conv input is a concat
    # of independently packed segments (the harmonic links), handled by
    # the segment-aware weight transforms. Output is the packed concat of
    # the kept segments (logical sizes from ``out_segments``).
    packed: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        layer_specs, _ = hard_block_links(
            self.n_layers, self.in_channels, self.growth, self.grmul
        )
        outs = [x]
        sizes = [self.in_channels]  # logical channels per outs[i]
        for i, (out_ch, _, link) in enumerate(layer_specs):
            tin = [outs[l] for l in link]
            inp = jnp.concatenate(tin, axis=-1) if len(tin) > 1 else tin[0]
            segs = tuple(sizes[l] for l in link) if self.packed else None
            outs.append(
                ConvLayer(out_ch, dtype=self.dtype, folded=self.folded,
                          packed_in=self.packed, segments=segs,
                          name=f"layer_{i}")(inp, train=train)
            )
            sizes.append(out_ch)
        t = len(outs)
        keep = [
            outs[i]
            for i in range(t)
            if (i == 0 and self.keep_base) or i == t - 1 or i % 2 == 1
        ]
        return jnp.concatenate(keep, axis=-1)

    @staticmethod
    def out_ch(in_channels, growth, grmul, n_layers) -> int:
        return hard_block_links(n_layers, in_channels, growth, grmul)[1]

    @staticmethod
    def out_segments(in_channels, growth, grmul, n_layers,
                     keep_base: bool = False):
        """Logical channel sizes of the kept (concatenated) outputs —
        the segment layout of a packed block's output."""
        layer_specs, _ = hard_block_links(
            n_layers, in_channels, growth, grmul
        )
        sizes = [in_channels] + [oc for oc, _, _ in layer_specs]
        t = len(sizes)
        return tuple(
            sizes[i]
            for i in range(t)
            if (i == 0 and keep_base) or i == t - 1 or i % 2 == 1
        )


class HarDNet(nn.Module):
    """FCHarDNet-70. Input (B, H, W, C_in); returns logits at input (or
    ``final_size``) resolution, optionally with the pre-resize logits."""

    n_classes: int = 19
    dtype: Any = jnp.float32
    first_ch: Sequence[int] = (16, 24, 32, 48)
    ch_list: Sequence[int] = (64, 96, 160, 224, 320)
    grmul: float = 1.7
    gr: Sequence[int] = (10, 16, 18, 24, 32)
    n_layers: Sequence[int] = (4, 4, 8, 8, 8)
    folded: bool = False
    # Measured on v5e (round 3): the packed stem is ~2.3 ms SLOWER than
    # XLA's own handling of the 36-ch stride-2 conv (the packing transpose
    # materializes a second full-res copy); default off, kept as a
    # documented experiment switch.
    stem_s2d: bool = False
    # Serving path: the input is already the base_0 output, produced by
    # the fused one-hot Pallas stem (kernels/stem.py) — base_0 is skipped
    # (its params in the variables dict are simply unused).
    skip_stem0: bool = False
    # Run base_1/base_2 over 2×2-packed space (channels 64/96 instead of
    # 16/24): the fat channel axis stops XLA's conv emitter relayouting
    # every high-res tensor (~1 ms/frame of copies at 1024×2048,
    # docs/perf_notes.md round 5). Bit-equal math up to f32 reassociation;
    # requires skip_stem0 (the packed path starts at the stem output).
    packed_stem: bool = False
    # Packed TRAINING path: enter the packed region at base_0 itself via
    # the 5×5 stride-4 entry conv (full model, BN in packed space with
    # per-logical-channel stats). Input H, W must be multiples of 4.
    # Composes with packed_levels; ignored when skip_stem0.
    packed_full: bool = False
    # Number of encoder/decoder TIERS that also run packed (requires
    # packed_stem or packed_full). Tier i packs encoder block i (+ its 1×1 transition;
    # the 2×2 avg-pool becomes the phase mean) and the matching decoder
    # stage (upsample emits the packed layout via
    # resize_bilinear_packed_out, the skip stays packed, and the
    # conv1x1_up / denseBlocksUp / — for tier 0 — finalConv use the
    # segment-aware packed weights). Tier boundaries re-pack/unpack with
    # one small relayout each.
    packed_levels: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False,
                 final_size: Optional[Tuple[int, int]] = None,
                 return_orig_size: bool = False,
                 return_argmax: bool = False):
        pre_packed = (
            self.packed_stem
            and self.skip_stem0
            and x.shape[-1] == 4 * self.first_ch[0]
        )
        if pre_packed:  # stem kernel emitted pack_space2 layout directly
            size_in = (x.shape[-3] * 4, x.shape[-2] * 4)
        elif self.skip_stem0:
            size_in = (x.shape[-3] * 2, x.shape[-2] * 2)
        else:
            size_in = (x.shape[-3], x.shape[-2])
        blks = len(self.n_layers)

        # Stem (hardnet.py:274-280); base indices mirror the torch ModuleList
        # so the weight importer maps by position.
        x = x.astype(self.dtype)
        full = (
            self.packed_full
            and not self.skip_stem0
            and x.shape[-3] % 4 == 0
            and x.shape[-2] % 4 == 0
        )
        if not self.skip_stem0:
            x = ConvLayer(self.first_ch[0], kernel=3, stride=2,
                          dtype=self.dtype, folded=self.folded,
                          s2d=self.stem_s2d, pack_entry_s2=full,
                          name="base_0")(x, train)
        packed = full or (self.packed_stem and self.skip_stem0 and (
            pre_packed or (x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0)
        ))
        in_packed = pre_packed or full  # base_1's input already packed
        lvl = min(self.packed_levels, blks - 1) if packed else 0
        deep = lvl > 0
        # Unpacked stem output enters the packed region through base_1's
        # 4×4 stride-2 entry conv — no pack_space2 relayout (0.43 ms of
        # copies at 1024×2048, docs/perf_notes.md round 5).
        x = ConvLayer(self.first_ch[1], kernel=3, dtype=self.dtype,
                      folded=self.folded, packed_in=packed and in_packed,
                      pack_entry=packed and not in_packed,
                      name="base_1")(x, train)
        x = ConvLayer(self.first_ch[2], kernel=3, stride=2, dtype=self.dtype,
                      folded=self.folded, s2d=self.stem_s2d,
                      packed_in=packed, packed_out=deep,
                      name="base_2")(x, train)
        x = ConvLayer(self.first_ch[3], kernel=3, dtype=self.dtype,
                      folded=self.folded, packed_in=deep,
                      name="base_3")(x, train)

        skips: List[jnp.ndarray] = []
        skip_chs: List[int] = []
        skip_segs: List[Optional[Tuple[int, ...]]] = []
        ch = self.first_ch[3]
        base_idx = 4
        for i in range(blks):
            blk_packed = i < lvl
            x = HarDBlock(
                ch, self.gr[i], self.grmul, self.n_layers[i],
                dtype=self.dtype, folded=self.folded, packed=blk_packed,
                name=f"base_{base_idx}",
            )(x, train)
            segs = HarDBlock.out_segments(
                ch, self.gr[i], self.grmul, self.n_layers[i]
            ) if blk_packed else None
            ch = HarDBlock.out_ch(ch, self.gr[i], self.grmul, self.n_layers[i])
            base_idx += 1
            if i < blks - 1:
                skips.append(x)  # packed skips stay packed for the decoder
                skip_chs.append(ch)
                skip_segs.append(segs)
            x = ConvLayer(self.ch_list[i], kernel=1, dtype=self.dtype,
                          folded=self.folded, packed_in=blk_packed,
                          segments=segs,
                          name=f"base_{base_idx}")(x, train)
            ch = self.ch_list[i]
            base_idx += 1
            if i < blks - 1:
                if blk_packed:
                    # 2×2 stride-2 avg-pool of a packed tensor == mean of
                    # its 4 phase blocks; re-packs when the next tier is
                    # packed too, else exits the packed region.
                    c = ch
                    x = (x[..., :c] + x[..., c : 2 * c]
                         + x[..., 2 * c : 3 * c] + x[..., 3 * c :]) * 0.25
                    if i + 1 < lvl:
                        x = pack_space2(x)
                else:
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                base_idx += 1  # torch keeps AvgPool in the ModuleList

        # Decoder (hardnet.py:312-322, 365-369)
        prev_ch = ch
        final_segs = None
        for j, i in enumerate(range(blks - 2, -1, -1)):
            skip = skips.pop()
            segs_skip = skip_segs.pop()
            up_packed = i < lvl  # matches the packed-skip tiers
            if up_packed:
                # x arrives UNPACKED (packed decoder stages unpack on
                # exit); the upsample emits the packed layout directly.
                size = (skip.shape[-3] * 2, skip.shape[-2] * 2)
                x = resize_bilinear_packed_out(x, size)
                segs_in = (prev_ch,) + tuple(segs_skip)
            else:
                x = resize_bilinear_align_corners(
                    x, (skip.shape[-3], skip.shape[-2])
                )
                segs_in = None
            x = jnp.concatenate([x, skip], axis=-1)
            cur = prev_ch + skip_chs[i]
            x = ConvLayer(cur // 2, kernel=1, dtype=self.dtype,
                          folded=self.folded, packed_in=up_packed,
                          segments=segs_in,
                          name=f"conv1x1_up_{j}")(x, train)
            x = HarDBlock(
                cur // 2, self.gr[i], self.grmul, self.n_layers[i],
                dtype=self.dtype, folded=self.folded, packed=up_packed,
                name=f"denseBlocksUp_{j}",
            )(x, train)
            out_segs = HarDBlock.out_segments(
                cur // 2, self.gr[i], self.grmul, self.n_layers[i]
            ) if up_packed else None
            prev_ch = HarDBlock.out_ch(
                cur // 2, self.gr[i], self.grmul, self.n_layers[i]
            )
            if up_packed and i > 0:
                x = unpack_space2(x, out_segs)
            elif up_packed:
                final_segs = out_segs  # stays packed through finalConv

        if final_segs is not None:
            fk, fb = _RawConvParams(self.n_classes, prev_ch,
                                    name="finalConv")()
            wp, bp = _pack_1x1_weights(fk, fb, final_segs)
            lp = jax.lax.conv_general_dilated(
                x.astype(self.dtype), wp.astype(self.dtype), (1, 1),
                ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bp.astype(self.dtype)
            logits = unpack_space2(lp)
        else:
            logits = nn.Conv(
                self.n_classes, (1, 1), use_bias=True, dtype=self.dtype,
                name="finalConv"
            )(x)
        if return_argmax:
            # Serving fast path: the full-res (B, H, W, C) logits would
            # lane-pad C -> 128 (~1 GB at 1024x2048). Resize in CHW
            # (exact-sized) and reduce the argmax over the leading axis;
            # numerics — and hence tie behavior — are identical.
            assert not return_orig_size
            chw = jnp.moveaxis(logits.astype(jnp.float32), -1, -3)
            up = resize_bilinear_hw(chw, final_size or size_in)
            return jnp.argmax(up, axis=-3).astype(jnp.int32)
        out = resize_bilinear_align_corners(
            logits.astype(jnp.float32), final_size or size_in
        )
        if return_orig_size:
            return out, logits
        return out


def fold_batchnorm_variables(variables):
    """Fold every ConvLayer's BatchNorm into its conv for inference.

    Returns variables for ``HarDNet(folded=True)``: each
    ``{conv: {kernel}, norm: {scale, bias}}`` params group (with matching
    ``batch_stats`` mean/var) becomes ``{conv: {kernel', bias'}}`` with

        kernel' = kernel · γ/√(var+ε),   bias' = β − mean · γ/√(var+ε)

    — the live re-design of the reference's dead ``v2_transform`` conv+BN
    weight folding (hardnet.py:341-351). Numerically this removes the BN
    normalization chain from the inference graph entirely (conv bias adds
    fold into the conv epilogue); exact up to f32 rounding.
    """
    eps = 1e-5
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def fold(p, s):
        if isinstance(p, dict) and "conv" in p and "norm" in p:
            gamma = p["norm"]["scale"]
            beta = p["norm"]["bias"]
            mean = s["norm"]["mean"]
            var = s["norm"]["var"]
            scale = gamma / jnp.sqrt(var + eps)
            return {
                "conv": {
                    "kernel": p["conv"]["kernel"] * scale,
                    "bias": beta - mean * scale,
                }
            }
        if isinstance(p, dict):
            return {k: fold(v, s.get(k, {}) if isinstance(s, dict) else {})
                    for k, v in p.items()}
        return p

    return {"params": fold(dict(params), dict(stats))}
