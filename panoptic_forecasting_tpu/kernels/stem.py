"""Pallas TPU kernel: fused one-hot assembly + HarDNet stem conv.

The bg model's input is T one-hot-encoded segmentation maps (C classes
each) plus T depth channels, fed to a 3x3 stride-2 conv
(bg_model.py:53-69 + hardnet.py:274 in the reference). Done naively on
TPU this is the single most off-roofline op in the whole forecast:

  * the (B, H, W, T, C) one-hot intermediate and the (B, H, W, T*C+T)
    conv input both carry a small trailing axis that XLA lane-pads to
    128 — ~3 GB of hidden HBM traffic at 1024x2048;
  * the 36-channel stride-2 conv itself measures 7.5 ms even on a
    pre-materialized input (scripts/prof_bg_stem3.py), ~300x off
    roofline — small-K/small-N convs pay padding and per-pass
    overheads in any XLA formulation we found (strided-slice tap
    matmuls: 212 ms; s2d packing: +45 ms; see docs/perf_notes.md).

This kernel never materializes the one-hot in HBM. The true inputs are
the INT seg maps (24 MB) and the f32 depth channels; per output row it
builds the one-hot im2col matrix A (K = 9·T·C + 9·T rows) directly in
VMEM with iota compares, then reassembles the conv as one f32 MXU dot
per row-slab:

    out[:, y, x] = relu(W' @ A + b),   W'[o, (t,f,c)] = w[dy,dx, f*C+c, o]

which is exactly conv(assemble(seg, depth)) with stride 2, padding 1 —
the semantics of BGModel._assemble followed by the folded base_0
ConvLayer. f32 dots keep reference parity (the one-hot factor is exact;
weights are never rounded to bf16).

Layout rules learned the hard way (scripts/prof_stem_kernel2.py):

  * NO parity pre-split. An XLA-side (W, 2)-strided parity
    deinterleave of the inputs costs ~7 ms PER ARRAY when fused with
    the padding/transpose pre-pass, and Mosaic has NO lowering for
    lane-strided loads or slices at all (scripts/prof_strided_load.py).
    The kernel instead computes the conv at FULL width (stride 1,
    every column) with purely STATIC lane shifts for the 3 column
    taps — 2x MXU passes on an op that is pass-latency-, not
    FLOP-bound, in exchange for zero strided relayouts anywhere.
  * Inputs reach the kernel as contiguous row-bands with a shared
    top-guard row (pure reshape + row-gather XLA-side, ~0 cost).
  * The output block is (c_out, bh·W) FLAT: res rows store with no
    sublane-insert relayout. The caller drops the odd columns with one
    XLA lane-strided slice (measured ~free standalone) and transposes
    to NHWC once.

Reference: pc_transform/bg chain, bg_model.py:53-69; replaces the
assembly + base_0 of models/hardnet.py's HarDNet for folded inference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _pad_rows_cols(x, pad_val, w_pad):
    """(B, T, H, W) -> (B, T, H+1, w_pad): one guard row on top, one
    guard column left, lane-aligned fill right — all ``pad_val``."""
    b, t, h, w = x.shape
    return jnp.pad(
        x,
        ((0, 0), (0, 0), (1, 0), (1, w_pad - w - 1)),
        constant_values=pad_val,
    )


def _block_rows(padded, bh):
    """(B, T, H+1, Wp) -> (B·nb, T, 2bh+1, Wp): bands of 2bh input rows
    plus the next band's first row (the dy=2 taps of the last output row
    of a band read input row 2·y0+2bh)."""
    b, t, h1, wp = padded.shape
    h = h1 - 1
    nb = h // (2 * bh)
    main = padded[:, :, :h, :].reshape(b, t, nb, 2 * bh, wp)
    extra = padded[:, :, 2 * bh :: 2 * bh, :].reshape(b, t, nb, 1, wp)
    blk = jnp.concatenate([main, extra], axis=3)
    return blk.transpose(0, 2, 1, 3, 4).reshape(b * nb, t, 2 * bh + 1, wp)


def _stem_kernel(seg_ref, dep_ref, w_ref, b_ref, out_ref, acc_ref, *,
                 n_t, n_c, c_out, bh, w, r_rows, k_pad, use_depth,
                 debug_skip=""):
    """One (batch, row-band) step: bh output rows, all W/2 columns."""
    tc = n_t * n_c
    k = 9 * tc + (9 * n_t if use_depth else 0)
    if k_pad > k:
        # K-padding rows are never written by the slab loop; W' columns
        # there are zero, but 0 * uninitialized could still be NaN.
        acc_ref[pl.ds(k, k_pad - k), :] = jnp.zeros(
            (k_pad - k, r_rows * w), jnp.float32
        )

    def slab(j, carry):
        y = j * r_rows  # first output row of this slab (band-local)
        # -- build A (k_pad, r_rows * w) in scratch: full-width columns --
        if debug_skip != "build":
            for r in range(r_rows):
                cofs = r * w
                for t in range(9):
                    dy, dx = t // 3, t % 3
                    # input row 2(y+r)+dy-1 -> guarded local 2(y+r)+dy;
                    # input col c+dx-1 -> guarded local c+dx: static shift
                    for f in range(n_t):
                        row = seg_ref[0, f, pl.ds(2 * (y + r) + dy, 1),
                                      dx : dx + w]  # (1, w) int32
                        cls = jax.lax.broadcasted_iota(
                            jnp.int32, (n_c, w), 0
                        )
                        acc_ref[pl.ds(t * tc + f * n_c, n_c),
                                cofs : cofs + w] = (
                            row == cls
                        ).astype(jnp.float32)
                        if use_depth:
                            acc_ref[pl.ds(9 * tc + t * n_t + f, 1),
                                    cofs : cofs + w] = dep_ref[
                                0, f, pl.ds(2 * (y + r) + dy, 1),
                                dx : dx + w
                            ]
        # -- one MXU dot per slab ----------------------------------------
        if debug_skip != "dot":
            res = jax.lax.dot_general(
                w_ref[...], acc_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (c_out, r_rows * w)
        else:
            res = acc_ref[pl.ds(0, c_out), :]
        res = jnp.maximum(res + b_ref[...], 0.0)
        # -- flat contiguous full-width stores; the caller keeps the even
        # columns (a lane-strided slice is ~free in XLA but has no
        # Mosaic lowering at all — both ref- and value-level strided
        # accesses fail to compile, scripts/prof_strided_load.py).
        out_ref[0, :, pl.ds(y * w, r_rows * w)] = res
        return carry

    jax.lax.fori_loop(0, bh // r_rows, slab, 0)


_VMEM_BUDGET = 13 * 1024 * 1024  # leave headroom under the 16 MB limit


def _vmem_bytes(bh, r, w, w_pad, n_t, k_pad, c_out) -> int:
    """Kernel VMEM: A scratch + double-buffered in/out blocks."""
    a = k_pad * r * w * 4
    blocks = 2 * 2 * n_t * (2 * bh + 1) * w_pad * 4  # seg + dep, x2 buf
    out = 2 * c_out * bh * w * 4
    return a + blocks + out


def _pick_bh(h2: int) -> int:
    """Largest row-band height <= 32 dividing H/2."""
    for cand in range(min(32, h2), 0, -1):
        if h2 % cand == 0:
            return cand
    return 1


def _pick_r(w: int, bh: int) -> int:
    """Rows per dot-slab: target ~4K full-width columns per MXU dot."""
    r = max(1, 4096 // max(w, 1))
    while bh % r:
        r -= 1
    return r


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_classes", "block_rows", "slab_rows", "interpret", "relu",
        "debug_skip", "packed_out",
    ),
)
def onehot_stem_conv(seg, depth, kernel, bias, *, num_classes: int,
                     block_rows: int = 0, slab_rows: int = 0,
                     interpret: bool = False, relu: bool = True,
                     debug_skip: str = "", packed_out: bool = False):
    """relu(conv3x3_stride2(assemble(seg, depth)) + bias) without ever
    materializing the one-hot input.

    Args:
      seg:   (B, T, H, W) int — per-frame class maps; ids >= num_classes
        one-hot to all-zero rows (bg_model.py:53-59). H, W must be even.
      depth: (B, T, H, W) f32 — the final assembled depth channels
        (already normalized and validity-masked), or None when the model
        runs without depth inputs.
      kernel: (3, 3, C_in, c_out) f32 conv kernel over the assembled
        input, C_in = T*num_classes (+T with depth) — the folded base_0.
      bias:  (c_out,) f32.
      relu:  apply the ConvLayer ReLU (the kernel epilogue is fused).

    Returns (B, H/2, W/2, c_out) f32, identical to
    ``relu(lax.conv(assembled, kernel, stride 2, padding 1) + bias)``.

    ``packed_out=True`` instead returns the 2×2-packed
    (B, H/4, W/4, 4·c_out) layout of ``hardnet.pack_space2`` (phase-major
    channels) for HarDNet's ``packed_stem`` path — the pack rides the
    SAME single XLA relayout the plain epilogue already pays (slice +
    transpose fused into one copy) instead of a second full-res
    transpose after it.
    """
    b, n_t, h, w = seg.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    h2, w2 = h // 2, w // 2
    n_c = int(num_classes)
    tc = n_t * n_c
    use_depth = depth is not None
    c_in = tc + (n_t if use_depth else 0)
    assert kernel.shape[:3] == (3, 3, c_in), (kernel.shape, c_in)
    c_out = kernel.shape[3]
    k = 9 * tc + (9 * n_t if use_depth else 0)
    k_pad = -(-k // 8) * 8
    # slice [dx : dx + w] with dx <= 2 needs w + 2 guarded columns
    w_pad = -(-(w + 2) // LANE) * LANE
    bh = block_rows or _pick_bh(h2)
    assert h2 % bh == 0, (h2, bh)
    r_rows = slab_rows or _pick_r(w, bh)
    assert bh % r_rows == 0, (bh, r_rows)
    if not (block_rows or slab_rows):
        # Auto-tuning must never exceed the scoped-VMEM limit (timing is
        # flat across bh/r on v5e — prefer the largest config that fits).
        fits = lambda b, r: (
            _vmem_bytes(b, r, w, w_pad, n_t, k_pad, c_out) <= _VMEM_BUDGET
        )
        if not fits(bh, r_rows):
            cands = [
                (b, r)
                for b in range(bh, 0, -1)
                if h2 % b == 0
                for r in range(min(r_rows, b), 0, -1)
                if b % r == 0 and fits(b, r)
            ]
            bh, r_rows = cands[0] if cands else (bh, r_rows)
    nb = h2 // bh
    if not relu:
        raise NotImplementedError("stem kernel always applies ReLU")

    # Weight matrix W' (c_out, k_pad): column (t, f, c) multiplies the
    # one-hot row of class c, frame f, tap t; depth columns follow.
    wk = jnp.asarray(kernel, jnp.float32)
    wcols = [
        wk[t // 3, t % 3, f * n_c + c, :]
        for t in range(9)
        for f in range(n_t)
        for c in range(n_c)
    ]
    if use_depth:
        wcols += [
            wk[t // 3, t % 3, tc + f, :]
            for t in range(9)
            for f in range(n_t)
        ]
    wmat = jnp.stack(wcols, axis=1)  # (c_out, k)
    wmat = jnp.pad(wmat, ((0, 0), (0, k_pad - k)))
    bcol = jnp.asarray(bias, jnp.float32).reshape(c_out, 1)

    seg_b = _block_rows(
        _pad_rows_cols(jnp.asarray(seg, jnp.int32), n_c, w_pad), bh
    )
    if use_depth:
        dep_b = _block_rows(
            _pad_rows_cols(jnp.asarray(depth, jnp.float32), 0.0, w_pad),
            bh,
        )
    else:  # tiny placeholder; kernel never reads it (use_depth is static)
        dep_b = jnp.zeros((b * nb, n_t, 2 * bh + 1, w_pad), jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _stem_kernel, n_t=n_t, n_c=n_c, c_out=c_out, bh=bh, w=w,
            r_rows=r_rows, k_pad=k_pad, use_depth=use_depth,
            debug_skip=debug_skip,
        ),
        grid=(b * nb,),
        in_specs=[
            pl.BlockSpec(
                (1, n_t, 2 * bh + 1, w_pad), lambda i: (i, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, n_t, 2 * bh + 1, w_pad), lambda i: (i, 0, 0, 0)
            ),
            pl.BlockSpec((c_out, k_pad), lambda i: (0, 0)),
            pl.BlockSpec((c_out, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, c_out, bh * w), lambda i: (i // nb, 0, i % nb)
        ),
        out_shape=jax.ShapeDtypeStruct((b, c_out, h2 * w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k_pad, r_rows * w), jnp.float32)],
        interpret=interpret,
    )(seg_b, dep_b, wmat, bcol)
    if packed_out:
        # full-width col x = 4j + 2·pw + e (e = dropped odd column),
        # row y = 2a + ph: one slice+transpose yields the packed layout.
        assert h2 % 2 == 0 and w % 4 == 0, (h2, w)
        o = out.reshape(b, c_out, h2 // 2, 2, w // 4, 2, 2)[..., 0]
        o = o.transpose(0, 2, 4, 3, 5, 1)  # (b, a, j, ph, pw, c)
        return o.reshape(b, h2 // 2, w // 4, 4 * c_out)
    # full-width stride-1 rows -> keep even columns -> NHWC for base_1
    return (
        out.reshape(b, c_out, h2, w)[..., 0::2].transpose(0, 2, 3, 1)
    )


def stem_reference(seg, depth, kernel, bias, *, num_classes: int):
    """Pure-XLA reference of onehot_stem_conv (tests / non-TPU path)."""
    seg_t = jnp.transpose(jnp.asarray(seg, jnp.int32), (0, 2, 3, 1))
    mask = seg_t < num_classes
    oh = jax.nn.one_hot(
        jnp.where(mask, seg_t, 0), num_classes, dtype=jnp.float32
    ) * mask[..., None]
    b, h, w = oh.shape[:3]
    x = oh.reshape(b, h, w, -1)
    if depth is not None:
        x = jnp.concatenate(
            [x, jnp.transpose(depth, (0, 2, 3, 1)).astype(x.dtype)],
            axis=-1,
        )
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, jnp.float32), (2, 2), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + jnp.asarray(bias, jnp.float32))
