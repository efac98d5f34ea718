"""Z-buffer scatter-min splat — the hot kernel of the point-cloud transform.

Reference capability: ``torch_scatter.scatter_min`` z-buffering in
``pc_transform_model.py:100-139`` (a CUDA extension). TPU re-design:

XLA:TPU has no fast general scatter with colliding indices (it serializes),
so the primary path is **sort-based**: sort the point stream by (target
pixel, depth bits) with ``jax.lax.sort`` (stable, fully parallel bitonic
network), mark run starts, and write the unique winners with a
collision-free scatter (``unique_indices=True``, ``mode='drop'`` for
losers). lax.sort is stable, so ties on depth resolve to the smallest
point index — deterministic, unlike CUDA atomics.

A direct ``.at[].min`` scatter path is kept for comparison/debugging
(``method='scatter'``); it is correct everywhere but serializes on TPU.

Semantics preserved from the reference (pc_transform_model.py:100-139):
  * each point splats to its 4 surrounding integer pixels (floor/ceil of u,v),
  * coordinates clamp into bounds, so off-screen points pile on the border,
  * invalid points still participate, carrying label 0 and a sentinel depth
    of ``max(depth) + 1`` so they never beat a valid point,
  * pixels touched by no point keep label 0 and depth −1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _depth_sort_bits(depth: jnp.ndarray) -> jnp.ndarray:
    """Monotone float32→int32 key (valid for the >0 depths used here).

    For non-negative IEEE floats, the bit pattern viewed as int32 is
    order-preserving; the full signed transform is used anyway so the key is
    safe even if a caller passes a negative depth.
    """
    bits = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
    # Flip: negatives reverse order (invert all bits), positives get sign bit.
    return jnp.where(bits < 0, jnp.int32(~bits), bits | jnp.int32(-2147483648)) ^ jnp.int32(-2147483648)


def splat_four_neighbors(uv: jnp.ndarray, height: int, width: int):
    """Expand (N, 2) float pixel coords to the 4 surrounding integer pixels.

    Returns (4N,) flat pixel indices (v*width + u), clamped in bounds —
    matching the floor/ceil fan-out at pc_transform_model.py:107-114.
    """
    u, v = uv[..., 0], uv[..., 1]
    uf, uc = jnp.floor(u), jnp.ceil(u)
    vf, vc = jnp.floor(v), jnp.ceil(v)
    us = jnp.concatenate([uf, uf, uc, uc])
    vs = jnp.concatenate([vf, vc, vf, vc])
    ui = jnp.clip(us.astype(jnp.int32), 0, width - 1)
    vi = jnp.clip(vs.astype(jnp.int32), 0, height - 1)
    return vi * width + ui


def _zbuffer_sort(pix: jnp.ndarray, depth: jnp.ndarray, label: jnp.ndarray,
                  num_pixels: int):
    """Sort-based argmin-per-pixel. All inputs 1-D of equal length."""
    depth_key = _depth_sort_bits(depth)
    pix_s, _, label_s, depth_s = jax.lax.sort(
        (pix, depth_key, label, depth), num_keys=2
    )
    # Run starts: first occurrence of each pixel after the sort == the winner.
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), pix_s[1:] != pix_s[:-1]]
    )
    # Losers scatter to an out-of-range index and are dropped.
    tgt = jnp.where(first, pix_s, num_pixels)
    canvas_label = jnp.zeros((num_pixels,), label.dtype)
    canvas_depth = jnp.full((num_pixels,), -1.0, depth.dtype)
    canvas_label = canvas_label.at[tgt].set(label_s, mode="drop", unique_indices=True)
    canvas_depth = canvas_depth.at[tgt].set(depth_s, mode="drop", unique_indices=True)
    return canvas_label, canvas_depth


def _zbuffer_packed(uv: jnp.ndarray, depth: jnp.ndarray, label: jnp.ndarray,
                    height: int, width: int, placement: str = "scatter",
                    sort_runs: int = 1):
    """Single-sort packed z-buffer — the fast TPU path.

    Instead of sorting the 4-neighbor-expanded stream (4N entries × 4
    operands, the ``method='sort'`` path), sort the N points once by
    (base pixel, corner-offset bits, packed key) where base = clamped
    (floor v, floor u) and key = depth_bits[31:8] | label[7:0] (depth > 0 ⇒
    float bits are order-preserving; truncating the mantissa's low 8 bits
    costs ~1.5e-5 relative depth resolution, far below the 1/256 m
    quantization of the exported depth PNGs, io.encode_depth_png).

    The four clamped corner targets of every point are *monotone* functions
    of (base, offset bits) — the per-point effective offsets
    ``fu = clip(floor+ceil_gap) − clip(floor)`` reproduce the reference's
    per-corner floor/ceil+clamp exactly (pc_transform_model.py:107-114),
    including integral coordinates and out-of-bounds clamping. Sorting by
    them keeps each corner's equal-target runs contiguous and non-
    decreasing, so one segmented cumulative-min per corner yields each
    run's winner at its last element, written with a collision-free scatter;
    the four corner canvases fold with elementwise min. Total: one
    3-operand N sort + O(log N) elementwise passes — ~5x less sort traffic
    than the expanded-stream path.

    Ties in truncated depth resolve to the smallest label (deterministic;
    the reference's CUDA scatter_min is nondeterministic on ties).

    Inputs may carry ONE leading batch dim (uv (B, N, 2), depth/label
    (B, N)): batch b's groups are offset by b·4·H·W, so the concatenation
    of the per-batch streams sorts ONCE and places ONCE into a (B·4·P)
    canvas — a vmapped sort lowers to XLA's far slower batched sort, and
    a vmapped Pallas placement pays the step machinery per element.
    Requires B·4·H·W < 2^31 (B ≤ 255 at Cityscapes full res).
    """
    num_pixels = height * width
    EMPTY = jnp.int32(0x7FFFFFFF)
    batched = uv.ndim == 3
    if not batched:
        uv, depth, label = uv[None], depth[None], label[None]
    b = uv.shape[0]
    if b * 4 * num_pixels >= 2**31:
        raise ValueError(
            f"batch {b} x canvas {num_pixels} overflows int32 group space"
        )

    dbits = _depth_sort_bits(depth)
    key = (dbits & jnp.int32(~0xFF)) | (label.astype(jnp.int32) & 0xFF)

    uf = jnp.floor(uv[..., 0])
    vf = jnp.floor(uv[..., 1])
    gu = (jnp.ceil(uv[..., 0]) != uf).astype(jnp.int32)  # ceil−floor ∈ {0,1}
    gv = (jnp.ceil(uv[..., 1]) != vf).astype(jnp.int32)
    ui = uf.astype(jnp.int32)
    vi = vf.astype(jnp.int32)
    cu0 = jnp.clip(ui, 0, width - 1)
    cv0 = jnp.clip(vi, 0, height - 1)
    # Effective ceil-corner offset after clamping: exactly reproduces the
    # reference's per-corner floor/ceil+clamp (pc_transform_model.py:107-114)
    # — 0 for integral coords, 0 at the far edges, 0 for fully clamped
    # out-of-bounds points.
    fu = jnp.clip(ui + gu, 0, width - 1) - cu0
    fv = jnp.clip(vi + gv, 0, height - 1) - cv0
    # One fused sort operand: group = (batch, corner, pixel), corner in
    # the high bits of each batch block so every corner canvas is a
    # contiguous plane of the scattered buffer (a stride-4 interleave made
    # the fold reads ~10x slower). 2-operand sort moves 1/3 less data than
    # the previous (base, frac, key) 3-operand sort.
    group = (fv * 2 + fu) * num_pixels + (cv0 * width + cu0)
    group = group + (
        jnp.arange(b, dtype=jnp.int32) * (4 * num_pixels)
    )[:, None]

    if placement.startswith("pallas"):
        # Streaming Pallas placement (kernels/placement.py): ~4-8x faster
        # than XLA scatter on TPU, bit-identical result. The placement
        # min-combines independently sorted RUNS, so the stream is split
        # into b·sort_runs segments sorted SEQUENTIALLY (lax.sort is
        # superlinear: 3x2.1M = 11.4 ms vs one 6.3M = 16.8 ms on v5e;
        # batched/vmapped sorts are far slower still, docs/perf_notes.md).
        # sort_runs > 1 segments a single canvas's point stream (e.g. the
        # per-input-frame sub-streams of a combined reprojection) — the
        # min across runs equals the global z-buffer by associativity.
        from .placement import place_sorted

        interp = placement == "pallas_interpret"
        # Interpret mode (CPU tests) runs the kernel op-by-op in Python:
        # use small blocks/supertiles so the unrolled sub-chunk loop stays
        # short. Same kernel logic either way.
        sizes = {"block": 512, "sw": 1024} if interp else {}
        block = sizes.get("block", 4096)
        n_per = group.shape[1]
        if n_per % sort_runs != 0:
            raise ValueError(
                f"sort_runs={sort_runs} must divide the per-sample point "
                f"count N={n_per} (zbuffer_splat docstring contract)"
            )
        r = b * sort_runs
        if r > 8 and sort_runs > 1:
            # Bound the number of sub-canvas runs; per-BATCH runs are
            # always fine (disjoint canvases keep the placement grid
            # independent of the run count).
            r = b
        # Pure per-batch runs target disjoint canvas slices (the
        # per-batch group offsets above): the placement can then assign
        # one owner run per supertile instead of a (supertile x run)
        # cross product — essential for large serving batches.
        disjoint = r == b and b > 1
        g2 = group.reshape(r, -1)
        k2 = key.reshape(r, -1)
        pad = (-g2.shape[1]) % block
        if pad:  # sentinel groups sort to the end and self-mask
            g2 = jnp.pad(g2, ((0, 0), (0, pad)), constant_values=EMPTY)
            k2 = jnp.pad(k2, ((0, 0), (0, pad)))
        # is_stable=False: XLA implements stable sort by appending an
        # iota tiebreaker operand — a third s32[N] array riding every
        # pass (+50% sort traffic, seen in the fused-program trace).
        # With num_keys=2 over exactly these 2 operands the comparator
        # totally orders the pairs, so the sorted output is unique and
        # stability adds nothing (prof_sort_stability.py).
        parts = [
            jax.lax.sort((g2[i], k2[i]), num_keys=2, is_stable=False)
            for i in range(r)
        ]
        canvas4 = place_sorted(
            jnp.concatenate([p[0] for p in parts]),
            jnp.concatenate([p[1] for p in parts]),
            num_groups=b * num_pixels * 4,
            runs=r,
            disjoint=disjoint,
            interpret=interp,
            **sizes,
        )
    else:
        group_s, key_s = jax.lax.sort(
            (group.reshape(-1), key.reshape(-1)), num_keys=2,
            is_stable=False,  # pairs are totally ordered; see above
        )
        # Within a group the packed keys are ascending, so each group's
        # FIRST element is its min: scatter run starts into the (B·4·P)
        # canvas (losers target an out-of-range slot and are dropped).
        group_start = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), group_s[1:] != group_s[:-1]]
        )
        tgt = jnp.where(group_start, group_s, b * num_pixels * 4)
        canvas4 = jnp.full((b * num_pixels * 4,), EMPTY, jnp.int32)
        canvas4 = canvas4.at[tgt].set(
            key_s, mode="drop", unique_indices=True
        )
    # Corner fold in 2-D (b, 4, H, W): genuine row/col pad-shifts keep the
    # canvas in its native (8,128) tiling — the flat-P formulation made
    # XLA materialize a T(4,128) transposed copy of the whole 4-plane
    # canvas (~1.5 ms per 3-frame pass in the fused-program trace,
    # scripts/prof_fold.py: 3.9 -> 2.4 ms). Semantically identical to
    # flat shifts: fu=1 never occurs in the last column and fv=1 never in
    # the last row (clamped offsets), so the flat shift's row bleed only
    # ever carried EMPTY — exactly what the 2-D pad inserts.
    g = canvas4.reshape(b, 4, height, width)
    g0, g1, g2, g3 = g[:, 0], g[:, 1], g[:, 2], g[:, 3]

    m00 = jnp.minimum(jnp.minimum(g0, g1), jnp.minimum(g2, g3))
    m10 = jnp.minimum(g1, g3)  # points whose ceil-u corner is base+1
    m01 = jnp.minimum(g2, g3)
    m11 = g3

    def _shift2(c, dv, du):
        return jnp.pad(
            c, ((0, 0), (dv, 0), (du, 0)), constant_values=EMPTY
        )[:, :height, :width]

    canvas = jnp.minimum(
        jnp.minimum(m00, _shift2(m10, 0, 1)),
        jnp.minimum(_shift2(m01, 1, 0), _shift2(m11, 1, 1)),
    )

    touched = canvas != EMPTY
    out_label = jnp.where(touched, canvas & 0xFF, 0).astype(label.dtype)
    # All stored depths are positive, so the depth bits are the float bits.
    out_depth = jax.lax.bitcast_convert_type(
        canvas & jnp.int32(~0xFF), jnp.float32
    )
    out_depth = jnp.where(touched, out_depth, -1.0)
    if not batched:
        return out_label[0], out_depth[0]
    return out_label, out_depth


def _zbuffer_scatter(pix: jnp.ndarray, depth: jnp.ndarray, label: jnp.ndarray,
                     num_pixels: int):
    """Direct scatter-min path (slow on TPU; kept for cross-checking)."""
    min_depth = jnp.full((num_pixels,), jnp.inf, depth.dtype)
    min_depth = min_depth.at[pix].min(depth)
    # Winner = smallest point index among points matching the pixel min.
    won = depth == min_depth[pix]
    n = pix.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    win_idx = jnp.full((num_pixels,), n, jnp.int32)
    win_idx = win_idx.at[jnp.where(won, pix, num_pixels)].min(
        jnp.where(won, idx, n), mode="drop"
    )
    touched = win_idx < n
    safe = jnp.where(touched, win_idx, 0)
    canvas_label = jnp.where(touched, label[safe], jnp.zeros((), label.dtype))
    canvas_depth = jnp.where(touched, depth[safe], -1.0)
    return canvas_label, canvas_depth


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "method", "max_label", "sort_runs"),
)
def zbuffer_splat(uv, depth, label, valid, *, height: int, width: int,
                  method: str = "auto", max_label: int = 255,
                  sort_runs: int = 1):
    """Forward-splat a point stream into a (H, W) label+depth canvas.

    Args:
      uv:    (..., N, 2) float projected pixel coordinates.
      depth: (..., N) float forecast depths (metric, >0 when valid).
      label: (..., N) int (or (..., N, C) float) per-point payload.
      valid: (..., N) bool validity (valid input depth ∧ depth>0 ∧ in-bounds).
      height/width: output canvas size.
      max_label: static upper bound on the scalar label payload. The fast
        packed paths store the label in the low 8 bits of the sort key, so
        they are only correct for payloads in [0, 255] (fine for
        Cityscapes labelIds/trainIds <= 33, NOT for panoptic ids >=
        11000). ``method='auto'`` with ``max_label > 255`` routes to the
        exact (expanded-stream) sort path instead of silently aliasing;
        explicitly requesting a packed method then raises.
      sort_runs: (pallas placement only) split each sample's point stream
        into this many contiguous independently sorted segments — e.g. the
        per-input-frame sub-streams of a combined reprojection. lax.sort
        is superlinear, so several small sorts beat one big one; the
        placement min-combines the runs, which equals the global z-buffer
        by associativity of min. Must divide N (raises otherwise). When
        batch x sort_runs would exceed 8 total runs, the split is clamped
        to per-batch runs — placement cost grows with the run count
        (docs/perf_notes.md) and per-batch runs keep the grid
        batch-independent.

    Returns:
      (label_canvas (..., H, W[, C]), depth_canvas (..., H, W)).

    Leading batch dims run through ONE sort + placement on the packed
    paths (per-batch group offsets, see _zbuffer_packed); other methods
    are vmapped. Reference: pc_transform_model.py:100-150.
    """
    scalar_label = label.ndim == uv.ndim - 1
    packable = scalar_label and max_label <= 255
    if method == "auto":
        if packable:
            # Pallas placement on TPU; XLA scatter placement elsewhere.
            on_tpu = jax.default_backend() == "tpu"
            method = "pallas" if on_tpu else "packed"
        else:
            method = "sort"

    packed_family = method in ("packed", "pallas", "pallas_interpret")
    if packed_family and scalar_label and max_label > 255:
        raise ValueError(
            f"packed z-buffer packs the label into 8 bits; max_label="
            f"{max_label} would alias. Use method='sort' (or 'auto')."
        )
    if uv.ndim > 2 and not packed_family:
        fn = functools.partial(
            zbuffer_splat, height=height, width=width, method=method
        )
        return jax.vmap(fn)(uv, depth, label, valid)

    # Invalid points: per-batch sentinel depth above every valid depth,
    # label zeroed (pc_transform_model.py:104-106 semantics).
    sentinel = jnp.max(
        jnp.where(valid, depth, -jnp.inf), axis=-1, keepdims=True
    )
    sentinel = jnp.where(jnp.isfinite(sentinel), sentinel, 0.0) + 1.0
    depth = jnp.where(valid, depth, sentinel).astype(jnp.float32)
    label = jnp.where(
        valid if scalar_label else valid[..., None],
        label,
        jnp.zeros((), label.dtype),
    )

    if packed_family:
        if not scalar_label:
            raise ValueError("packed z-buffer supports scalar labels only")
        placement = "scatter" if method == "packed" else method
        if uv.ndim > 3:  # collapse extra leading dims to one batch axis
            lead = uv.shape[:-2]
            lab, dep = _zbuffer_packed(
                uv.reshape((-1,) + uv.shape[-2:]),
                depth.reshape(-1, depth.shape[-1]),
                label.reshape(-1, label.shape[-1]),
                height, width, placement=placement,
                sort_runs=sort_runs,
            )
            return (
                lab.reshape(lead + (height, width)),
                dep.reshape(lead + (height, width)),
            )
        return _zbuffer_packed(uv, depth, label, height, width,
                               placement=placement, sort_runs=sort_runs)

    n = depth.shape[0]

    pix = splat_four_neighbors(uv, height, width)  # (4N,)
    depth4 = jnp.tile(depth, 4)
    reps = (4,) if label.ndim == 1 else (4, 1)
    label4 = jnp.tile(label, reps)

    num_pixels = height * width
    if label4.ndim == 2:
        # Vector payload (RGB images): z-buffer the point index, then gather.
        idx4 = jnp.tile(jnp.arange(n, dtype=jnp.int32), 4)
        impl = _zbuffer_sort if method == "sort" else _zbuffer_scatter
        win, dcanvas = impl(pix, depth4, idx4 + 1, num_pixels)  # 0 = untouched
        touched = win > 0
        safe = jnp.where(touched, win - 1, 0)
        lcanvas = jnp.where(touched[:, None], label[safe], 0)
        return (
            lcanvas.reshape(height, width, label.shape[-1]),
            dcanvas.reshape(height, width),
        )

    impl = _zbuffer_sort if method == "sort" else _zbuffer_scatter
    lcanvas, dcanvas = impl(pix, depth4, label4, num_pixels)
    return lcanvas.reshape(height, width), dcanvas.reshape(height, width)
