import jax.numpy as jnp
import numpy as np
import pytest

from panoptic_forecasting_tpu.kernels import (
    paste_and_composite,
    paste_mask_bilinear,
    splat_four_neighbors,
    zbuffer_splat,
)


def _np_zbuffer(uv, depth, label, valid, h, w):
    """Tiny NumPy golden model of the reference splat semantics."""
    n = len(depth)
    sentinel = (depth[valid].max() if valid.any() else 0.0) + 1.0
    d = np.where(valid, depth, sentinel)
    lab = np.where(valid, label, 0)
    canvas_l = np.zeros((h, w), dtype=label.dtype)
    canvas_d = np.full((h, w), -1.0, dtype=np.float64)
    best = np.full((h, w), np.inf)
    for corner in range(4):
        for i in range(n):
            u = np.floor(uv[i, 0]) if corner in (0, 1) else np.ceil(uv[i, 0])
            v = np.floor(uv[i, 1]) if corner in (0, 2) else np.ceil(uv[i, 1])
            ui = int(np.clip(u, 0, w - 1))
            vi = int(np.clip(v, 0, h - 1))
            if d[i] < best[vi, ui]:
                best[vi, ui] = d[i]
                canvas_l[vi, ui] = lab[i]
                canvas_d[vi, ui] = d[i]
    return canvas_l, canvas_d


def test_splat_four_neighbors_center_pixel():
    uv = jnp.array([[2.0, 3.0]])  # integral coords: all 4 neighbors collapse
    pix = splat_four_neighbors(uv, 8, 8)
    assert pix.shape == (4,)
    assert set(np.asarray(pix).tolist()) == {3 * 8 + 2}


def test_splat_four_neighbors_fractional():
    uv = jnp.array([[2.5, 3.5]])
    pix = set(np.asarray(splat_four_neighbors(uv, 8, 8)).tolist())
    assert pix == {3 * 8 + 2, 3 * 8 + 3, 4 * 8 + 2, 4 * 8 + 3}


@pytest.mark.parametrize(
    "method", ["sort", "scatter", "packed", "pallas_interpret"]
)
def test_zbuffer_matches_numpy_golden(method):
    rng = np.random.RandomState(0)
    h, w, n = 6, 9, 40
    uv = rng.rand(n, 2) * [w + 2, h + 2] - 1  # includes out-of-bounds
    depth = rng.rand(n) * 10 + 0.5
    label = rng.randint(1, 12, size=n).astype(np.int32)
    valid = rng.rand(n) > 0.3
    gl, gd = _np_zbuffer(uv, depth, label, valid, h, w)
    ll, dd = zbuffer_splat(
        jnp.asarray(uv, jnp.float32),
        jnp.asarray(depth, jnp.float32),
        jnp.asarray(label),
        jnp.asarray(valid),
        height=h,
        width=w,
        method=method,
    )
    np.testing.assert_array_equal(np.asarray(ll), gl)
    # 'packed' stores depth with the mantissa's low 8 bits truncated
    # (error ≤ 255 ULP ≈ 2.4e-4 at depth ~10, below PNG quantization 3.9e-3).
    atol = 1e-5 if method in ("sort", "scatter") else 5e-4
    np.testing.assert_allclose(np.asarray(dd), gd, atol=atol)


def test_place_sorted_matches_scatter_min():
    """Pallas placement (interpret) == NumPy scatter-min on mixed shapes:
    uniform, border pile-up (many entries in one group), and sparse wide
    spans that exercise the slow path."""
    from panoptic_forecasting_tpu.kernels.placement import place_sorted

    rng = np.random.RandomState(7)
    cases = [(5000, 9000, 0), (9321, 9000, 3000), (40000, 800, 0)]
    for num_groups, n, pile in cases:
        g = rng.randint(0, num_groups, n).astype(np.int32)
        if pile:
            g[:pile] = num_groups - 1
        k = rng.randint(1, 2**30, n).astype(np.int32)
        order = np.lexsort((k, g))
        g, k = g[order], k[order]
        out = np.asarray(
            place_sorted(
                jnp.asarray(g), jnp.asarray(k), num_groups=num_groups,
                interpret=True, block=512, sw=1024,
            )
        )
        ref = np.full(num_groups, 0x7FFFFFFF, np.int32)
        np.minimum.at(ref, g, k)
        np.testing.assert_array_equal(out, ref)


def test_place_sorted_wide_supertile_10bit_offsets():
    """sw=131072 supertiles (round 4): window offsets beyond 9 bits —
    w0 // LANE up to 1021 — must round-trip the 10-bit SMEM packing.
    Sparse entries spread across the full doubled supertile width force
    large offsets and slow-path windows."""
    from panoptic_forecasting_tpu.kernels.placement import place_sorted

    rng = np.random.RandomState(11)
    num_groups = 262144  # two sw=131072 supertiles
    n = 1024
    g = rng.randint(0, num_groups, n).astype(np.int32)
    # Pin entries near the far end of each supertile: offsets > 511 lanes.
    g[:64] = 131072 - 1 - rng.randint(0, 300, 64)
    g[64:128] = 262144 - 1 - rng.randint(0, 300, 64)
    k = rng.randint(1, 2**30, n).astype(np.int32)
    order = np.lexsort((k, g))
    g, k = g[order], k[order]
    out = np.asarray(
        place_sorted(
            jnp.asarray(g), jnp.asarray(k), num_groups=num_groups,
            interpret=True, block=512, sw=131072,
        )
    )
    ref = np.full(num_groups, 0x7FFFFFFF, np.int32)
    np.minimum.at(ref, g, k)
    np.testing.assert_array_equal(out, ref)


def test_zbuffer_packed_matches_sort_on_dense_scene():
    """Full-coverage synthetic projection: packed == sort except depth lsbs."""
    rng = np.random.RandomState(7)
    h, w = 32, 64
    n = 3 * h * w
    uv = np.stack(
        [rng.rand(n) * (w + 4) - 2, rng.rand(n) * (h + 4) - 2], axis=-1
    )
    # include exactly-integral coordinates (reference splats 1 pixel there)
    uv[:50] = np.round(uv[:50])
    depth = rng.rand(n).astype(np.float32) * 30 + 1
    # quantize depths so both methods see identical keys
    depth = (depth.view(np.int32) & np.int32(~0xFF)).view(np.float32)
    label = rng.randint(0, 19, size=n).astype(np.int32)
    valid = rng.rand(n) > 0.2
    args = (
        jnp.asarray(uv, jnp.float32),
        jnp.asarray(depth),
        jnp.asarray(label),
        jnp.asarray(valid),
    )
    l1, d1 = zbuffer_splat(*args, height=h, width=w, method="sort")
    l2, d2 = zbuffer_splat(*args, height=h, width=w, method="packed")
    # sentinel (max_valid+1) isn't pre-quantized, so allow its truncation
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-3)
    # labels may differ only where two equal-depth points tie (sort breaks by
    # index, packed by label) — with random depths that's measure-zero here.
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_zbuffer_nearest_wins():
    uv = jnp.array([[1.0, 1.0], [1.0, 1.0]])
    depth = jnp.array([5.0, 2.0])
    label = jnp.array([7, 3], dtype=jnp.int32)
    valid = jnp.array([True, True])
    ll, dd = zbuffer_splat(uv, depth, label, valid, height=4, width=4)
    assert int(ll[1, 1]) == 3
    assert float(dd[1, 1]) == pytest.approx(2.0)


def test_zbuffer_invalid_point_loses_and_zeroes():
    uv = jnp.array([[1.0, 1.0], [2.0, 2.0]])
    depth = jnp.array([5.0, 1.0])
    label = jnp.array([7, 3], dtype=jnp.int32)
    valid = jnp.array([True, False])
    ll, dd = zbuffer_splat(uv, depth, label, valid, height=4, width=4)
    # invalid point still touches (2,2) but contributes label 0, sentinel depth
    assert int(ll[2, 2]) == 0
    assert float(dd[2, 2]) == pytest.approx(6.0)  # max(valid)+1
    assert int(ll[1, 1]) == 7
    # untouched pixel
    assert float(dd[0, 3]) == -1.0


def test_zbuffer_batched():
    uv = jnp.zeros((2, 3, 2)) + jnp.array([1.0, 1.0])
    depth = jnp.ones((2, 3))
    label = jnp.ones((2, 3), jnp.int32) * jnp.array([[4], [9]])
    valid = jnp.ones((2, 3), bool)
    ll, dd = zbuffer_splat(uv, depth, label, valid, height=4, width=4)
    assert ll.shape == (2, 4, 4)
    assert int(ll[0, 1, 1]) == 4 and int(ll[1, 1, 1]) == 9


@pytest.mark.parametrize("method", ["packed", "pallas_interpret"])
def test_zbuffer_batched_matches_per_sample(method):
    """The packed path handles batches with per-batch group offsets in ONE
    sort + placement; each element must equal its standalone splat (no
    cross-batch bleed, per-batch sentinel depths)."""
    rng = np.random.RandomState(3)
    h, w, b, n = 7, 9, 3, 60
    uv = rng.rand(b, n, 2) * [w + 2, h + 2] - 1
    depth = rng.rand(b, n) * (10 ** rng.randint(0, 3, (b, 1))) + 0.5
    label = rng.randint(1, 12, size=(b, n)).astype(np.int32)
    valid = rng.rand(b, n) > 0.3
    lb, db = zbuffer_splat(
        jnp.asarray(uv, jnp.float32), jnp.asarray(depth, jnp.float32),
        jnp.asarray(label), jnp.asarray(valid),
        height=h, width=w, method=method,
    )
    for i in range(b):
        ls, ds = zbuffer_splat(
            jnp.asarray(uv[i], jnp.float32),
            jnp.asarray(depth[i], jnp.float32),
            jnp.asarray(label[i]), jnp.asarray(valid[i]),
            height=h, width=w, method=method,
        )
        np.testing.assert_array_equal(np.asarray(lb[i]), np.asarray(ls))
        np.testing.assert_array_equal(np.asarray(db[i]), np.asarray(ds))


def test_zbuffer_rgb_payload():
    uv = jnp.array([[1.0, 1.0], [1.0, 1.0]])
    depth = jnp.array([5.0, 2.0])
    rgb = jnp.array([[10.0, 20.0, 30.0], [1.0, 2.0, 3.0]])
    valid = jnp.array([True, True])
    ll, dd = zbuffer_splat(uv, depth, rgb, valid, height=4, width=4)
    assert ll.shape == (4, 4, 3)
    np.testing.assert_allclose(np.asarray(ll[1, 1]), [1.0, 2.0, 3.0])


def _torch_paste(mask, bbox, h, w):
    import torch
    import torch.nn.functional as F

    m = torch.tensor(np.asarray(mask))[None, None].float()
    x0, y0, x1, y1 = bbox
    iy = (torch.arange(h).float() + 0.5 - y0) / (y1 - y0) * 2 - 1
    ix = (torch.arange(w).float() + 0.5 - x0) / (x1 - x0) * 2 - 1
    gy = iy[:, None].expand(h, w)
    gx = ix[None, :].expand(h, w)
    grid = torch.stack([gx, gy], dim=-1)[None]
    return F.grid_sample(m, grid, align_corners=False)[0, 0].numpy()


def test_paste_mask_matches_torch_grid_sample():
    rng = np.random.RandomState(3)
    mask = rng.rand(28, 28).astype(np.float32)
    for bbox in [(10.0, 5.0, 50.0, 40.0), (-5.0, -3.0, 20.0, 33.5), (40.0, 30.0, 90.0, 64.0)]:
        ours = paste_mask_bilinear(
            jnp.asarray(mask), jnp.asarray(bbox, jnp.float32), img_h=64, img_w=96
        )
        ref = _torch_paste(mask, bbox, 64, 96)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_paste_degenerate_bbox_is_zero():
    mask = jnp.ones((28, 28))
    out = paste_mask_bilinear(mask, jnp.array([5.0, 5.0, 5.0, 9.0]), img_h=16, img_w=16)
    assert float(jnp.abs(out).max()) == 0.0


def test_composite_depth_order_and_strictness():
    h = w = 32
    # Two instances overlapping; nearer one must win.
    masks = jnp.ones((2, 8, 8))
    bboxes = jnp.array([[4.0, 4.0, 20.0, 20.0], [10.0, 10.0, 28.0, 28.0]])
    depths = jnp.array([10.0, 4.0])  # painted far->near
    ids = jnp.array([11001, 12001], dtype=jnp.int32)
    valid = jnp.array([True, True])
    bg_labels = jnp.zeros((h, w), jnp.int32)
    bg_depth = jnp.full((h, w), 1e9)
    lab, dep = paste_and_composite(
        masks, bboxes, depths, ids, valid, bg_labels, bg_depth, img_h=h, img_w=w
    )
    assert int(lab[15, 15]) == 12001  # overlap -> nearer id
    assert int(lab[6, 6]) == 11001
    assert float(dep[15, 15]) == pytest.approx(4.0)
    # Background depth nearer than the instance blocks painting.
    bg_depth2 = jnp.full((h, w), 1.0)
    lab2, _ = paste_and_composite(
        masks, bboxes, depths, ids, valid, bg_labels, bg_depth2, img_h=h, img_w=w
    )
    assert int(lab2[15, 15]) == 0


def test_composite_invalid_padding_slots_ignored():
    h = w = 16
    masks = jnp.ones((2, 4, 4))
    bboxes = jnp.array([[2.0, 2.0, 10.0, 10.0]] * 2)
    depths = jnp.array([5.0, 1.0])
    ids = jnp.array([100, 200], dtype=jnp.int32)
    valid = jnp.array([True, False])
    lab, _ = paste_and_composite(
        masks, bboxes, depths, ids, valid,
        jnp.zeros((h, w), jnp.int32), jnp.full((h, w), 1e9), img_h=h, img_w=w
    )
    assert int(lab[5, 5]) == 100


def test_place_sorted_chunklist_bound_property():
    """The static chunk-list capacity maxchunks = n_super + nblocks must
    bound sum(counts) for ANY sorted stream (overflow would silently drop
    placements). Property-checked over adversarial distributions."""
    rng = np.random.RandomState(11)
    block, sw = 512, 1024
    for trial in range(200):
        num_groups = int(rng.randint(1, 6)) * sw
        n = int(rng.randint(1, 5000))
        style = trial % 4
        if style == 0:  # uniform
            g = rng.randint(0, num_groups, n)
        elif style == 1:  # heavy pile at one group
            g = np.full(n, rng.randint(0, num_groups))
        elif style == 2:  # clustered at supertile boundaries
            bases = (rng.randint(0, num_groups // sw, n // 2 + 1) * sw)
            g = np.concatenate([bases, bases + sw - 1])[:n]
        else:  # sparse tail
            g = rng.randint(num_groups - 10, num_groups, n)
        g = np.sort(g.astype(np.int64))
        npad = (-n) % block + block
        gp = np.concatenate([g, np.full(npad, 2**31 - 1, np.int64)])
        nblocks = len(gp) // block
        n_super = num_groups // sw
        offs = np.searchsorted(gp, np.arange(n_super + 1) * sw)
        blk0 = offs[:-1] // block
        blk1 = np.where(offs[1:] > offs[:-1], (offs[1:] - 1) // block, blk0)
        counts = blk1 - blk0 + 1
        assert (counts >= 1).all()
        assert counts.sum() <= n_super + nblocks, (
            trial, counts.sum(), n_super + nblocks
        )


def test_place_sorted_key_zero_is_distinct_from_empty():
    """A winning key of exactly 0 must be returned as 0, not EMPTY (the
    internal +1 bias keeps untouched groups distinguishable)."""
    from panoptic_forecasting_tpu.kernels.placement import place_sorted

    rng = np.random.RandomState(3)
    num_groups, n = 2048, 600
    g = rng.randint(0, num_groups, n).astype(np.int32)
    k = rng.randint(0, 2**31 - 1, n).astype(np.int32)
    k[::7] = 0  # legitimate zero keys sprinkled through
    order = np.lexsort((k, g))
    g, k = g[order], k[order]
    out = np.asarray(
        place_sorted(
            jnp.asarray(g), jnp.asarray(k), num_groups=num_groups,
            interpret=True, block=512, sw=1024,
        )
    )
    ref = np.full(num_groups, 0x7FFFFFFF, np.int32)
    np.minimum.at(ref, g, k)
    np.testing.assert_array_equal(out, ref)
    assert (out == 0).any()  # at least one group actually won with key 0


def test_zbuffer_large_labels_route_to_exact_path():
    """Payloads >= 256 (e.g. panoptic ids) must not alias through the
    8-bit packed key: auto + max_label routes to the exact sort path."""
    rng = np.random.RandomState(5)
    h, w, n = 6, 9, 60
    uv = rng.rand(n, 2) * [w + 2, h + 2] - 1
    depth = rng.rand(n) * 10 + 0.5
    # panoptic-style ids: class*1000 + instance, far above 255, and
    # chosen so 8-bit aliasing (mod 256) WOULD merge distinct ids
    label = (11000 + rng.randint(0, 4, size=n) * 256).astype(np.int32)
    valid = rng.rand(n) > 0.3
    gl, gd = _np_zbuffer(uv, depth, label, valid, h, w)
    ll, dd = zbuffer_splat(
        jnp.asarray(uv, jnp.float32),
        jnp.asarray(depth, jnp.float32),
        jnp.asarray(label),
        jnp.asarray(valid),
        height=h, width=w, method="auto", max_label=12000,
    )
    np.testing.assert_array_equal(np.asarray(ll), gl)
    np.testing.assert_allclose(np.asarray(dd), gd, atol=1e-6)


def test_zbuffer_packed_rejects_large_max_label():
    uv = jnp.zeros((4, 2))
    depth = jnp.ones((4,))
    label = jnp.zeros((4,), jnp.int32)
    valid = jnp.ones((4,), bool)
    with pytest.raises(ValueError, match="alias"):
        zbuffer_splat(uv, depth, label, valid, height=4, width=4,
                      method="packed", max_label=512)


def test_place_sorted_multi_run_min_combines():
    """runs > 1: independently sorted segments targeting OVERLAPPING
    groups must min-combine into the same canvas as one global
    scatter-min (v2 multi-run contract, used by sort_runs splats)."""
    from panoptic_forecasting_tpu.kernels.placement import place_sorted

    rng = np.random.RandomState(13)
    num_groups, runs, rl = 9000, 3, 2000
    g = rng.randint(0, num_groups, runs * rl).astype(np.int32)
    k = rng.randint(0, 2**30, runs * rl).astype(np.int32)
    gs = g.reshape(runs, rl).copy()
    ks = k.reshape(runs, rl).copy()
    for r in range(runs):  # sort each run independently
        order = np.lexsort((ks[r], gs[r]))
        gs[r], ks[r] = gs[r][order], ks[r][order]
    out = np.asarray(
        place_sorted(
            jnp.asarray(gs.reshape(-1)), jnp.asarray(ks.reshape(-1)),
            num_groups=num_groups, runs=runs,
            interpret=True, block=512, sw=1024,
        )
    )
    ref = np.full(num_groups, 0x7FFFFFFF, np.int32)
    np.minimum.at(ref, g, k)
    np.testing.assert_array_equal(out, ref)


def test_zbuffer_sort_runs_matches_global_sort():
    """sort_runs segmentation (per-frame sorts + min-combining placement)
    must equal the single-globally-sorted packed path exactly."""
    rng = np.random.RandomState(21)
    h, w, t = 16, 32, 3
    n = t * h * w
    uv = np.stack(
        [rng.rand(n) * (w + 4) - 2, rng.rand(n) * (h + 4) - 2], axis=-1
    )
    depth = rng.rand(n).astype(np.float32) * 30 + 1
    depth = (depth.view(np.int32) & np.int32(~0xFF)).view(np.float32)
    label = rng.randint(0, 19, size=n).astype(np.int32)
    valid = rng.rand(n) > 0.2
    args = (
        jnp.asarray(uv, jnp.float32)[None],
        jnp.asarray(depth)[None],
        jnp.asarray(label)[None],
        jnp.asarray(valid)[None],
    )
    l1, d1 = zbuffer_splat(*args, height=h, width=w, method="packed")
    l2, d2 = zbuffer_splat(
        *args, height=h, width=w, method="pallas_interpret", sort_runs=t
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_zbuffer_sort_runs_must_divide():
    """Non-dividing sort_runs raises (documented contract) instead of
    silently falling back to a different sort segmentation."""
    h, w = 8, 16
    n = 3 * h * w  # 384: not divisible by 5
    args = (
        jnp.zeros((1, n, 2), jnp.float32),
        jnp.ones((1, n), jnp.float32),
        jnp.zeros((1, n), jnp.int32),
        jnp.ones((1, n), bool),
    )
    with pytest.raises(ValueError, match="must divide"):
        zbuffer_splat(
            *args, height=h, width=w, method="pallas_interpret",
            sort_runs=5,
        )


def test_place_sorted_disjoint_owner_runs():
    """disjoint=True (per-batch canvas slices) must equal the general
    cross-product layout when each run's entries stay in its own slice."""
    from panoptic_forecasting_tpu.kernels.placement import place_sorted

    rng = np.random.RandomState(17)
    sw, runs, per = 1024, 4, 3 * 1024
    num_groups = runs * 2 * sw  # 2 supertiles per run slice
    gs, ks = [], []
    for r in range(runs):
        g = (rng.randint(0, 2 * sw, per) + r * 2 * sw).astype(np.int32)
        k = rng.randint(0, 2**30, per).astype(np.int32)
        o = np.lexsort((k, g))
        gs.append(g[o]); ks.append(k[o])
    g_all = np.concatenate(gs); k_all = np.concatenate(ks)
    ref = np.full(num_groups, 0x7FFFFFFF, np.int32)
    np.minimum.at(ref, g_all, k_all)
    for disjoint in (False, True):
        out = np.asarray(
            place_sorted(
                jnp.asarray(g_all), jnp.asarray(k_all),
                num_groups=num_groups, runs=runs, disjoint=disjoint,
                interpret=True, block=512, sw=sw,
            )
        )
        np.testing.assert_array_equal(out, ref)


def test_zbuffer_batched_disjoint_aligned():
    """Batched splat on sw-aligned canvases exercises the disjoint
    owner-run placement; must equal per-sample splats exactly."""
    rng = np.random.RandomState(23)
    h, w, b, n = 16, 16, 3, 400  # 4*h*w == 1024 == interpret sw
    uv = rng.rand(b, n, 2) * [w + 2, h + 2] - 1
    depth = (rng.rand(b, n) * 30 + 1).astype(np.float32)
    depth = (depth.view(np.int32) & np.int32(~0xFF)).view(np.float32)
    label = rng.randint(1, 12, size=(b, n)).astype(np.int32)
    valid = rng.rand(b, n) > 0.2
    lb, db = zbuffer_splat(
        jnp.asarray(uv, jnp.float32), jnp.asarray(depth),
        jnp.asarray(label), jnp.asarray(valid),
        height=h, width=w, method="pallas_interpret",
    )
    for i in range(b):
        ls, ds = zbuffer_splat(
            jnp.asarray(uv[i], jnp.float32), jnp.asarray(depth[i]),
            jnp.asarray(label[i]), jnp.asarray(valid[i]),
            height=h, width=w, method="packed",
        )
        np.testing.assert_array_equal(np.asarray(lb[i]), np.asarray(ls))
        np.testing.assert_array_equal(np.asarray(db[i]), np.asarray(ds))
