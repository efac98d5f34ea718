"""Sortless min-window placement (kernels/experimental/minwin.py).

Order never matters (every combine is a min), so these tests feed
deliberately shuffled streams with duplicates — exactly what the sorted
v2 kernel could not accept.
"""

import numpy as np
import pytest

from panoptic_forecasting_tpu.kernels.experimental.minwin import (
    place_minwin,
)
from panoptic_forecasting_tpu.kernels.placement import EMPTY, place_sorted


def _ref(group, key, num_groups):
    out = np.full(num_groups, EMPTY, np.int64)
    for g, k in zip(group, key):
        if 0 <= g < num_groups:
            out[g] = min(out[g], k)
    return out.astype(np.int32)


def _run(group, key, num_groups, **kw):
    canvas, overflow = place_minwin(
        np.asarray(group, np.int32),
        np.asarray(key, np.int32),
        num_groups=num_groups,
        block=512,
        sw=1024,
        interpret=True,
        **kw,
    )
    return np.asarray(canvas), int(overflow)


def test_minwin_unsorted_with_duplicates():
    rng = np.random.RandomState(0)
    n, g = 4096, 3000
    group = rng.randint(0, g, n)
    key = rng.randint(0, 2**30, n)
    canvas, ov = _run(group, key, g)
    assert ov == 0
    np.testing.assert_array_equal(canvas, _ref(group, key, g))


def test_minwin_key_zero_and_sentinels():
    group = np.array([5, 5, 7, 2**30, 9, 5], np.int32)
    key = np.array([3, 0, 11, 1, 0, 2], np.int32)
    canvas, ov = _run(group, key, 16)
    assert ov == 0
    ref = _ref(group, key, 16)
    np.testing.assert_array_equal(canvas, ref)
    assert canvas[5] == 0 and canvas[9] == 0 and canvas[0] == EMPTY


def test_minwin_locally_coherent_wide_canvas():
    """Raster-like stream: ascending-ish groups with jitter and dups."""
    rng = np.random.RandomState(1)
    n = 8192
    g = 6000
    base = np.linspace(0, g - 50, n).astype(np.int64)
    group = np.clip(base + rng.randint(-40, 40, n), 0, g - 1)
    key = rng.randint(0, 2**28, n)
    canvas, ov = _run(group, key, g)
    assert ov == 0
    np.testing.assert_array_equal(canvas, _ref(group, key, g))


def test_minwin_matches_place_sorted_on_sorted_stream():
    rng = np.random.RandomState(2)
    n, g = 2048, 1500
    group = np.sort(rng.randint(0, g, n)).astype(np.int32)
    key = rng.randint(0, 2**29, n).astype(np.int32)
    order = np.lexsort((key, group))
    gs, ks = group[order], key[order]
    ref = np.asarray(
        place_sorted(
            gs, ks, num_groups=g, block=512, sw=1024, interpret=True
        )
    )
    canvas, ov = _run(gs, ks, g)
    assert ov == 0
    np.testing.assert_array_equal(canvas, ref)


def test_minwin_overflow_detection():
    """A stream whose blocks all span the whole canvas must trip the
    static chunk-capacity contract instead of silently dropping."""
    rng = np.random.RandomState(3)
    n = 512 * 40
    g = 1024 * 30  # 30 supertiles at sw=1024
    group = rng.randint(0, g, n)  # every 512-block spans ~all supertiles
    key = rng.randint(0, 2**28, n)
    canvas, ov = _run(group, key, g)
    if ov == 0:  # capacity happened to fit: result must then be exact
        np.testing.assert_array_equal(canvas, _ref(group, key, g))
    else:
        assert ov > 0


def test_minwin_pile_plus_interior():
    """Border-pile pattern: every block mixes a small 'guard' group with
    its local interior range — the span-interval coverage must place
    both (this is the clamped-point shape from the z-buffer)."""
    rng = np.random.RandomState(4)
    n, g = 4096, 5000
    base = np.linspace(1024, g - 50, n).astype(np.int64)
    group = np.clip(base + rng.randint(-30, 30, n), 0, g - 1)
    pile = rng.rand(n) < 0.02
    group = np.where(pile, rng.randint(0, 64, n), group)
    key = rng.randint(0, 2**28, n)
    canvas, ov = _run(group, key, g)
    assert ov == 0
    np.testing.assert_array_equal(canvas, _ref(group, key, g))


def test_minwin_pile_classification_multi_plane():
    """plane_size/pile_width: top+bottom piles on every plane must not
    widen the interior intervals — exactness plus zero overflow on a
    stream where plain interval coverage would explode."""
    rng = np.random.RandomState(6)
    plane, pile_w, nplanes = 4096, 128, 3
    g = plane * nplanes
    per = 16384 // nplanes
    n = per * nplanes
    parts = []
    for p in range(nplanes):
        base = np.linspace(pile_w, plane - pile_w - 40, per).astype(
            np.int64
        )
        loc = np.clip(base + rng.randint(-30, 30, per), 0, plane - 1)
        r = rng.rand(per)
        loc = np.where(r < 0.05, rng.randint(0, pile_w, per), loc)
        loc = np.where(
            r > 0.95, plane - 1 - rng.randint(0, pile_w, per), loc
        )
        parts.append(loc + p * plane)
    group = np.concatenate(parts)
    key = rng.randint(0, 2**28, n)
    canvas, ov = _run(
        group, key, g, plane_size=plane, pile_width=pile_w
    )
    assert ov == 0
    np.testing.assert_array_equal(canvas, _ref(group, key, g))
