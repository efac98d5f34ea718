"""EXPERIMENTAL — sortless min-window placement (measured dead end).

A research kernel, NOT on any production path. The production z-buffer
(kernels/zbuffer.py -> kernels/placement.place_sorted) keeps the
sort + dot-placement structure: exact duplicate handling without sorted
winner masking was measured at 12.1-33 ms vs 5.0 ms for place_sorted on
the same 6.3M-entry stream (v5e, docs/perf_notes.md round-3c). This
module preserves the working implementation, its design record, and the
negative result for callers whose streams genuinely cannot be sorted
(e.g. incremental per-shard sub-streams).

Reference capability context: torch_scatter.scatter_min z-buffer at
pc_transform_model.py:100-139.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..placement import EMPTY, LANE, SUB, WIN, _BIG, _DN, _bytes4

#
# place_sorted needs a lex-sorted stream for two things: per-group winner
# masking (the byte-plane dots SUM over hits, so each group may hit at
# most once per sub-chunk) and window locality. Sorting costs 11.4 ms of
# the 22 ms pc z-buffer at Cityscapes scale. This variant keeps the MXU
# dot but makes BOTH properties sort-free:
#
#   * duplicates: a fifth all-ones row in the byte-plane dot yields the
#     per-slot HIT COUNT; count==1 slots are exact, count==0 slots are
#     EMPTY, and count>=2 slots (duplicate groups in one sub-chunk) are
#     recomputed by a predicated VPU masked-min over the sub-chunk's
#     entries — rare, so the dot stays the workhorse. (An all-VPU min
#     kernel was measured 2.4x slower than the dot: 12.1 vs 5.0 ms.)
#   * locality: windows come from per-sub-chunk (min, max) group spans,
#     and the chunk list from per-block span intervals. Streams with
#     border PILES (the z-buffer's clamped points: groups jump to a
#     plane's first/last rows from anywhere) would make every interval
#     span the whole plane, so pile entries are classified out (via
#     ``plane_size``/``pile_width``) into separate top/bottom intervals —
#     per block the coverage is the union of three tight intervals.
#
# Coverage capacity is static; the returned ``overflow`` scalar is 0 iff
# every chunk fit — entries are NEVER silently dropped on the
# overflow==0 path.
#
# MEASURED OUTCOME (v5e, 6.3M entries, docs/perf_notes.md): the
# production z-buffer KEEPS the sorted path. Exact duplicate handling
# without sorted winner masking costs 12.1 ms (pure VPU masked-min) or
# 17.9 ms (dot + unconditional fix) vs 5.0 ms for place_sorted on the
# same stream — and the per-sub-chunk `pl.when` variant hit 33 ms
# (~240 ns per scalar branch, 32 per step). Sorting (11.4 ms) + the
# dot kernel stays ahead because the MXU does the per-slot reduction
# at byte-plane-dot speed, which a min cannot use. This kernel remains
# for callers whose streams genuinely cannot be sorted (e.g. incremental
# per-shard sub-streams) and as the measured record of the design
# space.


def _contrib_cnt(kb5, hit, win):
    """(nrow, LANE) int32 keys + (nrow, LANE) counts for one window.

    kb5: (5, sub) bf16 — four byte planes of key+0 (NOT biased; counts
    disambiguate empties) plus an all-ones row. hit: (sub, win) bf16.
    """
    keys = []
    cnts = []
    for s in range(win // LANE):
        c = jax.lax.dot_general(
            kb5, hit[:, s * LANE : (s + 1) * LANE], _DN,
            preferred_element_type=jnp.float32,
        )
        ci = c[:4].astype(jnp.int32)
        keys.append(
            (ci[0:1] << 24) | (ci[1:2] << 16) | (ci[2:3] << 8) | ci[3:4]
        )
        cnts.append(c[4:5].astype(jnp.int32))
    return jnp.concatenate(keys, axis=0), jnp.concatenate(cnts, axis=0)


def _minwin_kernel(tid_ref, blk_ref, fst_ref, sflag_ref, win_ref, g_ref,
                   kn_ref, kt_ref, big_ref, out_ref, *, sw, nsub_in, sub,
                   win, debug_mode=""):
    del big_ref
    j = pl.program_id(0)
    nsub_out = sw // LANE
    nsub2 = nsub_in // 2
    nrow = win // LANE

    @pl.when(fst_ref[j] == 1)
    def _():
        out_ref[...] = jnp.full((1, nsub_out, LANE), _BIG, jnp.int32)

    base = tid_ref[j] * sw
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)
    rowoff = jax.lax.broadcasted_iota(jnp.int32, (nrow, 1, LANE), 0) * LANE
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (nrow, 1, LANE), 2)
    slot3 = rowoff + lane3  # (nrow, 1, LANE)

    def subinfo(i):
        v = (win_ref[j * nsub2 + i // 2] >> (16 * (i % 2))) & 0xFFFF
        return (v & 0x1FF) * LANE, (v >> 9) & 1, (v >> 10) & 1

    def place_window(i, rel):
        """Min-combine sub-chunk ``i``'s contribution at window ``rel``
        into the output block; exact under duplicate groups."""
        g_i = g_ref[0, :, i : i + 1]  # (sub, 1)
        kb5 = jnp.concatenate(
            [
                _bytes4(kn_ref[0, i : i + 1, :]),
                jnp.ones((1, sub), jnp.bfloat16),
            ],
            axis=0,
        )
        hit = (g_i == (base + rel + lane_w)).astype(jnp.bfloat16)
        c32, cnt = _contrib_cnt(kb5, hit, win)
        contrib = jnp.where(cnt == 1, c32, jnp.int32(_BIG))
        row0 = rel // LANE

        if debug_mode == "nofix":  # timing probe: drop duplicate slots
            cur0 = out_ref[0, pl.ds(row0, nrow), :]
            out_ref[0, pl.ds(row0, nrow), :] = jnp.minimum(cur0, contrib)
            return

        def fixed_contrib():
            # Duplicate groups inside this sub-chunk: their dot sums are
            # garbage. Recompute exactly those slots with a masked min
            # over the sub-chunk's entries (axis 1 = entries).
            hit3 = g_i[None] == (base + rel + slot3)  # (nrow, sub, LANE)
            k3 = kt_ref[0, :, i : i + 1][None]  # (1, sub, 1)
            vals = jnp.where(hit3, k3, jnp.int32(_BIG))
            fixed = jnp.min(vals, axis=1)  # (nrow, LANE)
            return jnp.where(cnt >= 2, fixed, contrib)

        if debug_mode == "alwaysfix":
            c = fixed_contrib()
            cur0 = out_ref[0, pl.ds(row0, nrow), :]
            out_ref[0, pl.ds(row0, nrow), :] = jnp.minimum(cur0, c)
            return

        @pl.when(jnp.max(cnt) >= 2)
        def _():
            cur0 = out_ref[0, pl.ds(row0, nrow), :]
            out_ref[0, pl.ds(row0, nrow), :] = jnp.minimum(
                cur0, fixed_contrib()
            )

        @pl.when(jnp.max(cnt) < 2)
        def _():
            cur0 = out_ref[0, pl.ds(row0, nrow), :]
            out_ref[0, pl.ds(row0, nrow), :] = jnp.minimum(cur0, contrib)

    for i in range(nsub_in):
        w0, _, skip_i = subinfo(i)

        @pl.when(skip_i == 0)
        def _(i=i, w0=w0):
            place_window(i, w0)

    # Entry-anchored slow path; the next uncovered entry is found with a
    # masked min (the sorted kernel's index trick needs sorted groups).
    @pl.when(sflag_ref[j] == 1)
    def _():
        for i in range(nsub_in):
            w0, slow_i, _skip = subinfo(i)
            limit = base + sw
            g_i = g_ref[0, :, i : i + 1]

            @pl.when(slow_i > 0)
            def _(i=i, g_i=g_i, w0=w0, limit=limit):
                def cond(end):
                    rem = jnp.sum(
                        ((g_i > end) & (g_i < limit)).astype(jnp.int32)
                    )
                    return rem > 0

                def body(end):
                    inr = (g_i > end) & (g_i < limit)
                    wn = jnp.min(jnp.where(inr, g_i, jnp.int32(_BIG)))
                    rel = jnp.clip(
                        ((wn - base) // LANE) * LANE, 0, sw - win
                    )
                    place_window(i, rel)
                    return base + rel + win - 1

                jax.lax.while_loop(cond, body, base + w0 + win - 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_groups", "block", "sw", "interpret", "win", "sub",
        "plane_size", "pile_width", "debug_mode",
    ),
)
def place_minwin(group, key, *, num_groups: int, block: int = 4096,
                 sw: int = 65536, interpret: bool = False, win: int = WIN,
                 sub: int = SUB, plane_size: int = 0, pile_width: int = 0,
                 debug_mode: str = ""):
    """Dense per-group min canvas from an UNSORTED (group, key) stream.

    Order never matters (every combine is a min); locality still sets
    the cost. See the v4 design comment above.

    Args:
      group: (N,) int32; entries >= num_groups are ignored (sentinels).
      key:   (N,) int32 in [0, 2^31 - 2]; key 0 is legitimate.
      plane_size / pile_width: optional pile classification. The canvas
        is treated as consecutive planes of ``plane_size`` slots; entries
        whose plane-local offset is < pile_width (top pile) or >=
        plane_size - pile_width (bottom pile) are covered by separate
        per-block intervals so border piles don't widen the interior
        span. Zero disables the split.
      num_groups / block / sw / win / sub: as in place_sorted.

    Returns (canvas, overflow): canvas (num_groups,) int32 per-group min
    key with EMPTY where no entry; overflow int32 scalar — 0 means every
    chunk fit the static capacity and the canvas is exact; > 0 means
    coverage was truncated and the caller MUST use a fallback path.
    """
    n = group.shape[0]
    assert block % sub == 0 and win % LANE == 0 and sw % LANE == 0
    assert sw <= 65536 and win <= sw
    pad = (-n) % block
    if pad:
        group = jnp.pad(group, (0, pad), constant_values=_BIG)
        key = jnp.pad(key, (0, pad))
        n += pad
    group_p = jnp.concatenate([group, jnp.full((block,), _BIG, jnp.int32)])
    key_p = jnp.concatenate([key, jnp.zeros((block,), jnp.int32)])
    ntot = n + block
    nblocks = ntot // block
    nsub_in = block // sub
    nsub_out = sw // LANE
    nrow = win // LANE
    groups_pad = num_groups + (-num_groups) % sw
    n_super = groups_pad // sw

    g3 = group_p.reshape(nblocks, nsub_in, sub)
    valid = g3 < num_groups
    if plane_size and pile_width:
        local = g3 % plane_size
        top = valid & (local < pile_width)
        bot = valid & (local >= plane_size - pile_width)
        interior = valid & ~top & ~bot
    else:
        top = jnp.zeros_like(valid)
        bot = jnp.zeros_like(valid)
        interior = valid

    def span(mask):
        mn = jnp.min(jnp.where(mask, g3, jnp.int32(_BIG)), axis=2)
        mx = jnp.max(jnp.where(mask, g3, jnp.int32(-1)), axis=2)
        return mn, mx  # (nblocks, nsub_in)

    i_mn, i_mx = span(interior)
    t_mn, t_mx = span(top)
    b_mn, b_mx = span(bot)

    # --- chunk list: union of three per-block interval coverages ---------
    def blk_interval(mn, mx):
        return jnp.min(mn, axis=1), jnp.max(mx, axis=1)  # (nblocks,)

    ivals = [blk_interval(i_mn, i_mx), blk_interval(t_mn, t_mx),
             blk_interval(b_mn, b_mx)]
    s_lo = jnp.arange(n_super, dtype=jnp.int32)[:, None] * sw
    overlap = jnp.zeros((n_super, nblocks), jnp.bool_)
    for mn, mx in ivals:
        overlap = overlap | (
            (mn[None, :] <= s_lo + (sw - 1)) & (mx[None, :] >= s_lo)
        )
    counts = jnp.sum(overlap.astype(jnp.int32), axis=1)
    prefix = jnp.cumsum(overlap.astype(jnp.int32), axis=1)
    # Static capacity (see design comment): interior spans ~1-2 tiles on
    # coherent streams, piles one tile each.
    maxchunks = 5 * nblocks + 2 * n_super
    overflow = jnp.maximum(jnp.sum(counts) - jnp.int32(maxchunks), 0)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    j = jnp.arange(maxchunks, dtype=jnp.int32)
    tid = jnp.clip(
        jnp.searchsorted(cum, j, side="right").astype(jnp.int32) - 1,
        0,
        n_super - 1,
    )
    kth = j - cum[tid]
    blks = jnp.clip(
        jax.vmap(
            lambda row, k: jnp.searchsorted(
                row, k + 1, side="left"
            ).astype(jnp.int32)
        )(prefix[tid], kth),
        0,
        nblocks - 1,
    )
    blks = jnp.where(j < cum[n_super], blks, nblocks - 1)
    row_start = cum[:n_super]
    fst = (j == row_start[tid]).astype(jnp.int32)

    # --- per-(chunk, sub-chunk) in-tile bounds -> window directives ------
    base_j = (tid * sw)[:, None]

    def tile_bounds(mn_all, mx_all):
        mn = mn_all[blks]  # (maxchunks, nsub_in)
        mx = mx_all[blks]
        inside = (mn <= base_j + (sw - 1)) & (mx >= base_j)
        lo = jnp.where(inside, jnp.maximum(mn, base_j), jnp.int32(_BIG))
        hi = jnp.where(
            inside, jnp.minimum(mx, base_j + (sw - 1)), jnp.int32(-1)
        )
        return lo, hi

    lo = jnp.full((maxchunks, nsub_in), _BIG, jnp.int32)
    hi = jnp.full((maxchunks, nsub_in), -1, jnp.int32)
    for mn_all, mx_all in (
        (i_mn, i_mx), (t_mn, t_mx), (b_mn, b_mx)
    ):
        l2, h2 = tile_bounds(mn_all, mx_all)
        lo = jnp.minimum(lo, l2)
        hi = jnp.maximum(hi, h2)

    stray = lo == _BIG  # no entries of this sub-chunk in this tile
    t0 = jnp.where(stray, 0, lo - base_j)
    w0s = jnp.clip((t0 // LANE) * LANE, 0, sw - win)
    hi_w = jnp.clip((hi - base_j) // LANE, 0, nsub_out - 1)
    exs = jnp.maximum(hi_w - (w0s // LANE + nrow - 1), 0)
    exs = jnp.where(stray, 0, exs)
    assert nsub_in % 2 == 0, "block must hold an even number of sub-chunks"
    v16 = (
        (w0s // LANE)
        | (jnp.minimum(exs, 1) << 9)
        | (stray.astype(jnp.int32) << 10)
    )
    wins = (v16[:, 0::2] | (v16[:, 1::2] << 16)).reshape(-1)
    sflag = (jnp.max(exs, axis=1) > 0).astype(jnp.int32)

    gT = g3.transpose(0, 2, 1)  # (nblocks, sub, nsub_in)
    kN = key_p.reshape(nblocks, nsub_in, sub)  # natural: byte planes
    kT = kN.transpose(0, 2, 1)  # sub-major: duplicate fix

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(maxchunks,),
        in_specs=[
            pl.BlockSpec(
                (1, sub, nsub_in),
                lambda i, tid, blk, fst, sf, win: (blk[i], 0, 0),
            ),
            pl.BlockSpec(
                (1, nsub_in, sub),
                lambda i, tid, blk, fst, sf, win: (blk[i], 0, 0),
            ),
            pl.BlockSpec(
                (1, sub, nsub_in),
                lambda i, tid, blk, fst, sf, win: (blk[i], 0, 0),
            ),
            pl.BlockSpec(
                (1, nsub_out, LANE),
                lambda i, tid, blk, fst, sf, win: (tid[i], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nsub_out, LANE),
            lambda i, tid, blk, fst, sf, win: (tid[i], 0, 0),
        ),
    )
    fill = jnp.full((n_super, nsub_out, LANE), _BIG, jnp.int32)
    canvas = pl.pallas_call(
        functools.partial(
            _minwin_kernel, sw=sw, nsub_in=nsub_in, sub=sub, win=win,
            debug_mode=debug_mode,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_super, nsub_out, LANE), jnp.int32
        ),
        # 5 scalar-prefetch + gT + kN + kT, then the fill buffer
        input_output_aliases={8: 0},
        interpret=interpret,
    )(tid, blks, fst, sflag, wins, gT, kN, kT, fill)

    canvas = canvas.reshape(-1)[:num_groups]
    return (
        jnp.where(canvas == _BIG, jnp.int32(EMPTY), canvas),
        overflow,
    )
