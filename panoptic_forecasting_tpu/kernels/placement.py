"""Pallas TPU kernel: place a sorted (group, key) stream into a dense canvas.

This is the second half of the packed z-buffer splat
(kernels/zbuffer.py, reference capability torch_scatter.scatter_min at
pc_transform_model.py:100-139). After ``lax.sort`` the winner of every
canvas group is the group's smallest packed key, so "scatter the winners"
is exactly: ``canvas[g] = key[first entry of run(g)]``.

XLA's scatter lowers this to a serialized per-update loop on TPU (~40 ms
for 6.3M points at Cityscapes scale — measured round 2). This kernel
replaces it with a streaming one-hot-matmul placement that exploits the
sort order:

  * Winner keys are unique per group (losers are pre-masked to 0 using
    run-start flags), so "place" = per-pixel SUM of one-hot-selected
    keys — an MXU matmul, not a VPU scatter.
  * Keys are split (in-kernel) into four bytes lifted to bfloat16
    (integers <= 255 are exact in bf16), so the f32 matmul accumulators
    reproduce the int32 key bit-exactly.
  * The canvas is cut into supertiles of ``sw`` pixels; a flattened
    (supertile, input-block) chunk list — built host-free in XLA with one
    searchsorted over supertile boundaries — drives a 1-D grid via scalar
    prefetch. Input blocks stream double-buffered; each supertile's
    output row block accumulates in VMEM across revisited steps. EMPTY
    supertiles get no chunks: their rows keep the zeros of an aliased
    zero input buffer (critical for sparse plane-major canvases — the
    per-frame fused forecast leaves 3 of 4 corner planes nearly empty).
  * Within a block, each ``sub``-entry sub-chunk multiplies against one
    ``win``-lane window around its sorted group range. Per-sub-chunk
    issue overhead (scalar reads, dynamic-slice RMW) dominates at
    sub=128 (measured round 3), so ``sub`` is a tunable: bigger
    sub-chunks amortize the overhead at the cost of a wider window
    (span grows with sub/density). Rare wide spans (sparse regions,
    supertile boundaries) take a per-STEP slow path behind a single
    predicate — per-sub-chunk dynamic loops cost ~18 ms in bare loop
    setup (measured), so the fast path must contain none.
  * Entries outside a window simply fail the equality compare
    (self-masking): stray neighbours from block rounding and the
    sentinel padding (group = INT32_MAX) contribute zero.
  * Output rows are (window-row, byte) pairs so the read-modify-write
    slides along the cheap sublane axis, never the lane axis.

Empirically on v5e at 6.3M points: ~40 ms XLA scatter → ~7 ms (round 2,
sub=128/sw=8192) → see docs/perf_notes.md for the round-3 sweep; the
result is bit-identical throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EMPTY = 0x7FFFFFFF  # plain int: jnp constants would be captured tracers
_BIG = 0x7FFFFFFF

LANE = 128  # output lane width / window alignment unit
SUB = 128   # default entries per sub-chunk (see `sub` arg)
WIN = 384   # default fast-path window width (pixels)


def _bytes4(row):
    """(1, S) int32 -> (4, S) bf16 exact byte planes (msb first)."""
    return jnp.concatenate(
        [
            ((row >> 24) & 0xFF).astype(jnp.bfloat16),
            ((row >> 16) & 0xFF).astype(jnp.bfloat16),
            ((row >> 8) & 0xFF).astype(jnp.bfloat16),
            (row & 0xFF).astype(jnp.bfloat16),
        ],
        axis=0,
    )


_DN = (((1,), (0,)), ((), ()))  # (4, S) @ (S, LANE) -> (4, LANE)


def _kernel(tid_ref, blk_ref, fst_ref, sflag_ref, win_ref, g_ref, k_ref,
            zero_ref, out_ref, *, sw, nsub_in, sub, win):
    del zero_ref  # alias source of out_ref; only its HBM zeros matter
    j = pl.program_id(0)
    nsub_out = sw // LANE

    @pl.when(fst_ref[j] == 1)
    def _():
        out_ref[...] = jnp.zeros((1, nsub_out * 4, LANE), jnp.float32)

    base = tid_ref[j] * sw
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)

    for i in range(nsub_in):
        w0 = win_ref[j * nsub_in + i] & 0xFFFF
        g_i = g_ref[0, :, i : i + 1]  # (sub, 1) sorted groups
        kb_i = _bytes4(k_ref[0, i : i + 1, :])  # (4, sub) bf16 key bytes

        # One window covers the typical sorted span (self-masking for
        # strays/sentinels). win//LANE dots -> (4*win//LANE, LANE)
        # stacked (window-row, byte) block added at a dynamic SUBLANE
        # offset.
        hit = (g_i == (base + w0 + lane_w)).astype(jnp.bfloat16)
        contrib = jnp.concatenate(
            [
                jax.lax.dot_general(
                    kb_i, hit[:, s * LANE : (s + 1) * LANE], _DN,
                    preferred_element_type=jnp.float32,
                )
                for s in range(win // LANE)
            ],
            axis=0,
        )
        row0 = (w0 // LANE) * 4
        cur = out_ref[0, pl.ds(row0, 4 * (win // LANE)), :]
        out_ref[0, pl.ds(row0, 4 * (win // LANE)), :] = cur + contrib

    # Slow path for sub-chunks with entries beyond the fast window. The
    # windows are ENTRY-ANCHORED: each iteration jumps straight to the
    # first not-yet-covered entry's window, so a sub-chunk crossing an
    # empty canvas gap costs ~#clusters iterations, not #subtiles-in-gap
    # (a range sweep burned ~45K mostly-empty windows on real scenes).
    # The entry threshold (g > end) keeps the one-hot sums exact even
    # when windows overlap after alignment. One predicate per STEP plus
    # one per flagged sub-chunk — bare per-sub-chunk dynamic loops cost
    # ~18 ms in loop setup alone (measured).
    @pl.when(sflag_ref[j] == 1)
    def _():
        for i in range(nsub_in):
            packed = win_ref[j * nsub_in + i]
            w0 = packed & 0xFFFF
            g_i = g_ref[0, :, i : i + 1]
            kb_i = _bytes4(k_ref[0, i : i + 1, :])
            limit = base + sw

            @pl.when(packed >> 16 > 0)
            def _(g_i=g_i, kb_i=kb_i, w0=w0, limit=limit):
                def cond(end):
                    rem = jnp.sum(
                        ((g_i > end) & (g_i < limit)).astype(jnp.int32)
                    )
                    return rem > 0

                def body(end):
                    idx = jnp.sum((g_i <= end).astype(jnp.int32))
                    wn = g_ref[0, idx, i]  # first uncovered entry
                    rel = jnp.clip(
                        ((wn - base) // LANE) * LANE, 0, sw - win
                    )
                    hit = (
                        (g_i == (base + rel + lane_w)) & (g_i > end)
                    ).astype(jnp.bfloat16)
                    contrib = jnp.concatenate(
                        [
                            jax.lax.dot_general(
                                kb_i, hit[:, s * LANE : (s + 1) * LANE],
                                _DN, preferred_element_type=jnp.float32,
                            )
                            for s in range(win // LANE)
                        ],
                        axis=0,
                    )
                    row0 = (rel // LANE) * 4
                    nrows = 4 * (win // LANE)
                    cur = out_ref[0, pl.ds(row0, nrows), :]
                    out_ref[0, pl.ds(row0, nrows), :] = cur + contrib
                    return base + rel + win - 1

                jax.lax.while_loop(cond, body, base + w0 + win - 1)


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "block", "sw", "interpret", "win", "sub"),
)
def place_sorted(group_s, key_s, *, num_groups: int, block: int = 4096,
                 sw: int = 32768, interpret: bool = False, win: int = WIN,
                 sub: int = SUB):
    """Dense canvas from a sorted (group, key) stream.

    Args:
      group_s: (N,) int32, ascending; entries with values >= num_groups
        (e.g. sentinels) are ignored.
      key_s:   (N,) int32 packed keys in [0, 2^31 - 2], ascending within
        each group run (i.e. the pair stream is lexicographically
        sorted). Key 0 is a legitimate value: winners are biased by +1
        internally so an untouched group (returned as EMPTY) is never
        confused with a winning key of 0.
      num_groups: canvas size.
      block/sw/win/sub: tuning — entries per grid step, supertile width
        (<= 65536: window offsets pack into 16 bits), fast-window width
        (multiple of 128), entries per sub-chunk (divides block).

    Returns (num_groups,) int32: per-group min key, EMPTY (int32 max)
    where a group has no entries.
    """
    n = group_s.shape[0]
    assert block % sub == 0 and win % LANE == 0 and sw % LANE == 0
    assert sw <= 65536 and win <= sw
    nsub_in = block // sub
    nsub_out = sw // LANE
    # Winner mask: only each group's first (= smallest-key) entry keeps
    # its key; losers contribute 0 to the one-hot sums. Winners are
    # biased +1 (undone after the byte recombine) so key 0 stays
    # distinguishable from "no entry" — the bias keeps every byte-plane
    # value <= 255 since keys are capped at 2^31 - 2.
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), group_s[1:] != group_s[:-1]]
    )
    mkey = jnp.where(first, key_s + 1, 0)

    # Pad the stream with a full sentinel block so padding chunks always
    # have a valid block to point at; pad the canvas to a supertile
    # multiple.
    npad = (-n) % block + block
    group_p = jnp.concatenate([group_s, jnp.full((npad,), _BIG, jnp.int32)])
    mkey_p = jnp.concatenate([mkey, jnp.zeros((npad,), jnp.int32)])
    ntot = n + npad
    nblocks = ntot // block
    groups_pad = num_groups + (-num_groups) % sw
    n_super = groups_pad // sw

    # --- chunk list -------------------------------------------------------
    bounds = jnp.arange(n_super + 1, dtype=jnp.int32) * sw
    offs = jnp.searchsorted(group_p, bounds).astype(jnp.int32)
    blk0 = offs[:-1] // block
    blk1 = jnp.where(offs[1:] > offs[:-1], (offs[1:] - 1) // block, blk0)
    # EMPTY supertiles get no chunks at all: their output rows are never
    # visited and keep the zeros of the aliased output buffer.
    counts = jnp.where(offs[1:] > offs[:-1], blk1 - blk0 + 1, 0)
    maxchunks = n_super + nblocks  # static bound on sum(counts)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    j = jnp.arange(maxchunks, dtype=jnp.int32)
    tid = jnp.clip(
        jnp.searchsorted(cum, j, side="right").astype(jnp.int32) - 1,
        0,
        n_super - 1,
    )
    blks = jnp.clip(blk0[tid] + (j - cum[tid]), 0, nblocks - 1)
    fst = (j == cum[tid]).astype(jnp.int32)

    # Per-(chunk, sub-chunk) fast-window offset + extra-window count,
    # packed into one int32 (w0 < 2^16 since sw <= 65536).
    g3 = group_p.reshape(nblocks, nsub_in, sub)
    gf = g3[:, :, 0][blks]  # (maxchunks, nsub_in)
    gl = g3[:, :, sub - 1][blks]
    base_j = (tid * sw)[:, None]
    t0 = jnp.maximum(gf - base_j, 0)
    w0s = jnp.clip((t0 // LANE) * LANE, 0, sw - win)
    hi_w = jnp.clip((gl - base_j) // LANE, 0, nsub_out - 1)
    exs = jnp.maximum(hi_w - (w0s // LANE + win // LANE - 1), 0)
    # Fully-stray sub-chunks (every entry beyond this supertile) need no
    # extra windows — without this, every boundary chunk would take the
    # slow path.
    exs = jnp.where(gf - base_j >= sw, 0, exs)
    wins = (w0s | (exs << 16)).reshape(-1)
    sflag = (jnp.max(exs, axis=1) > 0).astype(jnp.int32)

    # Groups sub-chunk-major (entries on sublanes); keys natural layout
    # (entries on lanes — byte planes are extracted in-kernel).
    gT = group_p.reshape(nblocks, nsub_in, sub).transpose(0, 2, 1)
    kN = mkey_p.reshape(nblocks, nsub_in, sub)

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
            # zero buffer aliased to the output: supertiles with no chunks
            # are never visited and keep these zeros.
            pl.BlockSpec(
                (1, nsub_out * 4, LANE),
                lambda i, tid, blk, fst, sf, win: (tid[i], 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nsub_out * 4, LANE),
            lambda i, tid, blk, fst, sf, win: (tid[i], 0, 0),
        ),
    )
    zeros = jnp.zeros((n_super, nsub_out * 4, LANE), jnp.float32)
    sums = pl.pallas_call(
        functools.partial(
            _kernel, sw=sw, nsub_in=nsub_in, sub=sub, win=win
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_super, nsub_out * 4, LANE), jnp.float32
        ),
        # index 7 = 5 scalar-prefetch args + gT + kN, then the zero buffer
        input_output_aliases={7: 0},
        interpret=interpret,
    )(tid, blks, fst, sflag, wins, gT, kN, zeros)

    b = sums.reshape(n_super, nsub_out, 4, LANE).astype(jnp.int32)
    canvas = (
        (b[:, :, 0] << 24)
        | (b[:, :, 1] << 16)
        | (b[:, :, 2] << 8)
        | b[:, :, 3]
    ).reshape(-1)[:num_groups]
    # 0 == untouched (real winners were biased to >= 1 above).
    return jnp.where(canvas == 0, jnp.int32(EMPTY), canvas - 1)
