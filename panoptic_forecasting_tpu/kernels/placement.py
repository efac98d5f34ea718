"""Pallas TPU kernel: place sorted (group, key) runs into a dense min-canvas.

This is the second half of the packed z-buffer splat
(kernels/zbuffer.py, reference capability torch_scatter.scatter_min at
pc_transform_model.py:100-139). XLA's scatter lowers to a serialized
per-update loop on TPU (~40 ms for 6.3M points at Cityscapes scale —
measured round 2); this kernel streams the sorted point list through a
one-hot-matmul placement instead (~40 ms -> ~6-11 ms, bit-identical).

Design (v2 — round 3; v1 summed byte-planes and required ONE globally
sorted stream):

  * The stream is ``runs`` independently sorted equal-length segments
    (lex order (group, key) within each run). Per-frame sorting is ~30%
    cheaper than one global sort (lax.sort is superlinear: 3x2.1M = 11.4
    ms vs 6.3M = 16.8 ms on v5e) and different runs may target the SAME
    groups — the canvas combines everything with a per-group MIN.
  * Within a run, each group's first entry is its run-winner (keys
    ascend inside a group run); losers are pre-masked to 0. A one-hot
    compare of a sub-chunk's groups against a window of canvas slots
    turns "place the winners" into an MXU matmul: winner keys are split
    into four bf16 byte planes (exact for bytes), the (4, sub) @
    (sub, win) dots reassemble into exact int32 keys in-kernel.
  * The canvas accumulator is the int32 output block itself (aliased to
    a BIG-filled buffer): each sub-chunk's reassembled (win) contribution
    combines with ``min`` (empty slots carry BIG). Min is idempotent, so
    overlapping windows, duplicate coverage, and cross-run revisits are
    all safe by construction — no exactness guard needed (v1's summed
    planes required strict once-per-entry accounting).
  * The canvas is cut into supertiles of ``sw`` slots; a flattened
    (supertile, run, input-block) chunk list — built host-free with one
    searchsorted per run — drives a 1-D grid via scalar prefetch. Chunks
    are supertile-major, so each supertile's int32 output block stays in
    VMEM across its revisits; supertiles with no chunks keep the BIG
    fill of the aliased input (returned as EMPTY).
  * Within a block, each ``sub``-entry sub-chunk multiplies against one
    ``win``-lane window around its sorted group range. Entries outside
    the window self-mask (the equality compare fails). Rare wide spans
    (sparse regions, supertile boundaries) take a per-STEP slow path
    behind a single predicate with ENTRY-ANCHORED windows — per-sub-chunk
    dynamic loops cost ~18 ms in bare loop setup (measured round 2), so
    the fast path contains none.

Empirically on v5e at 6.3M points: ~40 ms XLA scatter -> ~7 ms (v1) ->
see docs/perf_notes.md for v2; bit-identical throughout. Round 4: the
window-offset packing widened 9 -> 10 bits, enabling sw=131072 doubled
supertiles (fewer chunks + fewer block-boundary revisits): 9.33 -> 8.68
ms on the per-frame 12-plane stream, bit-identical (prof_place_sweep).
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
WIN = 384   # default fast-path window width (canvas slots)


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


def _contrib_i32(kb_i, hit, win):
    """Reassembled int32 winner keys for one window: (win//LANE, LANE).

    kb_i: (4, sub) bf16 byte planes of the masked keys; hit: (sub, win)
    bf16 one-hot. Each byte-plane dot is exact (bytes <= 255 in bf16,
    f32 accumulate), and biased keys are < 2^31 so the top byte is
    <= 0x7F — the shift-or below cannot overflow int32. Slots with no
    winner come back 0.
    """
    rows = []
    for s in range(win // LANE):
        c = jax.lax.dot_general(
            kb_i, hit[:, s * LANE : (s + 1) * LANE], _DN,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # (4, LANE) exact ints
        rows.append(
            (c[0:1] << 24) | (c[1:2] << 16) | (c[2:3] << 8) | c[3:4]
        )
    return jnp.concatenate(rows, axis=0)


def _kernel(tid_ref, blk_ref, fst_ref, sflag_ref, win_ref, g_ref, k_ref,
            big_ref, out_ref, *, sw, nsub_in, sub, win):
    del big_ref  # alias source of out_ref; only its HBM fill matters
    j = pl.program_id(0)
    nsub_out = sw // LANE
    nsub2 = nsub_in // 2

    @pl.when(fst_ref[j] == 1)
    def _():
        out_ref[...] = jnp.full((1, nsub_out, LANE), _BIG, jnp.int32)

    base = tid_ref[j] * sw
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)

    def subinfo(i):
        # Two sub-chunks pack into one SMEM word (16 bits each:
        # LANE-aligned window offset in 10 bits + slow flag in bit 10) —
        # halves the scalar-prefetch footprint, which is what bounds the
        # batched-serving canvas count (~1 MB SMEM budget).
        v = (win_ref[j * nsub2 + i // 2] >> (16 * (i % 2))) & 0xFFFF
        return (v & 0x3FF) * LANE, (v >> 10) & 1

    for i in range(nsub_in):
        w0, _ = subinfo(i)
        g_i = g_ref[0, :, i : i + 1]  # (sub, 1) sorted groups
        kb_i = _bytes4(k_ref[0, i : i + 1, :])  # (4, sub) bf16 key bytes

        # One window covers the typical sorted span (strays/sentinels
        # self-mask). The reassembled int32 contribution min-combines
        # into the output rows at a dynamic SUBLANE offset; empty slots
        # (0) are lifted to BIG first so they never beat a winner.
        hit = (g_i == (base + w0 + lane_w)).astype(jnp.bfloat16)
        c32 = _contrib_i32(kb_i, hit, win)
        c32 = jnp.where(c32 == 0, jnp.int32(_BIG), c32)
        row0 = w0 // LANE
        cur = out_ref[0, pl.ds(row0, win // LANE), :]
        out_ref[0, pl.ds(row0, win // LANE), :] = jnp.minimum(cur, c32)

    # Slow path for sub-chunks with entries beyond the fast window. The
    # windows are ENTRY-ANCHORED: each iteration jumps straight to the
    # first not-yet-covered entry's window, so a sub-chunk crossing an
    # empty canvas gap costs ~#clusters iterations, not #subtiles-in-gap
    # (a range sweep burned ~45K mostly-empty windows on real scenes).
    # Min-combining is idempotent, so windows may overlap previously
    # covered entries freely (v1's summed planes needed a g > end
    # threshold here). One predicate per STEP plus one per flagged
    # sub-chunk — bare per-sub-chunk dynamic loops cost ~18 ms in loop
    # setup alone (measured).
    @pl.when(sflag_ref[j] == 1)
    def _():
        for i in range(nsub_in):
            w0, slow_i = subinfo(i)
            g_i = g_ref[0, :, i : i + 1]
            kb_i = _bytes4(k_ref[0, i : i + 1, :])
            limit = base + sw

            @pl.when(slow_i > 0)
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
                    hit = (g_i == (base + rel + lane_w)).astype(
                        jnp.bfloat16
                    )
                    c32 = _contrib_i32(kb_i, hit, win)
                    c32 = jnp.where(c32 == 0, jnp.int32(_BIG), c32)
                    row0 = rel // LANE
                    cur = out_ref[0, pl.ds(row0, win // LANE), :]
                    out_ref[0, pl.ds(row0, win // LANE), :] = jnp.minimum(
                        cur, c32
                    )
                    return base + rel + win - 1

                jax.lax.while_loop(cond, body, base + w0 + win - 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_groups", "block", "sw", "interpret", "win", "sub", "runs",
        "disjoint",
    ),
)
def place_sorted(group_s, key_s, *, num_groups: int, block: int = 4096,
                 sw: int = 131072, interpret: bool = False, win: int = WIN,
                 sub: int = SUB, runs: int = 1, disjoint: bool = False):
    """Dense per-group min canvas from sorted (group, key) runs.

    Args:
      group_s: (N,) int32 — ``runs`` equal-length segments, each
        ascending; entries with values >= num_groups (e.g. sentinels)
        are ignored. Different runs may contain the same groups: the
        canvas is the min across all runs.
      key_s:   (N,) int32 packed keys in [0, 2^31 - 3], ascending within
        each group run of each segment (i.e. each segment is
        lexicographically sorted). Key 0 is legitimate: winners are
        biased by +1 internally so an untouched group (returned as
        EMPTY) is never confused with a winning key of 0.
      num_groups: canvas size.
      runs: number of independently sorted segments. N must divide into
        ``runs`` equal-length segments (each is padded to the block grid
        internally with self-masking sentinels).
      disjoint: promise that run r's entries all lie in its OWN slice
        [r*G/runs, (r+1)*G/runs) of the canvas (or are >= num_groups) —
        the per-batch-offset layout of batched splats. The chunk-cell
        matrix then collapses from (supertile x run) to one owner run
        per supertile, so grid size stays n_super + nblocks no matter
        how many runs (essential for batched serving). Silently ignored
        when the slice widths don't align to ``sw``. Violating the
        promise loses entries — callers must guarantee it.
      block/sw/win/sub: tuning — entries per grid step, supertile width
        (<= 131072: 10-bit LANE-aligned window offsets + slow flag pack
        into 16 bits per sub-chunk), fast-window width (multiple of
        128), entries per sub-chunk (divides block).

    Returns (num_groups,) int32: per-group min key, EMPTY (int32 max)
    where a group has no entries.
    """
    n = group_s.shape[0]
    assert block % sub == 0 and win % LANE == 0 and sw % LANE == 0
    assert sw <= 131072 and win <= sw  # 10-bit LANE-aligned window offsets
    assert n % runs == 0, (n, runs)
    rl = n // runs
    pad_r = (-rl) % block
    if pad_r:  # align each run to the block grid with self-masking sentinels
        g2 = jnp.pad(
            group_s.reshape(runs, rl), ((0, 0), (0, pad_r)),
            constant_values=_BIG,
        )
        k2 = jnp.pad(key_s.reshape(runs, rl), ((0, 0), (0, pad_r)))
        group_s, key_s = g2.reshape(-1), k2.reshape(-1)
        rl += pad_r
        n = runs * rl
    nsub_in = block // sub
    nsub_out = sw // LANE
    # Per-run winner mask: within a run only each group's first (=
    # smallest-key) entry keeps its key; losers contribute 0 to the
    # one-hot dots. Cross-run duplicates are resolved by the min
    # accumulator. Winners are biased +1 (undone at the end) so key 0
    # stays distinguishable from "no entry"; keys <= 2^31 - 2 keep every
    # biased byte-plane value <= 255 and the top byte <= 0x7F.
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), group_s[:-1]])
    idx = jnp.arange(n, dtype=jnp.int32)
    first = (group_s != prev) | (idx % rl == 0)
    mkey = jnp.where(first, key_s + 1, 0)

    # Pad the stream with a full sentinel block so padding chunks always
    # have a valid block to point at (it extends the LAST run, which is
    # harmless: sentinels self-mask).
    npad = block
    group_p = jnp.concatenate([group_s, jnp.full((npad,), _BIG, jnp.int32)])
    mkey_p = jnp.concatenate([mkey, jnp.zeros((npad,), jnp.int32)])
    ntot = n + npad
    nblocks = ntot // block
    groups_pad = num_groups + (-num_groups) % sw
    n_super = groups_pad // sw

    # --- chunk list: supertile-major, run-minor ---------------------------
    # For each (supertile s, run r): the run's blocks overlapping s.
    bounds = jnp.arange(n_super + 1, dtype=jnp.int32) * sw
    rblocks = rl // block
    seg = group_p[: runs * rl].reshape(runs, rl)
    offs = jax.vmap(lambda g: jnp.searchsorted(g, bounds))(seg)
    offs = offs.astype(jnp.int32)  # (runs, n_super+1)
    blk0_r = offs[:, :-1] // block  # run-local block index
    blk1_r = jnp.where(
        offs[:, 1:] > offs[:, :-1], (offs[:, 1:] - 1) // block, blk0_r
    )
    counts_rs = jnp.where(
        offs[:, 1:] > offs[:, :-1], blk1_r - blk0_r + 1, 0
    )  # (runs, n_super)
    blk0_g = blk0_r + (
        jnp.arange(runs, dtype=jnp.int32) * rblocks
    )[:, None]  # global block ids
    if disjoint and (
        num_groups % runs != 0 or (num_groups // runs) % sw != 0
    ):
        disjoint = False  # slices don't align to supertiles; use the
        # general cross-product cell layout (still correct, just wider).
    if disjoint and runs > 1:
        # Each supertile belongs to exactly one run's canvas slice:
        # one cell per supertile, grid stays n_super + nblocks.
        spr = (num_groups // runs) // sw
        sidx = jnp.arange(n_super, dtype=jnp.int32)
        own = sidx // spr
        counts = counts_rs[own, sidx]  # (n_super,)
        blk0f = blk0_g[own, sidx]
        cells_per_tile = 1
    else:
        # Flatten supertile-major: cell (s, r).
        counts = counts_rs.T.reshape(-1)  # (n_super*runs,)
        blk0f = blk0_g.T.reshape(-1)
        cells_per_tile = runs
    ncells = n_super * cells_per_tile
    maxchunks = ncells + nblocks  # static bound on sum(counts)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    j = jnp.arange(maxchunks, dtype=jnp.int32)
    cell = jnp.clip(
        jnp.searchsorted(cum, j, side="right").astype(jnp.int32) - 1,
        0,
        ncells - 1,
    )
    tid = cell // cells_per_tile
    blks = jnp.clip(blk0f[cell] + (j - cum[cell]), 0, nblocks - 1)
    # First chunk of each SUPERTILE (across its runs) resets the block.
    row_start = cum[
        jnp.arange(n_super, dtype=jnp.int32) * cells_per_tile
    ]
    fst = (j == row_start[tid]).astype(jnp.int32)

    # Per-(chunk, sub-chunk) fast-window offset + slow flag, 16 bits per
    # sub-chunk (w0 is LANE-aligned: 10 bits; flag: bit 10), two
    # sub-chunks per SMEM int32 — the scalar-prefetch table is the SMEM
    # budget that caps the batched canvas count.
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
    assert nsub_in % 2 == 0, "block must hold an even number of sub-chunks"
    v16 = (w0s // LANE) | (jnp.minimum(exs, 1) << 10)  # (maxchunks, nsub_in)
    wins = (v16[:, 0::2] | (v16[:, 1::2] << 16)).reshape(-1)
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
            # BIG-filled buffer aliased to the output: supertiles with no
            # chunks are never visited and keep this fill (= EMPTY).
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
            _kernel, sw=sw, nsub_in=nsub_in, sub=sub, win=win
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_super, nsub_out, LANE), jnp.int32
        ),
        # index 7 = 5 scalar-prefetch args + gT + kN, then the fill buffer
        input_output_aliases={7: 0},
        interpret=interpret,
    )(tid, blks, fst, sflag, wins, gT, kN, fill)

    canvas = canvas.reshape(-1)[:num_groups]
    # BIG == untouched. Winners bias to key+1 >= 1, so a biased winner
    # only collides with BIG (2^31 - 1) at key == 2^31 - 2 — hence the
    # documented key ceiling of 2^31 - 3. (The zbuffer caller packs
    # positive-float depth bits, max 0x7F7FFFFF, far below it.)
    return jnp.where(
        canvas == _BIG, jnp.int32(EMPTY), canvas - 1
    )


