"""Fused single-pass Pallas TPU kernel for FAST detection.

This is the TPU re-design of the reference's hot path: the AVX2 prefilter +
dual-gather arc test + score + streaming nonmax (fast_simd.rs:301-620) all
become ONE VMEM-resident pass per row-tile.  Differences from the XLA dense
pipeline in `ops.fast` (same semantics, different scheduling):

  * the 16 circle taps never touch HBM — they are lane-rolls / sublane
    slices of the tile already in VMEM, so HBM traffic is exactly
    "read u8 image once, write mask/score once" instead of XLA's
    materialized intermediates,
  * the arc test, scores, and 3x3 nonmax are computed in the same kernel
    invocation while the tile is hot in VMEM.

Tiling scheme: grid over TILE_H-row tiles of the (padded) image.  A
tile's nonmax needs scores of rows +-1 and scores need taps of rows +-3,
so each program views a (TILE_H + 8)-row window: the same input is passed three times with
block index maps (i-1, i, i+1) (edge-clamped; clamped rows only feed
border pixels that are masked off), giving Pallas' pipeline automatic
double-buffering of the halo — no manual DMA.  Columns handle their +-3
halo by lane-rolls inside the full-width tile; wrapped lanes only affect
masked border columns.

Semantics are bit-identical to `ops.fast` (differentially tested); see
that module's docstring for the reference file:line anchors.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import NonmaxMode
from ..geometry import CIRCLE, RADIUS
from ..geometry import NORTH as NORTH_I, EAST as EAST_I, SOUTH as SOUTH_I, \
    WEST as WEST_I
from . import windows

#: Row-tile height of the whole-image entry points.  128 measured
#: fastest for every mode on the dense golden_1080p frame (round 3,
#: tools/exp_r3_variants.py: OFF 0.1200 -> 0.1183, MT 0.1853 -> 0.1829,
#: SA 0.1865 -> 0.1782 ms/frame vs 64-row tiles): fewer per-tile
#: window-build/DMA boundaries outweigh the coarser prefilter
#: tile-skip granularity and the extra height padding.
TILE_H = 128
#: Per-mode MEASURED-SAFE whole-image row-tile candidates (round-4
#: sweeps, tools/exp_r4_tiles.py, every entry bit-exact on hardware).
#: Fewer/larger tiles cut the per-tile machinery (window concat,
#: u8->SWAR packing, per-tile DMA) that round-3 ablation pinned at ~44%
#: of an OFF frame, and padded rows are pure waste, so `tile_h_for`
#: picks the candidate minimizing the PADDED height and breaks ties
#: toward the larger tile.  This rule reproduces every 1080p sweep
#: winner — OFF 224 (0.1134 vs 0.1209 at 128), MT 120 (0.1702 vs
#: 0.1852), SA 216 (0.1568 vs 0.1845) — and stops small frames from
#: over-padding (a fixed 224 padded 480-row VGA by 40%;
#: resolution_bench 480p dropped 36.0k -> 31.9k f/s before this rule).
#: Candidate constraints, all measured:
#:   OFF: the kernel only COMPILES at 32-row multiples (other sizes
#:        consistently fail remote Mosaic compile), and 256+ lost to
#:        224 at 1080p.
#:   MT:  any sublane multiple compiles for EVEN counts.  >= ~180 rows
#:        was wholly VMEM-unsafe until round 5's row-chunked pyramid
#:        evaluation (MT_PYRAMID_CHUNK) bounded liveness by the chunk:
#:        216 then measured 0.1683-0.1705 vs 0.1750 ms at 120 in one
#:        process (tools/exp_r5_mt_chunk.py; 360 worse at 0.189,
#:        single-tile 1080 worse still).  ODD counts stay capped at 160
#:        (_TILE_H_MT_ODD below).
#:   SA:  no MT pyramids — 216 fits comfortably and beat every smaller
#:        size; 360 was slightly worse.
TILE_H_CANDIDATES: dict = {
    NonmaxMode.OFF: (96, 128, 160, 192, 224),
    NonmaxMode.MAX_THRESHOLD: (72, 96, 120, 160, 216),
    NonmaxMode.SUM_ABSOLUTE: (72, 96, 120, 128, 160, 216),
}
#: MaxThreshold with an ODD count cannot use the 216-row tile: odd
#: window lengths fold the level-1 diff planes, whose extended liveness
#: (on top of the interleaved eh/el chains Mosaic schedules together)
#: hard-OOMs the ~100 MB scoped-VMEM cap at 216 rows for EVERY chunk
#: size tried (128/80), while even counts compile and run bit-exact.
#: Forcing chain sequencing via a value-level dependency made every
#: config compile but cost ~33% (0.175 -> 0.234 ms at 120/none — the
#: chains' instruction-level parallelism is real), so odd counts keep
#: the 120-row zero-padding tile instead (round-5 ledger,
#: docs/PERFORMANCE.md).
_TILE_H_MT_ODD = (72, 96, 120, 160)
#: Experiments (tools/exp_r4_tiles.py) force one size for every mode.
TILE_H_OVERRIDE = None


def tile_h_for(mode, h: int, count: int = 10) -> int:
    """Whole-image row-tile height for (nonmax mode, image height,
    arc count) — trace-time.  Minimum padded height wins; ties go to the
    larger tile (fewer per-tile boundaries).  ``count`` matters only for
    MaxThreshold: odd counts are VMEM-capped at 160 rows (see
    _TILE_H_MT_ODD)."""
    if TILE_H_OVERRIDE is not None:
        return int(TILE_H_OVERRIDE)
    mode = NonmaxMode(mode)
    if mode is NonmaxMode.MAX_THRESHOLD and int(count) % 2 == 1:
        cands = _TILE_H_MT_ODD
    else:
        cands = TILE_H_CANDIDATES.get(mode)
    if not cands:
        return TILE_H
    return min(cands, key=lambda t: (_pad_to(int(h), t), -t))


#: Row-tile height of the SHARDED entry points (detect_dense_tiles /
#: detect_words_tiles).  Stays at 64: it is also the spatial-sharding
#: granularity (parallel/spatial.py pads to n_devices * TILE_H_SHARD
#: rows and exchanges one-tile halo slabs), where 128 would double the
#: padding waste at 1080p on 8 shards; semantics are tile-size
#: independent (bit-exactness across tile sizes is pinned by
#: tools/exp_r3_variants.py on hardware and tests/test_pallas.py on CPU).
TILE_H_SHARD = 64
LANES = 128
# Mosaic scoped-VMEM budget per kernel program.  The default (16 MB) is a
# compiler heuristic, not the hardware bound — v5e has 128 MB of physical
# VMEM per core, and this kernel's pipeline buffers (3 double-buffered u8
# input blocks + packed outputs) use only a few MB of it.  MaxThreshold's
# score-window pyramids sat within ~1 MB of the 16 MB default at 64-row
# tiles (compiles were flaky: identical programs landed at 15.9-16.7 MB
# across runs), so the budget is raised explicitly instead of shrinking
# the tile to 32 rows (~11% slower for MT).
_VMEM_LIMIT = 96 * 1024 * 1024
# Window rows around a tile: nonmax halo (1) + circle radius (3).
_HALO = RADIUS + 1  # 4
# Tile-height history: 64 rows won on the round-1 SPARSE bench frame
# (finer prefilter-skip granularity beat per-tile overhead, 128 was ~4%
# slower there); on the round-2+ dense golden_1080p frame where the
# skip almost never fires, 128 wins for every mode (see TILE_H above)
# and 96 sits between both paddings' costs (0.1210 — a measured dead
# end).  VMEM notes: the arc test is a single packed-bit plane
# (_packed_any_window_all), not a 16-plane boolean pyramid, and taps
# are consumed streaming in _tile_keypoints (keeping the 16 tap planes
# live alongside MaxThreshold's 16 diff planes used to OOM even 32-row
# MT tiles for several counts).  All choices verified bit-exact on v5e
# for every mode and count in 9..=16 (tools/tpu_acceptance.py).
# Outputs are uint16 because the 8-bit min-tile is (32, 128).


def _i32c(v: int) -> int:
    """Python int -> int32 bit pattern (wrapping), for mask constants."""
    import numpy as np

    return int(np.int32(np.uint32(v & 0xFFFFFFFF)))


def _rot_fields(x: jax.Array, a: int) -> jax.Array:
    """Rotate each 16-bit field of an i32 plane right by ``a``: output bit
    s of a field = input bit (s + a) mod 16 of the same field.  Masks keep
    the two fields (bright ring in bits 0-15, dark ring in bits 16-31)
    independent; arithmetic-shift sign fill lands in masked-off bits."""
    lo = _i32c((0xFFFF >> a) * 0x00010001)
    hi = _i32c(((0xFFFF << (16 - a)) & 0xFFFF) * 0x00010001)
    return ((x >> a) & lo) | ((x << (16 - a)) & hi)


def _packed_any_window_all(m: jax.Array, count: int) -> jax.Array:
    """Wraparound n-consecutive test on packed polarity rings.

    ``m`` holds per pixel the 16 bright-arc bits (bits 0-15) and the 16
    dark-arc bits (16-31).  This is the TPU re-design of the reference's
    16-rotation consecutive-mask scan (fast_simd.rs:244-295): run-length
    doubling with field-local rotations — bit s of runs[L] is set iff ring
    bits s..s+L-1 are all set — then a greedy power-of-two composition for
    ``count``.  ~20 plane ops replace the 16-plane boolean chain, and the
    intermediates are ONE plane, not a 16-plane pyramid (VMEM).
    Result is nonzero iff some window of ``count`` consecutive circle taps
    is all-bright or all-dark."""
    runs = {1: m}
    for level in (2, 4, 8):
        prev = runs[level // 2]
        runs[level] = prev & _rot_fields(prev, level // 2)
    parts = [8, 8] if count == 16 else [p for p in (8, 4, 2, 1) if count & p]
    acc = None
    off = 0
    for p in parts:
        term = runs[p] if off == 0 else _rot_fields(runs[p], off)
        acc = term if acc is None else acc & term
        off += p
    return acc


#: Per-field broadcast factor: v * _FF puts ``v`` in both 16-bit fields.
_FF = 0x00010001

#: Element dtype of the MaxThreshold score pyramids (read at trace time).
#: f32 measured ~9% faster than i32 on v5e with identical (exact) results;
#: see the dtype note in _tile_keypoints.
_MT_PYRAMID_DTYPE = jnp.float32

#: Element dtype of the MaxThreshold halo window (and therefore of the
#: prefilter compares and the 16 diff subtracts).  Building the window in
#: f32 directly removes the 16 per-diff i32->f32 casts the pyramid dtype
#: otherwise costs.  Pixels (<= 255), thresholds (<= 255), and diffs
#: (in [-255, 255]) are all exactly representable in f32, and every
#: operation on them (compare, subtract, min/max, abs) is exact, so this
#: is a pure throughput knob — bit-exactness unchanged
#: (tools/tpu_acceptance.py).
_MT_WINDOW_DTYPE = jnp.float32

#: Max computed-row span per MaxThreshold pyramid sub-block (None =
#: whole tile in one block).  The dual min/max pyramids keep ~64 planes
#: live, so VMEM scales with this chunk instead of the tile height —
#: what unlocks the >=180-row MT tiles that hard-OOMed in round 4 (the
#: ring reductions are per-pixel; chunking is exact with zero
#: recomputation — see _tile_keypoints).  Chunks are balanced and
#: rounded to the 8-row sublane.  80 keeps 216-row tiles compiling for
#: ODD counts too: odd window lengths fold the level-1 planes (the 16
#: diffs stay live through both chains), and chunk 128 at 216 rows
#: still hard-OOMed counts 9/11/13/15 on hardware while even counts
#: passed (round-5 acceptance run); 80 costs ~1% vs 128 on the c=9
#: sweep (0.1705 vs 0.1683 ms) and keeps >= 30 MB of headroom for the
#: worst-case odd-count liveness.  Sub-chunk-size tiles (<= 80 rows)
#: run in one block, unchanged.
MT_PYRAMID_CHUNK = 80


def _mt_chunks(rows: int, limit) -> list:
    """Balanced (start, rows) row sub-blocks of ``rows``, each <= limit,
    sized in 8-row sublane multiples (the last takes the remainder)."""
    if not limit or rows <= int(limit):
        return [(0, rows)]
    n = -(-rows // int(limit))
    per = -(-rows // n)  # ceil: balanced chunk target
    base = -(-per // 8) * 8  # rounded up to the 8-row sublane
    out = []
    c0 = 0
    while c0 < rows:
        cr = min(base, rows - c0)
        out.append((c0, cr))
        c0 += cr
    return out


#: Roll only the row span each distinct column shift actually feeds
#: (see _RolledWindow) instead of the full halo window.  Measured on v5e
#: (tools/exp_r3_variants.py, golden_1080p): OFF 0.1223 -> 0.1186
#: ms/frame; flag kept for A/B tooling.
_SLICED_ROLLS = True

#: Separable 3x3 neighbor max in _nonmax_select (4 rolls + 4 maxes
#: instead of 8 + 8); exact — max is associative and commutative.
#: Measured on v5e: MT 0.2325 -> 0.1857 ms/frame, SA 0.2050 -> 0.1890
#: (tools/exp_r3_variants.py); flag kept for A/B tooling.
_SEP_NONMAX = True

#: dy span of the circle taps per |dx| (cardinals included): the row
#: range a column-rolled window must cover, for _SLICED_ROLLS.
_DX_DY_SPAN = {1: (-3, 3), 2: (-2, 2), 3: (-1, 1)}


def _bit9_to_k(v: jax.Array, k: int) -> jax.Array:
    """Move bit 9 of each 16-bit field of ``v`` to bit ``k`` of that field,
    zeroing everything else (the SWAR predicate-bit placer)."""
    m = _i32c(_FF << k)
    if k < 9:
        return (v >> (9 - k)) & m
    if k == 9:
        return v & m
    return (v << (k - 9)) & m


def _roll_cols(plane: jax.Array, dx: int) -> jax.Array:
    """Circular column shift: out[r, c] = plane[r, c + dx].  pltpu.roll only
    accepts non-negative shifts, so negative moves wrap around the width."""
    if not dx:
        return plane
    wp = plane.shape[1]
    return pltpu.roll(plane, (-dx) % wp, axis=1)


class _RolledWindow:
    """Circle-tap factory: tap(dx, dy) is window[(row0+dy):(row0+dy+rows)]
    with columns rolled so out[r, c] = window[row0+dy+r, c+dx] (mod lane
    wrap), sharing lane-rolls across taps.

    The 16 circle taps use only 6 distinct nonzero column shifts
    (dx in +-1, +-2, +-3, each 2-3 times); rolling the full window once
    per distinct dx and handing out row slices does ~2.4x less lane-roll
    work than rolling per tap (lane rolls are cross-lane permutes — the
    most expensive VPU ops in this kernel).  Rolls are created lazily, so
    a prefilter-skipped tile pays only for the +-3 rolls the cardinal
    check needs; roll-then-slice equals slice-then-roll (the roll axis is
    independent of rows), keeping semantics identical.

    With ``sliced`` (the _SLICED_ROLLS default for the SWAR pixel-pair
    windows), each dx's roll runs on just the row span its taps can
    touch (_DX_DY_SPAN) — the permute is the expensive part, so rolling
    fewer rows is a direct saving; slice-then-roll still equals
    roll-then-slice.  The MaxThreshold window passes sliced=False: its
    tap spans cover nearly the whole window, so slicing saves almost no
    permute rows but introduces misaligned sublane slices (measured +6%:
    0.1853 -> 0.1964 ms/frame, tools/exp_r3_variants.py)."""

    def __init__(self, window: jax.Array, sliced: bool = False):
        self._window = window
        self._rolled = {(0, 0, window.shape[0]): (0, window)}
        self._sliced = bool(sliced)

    def tap(self, dx: int, dy: int, rows: int, row0: int) -> jax.Array:
        # Cache key includes the slice bounds: in sliced mode the bounds
        # bake in (row0, rows), so a later tap for the same dx with a
        # different row span gets its own roll instead of tripping the
        # assert below (ADVICE r3 — today every mode uses one consistent
        # span, so no duplicate rolls are actually created).
        lo, hi = 0, self._window.shape[0]
        if self._sliced and abs(dx) in _DX_DY_SPAN:
            dmin, dmax = _DX_DY_SPAN[abs(dx)]
            lo = max(row0 + dmin, 0)
            hi = min(row0 + dmax + rows, self._window.shape[0])
        key = (dx, lo, hi)
        if key not in self._rolled:
            src = self._window
            if (lo, hi) != (0, self._window.shape[0]):
                src = jax.lax.slice_in_dim(src, lo, hi, axis=0)
            self._rolled[key] = (lo, _roll_cols(src, dx))
        lo, plane = self._rolled[key]
        start = row0 + dy - lo
        assert 0 <= start and start + rows <= plane.shape[0], (dx, dy)
        return jax.lax.slice_in_dim(plane, start, start + rows, axis=0)


def _swar_window_prefilter(img_prev, img_cur, img_next, *, threshold: int,
                           count: int, tile_h: int, halo_rows: int = 0):
    """SWAR pixel-pair tile preamble (OFF and SUM_ABSOLUTE modes).

    These modes' tap loops are u8 compares + bit packing (+ bounded sums
    for SA) — and those process TWO pixels per i32 lane by packing
    computed row r and row r + half into the low/high 16-bit fields of
    one plane (the TPU analogue of widening the reference's 16-lane AVX2
    loop, fast_simd.rs:368-379, to 32 lanes).  The strict compares become
    field-local bit-9 tests:

        p > c + t  <=>  p + (511 - c - t) >= 512      (bright)
        p < c - t  <=>  (c + 511 - t) - p >= 512      (dark)

    Every field value stays in [0, 1023] (p, c <= 255; 1 <= 511-c-t and
    256-t <= c+511-t-p, since t <= 255), so no carry/borrow ever crosses
    the 16-bit field boundary and bit 9 alone decides each predicate —
    exactly the reference's saturating-bound compares (fast_simd.rs:
    406-433) at two pixels per op.  The n-consecutive chain
    (_packed_any_window_all) is already field-local, so it runs unchanged
    on the paired planes.

    ``halo_rows``: extra computed rows above/below the tile (1 for SA's
    nonmax halo, 0 for OFF); computed rows span
    [-halo_rows, tile_h + halo_rows), paired as r (low field) and
    r + half (high field) with half = tile_h/2 + halo_rows.

    Returns (rw, cpw, hb, cw, tile_has_candidates): ``rw`` taps the packed
    window (rows=half, row0=RADIUS), ``cpw`` is the packed center plane,
    ``hb``/``cw`` the precomputed per-pixel bias planes."""
    t = int(threshold)
    half = tile_h // 2 + int(halo_rows)
    # W[i] = image row (tile_start - HALO + i); u8.  Computed row r sits
    # at W[HALO - halo_rows + r]; the packed window pairs W[base + j] with
    # W[base + half + j], base = HALO - halo_rows - RADIUS, covering every
    # tap row of both fields.
    w8 = jnp.concatenate(
        [img_prev[tile_h - _HALO :, :], img_cur[:, :],
         img_next[: _HALO + 4, :]],
        axis=0,
    )
    base = _HALO - int(halo_rows) - RADIUS
    n = half + 2 * RADIUS + 2  # packed rows (slack to an even 8-multiple)
    lo = jax.lax.slice_in_dim(w8, base, base + n, axis=0)
    hi = jax.lax.slice_in_dim(w8, base + half, base + half + n, axis=0)
    pw = lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)
    rw = _RolledWindow(pw, sliced=_SLICED_ROLLS)
    cpw = jax.lax.slice_in_dim(pw, RADIUS, RADIUS + half, axis=0)
    hb = (511 - t) * _FF - cpw  # 511 - c - t per field
    cw = cpw + (511 - t) * _FF  # c + 511 - t per field

    # Cardinal prefilter (reference 2.3, fast_simd.rs:368-556) in SWAR:
    # count the bit-9 predicate hits of the 4 cardinal taps per field
    # (sums <= 2048, field-local), then test >= need via one biased add —
    # nb + ta has bit 11 set iff nb >= need * 512.
    need = 3 if count >= 12 else 2
    m9 = _i32c(0x200 * _FF)
    nb = nd = None
    for c in (NORTH_I, EAST_I, SOUTH_I, WEST_I):
        p = rw.tap(*CIRCLE[c], rows=half, row0=RADIUS)
        b = (p + hb) & m9
        d = (cw - p) & m9
        nb = b if nb is None else nb + b
        nd = d if nd is None else nd + d
    ta = (4 - need) * 512 * _FF
    bit11 = _i32c(0x800 * _FF)
    tile_has_candidates = jnp.any((((nb + ta) | (nd + ta)) & bit11) != 0)
    return rw, cpw, hb, cw, tile_has_candidates


def _tile_keypoints_off_swar(rw, hb, cw, *, i, count: int,
                             height: int, width: int, tile_h: int):
    """OFF-mode arc test on SWAR pixel-pair planes (see
    _swar_window_prefilter).  Returns keep bool (tile_h, wp)."""
    half = tile_h // 2
    wp = hb.shape[1]
    bright = dark = None
    for k, (dx, dy) in enumerate(CIRCLE):
        p = rw.tap(dx, dy, rows=half, row0=RADIUS)
        b = _bit9_to_k(p + hb, k)
        d = _bit9_to_k(cw - p, k)
        bright = b if bright is None else bright | b
        dark = d if dark is None else dark | d
    # Each plane holds one polarity's 16 ring bits for BOTH paired pixels;
    # the run-doubling window test is field-local, so it applies as-is.
    a = (
        _packed_any_window_all(bright, count)
        | _packed_any_window_all(dark, count)
    )
    hit_lo = (a & 0xFFFF) != 0
    hit_hi = (a & _i32c(0xFFFF0000)) != 0
    arc_hit = jnp.concatenate([hit_lo, hit_hi], axis=0)  # (tile_h, wp)

    gy = i * tile_h + jax.lax.broadcasted_iota(jnp.int32, (tile_h, wp), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wp), 1)
    interior = (
        (gy >= RADIUS) & (gy < height - RADIUS)
        & (gx >= RADIUS) & (gx < width - RADIUS)
    )
    return arc_hit & interior


def _tile_keypoints_sa_swar(rw, hb, cw, *, i, count: int,
                            height: int, width: int, tile_h: int):
    """SUM_ABSOLUTE arc test + score on SWAR pixel-pair planes.

    The SAD score (reference 2.6b, fast_simd.rs:720-749) is a bounded
    masked accumulation — sums of (|d| - t) over at most 16 taps stay
    below 4096 — so it rides the same 16-bit fields as the arc bits: the
    predicate bit expands to a whole-field mask (one multiply by 0xFFFF),
    and the masked value (q - 511 = |d| - t, >= 1 when set) accumulates
    borrow-free.  Scores and arc hits unpack to full-height planes only
    for the 3x3 nonmax.  Returns (keep, score) (tile_h, wp) as
    _tile_keypoints does."""
    half = tile_h // 2 + 1
    wp = hb.shape[1]
    m9 = _i32c(0x200 * _FF)
    c511 = _i32c(511 * _FF)
    bright = dark = None
    sum_light = sum_dark = None
    for k, (dx, dy) in enumerate(CIRCLE):
        p = rw.tap(dx, dy, rows=half, row0=RADIUS)
        q = p + hb   # bit 9: p > c + t; q - 511 = p - c - t
        r = cw - p   # bit 9: p < c - t; r - 511 = c - p - t
        b = _bit9_to_k(q, k)
        d = _bit9_to_k(r, k)
        bright = b if bright is None else bright | b
        dark = d if dark is None else dark | d
        fb = ((q & m9) >> 9) * 0xFFFF  # full-field mask of the bright bit
        fd = ((r & m9) >> 9) * 0xFFFF
        sd = (q & fb) - (c511 & fb)  # p - c - t where p > c + t, else 0
        sl = (r & fd) - (c511 & fd)  # c - p - t where p < c - t, else 0
        sum_light = sl if sum_light is None else sum_light + sl
        sum_dark = sd if sum_dark is None else sum_dark + sd
    a = (
        _packed_any_window_all(bright, count)
        | _packed_any_window_all(dark, count)
    )

    def unpack_fields(v):
        return jnp.concatenate([v & 0xFFFF, (v >> 16) & 0xFFFF], axis=0)

    rows = tile_h + 2
    arc_hit = unpack_fields(a) != 0
    score = jnp.maximum(unpack_fields(sum_light), unpack_fields(sum_dark))

    gy = (i * tile_h - 1) + jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
    interior = (
        (gy >= RADIUS) & (gy < height - RADIUS)
        & (gx >= RADIUS) & (gx < width - RADIUS)
    )
    kp = arc_hit & interior
    return _nonmax_select(kp, score, gy, rows=rows, tile_h=tile_h,
                          height=height)


def _nonmax_select(kp, score, gy, *, rows: int, tile_h: int, height: int):
    """3x3 strict-max nonmax with the reference border quirks; computed on
    the full (rows, wp) plane with sublane/lane rolls (roll wraparound
    only touches the halo rows, which the final central slice discards).
    Returns (keep, score) sliced to the tile's central tile_h rows."""
    wp = kp.shape[1]
    s = jnp.where(kp, score, 0)
    if _SEP_NONMAX:
        # Separable 8-neighbor max: Hc = max of the two horizontal
        # neighbors, H3 = horizontal 3-max; the rows above/below
        # contribute their H3 and the center row its Hc — 4 rolls +
        # 4 maxes instead of 8 + 8.  Max is associative/commutative on
        # exact values, so the result is identical element-wise.
        hc = jnp.maximum(_roll_cols(s, -1), _roll_cols(s, 1))
        h3 = jnp.maximum(hc, s)
        above = pltpu.roll(h3, 1, axis=0)
        below = pltpu.roll(h3, rows - 1, axis=0)
        neigh = jnp.maximum(jnp.maximum(above, below), hc)
    else:
        neigh = jnp.full((rows, wp), -1, jnp.int32).astype(s.dtype)
        for dy in (-1, 0, 1):
            base = s if dy == 0 else pltpu.roll(s, (-dy) % rows, axis=0)
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                neigh = jnp.maximum(neigh, _roll_cols(base, dx))
    keep = kp & (s > neigh) & (gy != RADIUS) & (gy != height - RADIUS - 1)
    return (
        jax.lax.slice_in_dim(keep, 1, 1 + tile_h, axis=0),
        jax.lax.slice_in_dim(s, 1, 1 + tile_h, axis=0),
    )


def _window_prefilter(img_prev, img_cur, img_next, *, threshold: int,
                      count: int, tile_h: int):
    """MAX_THRESHOLD tile preamble (OFF/SUM_ABSOLUTE route through
    _swar_window_prefilter): build the halo window and run the cardinal
    prefilter.  Returns (rw, rows, row0, center, tile_has_candidates),
    where ``rw`` is the roll-sharing tap factory (_RolledWindow)."""
    # (tile_h + 8)-row window around this tile, in _MT_WINDOW_DTYPE (f32:
    # u8 pixels are exact, and widening once here removes the 16 per-diff
    # casts the pyramid dtype otherwise needs in _tile_keypoints).
    window = jnp.concatenate(
        [
            img_prev[tile_h - _HALO :, :],
            img_cur[:, :],
            img_next[:_HALO, :],
        ],
        axis=0,
    ).astype(jnp.int32)  # Mosaic has no direct u8->f32 vector cast
    if _MT_WINDOW_DTYPE is not jnp.int32:
        window = window.astype(_MT_WINDOW_DTYPE)

    # Rows for which we compute candidacy/scores: tile rows +-1 (nonmax
    # halo).
    rows = tile_h + 2
    row0 = _HALO - 1
    t = int(threshold)

    center = jax.lax.slice_in_dim(window, row0, row0 + rows, axis=0)

    # Cardinal-direction prefilter (reference component 2.3,
    # fast_simd.rs:368-556): any arc of count >= 9 must contain >= 2 of
    # the 4 cardinal taps (>= 3 for count >= 12), all of one polarity.
    # Per-lane early-out is impossible on a VPU, but a TILE whose
    # prefilter is empty everywhere skips the full arc/score/nonmax body.
    need = 3 if count >= 12 else 2
    rw = _RolledWindow(window)
    card = [
        rw.tap(*CIRCLE[c], rows=rows, row0=row0)
        for c in (NORTH_I, EAST_I, SOUTH_I, WEST_I)
    ]
    hi = center + t
    lo = center - t
    nb = sum((p > hi).astype(jnp.int32) for p in card)
    nd = sum((p < lo).astype(jnp.int32) for p in card)
    tile_has_candidates = jnp.any((nb >= need) | (nd >= need))
    return rw, rows, row0, center, tile_has_candidates


def _tile_keep(img_prev, img_cur, img_next, *, mode: NonmaxMode,
               threshold: int, count: int, height: int, width: int,
               tile_h: int, i0=0):
    """Shared kernel body: prefilter + (on candidates) arc/score/nonmax.
    Returns (wp, tile_has_candidates, body) where body() -> (keep, score)
    for the tile's central rows.  OFF and SUM_ABSOLUTE route through the
    SWAR pixel-pair paths (two pixels per i32 lane); MAX_THRESHOLD
    through the windowed-score path.

    ``i0`` is the GLOBAL tile index of local tile 0 (0 for whole-image
    grids; shard_offset for spatially row-sharded invocations — see
    detect_dense_tiles).  Every border quirk (interior mask, y==3 /
    y==H-4 nonmax drops) is computed from the global row i*tile_h, so a
    row-shard produces bit-identical outputs to its slice of the
    whole-image kernel."""
    i = pl.program_id(0) + i0
    if mode is not NonmaxMode.MAX_THRESHOLD:
        halo_rows = 0 if mode is NonmaxMode.OFF else 1
        rw, cpw, hb, cw, tile_has_candidates = _swar_window_prefilter(
            img_prev, img_cur, img_next, threshold=int(threshold),
            count=count, tile_h=tile_h, halo_rows=halo_rows,
        )
        wp = cpw.shape[1]

        def body():
            if mode is NonmaxMode.OFF:
                keep = _tile_keypoints_off_swar(
                    rw, hb, cw, i=i, count=count,
                    height=height, width=width, tile_h=tile_h,
                )
                return keep, None
            return _tile_keypoints_sa_swar(
                rw, hb, cw, i=i, count=count,
                height=height, width=width, tile_h=tile_h,
            )

        return wp, tile_has_candidates, body

    rw, rows, row0, center, tile_has_candidates = _window_prefilter(
        img_prev, img_cur, img_next, threshold=int(threshold),
        count=count, tile_h=tile_h,
    )
    wp = center.shape[1]

    def body():
        return _tile_keypoints(
            rw, center, i=i, rows=rows, row0=row0,
            t=int(threshold), count=count, height=height, width=width,
            tile_h=tile_h,
        )

    return wp, tile_has_candidates, body


def _kernel(img_prev, img_cur, img_next, mask_out, score_out=None, *, mode: NonmaxMode,
            threshold: int, count: int, height: int, width: int, tile_h: int,
            i0=0):
    wp, tile_has_candidates, tile_body = _tile_keep(
        img_prev, img_cur, img_next, mode=mode, threshold=int(threshold),
        count=count, height=height, width=width, tile_h=tile_h, i0=i0,
    )

    @pl.when(jnp.logical_not(tile_has_candidates))
    def _():
        mask_out[:, :] = jnp.zeros((tile_h, wp), jnp.uint16)
        if mode is not NonmaxMode.OFF:
            score_out[:, :] = jnp.zeros((tile_h, wp), jnp.uint16)

    @pl.when(tile_has_candidates)
    def _():
        keep, s = tile_body()
        mask_out[:, :] = keep.astype(jnp.uint16)
        if mode is not NonmaxMode.OFF:
            if jnp.issubdtype(s.dtype, jnp.floating):
                # Mosaic has no direct f32->u16 vector cast; the values
                # are exact integers in [0, 4080], so an i32 hop is exact.
                s = s.astype(jnp.int32)
            score_out[:, :] = s.astype(jnp.uint16)


def _kernel_tiles(i0_ref, img_prev, img_cur, img_next, mask_out,
                  score_out=None, *, mode: NonmaxMode, threshold: int,
                  count: int, height: int, width: int, tile_h: int):
    """Row-shard kernel: like _kernel but the global tile index of local
    tile 0 arrives as an SMEM scalar (it is per-shard DATA, so one XLA
    program serves every shard of a shard_map)."""
    _kernel(img_prev, img_cur, img_next, mask_out, score_out, mode=mode,
            threshold=threshold, count=count, height=height, width=width,
            tile_h=tile_h, i0=i0_ref[0, 0])


def _tile_keypoints(rw, center, *, i, rows, row0,
                    t: int, count: int, height: int,
                    width: int, tile_h: int):
    """Arc test + score + nonmax for one MAX_THRESHOLD tile (OFF and
    SUM_ABSOLUTE route through the SWAR pixel-pair paths).  Returns the
    tile's central rows: (keep (tile_h, wp) bool, score (tile_h, wp)
    i32).  ``rw`` is the prefilter's _RolledWindow (its +-3 lane-rolls
    are reused here).

    MAX_THRESHOLD skips the packed arc test ENTIRELY: its score pyramids
    already decide candidacy exactly.  A dark arc of `count` consecutive
    taps (p < c-t, i.e. d > t strictly) exists iff some window's min diff
    exceeds t — i.e. eh = max-of-window-mins > t; a bright arc (d < -t)
    exists iff some window's max diff is below -t — el =
    min-of-window-maxes < -t.  So arc_hit == (eh > t) | (el < -t),
    bit-identical to _packed_any_window_all (differential tests +
    tools/tpu_acceptance.py), and the MT tap loop degenerates to 16 bare
    subtracts — no compares, no bit packing, no run-doubling chain.  Taps
    are consumed streaming (one at a time), never kept as a 16-plane list
    alongside the diff planes (VMEM).  MT stays at full-width lanes: its
    window min/max pyramids (and every mode's nonmax) need per-field
    min/max, which 16-bit-field SWAR cannot express."""
    wp = center.shape[1]

    # Pyramid dtype: FLOAT min/max measured ~9% faster end-to-end than
    # i32 (int min/max lowers to compare+select on v5e; i16 doesn't
    # compile; bf16 runs at f32 rate, no 2x packing — PERFORMANCE.md dead
    # ends).  Diffs are integers in [-255, 255], exactly representable in
    # f32 (and bf16), and min/max of exact values is exact, so the dtype
    # is a pure throughput knob — bit-exactness is unchanged
    # (tools/tpu_acceptance.py).  Running the pyramids on raw taps via
    # min_W(c-p) = c - max_W(p) to skip the subtracts measured ~22%
    # SLOWER (the fresh diff planes fuse/lay out better than long-lived
    # window slices); also a recorded dead end.
    #
    # Row-CHUNKED evaluation (round 5, VERDICT r4 #3): the dual pyramids'
    # peak liveness is ~64 planes (16 diffs + 48 doubling/fold levels),
    # which at 216-row tiles needs ~118 MB scoped VMEM — past the ~100 MB
    # cap that blocked MT's measured-faster 216-row tile.  The ring
    # reductions are PURELY per-pixel (no spatial extent once the taps
    # are rolled), so evaluating eh/el over row sub-blocks is exact with
    # ZERO recomputation: each chunk slices the shared rolled tap planes
    # (rw.tap with a sub-row range) and its level planes die before the
    # next chunk.  Liveness scales with the chunk, not the tile.
    eh_parts, el_parts = [], []
    for c0, cr in _mt_chunks(rows, MT_PYRAMID_CHUNK):
        cen = center if cr == rows else jax.lax.slice_in_dim(
            center, c0, c0 + cr, axis=0)
        diffs = []
        for dx, dy in CIRCLE:
            d = cen - rw.tap(dx, dy, cr, row0 + c0)
            if d.dtype != _MT_PYRAMID_DTYPE:
                d = d.astype(_MT_PYRAMID_DTYPE)
            diffs.append(d)
        eh_parts.append(windows.ring_max_of_window_min(
            diffs, count, jnp.minimum, jnp.maximum))
        el_parts.append(windows.ring_min_of_window_max(
            diffs, count, jnp.minimum, jnp.maximum))
    eh = (eh_parts[0] if len(eh_parts) == 1
          else jnp.concatenate(eh_parts, axis=0))
    el = (el_parts[0] if len(el_parts) == 1
          else jnp.concatenate(el_parts, axis=0))
    # Compares and score stay in the pyramid dtype (exact on integer
    # values in [-255, 255]); the score plane is cast to u16 only at the
    # kernel's output write.
    arc_hit = (eh > t) | (el < -t)

    # Interior mask: global x in [3, W-4], y in [3, H-4].
    off = row0 - _HALO  # tile row of the first computed row (-1)
    gy = (i * tile_h + off) + jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (rows, wp), 1)
    interior = (
        (gy >= RADIUS) & (gy < height - RADIUS)
        & (gx >= RADIUS) & (gx < width - RADIUS)
    )
    kp = arc_hit & interior
    score = jnp.minimum(jnp.abs(eh), jnp.abs(el))
    return _nonmax_select(kp, score, gy, rows=rows, tile_h=tile_h,
                          height=height)


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _check_threshold(threshold) -> int:
    """The public contract is the reference's u8 threshold (lib.rs:41);
    the SWAR field encodings (see _swar_window_prefilter) are exact only
    on that range, so reject anything else loudly rather than wrap."""
    t = int(threshold)
    if not 0 <= t <= 255:
        raise ValueError(f"threshold must be in 0..=255 (u8), got {t}")
    return t


def padded_width(w: int) -> int:
    """Lane-padded width the padded-output entry point uses."""
    return _pad_to(int(w), LANES)


def padded_height(h: int) -> int:
    """Tile-padded height the padded-output entry points use."""
    return _pad_to(int(h), TILE_H)


def detect_dense_padded(
    image: jax.Array, threshold: int, count: int, nonmax: NonmaxMode,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused Pallas detection WITHOUT output cropping: returns
    (mask u16 (Hp, Wp), score u16 (Hp, Wp)) on the tile-padded grid —
    padding cells are guaranteed zero (interior-masked in-kernel), so
    consumers (compaction, reductions) can run directly on the padded
    layout and skip two full-image crop/cast passes.  Coordinates encode
    as flat indices over ``padded_width(w)``."""
    nonmax = NonmaxMode(nonmax)
    threshold = _check_threshold(threshold)
    h, w = image.shape
    tile_h = tile_h_for(nonmax, h, count)
    hp, wp = _pad_to(h, tile_h), _pad_to(w, LANES)
    img = jnp.pad(image, ((0, hp - h), (0, wp - w)))
    n_tiles = hp // tile_h

    kernel = functools.partial(
        _kernel,
        mode=nonmax,
        threshold=int(threshold),
        count=int(count),
        height=h,
        width=w,
        tile_h=tile_h,
    )
    clamp = lambda v: jnp.clip(v, 0, n_tiles - 1)
    n_outs = 1 if nonmax is NonmaxMode.OFF else 2
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_h, wp), lambda i: (clamp(i - 1), 0)),
            pl.BlockSpec((tile_h, wp), lambda i: (i, 0)),
            pl.BlockSpec((tile_h, wp), lambda i: (clamp(i + 1), 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, wp), lambda i: (i, 0))
            for _ in range(n_outs)
        ],
        out_shape=(
            [jax.ShapeDtypeStruct((hp, wp), jnp.uint16)]
            + [jax.ShapeDtypeStruct((hp, wp), jnp.uint16)] * (n_outs - 1)
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=bool(interpret),
    )(img, img, img)

    if nonmax is NonmaxMode.OFF:
        return outs[0], jnp.zeros((hp, wp), jnp.uint16)
    return outs[0], outs[1]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def detect_dense_pallas(
    image: jax.Array, threshold: int, count: int, nonmax: NonmaxMode,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused Pallas detection: returns (mask bool (H, W), score u16 (H, W)),
    bit-identical to `ops.fast.detect_dense`."""
    h, w = image.shape
    mask, score = detect_dense_padded(image, threshold, count, nonmax,
                                      interpret)
    return mask[:h, :w].astype(bool), score[:h, :w]


def detect_dense_tiles(
    ext_img: jax.Array, tile0: jax.Array, threshold: int, count: int,
    nonmax: NonmaxMode, *, height: int, width: int, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused detection over one ROW SHARD of a spatially-sharded image
    (parallel/spatial.py).

    ``ext_img``: (rows_local + 2*TILE_H_SHARD, wp) u8 — the shard's rows
    bracketed by its neighbors' adjacent TILE_H_SHARD-row halo tiles (exchanged
    with ppermute).  ``tile0``: traced global tile index of the shard's
    first local tile.  ``height``/``width``: the GLOBAL unpadded image
    size — all border quirks are evaluated in global coordinates, so each
    shard's output block is bit-identical to the corresponding slice of
    `detect_dense_padded` of the whole image.  At the global top/bottom
    the wrapped halo tile holds arbitrary pixels; every output they can
    influence is non-interior (gy < 3 or gy >= height-3) and therefore
    masked, exactly like the clamped duplicate blocks of the unsharded
    grid.  Returns (mask u16, score u16) of shape (rows_local, wp)."""
    nonmax = NonmaxMode(nonmax)
    threshold = _check_threshold(threshold)
    tile_h = TILE_H_SHARD
    rows_ext, wp = ext_img.shape
    rows_local = rows_ext - 2 * tile_h
    assert rows_local % tile_h == 0 and rows_local > 0, rows_ext
    assert wp % LANES == 0, wp
    n_tiles = rows_local // tile_h

    kernel = functools.partial(
        _kernel_tiles,
        mode=nonmax,
        threshold=int(threshold),
        count=int(count),
        height=int(height),
        width=int(width),
        tile_h=tile_h,
    )
    n_outs = 1 if nonmax is NonmaxMode.OFF else 2
    i0 = jnp.asarray(tile0, jnp.int32).reshape(1, 1)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_h, wp), lambda i: (i, 0)),
            pl.BlockSpec((tile_h, wp), lambda i: (i + 1, 0)),
            pl.BlockSpec((tile_h, wp), lambda i: (i + 2, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, wp), lambda i: (i, 0))
            for _ in range(n_outs)
        ],
        out_shape=[jax.ShapeDtypeStruct((rows_local, wp), jnp.uint16)] * n_outs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=bool(interpret),
    )(i0, ext_img, ext_img, ext_img)

    if nonmax is NonmaxMode.OFF:
        return outs[0], jnp.zeros((rows_local, wp), jnp.uint16)
    return outs[0], outs[1]


# ---------------------------------------------------------------------------
# Packed-words emission: detection whose only HBM output is the 32-pixel
# keypoint words — the dense mask never exists in memory.
# ---------------------------------------------------------------------------

_WORD_LANES = 128  # minimum lane width of the packed-words output block
#: Widest supported packed-words image: lanes grow in 128-word steps up
#: to 256 words = 8192 px (round 5, VERDICT r4 #2 — the 4096-px cap made
#: docs/DISTRIBUTED.md's 8K keypoint-list claim false).  The cost of the
#: wider block is the pack matrix's VMEM ((wp, 4*lanes) bf16 = 16 MB at
#: 8192 px vs 2 MB at 4096) and a proportionally larger pack matmul;
#: beyond 8192 px the matrix alone crowds the ~100 MB scoped-VMEM cap on
#: top of the detector's window planes, so wider frames route through
#: dense+pack (api._detect_compact's fallback).
_WORD_LANES_MAX = 256


def _word_lanes_for(wp: int) -> int:
    """Lane width of the packed-words output for a padded image width:
    the word count rounded up to a multiple of the 128-lane vreg."""
    wpw = wp // 32
    return max(_WORD_LANES, -(-wpw // _WORD_LANES) * _WORD_LANES)


def words_supported(w: int) -> bool:
    """The packed-words kernel holds one row of words per sublane —
    requires padded_width(w)/32 <= 256 word lanes (up to 8192 px wide)."""
    return padded_width(w) // 32 <= _WORD_LANES_MAX


@functools.lru_cache(maxsize=None)
def _pack_weights(wp: int):
    """(wp, 4*n_lanes) bf16 packing matrix, n_lanes = _word_lanes_for(wp).

    Column c of the keypoint plane (word j = c//32, bit r = c%32, byte
    t = r//8, bit-in-byte b = r%8) contributes 2^b to output column
    t*n_lanes + j.  A bf16 matmul of the {0,1} keypoint plane against
    this matrix on the MXU packs 8 mask bits per output byte EXACTLY —
    every term is a distinct power of two <= 128, per-dot sums <= 255,
    and f32 accumulation is exact far beyond that.

    Returns a HOST numpy array (bf16) — callers convert per trace; caching
    a device/traced array here would leak tracers across jit scopes."""
    import numpy as np
    import ml_dtypes

    n_lanes = _word_lanes_for(wp)
    wpw = wp // 32
    assert wpw <= n_lanes <= _WORD_LANES_MAX, wp
    w = np.zeros((wp, 4 * n_lanes), np.float32)
    c = np.arange(wp)
    j, r = c // 32, c % 32
    t, b = r // 8, r % 8
    w[c, t * n_lanes + j] = np.left_shift(1, b).astype(np.float32)
    return w.astype(ml_dtypes.bfloat16)


def _kernel_words(img_prev, img_cur, img_next, wmat, words_out, *,
                  mode: NonmaxMode, threshold: int, count: int, height: int,
                  width: int, tile_h: int, n_lanes: int = _WORD_LANES,
                  i0=0):
    _, tile_has_candidates, tile_body = _tile_keep(
        img_prev, img_cur, img_next, mode=mode, threshold=int(threshold),
        count=count, height=height, width=width, tile_h=tile_h, i0=i0,
    )

    @pl.when(jnp.logical_not(tile_has_candidates))
    def _():
        words_out[:, :] = jnp.zeros((tile_h, n_lanes), jnp.int32)

    @pl.when(tile_has_candidates)
    def _():
        keep, _ = tile_body()
        wb = jax.lax.dot_general(
            keep.astype(jnp.bfloat16), wmat[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        by = [
            jax.lax.slice_in_dim(
                wb, t * n_lanes, (t + 1) * n_lanes, axis=1
            ).astype(jnp.int32)
            for t in range(4)
        ]
        words_out[:, :] = by[0] | (by[1] << 8) | (by[2] << 16) | (by[3] << 24)


def detect_words_padded(
    image: jax.Array, threshold: int, count: int, nonmax: NonmaxMode,
    interpret: bool = False,
) -> jax.Array:
    """Fused detection emitting PACKED keypoint words directly: returns
    (hp/tile, words (hp, _WORD_LANES) i32) where row r, lane j (j <
    padded_width/32) packs the keypoint mask of columns 32j..32j+31 — the
    flat word stream words[:, :wp//32].reshape(-1) is identical to
    ``ops.compact.pack_mask_words`` of the padded dense mask.  The packing
    rides the MXU (see _pack_weights), so the dense u16 mask (and its
    separate repack pass) never touches HBM."""
    nonmax = NonmaxMode(nonmax)
    threshold = _check_threshold(threshold)
    h, w = image.shape
    tile_h = tile_h_for(nonmax, h, count)
    hp, wp = _pad_to(h, tile_h), _pad_to(w, LANES)
    n_lanes = _word_lanes_for(wp)
    assert wp // 32 <= _WORD_LANES_MAX, \
        "use detect_dense_padded + pack for wide images"
    img = jnp.pad(image, ((0, hp - h), (0, wp - w)))
    n_tiles = hp // tile_h

    kernel = functools.partial(
        _kernel_words,
        mode=nonmax,
        threshold=int(threshold),
        count=int(count),
        height=h,
        width=w,
        tile_h=tile_h,
        n_lanes=n_lanes,
    )
    clamp = lambda v: jnp.clip(v, 0, n_tiles - 1)
    words = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_h, wp), lambda i: (clamp(i - 1), 0)),
            pl.BlockSpec((tile_h, wp), lambda i: (i, 0)),
            pl.BlockSpec((tile_h, wp), lambda i: (clamp(i + 1), 0)),
            pl.BlockSpec((wp, 4 * n_lanes), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_h, n_lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((hp, n_lanes), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=bool(interpret),
    )(img, img, img, jnp.asarray(_pack_weights(wp), jnp.bfloat16))
    return words


def _kernel_words_tiles(i0_ref, img_prev, img_cur, img_next, wmat,
                        words_out, *, mode: NonmaxMode, threshold: int,
                        count: int, height: int, width: int, tile_h: int,
                        n_lanes: int = _WORD_LANES):
    """Row-shard packed-words kernel: _kernel_words with the global tile
    index of local tile 0 arriving as an SMEM scalar (per-shard DATA, so
    one XLA program serves every shard of a shard_map)."""
    _kernel_words(img_prev, img_cur, img_next, wmat, words_out, mode=mode,
                  threshold=threshold, count=count, height=height,
                  width=width, tile_h=tile_h, n_lanes=n_lanes,
                  i0=i0_ref[0, 0])


def detect_words_tiles(
    ext_img: jax.Array, tile0: jax.Array, threshold: int, count: int,
    nonmax: NonmaxMode, *, height: int, width: int, interpret: bool = False,
) -> jax.Array:
    """Packed-words detection over one ROW SHARD of a spatially-sharded
    image (parallel/spatial.py): `detect_words_padded`'s emission with
    `detect_dense_tiles`' halo/global-coordinate contract.

    ``ext_img``: (rows_local + 2*TILE_H_SHARD, wp) u8 shard rows bracketed by the
    neighbors' halo tiles; ``tile0``: traced global tile index of the
    shard's first local tile.  Returns (rows_local, _WORD_LANES) i32 packed
    keypoint words, bit-identical to the corresponding row block of
    `detect_words_padded` of the whole image (border quirks evaluated in
    GLOBAL coordinates via the SMEM offset)."""
    nonmax = NonmaxMode(nonmax)
    threshold = _check_threshold(threshold)
    tile_h = TILE_H_SHARD
    rows_ext, wp = ext_img.shape
    rows_local = rows_ext - 2 * tile_h
    n_lanes = _word_lanes_for(wp)
    assert rows_local % tile_h == 0 and rows_local > 0, rows_ext
    assert wp % LANES == 0, wp
    assert wp // 32 <= _WORD_LANES_MAX, "image too wide for the words kernel"
    n_tiles = rows_local // tile_h

    kernel = functools.partial(
        _kernel_words_tiles,
        mode=nonmax,
        threshold=int(threshold),
        count=int(count),
        height=int(height),
        width=int(width),
        tile_h=tile_h,
        n_lanes=n_lanes,
    )
    i0 = jnp.asarray(tile0, jnp.int32).reshape(1, 1)
    words = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_h, wp), lambda i: (i, 0)),
            pl.BlockSpec((tile_h, wp), lambda i: (i + 1, 0)),
            pl.BlockSpec((tile_h, wp), lambda i: (i + 2, 0)),
            pl.BlockSpec((wp, 4 * n_lanes), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_h, n_lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_local, n_lanes), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=bool(interpret),
    )(i0, ext_img, ext_img, ext_img,
      jnp.asarray(_pack_weights(wp), jnp.bfloat16))
    return words
