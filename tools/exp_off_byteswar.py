"""Experiment: 8-bit-field SWAR (4 px/lane) for the OFF arc phase
(round-3 VERDICT #1 candidate) — predicate-sequence micro-benchmark.

The 16-bit-field trick (fast_pallas._swar_window_prefilter) cannot run in
8-bit fields: the borrow-free biased compare needs field values up to
1023 (10 bits).  A 4 px/lane arc phase must instead precompute clamped
per-pixel u8 bounds hi = min(c+t, 255) / lo = max(c-t, 0) (strictness is
preserved: saturated bounds make the compare correctly false) and run a
bytewise unsigned compare per tap.  The cheapest known bytewise
x < y (Hacker's Delight 2-7 style, fields kept borrow-free):

    w  = ((x & 0x7f..) | 0x80..) - (y & 0x7f..)     # low-7-bit borrow
    r  = ((~x & y) | (~(x ^ y) & ~w)) & 0x80..      # sign-bit combine

~10 i32 ops per 4 px, plus 2 ops to position the bit at ring slot k%8
and OR-accumulate — vs the 16-bit path's add+shift+and+or = 4 ops per
2 px WITH positioning folded in.  Per-pixel: ~3 ops (bytes) vs 2 ops
(16-bit fields) — the wider packing LOSES on op count because TPU lanes
are 32-bit either way and the byte compare cannot use a single biased
add.  This tool measures both sequences at equal logical pixel count to
pin the ratio; the chain phase (which would additionally need two
cross-rotating planes per polarity in byte mode) is not even reached.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    from feature_detector_fast_tpu.utils import cache as _cache

    _cache.enable()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _i32c(v):
        return int(np.int32(np.uint32(v & 0xFFFFFFFF)))

    H = _i32c(0x80808080)
    L7 = _i32c(0x7F7F7F7F)
    FF = 0x00010001
    M9 = _i32c(0x200 * FF)

    ROWS, LANES, TAPS = 256, 128, 16
    GRID = 64          # programs per kernel call
    ROUNDS, REPS = 8, 5

    # seq16: 2 px/lane -> ROWS rows processes 2*ROWS*LANES px.
    # seq8:  4 px/lane -> ROWS//2 rows processes the same count.
    def k16(x_ref, hb_ref, cw_ref, o_ref):
        p = x_ref[:, :]
        hb = hb_ref[:, :]
        cw = cw_ref[:, :]
        bright = jnp.zeros_like(p)
        dark = jnp.zeros_like(p)
        for k in range(TAPS):
            q = p + hb
            r = cw - p
            s = 9 - k
            if s > 0:
                b = (q >> s) & _i32c(FF << k)
                d = (r >> s) & _i32c(FF << k)
            elif s == 0:
                b = q & M9
                d = r & M9
            else:
                b = (q << (-s)) & _i32c((FF << k) & 0xFFFFFFFF)
                d = (r << (-s)) & _i32c((FF << k) & 0xFFFFFFFF)
            bright = bright | b
            dark = dark | d
            p = p + 1  # new "tap" each iteration; defeats CSE
        o_ref[:, :] = bright ^ dark

    def k8(x_ref, hi_ref, lo_ref, o_ref):
        p = x_ref[:, :]
        hi = hi_ref[:, :]
        lo = lo_ref[:, :]
        planes = [jnp.zeros_like(p), jnp.zeros_like(p)]
        for k in range(TAPS):
            # bright: p > hi  <=>  hi < p ; dark: p < lo
            for which, (x, y) in enumerate(((hi, p), (p, lo))):
                w = ((x & L7) | H) - (y & L7)
                r = ((~x & y) | (~(x ^ y) & ~w)) & H
                s = 7 - (k % 8)
                bit = (r >> s) & _i32c((0x01010101 << (k % 8))
                                       & 0xFFFFFFFF) if s else r
                planes[k // 8] = planes[k // 8] | bit
            p = p + _i32c(0x01010101)
        o_ref[:, :] = planes[0] ^ planes[1]

    img = np.random.default_rng(0)
    mk = lambda r: jnp.asarray(
        img.integers(0, 2**30, (GRID * r, LANES), np.int64).astype(np.int32))

    def bench(tag, kern, rows):
        x, a, b = mk(rows), mk(rows), mk(rows)
        call = pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((rows, LANES), lambda i: (i, 0))] * 3,
            out_specs=pl.BlockSpec((rows, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((GRID * rows, LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )

        @functools.partial(jax.jit, static_argnums=(3,))
        def loop(x, a, b, rounds):
            def body(c, _):
                o = call(x ^ c, a, b)
                return c ^ o[0, 0], None
            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=rounds)
            return c

        int(loop(x, a, b, ROUNDS))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            int(loop(x, a, b, ROUNDS))
            ts.append(time.perf_counter() - t0)
        ms = sorted(ts)[len(ts) // 2] / ROUNDS * 1e3
        px = GRID * rows * LANES * (2 if kern is k16 else 4)
        print(f"{tag}: {ms:.4f} ms/call  ({px / (ms * 1e6):.1f} Gpx/s "
              f"for the 16-tap dual-polarity predicate phase)",
              file=sys.stderr)
        return ms, px

    ms16, px16 = bench("seq16 (2px/lane, biased-add)", k16, ROWS)
    ms8, px8 = bench("seq8  (4px/lane, bytewise-cmp)", k8, ROWS // 2)
    assert px16 == px8
    print(f"byte-SWAR / 16-bit-SWAR time ratio at equal pixels: "
          f"{ms8 / ms16:.2f}x", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
