"""Round-4 OFF fixed-overhead experiment: tile-height sweep (VERDICT r3 #5).

Round 3 pinned ~44% of an OFF frame in per-tile machinery (window concat,
u8->SWAR packing, prefilter, per-tile DMA).  The remaining lever is FEWER
tiles.  128-row tiles pad 1080 -> 1152 (72 dead rows, ~6.7% wasted work);
this sweep tries sublane-aligned DIVISORS of 1080 — 120 (9 tiles, zero
padding), 216 (5 tiles), 360 (3 tiles), 1080 (single tile) — plus the
VERDICT-suggested 256 (5 tiles but 1280-row padding) for completeness.

Per size: bit-exactness of the full detect+compact contract vs the
TILE_H=128 reference, then the bench.py on-device scan timing.  A/B in
ONE process (CLAUDE.md: cross-process TPU timings jitter +-50%).

Usage: python tools/exp_r4_tiles.py [mode[:h1,h2,...] ...]
       (default: off max_threshold with TILE_SIZES)

Findings (first sweep, round 4): the OFF/SA SWAR kernels only compile at
32-row-multiple tiles (u8 reshape granularity); MaxThreshold compiles at
any sublane multiple and 216-row tiles (5 tiles, zero padding) measured
0.1643 vs 0.1848 ms/frame at 128 — the follow-up sweep narrows both.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

TILE_SIZES = [128, 120, 216, 256, 360, 1080]
CHIP_BATCH = 64
ROUNDS = 20
REPS = 5


def main() -> int:
    from feature_detector_fast_tpu.utils import cache as _cache

    _cache.enable()

    import jax
    import jax.numpy as jnp

    from bench import CAPS, build_1080p_frame
    from feature_detector_fast_tpu import Config, NonmaxMode, api
    from feature_detector_fast_tpu.ops import fast_pallas

    specs = sys.argv[1:] or ["off", "max_threshold"]
    modes = []
    for s in specs:
        if ":" in s:
            mode, sizes = s.split(":", 1)
            modes.append((mode, [int(x) for x in sizes.split(",")]))
        else:
            modes.append((s, TILE_SIZES))
    img = build_1080p_frame()
    chip_np = np.broadcast_to(img, (CHIP_BATCH,) + img.shape).copy()
    dev_batch = jax.device_put(chip_np)
    zeros = jax.device_put(np.zeros(ROUNDS, np.uint8))
    jax.block_until_ready((dev_batch, zeros))

    cfgs = {"off": Config(16, 9, NonmaxMode.OFF),
            "max_threshold": Config(16, 9, NonmaxMode.MAX_THRESHOLD),
            "sum_absolute": Config(16, 9, NonmaxMode.SUM_ABSOLUTE)}

    for mode, tile_sizes in modes:
        config = cfgs[mode]
        cap = api._max_super_cap(*img.shape)  # identity regime for off; fine for all
        args = (int(config.threshold), int(config.count), config.nonmax, cap)
        ref_packed = None
        for tile_h in [128] + [t for t in tile_sizes if t != 128]:
            # TILE_H_OVERRIDE beats the per-mode candidate selection in
            # tile_h_for() — a plain TILE_H patch would be shadowed by
            # the selection rule landed from this experiment's results.  It is read at
            # trace time, invisible to the jit cache keys — drop the
            # cached programs or every size would reuse the first
            # compilation.
            fast_pallas.TILE_H_OVERRIDE = tile_h
            for fn in (api._detect_compact, api._detect_compact_batch,
                       api._detect_compact_batch_packed):
                fn.clear_cache()
            try:
                # correctness first: full packed output vs TILE_H=128
                packed = np.asarray(
                    api._detect_compact_batch_packed(dev_batch[:1], *args))
                if ref_packed is None:
                    ref_packed = packed
                    exact = True
                else:
                    exact = bool((packed == ref_packed).all())

                @functools.partial(jax.jit, static_argnums=(2,))
                def chip_loop(imgs, zs, rounds):
                    def body(c, z):
                        sidx, sbits, n, ns = api._detect_compact_batch(
                            imgs ^ z, *args)
                        r = (n.sum(dtype=jnp.int32) + ns.sum(dtype=jnp.int32)
                             + sidx.sum(dtype=jnp.int32)
                             + sbits.sum(dtype=jnp.int32))
                        return c + r, None
                    c, _ = jax.lax.scan(body, jnp.int32(0), zs[:rounds])
                    return c

                int(chip_loop(dev_batch, zeros, ROUNDS))  # warm, same statics
                dts = []
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    int(chip_loop(dev_batch, zeros, ROUNDS))
                    dts.append(time.perf_counter() - t0)
                per = sorted(d / (ROUNDS * CHIP_BATCH) for d in dts)
                rec = {"mode": mode, "tile_h": tile_h, "bit_exact": exact,
                       "ms_per_frame": round(per[len(per) // 2] * 1e3, 4),
                       "min_ms": round(per[0] * 1e3, 4),
                       "max_ms": round(per[-1] * 1e3, 4)}
            except Exception as e:  # compile failure at big tiles is data
                rec = {"mode": mode, "tile_h": tile_h,
                       "error": f"{type(e).__name__}: {str(e)[:200]}"}
            finally:
                fast_pallas.TILE_H_OVERRIDE = None
            print(json.dumps(rec), flush=True)
            print(rec, file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
