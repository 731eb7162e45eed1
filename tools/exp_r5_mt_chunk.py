"""Round-5 MaxThreshold experiment: row-chunked pyramids x tile height
(VERDICT r4 #3).

Round 4's sweep found MT's fastest tile was 216 rows (0.1648 vs the
landed 120-row 0.1702 ms/frame) but the dual score pyramids' ~118 MB
scoped-VMEM liveness blocked it (~100 MB effective cap; odd counts
hard-OOMed).  `fast_pallas.MT_PYRAMID_CHUNK` now evaluates eh/el over
balanced row sub-blocks — exact, zero recompute, VMEM scales with the
chunk — so the bigger tiles become compilable.  This sweeps
(tile_h, chunk) pairs in ONE process (CLAUDE.md: cross-process TPU
timings jitter +-50%), checking bit-exactness of the full
detect+compact contract against the (128, None) reference first.

Usage: python tools/exp_r5_mt_chunk.py [tile:chunk ...]
       (chunk "none" = unchunked; default sweep below)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

#: (tile_h, chunk) candidates: 120 = the round-4 production tile (chunk
#: 128 leaves it in one block — sanity row), 216 = the blocked sweep
#: winner at several chunks, 360/1080 = the zero-padding divisors that
#: never compiled before.
DEFAULT = [(120, None), (120, 64), (216, 128), (216, 112), (216, 80),
           (216, 56), (360, 112), (360, 80), (1080, 80)]
CHIP_BATCH = 64
ROUNDS = 20
REPS = 5


def main() -> int:
    from feature_detector_fast_tpu.utils import cache as _cache

    _cache.enable()

    import jax
    import jax.numpy as jnp

    from bench import build_1080p_frame
    from feature_detector_fast_tpu import Config, NonmaxMode, api
    from feature_detector_fast_tpu.ops import fast_pallas

    if sys.argv[1:]:
        pairs = []
        for s in sys.argv[1:]:
            t, c = s.split(":")
            pairs.append((int(t), None if c == "none" else int(c)))
    else:
        pairs = DEFAULT

    img = build_1080p_frame()
    chip_np = np.broadcast_to(img, (CHIP_BATCH,) + img.shape).copy()
    dev_batch = jax.device_put(chip_np)
    zeros = jax.device_put(np.zeros(ROUNDS, np.uint8))
    jax.block_until_ready((dev_batch, zeros))

    config = Config(16, 9, NonmaxMode.MAX_THRESHOLD)
    cap = api._max_super_cap(*img.shape)
    args = (int(config.threshold), int(config.count), config.nonmax, cap)
    ref_packed = None
    for tile_h, chunk in [(128, None)] + [p for p in pairs if p != (128, None)]:
        fast_pallas.TILE_H_OVERRIDE = tile_h
        fast_pallas.MT_PYRAMID_CHUNK = chunk
        for fn in (api._detect_compact, api._detect_compact_batch,
                   api._detect_compact_batch_packed):
            fn.clear_cache()
        try:
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
            rec = {"tile_h": tile_h, "chunk": chunk, "bit_exact": exact,
                   "ms_per_frame": round(per[len(per) // 2] * 1e3, 4),
                   "min_ms": round(per[0] * 1e3, 4),
                   "max_ms": round(per[-1] * 1e3, 4)}
        except Exception as e:  # compile failure at big tiles is data
            rec = {"tile_h": tile_h, "chunk": chunk,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        finally:
            fast_pallas.TILE_H_OVERRIDE = None
            fast_pallas.MT_PYRAMID_CHUNK = 128
        print(json.dumps(rec), flush=True)
        print(rec, file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
