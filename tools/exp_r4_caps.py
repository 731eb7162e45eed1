"""Round-4 compaction-cap A/B: production top_k cap vs full-grid identity.

The round-4 tile sweep timed every mode at the IDENTITY cap (cap ==
grid bound: no top_k partial sort, no gather) and MT/SA came out ~0.03
ms/frame faster than bench.py's production-cap runs of the same kernel.
The top_k cost scales with the number of KEYS (the full superword grid,
8100 at 1080p), not with the cap, so a right-sized cap saves readback
bytes but not sort time — this measures the two regimes head-to-head in
ONE process to decide whether the production retry policy
(api._grow_cap's 3/4 identity jump) should jump sooner.

Usage: python tools/exp_r4_caps.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

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

    img = build_1080p_frame()
    chip_np = np.broadcast_to(img, (CHIP_BATCH,) + img.shape).copy()
    dev_batch = jax.device_put(chip_np)
    zeros = jax.device_put(np.zeros(ROUNDS, np.uint8))
    jax.block_until_ready((dev_batch, zeros))
    max_cap = api._max_super_cap(*img.shape)

    for name, config in (
        ("max_threshold", Config(16, 9, NonmaxMode.MAX_THRESHOLD)),
        ("sum_absolute", Config(16, 9, NonmaxMode.SUM_ABSOLUTE)),
        ("off", Config(16, 9, NonmaxMode.OFF)),
    ):
        # production cap: replay the _grow_cap fixpoint from bench's
        # initial cap (same as bench.py's warmup loop)
        cap = CAPS[name]
        while True:
            args = (int(config.threshold), int(config.count), config.nonmax,
                    cap)
            packed = np.asarray(
                api._detect_compact_batch_packed(dev_batch[:1], *args))
            n_supers = int(packed[:, 1].max())
            if n_supers <= cap:
                break
            cap = api._grow_cap(cap, n_supers, max_cap)

        for label, use_cap in (("production", cap), ("identity", max_cap)):
            args = (int(config.threshold), int(config.count), config.nonmax,
                    int(use_cap))

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

            int(chip_loop(dev_batch, zeros, ROUNDS))
            dts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                int(chip_loop(dev_batch, zeros, ROUNDS))
                dts.append(time.perf_counter() - t0)
            per = sorted(d / (ROUNDS * CHIP_BATCH) for d in dts)
            rec = {"mode": name, "regime": label, "cap": int(use_cap),
                   "n_supers": n_supers,
                   "ms_per_frame": round(per[len(per) // 2] * 1e3, 4),
                   "min_ms": round(per[0] * 1e3, 4),
                   "max_ms": round(per[-1] * 1e3, 4)}
            print(json.dumps(rec), flush=True)
            print(rec, file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
