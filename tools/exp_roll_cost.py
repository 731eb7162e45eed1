"""Experiment: what do the 6 cross-lane rolls cost in the OFF kernel?

Times detect_words_padded (1080p, t=16 n=9 OFF, batch 64, on-device scan)
in three variants:
  base          — unpatched kernel
  forced        — tile_has_candidates forced true (every tile runs the body;
                  isolates the branch from the roll measurement)
  forced-noroll — same, with _roll_cols patched to identity (WRONG results,
                  timing-only: removes the 6 lane rolls from the trace)

forced - forced_noroll = per-frame lane-roll cost.  Diagnostics to stderr.
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

    from bench import build_1080p_frame
    from feature_detector_fast_tpu.config import NonmaxMode
    from feature_detector_fast_tpu.ops import fast_pallas as fp

    BATCH, ROUNDS = 64, 20

    img = build_1080p_frame()
    batch = jnp.asarray(np.broadcast_to(img, (BATCH,) + img.shape).copy())

    def timeit(tag: str) -> float:
        det = lambda im: fp.detect_words_padded(im, 16, 9, NonmaxMode.OFF)

        @functools.partial(jax.jit, static_argnums=(2,))
        def loop(imgs, zeros, rounds):
            def body(c, z):
                w = jax.vmap(det)(imgs ^ z)
                return c + w.sum(dtype=jnp.int32), None
            c, _ = jax.lax.scan(body, jnp.int32(0), zeros[:rounds])
            return c

        zeros = jnp.zeros(ROUNDS, jnp.uint8)
        int(loop(batch, zeros, ROUNDS))  # warm (same static rounds)
        t0 = time.perf_counter()
        int(loop(batch, zeros, ROUNDS))
        ms = (time.perf_counter() - t0) / (ROUNDS * BATCH) * 1e3
        print(f"{tag}: {ms:.4f} ms/frame", file=sys.stderr)
        return ms

    base = timeit("base")

    orig_pref = fp._swar_window_prefilter
    orig_roll = fp._roll_cols

    def forced_pref(*a, **k):
        rw, cpw, hb, cw, _ = orig_pref(*a, **k)
        return rw, cpw, hb, cw, cpw[0, 0] < 2**30  # always true (cpw < 2^24)
    fp._swar_window_prefilter = forced_pref
    try:
        forced = timeit("forced")
        fp._roll_cols = lambda plane, dx: plane
        noroll = timeit("forced-noroll")
    finally:
        fp._swar_window_prefilter = orig_pref
        fp._roll_cols = orig_roll

    print(f"roll cost: {forced - noroll:.4f} ms/frame "
          f"({(forced - noroll) / forced * 100:.1f}% of forced body)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
