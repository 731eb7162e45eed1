"""Experiment: decompose the OFF kernel's 0.052 ms/frame fixed overhead
(tools/exp_off_stages.py "trivial-body") into window-build vs words
emission (wmat DMA + pack matmul).

Variants (ONE process, timing-only):
  words-trivial   detect_words_padded, body = 2-op dummy (baseline 0.052)
  dense-trivial   detect_dense_padded, same dummy body: NO wmat input, no
                  emission matmul - mask written dense u16
  dense-full      detect_dense_padded, real body (full kernel, dense out)
  words-full      detect_words_padded, real body (the production kernel)

words_trivial - dense_trivial ~= emission cost (wmat DMA + bf16 cast +
matmul + byte recombine) minus the extra dense-mask write.
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

    BATCH, ROUNDS, REPS = 64, 20, 3

    img = build_1080p_frame()
    batch = jnp.asarray(np.broadcast_to(img, (BATCH,) + img.shape).copy())

    def timeit(tag: str, det) -> float:
        @functools.partial(jax.jit, static_argnums=(2,))
        def loop(imgs, zeros, rounds):
            def body(c, z):
                w = jax.vmap(det)(imgs ^ z)
                return c + w.sum(dtype=jnp.int32), None
            c, _ = jax.lax.scan(body, jnp.int32(0), zeros[:rounds])
            return c

        zeros = jnp.zeros(ROUNDS, jnp.uint8)
        int(loop(batch, zeros, ROUNDS))
        best = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            int(loop(batch, zeros, ROUNDS))
            best.append((time.perf_counter() - t0) / (ROUNDS * BATCH) * 1e3)
        ms = sorted(best)[len(best) // 2]
        print(f"{tag}: {ms:.4f} ms/frame  (min {min(best):.4f})",
              file=sys.stderr)
        return ms

    det_words = lambda im: fp.detect_words_padded(im, 16, 9, NonmaxMode.OFF)
    det_dense = lambda im: fp.detect_dense_padded(
        im, 16, 9, NonmaxMode.OFF)[0].astype(jnp.int32)

    r = {}
    r["words-full"] = timeit("words-full", det_words)
    r["dense-full"] = timeit("dense-full", det_dense)

    orig_body = fp._tile_keypoints_off_swar

    def trivial_body(rw, hb, cw, *, i, count, height, width, tile_h):
        return jnp.concatenate([(hb & 1) != 0, (cw & 1) != 0], axis=0)

    fp._tile_keypoints_off_swar = trivial_body
    try:
        r["words-trivial"] = timeit("words-trivial", det_words)
        r["dense-trivial"] = timeit("dense-trivial", det_dense)
    finally:
        fp._tile_keypoints_off_swar = orig_body

    print("--- derived (ms/frame) ---", file=sys.stderr)
    print(f"emission extra (words_triv - dense_triv): "
          f"{r['words-trivial'] - r['dense-trivial']:.4f}", file=sys.stderr)
    print(f"emission extra, full body:                "
          f"{r['words-full'] - r['dense-full']:.4f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
