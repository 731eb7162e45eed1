"""Experiment: stage-ablation profile of the OFF SWAR kernel (round-3
roofline work, VERDICT #1).

Times detect_words_padded (1080p golden frame, t=16 n=9 OFF, batch 64,
on-device scan) under timing-only monkeypatches, all in ONE process
(cross-process TPU timings jitter +-50%; in-process scans agree ~2%):

  base          unpatched kernel (tile skip active)
  forced        prefilter forced true — every tile runs the body
  trivial-body  forced + body replaced by a 2-op dummy keep: measures
                window build + u8->i32 SWAR packing + prefilter +
                emission matmul + grid/DMA overhead
  nochain       forced + _packed_any_window_all = identity: removes the
                two run-doubling chains (keeps the 16-tap loop)
  nopos         forced + _bit9_to_k = (v & m9) only: removes the
                per-predicate positioning shift (keeps add/and/or)
  bright-only   forced + dark polarity dropped: halves tap-loop
                predicates and runs one chain instead of two
  noroll        forced + _roll_cols = identity: removes the 6 lane rolls

Differences between variants give per-stage per-frame costs.  ALL
variants except base/forced produce WRONG detections — timing only.
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
        best = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            int(loop(batch, zeros, ROUNDS))
            best.append((time.perf_counter() - t0) / (ROUNDS * BATCH) * 1e3)
        ms = sorted(best)[len(best) // 2]
        print(f"{tag}: {ms:.4f} ms/frame  (min {min(best):.4f})",
              file=sys.stderr)
        return ms

    results = {}
    results["base"] = timeit("base")

    orig_pref = fp._swar_window_prefilter
    orig_roll = fp._roll_cols
    orig_chain = fp._packed_any_window_all
    orig_pos = fp._bit9_to_k
    orig_body = fp._tile_keypoints_off_swar

    def forced_pref(*a, **k):
        rw, cpw, hb, cw, _ = orig_pref(*a, **k)
        return rw, cpw, hb, cw, cpw[0, 0] < 2**30  # always true
    fp._swar_window_prefilter = forced_pref
    try:
        results["forced"] = timeit("forced")

        def trivial_body(rw, hb, cw, *, i, count, height, width, tile_h):
            return jnp.concatenate(
                [(hb & 1) != 0, (cw & 1) != 0], axis=0)
        fp._tile_keypoints_off_swar = trivial_body
        results["trivial"] = timeit("trivial-body")
        fp._tile_keypoints_off_swar = orig_body

        fp._packed_any_window_all = lambda m, count: m
        results["nochain"] = timeit("nochain")
        fp._packed_any_window_all = orig_chain

        m9 = fp._i32c(0x200 * fp._FF)
        fp._bit9_to_k = lambda v, k: v & m9
        results["nopos"] = timeit("nopos")
        fp._bit9_to_k = orig_pos

        def bright_body(rw, hb, cw, *, i, count, height, width, tile_h):
            from feature_detector_fast_tpu.geometry import CIRCLE, RADIUS
            half = tile_h // 2
            wp = hb.shape[1]
            bright = None
            for k, (dx, dy) in enumerate(CIRCLE):
                p = rw.tap(dx, dy, rows=half, row0=RADIUS)
                b = orig_pos(p + hb, k)
                bright = b if bright is None else bright | b
            a = orig_chain(bright, count)
            hit_lo = (a & 0xFFFF) != 0
            hit_hi = (a & fp._i32c(0xFFFF0000)) != 0
            arc_hit = jnp.concatenate([hit_lo, hit_hi], axis=0)
            gy = i * tile_h + jax.lax.broadcasted_iota(
                jnp.int32, (tile_h, wp), 0)
            gx = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wp), 1)
            interior = ((gy >= RADIUS) & (gy < height - RADIUS)
                        & (gx >= RADIUS) & (gx < width - RADIUS))
            return arc_hit & interior
        fp._tile_keypoints_off_swar = bright_body
        results["bright1"] = timeit("bright-only")
        fp._tile_keypoints_off_swar = orig_body

        fp._roll_cols = lambda plane, dx: plane
        results["noroll"] = timeit("noroll")
        fp._roll_cols = orig_roll
    finally:
        fp._swar_window_prefilter = orig_pref
        fp._roll_cols = orig_roll
        fp._packed_any_window_all = orig_chain
        fp._bit9_to_k = orig_pos
        fp._tile_keypoints_off_swar = orig_body

    f = results["forced"]
    print("--- derived stage costs (ms/frame, forced-tile regime) ---",
          file=sys.stderr)
    print(f"tile-skip benefit (forced - base): {f - results['base']:.4f}",
          file=sys.stderr)
    print(f"fixed overhead (trivial body):     {results['trivial']:.4f}",
          file=sys.stderr)
    print(f"arc body total (forced - trivial): {f - results['trivial']:.4f}",
          file=sys.stderr)
    print(f"run chains x2 (forced - nochain):  {f - results['nochain']:.4f}",
          file=sys.stderr)
    print(f"positioning    (forced - nopos):   {f - results['nopos']:.4f}",
          file=sys.stderr)
    print(f"dark polarity  (forced - bright1): {f - results['bright1']:.4f}",
          file=sys.stderr)
    print(f"lane rolls     (forced - noroll):  {f - results['noroll']:.4f}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
