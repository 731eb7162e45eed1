"""Experiment: where does a 1080p k=1000 front-end frame's time go?

Times nested prefixes of the front-end pipeline chip-sustained (same
on-device lax.scan protocol as bench.py), so stage costs fall out by
subtraction:

    detect            FAST SumAbsolute dense (mask, score)
    +topk             + two-level top-K selection
    +extract          + fused blur+patch extraction (one DMA/keypoint)
    +plain            + unoriented sampling matmul + bit pack
    +oriented         + moments/orientation + quadrant rotation +
                      15-residual-bin einsum + one-hot select (instead of
                      the plain matmul)

Usage: python tools/exp_frontend_stages.py [k] [batch]
Diagnostics to stderr; one JSON line per stage to stdout.
"""

from __future__ import annotations

import functools
import json
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
    from feature_detector_fast_tpu.api import _detect_dense_best
    from feature_detector_fast_tpu.config import NonmaxMode
    from feature_detector_fast_tpu.models import brief

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rounds = 30
    img = build_1080p_frame()
    imgs = jax.device_put(np.broadcast_to(img, (batch,) + img.shape).copy())
    zeros = jax.device_put(np.zeros(rounds, np.uint8))
    jax.block_until_ready((imgs, zeros))

    def stage_detect(im):
        mask, score = _detect_dense_best(im, 16, 9, NonmaxMode.SUM_ABSOLUTE)
        return (mask.sum(dtype=jnp.int32)
                + score.sum(dtype=jnp.int32).astype(jnp.int32))

    def stage_topk(im):
        mask, score = _detect_dense_best(im, 16, 9, NonmaxMode.SUM_ABSOLUTE)
        kps = brief.select_topk(mask, score, k)
        return kps.xy.sum(dtype=jnp.int32) + kps.score.sum(dtype=jnp.int32)

    def _kps(im):
        mask, score = _detect_dense_best(im, 16, 9, NonmaxMode.SUM_ABSOLUTE)
        return brief.select_topk(mask, score, k)

    def stage_extract(im):
        from feature_detector_fast_tpu.ops import patch_pallas

        kps = _kps(im)
        wins = patch_pallas.extract_windows_fused(im, kps.xy)
        return kps.xy.sum(dtype=jnp.int32) + wins.sum(dtype=jnp.int32)

    def stage_plain(im):
        kps = _kps(im)
        desc, dv = brief.describe_patched(im, kps, oriented=False)
        return (kps.xy.sum(dtype=jnp.int32)
                + desc.sum(dtype=jnp.uint32).astype(jnp.int32)
                + dv.sum(dtype=jnp.int32))

    def stage_oriented(im):
        kps = _kps(im)
        desc, dv = brief.describe_patched(im, kps, oriented=True)
        return (kps.xy.sum(dtype=jnp.int32)
                + desc.sum(dtype=jnp.uint32).astype(jnp.int32)
                + dv.sum(dtype=jnp.int32))

    prev = 0.0
    for name, fn in (
        ("detect", stage_detect),
        ("+topk", stage_topk),
        ("+extract", stage_extract),
        ("+plain", stage_plain),
        ("+oriented", stage_oriented),
    ):

        @functools.partial(jax.jit, static_argnums=(2,))
        def loop(ims, zs, r, fn=fn):
            def body(c, z):
                acc = jax.vmap(fn)(ims ^ z).sum(dtype=jnp.int32)
                return c + acc, None
            c, _ = jax.lax.scan(body, jnp.int32(0), zs[:r])
            return c

        int(loop(imgs, zeros, rounds))
        t0 = time.perf_counter()
        int(loop(imgs, zeros, rounds))
        ms = (time.perf_counter() - t0) / (rounds * batch) * 1e3
        print(f"{name}: {ms:.3f} ms/frame (delta {ms - prev:+.3f})",
              file=sys.stderr)
        print(json.dumps({"stage": name, "ms_per_frame": round(ms, 4),
                          "delta_ms": round(ms - prev, 4)}))
        prev = ms
    return 0


if __name__ == "__main__":
    sys.exit(main())
