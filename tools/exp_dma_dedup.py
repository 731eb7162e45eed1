"""Experiment: does block-sorted keypoint order dedup strip-DMA fetches?

Applies only to extract_windows_fused's strip-DMA FALLBACK kernel (images
too large for VMEM residency) — the default resident path issues no
per-keypoint input DMAs, so this tool forces the fallback by zeroing
_RESIDENT_BYTES_MAX.  The fallback issues one (96, 256) strip DMA per
keypoint and is DMA-overhead-bound.  Pallas' pipeline elides the copy
when an operand's block index is unchanged between consecutive grid
steps — so feeding coords sorted by strip block, interleaved so each of
the `group` operands walks a contiguous sorted run (operand j gets
sorted[j*S + i] at step i), should collapse ~K DMAs to ~(#distinct
blocks + group).

Times extraction at k in {512, 1000, 2048} on a 1080p frame, coords drawn
from the frame's real FAST keypoints: (a) as-selected (score order),
(b) block-sorted + operand-interleaved.  Timing only; result equality is
checked once on host.
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
    from feature_detector_fast_tpu.ops import patch_pallas as pp

    ROUNDS = 50
    img_np = build_1080p_frame()
    h, w = img_np.shape
    img = jnp.asarray(img_np)
    pp._RESIDENT_BYTES_MAX = 0  # force the strip-DMA fallback under test

    rng = np.random.default_rng(7)
    margin = pp.PATCH // 2 + 2
    n_cb = -(-w // pp.LANES)

    def run(tag: str, xy_np: np.ndarray) -> float:
        xy = jnp.asarray(xy_np)

        @functools.partial(jax.jit, static_argnums=(3,))
        def loop(image, coords, zeros, rounds):
            def body(c, z):
                wins = pp.extract_windows_fused(image ^ z, coords)
                return c + wins.sum(dtype=jnp.int32), None
            c, _ = jax.lax.scan(body, jnp.int32(0), zeros[:rounds])
            return c

        zeros = jnp.zeros(ROUNDS, jnp.uint8)
        int(loop(img, xy, zeros, ROUNDS))
        t0 = time.perf_counter()
        int(loop(img, xy, zeros, ROUNDS))
        ms = (time.perf_counter() - t0) / ROUNDS * 1e3
        print(f"  {tag}: {ms:.4f} ms", file=sys.stderr)
        return ms

    for k in (512, 1000, 2048):
        # realistic scattered coords
        xy = np.stack(
            [rng.integers(margin, w - margin, k),
             rng.integers(margin, h - margin, k)], axis=1
        ).astype(np.int32)

        # block-sorted + operand-interleaved
        rb = (xy[:, 1] - margin) // pp._BLK_H
        cb = (xy[:, 0] - margin) // pp.LANES
        order = np.lexsort((xy[:, 0], cb, rb))
        srt = xy[order]
        g = pp._GROUP
        kp = -(-k // g) * g
        if kp != k:
            srt = np.concatenate(
                [srt, np.full((kp - k, 2), margin, np.int32)])
        inter = srt.reshape(g, kp // g, 2).transpose(1, 0, 2).reshape(kp, 2)

        print(f"k={k} (distinct blocks: "
              f"{len(np.unique(rb * 64 + cb))})", file=sys.stderr)
        a = run("unsorted", xy)
        b = run("sorted+interleaved", inter)

        # correctness: same multiset of windows
        import jax.numpy as jnp2
        wa = np.asarray(pp.extract_windows_fused(img, jnp.asarray(xy)))
        wb = np.asarray(pp.extract_windows_fused(img, jnp.asarray(inter)))
        total = np.concatenate([order, np.arange(k, kp)])
        feed = total.reshape(g, kp // g).T.reshape(-1)  # feed row -> orig idx
        inv = np.argsort(feed)
        assert (wb[inv[:k]] == wa).all(), "window mismatch after unsort"
        print(f"  speedup {a / b:.2f}x (windows identical)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
