"""Experiment: right-sized-cap top_k selection vs full-grid identity
layout for superword compaction on a dense frame (round 3).

On the golden_1080p OFF config most 256-px superwords are nonzero, so
the right-sized cap approaches the grid bound and lax.top_k is a
near-full partial sort.  ops.compact emits an identity superword layout
when cap >= grid (no sort, no gather); api._grow_cap/bench jump to the
grid cap when the tight cap reaches 3/4 of it.  This times the full
detect+compact contract at both caps in ONE process to pin the
crossover claim.
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
    from feature_detector_fast_tpu import api
    from feature_detector_fast_tpu.config import NonmaxMode

    BATCH, ROUNDS, REPS = 64, 20, 3
    img = build_1080p_frame()
    batch = jnp.asarray(np.broadcast_to(img, (BATCH,) + img.shape).copy())

    max_cap = api._max_super_cap(*img.shape)
    # True superword count for OFF on this frame.
    s = api._detect_compact(jnp.asarray(img), 16, 9, NonmaxMode.OFF, max_cap)
    n_supers = int(s[3])
    tight = api.tight_cap(n_supers, floor=1024)
    print(f"n_supers={n_supers} of {max_cap} grid supers "
          f"({100.0 * n_supers / max_cap:.0f}% nonzero); tight cap {tight}",
          file=sys.stderr)

    def timeit(tag, cap):
        det = lambda im: api._detect_compact.__wrapped__(
            im, 16, 9, NonmaxMode.OFF, cap)

        @functools.partial(jax.jit, static_argnums=(2,))
        def loop(imgs, zeros, rounds):
            def body(c, z):
                sidx, sbits, n, ns_ = jax.vmap(det)(imgs ^ z)
                r = (n.sum(dtype=jnp.int32) + ns_.sum(dtype=jnp.int32)
                     + sidx.sum(dtype=jnp.int32) + sbits.sum(dtype=jnp.int32))
                return c + r, None
            c, _ = jax.lax.scan(body, jnp.int32(0), zeros[:rounds])
            return c

        zeros = jnp.zeros(ROUNDS, jnp.uint8)
        int(loop(batch, zeros, ROUNDS))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            int(loop(batch, zeros, ROUNDS))
            ts.append((time.perf_counter() - t0) / (ROUNDS * BATCH) * 1e3)
        ms = sorted(ts)[len(ts) // 2]
        print(f"{tag}: {ms:.4f} ms/frame (min {min(ts):.4f})", file=sys.stderr)
        return ms

    a = timeit(f"top_k cap={tight}", tight)
    b = timeit(f"identity cap={max_cap}", max_cap)
    print(f"identity saves {a - b:.4f} ms/frame", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
