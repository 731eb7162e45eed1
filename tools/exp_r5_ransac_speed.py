"""Round-5: where estimate_pairs' device time actually goes on TPU.

The round-5 back-end profile pinned loop_ransac (batched essential
RANSAC, no per-pair refinement) at 2.53 s for ~250 loop pairs.  The
suspects are all tiny-batched factorizations: H x P (8, 9)
hypothesis SVDs, 2 x P full-matrices (K, 9) refit SVDs (whose U factor
is (K, K) = 512 x 512!), and P pose-recovery SVDs.  This times
`_estimate_pairs_device` on a synthetic (P, K) batch under three
factorization variants in ONE process:

  * mgs:      round-5 production (unrolled Gram-Schmidt hypotheses +
              9x9 eigh refit),
  * svd-hyp:  SVD hypotheses (the r4 solver) + 9x9 eigh refit,
  * r4-full:  SVD hypotheses + full-matrices (K, 9) SVD refit (r4).

Usage: python tools/exp_r5_ransac_speed.py [P] [K]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def main() -> int:
    from feature_detector_fast_tpu.utils import cache as _cache

    _cache.enable()

    import jax
    import jax.numpy as jnp

    from feature_detector_fast_tpu.models import slam, twoview

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    rng = np.random.default_rng(0)
    pa = rng.normal(0, 0.3, (P, K, 2)).astype(np.float32)
    pb = (pa + rng.normal(0, 0.01, (P, K, 2))).astype(np.float32)
    valid = rng.random((P, K)) < 0.6
    batch = slam.PairBatch(pa, pb, valid,
                           np.tile(np.arange(K, dtype=np.int32), (P, 1)))

    orig_hyp = twoview._eight_point_hyp
    orig_refit = twoview._eight_point_weighted

    def r4_refit(pa1, pb1, w):
        A = twoview._epipolar_rows(pa1, pb1) * w
        _, _, vt = jnp.linalg.svd(A, full_matrices=True)
        E = vt[-1].reshape(3, 3)
        u, s, vt2 = jnp.linalg.svd(E)
        sbar = (s[0] + s[1]) / 2.0
        return u @ jnp.diag(jnp.asarray([sbar, sbar, 0.0], E.dtype)) @ vt2

    cfg = slam.VOConfig()
    for tag, hyp, refit in [
        ("mgs", orig_hyp, orig_refit),
        ("svd-hyp", twoview._eight_point, orig_refit),
        ("r4-full", twoview._eight_point, r4_refit),
    ]:
        twoview._eight_point_hyp = hyp
        twoview._eight_point_weighted = refit
        jax.clear_caches()
        import dataclasses
        c = dataclasses.replace(cfg, pair_refine_iters=0)
        slam.estimate_pairs(batch, c)  # warm/compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            slam.estimate_pairs(batch, c)
            ts.append(time.perf_counter() - t0)
        rec = {"variant": tag, "P": P, "K": K,
               "sec": round(sorted(ts)[1], 3), "min": round(min(ts), 3)}
        print(json.dumps(rec), flush=True)
        print(rec, file=sys.stderr, flush=True)
    twoview._eight_point_hyp = orig_hyp
    twoview._eight_point_weighted = orig_refit
    return 0


if __name__ == "__main__":
    sys.exit(main())
