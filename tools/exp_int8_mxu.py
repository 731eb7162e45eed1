"""Experiment: is int8 x int8 -> int32 dot_general native-fast on v5e?

Steered BRIEF's sampling einsum is (K, 1922) @ (1922, 30*256) in bf16
(hi/lo 7-bit split for exactness).  The same product is expressible as an
int8 matmul (hi <= 49, lo <= 127, weights in {-128..128}), which doubles
MXU throughput IF XLA lowers s8 x s8 -> s32 natively.  This times both on
shapes matching the k=1024 steered front-end and checks exactness.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    from feature_detector_fast_tpu.utils import cache as _cache

    _cache.enable()

    import jax
    import jax.numpy as jnp

    K, P, N = 1024, 1922, 30 * 256
    rng = np.random.default_rng(0)
    feat = rng.integers(0, 128, (K, P), np.int8)
    wts = rng.integers(-1, 2, (P, N)).astype(np.int8)
    wts[:P // 2] *= 127  # mimic the 128-scaled hi rows (127 fits i8 both signs)

    fb = jnp.asarray(feat, jnp.bfloat16)
    wb = jnp.asarray(wts, jnp.bfloat16)
    fi = jnp.asarray(feat)
    wi = jnp.asarray(wts)

    def dot_bf16(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot_i8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    ROUNDS = 50

    def timeit(tag, f, a, b):
        import functools

        @functools.partial(jax.jit, static_argnums=(3,))
        def loop(a, b, zeros, r):
            def body(c, z):
                o = f(a ^ z if a.dtype == jnp.int8 else a + z.astype(a.dtype), b)
                return c + o.sum(dtype=jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0), zeros[:r])
            return c

        zeros = jnp.zeros(ROUNDS, jnp.int8)
        float(loop(a, b, zeros, ROUNDS))
        t0 = time.perf_counter()
        float(loop(a, b, zeros, ROUNDS))
        ms = (time.perf_counter() - t0) / ROUNDS * 1e3
        print(f"{tag}: {ms:.4f} ms", file=sys.stderr)
        return ms

    # exactness
    ref = feat.astype(np.int64) @ wts.astype(np.int64)
    got_i = np.asarray(dot_i8(fi, wi))
    got_b = np.asarray(dot_bf16(fb, wb)).astype(np.int64)
    print("i8 exact:", np.array_equal(ref, got_i),
          "bf16 exact:", np.array_equal(ref, got_b), file=sys.stderr)

    timeit("bf16", dot_bf16, fb, wb)
    timeit("int8", dot_i8, fi, wi)
    return 0


if __name__ == "__main__":
    sys.exit(main())
