"""Resolution-scaling benchmark: chip-sustained FAST frames/s vs frame size.

The reference publishes one point (1080p on an i7-4770TE, README.md:54-65);
production serving cares how throughput scales with resolution — 480p
robotics streams to 4K film plates.  Same measurement protocol as bench.py
(device-resident batch, on-device lax.scan rounds, detect + score + nonmax
+ superword compaction per round, results reduced into the scan carry so
no round is dead code).

Usage: python tools/resolution_bench.py [mode]   (default: off)
Output: one JSON object per line on stdout; diagnostics on stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

RESOLUTIONS = [
    ("480p", 640, 480),
    ("720p", 1280, 720),
    ("1080p", 1920, 1080),
    ("1440p", 2560, 1440),
    ("4k", 3840, 2160),
]


def main() -> int:
    import jax
    import jax.numpy as jnp

    from feature_detector_fast_tpu.utils import cache as _cache

    _cache.enable()

    from bench import build_1080p_frame
    from feature_detector_fast_tpu import NonmaxMode
    from feature_detector_fast_tpu.api import _detect_compact_batch, tight_cap

    mode = NonmaxMode(sys.argv[1]) if len(sys.argv) > 1 else NonmaxMode.OFF
    base = build_1080p_frame()  # realistic corner statistics

    for name, w, h in RESOLUTIONS:
        reps_y = -(-h // base.shape[0])
        reps_x = -(-w // base.shape[1])
        frame = np.tile(base, (reps_y, reps_x))[:h, :w].copy()
        px = h * w
        # Keep the resident batch ~130 MP so HBM use stays flat across
        # resolutions; scan rounds amortize dispatch identically.
        batch = max(4, int(round(64 * (1920 * 1080) / px)))
        rounds = 10
        imgs = jax.device_put(
            np.broadcast_to(frame, (batch, h, w)).copy())
        zeros = jax.device_put(np.zeros(rounds, np.uint8))
        jax.block_until_ready((imgs, zeros))
        # Cap: measure true superword count once, then right-size.
        cap = 512
        while True:
            out = _detect_compact_batch(imgs[:1], 16, 9, mode, cap)
            n_sup = int(np.asarray(out[3]).max())
            if n_sup <= cap:
                break
            cap = max(cap * 4, n_sup)
        cap = tight_cap(n_sup)
        args = (16, 9, mode, cap)
        n_kp = int(np.asarray(out[2])[0])

        @functools.partial(jax.jit, static_argnums=(2,))
        def loop(ims, zs, r):
            def body(c, z):
                sidx, sbits, n, ns = _detect_compact_batch(ims ^ z, *args)
                return c + n.sum(dtype=jnp.int32) + ns.sum(dtype=jnp.int32) \
                    + sidx.sum(dtype=jnp.int32) + sbits.sum(dtype=jnp.int32), None
            c, _ = jax.lax.scan(body, jnp.int32(0), zs[:r])
            return c

        int(loop(imgs, zeros, rounds))
        t0 = time.perf_counter()
        int(loop(imgs, zeros, rounds))
        dt = (time.perf_counter() - t0) / rounds / batch
        print(
            f"{name}: {dt * 1e3:.3f} ms/frame = {1.0 / dt:.0f} f/s "
            f"({n_kp} keypoints, batch {batch}, cap {cap})",
            file=sys.stderr, flush=True,
        )
        print(json.dumps({
            "resolution": name, "width": w, "height": h,
            "mode": mode.value, "ms_per_frame": round(dt * 1e3, 3),
            "frames_per_sec": round(1.0 / dt, 1),
            "megapixels_per_sec": round(px / dt / 1e6, 1),
            "keypoints": n_kp,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
