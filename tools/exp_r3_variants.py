"""Experiment: round-3 kernel-variant A/B matrix (VERDICT #1/#2).

Times detect_words_padded (1080p golden frame, t=16 n=9, batch 64,
20-round on-device scans, median of 3) for flag-gated kernel variants,
all in ONE process (cross-process TPU timings jitter +-50%; in-process
scans agree ~2%):

  OFF:  sliced rolls / tile_h 96, 128   (--off)
  MT:   f32 halo window / separable nonmax / tile_h 128
  SA:   separable nonmax / sliced combo
  --land: final landing-config confirmation (sepnm+sliced, 64 vs 128)

Every variant is bit-exactness-checked on-device against its mode's
baseline before timing (rows beyond the true image height are zero in
all tilings, so the comparison runs on the unpadded row range).
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
    h = img.shape[0]
    batch = jnp.asarray(np.broadcast_to(img, (BATCH,) + img.shape).copy())

    # _PRE_HANDOFF (reusing the prefilter's cardinal biased sums in the
    # body) was measured NEUTRAL (off 0.1223 -> 0.1226, sliced 0.1186 ->
    # 0.1194) in the first sweep and the code path was removed.
    # Round-4 note: tile height is forced through TILE_H_OVERRIDE (which
    # beats the production per-mode selection in fast_pallas.tile_h_for);
    # the historical TILE_H entries below map onto it.
    DEFAULTS = dict(
        TILE_H_OVERRIDE=64,
        _SLICED_ROLLS=False,
        _SEP_NONMAX=False,
        _MT_WINDOW_DTYPE=jnp.int32,
    )

    def run_variant(tag: str, mode: NonmaxMode, flags: dict,
                    ref_words=None):
        saved = {k: getattr(fp, k) for k in DEFAULTS}
        for k, v in DEFAULTS.items():
            setattr(fp, k, v)
        for k, v in flags.items():
            setattr(fp, k, v)
        try:
            det = lambda im: fp.detect_words_padded(im, 16, 9, mode)

            # On-device bit-exactness vs the mode baseline (true rows).
            one = jax.jit(det)(batch[0])
            ok = True
            if ref_words is not None:
                ok = bool(jnp.array_equal(one[:h], ref_words[:h]))

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
            print(f"{tag}: {ms:.4f} ms/frame  (min {min(best):.4f})"
                  f"{'' if ok else '  *** MISMATCH ***'}",
                  file=sys.stderr, flush=True)
            return ms, one
        finally:
            for k, v in saved.items():
                setattr(fp, k, v)

    f32 = jnp.float32
    results = {}

    # --- OFF ---  (first sweep, 2026-08-20: base 0.1223 / slicedrolls
    # 0.1186 / prehandoff 0.1226 / sliced+pre 0.1194 / tile96 0.1210 /
    # tile128 0.1174 / tile128+micro 0.1163; all bit-exact)
    if "--off" in sys.argv:
        base_ms, base_w = run_variant("off-base", NonmaxMode.OFF, {})
        results["off-base"] = base_ms
        for tag, flags in [
            ("off-slicedrolls", dict(_SLICED_ROLLS=True)),
            ("off-tile96", dict(TILE_H_OVERRIDE=96)),
            ("off-tile128", dict(TILE_H_OVERRIDE=128)),
            ("off-tile128+sliced", dict(TILE_H_OVERRIDE=128, _SLICED_ROLLS=True)),
        ]:
            results[tag], _ = run_variant(tag, NonmaxMode.OFF, flags, base_w)

    # --- landing-config confirmation: sepnm+sliced (the winners), tile
    # 64 vs 128 per mode, one process ---
    if "--land" in sys.argv:
        LAND = dict(_SEP_NONMAX=True, _SLICED_ROLLS=True,
                    _MT_WINDOW_DTYPE=f32)
        for mode, mname in [(NonmaxMode.OFF, "off"),
                            (NonmaxMode.MAX_THRESHOLD, "mt"),
                            (NonmaxMode.SUM_ABSOLUTE, "sa")]:
            _, base_w = run_variant(f"{mname}-old", mode, {})
            for th in (64, 128):
                tag = f"{mname}-land{th}"
                results[tag], _ = run_variant(
                    tag, mode, dict(LAND, TILE_H_OVERRIDE=th), base_w)
        print("--- summary (ms/frame) ---", file=sys.stderr)
        for tag, ms in results.items():
            print(f"{tag}: {ms:.4f}", file=sys.stderr)
        return 0

    # --- MT ---
    base_ms, base_w = run_variant("mt-base", NonmaxMode.MAX_THRESHOLD, {})
    results["mt-base"] = base_ms
    for tag, flags in [
        ("mt-f32win", dict(_MT_WINDOW_DTYPE=f32)),
        ("mt-sepnm", dict(_SEP_NONMAX=True)),
        ("mt-f32+sepnm", dict(_MT_WINDOW_DTYPE=f32, _SEP_NONMAX=True)),
        ("mt-tile128", dict(TILE_H_OVERRIDE=128)),
        ("mt-tile128+all", dict(TILE_H_OVERRIDE=128, _MT_WINDOW_DTYPE=f32,
                                _SEP_NONMAX=True)),
    ]:
        results[tag], _ = run_variant(tag, NonmaxMode.MAX_THRESHOLD, flags,
                                      base_w)

    # --- SA ---
    base_ms, base_w = run_variant("sa-base", NonmaxMode.SUM_ABSOLUTE, {})
    results["sa-base"] = base_ms
    for tag, flags in [
        ("sa-sepnm", dict(_SEP_NONMAX=True)),
        ("sa-all", dict(_SEP_NONMAX=True, _SLICED_ROLLS=True)),
    ]:
        results[tag], _ = run_variant(tag, NonmaxMode.SUM_ABSOLUTE, flags,
                                      base_w)

    print("--- summary (ms/frame) ---", file=sys.stderr)
    for tag, ms in results.items():
        print(f"{tag}: {ms:.4f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
