"""Experiment: floor decomposition of the OFF kernel's fixed overhead.

Measures, in ONE process on the bench frame/protocol (batch 64, 20-round
on-device scan):

  xor-floor     loop body = (imgs ^ z).sum() — no pad, no kernel: the
                harness's own traffic floor
  pad-floor     + jnp.pad to (1088, 1920) — the entry-point pad pass
  pallas-1in    minimal pallas_call: ONE u8 block in, (64, 128) i32 out,
                2-op body — dispatch + single-stream DMA floor
  pallas-3in    same with the production halo triple (3 u8 blocks) —
                extra DMA cost of the 3-block window trick
  pallas-win    3 inputs + the full SWAR window build (concat, astype,
                shift, or, hb/cw) with a 2-op body — window-build cost
  trivial       production detect_words_padded with prefilter forced on
                and a 2-op body (reference point from exp_off_stages)
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import build_1080p_frame
    from feature_detector_fast_tpu.config import NonmaxMode
    from feature_detector_fast_tpu.ops import fast_pallas as fp

    BATCH, ROUNDS, REPS = 64, 20, 3
    TILE_H = fp.TILE_H

    img = build_1080p_frame()
    batch = jnp.asarray(np.broadcast_to(img, (BATCH,) + img.shape).copy())
    hp, wp = fp.padded_height(img.shape[0]), fp.padded_width(img.shape[1])
    n_tiles = hp // TILE_H

    def timeit(tag, frame_fn):
        @functools.partial(jax.jit, static_argnums=(2,))
        def loop(imgs, zeros, rounds):
            def body(c, z):
                w = jax.vmap(frame_fn)(imgs ^ z)
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

    timeit("xor-floor", lambda im: im.sum(dtype=jnp.int32)[None, None])

    def pad_floor(im):
        h, w = im.shape
        return jnp.pad(im, ((0, hp - h), (0, wp - w))).sum(
            dtype=jnp.int32)[None, None]
    timeit("pad-floor", pad_floor)

    def k1(img_ref, out_ref):
        out_ref[:, :] = (img_ref[:, :128] & 1).astype(jnp.int32)

    def pallas_1in(im):
        h, w = im.shape
        x = jnp.pad(im, ((0, hp - h), (0, wp - w)))
        return pl.pallas_call(
            k1, grid=(n_tiles,),
            in_specs=[pl.BlockSpec((TILE_H, wp), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((TILE_H, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((hp, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=fp._VMEM_LIMIT),
        )(x)
    timeit("pallas-1in", pallas_1in)

    def k3(p_ref, c_ref, n_ref, out_ref):
        out_ref[:, :] = ((p_ref[:, :128] ^ c_ref[:, :128] ^ n_ref[:, :128])
                         & 1).astype(jnp.int32)

    def pallas_3in(im):
        h, w = im.shape
        x = jnp.pad(im, ((0, hp - h), (0, wp - w)))
        clamp = lambda v: jnp.clip(v, 0, n_tiles - 1)
        return pl.pallas_call(
            k3, grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TILE_H, wp), lambda i: (clamp(i - 1), 0)),
                pl.BlockSpec((TILE_H, wp), lambda i: (i, 0)),
                pl.BlockSpec((TILE_H, wp), lambda i: (clamp(i + 1), 0)),
            ],
            out_specs=pl.BlockSpec((TILE_H, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((hp, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=fp._VMEM_LIMIT),
        )(x)
    timeit("pallas-3in", pallas_3in)

    def kwin(p_ref, c_ref, n_ref, out_ref):
        rw, cpw, hb, cw, _ = fp._swar_window_prefilter(
            p_ref, c_ref, n_ref, threshold=16, count=9, tile_h=TILE_H)
        out_ref[:, :] = ((hb[:, :128] ^ cw[:, :128]) & 1).astype(jnp.int32)

    def pallas_win(im):
        h, w = im.shape
        x = jnp.pad(im, ((0, hp - h), (0, wp - w)))
        clamp = lambda v: jnp.clip(v, 0, n_tiles - 1)
        return pl.pallas_call(
            kwin, grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TILE_H, wp), lambda i: (clamp(i - 1), 0)),
                pl.BlockSpec((TILE_H, wp), lambda i: (i, 0)),
                pl.BlockSpec((TILE_H, wp), lambda i: (clamp(i + 1), 0)),
            ],
            out_specs=pl.BlockSpec((TILE_H, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((hp, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=fp._VMEM_LIMIT),
        )(x)
    timeit("pallas-win", pallas_win)

    orig_body = fp._tile_keypoints_off_swar
    orig_pref = fp._swar_window_prefilter

    def forced_pref(*a, **k):
        rw, cpw, hb, cw, _ = orig_pref(*a, **k)
        return rw, cpw, hb, cw, cpw[0, 0] < 2**30

    def trivial_body(rw, hb, cw, *, i, count, height, width, tile_h):
        return jnp.concatenate([(hb & 1) != 0, (cw & 1) != 0], axis=0)

    fp._swar_window_prefilter = forced_pref
    fp._tile_keypoints_off_swar = trivial_body
    try:
        timeit("trivial", lambda im: fp.detect_words_padded(
            im, 16, 9, NonmaxMode.OFF))
    finally:
        fp._swar_window_prefilter = orig_pref
        fp._tile_keypoints_off_swar = orig_body
    return 0


if __name__ == "__main__":
    sys.exit(main())
