"""Dense BRIEF-256 description as a fused Pallas TPU kernel.

The sparse BRIEF sampler (models/brief.py::describe) gathers K*512
scattered scalars from the blurred image — on TPU that one gather costs
~7.5 ms/frame at 1080p, 25x the FAST detector itself.  The TPU-native
formulation turns the gather inside out, exactly like the detector turned
the reference's pixel gathers into shifted tile reads (SURVEY.md §7):
compute every pixel's descriptor densely — each of the 256 pattern
comparisons is `blur[p + o1] < blur[p + o2]`, i.e. a compare of two
STATICALLY-shifted views of the blurred tile — pack the bits into 8 i32
word planes in VMEM, and gather only the K keypoints' word rows at the
end (K*8 scalars instead of K*512 samples).

The 5x5 box blur fuses into the same kernel pass (plain separable sums;
models/brief.box_blur5's edge replication only differs within 2 px of the
image border, and every VALID keypoint's samples stay >= 3 px inside —
border keypoints carry invalid descriptors in both paths).  Lane-roll
wraparound likewise only pollutes pixels closer than BORDER to the
lateral edges, which are invalid by the same rule.  Descriptors are
bit-identical to the sparse path at every valid slot
(tests/test_brief_pallas.py).

Column shifts are shared across pattern endpoints (<= 31 distinct dx
values serve all 512 endpoints), mirroring the detector's _RolledWindow.
VMEM: the rolled-blur cache peaks at ~15 MB at width 1920 — within the
raised per-kernel budget (fast_pallas._VMEM_LIMIT).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.brief import BITS, PATCH_R, PATTERN, WORDS
from .fast_pallas import LANES, _VMEM_LIMIT, _i32c, _pad_to, _roll_cols

#: Tile height; the halo must fit in one neighbour tile (PATCH_R + 2 <= 32).
TILE_H = 32
_HALO = PATCH_R + 2  # pattern reach + blur radius = 17


def _kernel(img_prev, img_cur, img_next, *word_outs, tile_h: int):
    wp = img_cur.shape[1]
    window = jnp.concatenate(
        [
            img_prev[tile_h - _HALO :, :],
            img_cur[:, :],
            img_next[:_HALO, :],
        ],
        axis=0,
    ).astype(jnp.int32)  # (tile_h + 34, wp)

    # 5x5 box sum, separable.  bv[i] = vertical sum at window row i+2;
    # valid for i in [0, tile_h + 30): exactly rows tile_start - 15 ..
    # tile_start + tile_h + 14, the pattern reach of this tile's rows.
    rows_v = tile_h + 2 * _HALO - 4
    bv = sum(
        jax.lax.slice_in_dim(window, d, d + rows_v, axis=0) for d in range(5)
    )
    bh = sum(_roll_cols(bv, dx) for dx in range(-2, 3))  # blur5, lane-wrapped

    # Shared lane rolls of the blurred plane: <= 31 distinct dx values
    # serve all 512 pattern endpoints.
    rolled = {0: bh}

    def tap(dx: int, dy: int) -> jax.Array:
        if dx not in rolled:
            rolled[dx] = _roll_cols(bh, dx)
        # blur at image row (tile_start + r + dy) = bh row (r + 15 + dy).
        return jax.lax.slice_in_dim(
            rolled[dx], PATCH_R + dy, PATCH_R + dy + tile_h, axis=0
        )

    for j in range(WORDS):
        word = jnp.zeros((tile_h, wp), jnp.int32)
        for b in range(32):
            (x1, y1), (x2, y2) = PATTERN[32 * j + b]
            bit = tap(int(x1), int(y1)) < tap(int(x2), int(y2))
            word = word | jnp.where(bit, jnp.int32(_i32c(1 << b)), 0)
        word_outs[j][:, :] = word


def describe_words_padded(
    image: jax.Array, interpret: bool = False
) -> Tuple[jax.Array, ...]:
    """Dense BRIEF words for EVERY pixel: returns WORDS arrays of
    (hp, wp) int32 — plane j holds descriptor word j of the pixel at that
    position.  Values are meaningful for pixels >= BORDER from the true
    image edge (everything a valid keypoint can touch); elsewhere
    blur-halo wraparound makes them garbage, matching the sparse path's
    invalid-slot contract."""
    h, w = image.shape
    hp, wp = _pad_to(h, TILE_H), _pad_to(w, LANES)
    img = jnp.pad(image, ((0, hp - h), (0, wp - w)))
    n_tiles = hp // TILE_H

    kernel = functools.partial(_kernel, tile_h=TILE_H)
    clamp = lambda v: jnp.clip(v, 0, n_tiles - 1)
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_H, wp), lambda i: (clamp(i - 1), 0)),
            pl.BlockSpec((TILE_H, wp), lambda i: (i, 0)),
            pl.BlockSpec((TILE_H, wp), lambda i: (clamp(i + 1), 0)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, wp), lambda i: (i, 0)) for _ in range(WORDS)
        ],
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.int32)] * WORDS,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=bool(interpret),
    )(img, img, img)
    return tuple(outs)


def gather_descriptors(
    word_planes: Tuple[jax.Array, ...], xy: jax.Array, valid: jax.Array
) -> jax.Array:
    """(K, WORDS) uint32 descriptors at keypoint positions (8 small
    gathers of K scalars each)."""
    x = jnp.where(valid, xy[:, 0], 0)
    y = jnp.where(valid, xy[:, 1], 0)
    return jnp.stack(
        [p[y, x].view(jnp.uint32) for p in word_planes], axis=-1
    )
