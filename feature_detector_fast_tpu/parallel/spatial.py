"""Spatial (row-tile) sharding of ONE frame's detection across devices.

SURVEY.md §5.7: the reference "scales" spatially by row-streaming with a
3-row rolling state (fast_simd.rs:322-342); the multi-device analogue
shards the image's ROWS over the mesh.  Each device runs the fused Pallas
detector on its row block; the only communication is a halo exchange —
two `ppermute`s of one TILE_H-row slab each way, covering the circle
radius (3) + nonmax (1) dependency rows — after which every border quirk
is evaluated in GLOBAL coordinates inside the kernel (the SMEM tile
offset of ops.fast_pallas.detect_dense_tiles), so the stitched result is
bit-identical to the single-device detector.

When to use (docs/DISTRIBUTED.md "Spatial sharding"): batch data
parallelism dominates whenever frames are plentiful — it moves zero
bytes.  Row sharding is for the latency-bound or VMEM/width-bound cases:
single-frame latency floors, or frames wider than 4096 px where the
packed-words kernel's lane budget runs out
(ops.fast_pallas.words_supported).

Granularity: each shard processes a TILE_H-multiple of rows (the Pallas
grid unit), so the padded height is ``n_devices * TILE_H * k`` — at 1080p
on 8 devices that is 1536 rows (42% padding, all-zero rows whose tiles
the prefilter skips); at 4K on 8 devices 2560 (19%); padding cost shrinks
as frames grow, which is exactly the regime spatial sharding is for.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import NonmaxMode
from ..ops import fast_pallas
from . import mesh as meshlib

TILE_H = fast_pallas.TILE_H


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnums=(1, 2, 3), static_argnames=("mesh", "interpret")
)
def detect_rows_sharded(
    image: jax.Array,
    threshold: int,
    count: int,
    nonmax: NonmaxMode,
    *,
    mesh: Mesh,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Single-frame detection with rows sharded over the mesh's data axis.

    Returns (mask bool (H, W), score u16 (H, W)), bit-identical to
    `ops.fast.detect_dense` / `ops.fast_pallas.detect_dense_pallas`
    (tests/test_spatial.py pins this on the 8-device CPU mesh).
    """
    nonmax = NonmaxMode(nonmax)
    h, w = image.shape
    n = mesh.shape[meshlib.DATA_AXIS]
    hp = _pad_to(h, n * TILE_H)
    wp = fast_pallas.padded_width(w)
    img = jnp.pad(image, ((0, hp - h), (0, wp - w)))
    rows_local = hp // n
    tiles_local = rows_local // TILE_H

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]

    def shard_body(blk):
        x = blk.reshape(rows_local, wp)
        # halo exchange: my last tile -> next shard's "prev"; my first
        # tile -> previous shard's "next".  At the global edges the
        # wrapped slab is unused garbage: the kernel masks every output
        # it could touch (non-interior rows).
        prev_tile = jax.lax.ppermute(x[-TILE_H:], meshlib.DATA_AXIS, fwd)
        next_tile = jax.lax.ppermute(x[:TILE_H], meshlib.DATA_AXIS, bwd)
        ext = jnp.concatenate([prev_tile, x, next_tile], axis=0)
        tile0 = jax.lax.axis_index(meshlib.DATA_AXIS) * tiles_local
        mask, score = fast_pallas.detect_dense_tiles(
            ext, tile0, threshold, count, nonmax,
            height=h, width=w, interpret=interpret,
        )
        return mask[None], score[None]

    mask, score = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=P(meshlib.DATA_AXIS, None, None),
        out_specs=P(meshlib.DATA_AXIS, None, None),
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        check_vma=False,
    )(img.reshape(n, rows_local, wp))
    mask = mask.reshape(hp, wp)[:h, :w]
    score = score.reshape(hp, wp)[:h, :w]
    return mask.astype(bool), score
