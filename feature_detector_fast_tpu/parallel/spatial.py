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
from ..ops import compact, fast_pallas
from . import mesh as meshlib

TILE_H = fast_pallas.TILE_H_SHARD


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


@functools.partial(
    jax.jit, static_argnums=(1, 2, 3, 4), static_argnames=("mesh", "interpret")
)
def detect_compact_rows_sharded(
    image: jax.Array,
    threshold: int,
    count: int,
    nonmax: NonmaxMode,
    max_supers_local: int,
    *,
    mesh: Mesh,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Row-sharded detection ending in the KEYPOINT-LIST contract
    (lib.rs:56-64), not dense planes: each shard runs the packed-words
    kernel on its rows (detect_words_tiles — the dense mask never exists),
    compacts its OWN words into nonzero 256-px superwords on-device, and
    the per-shard encodings stitch order-preservingly.

    Compaction stays fully sharded: the top_k partial sort runs per shard
    over ns_local keys (n× smaller than the single-device sort), and only
    the capped (max_supers_local, 1 + SUPER_SPAN)-int32 encodings leave
    each shard — never an (H, W) plane.

    Shard s's superword indices are emitted in GLOBAL flat-word space
    (global superword = local + s*ns_local, exact because a shard's word
    count is a SUPER_SPAN multiple), so concatenating the shards'
    ascending encodings in shard order yields a globally ascending stream
    whose decode (ops.compact.expand_supers_host, width =
    padded_width(w)) is bit-identical — values AND row-major order — to
    the single-device `api` compaction.

    Returns (super_idx (n*cap,) i32 padded with the global superword-grid
    size, super_bits (n*cap, SUPER_SPAN) i32, n_points i32, n_supers_max
    i32 = max per-shard nonzero superword count; overflow iff
    n_supers_max > max_supers_local)."""
    nonmax = NonmaxMode(nonmax)
    h, w = image.shape
    n = mesh.shape[meshlib.DATA_AXIS]
    hp = _pad_to(h, n * TILE_H)
    wp = fast_pallas.padded_width(w)
    img = jnp.pad(image, ((0, hp - h), (0, wp - w)))
    rows_local = hp // n
    tiles_local = rows_local // TILE_H
    wpw = wp // 32
    words_local = rows_local * wpw
    assert words_local % compact.SUPER_SPAN == 0, words_local
    ns_local = words_local // compact.SUPER_SPAN
    ns_global = n * ns_local
    cap = int(max_supers_local)

    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]

    def shard_body(blk):
        x = blk.reshape(rows_local, wp)
        prev_tile = jax.lax.ppermute(x[-TILE_H:], meshlib.DATA_AXIS, fwd)
        next_tile = jax.lax.ppermute(x[:TILE_H], meshlib.DATA_AXIS, bwd)
        ext = jnp.concatenate([prev_tile, x, next_tile], axis=0)
        s = jax.lax.axis_index(meshlib.DATA_AXIS)
        words = fast_pallas.detect_words_tiles(
            ext, s * tiles_local, threshold, count, nonmax,
            height=h, width=w, interpret=interpret,
        )
        bits = words[:, :wpw].reshape(-1)
        n_pts = jax.lax.population_count(bits.view(jnp.uint32)).sum(
            dtype=jnp.int32)
        sidx, sbits, n_supers = compact._select_nonzero_supers(bits, cap)
        # local -> global superword index; padding -> the GLOBAL grid size
        gidx = jnp.where(sidx < ns_local, sidx + s * ns_local, ns_global)
        return (gidx[None], sbits[None], n_pts[None], n_supers[None])

    gidx, sbits, n_pts, n_sup = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=P(meshlib.DATA_AXIS, None, None),
        out_specs=(P(meshlib.DATA_AXIS), P(meshlib.DATA_AXIS, None),
                   P(meshlib.DATA_AXIS), P(meshlib.DATA_AXIS)),
        check_vma=False,
    )(img.reshape(n, rows_local, wp))
    return (
        gidx.reshape(n * cap),
        sbits.reshape(n * cap, compact.SUPER_SPAN),
        n_pts.sum(dtype=jnp.int32),
        n_sup.max(),
    )


def detect_arrays_rows_sharded(
    image,
    threshold: int = 16,
    count: int = 9,
    nonmax: NonmaxMode = NonmaxMode.OFF,
    *,
    mesh: Mesh,
    max_supers_local: int = 1 << 9,
    interpret: bool = False,
):
    """Row-sharded `api.detect_arrays`: (N, 2) uint32 (x, y) keypoints in
    row-major order, bit-identical to the single-device API.  The cap is
    per SHARD; on overflow it grows and detection reruns (keypoints are
    never dropped)."""
    import numpy as np

    from ..api import _grow_cap

    img = jnp.asarray(image)
    h, w = img.shape
    wp = fast_pallas.padded_width(w)
    n = mesh.shape[meshlib.DATA_AXIS]
    hp = _pad_to(h, n * TILE_H)
    max_cap = -(-(hp // n) * (wp // 32) // compact.SUPER_SPAN)
    cap = min(int(max_supers_local), max_cap)
    while True:
        gidx, sbits, n_pts, n_sup = detect_compact_rows_sharded(
            img, int(threshold), int(count), NonmaxMode(nonmax), cap,
            mesh=mesh, interpret=interpret,
        )
        n_sup = int(n_sup)
        if n_sup <= cap:
            return compact.expand_supers_host(
                np.asarray(gidx), np.asarray(sbits), int(n_pts), wp
            )
        cap = _grow_cap(cap, n_sup, max_cap)
