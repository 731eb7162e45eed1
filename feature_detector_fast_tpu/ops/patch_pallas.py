"""Sparse per-keypoint patch extraction as a Pallas TPU kernel.

Steered (oriented) BRIEF cannot ride the dense descriptor kernel
(ops/brief_pallas.py): the sampling pattern differs per keypoint (30
quantized orientations), so dense per-pixel words would cost 30x.  The
sparse XLA gather of K x 512 rotated samples costs ~7-9 ms/frame at 1080p
on TPU — gathers of scattered scalars are the pathological case the rest
of this framework avoids (SURVEY.md §7: the reference's per-candidate
`_mm256_i32gather_epi32` trick, fast_simd.rs:133-197, has no efficient
TPU analogue).

The TPU-native shape of the problem: keypoint sampling = (structured
patch copy) + (fixed linear map).  This module does the copy — the fused
kernel holds a 2x-overlapped copy of the image VMEM-RESIDENT and slices
each keypoint's blur-halo window dynamically in VMEM (scalar-prefetched
coordinates; zero per-keypoint input DMAs), computes the 5x5 box blur on
the window, and emits an aligned (32, 128) window whose top-left 31x31
is the blurred patch with raw pixels in its spare high bits.  The linear
map (point-pair sampling, every orientation residual at once) then runs
as ONE int8 matmul on the MXU (models/brief.py::describe_patched) —
sampling becomes dense compute instead of scattered memory traffic.
A strip-DMA variant (one (96, 256) block fetch per keypoint) remains as
the fallback for images too large for VMEM residency, and
`extract_patches` (4 block DMAs per keypoint from an arbitrary plane)
as the general-plane utility.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast_pallas import LANES, _VMEM_LIMIT, _pad_to

#: Patch rows/cols actually consumed downstream (2 * PATCH_R + 1).
PATCH = 31
#: Rows per extracted window (patch rows 0..30 plus one slack row so the
#: window is a whole number of sublane tiles).
WIN_H = 32
#: Block height of the source plane grid; a 31-row patch plus its in-block
#: offset (< 32) always fits in two vertically adjacent blocks.
_BLK_H = 32

#: Keypoints handled per grid step of the strip-DMA kernels (each
#: keypoint needs its own input window operand(s), so specs scale with
#: this; input-DMA-bound, measured flat in group size).
_GROUP = 4
#: Keypoints per grid step of the VMEM-resident kernel: no input operands
#: scale with it, and fewer grid steps = fewer fixed-cost output DMAs —
#: measured 0.34 (group 4) -> 0.29 ms/frame (8) at 1080p/k=1024, flat
#: beyond.
_GROUP_RESIDENT = 8


def _roll_rows(win: jax.Array, dy) -> jax.Array:
    """out[r, :] = win[(r + dy) % rows, :] — dynamic sublane rotate."""
    return pltpu.roll(win, (-dy) % win.shape[0], axis=0)


def _roll_lanes(win: jax.Array, dx) -> jax.Array:
    """out[:, c] = win[:, (c + dx) % lanes] — dynamic lane rotate."""
    return pltpu.roll(win, (-dx) % win.shape[1], axis=1)


def _kernel(coords, *refs, group: int):
    ins = refs[: 4 * group]
    out = refs[4 * group]
    i = pl.program_id(0)
    for j in range(group):
        x = coords[0, group * i + j]
        y = coords[1, group * i + j]
        tl, tr, bl, br = (r[...].astype(jnp.int32) for r in ins[4 * j : 4 * j + 4])
        win = jnp.concatenate(
            [
                jnp.concatenate([tl, tr], axis=1),
                jnp.concatenate([bl, br], axis=1),
            ],
            axis=0,
        )  # (2*_BLK_H, 2*LANES): rows from 32*((y-15)//32), cols likewise
        win = _roll_rows(win, (y - PATCH // 2) % _BLK_H)
        win = _roll_lanes(win, (x - PATCH // 2) % LANES)
        out[j] = win[:WIN_H, :LANES]


#: Raw pixels ride bits [RAW_SHIFT, RAW_SHIFT+8) of the fused kernel's
#: packed output (blur5 sums are <= 25*255 = 6375 < 2**RAW_SHIFT).
RAW_SHIFT = 13


def _roll_cols_static(win: jax.Array, dx: int) -> jax.Array:
    """out[:, c] = win[:, (c + dx) % lanes] for a STATIC dx."""
    return pltpu.roll(win, (-dx) % win.shape[1], axis=1)


def _blur_pack(win: jax.Array, x) -> jax.Array:
    """Shared tail of the fused extraction kernels: from a (WIN_H+4, 256)
    i32 window whose row r is image row y-17+r (lanes covering the 128-
    aligned span around x), compute the packed blur5|raw<<RAW_SHIFT
    (WIN_H, LANES) output — the exactness-critical math lives ONCE here
    for both the strip-DMA and VMEM-resident kernels."""
    # win[r, c] = image[y - 17 + r, x - 17 + c] for c < 162.
    bv = sum(
        jax.lax.slice_in_dim(win, d, d + WIN_H, axis=0) for d in range(5)
    )  # vertical 5-sum centred at y - 15 + r
    # Raw patch rows share bv's alignment; pack them into bv's spare
    # high bits so ONE dynamic lane roll serves both planes.
    packed = bv | (
        jax.lax.slice_in_dim(win, 2, 2 + WIN_H, axis=0) << RAW_SHIFT
    )
    packed = _roll_lanes(packed, (x - PATCH // 2 - 2) % LANES)
    bvr = packed & ((1 << RAW_SHIFT) - 1)
    bh = sum(_roll_cols_static(bvr, d) for d in range(5))
    # bh[r, c] = blur5 at image (y - 15 + r, x - 15 + c); the raw
    # patch is two lanes further into the rolled window.
    raw = _roll_cols_static(packed, 2) & (255 << RAW_SHIFT)
    return bh[:, :LANES] | raw[:, :LANES]


def _fused_kernel(coords, *refs, group: int):
    ins = refs[:group]
    out = refs[group]
    i = pl.program_id(0)
    for j in range(group):
        x = coords[0, group * i + j]
        y = coords[1, group * i + j]
        # Dynamic-sliced sublane load: only the 48 rows the blur halo can
        # touch leave the (96, 256) strip (Mosaic needs the start 8-aligned
        # — pl.multiple_of — so an 8-residue row roll follows), and the
        # widen / roll / add work below runs on half the window.
        off = (y - PATCH // 2 - 2) % _BLK_H
        win = ins[j][pl.ds(pl.multiple_of(off & ~7, 8), 48), :]
        win = _roll_rows(win.astype(jnp.int32), off & 7)[: WIN_H + 4]
        out[j] = _blur_pack(win, x)


#: VMEM budget for the resident-source fused kernel: the 2x-overlapped
#: u8 column-plane stack must fit comfortably (double-buffered) under the
#: raised scoped-VMEM limit alongside the output pipeline.  1080p needs
#: ~4.7 MB, 4K ~17 MB; bigger sources fall back to the strip-DMA kernel.
_RESIDENT_BYTES_MAX = 32 * 1024 * 1024


def _fused_kernel_resident(coords, src, out, *, group: int):
    """Fused blur + patch extraction from a VMEM-RESIDENT source.

    ``src`` is the whole (n_cb, hp, 256) column-plane stack, loaded into
    VMEM once per frame (constant block index map — Pallas elides the
    copy across grid steps), so a keypoint's halo window is a dynamic
    in-VMEM slice: plane (x-17)//128, rows 8-aligned around y-17.  No
    per-keypoint input DMA at all — profiling showed the strip kernel was
    bound by per-DMA overhead (~0.4 us/keypoint even for contiguous
    24 KB blocks), not by bandwidth or the blur arithmetic."""
    i = pl.program_id(0)
    for j in range(group):
        x = coords[0, group * i + j]
        y = coords[1, group * i + j]
        y0 = y - PATCH // 2 - 2
        cb = (x - PATCH // 2 - 2) // LANES
        win = src[cb, pl.ds(pl.multiple_of((y0 // 8) * 8, 8), 48), :]
        win = _roll_rows(win.astype(jnp.int32), y0 & 7)[: WIN_H + 4]
        # win[r, c] = image[y - 17 + r, 128*cb + c]; the window's left edge
        # sits at lane (x - 17) % 128, exactly as in the strip kernel.
        out[j] = _blur_pack(win, x)


def _resident_planes(image: jax.Array) -> jax.Array:
    """(n_cb, hp, 2*LANES) u8 column-plane stack: plane c holds image
    columns [128c, 128c + 256) (second half from a shifted copy), rows
    padded so any 8-aligned 48-row slice around a valid keypoint is in
    bounds."""
    h, w = image.shape
    hp = _pad_to(h, _BLK_H) + 2 * _BLK_H
    wp = _pad_to(w, LANES)
    pad = jnp.pad(image, ((0, hp - h), (0, wp + LANES - w)))
    planes = [
        pad[:, d * LANES : d * LANES + wp].reshape(hp, wp // LANES, LANES)
        for d in range(2)
    ]
    return jnp.concatenate(planes, axis=2).transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnums=(2, 3))
def extract_windows_fused(
    image: jax.Array, xy: jax.Array, group: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fused blur + patch extraction with NO per-keypoint input DMA.

    ``group`` = keypoints per grid step; 0 picks the measured default for
    the chosen path (_GROUP_RESIDENT / _GROUP).

    Returns (K, WIN_H, LANES) i32 windows where
    ``out[k, r, c] = blur5(y_k-15+r, x_k-15+c) | raw(y_k-15+r, x_k-15+c) << 13``
    (valid for r, c < PATCH — the 32nd row/col is sublane-tile slack;
    blur5 = 25-pixel box SUM as in models.brief.box_blur5, identical to
    it at every cell a valid keypoint's pattern samples).  The 5x5 box
    blur runs on the small window in VMEM instead of densely over the
    frame, and raw pixels ride the blurred patch's spare high bits.

    Source layout (the part that matters on TPU): a 2x-overlapped u8
    column-plane stack (plane c = image columns [128c, 128c+256)) is held
    VMEM-RESIDENT across the whole grid — its block index map is
    constant, so Pallas loads it once per frame — and each keypoint's
    35x35 blur-halo window is a dynamic in-VMEM slice (plane (x-17)//128,
    8-aligned rows around y-17, then sublane/lane rolls).  Measured
    alternatives at 1080p/k=1024: one strided (96, 256) strip DMA per
    keypoint 0.45 ms/frame, the same DMA from a contiguous layout
    0.39 ms (per-DMA overhead, not bandwidth), VMEM-resident 0.21 ms.
    Sources too big for VMEM (above _RESIDENT_BYTES_MAX, ~4K+) fall back
    to the strip-DMA kernel (_fused_kernel).

    Requires an image at least 35 x 35; coordinates are clamped to the
    patch-safe interior as in :func:`extract_patches`.
    """
    h, w = image.shape
    k = xy.shape[0]
    if h < 2 * (PATCH // 2) + 5 or w < 2 * (PATCH // 2) + 5:
        raise ValueError(f"image too small for fused extraction: {h}x{w}")
    hp, wp = _pad_to(h, _BLK_H), _pad_to(w, LANES)
    n_cb = wp // LANES
    resident = n_cb * (hp + 2 * _BLK_H) * 2 * LANES <= _RESIDENT_BYTES_MAX
    if not group:
        group = _GROUP_RESIDENT if resident else _GROUP

    kp = _pad_to(k, group)
    margin = PATCH // 2 + 2
    x = jnp.clip(xy[:, 0], margin, w - margin - 1)
    y = jnp.clip(xy[:, 1], margin, h - margin - 1)
    # Coords ride SMEM as (2, K): a (K, 2) scalar-prefetch operand gets its
    # minor dim lane-padded 2 -> 128 in SMEM (K * 512 bytes), blowing the
    # 1 MB scoped-SMEM budget at K = 2048; (2, K) pads nothing that scales.
    coords = jnp.stack([x, y], axis=0).astype(jnp.int32)
    if kp != k:
        coords = jnp.concatenate(
            [coords, jnp.full((2, kp - k), margin, jnp.int32)], axis=1
        )
    # Materialize coords before the custom call: letting XLA fuse a
    # sort/gather producer (models/brief._block_sorted_feed) into the
    # scalar-prefetch operand crashed the TPU worker at large batch
    # (garbage SMEM coords -> wild block-index DMA); the barrier pins a
    # plain {1,0}-layout buffer.
    coords = jax.lax.optimization_barrier(coords)

    out_spec = pl.BlockSpec((group, WIN_H, LANES), lambda i, coords: (i, 0, 0))

    if resident:
        planes = _resident_planes(image)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(kp // group,),
            in_specs=[pl.BlockSpec(planes.shape, lambda i, coords: (0, 0, 0))],
            out_specs=out_spec,
        )
        out = pl.pallas_call(
            functools.partial(_fused_kernel_resident, group=group),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((kp, WIN_H, LANES), jnp.int32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            interpret=bool(interpret),
        )(coords, planes)
        return out[:k]

    pad = jnp.pad(image, ((0, hp + 2 * _BLK_H - h), (0, wp + LANES - w)))
    n_rb = hp // _BLK_H
    # Overlapped strips: 3 row-shifted copies interleaved per 32-row
    # group, then 2 col-shifted copies per 128-lane group.
    rows = jnp.concatenate(
        [
            pad[d * _BLK_H : d * _BLK_H + hp].reshape(n_rb, _BLK_H, -1)
            for d in range(3)
        ],
        axis=1,
    ).reshape(3 * hp, wp + LANES)
    strips = jnp.concatenate(
        [
            rows[:, d * LANES : d * LANES + wp].reshape(3 * hp, n_cb, LANES)
            for d in range(2)
        ],
        axis=2,
    ).reshape(3 * hp, 2 * wp)

    in_specs = []
    for j in range(group):

        def idx(i, coords, j=j):
            cx = coords[0, group * i + j]
            cy = coords[1, group * i + j]
            return ((cy - margin) // _BLK_H, (cx - margin) // LANES)

        in_specs.append(pl.BlockSpec((3 * _BLK_H, 2 * LANES), idx))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kp // group,),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    out = pl.pallas_call(
        functools.partial(_fused_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kp, WIN_H, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=bool(interpret),
    )(coords, *([strips] * group))
    return out[:k]


@functools.partial(jax.jit, static_argnums=(2, 3))
def extract_patches(
    plane: jax.Array, xy: jax.Array, group: int = _GROUP,
    interpret: bool = False,
) -> jax.Array:
    """(K, WIN_H, LANES) windows of ``plane`` around each keypoint.

    ``out[k, r, c] = plane[y_k - 15 + r, x_k - 15 + c]`` for r in [0, 32)
    and c in [0, 128) — the 31x31 patch sits in the top-left corner.
    Coordinates are clamped so every window is in-bounds; callers mask
    out-of-border keypoints via their validity bit as usual.

    ``plane`` may be any i32 image-shaped array (here: the 5x5-blurred
    image).  K is padded to a multiple of ``group`` internally.
    """
    h, w = plane.shape
    k = xy.shape[0]
    # Guard block on the right so col block (x-15)//128 + 1 always exists.
    hp, wp = _pad_to(h, _BLK_H) + _BLK_H, _pad_to(w, LANES) + LANES
    padded = jnp.pad(plane, ((0, hp - h), (0, wp - w)))

    kp = _pad_to(k, group)
    x = jnp.clip(xy[:, 0], PATCH // 2, w - PATCH // 2 - 1)
    y = jnp.clip(xy[:, 1], PATCH // 2, h - PATCH // 2 - 1)
    # (2, K) SMEM layout — see extract_windows_fused.
    coords = jnp.stack([x, y], axis=0).astype(jnp.int32)
    if kp != k:
        coords = jnp.concatenate(
            [coords, jnp.full((2, kp - k), PATCH // 2, jnp.int32)], axis=1
        )

    n_rb, n_cb = hp // _BLK_H, wp // LANES
    in_specs = []
    for j in range(group):
        for dr in (0, 1):
            for dc in (0, 1):

                def idx(i, coords, j=j, dr=dr, dc=dc):
                    cx = coords[0, group * i + j]
                    cy = coords[1, group * i + j]
                    r = jnp.clip((cy - PATCH // 2) // _BLK_H + dr, 0, n_rb - 1)
                    c = jnp.clip((cx - PATCH // 2) // LANES + dc, 0, n_cb - 1)
                    return (r, c)

                in_specs.append(pl.BlockSpec((_BLK_H, LANES), idx))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kp // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (group, WIN_H, LANES), lambda i, coords: (i, 0, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kp, WIN_H, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=bool(interpret),
    )(coords, *([padded] * (4 * group)))
    return out[:k]
