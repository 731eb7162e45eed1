"""Deterministic synthetic-scene renderer for image-level SLAM evaluation.

Ray-casts a textured axis-aligned box ("room") from known ground-truth
camera poses, producing grayscale uint8 frames with abundant FAST-friendly
corners (random-intensity checker cells on every wall — high contrast,
non-repetitive, so BRIEF matching is unambiguous).  The scene is genuinely
3-D (five walls at different depths), avoiding the planar degeneracy of
essential-matrix estimation.

This is the repo's stand-in for a real monocular sequence (no dataset
ships with the repo): the full images -> detect -> describe -> match ->
pose pipeline runs on rendered frames and its trajectory is scored
against the exact poses used to render (tests/test_render_vo.py,
tools/run_slam_demo.py --render).  Pure numpy, fully vectorized, seeded.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from ..models import twoview


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 320
    height: int = 240
    fx: float = 260.0
    fy: float = 260.0
    # box extents (camera starts near the origin looking down +z)
    x_min: float = -4.0
    x_max: float = 4.0
    y_min: float = -2.5
    y_max: float = 2.5
    z_back: float = 24.0
    cell: float = 0.22  # checker cell size (world units)
    seed: int = 0

    @property
    def cx(self) -> float:
        return self.width / 2.0 - 0.5

    @property
    def cy(self) -> float:
        return self.height / 2.0 - 0.5

    def camera(self) -> twoview.Camera:
        return twoview.Camera(self.fx, self.fy, self.cx, self.cy)


def _hash2(a: np.ndarray, b: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic integer hash of two int arrays -> [0, 1) floats."""
    h = (
        a.astype(np.int64) * 73856093
        ^ b.astype(np.int64) * 19349663
        ^ np.int64(salt) * 83492791
    ) & 0x7FFFFFFF
    h = (h * 2654435761) & 0x7FFFFFFF
    return h.astype(np.float64) / float(0x80000000)


def _wall_texture(u: np.ndarray, v: np.ndarray, wall: int,
                  cfg: RenderConfig) -> np.ndarray:
    """Random-intensity checker texture: each cell gets a hashed gray
    level, giving strong, unique corners at every cell junction."""
    cu = np.floor(u / cfg.cell).astype(np.int64)
    cv = np.floor(v / cfg.cell).astype(np.int64)
    g = _hash2(cu, cv, wall * 7919 + cfg.seed * 104729)
    return (30.0 + 195.0 * g)


def render_frame(world_T_cam: np.ndarray, cfg: RenderConfig) -> np.ndarray:
    """Render one grayscale uint8 (H, W) frame from a world_T_cam pose."""
    h, w = cfg.height, cfg.width
    xs = (np.arange(w) - cfg.cx) / cfg.fx
    ys = (np.arange(h) - cfg.cy) / cfg.fy
    dx, dy = np.meshgrid(xs, ys)
    d_cam = np.stack([dx, dy, np.ones_like(dx)], axis=-1)  # (H, W, 3)
    R = world_T_cam[:3, :3]
    o = world_T_cam[:3, 3]
    d = d_cam @ R.T  # world-frame ray directions

    # five walls: (axis, plane value, outward condition, texture axes)
    walls = [
        (0, cfg.x_min, (1, 2)),  # left
        (0, cfg.x_max, (1, 2)),  # right
        (1, cfg.y_min, (0, 2)),  # ceiling
        (1, cfg.y_max, (0, 2)),  # floor
        (2, cfg.z_back, (0, 1)),  # back
    ]
    best_t = np.full((h, w), np.inf)
    img = np.zeros((h, w), np.float64)
    for wall_id, (axis, plane, (ua, va)) in enumerate(walls):
        da = d[..., axis]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (plane - o[axis]) / da
        p = o[None, None, :] + t[..., None] * d  # hit points
        # inside the box face (with tiny slack for the shared edges)
        eps = 1e-9
        lo = np.array([cfg.x_min, cfg.y_min, 0.0]) - eps
        hi = np.array([cfg.x_max, cfg.y_max, cfg.z_back]) + eps
        ok = (t > 1e-6) & np.isfinite(t)
        for ax in range(3):
            if ax != axis:
                ok &= (p[..., ax] >= lo[ax]) & (p[..., ax] <= hi[ax])
        closer = ok & (t < best_t)
        if closer.any():
            tex = _wall_texture(p[..., ua], p[..., va], wall_id, cfg)
            img = np.where(closer, tex, img)
            best_t = np.where(closer, t, best_t)
    return np.clip(img, 0, 255).astype(np.uint8)


def render_sequence(
    gt_poses: np.ndarray, cfg: RenderConfig = RenderConfig()
) -> List[np.ndarray]:
    """Render every world_T_cam pose of a trajectory to a frame list."""
    return [render_frame(T, cfg) for T in np.asarray(gt_poses)]


def demo_trajectory(n_frames: int, step: float = 0.35,
                    turn: float = 0.03) -> np.ndarray:
    """Ground-truth world_T_cam trajectory for rendered-sequence demos:
    forward motion down the box with gentle yaw and lateral sway (enough
    parallax on every wall for well-conditioned essential geometry)."""
    poses = [np.eye(4)]
    for k in range(n_frames - 1):
        c, s = np.cos(turn), np.sin(turn)
        rel = np.eye(4)
        rel[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        rel[:3, 3] = [0.06 * np.sin(0.9 * k), 0.03 * np.cos(1.3 * k), step]
        poses.append(poses[-1] @ rel)
    return np.stack(poses)
