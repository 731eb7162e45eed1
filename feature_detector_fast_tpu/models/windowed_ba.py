"""Sliding-window bundle adjustment with windows sharded over the mesh.

The SLAM analogue of sequence/context parallelism (SURVEY.md §5.7): the
"sequence" dimension is the keyframe trajectory.  A long trajectory is cut
into overlapping windows of W cameras; each window is an independent local
BA subproblem, so a BATCH of windows maps onto the `data` mesh axis and
refines in parallel (one vmapped, sharded BA program).  Overlapping
cameras are then stitched back into a consistent global trajectory by
anchoring each window at its first camera shared with the previous one.

Window extraction runs on host (ragged bookkeeping), producing
fixed-capacity batched problem arrays with validity bits — the usual
static-shape discipline.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel import mesh as meshlib
from . import ba as ba_lib


class WindowBatch(NamedTuple):
    """Batched fixed-capacity window subproblems (leading axis = window)."""

    poses: jax.Array  # (N, W, 4, 4)
    points: jax.Array  # (N, Lcap, 3)
    obs_cam: jax.Array  # (N, Ocap) local camera index
    obs_lm: jax.Array  # (N, Ocap) local landmark index
    obs_uv: jax.Array  # (N, Ocap, 2)
    obs_valid: jax.Array  # (N, Ocap)
    cam_global: np.ndarray  # (N, W) global camera index per slot (host)


def build_windows(
    poses: np.ndarray,
    points: np.ndarray,
    obs_cam: np.ndarray,
    obs_lm: np.ndarray,
    obs_uv: np.ndarray,
    window: int,
    stride: int,
) -> WindowBatch:
    """Cut a trajectory-wide BA problem into overlapping windows."""
    if stride > window:
        raise ValueError(
            f"stride ({stride}) > window ({window}) leaves cameras outside "
            "every window; stitch_windows requires full coverage"
        )
    n_cams = poses.shape[0]
    starts = list(range(0, max(n_cams - window, 0) + 1, stride))
    if starts and starts[-1] + window < n_cams:
        starts.append(n_cams - window)
    if not starts:
        starts = [0]

    sel_pts, sel_cam, sel_lm, sel_uv, sel_valid, cam_globals = [], [], [], [], [], []
    l_cap = 0
    o_cap = 0
    per_window = []
    for s in starts:
        cams = np.arange(s, min(s + window, n_cams))
        in_w = np.isin(obs_cam, cams)
        lms = np.unique(obs_lm[in_w])
        per_window.append((cams, lms, np.nonzero(in_w)[0]))
        l_cap = max(l_cap, len(lms))
        o_cap = max(o_cap, in_w.sum())

    for cams, lms, oidx in per_window:
        lmap = {g: i for i, g in enumerate(lms)}
        cmap = {g: i for i, g in enumerate(cams)}
        oc = np.array([cmap[c] for c in obs_cam[oidx]], np.int32)
        ol = np.array([lmap[l] for l in obs_lm[oidx]], np.int32)
        pad_o = o_cap - len(oidx)
        sel_cam.append(np.pad(oc, (0, pad_o)))
        sel_lm.append(np.pad(ol, (0, pad_o)))
        sel_uv.append(np.pad(obs_uv[oidx], ((0, pad_o), (0, 0))))
        sel_valid.append(np.pad(np.ones(len(oidx), bool), (0, pad_o)))
        pts = points[lms]
        sel_pts.append(np.pad(pts, ((0, l_cap - len(lms)), (0, 0))))
        cam_globals.append(cams)

    w_poses = np.stack([poses[c] for c in cam_globals])
    return WindowBatch(
        poses=jnp.asarray(w_poses),
        points=jnp.asarray(np.stack(sel_pts)),
        obs_cam=jnp.asarray(np.stack(sel_cam)),
        obs_lm=jnp.asarray(np.stack(sel_lm)),
        obs_uv=jnp.asarray(np.stack(sel_uv)),
        obs_valid=jnp.asarray(np.stack(sel_valid)),
        cam_global=np.stack(cam_globals),
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3), static_argnames=("mesh",))
def refine_windows(
    wb: WindowBatch,
    iterations: int = 6,
    cg_iters: int = 20,
    damping: float = 1e-6,
    *,
    mesh: Optional[Mesh] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Run local BA on every window in parallel.  With a mesh, the window
    axis is sharded over `data` (sequence parallelism); each window's
    first camera is its gauge anchor."""

    def one(poses, points, oc, ol, uv, valid):
        p = ba_lib.BAProblem(poses, points, oc, ol, uv, valid, n_fixed_cams=1)
        new_poses, new_points, _ = ba_lib.optimize.__wrapped__(
            p, iterations, cg_iters, damping
        )
        return new_poses, new_points

    args = (wb.poses, wb.points, wb.obs_cam, wb.obs_lm, wb.obs_uv, wb.obs_valid)
    if mesh is not None:
        shard = NamedSharding(mesh, P(meshlib.DATA_AXIS))
        args = tuple(jax.lax.with_sharding_constraint(a, shard) for a in args)
    return jax.vmap(one)(*args)


def stitch_windows(
    refined_poses: np.ndarray, cam_global: np.ndarray, n_cams: int
) -> np.ndarray:
    """Compose window-local refinements into a global trajectory.

    Window 0 defines the global frame.  Each later window is aligned to
    the running estimate at its first camera (rigid anchor), then its
    remaining cameras overwrite the running estimate — later (better
    locally refined) windows win on overlaps.
    """
    refined_poses = np.asarray(refined_poses)
    out = [None] * n_cams
    for w in range(refined_poses.shape[0]):
        cams = cam_global[w]
        local = refined_poses[w]
        anchor_global = None
        for i, c in enumerate(cams):
            if out[c] is not None:
                anchor_global = out[c] @ np.linalg.inv(local[i])
                break
        if anchor_global is None:
            anchor_global = np.eye(4)
        for i, c in enumerate(cams):
            out[c] = anchor_global @ local[i]
    return np.stack(out)


def refine_trajectory_windowed(
    poses: np.ndarray,
    points: np.ndarray,
    obs_cam: np.ndarray,
    obs_lm: np.ndarray,
    obs_uv: np.ndarray,
    window: int = 5,
    stride: int = 3,
    iterations: int = 6,
    mesh: Optional[Mesh] = None,
) -> np.ndarray:
    """End-to-end windowed refinement: build -> parallel refine -> stitch."""
    wb = build_windows(poses, points, obs_cam, obs_lm, obs_uv, window, stride)
    new_poses, _ = refine_windows(wb, iterations, mesh=mesh)
    return stitch_windows(np.asarray(new_poses), wb.cam_global, poses.shape[0])
