"""Monocular visual-odometry / SLAM pipeline (BASELINE.json config[3]).

Composition of the framework's layers into a trajectory estimator:

    frames -> detect+describe (FAST+BRIEF, fused TPU front-end)
           -> match consecutive pairs (MXU Hamming)
           -> essential-matrix RANSAC -> relative pose (unit baseline)
           -> triangulation + median-depth scale chaining (monocular
              scale propagation between consecutive pairs)
           -> pose-graph optimization over the chained odometry
           -> optional windowed bundle adjustment refinement

Two entry layers:
  * `run_vo_images`: full image pipeline (uses the TPU front-end),
  * `run_vo_matches`: from per-pair correspondence arrays — the geometric
    back half, testable against synthetic ground truth without rendering.

Monocular scale is unobservable; trajectories are evaluated with
scale-aligned ATE (utils.metrics.ate_rmse(with_scale=True), the TUM
monocular convention).
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.metrics import ate_rmse
from . import ba as ba_lib
from . import brief, lie, match, posegraph, twoview


@dataclasses.dataclass(frozen=True)
class VOConfig:
    threshold: int = 16
    count: int = 9
    max_keypoints: int = 512
    camera: twoview.Camera = twoview.Camera(300.0, 300.0, 160.0, 120.0)
    ransac_hypotheses: int = 256
    ransac_threshold: float = 1e-4
    pose_graph_iters: int = 10
    seed: int = 0


class PairEstimate(NamedTuple):
    """Relative pose estimate between consecutive frames a -> b.

    Convention: x_b = R x_a + t_unit * scale (camera-frame), so
    cam_b_T_cam_a = [R | t * scale].
    """

    R: np.ndarray
    t_unit: np.ndarray
    scale: float
    n_inliers: int
    depths_a: np.ndarray  # per-inlier depth of the triangulated point in a
    inlier_pa: np.ndarray  # (N, 2) normalized coords in frame a
    inlier_pb: np.ndarray


def estimate_pair(
    pa: jax.Array, pb: jax.Array, valid: jax.Array, key, config: VOConfig
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Essential RANSAC + pose recovery + triangulation for one pair of
    normalized correspondence sets.  Returns (R, t_unit, inlier mask,
    depths in frame a, 3D points in frame a)."""
    E, inl = twoview.ransac_essential(
        pa, pb, valid, key, config.ransac_hypotheses, config.ransac_threshold
    )
    R, t, _ = twoview.recover_pose(E, pa, pb, inl)
    eye = jnp.eye(3, dtype=pa.dtype)
    zero = jnp.zeros(3, dtype=pa.dtype)
    X = twoview.triangulate(eye, zero, R, t, pa, pb)
    return (
        np.asarray(R),
        np.asarray(t),
        np.asarray(inl),
        np.asarray(X[..., 2]),
        np.asarray(X),
    )


def _chain_scales(pairs: List[PairEstimate]) -> List[float]:
    """Propagate monocular scale between consecutive pair estimates by
    comparing depths of points matched through the shared frame.

    Pair k triangulates in frame k's camera; pair k+1 triangulates in
    frame k+1's camera.  A point seen in both pairs has depth d_k (in
    frame k) and d_{k+1}; transported through pair k's pose its frame-k+1
    depth is known up to pair k's scale, so the ratio of medians fixes
    pair k+1's scale relative to pair k.  First pair defines scale 1.
    """
    scales = [1.0]
    for k in range(1, len(pairs)):
        prev, cur = pairs[k - 1], pairs[k]
        # points of prev seen in frame k (target of prev) with coordinates
        # prev transported: depth in frame k = (R_prev X + t_prev)_z * s_prev
        # match by normalized coordinates in the shared frame.
        prev_in_shared = {tuple(np.round(p, 5)): d for p, d in zip(
            prev.inlier_pb, _transported_depths(prev))}
        ratios = []
        for p, d_cur in zip(cur.inlier_pa, cur.depths_a):
            keyp = tuple(np.round(p, 5))
            d_prev = prev_in_shared.get(keyp)
            if d_prev is not None and d_cur > 1e-6 and d_prev > 1e-6:
                ratios.append(d_prev / d_cur)
        s = scales[k - 1] * (float(np.median(ratios)) if ratios else 1.0)
        scales.append(s)
    return scales


def _transported_depths(pair: PairEstimate) -> np.ndarray:
    """Depths of pair's triangulated points expressed in the TARGET frame
    (frame b), at the pair's own (unit-baseline) scale."""
    X = np.stack(
        [pair.inlier_pa[:, 0] * pair.depths_a,
         pair.inlier_pa[:, 1] * pair.depths_a,
         pair.depths_a], axis=-1)
    Xb = X @ pair.R.T + pair.t_unit
    return Xb[:, 2]


def run_vo_matches(
    pair_data: List[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    config: VOConfig,
) -> np.ndarray:
    """Geometric VO from per-pair normalized correspondences.

    pair_data[k] = (pa, pb, valid) for frames (k, k+1), already in
    normalized camera coordinates.  Returns (F, 4, 4) world_T_cam poses
    (frame 0 at identity), after pose-graph smoothing.
    """
    key = jax.random.PRNGKey(config.seed)
    pairs: List[PairEstimate] = []
    for k, (pa, pb, valid) in enumerate(pair_data):
        key, sub = jax.random.split(key)
        R, t, inl, depths, X = estimate_pair(
            jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(valid), sub, config
        )
        pairs.append(PairEstimate(
            R, t, 1.0, int(inl.sum()), depths[inl], pa[inl], pb[inl]))

    scales = _chain_scales(pairs)

    # integrate odometry: world frame = camera 0
    # cam_{k+1}_T_cam_k = [R | s t]; world_T_cam_{k+1} =
    #     world_T_cam_k @ inv(cam_{k+1}_T_cam_k)
    n = len(pairs) + 1
    poses = [np.eye(4)]
    rels = []
    for k, (pair, s) in enumerate(zip(pairs, scales)):
        Tba = np.eye(4)
        Tba[:3, :3] = pair.R
        Tba[:3, 3] = pair.t_unit * s
        rel = np.linalg.inv(Tba)  # cam_k_T_cam_{k+1}
        rels.append(rel)
        poses.append(poses[-1] @ rel)
    poses = np.stack(poses)

    # pose-graph smoothing over the chained odometry (adds value once
    # loop closures / extra edges exist; kept for pipeline completeness)
    g = posegraph.PoseGraph(
        poses=jnp.asarray(poses),
        edge_i=jnp.arange(n - 1, dtype=jnp.int32),
        edge_j=jnp.arange(1, n, dtype=jnp.int32),
        edge_T=jnp.asarray(np.stack(rels)),
        edge_valid=jnp.ones(n - 1, bool),
        edge_weight=jnp.ones(n - 1, poses.dtype),
    )
    opt_poses, _ = posegraph.optimize(g, config.pose_graph_iters, "dense")
    return np.asarray(opt_poses)


def frontend_matches(
    frames: List[np.ndarray], config: VOConfig
) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Run the TPU front-end over a frame list; returns per-consecutive-
    pair (pa, pb, valid) in normalized camera coordinates."""
    feats = []
    for f in frames:
        kps, desc, dv = brief.detect_and_describe(
            jnp.asarray(f), config.threshold, config.count, config.max_keypoints
        )
        feats.append((kps, desc, dv))
    out = []
    for k in range(len(frames) - 1):
        kps_a, da, va = feats[k]
        kps_b, db, vb = feats[k + 1]
        m = match.match(da, va, db, vb)
        pa, pb, ok = match.match_points(kps_a.xy, kps_b.xy, m)
        na = twoview.normalize_points(
            jnp.asarray(pa, jnp.float32), config.camera)
        nb = twoview.normalize_points(
            jnp.asarray(pb, jnp.float32), config.camera)
        out.append((np.asarray(na), np.asarray(nb), np.asarray(ok)))
    return out


def run_vo_images(frames: List[np.ndarray], config: VOConfig) -> np.ndarray:
    """Full pipeline: images -> trajectory (F, 4, 4)."""
    return run_vo_matches(frontend_matches(frames, config), config)


def evaluate_ate(
    est_poses: np.ndarray, gt_poses: np.ndarray
) -> float:
    """Scale-aligned ATE RMSE between world_T_cam trajectories."""
    return ate_rmse(est_poses[:, :3, 3], gt_poses[:, :3, 3], align=True,
                    with_scale=True)
