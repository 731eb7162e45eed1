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
    loop_pairs: Optional[List[Tuple[int, int, np.ndarray, np.ndarray, np.ndarray]]] = None,
    metrics: Optional[list] = None,
    ba_refine: bool = False,
    mesh=None,
) -> np.ndarray:
    """Geometric VO from per-pair normalized correspondences.

    pair_data[k] = (pa, pb, valid) for frames (k, k+1), already in
    normalized camera coordinates.  ``loop_pairs`` optionally adds
    non-consecutive constraints (i, j, pa, pb, valid) — loop closures —
    whose monocular scale is recovered against frame i's local depths
    (same median-depth trick as odometry chaining).  Returns (F, 4, 4)
    world_T_cam poses (frame 0 at identity), after pose-graph
    optimization.  ``metrics``, if given, is appended with one dict per
    pair (SURVEY.md §5.5 structured per-frame metrics).
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
        if metrics is not None:
            metrics.append({
                "pair": (k, k + 1),
                "matches": int(np.asarray(valid).sum()),
                "inliers": int(inl.sum()),
            })

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

    edge_i = list(range(n - 1))
    edge_j = list(range(1, n))
    edge_T = list(rels)
    edge_w = [1.0] * (n - 1)

    # Loop-closure edges: estimate relative pose (i -> j), recover its
    # monocular scale by comparing frame-i triangulated depths against the
    # odometry chain's frame-i depths (shared-coordinate median ratio).
    for (i, j, pa, pb, valid) in loop_pairs or []:
        key, sub = jax.random.split(key)
        R, t, inl, depths, X = estimate_pair(
            jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(valid), sub, config)
        if int(inl.sum()) < 16 or i >= len(pairs):
            continue
        ref = pairs[i]  # pair (i, i+1): depths in frame i at scale scales[i]
        ref_depths = {tuple(np.round(p, 5)): d * scales[i]
                      for p, d in zip(ref.inlier_pa, ref.depths_a)}
        ratios = []
        for p, d in zip(pa[inl], depths[inl]):
            dr = ref_depths.get(tuple(np.round(p, 5)))
            if dr is not None and d > 1e-6:
                ratios.append(dr / d)
        if len(ratios) < 8:
            continue
        s_loop = float(np.median(ratios))
        Tji = np.eye(4)
        Tji[:3, :3] = R
        Tji[:3, 3] = t * s_loop
        edge_i.append(i)
        edge_j.append(j)
        edge_T.append(np.linalg.inv(Tji))  # measured T_i^-1 T_j
        edge_w.append(1.0)
        if metrics is not None:
            metrics.append({
                "pair": (i, j), "loop_closure": True,
                "matches": int(np.asarray(valid).sum()),
                "inliers": int(inl.sum()), "scale": s_loop,
            })

    poses_j = jnp.asarray(poses)  # float32 unless x64 is enabled
    g = posegraph.PoseGraph(
        poses=poses_j,
        edge_i=jnp.asarray(edge_i, jnp.int32),
        edge_j=jnp.asarray(edge_j, jnp.int32),
        edge_T=jnp.asarray(np.stack(edge_T), poses_j.dtype),
        edge_valid=jnp.ones(len(edge_i), bool),
        edge_weight=jnp.asarray(edge_w, poses_j.dtype),
    )
    opt_poses, _ = posegraph.optimize(g, config.pose_graph_iters, "dense")
    result = np.asarray(opt_poses)
    if ba_refine:
        result = refine_with_ba(result, pairs, mesh=mesh)
    return result


def frontend_matches(
    frames: List[np.ndarray], config: VOConfig
) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Run the TPU front-end over a frame list; returns per-consecutive-
    pair (pa, pb, valid) in normalized camera coordinates.

    Batched: ONE dispatch detects+describes every frame, one vmapped
    dispatch matches all consecutive pairs — per-frame dispatches each pay
    a host round trip on remote-attached TPUs."""
    stack = jnp.asarray(np.stack(frames))
    kps, desc, dvalid = brief.detect_and_describe_batch(
        stack, config.threshold, config.count, config.max_keypoints
    )

    def pair_match(kxy_a, da, va, kxy_b, db, vb):
        m = match.match.__wrapped__(da, va, db, vb)
        pa, pb, ok = match.match_points(kxy_a, kxy_b, m)
        na = twoview.normalize_points(pa.astype(jnp.float32), config.camera)
        nb = twoview.normalize_points(pb.astype(jnp.float32), config.camera)
        return na, nb, ok

    na, nb, ok = jax.jit(jax.vmap(pair_match))(
        kps.xy[:-1], desc[:-1], dvalid[:-1],
        kps.xy[1:], desc[1:], dvalid[1:],
    )
    na, nb, ok = np.asarray(na), np.asarray(nb), np.asarray(ok)
    return [(na[k], nb[k], ok[k]) for k in range(len(frames) - 1)]


def propose_loop_closures(
    frames: List[np.ndarray],
    config: VOConfig,
    gap: int = 5,
    min_matches: int = 60,
) -> List[Tuple[int, int, np.ndarray, np.ndarray, np.ndarray]]:
    """Descriptor-based loop-closure candidates: match every frame pair
    at least ``gap`` apart (one MXU matmul each); pairs with enough mutual
    matches become candidate constraints for `run_vo_matches`."""
    feats = []
    for f in frames:
        kps, desc, dv = brief.detect_and_describe(
            jnp.asarray(f), config.threshold, config.count, config.max_keypoints
        )
        feats.append((kps, desc, dv))
    out = []
    for i in range(len(frames)):
        for j in range(i + gap, len(frames)):
            kps_a, da, va = feats[i]
            kps_b, db, vb = feats[j]
            m = match.match(da, va, db, vb)
            pa, pb, ok = match.match_points(kps_a.xy, kps_b.xy, m)
            if int(np.asarray(ok).sum()) < min_matches:
                continue
            na = twoview.normalize_points(jnp.asarray(pa, jnp.float32),
                                          config.camera)
            nb = twoview.normalize_points(jnp.asarray(pb, jnp.float32),
                                          config.camera)
            out.append((i, j, np.asarray(na), np.asarray(nb), np.asarray(ok)))
    return out


def run_vo_images(
    frames: List[np.ndarray],
    config: VOConfig,
    *,
    loop_closure_gap: Optional[int] = None,
    metrics: Optional[list] = None,
) -> np.ndarray:
    """Full pipeline: images -> trajectory (F, 4, 4); with
    ``loop_closure_gap`` set, distant frame pairs are matched and added as
    pose-graph constraints."""
    loops = (
        propose_loop_closures(frames, config, gap=loop_closure_gap)
        if loop_closure_gap
        else None
    )
    return run_vo_matches(
        frontend_matches(frames, config), config, loop_pairs=loops,
        metrics=metrics,
    )


def build_tracks(
    pairs: List[PairEstimate], min_len: int = 3
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Link pair-wise inlier correspondences into multi-frame tracks.

    Correspondences are joined through shared frames by (rounded)
    normalized coordinates — the same keying used for scale chaining.
    Returns flat observation arrays (obs_cam, obs_lm, obs_uv) for tracks
    observed in at least ``min_len`` frames.
    """
    track_of = {}  # (frame, rounded uv) -> track id
    obs = []  # (track, frame, uv)
    n_tracks = 0
    for k, pair in enumerate(pairs):
        for pa, pb in zip(pair.inlier_pa, pair.inlier_pb):
            ka = (k, tuple(np.round(pa, 5)))
            kb = (k + 1, tuple(np.round(pb, 5)))
            t = track_of.get(ka)
            if t is None:
                t = n_tracks
                n_tracks += 1
                track_of[ka] = t
                obs.append((t, k, pa))
            track_of[kb] = t
            obs.append((t, k + 1, pb))

    counts = np.zeros(n_tracks, np.int64)
    frames_seen = {}
    kept_obs = []
    for t, f, uv in obs:
        if (t, f) in frames_seen:
            continue
        frames_seen[(t, f)] = True
        kept_obs.append((t, f, uv))
        counts[t] += 1
    keep = counts >= min_len
    remap = -np.ones(n_tracks, np.int64)
    remap[keep] = np.arange(keep.sum())
    oc, ol, uv = [], [], []
    for t, f, p in kept_obs:
        if keep[t]:
            oc.append(f)
            ol.append(remap[t])
            uv.append(p)
    return (np.asarray(oc, np.int32), np.asarray(ol, np.int32),
            np.asarray(uv, np.float64).reshape(-1, 2))


def refine_with_ba(
    poses: np.ndarray,
    pairs: List[PairEstimate],
    iterations: int = 8,
    cg_iters: int = 30,
    mesh=None,
) -> np.ndarray:
    """Structure-from-motion refinement of a VO trajectory: build tracks,
    triangulate landmarks from the current poses, run Schur-complement BA
    (camera 0 gauge-fixed), return refined world_T_cam poses.

    With ``mesh``, the BA runs distributed: observations shard over the
    `data` axis and Schur reductions become psum collectives
    (parallel.ba_sharded) — the full-distributed-SLAM configuration."""
    from . import ba as ba_lib

    obs_cam, obs_lm, obs_uv = build_tracks(pairs)
    if obs_lm.size == 0:
        return poses
    n_lm = int(obs_lm.max()) + 1
    # world->camera extrinsics for BA
    w2c = np.linalg.inv(poses)

    # Triangulate each landmark from its WIDEST-baseline observation pair
    # (first/last frame): adjacent-frame baselines give noisy depths that
    # start BA in a terrible basin.
    first = np.full(n_lm, -1, np.int64)
    last = np.zeros(n_lm, np.int64)
    for o in range(len(obs_lm)):
        l = int(obs_lm[o])
        if first[l] < 0:
            first[l] = o
        last[l] = o
    a, b = first, last
    Ta = w2c[obs_cam[a]]
    Tb = w2c[obs_cam[b]]
    tri = jax.vmap(
        lambda Ra, ta, Rb, tb, ua, ub: twoview.triangulate(
            Ra, ta, Rb, tb, ua[None], ub[None]
        )[0]
    )
    pts = np.asarray(tri(
        jnp.asarray(Ta[:, :3, :3]), jnp.asarray(Ta[:, :3, 3]),
        jnp.asarray(Tb[:, :3, :3]), jnp.asarray(Tb[:, :3, 3]),
        jnp.asarray(obs_uv[a]), jnp.asarray(obs_uv[b]),
    ))

    # Cull tracks with non-positive depth or large initial reprojection
    # error in ANY observing camera — bad inits poison Gauss-Newton.
    Xc = np.einsum("oij,oj->oi", w2c[obs_cam][:, :3, :3], pts[obs_lm]) \
        + w2c[obs_cam][:, :3, 3]
    depth_ok = Xc[:, 2] > 1e-3
    proj = Xc[:, :2] / np.maximum(Xc[:, 2:3], 1e-9)
    err = np.linalg.norm(proj - obs_uv, axis=1)
    obs_ok = depth_ok & (err < 0.02)
    track_ok = np.ones(n_lm, bool)
    np.minimum.at(track_ok, obs_lm, obs_ok)
    valid = track_ok[obs_lm]

    problem = ba_lib.BAProblem(
        poses=jnp.asarray(w2c),
        points=jnp.asarray(pts),
        obs_cam=jnp.asarray(obs_cam),
        obs_lm=jnp.asarray(obs_lm),
        obs_uv=jnp.asarray(obs_uv),
        obs_valid=jnp.asarray(valid),
        # Only camera 0 is hard-fixed: pinning a second (noisy) camera
        # would anchor BA to its error.  The remaining scale gauge is a
        # damped null direction (monocular ATE is scale-aligned anyway).
        n_fixed_cams=1,
    )
    if mesh is not None:
        from ..parallel import ba_sharded

        new_w2c, _, costs = ba_sharded.optimize_sharded(
            problem, None, iterations, cg_iters, 1e-4, mesh=mesh
        )
    else:
        new_w2c, _, costs = ba_lib.optimize(problem, iterations, cg_iters,
                                            1e-4)
    return np.linalg.inv(np.asarray(new_w2c))


def evaluate_ate(
    est_poses: np.ndarray, gt_poses: np.ndarray
) -> float:
    """Scale-aligned ATE RMSE between world_T_cam trajectories."""
    return ate_rmse(est_poses[:, :3, 3], gt_poses[:, :3, 3], align=True,
                    with_scale=True)
