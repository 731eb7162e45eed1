"""Pose-graph optimization on synthetic graphs with known ground truth."""

import jax
import numpy as np
import pytest

#: Fast-lane exclusion (VERDICT r3 #7): this module is SLAM/distributed-
#: heavy; `pytest -m 'not slow'` skips it for kernel iteration.
pytestmark = pytest.mark.slow

import pytest as _pytest


@_pytest.fixture(autouse=True)
def _x64(x64):
    """All tests in this module run under scoped float64 (see conftest.x64:
    a module-level global flip contaminated the whole session)."""
    yield

import jax.numpy as jnp

from feature_detector_fast_tpu.models import lie, posegraph
from feature_detector_fast_tpu.utils.metrics import ate_rmse


def make_ring_graph(rng, n=12, odom_noise=0.05, loop_closure=True):
    """Ground-truth poses around a circle; noisy odometry edges + loop
    closures.  Returns (gt_poses, graph with noisy initial poses)."""
    gt = []
    for i in range(n):
        a = 2 * np.pi * i / n
        xi = np.array([np.cos(a) * 3, np.sin(a) * 3, 0.1 * np.sin(2 * a),
                       0, 0, a])
        gt.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
    gt = np.stack(gt)

    edges = []
    for i in range(n - 1):
        edges.append((i, i + 1))
    if loop_closure:
        edges.append((n - 1, 0))
        edges.append((0, n // 2))
    ei = np.array([e[0] for e in edges], np.int32)
    ej = np.array([e[1] for e in edges], np.int32)
    eT = []
    for i, j in edges:
        rel = np.linalg.inv(gt[i]) @ gt[j]
        noise = lie.se3_exp(jnp.asarray(rng.normal(0, odom_noise, 6) * 0.2))
        eT.append(rel @ np.asarray(noise))
    eT = np.stack(eT)

    # initial poses: integrate noisy odometry
    init = [gt[0]]
    for k in range(n - 1):
        init.append(init[-1] @ eT[k])
    init = np.stack(init)

    g = posegraph.PoseGraph(
        poses=jnp.asarray(init),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        edge_T=jnp.asarray(eT),
        edge_valid=jnp.ones(len(edges), bool),
        edge_weight=jnp.ones(len(edges), jnp.float64),
    )
    return gt, g


@pytest.mark.parametrize("solver", ["dense", "cg"])
def test_posegraph_converges(rng, solver):
    gt, g = make_ring_graph(rng, n=10, odom_noise=0.08)
    poses0 = np.asarray(g.poses)
    cost0 = float((np.asarray(posegraph.edge_residuals(g.poses, g)) ** 2).sum())
    poses, costs = posegraph.optimize(g, 15, solver, 100)
    cost1 = float(costs[-1])
    assert cost1 < cost0 * 0.05, (cost0, cost1)
    # optimized trajectory closer to ground truth than odometry integration
    ate_before = ate_rmse(poses0[:, :3, 3], gt[:, :3, 3])
    ate_after = ate_rmse(np.asarray(poses)[:, :3, 3], gt[:, :3, 3])
    assert ate_after < ate_before


def test_posegraph_perfect_edges_zero_cost(rng):
    gt, g = make_ring_graph(rng, n=8, odom_noise=0.0)
    poses, costs = posegraph.optimize(g, 8, "dense")
    assert float(costs[-1]) < 1e-16


def test_posegraph_invalid_edges_ignored(rng):
    gt, g = make_ring_graph(rng, n=8, odom_noise=0.05)
    # append garbage edges marked invalid — must not change the result
    e = len(np.asarray(g.edge_i))
    g2 = posegraph.PoseGraph(
        poses=g.poses,
        edge_i=jnp.concatenate([g.edge_i, jnp.asarray([2, 3], jnp.int32)]),
        edge_j=jnp.concatenate([g.edge_j, jnp.asarray([5, 1], jnp.int32)]),
        edge_T=jnp.concatenate([g.edge_T, jnp.stack([jnp.eye(4, dtype=jnp.float64)] * 2)]),
        edge_valid=jnp.concatenate([g.edge_valid, jnp.zeros(2, bool)]),
        edge_weight=jnp.concatenate([g.edge_weight, jnp.full(2, 1e6, jnp.float64)]),
    )
    p1, c1 = posegraph.optimize(g, 10, "dense")
    p2, c2 = posegraph.optimize(g2, 10, "dense")
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-10)


def test_gauge_pose0_fixed(rng):
    gt, g = make_ring_graph(rng, n=8, odom_noise=0.05)
    poses, _ = posegraph.optimize(g, 10, "dense")
    np.testing.assert_allclose(
        np.asarray(poses)[0], np.asarray(g.poses)[0], atol=1e-12
    )


def test_solve_scale_drift_recovers_random_walk(rng):
    """The linear drift solve must recover a random-walk log-scale drift
    (up to smoothing shrinkage) from noiseless relative observations."""
    import jax.numpy as jnp

    from feature_detector_fast_tpu.models import posegraph

    n = 20
    drift = np.cumsum(rng.normal(0, 0.1, n))
    drift -= drift[0]
    # dense exact relative observations between far-apart segments
    ci, cj, cl = [], [], []
    for i in range(n):
        for j in range(i + 5, n):
            ci.append(i)
            cj.append(j)
            cl.append(drift[i] - drift[j])
    x = np.asarray(posegraph.solve_scale_drift(
        n, jnp.asarray(ci, jnp.int32), jnp.asarray(cj, jnp.int32),
        jnp.asarray(np.array(cl)), jnp.ones(len(ci)),
    ))
    # gauge fixed at 0, shape recovered
    assert abs(x[0]) < 1e-3
    err = np.abs(x - drift)
    assert err.max() < 0.05, (x, drift)


def test_optimize_robust_rejects_outlier_edge(rng):
    """Geman-McClure IRLS: one wildly wrong loop edge must not tear a consistent
    chain apart (non-robust optimization visibly distorts it)."""
    import jax.numpy as jnp

    from feature_detector_fast_tpu.models import lie, posegraph

    n = 10
    poses = [np.eye(4)]
    rels = []
    for k in range(n - 1):
        xi = np.array([0.0, 0.0, 0.5, 0.0, 0.08, 0.0])
        rel = np.asarray(lie.se3_exp(jnp.asarray(xi)))
        rels.append(rel)
        poses.append(poses[-1] @ rel)
    poses = np.stack(poses)
    # outlier loop edge claiming frames 0 and 7 coincide with a flip
    bad = np.eye(4)
    bad[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0.0, 3.0, 0.0])))
    ei = list(range(n - 1)) + [0]
    ej = list(range(1, n)) + [7]
    eT = rels + [bad]
    g = posegraph.PoseGraph(
        poses=jnp.asarray(poses),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        edge_T=jnp.asarray(np.stack(eT), jnp.asarray(poses).dtype),
        edge_valid=jnp.ones(n, bool),
        edge_weight=jnp.ones(n, jnp.asarray(poses).dtype),
    )
    opt_rob, _ = posegraph.optimize(g, 30, "dense", robust_delta=0.2)
    move_rob = np.linalg.norm(np.asarray(opt_rob)[:, :3, 3] - poses[:, :3, 3],
                              axis=1).max()
    opt_raw, _ = posegraph.optimize(g, 30, "dense")
    move_raw = np.linalg.norm(np.asarray(opt_raw)[:, :3, 3] - poses[:, :3, 3],
                              axis=1).max()
    assert move_rob < 0.2, move_rob          # chain essentially preserved
    assert move_rob < 0.5 * move_raw, (move_rob, move_raw)


def test_rotation_average_recovers_drifted_rotations(rng):
    """rotation_average (round 4): absolute rotations with accumulated
    drift + a few loop constraints must be recovered to well under the
    drift level from clean relative rotations."""
    n = 24
    # ground-truth absolute rotations: smooth random walk
    gts = [np.eye(3)]
    for k in range(n - 1):
        gts.append(gts[-1] @ np.asarray(lie.so3_exp(
            jnp.asarray(rng.normal(0, 0.08, 3), jnp.float32))))
    gts = np.stack(gts).astype(np.float32)

    # drifted init: growing rotation error up to ~8 degrees
    init = gts.copy()
    for k in range(1, n):
        err = rng.normal(0, 0.05, 3) * (k / n)
        init[k] = np.asarray(lie.so3_exp(jnp.asarray(err, jnp.float32))) @ gts[k]

    # edges: consecutive + 4 long loops, exact relative rotations
    ei = list(range(n - 1)) + [0, 2, 5, 1]
    ej = list(range(1, n)) + [n - 1, n - 3, n - 2, n - 5]
    eR = np.stack([gts[i].T @ gts[j] for i, j in zip(ei, ej)])
    ew = np.ones(len(ei), np.float32)

    out = np.asarray(posegraph.rotation_average(
        jnp.asarray(init), jnp.asarray(ei, jnp.int32),
        jnp.asarray(ej, jnp.int32), jnp.asarray(eR), jnp.asarray(ew)))

    def errs(R):
        g0 = R[0] @ gts[0].T
        return np.array([
            np.degrees(np.arccos(np.clip(
                (np.trace(g0.T @ R[k] @ gts[k].T) - 1) / 2, -1, 1)))
            for k in range(n)
        ])

    before, after = errs(init), errs(out)
    assert np.median(before) > 1.0, np.median(before)
    assert after.max() < 0.35 * before.max(), (before.max(), after.max())
    assert np.median(after) < 0.3, np.median(after)


def test_rotation_average_robust_to_outlier_edge(rng):
    """A grossly wrong loop edge (90 deg off) must be suppressed by the
    Cauchy weighting instead of bending the solution."""
    n = 12
    gts = [np.eye(3, dtype=np.float32)]
    for k in range(n - 1):
        gts.append(gts[-1] @ np.asarray(lie.so3_exp(
            jnp.asarray(rng.normal(0, 0.1, 3), jnp.float32))))
    gts = np.stack(gts)
    ei = list(range(n - 1)) + [0, 0]
    ej = list(range(1, n)) + [n - 1, n // 2]
    eR = [gts[i].T @ gts[j] for i, j in zip(ei, ej)]
    # corrupt the last edge by a 90-degree rotation
    eR[-1] = eR[-1] @ np.asarray(lie.so3_exp(
        jnp.asarray([np.pi / 2, 0, 0], jnp.float32)))
    out = np.asarray(posegraph.rotation_average(
        jnp.asarray(gts), jnp.asarray(ei, jnp.int32),
        jnp.asarray(ej, jnp.int32), jnp.asarray(np.stack(eR)),
        jnp.ones(len(ei), jnp.float32)))
    g0 = out[0] @ gts[0].T
    errs = np.array([
        np.degrees(np.arccos(np.clip(
            (np.trace(g0.T @ out[k] @ gts[k].T) - 1) / 2, -1, 1)))
        for k in range(n)
    ])
    assert errs.max() < 2.0, errs
