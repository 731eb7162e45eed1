"""Sliding-window BA: window construction, parallel refinement, stitching."""

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

from feature_detector_fast_tpu.models import ba, lie, windowed_ba
from feature_detector_fast_tpu.parallel import mesh as meshlib
from feature_detector_fast_tpu.utils.metrics import ate_rmse
from test_ba import make_ba_problem


def as_np(p):
    return (np.asarray(p.poses), np.asarray(p.points), np.asarray(p.obs_cam),
            np.asarray(p.obs_lm), np.asarray(p.obs_uv))


def test_build_windows_shapes_and_mapping(rng):
    gt_poses, gt_pts, p = make_ba_problem(rng, n_cams=9, n_pts=30)
    poses, points, oc, ol, uv = as_np(p)
    wb = windowed_ba.build_windows(poses, points, oc, ol, uv, window=4, stride=3)
    n_w = wb.poses.shape[0]
    assert wb.cam_global.shape == (n_w, 4)
    # windows cover all cameras
    assert set(wb.cam_global.ravel()) == set(range(9))
    # each window's obs reference local cams within range
    assert int(jnp.max(jnp.where(wb.obs_valid, wb.obs_cam, 0))) < 4
    # uv of a sample window slot maps back to the right global observation
    w0 = wb.cam_global[0]
    first_valid = int(np.argmax(np.asarray(wb.obs_valid[0])))
    c_local = int(np.asarray(wb.obs_cam[0])[first_valid])
    assert w0[c_local] in set(np.asarray(p.obs_cam))


def test_windowed_refinement_improves_ate(rng):
    gt_poses, gt_pts, p = make_ba_problem(rng, n_cams=9, n_pts=50,
                                          perturb=0.03)
    poses, points, oc, ol, uv = as_np(p)
    refined = windowed_ba.refine_trajectory_windowed(
        poses, points, oc, ol, uv, window=4, stride=3, iterations=8)
    ate_before = ate_rmse(poses[:, :3, 3], gt_poses[:, :3, 3])
    ate_after = ate_rmse(refined[:, :3, 3], gt_poses[:, :3, 3])
    assert ate_after < ate_before * 0.3, (ate_before, ate_after)


def test_windowed_sharded_matches_unsharded(rng):
    """Sharding changes float reduction order, and the optimizer's
    accept/reject guard can amplify tiny differences into visibly
    different (equally valid) local minima — so equivalence is judged on
    solution quality (ATE vs ground truth), not element-wise equality
    (SURVEY.md §7 v: distributed parity is ATE-bounded by design)."""
    gt_poses, gt_pts, p = make_ba_problem(rng, n_cams=9, n_pts=40,
                                          perturb=0.03)
    poses, points, oc, ol, uv = as_np(p)
    wb = windowed_ba.build_windows(poses, points, oc, ol, uv, 4, 3)
    mesh = meshlib.make_mesh()
    r1, _ = windowed_ba.refine_windows(wb, 6)
    r2, _ = windowed_ba.refine_windows(wb, 6, mesh=mesh)
    s1 = windowed_ba.stitch_windows(np.asarray(r1), wb.cam_global, 9)
    s2 = windowed_ba.stitch_windows(np.asarray(r2), wb.cam_global, 9)
    ate1 = ate_rmse(s1[:, :3, 3], gt_poses[:, :3, 3])
    ate2 = ate_rmse(s2[:, :3, 3], gt_poses[:, :3, 3])
    ate0 = ate_rmse(poses[:, :3, 3], gt_poses[:, :3, 3])
    assert ate1 < ate0 * 0.3 and ate2 < ate0 * 0.3, (ate0, ate1, ate2)
    assert abs(ate1 - ate2) < 0.2 * max(ate1, ate2) + 1e-9


def test_stitch_identity_consistency():
    """Stitching unperturbed windows of a consistent trajectory must
    reproduce it exactly."""
    rng = np.random.default_rng(1)
    poses = []
    T = np.eye(4)
    for k in range(7):
        import jax.numpy as jnp
        step = np.asarray(lie.se3_exp(jnp.asarray(rng.normal(0, 0.2, 6))))
        T = T @ step
        poses.append(T.copy())
    poses = np.stack(poses)
    cam_global = np.stack([np.arange(0, 4), np.arange(3, 7)])
    window_poses = np.stack([poses[c] for c in cam_global])
    out = windowed_ba.stitch_windows(window_poses, cam_global, 7)
    np.testing.assert_allclose(out, poses, atol=1e-10)
