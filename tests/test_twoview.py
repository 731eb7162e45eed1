"""Two-view geometry on synthetic scenes with known ground truth."""

import jax
import numpy as np
import pytest

import pytest as _pytest


@_pytest.fixture(autouse=True)
def _x64(x64):
    """All tests in this module run under scoped float64 (see conftest.x64:
    a module-level global flip contaminated the whole session)."""
    yield

import jax.numpy as jnp

from feature_detector_fast_tpu.models import lie, twoview


def make_scene(rng, n=128, outliers=0, noise=0.0):
    """Random 3D points in front of two cameras with known relative pose."""
    X = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 10, n)
    ], axis=-1)
    w = rng.normal(0, 0.1, 3)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = rng.normal(0, 1, 3)
    t = t / np.linalg.norm(t) * 0.5
    Xb = X @ R.T + t
    pa = X[:, :2] / X[:, 2:3]
    pb = Xb[:, :2] / Xb[:, 2:3]
    if noise:
        pa = pa + rng.normal(0, noise, pa.shape)
        pb = pb + rng.normal(0, noise, pb.shape)
    idx = np.zeros(0, np.int64)
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        pb[idx] = rng.uniform(-0.5, 0.5, (outliers, 2))
    return X, R, t, pa, pb, idx


def test_eight_point_exact(rng):
    X, R, t, pa, pb, _ = make_scene(rng, n=8)
    E = twoview._eight_point(jnp.asarray(pa), jnp.asarray(pb))
    err = twoview.sampson_error(E, jnp.asarray(pa), jnp.asarray(pb))
    assert float(jnp.max(err)) < 1e-12


def test_ransac_with_outliers(rng):
    n = 128
    X, R, t, pa, pb, idx_out = make_scene(rng, n=n, outliers=40)
    valid = np.ones(n, bool)
    E, inl = twoview.ransac_essential(
        jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(valid),
        jax.random.PRNGKey(3), 256)
    inl = np.asarray(inl)
    # Every true correspondence recovered.  A uniform-random planted
    # outlier CAN legitimately land on the recovered epipolar line (an
    # epipolar constraint is 1-D: it does not pin the match), and RANSAC
    # correctly keeps such geometric coincidences — so bound their count
    # instead of forbidding them, and require every kept point to satisfy
    # the epipolar threshold (the actual RANSAC contract).
    true_mask = np.ones(n, bool)
    true_mask[idx_out] = False
    assert inl[true_mask].all()
    assert inl[idx_out].sum() <= 4, inl[idx_out].sum()
    err = np.asarray(twoview.sampson_error(E, jnp.asarray(pa), jnp.asarray(pb)))
    assert (err[inl] < 1e-4).all()


def test_recover_pose_direction(rng):
    n = 96
    X, R, t, pa, pb, _ = make_scene(rng, n=n)
    # true essential: E = [t]_x R
    tx = np.asarray(lie.hat(jnp.asarray(t)))
    E_true = tx @ R
    R_hat, t_hat, support = twoview.recover_pose(
        jnp.asarray(E_true), jnp.asarray(pa), jnp.asarray(pb),
        jnp.ones(n, bool))
    assert int(support) == n
    np.testing.assert_allclose(np.asarray(R_hat), R, atol=1e-6)
    t_dir = t / np.linalg.norm(t)
    np.testing.assert_allclose(np.asarray(t_hat), t_dir, atol=1e-6)


def test_triangulate_exact(rng):
    n = 64
    X, R, t, pa, pb, _ = make_scene(rng, n=n)
    Xh = twoview.triangulate(
        jnp.eye(3, dtype=jnp.float64), jnp.zeros(3, jnp.float64),
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(pa), jnp.asarray(pb))
    np.testing.assert_allclose(np.asarray(Xh), X, atol=1e-8)


def test_full_pipeline_pose_from_matches(rng):
    """RANSAC + recover_pose end-to-end with noise and outliers."""
    n = 200
    X, R, t, pa, pb, _ = make_scene(rng, n=n, outliers=50, noise=1e-4)
    E, inl = twoview.ransac_essential(
        jnp.asarray(pa), jnp.asarray(pb), jnp.ones(n, bool),
        jax.random.PRNGKey(11), 512, 1e-5)
    R_hat, t_hat, support = twoview.recover_pose(E, jnp.asarray(pa),
                                                 jnp.asarray(pb), inl)
    angle_err = np.degrees(np.linalg.norm(np.asarray(
        lie.so3_log(jnp.asarray(R.T) @ R_hat))))
    t_dir = t / np.linalg.norm(t)
    t_err = np.degrees(np.arccos(np.clip(np.dot(np.asarray(t_hat), t_dir), -1, 1)))
    assert angle_err < 0.5, angle_err
    assert t_err < 1.5, t_err  # linear 8-pt + noise: t-direction is the noise-sensitive part


def test_normalize_points():
    cam = twoview.Camera(500.0, 480.0, 320.0, 240.0)
    pts = jnp.asarray([[320.0, 240.0], [820.0, 720.0]])
    norm = np.asarray(twoview.normalize_points(pts, cam))
    np.testing.assert_allclose(norm, [[0, 0], [1.0, 1.0]], atol=1e-12)


def test_ray_depths_match_triangulation(rng):
    """ray_depths (round 4): on exact correspondences the closed-form ray
    depths equal the DLT triangulation's depths; cheirality signs agree
    for behind-camera points."""
    import jax.numpy as jnp

    n = 256
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(2, 9, n)], axis=-1)
    th = 0.2
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    t = np.array([0.7, 0.1, 0.05])
    Xb = X @ R.T + t
    pa = X[:, :2] / X[:, 2:]
    pb = Xb[:, :2] / Xb[:, 2:]

    za, zb = twoview.ray_depths(jnp.asarray(R), jnp.asarray(t),
                                jnp.asarray(pa), jnp.asarray(pb))
    np.testing.assert_allclose(np.asarray(za), X[:, 2], rtol=2e-4)
    np.testing.assert_allclose(np.asarray(zb), Xb[:, 2], rtol=2e-4)

    Xtri = twoview.triangulate(jnp.eye(3), jnp.zeros(3), jnp.asarray(R),
                               jnp.asarray(t), jnp.asarray(pa),
                               jnp.asarray(pb))
    np.testing.assert_allclose(np.asarray(za), np.asarray(Xtri)[:, 2],
                               rtol=2e-3)

    # behind-camera points must come out with negative ray depths
    za_n, zb_n = twoview.ray_depths(jnp.asarray(R), jnp.asarray(t),
                                    jnp.asarray(pa), jnp.asarray(pb))
    za_f, zb_f = twoview.ray_depths(jnp.asarray(R), jnp.asarray(-t),
                                    jnp.asarray(pa), jnp.asarray(pb))
    assert (np.asarray(za_n) > 0).mean() > 0.99
    assert (np.asarray(za_f) < 0).mean() > 0.9  # flipped baseline
