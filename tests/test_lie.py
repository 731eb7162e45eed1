"""SO(3)/SE(3) round-trip and group-law tests (float64 on CPU)."""

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

from feature_detector_fast_tpu.models import lie


def rand_xi(rng, scale=1.0):
    """Random tangent with rotation magnitude exactly min(scale, 3.0) —
    |phi| must stay below pi for log(exp(xi)) == xi (principal branch)."""
    xi = rng.normal(0, 1, 6)
    xi[:3] *= scale
    xi[3:] *= min(scale, 3.0) / np.linalg.norm(xi[3:])
    return jnp.asarray(xi, jnp.float64)


def test_so3_exp_log_roundtrip(rng):
    for scale in (1e-6, 1e-3, 0.5, 2.0, 3.0):
        w = jnp.asarray(rng.normal(0, 1, 3), jnp.float64)
        w = w / jnp.linalg.norm(w) * scale
        R = lie.so3_exp(w)
        # orthonormality
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-9)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-9)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    for scale in (1e-6, 1e-2, 1.0, 2.5):
        xi = rand_xi(rng, scale)
        T = lie.se3_exp(xi)
        xi2 = lie.se3_log(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-6)


def test_se3_inverse_compose(rng):
    A = lie.se3_exp(rand_xi(rng))
    B = lie.se3_exp(rand_xi(rng))
    np.testing.assert_allclose(
        np.asarray(lie.se3_compose(A, lie.se3_inverse(A))), np.eye(4), atol=1e-9
    )
    p = jnp.asarray(rng.normal(0, 1, 3), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(lie.se3_apply(lie.se3_compose(A, B), p)),
        np.asarray(lie.se3_apply(A, lie.se3_apply(B, p))),
        atol=1e-9,
    )


def test_batched_and_vmap(rng):
    xs = jnp.asarray(rng.normal(0, 0.7, (5, 6)), jnp.float64)
    T_batch = lie.se3_exp(xs)
    T_vmap = jax.vmap(lie.se3_exp)(xs)
    np.testing.assert_allclose(np.asarray(T_batch), np.asarray(T_vmap), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(lie.se3_log(T_batch)), np.asarray(xs), atol=1e-6
    )


def test_gradients_finite_at_zero():
    g = jax.grad(lambda xi: lie.se3_exp(xi).sum())(jnp.zeros(6, jnp.float64))
    assert np.isfinite(np.asarray(g)).all()


def test_so3_log_near_pi_mixed_sign_axes(rng):
    """At (and near) 180 degrees the skew part vanishes, so axis SIGNS
    must come from the symmetric part — a +1-sign fallback reconstructs
    the wrong rotation for mixed-sign axes (regression: exp(log(R))
    diverged from R by O(1) for axis (1,-1,1)/sqrt(3) at theta=pi)."""
    axes = [
        np.array([1.0, -1.0, 1.0]) / np.sqrt(3.0),
        np.array([-1.0, 1.0, 1.0]) / np.sqrt(3.0),
        np.array([0.0, -1.0, 1.0]) / np.sqrt(2.0),
        np.array([1.0, 0.0, 0.0]),
    ]
    for _ in range(8):
        v = rng.normal(0, 1, 3)
        axes.append(v / np.linalg.norm(v))
    for axis in axes:
        for theta in (np.pi, np.pi - 1e-4, np.pi - 1e-2, 3.0):
            R = lie.so3_exp(jnp.asarray(theta * axis, jnp.float64))
            back = lie.so3_exp(lie.so3_log(R))
            np.testing.assert_allclose(
                np.asarray(back), np.asarray(R), atol=5e-4,
                err_msg=f"axis={axis} theta={theta}",
            )
