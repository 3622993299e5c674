import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_masking_tpu.geom import (
    se3_exp,
    se3_log,
    se3_inv,
    so3_exp,
    so3_log,
    transform_points,
    planar_xi_first_order,
    yaw_to_se3,
)


def rand_xi(key, n, scale=1.0):
    return scale * jax.random.normal(key, (n, 6))


def test_exp_identity():
    T = se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-7)


def test_exp_matches_scipy_matrix_exponential():
    # exp(xi^) must equal the literal matrix exponential of the 4x4 hat.
    from scipy.linalg import expm

    rng = np.random.default_rng(0)
    for _ in range(10):
        xi = rng.normal(size=6).astype(np.float64) * 0.7
        rho, phi = xi[:3], xi[3:]
        hat = np.zeros((4, 4))
        hat[:3, :3] = np.array(
            [[0, -phi[2], phi[1]], [phi[2], 0, -phi[0]], [-phi[1], phi[0], 0]]
        )
        hat[:3, 3] = rho
        expected = expm(hat)
        got = np.asarray(se3_exp(jnp.asarray(xi, dtype=jnp.float32)))
        np.testing.assert_allclose(got, expected, atol=1e-4)


def test_planar_convention_matches_reference_loss():
    # xi = [x, y, 0, 0, 0, theta]: T[1,0] = sin(theta) (reference loss reads this
    # slot as "xi_theta", train_icp_weights.py:192-199).
    theta = 0.3
    xi = jnp.array([1.0, 2.0, 0.0, 0.0, 0.0, theta])
    T = se3_exp(xi)
    assert abs(float(T[1, 0]) - np.sin(theta)) < 1e-6
    xi_theta, xi_r = planar_xi_first_order(T)
    assert abs(float(xi_theta[0]) - np.sin(theta)) < 1e-6


def test_log_inverts_exp():
    key = jax.random.PRNGKey(1)
    xi = rand_xi(key, 32, scale=0.8)
    T = se3_exp(xi)
    xi2 = se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_inverse():
    key = jax.random.PRNGKey(2)
    xi = rand_xi(key, 8)
    T = se3_exp(xi)
    TT = T @ se3_inv(T)
    np.testing.assert_allclose(
        np.asarray(TT), np.broadcast_to(np.eye(4), TT.shape), atol=1e-5
    )


def test_transform_points_roundtrip():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    xi = rand_xi(k1, 4)
    pts = jax.random.normal(k2, (4, 100, 3))
    T = se3_exp(xi)
    out = transform_points(se3_inv(T), transform_points(T, pts))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-4)


def test_exp_gradient_at_zero_finite():
    g = jax.grad(lambda xi: jnp.sum(se3_exp(xi)))(jnp.zeros(6))
    assert np.all(np.isfinite(np.asarray(g)))
    # Directional derivative at identity is the hat map: d/dxi_5 of T[1,0] = 1.
    g10 = jax.grad(lambda xi: se3_exp(xi)[1, 0])(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(g10), [0, 0, 0, 0, 0, 1.0], atol=1e-5)


def test_yaw_to_se3():
    T = yaw_to_se3(jnp.array(1.0), jnp.array(2.0), jnp.array(0.5))
    Texp = se3_exp(jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.5]))
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.asarray(Texp[:3, :3]), atol=1e-6)
    assert float(T[0, 3]) == 1.0 and float(T[1, 3]) == 2.0


def test_so3_log_small_angle():
    phi = jnp.array([1e-6, -2e-6, 3e-6])
    out = so3_log(so3_exp(phi))
    np.testing.assert_allclose(np.asarray(out), np.asarray(phi), atol=1e-9)


def test_left_jacobian_inv_f32_dead_zone():
    """Regression: for 1e-4 < theta < ~5e-4 the trig form of the inverse
    left Jacobian divides by an f32-rounded (1 - cos) = 0 -> NaN (and stays
    catastrophically noisy up to theta ~ 0.1). The Taylor branch must cover
    the whole region: J^-1 J = I to f32 accuracy, no NaN, finite gradients
    — the regime of se3_log on frame-to-frame odometry deltas."""
    from mm_masking_tpu.geom import so3_left_jacobian, so3_left_jacobian_inv

    for theta in (2e-4, 1e-3, 2e-2, 0.09, 0.11, 0.5):
        phi = jnp.asarray([0.0, 0.0, theta], jnp.float32)
        Jinv = so3_left_jacobian_inv(phi)
        assert np.all(np.isfinite(np.asarray(Jinv))), theta
        np.testing.assert_allclose(
            np.asarray(Jinv @ so3_left_jacobian(phi)), np.eye(3),
            atol=2e-6, err_msg=f"theta={theta}")
    # se3_log of a small planar delta must round-trip (the NaN repro)
    xi = jnp.asarray([6.8e-3, -8.5e-4, 0.0, 0.0, 0.0, 1.9e-4], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(se3_log(se3_exp(xi))), np.asarray(xi), atol=1e-7)
    g = jax.grad(lambda p: jnp.sum(so3_left_jacobian_inv(p)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
