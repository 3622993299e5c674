"""WNOA Gauss-process trajectory interpolation (`geom.gp_interp`).

Covers the across-knot half of the reference's continuous-time STEAM
trajectory (`/root/reference/gen_data/config/radar_config.yaml:160-188`):
the 6x6 SE(3) Jacobian series against its defining integral, boundary /
constant-twist exactness of the interpolant, kinematic consistency of the
interpolated twist, and the accuracy win over constant-twist (linear)
interpolation on an accelerating trajectory.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_masking_tpu.geom import se3_exp, se3_inv, se3_log
from mm_masking_tpu.geom.se3 import so3_left_jacobian
from mm_masking_tpu.geom.gp_interp import (
    body_twists_from_trajectory,
    interpolate_trajectory,
    se3_curly_hat,
    se3_left_jacobian6,
    wnoa_interpolate,
)


def _rand_xi(rng, b, rot_scale=1.5, trans_scale=2.0):
    xi = rng.uniform(-1.0, 1.0, (b, 6)).astype(np.float32)
    xi[:, :3] *= trans_scale
    xi[:, 3:] *= rot_scale / np.sqrt(3.0)
    return jnp.asarray(xi)


def _big_adjoint(T):
    """Group adjoint Ad(T) = [[C, t^ C], [0, C]] for xi = [rho, phi]."""
    from mm_masking_tpu.geom.se3 import hat3

    C = T[..., :3, :3]
    t_hat = hat3(T[..., :3, 3])
    top = jnp.concatenate([C, jnp.matmul(t_hat, C)], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(C), C], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def test_left_jacobian_block_structure():
    xi = _rand_xi(np.random.default_rng(0), 8)
    J = se3_left_jacobian6(xi)
    Jso3 = so3_left_jacobian(xi[:, 3:])
    np.testing.assert_allclose(J[:, :3, :3], Jso3, atol=2e-6)
    np.testing.assert_allclose(J[:, 3:, 3:], Jso3, atol=2e-6)
    np.testing.assert_allclose(J[:, 3:, :3], 0.0, atol=2e-6)
    # identity at xi = 0
    J0 = se3_left_jacobian6(jnp.zeros((1, 6)))
    np.testing.assert_allclose(J0[0], np.eye(6), atol=1e-7)


def test_left_jacobian_matches_defining_integral():
    """Jl(xi) = integral_0^1 Ad(Exp(s xi)) ds (Simpson quadrature)."""
    xi = _rand_xi(np.random.default_rng(1), 4)
    n = 200  # Simpson with 201 points
    s = jnp.linspace(0.0, 1.0, n + 1)
    ad_s = jax.vmap(lambda si: _big_adjoint(se3_exp(si * xi)))(s)
    wgt = np.ones(n + 1)
    wgt[1:-1:2] = 4.0
    wgt[2:-1:2] = 2.0
    integral = jnp.einsum("s,sbij->bij", jnp.asarray(wgt, xi.dtype), ad_s) / (
        3.0 * n
    )
    np.testing.assert_allclose(
        se3_left_jacobian6(xi), integral, atol=5e-5, rtol=1e-4
    )


def test_curly_hat_bracket():
    """ad_x y == Log-bracket: hat(ad_x y) = hat(x)hat(y) - hat(y)hat(x)
    checked in the 4x4 matrix algebra."""
    rng = np.random.default_rng(2)
    x, y = _rand_xi(rng, 1)[0], _rand_xi(rng, 1)[0]

    def hat4(v):
        from mm_masking_tpu.geom.se3 import hat3

        M = jnp.zeros((4, 4), v.dtype)
        M = M.at[:3, :3].set(hat3(v[3:]))
        M = M.at[:3, 3].set(v[:3])
        return M

    lhs = hat4(se3_curly_hat(x) @ y)
    rhs = hat4(x) @ hat4(y) - hat4(y) @ hat4(x)
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def _knots(rng):
    T1 = se3_exp(_rand_xi(rng, 1))
    w1 = _rand_xi(rng, 1) * 0.5
    T2 = jnp.matmul(T1, se3_exp(_rand_xi(rng, 1) * 0.4))
    w2 = _rand_xi(rng, 1) * 0.5
    return T1, w1, T2, w2


def test_boundary_conditions():
    T1, w1, T2, w2 = _knots(np.random.default_rng(3))
    dt = 0.7
    T0, wq0 = wnoa_interpolate(T1, w1, T2, w2, 0.0, dt)
    Tq1, wq1 = wnoa_interpolate(T1, w1, T2, w2, 1.0, dt)
    np.testing.assert_allclose(T0, T1, atol=1e-5)
    np.testing.assert_allclose(wq0, w1, atol=1e-4)
    np.testing.assert_allclose(Tq1, T2, atol=1e-5)
    np.testing.assert_allclose(wq1, w2, atol=1e-4)


def test_constant_twist_is_exact():
    rng = np.random.default_rng(4)
    T1 = se3_exp(_rand_xi(rng, 1))
    w = _rand_xi(rng, 1) * 0.6
    dt = 0.5
    T2 = jnp.matmul(T1, se3_exp(w * dt))
    for alpha in (0.2, 0.5, 0.8):
        Tq, wq = wnoa_interpolate(T1, w, T2, w, alpha, dt)
        np.testing.assert_allclose(
            Tq, jnp.matmul(T1, se3_exp(alpha * dt * w)), atol=2e-5
        )
        np.testing.assert_allclose(wq, w, atol=1e-4)


def test_interpolated_twist_is_kinematically_consistent():
    """w(tau) must be the actual body velocity of the interpolated pose
    curve: Log(T(a)^-1 T(a+e)) / (e*dt) -> w(a).  Finite differencing needs
    f64 (the f32 Log of a near-identity delta drowns in rounding)."""
    jax.config.update("jax_enable_x64", True)
    try:
        T1, w1, T2, w2 = _knots(np.random.default_rng(5))
        T1, w1, T2, w2 = (x.astype(jnp.float64) for x in (T1, w1, T2, w2))
        dt, alpha, eps = 0.8, 0.37, 1e-6
        Ta, wa = wnoa_interpolate(T1, w1, T2, w2, alpha, dt)
        Tb, _ = wnoa_interpolate(T1, w1, T2, w2, alpha + eps, dt)
        w_fd = se3_log(jnp.matmul(se3_inv(Ta), Tb)) / (eps * dt)
        np.testing.assert_allclose(wa, w_fd, atol=1e-4, rtol=1e-4)
    finally:
        jax.config.update("jax_enable_x64", False)


def _integrate(w_of_t, t0, t1, steps=4000):
    """Fine right-multiplication integration of dT/dt = T hat(w(t)) —
    one fused scan (a per-step Python loop of jnp matmuls is minutes on
    this 1-core host)."""
    h = (t1 - t0) / steps
    t = t0 + (jnp.arange(steps, dtype=jnp.float32) + 0.5) * h
    steps_T = se3_exp(jax.vmap(w_of_t)(t) * h)

    def body(T, Tk):
        return jnp.matmul(T, Tk, precision="highest"), None

    T, _ = jax.lax.scan(body, jnp.eye(4, dtype=jnp.float32), steps_T)
    return T[None]


def test_beats_constant_twist_on_accelerating_trajectory():
    """Accelerating translation (body twist linear in t, constant yaw rate):
    the GP (Hermite) midpoint error must be far below constant-twist
    (linear local) interpolation — the reason the reference carries a WNOA
    trajectory, not just frame-to-frame deltas.  (Linear interpolation puts
    the midpoint at half the total arc; under v(t) = a·t the true midpoint
    is at a quarter — an O(10 cm) error at these rates.  Pure accelerating
    *yaw* is a weak discriminator: cubic Hermite in local coordinates
    reproduces the quadratic yaw exactly for BOTH the GP and the true
    trajectory, so both methods are close there.)"""

    def w_of_t(t):
        return jnp.stack(
            [2.0 * t, jnp.zeros_like(t), jnp.zeros_like(t),
             jnp.zeros_like(t), jnp.zeros_like(t),
             jnp.full_like(t, 0.5)], axis=-1)

    dt = 1.0
    T1 = jnp.eye(4)[None]
    T2 = _integrate(w_of_t, 0.0, dt)
    T_mid_true = _integrate(w_of_t, 0.0, 0.5 * dt)
    w1 = w_of_t(jnp.asarray(0.0))[None]
    w2 = w_of_t(jnp.asarray(dt))[None]

    T_gp, _ = wnoa_interpolate(T1, w1, T2, w2, 0.5, dt)
    xi12 = se3_log(jnp.matmul(se3_inv(T1), T2))
    T_lin = jnp.matmul(T1, se3_exp(0.5 * xi12))

    err_gp = float(jnp.linalg.norm(T_gp[0, :3, 3] - T_mid_true[0, :3, 3]))
    err_lin = float(jnp.linalg.norm(T_lin[0, :3, 3] - T_mid_true[0, :3, 3]))
    assert err_gp < 0.1 * err_lin, (err_gp, err_lin)
    assert err_gp < 0.02, err_gp


def test_trajectory_interpolator_hits_knots_and_clamps():
    rng = np.random.default_rng(6)
    K = 5
    Ts = [jnp.eye(4)]
    for _ in range(K - 1):
        Ts.append(jnp.matmul(Ts[-1], se3_exp(_rand_xi(rng, 1)[0] * 0.3)))
    Ts = jnp.stack(Ts)
    times = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])

    q = jnp.asarray([-0.1, 0.0, 0.5, 1.0, 1.3])
    Tq, wq = interpolate_trajectory(Ts, times, q)
    np.testing.assert_allclose(Tq[1], Ts[0], atol=1e-5)
    np.testing.assert_allclose(Tq[2], Ts[2], atol=1e-5)
    np.testing.assert_allclose(Tq[3], Ts[-1], atol=1e-5)
    # clamped outside the span
    np.testing.assert_allclose(Tq[0], Ts[0], atol=1e-5)
    np.testing.assert_allclose(Tq[4], Ts[-1], atol=1e-5)
    assert wq.shape == (5, 6)


def test_central_difference_twists_recover_constant_twist():
    w = jnp.asarray([[0.8, -0.2, 0.0, 0.0, 0.0, 0.4]], jnp.float32)
    dt = 0.25
    Ts = [jnp.eye(4)]
    for _ in range(4):
        Ts.append(jnp.matmul(Ts[-1], se3_exp(w[0] * dt)))
    Ts = jnp.stack(Ts)
    times = jnp.arange(5, dtype=jnp.float32) * dt
    tw = body_twists_from_trajectory(Ts, times)
    np.testing.assert_allclose(tw, jnp.broadcast_to(w, (5, 6)), atol=1e-4)


def test_teachpass_pose_at_queries_between_frames():
    """TeachPass.pose_at: GP query of the odometry trajectory between
    processed frames on a synthetic constant-velocity run."""
    from mm_masking_tpu.localization.odometry import OdometryConfig, TeachPass

    rng = np.random.default_rng(7)
    base = rng.uniform(-20.0, 20.0, (256, 3)).astype(np.float32)
    base[:, 2] = 0.0
    w = jnp.asarray([1.2, 0.0, 0.0, 0.0, 0.0, 0.3], jnp.float32)
    dt = 0.25
    cfg = OdometryConfig(max_map_pts=2048, voxel_size=0.3,
                         max_iterations=30)
    tp = TeachPass(cfg)
    T = jnp.eye(4)
    for k in range(4):
        from mm_masking_tpu.geom import transform_points

        # scan observed FROM pose T: points in sensor frame
        pts = transform_points(se3_inv(T)[None], jnp.asarray(base)[None])[0]
        tp.process(pts, stamp_us=int(k * dt * 1e6))
        T = jnp.matmul(T, se3_exp((w * dt)[None]))[0]

    # query halfway between frames 1 and 2
    Tq, wq = tp.pose_at(int(1.5 * dt * 1e6))
    T_true = se3_exp((w * (1.5 * dt))[None])[0]
    np.testing.assert_allclose(
        np.asarray(Tq[:3, 3]), np.asarray(T_true[:3, 3]), atol=0.05
    )
    np.testing.assert_allclose(np.asarray(wq[:2]), np.asarray(w[:2]),
                               atol=0.15)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
