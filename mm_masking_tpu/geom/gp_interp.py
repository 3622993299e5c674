"""WNOA Gauss-process trajectory interpolation between keyframe states.

The reference's radar odometry estimates a *continuous* trajectory: a STEAM
white-noise-on-acceleration (WNOA) prior over SE(3) lets it query the pose at
any timestamp between measurement knots
(`/root/reference/gen_data/config/radar_config.yaml:160-188`, steam block
`:181-183`; the C++ module is an empty submodule — semantics from the config
schema and the STEAM/WNOA literature). `dicp.ct_icp` covers the *within-scan*
half of that capability (a twist state per scan); this module covers the
*across-knot* half: given two keyframe states (pose, body twist) it evaluates
the WNOA posterior-mean trajectory at any normalized time between them.

Math (Anderson & Barfoot-style local GP): with the right-multiplication
convention ``T(tau) = T1 @ Exp(xi(alpha))`` and kinematics
``dT/dt = T @ hat(w)`` (``w`` the body twist), the local coordinate obeys
``dxi/dt = Jr(xi)^{-1} w``.  The WNOA posterior mean in the local coordinates
is exactly the cubic Hermite interpolant matching the boundary values

    xi(0) = 0,      dxi/dalpha(0) = w1 * dt,
    xi(1) = xi12,   dxi/dalpha(1) = Jr(xi12)^{-1} (w2 * dt),

with ``xi12 = Log(T1^{-1} T2)`` (the WNOA blending matrices
``Lambda(tau), Psi(tau)`` reduce to the Hermite basis — Qc cancels).  The
interpolated body twist is recovered by ``w(tau) = Jr(xi) dxi/dalpha / dt``.

For a *constant* twist (w1 = w2 = w, T2 = T1 Exp(w dt)) the interpolant is
exact: ``Jr(xi)^{-1} xi = xi`` makes all three Hermite contributions collinear
and ``xi(alpha) = alpha * w * dt`` — consistent with the constant-twist model
`dicp.ct_icp` uses inside one scan.

The SE(3) left Jacobian is computed by its adjoint series
``Jl(xi) = sum_n (curlyhat(xi))^n / (n+1)!`` with a fixed term count — exact
to machine precision for ``|phi| < pi`` (term n decays like theta^n/(n+1)!),
branch-free, and jit/vmap-friendly (6x6 matmuls; this is a trajectory-query
utility, not a hot kernel).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mm_masking_tpu.geom.se3 import hat3, se3_exp, se3_inv, se3_log

_JACOBIAN_TERMS = 20


def se3_curly_hat(xi: jax.Array) -> jax.Array:
    """Algebra adjoint ad_xi ("curly hat"): (…, 6) -> (…, 6, 6).

    Convention matches `se3.py`: xi = [rho, phi] (translation first), so
    ad_xi = [[phi^, rho^], [0, phi^]].
    """
    rho_hat = hat3(xi[..., :3])
    phi_hat = hat3(xi[..., 3:])
    zeros = jnp.zeros_like(phi_hat)
    top = jnp.concatenate([phi_hat, rho_hat], axis=-1)
    bot = jnp.concatenate([zeros, phi_hat], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_left_jacobian6(xi: jax.Array, terms: int = _JACOBIAN_TERMS) -> jax.Array:
    """Full 6x6 left Jacobian of SE(3) via the adjoint series.

    Jl(xi) = sum_{n>=0} ad_xi^n / (n+1)! — block form [[J(phi), Q], [0, J(phi)]]
    (tested against the closed-form SO(3) blocks). `terms=20` is exact to
    machine precision for rotations below pi.
    """
    ad = se3_curly_hat(xi)
    eye = jnp.broadcast_to(jnp.eye(6, dtype=xi.dtype), ad.shape)
    total = eye
    term = eye
    for n in range(1, terms):
        term = jnp.matmul(term, ad, precision="highest") / (n + 1.0)
        total = total + term
    return total


def se3_right_jacobian6(xi: jax.Array, terms: int = _JACOBIAN_TERMS) -> jax.Array:
    """Full 6x6 right Jacobian: Jr(xi) = Jl(-xi)."""
    return se3_left_jacobian6(-xi, terms)


def _hermite(alpha: jax.Array):
    """Cubic Hermite basis (h10, h01, h11) and d/dalpha — h00 multiplies the
    zero boundary value xi(0) and is never needed."""
    a2 = alpha * alpha
    a3 = a2 * alpha
    h10 = a3 - 2.0 * a2 + alpha
    h01 = -2.0 * a3 + 3.0 * a2
    h11 = a3 - a2
    dh10 = 3.0 * a2 - 4.0 * alpha + 1.0
    dh01 = -6.0 * a2 + 6.0 * alpha
    dh11 = 3.0 * a2 - 2.0 * alpha
    return (h10, h01, h11), (dh10, dh01, dh11)


def wnoa_interpolate(
    T1: jax.Array,
    w1: jax.Array,
    T2: jax.Array,
    w2: jax.Array,
    alpha: jax.Array,
    dt: jax.Array | float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Interpolate the WNOA posterior-mean state between two knots.

    Args:
      T1, T2: (…, 4, 4) knot poses (right-multiplication world poses).
      w1, w2: (…, 6) body twists [v, omega] at the knots, in units/sec,
        under the kinematics dT/dt = T @ hat(w).
      alpha: normalized query time in [0, 1] (scalar or batched against …).
      dt: knot spacing t2 - t1 in seconds (scalar or batched).

    Returns:
      (T(tau), w(tau)): pose (…, 4, 4) and body twist (…, 6) at
      tau = t1 + alpha * dt.  Exact at the boundaries and for constant twist.
    """
    alpha = jnp.asarray(alpha, T1.dtype)
    dt = jnp.asarray(dt, T1.dtype)
    xi12 = se3_log(jnp.matmul(se3_inv(T1), T2, precision="highest"))
    g1 = w1 * dt[..., None]
    jr12 = se3_right_jacobian6(xi12)
    g2 = jnp.linalg.solve(jr12, (w2 * dt[..., None])[..., None])[..., 0]

    (h10, h01, h11), (dh10, dh01, dh11) = _hermite(alpha)
    xi = (
        h10[..., None] * g1 + h01[..., None] * xi12 + h11[..., None] * g2
    )
    dxi = (
        dh10[..., None] * g1 + dh01[..., None] * xi12 + dh11[..., None] * g2
    )
    T = jnp.matmul(T1, se3_exp(xi), precision="highest")
    w = (
        jnp.einsum(
            "...ij,...j->...i", se3_right_jacobian6(xi), dxi,
            precision="highest",
        )
        / dt[..., None]
    )
    return T, w


def body_twists_from_trajectory(
    Ts: jax.Array, times: jax.Array
) -> jax.Array:
    """Estimate per-knot body twists from a pose sequence by central
    differences: w_k = Log(T_{k-1}^{-1} T_{k+1}) / (t_{k+1} - t_{k-1})
    (one-sided at the ends).  Ts: (K, 4, 4); times: (K,) seconds -> (K, 6)."""
    K = Ts.shape[0]
    if K == 1:
        return jnp.zeros((1, 6), Ts.dtype)
    lo = jnp.maximum(jnp.arange(K) - 1, 0)
    hi = jnp.minimum(jnp.arange(K) + 1, K - 1)
    xi = se3_log(jnp.matmul(se3_inv(Ts[lo]), Ts[hi], precision="highest"))
    span = jnp.maximum(times[hi] - times[lo], 1e-12)
    return xi / span[:, None].astype(Ts.dtype)


def interpolate_trajectory(
    Ts: jax.Array,
    times: jax.Array,
    query_times: jax.Array,
    twists: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Query a knot trajectory at arbitrary timestamps (the across-knot
    capability of the reference's steam trajectory).

    Args:
      Ts: (K, 4, 4) knot poses; times: (K,) knot timestamps (seconds,
        strictly increasing); query_times: (Q,) timestamps — clamped to the
        knot span; twists: optional (K, 6) knot body twists (estimated by
        central differences when omitted).

    Returns: ((Q, 4, 4) poses, (Q, 6) body twists).
    """
    Ts = jnp.asarray(Ts)
    times = jnp.asarray(times, Ts.dtype)
    query_times = jnp.asarray(query_times, Ts.dtype)
    if twists is None:
        twists = body_twists_from_trajectory(Ts, times)
    K = Ts.shape[0]
    if K == 1:
        Q = query_times.shape[0]
        return (
            jnp.broadcast_to(Ts[0], (Q, 4, 4)),
            jnp.broadcast_to(twists[0], (Q, 6)),
        )
    seg = jnp.clip(
        jnp.searchsorted(times, query_times, side="right") - 1, 0, K - 2
    )
    t1, t2 = times[seg], times[seg + 1]
    dt = jnp.maximum(t2 - t1, 1e-12)
    alpha = jnp.clip((query_times - t1) / dt, 0.0, 1.0)
    return wnoa_interpolate(
        Ts[seg], twists[seg], Ts[seg + 1], twists[seg + 1], alpha, dt
    )
