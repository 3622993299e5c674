"""Continuous-time ICP: per-point pose interpolation INSIDE the GN solve.

The reference's radar odometry estimates a continuous trajectory with a
white-noise-on-acceleration (WNOA) STEAM prior and associates every radar
point at its own interpolated pose
(`/root/reference/gen_data/config/radar_config.yaml:160-188`, steam block
`:181-183`; the C++ module itself is an empty submodule — semantics from the
config schema and the STEAM/WNOA literature). `ops.detectors.motion_undistort`
covers the open-loop 80% (un-distort with a KNOWN velocity); this module
closes the loop: the scan-period body twist is a STATE of the GN solve,
estimated jointly with the pose from the scan/map geometry itself — the
capability that keeps odometry unbiased at high yaw rates when no external
velocity estimate exists.

Model (planar, the radar ground-vehicle case): the sensor sweeps its azimuths
over one period; point *i* observed at normalized time s_i ∈ [0, 1] from scan
start sits at

    p'_i = T · Exp(s_i ξ) · p_i

with T the scan-START pose in the map and ξ = (vx·Δt, vy·Δt, ω·Δt) the body
twist over the period. Under the WNOA prior the MAP trajectory between
measurement knots is exactly this constant-twist interpolation (white noise
on acceleration ⇒ piecewise-linear velocity; over one 0.25 s scan the linear
term is the whole story — the same first-order interpolation CT-ICP-style
radar/lidar odometry uses). The GN state is (δT, δξ) ∈ R⁶ (planar DOF:
x, y, yaw, vx, vy, ω); the twist Jacobian is the pose Jacobian scaled by s_i
(first order in the within-scan motion — Gauss-Newton with an approximate
Jacobian converges to the same fixed point since the residual is exact).

Everything is fixed-shape and jit/while_loop-compatible: one fused program
per solve, association via the same dense/blocked NN kernels as `icp`.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from mm_masking_tpu.dicp.icp import robust_weight
from mm_masking_tpu.geom import se3_exp
from mm_masking_tpu.ops.pallas.nn_assoc import nn_argmin


@dataclasses.dataclass(frozen=True)
class CTICPConfig:
    icp_type: str = "pt2pt"  # "pt2pt" | "pt2pl"
    max_iterations: int = 30
    tolerance: float = 1e-6
    trim_dist: float = 5.0
    loss_name: str = "cauchy"
    loss_metric: float = 1.0
    damping: float = 1e-9
    # WNOA prior information weight on the twist state: adds
    # λ_w‖ξ − ξ_prior‖² to the GN objective. The twist is observable from a
    # single scan only through the distortion signature (a few cm at urban
    # speeds), so the prior carries most of the low-frequency information —
    # exactly the role the reference's steam block plays.
    twist_prior_weight: float = 1.0
    # Optional pose prior (same convention as ICPConfig.prior_weight).
    pose_prior_weight: float = 0.0
    use_pallas_nn: bool | None = None


def _exp_planar_points(p: jax.Array, s: jax.Array, xi: jax.Array) -> jax.Array:
    """u_i = Exp(s_i ξ)·p_i — exact planar exponential per point.

    p: (B, N, 3); s: (B, N) normalized times; xi: (B, 3) = (ax, ay, aθ)
    (translation·period, yaw·period). Same V(θ) left-Jacobian form as
    `ops.detectors.motion_undistort`, series-guarded at θ→0.
    """
    th = s * xi[:, 2:3]  # (B, N)
    c, si = jnp.cos(th), jnp.sin(th)
    x, y = p[..., 0], p[..., 1]
    rx = c * x - si * y
    ry = si * x + c * y
    # V(θ)·(s·a): with a the per-period translation, the integrated
    # translation over s is V(θ)·a·s evaluated with θ = s·aθ.
    small = jnp.abs(th) < 1e-6
    w = xi[:, 2:3]
    ssafe = jnp.where(small, 1.0, w)
    A = jnp.where(small, s * (1.0 - th * th / 6.0), si / ssafe)
    Bc = jnp.where(small, s * th / 2.0, (1.0 - c) / ssafe)
    ax, ay = xi[:, 0:1], xi[:, 1:2]
    tx = A * ax - Bc * ay
    ty = Bc * ax + A * ay
    return jnp.stack([rx + tx, ry + ty, p[..., 2]], axis=-1)


def normalized_times(source: jax.Array, times: jax.Array,
                     time_to_sec: float = 1.0) -> jax.Array:
    """Per-point normalized time s ∈ [0, 1] over each item's REAL points
    (pad rows x=y=0 get s=0 → identity interpolation)."""
    valid = ~((source[..., 0] == 0.0) & (source[..., 1] == 0.0))
    t = times.astype(source.dtype) * time_to_sec
    t0 = jnp.min(jnp.where(valid, t, jnp.inf), axis=1, keepdims=True)
    t1 = jnp.max(jnp.where(valid, t, -jnp.inf), axis=1, keepdims=True)
    span = jnp.maximum(t1 - t0, 1e-12)
    return jnp.where(valid, (t - t0) / span, 0.0)


def undistort_with_twist(source: jax.Array, times: jax.Array, xi: jax.Array,
                         time_to_sec: float = 1.0) -> jax.Array:
    """Map each point into the scan-START frame with an estimated twist:
    u_i = Exp(s_i ξ)·p_i (the closed-loop counterpart of
    `ops.detectors.motion_undistort`, which needs the velocity given)."""
    s = normalized_times(source, times, time_to_sec)
    return _exp_planar_points(source[..., :3], s, xi)


def planar_log(T: jax.Array) -> jax.Array:
    """Exact planar SE(2) log of (B, 4, 4) poses → (B, 3) = (ax, ay, aθ).
    Inverse of the planar exponential `_exp_planar_points` applies (the
    twist-prior mean for the next frame: ξ_prior = Log(T_prev⁻¹ T_cur))."""
    th = jnp.arctan2(T[:, 1, 0], T[:, 0, 0])
    tx, ty = T[:, 0, 3], T[:, 1, 3]
    half = th / 2.0
    small = jnp.abs(th) < 1e-6
    # V(θ)⁻¹ = (θ/2)·[[cot(θ/2), 1], [−1, cot(θ/2)]] (planar left-Jacobian
    # inverse); series-guarded at θ→0.
    cot = jnp.where(
        small, 1.0 - th * th / 12.0,
        half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half)),
    )
    ax = cot * tx + half * ty
    ay = -half * tx + cot * ty
    return jnp.stack([ax, ay, th], axis=-1)


def _gn_ct_step(T, xi, source, s_norm, target_pts, target_nrm, weight,
                source_valid, cfg: CTICPConfig, xi_prior, T_prior):
    """One GN iteration over the joint (pose, twist) state."""
    # 1. warp: per-point interpolated pose, then the frame pose.
    u = _exp_planar_points(source, s_norm, xi)  # (B, N, 3) scan-start frame
    R = T[:, :3, :3]
    p = (
        jnp.einsum("bij,bnj->bni", R, u, precision="highest")
        + T[:, None, :3, 3]
    )

    # 2. associate
    idx, _ = nn_argmin(
        jax.lax.stop_gradient(p), jax.lax.stop_gradient(target_pts),
        use_pallas=cfg.use_pallas_nn,
    )
    q = jnp.take_along_axis(target_pts, idx[..., None], axis=1)

    # 3. residuals + robust/trim weights (same hygiene as icp._gn_step)
    diff = p - q
    dist = jnp.linalg.norm(diff + 1e-30, axis=-1)
    if cfg.icp_type == "pt2pl":
        n = jnp.take_along_axis(target_nrm, idx[..., None], axis=1)
        r = jnp.sum(n * diff, axis=-1)  # (B, N)
        r_norm = jnp.abs(r)
    else:
        r = diff
        r_norm = dist
    active = jnp.isfinite(dist) & (dist < cfg.trim_dist)
    w = robust_weight(
        jnp.where(active, r_norm, 1.0), cfg.loss_name, cfg.loss_metric
    )
    w = jnp.where(active, w, 0.0) * source_valid
    if weight is not None:
        w = w * weight
    r = jnp.where(active if r.ndim == 2 else active[..., None], r, 0.0)
    p = jnp.where(active[..., None], p, 0.0)
    u_z = jnp.where(active[..., None], u, 0.0)

    # 4. planar Jacobian rows over the 6 DOF (x, y, yaw, ax, ay, aθ).
    #    pose rows:  d p'/dδ  = [1 0 −p'_y; 0 1 p'_x]  (world-frame left pert.)
    #    twist rows: d p'/dδξ = s · R₂ · [1 0 −u_y; 0 1 u_x]  (body frame,
    #    first order in the within-scan motion).
    ones = jnp.ones_like(w)
    zeros = jnp.zeros_like(w)
    r00, r01 = R[:, 0:1, 0], R[:, 0:1, 1]
    r10, r11 = R[:, 1:2, 0], R[:, 1:2, 1]
    ux, uy = u_z[..., 0], u_z[..., 1]
    # residual x-row and y-row of the 2×6 per-point Jacobian
    Jx = jnp.stack(
        [ones, zeros, -p[..., 1],
         s_norm * r00, s_norm * r01,
         s_norm * (-r00 * uy + r01 * ux)], axis=-1)
    Jy = jnp.stack(
        [zeros, ones, p[..., 0],
         s_norm * r10, s_norm * r11,
         s_norm * (-r10 * uy + r11 * ux)], axis=-1)
    if cfg.icp_type == "pt2pl":
        nz = jnp.where(active[..., None], n, 0.0)
        Jn = nz[..., 0:1] * Jx + nz[..., 1:2] * Jy  # (B, N, 6)
        A = jnp.einsum("bni,bnj,bn->bij", Jn, Jn, w, precision="highest")
        b = -jnp.einsum("bni,bn,bn->bi", Jn, r, w, precision="highest")
    else:
        A = (
            jnp.einsum("bni,bnj,bn->bij", Jx, Jx, w, precision="highest")
            + jnp.einsum("bni,bnj,bn->bij", Jy, Jy, w, precision="highest")
        )
        b = -(
            jnp.einsum("bni,bn,bn->bi", Jx, r[..., 0], w, precision="highest")
            + jnp.einsum("bni,bn,bn->bi", Jy, r[..., 1], w, precision="highest")
        )

    # 5. priors
    if cfg.twist_prior_weight > 0.0:
        lam_w = jnp.asarray(cfg.twist_prior_weight, A.dtype)
        e = xi - xi_prior
        A = A.at[:, 3:, 3:].add(lam_w * jnp.eye(3, dtype=A.dtype))
        b = b.at[:, 3:].add(-lam_w * e)
    if cfg.pose_prior_weight > 0.0 and T_prior is not None:
        from mm_masking_tpu.dicp.icp import _prior_error6

        e6 = _prior_error6(T, T_prior)
        lam_p = jnp.asarray(cfg.pose_prior_weight, A.dtype)
        sel = jnp.asarray([0, 1, 5])
        A = A.at[:, :3, :3].add(lam_p * jnp.eye(3, dtype=A.dtype))
        b = b.at[:, :3].add(-lam_p * e6[:, sel])

    # 6. damped solve
    tr = jnp.trace(A, axis1=-2, axis2=-1) / 6.0
    lam = cfg.damping + 1e-7 * tr
    A = A + lam[:, None, None] * jnp.eye(6, dtype=A.dtype)
    delta = jnp.linalg.solve(A, b[..., None])[..., 0]
    delta = jnp.where(jnp.isfinite(delta), delta, 0.0)

    # 7. update: planar pose δ embedded into se(3); twist additive.
    B = T.shape[0]
    d6 = jnp.zeros((B, 6), T.dtype)
    d6 = d6.at[:, 0].set(delta[:, 0]).at[:, 1].set(delta[:, 1])
    d6 = d6.at[:, 5].set(delta[:, 2])
    T_new = jnp.matmul(se3_exp(d6), T, precision="highest")
    xi_new = xi + delta[:, 3:]
    return T_new, xi_new, delta


def ct_icp(
    source: jax.Array,
    times: jax.Array,
    target: jax.Array,
    T_init: jax.Array,
    xi_init: jax.Array | None = None,
    weight: jax.Array | None = None,
    cfg: CTICPConfig = CTICPConfig(),
    xi_prior: jax.Array | None = None,
    T_prior: jax.Array | None = None,
    time_to_sec: float = 1.0,
) -> dict[str, Any]:
    """Joint (pose, within-scan twist) registration.

    Args:
      source: (B, N, 3) scan points, x=y=0 pad rows.
      times: (B, N) per-point observation times (any unit ×`time_to_sec`;
        normalized internally to [0, 1] over each item's real points).
      target: (B, M, 3|6) map (+normals for pt2pl), far-sentinel pads.
      T_init: (B, 4, 4) scan-START pose initial guess.
      xi_init: (B, 3) initial per-period twist (ax, ay, aθ); defaults to
        `xi_prior` or zero.
      xi_prior: (B, 3) twist prior mean (e.g. last inter-frame motion — the
        WNOA extrapolation); defaults to zero.

    Returns {'T' (scan-start pose), 'T_end' (scan-end pose = T·Exp(ξ)),
    'xi' (B, 3), 'iterations', 'delta_norm'}.
    """
    source = source[..., :3]
    B, N = source.shape[0], source.shape[1]
    target_pts = target[..., :3]
    target_nrm = target[..., 3:6] if target.shape[-1] >= 6 else None
    if cfg.icp_type == "pt2pl" and target_nrm is None:
        raise ValueError("pt2pl requires target with normals (B, M, 6)")

    source_valid = ~((source[..., 0] == 0.0) & (source[..., 1] == 0.0))
    s_norm = normalized_times(source, times, time_to_sec)
    source_valid = source_valid.astype(source.dtype)

    if xi_prior is None:
        xi_prior = jnp.zeros((B, 3), source.dtype)
    if xi_init is None:
        xi_init = xi_prior

    def cond(state):
        T, xi, it, dn = state
        return jnp.logical_and(
            it < cfg.max_iterations, jnp.max(dn) >= cfg.tolerance
        )

    def body(state):
        T, xi, it, _ = state
        T_new, xi_new, delta = _gn_ct_step(
            T, xi, source, s_norm, target_pts, target_nrm, weight,
            source_valid, cfg, xi_prior, T_prior,
        )
        return (T_new, xi_new, it + 1, jnp.linalg.norm(delta, axis=-1))

    init = (T_init, xi_init, jnp.int32(0),
            jnp.full((B,), jnp.inf, T_init.dtype))
    T_f, xi_f, n_iter, dn = jax.lax.while_loop(cond, body, init)

    # scan-end pose: T·Exp(ξ) (planar twist embedded into se(3))
    d6 = jnp.zeros((B, 6), T_f.dtype)
    d6 = d6.at[:, 0].set(xi_f[:, 0]).at[:, 1].set(xi_f[:, 1])
    d6 = d6.at[:, 5].set(xi_f[:, 2])
    T_end = jnp.matmul(T_f, se3_exp(d6), precision="highest")
    return {
        "T": T_f,
        "T_end": T_end,
        "xi": xi_f,
        "iterations": n_iter,
        "delta_norm": dn,
    }
