"""SE(3) / SO(3) Lie-group operations in pure JAX.

TPU-native replacement for the `pylgmath` usage in the reference
(`/root/reference/mm_masking/icp_weight_dataset.py:275-279` builds
``Transformation(xi_ab=xi).matrix()`` for the random initial-guess perturbation;
`/root/reference/mm_masking/utils/extract_graph.py:13-23` applies pose-graph
transforms). Convention follows lgmath / Barfoot: a 6-vector ``xi = [rho, phi]``
(translation first, rotation last) maps to

    T = exp(xi^) = [[ exp(phi^),  J(phi) @ rho ],
                    [ 0, 0, 0,    1            ]]

so for planar motion ``xi = [x, y, 0, 0, 0, theta]`` the rotation block is a
right-handed rotation about +z with ``T[1, 0] = sin(theta)`` — the convention the
reference's loss relies on when it reads ``xi_theta = (T - I)[1, 0]``
(`/root/reference/mm_masking/train_icp_weights.py:192-199`).

All functions are shape-polymorphic over leading batch dimensions via explicit
``jax.vmap`` wrappers (``b*`` variants) and are differentiable everywhere,
including at the identity (Taylor-guarded small-angle branches).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hat3(phi: jax.Array) -> jax.Array:
    """(…, 3) axis-angle vector -> (…, 3, 3) skew-symmetric matrix."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee3(M: jax.Array) -> jax.Array:
    """(…, 3, 3) skew-symmetric matrix -> (…, 3) vector."""
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def _theta_terms(phi: jax.Array):
    """Safe (theta^2, theta, is_small) with NaN-free gradients at phi = 0.

    ``sqrt`` at 0 has an infinite derivative; the double-``where`` guard keeps
    the untaken branch finite so backprop through exp/log at the identity (the
    gt_eye training regime) stays clean.
    """
    sq = jnp.sum(phi * phi, axis=-1)
    small = sq < 1e-8
    safe_sq = jnp.where(small, jnp.ones_like(sq), sq)
    theta = jnp.sqrt(safe_sq)  # only consumed by the non-small branch
    return sq, safe_sq, theta, small


def so3_exp(phi: jax.Array) -> jax.Array:
    """Rodrigues' formula: (…, 3) -> (…, 3, 3) rotation matrix exp(phi^)."""
    sq, safe_sq, theta, small = _theta_terms(phi)
    K = hat3(phi)
    K2 = jnp.matmul(K, K, precision='highest')
    a = jnp.where(small, 1.0 - sq / 6.0, jnp.sin(theta) / theta)[..., None, None]
    # (1 - cos t)/t^2 via 2 sin^2(t/2)/t^2: the raw form loses ALL bits in
    # f32 for t in [1e-4, ~5e-4] (cos rounds to 1 -> b = 0 instead of 0.5,
    # which deletes the J's K/2 term); the half-angle form is stable down to
    # the Taylor branch.
    half_sin = jnp.sin(0.5 * theta)
    b = jnp.where(small, 0.5 - sq / 24.0, 2.0 * half_sin * half_sin / safe_sq)[
        ..., None, None
    ]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(C: jax.Array) -> jax.Array:
    """(…, 3, 3) rotation matrix -> (…, 3) axis-angle vector.

    Valid for |theta| < pi (all localization-scale rotations); antipodal
    rotations are not needed by any caller in this framework.
    """
    trace = C[..., 0, 0] + C[..., 1, 1] + C[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # NB: the threshold must be representable in f32 (1 - 1e-8 rounds to 1.0,
    # which would never trigger the guard and yield 0/0 at the identity).
    small = cos_theta >= 1.0 - 1e-6
    # arccos has an infinite derivative at 1; feed it a safe value in the
    # small-angle branch and use the 2(1 - cos) ≈ theta^2 Taylor form there.
    safe_cos = jnp.where(small, jnp.zeros_like(cos_theta), cos_theta)
    theta = jnp.arccos(safe_cos)
    w = vee3(C - jnp.swapaxes(C, -1, -2)) * 0.5  # = sin(theta) * axis
    scale = jnp.where(
        small,
        1.0 + (1.0 - cos_theta) / 3.0,
        theta / jnp.sin(theta),
    )
    return w * scale[..., None]


def so3_left_jacobian(phi: jax.Array) -> jax.Array:
    """Left Jacobian J(phi) of SO(3): (…, 3) -> (…, 3, 3)."""
    sq, safe_sq, theta, small = _theta_terms(phi)
    K = hat3(phi)
    K2 = jnp.matmul(K, K, precision='highest')
    # stable half-angle form — see so3_exp for the f32 dead-zone rationale
    half_sin = jnp.sin(0.5 * theta)
    b = jnp.where(small, 0.5 - sq / 24.0, 2.0 * half_sin * half_sin / safe_sq)[
        ..., None, None
    ]
    c = jnp.where(
        small, 1.0 / 6.0 - sq / 120.0, (theta - jnp.sin(theta)) / (safe_sq * theta)
    )[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b * K + c * K2


def so3_left_jacobian_inv(phi: jax.Array) -> jax.Array:
    """Inverse left Jacobian of SO(3)."""
    sq, safe_sq, theta, _ = _theta_terms(phi)
    K = hat3(phi)
    K2 = jnp.matmul(K, K, precision='highest')
    half = jnp.asarray(0.5, phi.dtype)
    # coefficient (1/theta^2)(1 - theta sin(theta)/(2(1-cos(theta)))).
    # The trig form catastrophically cancels in f32: its numerator is
    # O(theta^2/12) while the 1-cos(theta) rounding error injects
    # O(eps/theta^2) — NaN below theta ≈ 5e-4 (cos rounds to exactly 1) and
    # noise up to theta ≈ 0.1. Use the Taylor branch below theta = 0.1 for
    # ALL dtypes (3-term truncation there ~8e-13, far below f32 eps and
    # below every parity budget) and guard the untaken branch's denominator
    # so reverse-mode gradients stay finite at the identity.
    small = sq < 0.01
    one_minus_cos = 1.0 - jnp.cos(theta)
    denom = jnp.where(small, jnp.ones_like(one_minus_cos), 2.0 * one_minus_cos)
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + sq / 720.0 + sq * sq / 30240.0,
        (1.0 - theta * jnp.sin(theta) / denom) / safe_sq,
    )[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - half * K + cot_term * K2


def se3_exp(xi: jax.Array) -> jax.Array:
    """(…, 6) twist [rho, phi] -> (…, 4, 4) homogeneous transform exp(xi^)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    C = so3_exp(phi)
    r = jnp.einsum("...ij,...j->...i", so3_left_jacobian(phi), rho, precision="highest")
    T = jnp.zeros(xi.shape[:-1] + (4, 4), dtype=xi.dtype)
    T = T.at[..., :3, :3].set(C)
    T = T.at[..., :3, 3].set(r)
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_log(T: jax.Array) -> jax.Array:
    """(…, 4, 4) transform -> (…, 6) twist [rho, phi] with T = exp(xi^)."""
    phi = so3_log(T[..., :3, :3])
    rho = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inv(phi), T[..., :3, 3], precision="highest")
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inv(T: jax.Array) -> jax.Array:
    """Closed-form inverse of (…, 4, 4) rigid transform."""
    C = T[..., :3, :3]
    r = T[..., :3, 3]
    Ct = jnp.swapaxes(C, -1, -2)
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Ct)
    out = out.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", Ct, r, precision="highest"))
    out = out.at[..., 3, 3].set(1.0)
    return out


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (…, 4, 4) transform to (…, N, 3) points."""
    return (
        jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts, precision="highest")
        + T[..., None, :3, 3]
    )


def rotate_vectors(T: jax.Array, vecs: jax.Array) -> jax.Array:
    """Apply only the rotation of (…, 4, 4) transform to (…, N, 3) vectors."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], vecs, precision="highest")


def planar_xi_first_order(T: jax.Array) -> tuple[jax.Array, jax.Array]:
    """First-order planar twist extraction used by the reference's loss.

    The reference reads ``xi_wedge = T - I`` and takes ``xi_r = xi_wedge[:, 0:2, 3]``
    and ``xi_theta = xi_wedge[:, 1, 0]``
    (`/root/reference/mm_masking/train_icp_weights.py:192-199`). This is a
    *first-order* log (sin(theta) for theta); reproduced exactly, not "fixed".

    Returns (xi_theta (…, 1), xi_r (…, 2)).
    """
    eye = jnp.eye(4, dtype=T.dtype)
    xi_wedge = T - eye
    xi_r = xi_wedge[..., 0:2, 3]
    xi_theta = xi_wedge[..., 1, 0][..., None]
    return xi_theta, xi_r


def yaw_to_se3(x: jax.Array, y: jax.Array, theta: jax.Array) -> jax.Array:
    """Planar pose (x, y, theta) -> (…, 4, 4) SE(3) matrix (exact, not exp)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    row0 = jnp.stack([c, -s, zero, x], axis=-1)
    row1 = jnp.stack([s, c, zero, y], axis=-1)
    row2 = jnp.stack([zero, zero, one, zero], axis=-1)
    row3 = jnp.stack([zero, zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)
