"""Batched differentiable ICP: point-to-point and point-to-plane, SE(2)-in-SE(3).

TPU-native rebuild of the capability of `external/dICP` (empty submodule in the
reference snapshot; behavior reconstructed from its call sites:
`/root/reference/mm_masking/icp_weight_policy.py:53-55,277-288` — ctor knobs
``icp_type ∈ {pt2pt, pt2pl}``, ``differentiable``, ``max_iterations`` (10 train /
50 inference), ``tolerance=1e-5``; call knobs ``T_init``, per-point ``weight``,
``trim_dist=5.0``, ``loss_fn={'name': 'cauchy', 'metric': 1.0}``, ``dim=2``;
``target_pad_val`` pads map clouds far away so pads never associate
(`icp_weight_dataset.py:59-61,395`).)

Algorithm per Gauss-Newton iteration (batched over B):
  1. transform source by current T (left-composed: ``T ← exp(δ^) @ T``)
  2. nearest-neighbor association against the target (tiled kernel,
     :mod:`mm_masking_tpu.ops.pallas.nn_assoc`)
  3. residual: pt2pt ``r = p' − q`` (3-vec) / pt2pl ``r = n·(p' − q)`` (scalar)
  4. weights: trim (``‖p'−q‖ < trim_dist``) × robust (cauchy ``1/(1+(r/k)²)`` or
     huber ``min(1, k/|r|)``) × caller weight × source-pad mask
  5. weighted GN normal equations on the se(3) perturbation; ``dim=2`` solves
     only the (x, y, yaw) 3×3 subsystem — z/roll/pitch stay fixed
  6. update; iterate.

``differentiable=True`` unrolls ``max_iterations`` under ``lax.scan`` so
gradients (notably ∂T/∂weight — the signal that trains the mask) flow through
every iteration, matching the reference's backprop-through-the-solver training.
``differentiable=False`` runs a ``lax.while_loop`` with the ``‖δ‖ < tolerance``
early exit (non-differentiable by construction, used for 50-iter inference).

The association argmin is discrete: gradients flow through the *gathered
coordinates* and weights, with the correspondence switches contributing the
same subgradients as the torch implementation.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from mm_masking_tpu.geom import se3_exp
from mm_masking_tpu.ops.pallas.nn_assoc import nn_argmin

TARGET_PAD_VAL = 1000.0  # map pad sentinel; > any real range, trimmed out
_PLANAR_DOF = (0, 1, 5)  # x, y, yaw columns of the se(3) twist


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """Solver configuration mirroring the dICP ctor surface."""

    icp_type: str = "pt2pt"  # "pt2pt" | "pt2pl"
    max_iterations: int = 10
    tolerance: float = 1e-5
    differentiable: bool = True
    trim_dist: float = 5.0
    loss_name: str = "cauchy"  # "cauchy" | "huber" | "none"
    loss_metric: float = 1.0
    dim: int = 2  # 2 = planar (x, y, yaw); 3 = full SE(3)
    target_pad_val: float = TARGET_PAD_VAL
    use_pallas_nn: bool | None = None  # None = auto (TPU yes, else blocked)
    # Sorted-stripe NN association (nn_assoc.py): exact, searches only the
    # contiguous sorted-map window that can contain within-trim neighbors,
    # with a dense fallback if any tile's needed span overflows the window.
    # None = auto (on when the map has ≥ 4096 points). window 0 = auto (M/4).
    nn_stripe: bool | None = None
    nn_stripe_window: int = 0
    nn_stripe_tile: int = 256
    # Trust-region step clamp (meters): when > 0, any GN update whose
    # translation exceeds this is scaled down (whole twist, direction kept)
    # so ‖(dx, dy, dz)‖ ≤ max_step_m. A near-dead system (few active points
    # after a bad step, e.g. ghost-heavy frames under uniform weights) can
    # otherwise command a 10-50 m jump and death-spiral: the active set
    # collapses further and the damped-only solve wanders (observed 13-38 m
    # final errors on generated radar_lidar data). 0 = off — reference
    # semantics; parity-critical paths must keep 0.
    max_step_m: float = 0.0
    # Rematerialize each unrolled GN iteration on the backward pass
    # (jax.checkpoint on the scan body). Numerics exact; trades the stored
    # per-iteration residual set — several (B, N, ·) arrays × max_iterations,
    # whose low-channel layouts XLA pads heavily on TPU — for recompute.
    # Off by default; a measured speed/memory knob like ModelConfig.remat.
    remat_iters: bool = False
    damping: float = 1e-9  # Tikhonov floor keeping A invertible when weights die
    # Trace-relative Levenberg floor added on top of `damping`:
    # λ = damping + damping_rel · tr(A)/dof. Negligible (1e-7 relative) on a
    # healthy system but keeps near-dead systems (all weights trimmed) from
    # producing exploding steps. Set 0 for strict oracle parity (the torch
    # oracle regularizes with a flat 1e-9·I only) — with it, mid-trajectory
    # steps differ from the oracle at the ~1e-7-relative level per iteration.
    damping_rel: float = 1e-7
    # Motion-prior information weight λ: adds λ‖log(T·T_prior⁻¹)‖² to the GN
    # objective (the discrete WNOA/STEAM trajectory-prior fusion the reference
    # runs inside its odometry ICP, `radar_config.yaml:160-188`). 0 = off;
    # requires `T_prior` to be passed to `icp`. Unlike a warm start, the prior
    # keeps constraining unobservable directions (e.g. along-corridor
    # translation against a single wall) throughout the solve.
    prior_weight: float = 0.0
    # Motion-gated association refresh for the while-loop (inference) solver.
    # 0 = re-associate every iteration (reference semantics). > 0 = skip the
    # NN search while the accumulated pose motion since the last association
    # stays under this many meters (rotation counted at worst-case lever arm
    # `nn_refresh_range`); the cached indices are reused and only the cheap
    # GN update runs. Late tolerance-limited iterations (deltas at the f32
    # noise floor, far below any motion that could change a nearest
    # neighbor) then cost ~nothing. The gate is PER BATCH ITEM: each item
    # re-associates only when ITS accumulated motion crosses the threshold,
    # so converged items stop paying the O(N·M) search even while others in
    # the batch still move (inside the adaptive stripe kernel their tiles
    # skip both DMA and compute). Accuracy: sub-threshold motion can still
    # flip the NN of a point sitting near a Voronoi boundary between two map
    # points, so this is an approximation, not exact — the deviation vs
    # always-associate is bounded empirically by tests at ≤1 mm / ≤0.005° on
    # well-conditioned converging scenes
    # (test_icp.py::test_nn_refresh_matches_always_search). On scenes with
    # flat/sliding minima (dense walls + sensor noise) or non-converging
    # solves, the two variants can settle in different basins cm-to-dm
    # apart — the same divergence class as changing the reduction order
    # (both results are converged solver outputs; gating often converges
    # FASTER because stale-but-stable associations damp NN-flip
    # oscillation). Parity-critical paths must keep 0.
    nn_refresh_dist: float = 0.0
    nn_refresh_range: float = 80.0  # worst-case point radius for rotation
    # How the planar GN update (dx, dy, dθ) is applied to the pose (dim=2
    # only). "exp": T ← Exp([dx, dy, dθ]^) · T — the exact se(3)
    # exponential, translation V(dθ)·(dx, dy). "direct": T ← Td · T with
    # Td = [R(dθ) | (dx, dy)] — raw translation, the retraction classic
    # torch ICP implementations (and the parity oracle,
    # `benchmarks/reference_torch.py::torch_icp`) use. Both share the same
    # fixed points (delta → 0 makes them identical), so converged results
    # match exactly either way; mid-trajectory poses differ at second
    # order, which is the entire 10-iteration pt2pt parity transient
    # (test_solver_parity.py: exact at 10 iters under "direct").
    planar_retraction: str = "exp"  # "exp" | "direct"
    # Which magnitude feeds the robust kernel for pt2pl: the plane residual
    # |n·(p−q)| ("residual", the torch-oracle convention and our default) or
    # the full euclidean distance ‖p−q‖ ("distance"). A genuinely free
    # choice in the reconstructed dICP (`icp_weight_policy.py:277-288` shows
    # only the ctor loss dict); measured by the assumption-sensitivity study
    # (docs/STATUS.md r5). pt2pt is unaffected (both are ‖p−q‖).
    robust_on: str = "residual"  # "residual" | "distance"
    # While-loop stopping magnitude: ‖δ₆‖ ("norm6", mixes meters and
    # radians — the dICP tolerance=1e-5 convention we reconstruct),
    # translation-only ("trans"), or max-abs component ("maxabs"). Another
    # free choice of the reconstruction; sensitivity measured in the study.
    stop_metric: str = "norm6"  # "norm6" | "trans" | "maxabs"


def _stop_mag(delta: jax.Array, cfg: "ICPConfig") -> jax.Array:
    """Per-item magnitude compared against ``cfg.tolerance`` by the
    while-loop solvers (see ICPConfig.stop_metric)."""
    if cfg.stop_metric == "trans":
        return jnp.linalg.norm(delta[:, :3], axis=-1)
    if cfg.stop_metric == "maxabs":
        return jnp.max(jnp.abs(delta), axis=-1)
    return jnp.linalg.norm(delta, axis=-1)


def robust_weight(r_norm: jax.Array, name: str, k: float) -> jax.Array:
    """IRLS robust weights. r_norm: per-point residual magnitude."""
    if name == "cauchy":
        return 1.0 / (1.0 + (r_norm / k) ** 2)
    if name == "huber":
        abs_r = jnp.maximum(jnp.abs(r_norm), 1e-12)
        return jnp.minimum(jnp.ones_like(abs_r), k / abs_r)
    if name == "none":
        return jnp.ones_like(r_norm)
    raise ValueError(f"unknown robust loss '{name}'")


def _prior_error6(T: jax.Array, T_prior: jax.Array) -> jax.Array:
    """First-order left-trivialized twist of E = T·T_prior⁻¹ (B, 6).

    With the update T ← exp(δ)T, the prior residual e(δ) ≈ e + δ, so the GN
    contribution is A += λI, b += −λe (first-order convention matching the
    reference's `T − I` twist reads, `train_icp_weights.py:192-199`)."""
    from mm_masking_tpu.geom import se3_inv

    E = jnp.matmul(T, se3_inv(T_prior), precision="highest")
    rho = E[..., :3, 3]
    phi = jnp.stack(
        [
            E[..., 2, 1] - E[..., 1, 2],
            E[..., 0, 2] - E[..., 2, 0],
            E[..., 1, 0] - E[..., 0, 1],
        ],
        axis=-1,
    ) * 0.5
    return jnp.concatenate([rho, phi], axis=-1)


def _gn_step(
    T: jax.Array,
    source: jax.Array,
    target_pts: jax.Array,
    target_nrm: jax.Array | None,
    weight: jax.Array,
    source_valid: jax.Array,
    cfg: ICPConfig,
    T_prior: jax.Array | None = None,
    assoc_fn=None,
    idx: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One Gauss-Newton iteration. Returns (T_new, delta (B, 6)).

    ``idx``: optional precomputed association (B, N) — the motion-gated
    while-loop solver passes cached indices here to skip the NN search.
    """
    B, N, _ = source.shape

    # 1. transform source into current estimate frame
    p = (
        jnp.einsum("bij,bnj->bni", T[:, :3, :3], source, precision="highest")
        + T[:, None, :3, 3]
    )

    # 2. associate (discrete; no gradient through the index)
    if idx is None:
        if assoc_fn is None:
            assoc_fn = lambda pp: nn_argmin(  # noqa: E731
                pp, jax.lax.stop_gradient(target_pts),
                use_pallas=cfg.use_pallas_nn,
            )
        idx, _ = assoc_fn(jax.lax.stop_gradient(p))
    q = jnp.take_along_axis(target_pts, idx[..., None], axis=1)  # (B, N, 3)

    # 3. residuals
    diff = p - q
    dist = jnp.linalg.norm(diff + 1e-30, axis=-1)
    if cfg.icp_type == "pt2pl":
        n = jnp.take_along_axis(target_nrm, idx[..., None], axis=1)
        r = jnp.sum(n * diff, axis=-1)  # (B, N) signed
        r_norm = jnp.abs(r) if cfg.robust_on == "residual" else dist
    else:
        r = diff  # (B, N, 3)
        r_norm = dist

    # 4. weights. NaN hygiene is load-bearing: if an item diverges, transformed
    # coordinates overflow f32 and dist/r turn NaN; `0 * NaN = NaN` would then
    # poison the normal equations for the whole batch element permanently.
    # Trimming must therefore be a select, and residuals/points must be zeroed
    # wherever the point is inactive.
    active = jnp.isfinite(dist) & (dist < cfg.trim_dist)
    w = robust_weight(
        jnp.where(active, r_norm, 1.0), cfg.loss_name, cfg.loss_metric
    )
    w = jnp.where(active, w, 0.0)
    w = w * source_valid
    if weight is not None:
        w = w * weight
    r = jnp.where(active if r.ndim == 2 else active[..., None], r, 0.0)
    p = jnp.where(active[..., None], p, 0.0)
    if cfg.icp_type == "pt2pl":
        n = jnp.where(active[..., None], n, 0.0)

    # 5. normal equations over the se(3) perturbation delta (applied on the left)
    #    d(exp(d)x)/dd at 0 = [ I | -x^ ]
    if cfg.icp_type == "pt2pl":
        # J_i = n^T [I | -p^]  -> (B, N, 6)
        Jr = jnp.cross(p, n)  # n^T(-p^) = (p × n)
        J = jnp.concatenate([n, Jr], axis=-1)
        A = jnp.einsum("bni,bnj,bn->bij", J, J, w, precision="highest")
        b = -jnp.einsum("bni,bn,bn->bi", J, r, w, precision="highest")
    else:
        # J_i = [ I | -p^ ] (3x6); closed-form accumulation avoids forming J.
        eye = jnp.eye(3, dtype=p.dtype)
        # Blocks of A = sum w JT J:
        #   [ sum w I        sum w (-p^)^T→(p^)   ]
        #   [ sum w p^T(-p^)... ]
        ph = _hat(p)  # (B, N, 3, 3)
        wph = w[..., None, None] * ph
        A_tt = jnp.sum(w, axis=1)[..., None, None] * eye  # (B, 3, 3)
        A_tr = -jnp.sum(wph, axis=1)  # (B, 3, 3)  == sum w (-p^)
        A_rr = jnp.einsum(
            "bnki,bnkj->bij", ph, wph, precision="highest"
        )  # sum w (p^)^T (p^) = sum w (-p^)^T(-p^)
        A = jnp.concatenate(
            [
                jnp.concatenate([A_tt, A_tr], axis=-1),
                jnp.concatenate([jnp.swapaxes(A_tr, -1, -2), A_rr], axis=-1),
            ],
            axis=-2,
        )
        b_t = -jnp.einsum("bni,bn->bi", r, w, precision="highest")
        b_r = jnp.einsum(
            "bnij,bnj->bi", jnp.swapaxes(wph, -1, -2), r, precision="highest"
        )
        b = jnp.concatenate([b_t, b_r], axis=-1)

    if cfg.prior_weight > 0.0 and T_prior is not None:
        e6 = _prior_error6(T, T_prior)
        lam_p = jnp.asarray(cfg.prior_weight, A.dtype)
        A = A + lam_p * jnp.eye(6, dtype=A.dtype)
        b = b - lam_p * e6

    if cfg.dim == 2:
        sel = jnp.asarray(_PLANAR_DOF)
        A_sub = A[:, sel][:, :, sel]
        b_sub = b[:, sel]
        # Trace-relative Levenberg floor (see ICPConfig.damping_rel).
        tr3 = (A_sub[:, 0, 0] + A_sub[:, 1, 1] + A_sub[:, 2, 2]) / 3.0
        lam = cfg.damping + cfg.damping_rel * tr3
        A_sub = A_sub + lam[:, None, None] * jnp.eye(3, dtype=A.dtype)
        d_sub = _solve3x3(A_sub, b_sub)
        delta = jnp.zeros((B, 6), A.dtype)
        delta = delta.at[:, sel].set(d_sub)
    else:
        tr6 = jnp.trace(A, axis1=-2, axis2=-1) / 6.0
        lam = cfg.damping + cfg.damping_rel * tr6
        A = A + lam[:, None, None] * jnp.eye(6, dtype=A.dtype)
        delta = jnp.linalg.solve(A, b[..., None])[..., 0]
    # A diverged item must not turn the whole composed pose chain NaN.
    delta = jnp.where(jnp.isfinite(delta), delta, 0.0)

    if cfg.max_step_m > 0.0:
        # Trust region: scale the whole twist so the translation magnitude
        # stays within max_step_m (see ICPConfig.max_step_m). Formulated so
        # every VJP factor is finite even at delta == 0 (a dead system):
        # max(t², max²) floors the sqrt/divide operands at max_step (≥ the
        # clamp, never near f32 underflow), and the maximum routes the
        # cotangent to the constant branch when the clamp is inactive —
        # a naive min(1, max/‖t‖) NaNs there (t² underflows to 0 → the
        # norm's 0/0 VJP), which is how this was first written. Inactive
        # clamp ⇒ scale == 1.0 exactly ⇒ delta unchanged bitwise.
        t_sq = jnp.sum(delta[:, :3] * delta[:, :3], axis=-1)
        t_floor = jnp.sqrt(jnp.maximum(t_sq, cfg.max_step_m**2))
        scale = cfg.max_step_m / t_floor
        delta = delta * scale[:, None]

    if cfg.dim == 2 and cfg.planar_retraction == "direct":
        # Raw-translation planar retraction (see ICPConfig.planar_retraction).
        dth = delta[:, 5]
        c, s = jnp.cos(dth), jnp.sin(dth)
        Td = jnp.zeros_like(T)
        Td = Td.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
        Td = Td.at[:, 1, 0].set(s).at[:, 1, 1].set(c)
        Td = Td.at[:, 2, 2].set(1.0).at[:, 3, 3].set(1.0)
        Td = Td.at[:, 0, 3].set(delta[:, 0]).at[:, 1, 3].set(delta[:, 1])
        T_new = jnp.matmul(Td, T, precision="highest")
    else:
        T_new = jnp.matmul(se3_exp(delta), T, precision="highest")
    return T_new, delta


@jax.custom_vjp
def _solve3x3(A: jax.Array, b: jax.Array) -> jax.Array:
    """Closed-form (adjugate/Cramer) solve of batched 3x3 systems.

    `jnp.linalg.solve` lowers to a general LU factorization — needless weight
    for the damped, symmetric 3x3 normal equations in the planar GN step; the
    cofactor form is a handful of fused VPU ops.

    The VJP is the standard linear-solve adjoint (b̄ = A⁻ᵀ x̄, Ā = −b̄ xᵀ,
    computed via the same cofactor solve) rather than autodiff of the cofactor
    arithmetic: the latter carries 1/det² terms, and a near-dead damped system
    (all weights trimmed → A ≈ λI with λ ≈ 1e-9 → det ≈ 1e-27) overflows
    1/det² past f32 range — one diverged batch item then NaN-poisons the whole
    step's gradient (observed in training: apply_if_finite dropped 3 of every
    4 updates). Same mathematical derivative, identical for healthy systems to
    rounding; finite (merely large) for near-singular ones.
    """
    return _solve3x3_impl(A, b)


def _solve3x3_impl(A: jax.Array, b: jax.Array) -> jax.Array:
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    inv_det = 1.0 / det
    x0 = (c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]) * inv_det
    x1 = (c10 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]) * inv_det
    x2 = (c20 * b[..., 0] + c21 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def _solve3x3_fwd(A, b):
    x = _solve3x3_impl(A, b)
    return x, (A, x)


def _solve3x3_bwd(res, g):
    A, x = res
    gb = _solve3x3_impl(jnp.swapaxes(A, -1, -2), g)  # A⁻ᵀ x̄
    gA = -gb[..., :, None] * x[..., None, :]
    return gA, gb


_solve3x3.defvjp(_solve3x3_fwd, _solve3x3_bwd)


def _hat(p: jax.Array) -> jax.Array:
    """(…, 3) -> (…, 3, 3) skew matrices (batched over two leading dims)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def icp(
    source: jax.Array,
    target: jax.Array,
    T_init: jax.Array,
    weight: jax.Array | None = None,
    cfg: ICPConfig = ICPConfig(),
    T_prior: jax.Array | None = None,
) -> dict[str, Any]:
    """Run batched ICP. Mirrors ``dICP.ICP.icp``'s call signature semantics.

    Args:
      source: (B, N, 3) scan points, zero-padded rows allowed (x=y=0 rows are
        masked out, the dataset pad convention).
      target: (B, M, 3) or (B, M, 6) map points (+normals for pt2pl), padded
        with ``cfg.target_pad_val`` rows.
      T_init: (B, 4, 4) initial guess.
      weight: optional (B, N) per-source-point weights.
      T_prior: optional (B, 4, 4) motion prior, fused into every GN solve
        with information weight ``cfg.prior_weight`` (WNOA-style).

    Returns dict with 'T' (B, 4, 4) plus diagnostics.
    """
    source = source[..., :3]

    stripe = cfg.nn_stripe
    if stripe is None:
        stripe = target.shape[1] >= 4096
    assoc_fn = None

    source_valid = ~(
        (source[..., 0] == 0.0) & (source[..., 1] == 0.0)
    )
    source_valid = source_valid.astype(source.dtype)

    if stripe:
        from mm_masking_tpu.ops.pallas.nn_assoc import (
            coord_major,
            nn_argmin_stripe_presorted,
            stripe_sort_target,
        )

        # Sort the map by its widest planar axis ONCE per solve; every
        # iteration then associates against contiguous sorted windows. The
        # source rows are permuted once by their initial-guess key (the GN
        # normal-equation sums are row-order invariant, so the returned pose
        # is unchanged; the weight gradient is permuted back by the
        # differentiable gather below). Sorting per iteration instead costs
        # more than the stripe saves (measured on v5e).
        # Associations are verified exact-within-trim vs the dense kernel on
        # TPU; poses can still differ at f32-rounding order on batch items
        # where the solve itself diverges (permuted rows → different
        # reduction order, amplified by a chaotic trajectory) — both outputs
        # are equally valid solver results there.
        # The sorted target keeps the raw target's VALUE gradient (only the
        # sort keys/permutation are stop-gradient inside stripe_sort_target),
        # so ∂/∂target flows through the residual q-gather exactly as in the
        # dense path.
        target, key_sorted, use_x = stripe_sort_target(
            target, pad_val=cfg.target_pad_val
        )
        p0 = jax.lax.stop_gradient(
            jnp.einsum("bij,bnj->bni", T_init[:, :3, :3], source,
                       precision="highest")
            + T_init[:, None, :3, 3]
        )
        p0_key = jnp.where(use_x[:, None], p0[..., 0], p0[..., 1])
        order = jnp.argsort(p0_key, axis=1)  # (B, N)
        source = jnp.take_along_axis(source, order[..., None], axis=1)
        source_valid = jnp.take_along_axis(source_valid, order, axis=1)
        if weight is not None:
            weight = jnp.take_along_axis(weight, order, axis=1)
        q_sorted_sg = jax.lax.stop_gradient(target[..., :3])
        use_pallas = cfg.use_pallas_nn
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        assoc_fn = functools.partial(
            nn_argmin_stripe_presorted,
            q_sorted=q_sorted_sg,
            key_sorted=key_sorted,
            use_x=use_x,
            trim_dist=cfg.trim_dist,
            window=cfg.nn_stripe_window or None,
            tn=cfg.nn_stripe_tile,
            use_pallas=use_pallas,
            # Hoist the kernel's coord-major map relayout out of the GN loop.
            qt_sorted=coord_major(q_sorted_sg) if use_pallas else None,
        )

    target_pts = target[..., :3]
    target_nrm = target[..., 3:6] if target.shape[-1] >= 6 else None
    if cfg.icp_type == "pt2pl" and target_nrm is None:
        raise ValueError("pt2pl requires target with normals (B, M, 6)")

    step = functools.partial(
        _gn_step,
        source=source,
        target_pts=target_pts,
        target_nrm=target_nrm,
        weight=weight,
        source_valid=source_valid,
        cfg=cfg,
        T_prior=T_prior,
        assoc_fn=assoc_fn,
    )

    if cfg.differentiable:

        def body(T, _):
            T_new, delta = step(T)
            return T_new, jnp.linalg.norm(delta, axis=-1)

        if cfg.remat_iters:
            # prevent_cse=False is safe (and faster) under scan: the staging
            # of each iteration already prevents cross-iteration CSE.
            body = jax.checkpoint(body, prevent_cse=False)

        T_final, delta_hist = jax.lax.scan(
            body, T_init, None, length=cfg.max_iterations
        )
        return {"T": T_final, "delta_norms": delta_hist}

    B, N = source.shape[0], source.shape[1]

    if cfg.nn_refresh_dist <= 0.0:
        # Reference semantics: associate every iteration; each item stops
        # the moment ITS update drops under tolerance (dICP's ‖δ‖ < tol
        # break is per solve — batching must not keep refining items past
        # their stop point). Unlike motion-gated refresh this early-exit is
        # EXACT: a stopped item's pose is frozen, so skipping its O(N·M)
        # search changes nothing. The adaptive stripe kernel drops stopped
        # items' tiles entirely (DMA aliased, compute predicated off) —
        # tolerance-limited eval solves then pay per-item cost proportional
        # to each item's own iteration count, not the batch maximum
        # (VERDICT r4 #3: the refresh-0 50-iter b32 ICP was 4× the gated
        # variant purely from converged items re-searching).
        def cond(state):
            T, it, dn, idx = state
            return jnp.logical_and(
                it < cfg.max_iterations, jnp.max(dn) >= cfg.tolerance
            )

        def wbody(state):
            T, it, dn, idx0 = state
            run = dn >= cfg.tolerance  # (B,) items still iterating
            if assoc_fn is not None:
                p = jax.lax.stop_gradient(
                    jnp.einsum("bij,bnj->bni", T[:, :3, :3], source,
                               precision="highest")
                    + T[:, None, :3, 3]
                )
                idx_new, _d = assoc_fn(p, refresh=run)
                idx = jnp.where(run[:, None], idx_new, idx0)
                T_new, delta = step(T, idx=idx)
            else:
                # dense path: no per-item skip machinery — full recompute,
                # the freeze below still enforces the per-item stop
                T_new, delta = step(T)
                idx = idx0
            ndn = _stop_mag(delta, cfg)
            T_out = jnp.where(run[:, None, None], T_new, T)
            dn_out = jnp.where(run, ndn, dn)  # stopped items stay < tol
            return (T_out, it + 1, dn_out, idx)

        init = (T_init, jnp.int32(0), jnp.full((B,), jnp.inf, T_init.dtype),
                jnp.zeros((B, N), jnp.int32))
        T_final, n_iter, dn, _ = jax.lax.while_loop(cond, wbody, init)
        return {"T": T_final, "iterations": n_iter, "delta_norm": dn}

    # Motion-gated association refresh: once the pose stops moving more than
    # nn_refresh_dist (worst-case over every point, rotation at lever arm
    # nn_refresh_range), the NN indices cannot change — skip the O(N·M)
    # search and rerun only the GN update on the cached indices. Tolerance-
    # limited late iterations (deltas at the f32 noise floor) then cost the
    # solve, not the search.
    default_assoc = assoc_fn or (
        lambda pp: nn_argmin(
            pp, jax.lax.stop_gradient(target_pts), use_pallas=cfg.use_pallas_nn
        )
    )

    def eff_motion(delta):
        # Per-item worst-case point displacement of this GN update.
        trans = jnp.linalg.norm(delta[:, :3], axis=-1)
        rot = jnp.linalg.norm(delta[:, 3:], axis=-1)
        return trans + cfg.nn_refresh_range * rot  # (B,)

    def cond2(state):
        T, it, dn, idx, moved = state
        return jnp.logical_and(
            it < cfg.max_iterations, jnp.max(dn) >= cfg.tolerance
        )

    def wbody2(state):
        T, it, _, idx0, moved = state
        p = jax.lax.stop_gradient(
            jnp.einsum("bij,bnj->bni", T[:, :3, :3], source,
                       precision="highest")
            + T[:, None, :3, 3]
        )
        # PER-ITEM gate: each batch item re-associates only when ITS pose
        # has moved ≥ nn_refresh_dist since its last search. Items that have
        # converged (or merely jitter below the gate) stop paying the
        # O(N·M) search even while other items in the batch still move —
        # the stripe kernel skips their tiles entirely (nblk = 0); other
        # association paths recompute and the select below discards it.
        need = jnp.logical_or(it == 0, moved >= cfg.nn_refresh_dist)  # (B,)

        def do_assoc(_):
            if assoc_fn is not None:
                idx_new, _d = assoc_fn(p, refresh=need)
            else:
                idx_new, _d = default_assoc(p)
            return jnp.where(need[:, None], idx_new, idx0)

        idx = jax.lax.cond(
            jnp.any(need), do_assoc, lambda _: idx0, None
        )
        T_new, delta = step(T, idx=idx)
        moved_new = jnp.where(need, 0.0, moved) + eff_motion(delta)
        return (T_new, it + 1, _stop_mag(delta, cfg), idx, moved_new)

    init2 = (
        T_init,
        jnp.int32(0),
        jnp.full((B,), jnp.inf, T_init.dtype),
        jnp.zeros((B, N), jnp.int32),
        jnp.full((B,), jnp.inf, T_init.dtype),
    )
    T_final, n_iter, dn, _, _ = jax.lax.while_loop(cond2, wbody2, init2)
    return {"T": T_final, "iterations": n_iter, "delta_norm": dn}


# ---------------------------------------------------------------------------
# Implicit differentiation (optional mode; SURVEY.md §7.3 "improvement").
#
# The unrolled mode differentiates through every GN iteration (the reference's
# fidelity target). `icp_implicit` instead runs the fast non-differentiable
# while-loop solver to convergence and applies the implicit function theorem
# at the fixed point: with g(δ, w) = Σᵢ Wᵢ Jᵢᵀ rᵢ = 0 at the solution (W =
# input · robust · trim weights), dδ*/dw = −H⁻¹ ∂g/∂w with H ≈ Σᵢ Wᵢ JᵢᵀJᵢ
# (the GN Hessian; correspondences and robust weights frozen — the standard
# declarative-layer approximation). Backward cost is one 3×3 solve instead of
# storing/replaying the unroll; gradients propagate to the per-point weights
# only (the trained input in this framework).
# ---------------------------------------------------------------------------


def _planar_generators(T: jax.Array) -> jax.Array:
    """(B, 3, 4, 4): d/dδ_k [exp(δ)T] at δ=0 for the planar dofs (x, y, yaw)."""
    B = T.shape[0]
    E = jnp.zeros((3, 4, 4), T.dtype)
    E = E.at[0, 0, 3].set(1.0)  # x
    E = E.at[1, 1, 3].set(1.0)  # y
    E = E.at[2, 0, 1].set(-1.0).at[2, 1, 0].set(1.0)  # yaw
    return jnp.einsum("kac,bcd->bkad", E, T, precision="highest")


def _residual_terms(T, source, target_pts, target_nrm, weight, source_valid,
                    cfg: ICPConfig):
    """Shared forward terms at the solution: (Jᵀr)_planar (B,N,3), modifier m,
    and the planar GN Hessian H (B,3,3)."""
    p = (
        jnp.einsum("bij,bnj->bni", T[:, :3, :3], source, precision="highest")
        + T[:, None, :3, 3]
    )
    idx, _ = nn_argmin(p, target_pts, use_pallas=cfg.use_pallas_nn)
    q = jnp.take_along_axis(target_pts, idx[..., None], axis=1)
    diff = p - q
    dist = jnp.linalg.norm(diff + 1e-30, axis=-1)
    if cfg.icp_type == "pt2pl":
        n = jnp.take_along_axis(target_nrm, idx[..., None], axis=1)
        r = jnp.sum(n * diff, axis=-1)
        r_norm = jnp.abs(r)
        Jt_r = jnp.stack(
            [
                n[..., 0] * r,
                n[..., 1] * r,
                (p[..., 0] * n[..., 1] - p[..., 1] * n[..., 0]) * r,
            ],
            axis=-1,
        )
        J_planar = jnp.stack(
            [n[..., 0], n[..., 1],
             p[..., 0] * n[..., 1] - p[..., 1] * n[..., 0]], axis=-1
        )  # (B, N, 3) scalar-residual Jacobian
        H_outer = jnp.einsum("bni,bnj->bnij", J_planar, J_planar,
                             precision="highest")
    else:
        r = diff
        r_norm = dist
        # J = [I | -p^]; planar rows: x, y, yaw. Jᵀr planar components:
        Jt_r = jnp.stack(
            [
                r[..., 0],
                r[..., 1],
                p[..., 0] * r[..., 1] - p[..., 1] * r[..., 0],
            ],
            axis=-1,
        )
        # JᵀJ planar block for a 3-vector residual:
        #   [[1, 0, -p_y], [0, 1, p_x], [-p_y, p_x, p_x²+p_y²]]
        px, py = p[..., 0], p[..., 1]
        one = jnp.ones_like(px)
        zero = jnp.zeros_like(px)
        H_outer = jnp.stack(
            [
                jnp.stack([one, zero, -py], axis=-1),
                jnp.stack([zero, one, px], axis=-1),
                jnp.stack([-py, px, px * px + py * py], axis=-1),
            ],
            axis=-2,
        )
    active = jnp.isfinite(dist) & (dist < cfg.trim_dist)
    m = robust_weight(
        jnp.where(active, r_norm, 1.0), cfg.loss_name, cfg.loss_metric
    )
    m = jnp.where(active, m, 0.0) * source_valid
    Jt_r = jnp.where(active[..., None], Jt_r, 0.0)
    H_outer = jnp.where(active[..., None, None], H_outer, 0.0)
    W = m * (weight if weight is not None else 1.0)
    H = jnp.einsum("bn,bnij->bij", W, H_outer, precision="highest")
    return Jt_r, m, H


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def icp_implicit(source, target, T_init, weight, cfg: ICPConfig):
    """Converged ICP pose with implicit-function-theorem gradients w.r.t.
    ``weight``. Forward = the while-loop solver; backward = one damped 3×3
    solve. Gradients w.r.t. source/target/T_init are not propagated."""
    run_cfg = dataclasses.replace(cfg, differentiable=False)
    return icp(source, target, T_init, weight=weight, cfg=run_cfg)["T"]


def _icp_implicit_fwd(source, target, T_init, weight, cfg):
    T = icp_implicit(source, target, T_init, weight, cfg)
    return T, (source, target, T, weight)


def _icp_implicit_bwd(cfg, res, dT):
    source, target, T, weight = res
    source = source[..., :3]
    target_pts = target[..., :3]
    target_nrm = target[..., 3:6] if target.shape[-1] >= 6 else None
    source_valid = (
        ~((source[..., 0] == 0.0) & (source[..., 1] == 0.0))
    ).astype(source.dtype)

    Jt_r, m, H = _residual_terms(
        T, source, target_pts, target_nrm, weight, source_valid, cfg
    )
    # Cotangent on the planar chart: dδ_k = <dT, E_k T>.
    G = _planar_generators(T)  # (B, 3, 4, 4)
    d_delta = jnp.einsum("bxy,bkxy->bk", dT, G, precision="highest")
    H = H + cfg.damping * jnp.eye(3, dtype=H.dtype)
    lam = _solve3x3(H, d_delta)  # (B, 3)
    # g_k = Σᵢ wᵢ mᵢ (Jᵀr)ᵢₖ ; δ* moves as −H⁻¹ g ⇒ dL/dwᵢ = −λᵀ mᵢ (Jᵀr)ᵢ.
    dw = -jnp.einsum("bk,bn,bnk->bn", lam, m, Jt_r, precision="highest")
    return (
        jnp.zeros_like(source),
        jnp.zeros_like(target),
        jnp.zeros_like(jnp.asarray(res[2])),  # T_init cotangent (unused)
        dw,
    )


icp_implicit.defvjp(_icp_implicit_fwd, _icp_implicit_bwd)


class ICP:
    """Object wrapper mirroring the reference's ``dICP.ICP`` construction
    pattern (`icp_weight_policy.py:53-55`)."""

    def __init__(
        self,
        icp_type: str = "pt2pt",
        differentiable: bool = True,
        max_iterations: int = 10,
        tolerance: float = 1e-5,
        target_pad_val: float = TARGET_PAD_VAL,
        use_pallas_nn: bool | None = None,
    ):
        self.target_pad_val = target_pad_val
        self._base = ICPConfig(
            icp_type=icp_type,
            max_iterations=max_iterations,
            tolerance=tolerance,
            differentiable=differentiable,
            target_pad_val=target_pad_val,
            use_pallas_nn=use_pallas_nn,
        )

    def icp(
        self,
        source,
        target,
        T_init,
        weight=None,
        trim_dist: float = 5.0,
        loss_fn: dict | None = None,
        dim: int = 2,
    ):
        loss_fn = loss_fn or {"name": "cauchy", "metric": 1.0}
        cfg = dataclasses.replace(
            self._base,
            trim_dist=trim_dist,
            loss_name=loss_fn["name"],
            loss_metric=float(loss_fn.get("metric", 1.0)),
            dim=dim,
        )
        return icp(source, target, T_init, weight=weight, cfg=cfg)
