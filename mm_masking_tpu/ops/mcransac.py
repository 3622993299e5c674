"""Batched planar RANSAC rigid-motion estimator (vtr `radar.mcransac`).

Capability rebuild of the reference's (configured but disabled) MC-RANSAC
module (`/root/reference/gen_data/config/radar_config.yaml:140-158` — the C++
lives in the empty vtr3 submodule; the knobs define the surface: ``tolerance``
squared-error inlier gate, ``inlier_ratio`` early-stop target, ``iterations``
hypothesis count, ``max_gn_iterations``/``epsilon_converge`` refinement,
``filter_pc``/``init_icp`` outputs).

TPU-first reshaping:
  * The CPU module samples hypotheses serially and breaks early at
    ``inlier_ratio``. On TPU all ``iterations`` hypotheses evaluate in
    parallel as one batched program (a (R, N) residual matrix on the VPU) —
    wall-clock is one pass regardless of when a CPU loop would have stopped,
    so early-exit would only add control-flow overhead.
  * Refinement on inliers: the reference runs Gauss-Newton; for the planar
    rigid case weighted 2-D Procrustes is the *closed-form* global optimum of
    the same least-squares problem, so one Procrustes solve replaces the GN
    loop (``max_gn_iterations``/``epsilon_converge`` are accepted and
    honored as an iterated-reweighting cap: re-gate inliers, re-solve, stop
    when the pose update norm drops below epsilon).

Correspondences come from the caller (descriptor matching or NN association);
``mc`` motion compensation hooks in by unwarping the source points with a
per-point-time velocity estimate before calling (see
`localization.odometry.TeachPass.velocity_estimate`).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    tolerance: float = 0.1225  # squared inlier gate (m²)
    inlier_ratio: float = 0.9  # target ratio (diagnostic `ok` flag on TPU)
    iterations: int = 100  # hypothesis count
    max_gn_iterations: int = 10  # re-gate/re-solve refinement cap
    epsilon_converge: float = 1e-4


def _procrustes_2d(src, tgt, w):
    """Weighted planar rigid alignment: R, t minimizing Σ w‖R p + t − q‖²."""
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    mu_s = jnp.sum(src * w[..., None], axis=-2) / wsum
    mu_t = jnp.sum(tgt * w[..., None], axis=-2) / wsum
    ps = src - mu_s[..., None, :]
    pt = tgt - mu_t[..., None, :]
    # 2x2 cross-covariance; planar rotation angle in closed form.
    a = jnp.sum(w * (ps[..., 0] * pt[..., 0] + ps[..., 1] * pt[..., 1]), axis=-1)
    b = jnp.sum(w * (ps[..., 0] * pt[..., 1] - ps[..., 1] * pt[..., 0]), axis=-1)
    theta = jnp.arctan2(b, a)
    c, s = jnp.cos(theta), jnp.sin(theta)
    R = jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
    )  # (..., 2, 2)
    t = mu_t - jnp.einsum("...ij,...j->...i", R, mu_s)
    return R, t, theta


def _to_se3(R2, t2, dtype):
    batch = R2.shape[:-2]
    T = jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch + (4, 4))
    T = T.at[..., :2, :2].set(R2)
    T = T.at[..., :2, 3].set(t2)
    return T


def mcransac(
    src: jax.Array,
    tgt: jax.Array,
    valid: jax.Array | None = None,
    cfg: RansacConfig = RansacConfig(),
    rng: jax.Array | None = None,
) -> dict:
    """Estimate the planar rigid transform mapping matched ``src[i] → tgt[i]``.

    src/tgt: (B, N, 2/3) matched correspondences (pads allowed where
    ``valid`` is False). Returns {'T' (B, 4, 4), 'inliers' (B, N) bool,
    'inlier_frac' (B,), 'ok' (B,) — inlier_frac ≥ cfg.inlier_ratio}.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    B, N = src.shape[:2]
    s2 = src[..., :2]
    t2 = tgt[..., :2]
    if valid is None:
        valid = jnp.ones((B, N), bool)
    vf = valid.astype(s2.dtype)

    # All hypotheses at once: R pairs of 2 distinct indices per batch item.
    R_it = cfg.iterations
    k1, k2 = jax.random.split(rng)
    i1 = jax.random.randint(k1, (B, R_it), 0, N)
    off = jax.random.randint(k2, (B, R_it), 1, N)
    i2 = (i1 + off) % N

    def gather(pts, idx):
        return jnp.take_along_axis(pts, idx[..., None], axis=1)

    p1, p2 = gather(s2, i1), gather(s2, i2)  # (B, R, 2)
    q1, q2 = gather(t2, i1), gather(t2, i2)
    v_hyp = (
        gather(vf[..., None], i1)[..., 0] * gather(vf[..., None], i2)[..., 0]
    )  # (B, R)

    # Two-point planar hypothesis: rotation aligning the chord, translation
    # from the first pair.
    dp = p2 - p1
    dq = q2 - q1
    theta = jnp.arctan2(
        dp[..., 0] * dq[..., 1] - dp[..., 1] * dq[..., 0],
        dp[..., 0] * dq[..., 0] + dp[..., 1] * dq[..., 1],
    )
    c, s = jnp.cos(theta), jnp.sin(theta)
    Rh = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    th = q1 - jnp.einsum("brij,brj->bri", Rh, p1)

    # Residuals of every point under every hypothesis: (B, R, N).
    pred = jnp.einsum("brij,bnj->brni", Rh, s2) + th[..., None, :]
    r2 = jnp.sum((pred - t2[..., None, :, :]) ** 2, axis=-1)
    inl = (r2 < cfg.tolerance) & valid[:, None, :]
    counts = jnp.sum(inl, axis=-1) * v_hyp.astype(jnp.int32)
    best = jnp.argmax(counts, axis=-1)  # (B,)

    inliers = jnp.take_along_axis(inl, best[:, None, None], axis=1)[:, 0]

    # Iterated re-gate/re-solve refinement (closed-form Procrustes per pass).
    def body(state):
        it, w, theta_prev, _ = state
        Rr, tr, theta = _procrustes_2d(s2, t2, w * vf)
        pred = jnp.einsum("bij,bnj->bni", Rr, s2) + tr[:, None, :]
        r2 = jnp.sum((pred - t2) ** 2, axis=-1)
        w_new = ((r2 < cfg.tolerance) & valid).astype(s2.dtype)
        return it + 1, w_new, theta, jnp.abs(theta - theta_prev)

    def cond(state):
        it, _, _, dtheta = state
        return (it < cfg.max_gn_iterations) & jnp.any(
            dtheta > cfg.epsilon_converge
        )

    w0 = inliers.astype(s2.dtype)
    _, w_fin, _, _ = jax.lax.while_loop(
        cond, body, (0, w0, jnp.zeros((B,), s2.dtype), jnp.full((B,), jnp.inf))
    )
    Rr, tr, _ = _procrustes_2d(s2, t2, w_fin * vf)

    inliers_fin = w_fin > 0.5
    n_valid = jnp.maximum(jnp.sum(valid, axis=-1), 1)
    frac = jnp.sum(inliers_fin & valid, axis=-1) / n_valid
    return {
        "T": _to_se3(Rr, tr, s2.dtype),
        "inliers": inliers_fin & valid,
        "inlier_frac": frac,
        "ok": frac >= cfg.inlier_ratio,
    }


def ransac_filter_pc(pc: jax.Array, inliers: jax.Array) -> jax.Array:
    """`filter_pc` output flavor: zero out outlier rows (the downstream
    (0, 0) pad convention drops them from weighting/ICP)."""
    return jnp.where(inliers[..., None], pc, jnp.zeros_like(pc))
