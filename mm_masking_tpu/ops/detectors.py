"""Navtech radar detector family: kstrongest / cen2018 / cacfar / oscfar /
modified_cacfar.

Capability-parity rebuild of vtr_radar's `navtech_extractor` detector bank
(`/root/reference/gen_data/config/radar_config.yaml:84-118` — the vtr3
submodule is empty in the snapshot; semantics reconstructed from the config
schema and the published detector definitions: Cen & Newman 2018 for cen2018,
standard CA/OS-CFAR, and the reference's own GO-CFAR port in
`mm_masking/radar_utils.py:29-69` for modified_cacfar). Every detector is a
batched, fixed-shape JAX op over (B, A, R) polar power returning a {0,1}
detection mask that feeds :func:`mm_masking_tpu.ops.cfar.extract_pc`.

Window statistics use cumulative sums (O(R), VPU-friendly) rather than the
per-column loops a direct port would have; OS-CFAR's k-th order statistic uses
a top-k over the fixed window gathered per column.

Doppler correction: the Navtech FMCW sensor shifts returns in range by
``beta * v_radial`` (`radar_config.yaml:92`, beta = 0.049); ``doppler_shift``
applies the per-azimuth range correction given the platform velocity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _range_band_mask(R: int, res: float, minr: float, maxr: float, dtype):
    rng = jnp.arange(R, dtype=dtype) * res
    return ((rng >= minr) & (rng <= maxr)).astype(dtype)


def _window_sums(x: jax.Array, w2: int, guard: int):
    """(left_sum, right_sum, both_count) of the train window around each bin.

    left window [i - w2 - guard, i - guard), right (i + guard, i + w2 + guard];
    out-of-range parts are clipped (partial windows at the edges).
    """
    B, A, R = x.shape
    csum = jnp.concatenate(
        [jnp.zeros(x.shape[:-1] + (1,), x.dtype), jnp.cumsum(x, axis=-1)], axis=-1
    )
    idx = jnp.arange(R)

    def seg(lo, hi):
        lo = jnp.clip(lo, 0, R)
        hi = jnp.clip(hi, 0, R)
        return (
            jnp.take(csum, hi, axis=-1) - jnp.take(csum, lo, axis=-1),
            (hi - lo).astype(x.dtype),
        )

    left, n_left = seg(idx - w2 - guard, idx - guard)
    right, n_right = seg(idx + guard + 1, idx + w2 + guard + 1)
    return left, right, n_left, n_right


def kstrongest(
    raw: jax.Array,
    res: float,
    kstrong: int = 12,
    threshold2: float = 0.0,
    threshold3: float = 0.216,
    minr: float = 2.0,
    maxr: float = 80.0,
) -> jax.Array:
    """Keep the k strongest bins per azimuth above ``t2·mean + t3``."""
    B, A, R = raw.shape
    band = _range_band_mask(R, res, minr, maxr, raw.dtype)
    x = raw * band
    mean = jnp.sum(x, axis=-1, keepdims=True) / jnp.maximum(
        jnp.sum(band), 1.0
    )
    thresh = threshold2 * mean + threshold3
    # k-th largest value per azimuth as the adaptive floor.
    topk = jax.lax.top_k(x, kstrong)[0][..., -1:]
    return ((x >= jnp.maximum(topk, thresh)) & (x > 0)).astype(raw.dtype)


def cen2018(
    raw: jax.Array,
    res: float,
    zq: float = 2.5,
    sigma: int = 8,
    minr: float = 2.0,
    maxr: float = 80.0,
) -> jax.Array:
    """Cen & Newman (ICRA 2018) detector.

    Gaussian-smooth each azimuth, subtract the azimuth mean, and mark bins whose
    deviation exceeds ``zq`` times the azimuth's noise scale (std of the
    negative deviations, a robust noise estimate).
    """
    B, A, R = raw.shape
    half = 2 * sigma
    t = jnp.arange(-half, half + 1, dtype=raw.dtype)
    g = jnp.exp(-0.5 * (t / sigma) ** 2)
    g = g / jnp.sum(g)
    smoothed = jax.vmap(
        lambda img: jax.vmap(
            lambda row: jnp.convolve(row, g, mode="same")
        )(img)
    )(raw)

    mean = jnp.mean(smoothed, axis=-1, keepdims=True)
    q = smoothed - mean
    neg = jnp.where(q < 0, q, 0.0)
    n_neg = jnp.maximum(jnp.sum(q < 0, axis=-1, keepdims=True), 1)
    sigma_q = jnp.sqrt(jnp.sum(neg * neg, axis=-1, keepdims=True) / n_neg)

    band = _range_band_mask(R, res, minr, maxr, raw.dtype)
    return ((q > zq * sigma_q) & (band > 0)).astype(raw.dtype)


def cacfar(
    raw: jax.Array,
    res: float,
    width: int = 41,
    guard: int = 2,
    threshold: float = 1.0,
    threshold2: float = 0.0,
    threshold3: float = 0.08,
    minr: float = 2.0,
    maxr: float = 80.0,
) -> jax.Array:
    """Cell-averaging CFAR: ``T = t1·Z + t2·mean + t3`` with Z the mean of the
    train cells on both sides of the guard band."""
    width = width + 1 if width % 2 == 0 else width
    w2 = width // 2
    left, right, n_l, n_r = _window_sums(raw, w2, guard)
    Z = (left + right) / jnp.maximum(n_l + n_r, 1.0)
    mean = jnp.mean(raw, axis=-1, keepdims=True)
    T = threshold * Z + threshold2 * mean + threshold3
    band = _range_band_mask(raw.shape[-1], res, minr, maxr, raw.dtype)
    return ((raw > T) & (band > 0)).astype(raw.dtype)


def oscfar(
    raw: jax.Array,
    res: float,
    width: int = 41,
    guard: int = 0,
    kstat: int = 20,
    threshold: float = 1.0,
    threshold2: float = 0.0,
    threshold3: float = 0.07,
    minr: float = 2.0,
    maxr: float = 80.0,
) -> jax.Array:
    """Ordered-statistics CFAR: Z = k-th smallest of the train window."""
    width = width + 1 if width % 2 == 0 else width
    w2 = width // 2
    B, A, R = raw.shape
    # Gather the train window for every column: offsets excluding guard cells.
    offs = jnp.concatenate(
        [jnp.arange(-w2 - guard, -guard), jnp.arange(guard + 1, w2 + guard + 1)]
    )
    idx = jnp.arange(R)[:, None] + offs[None, :]  # (R, W)
    valid = (idx >= 0) & (idx < R)
    idx = jnp.clip(idx, 0, R - 1)
    win = raw[..., idx]  # (B, A, R, W)
    # Out-of-range cells become +inf so they sort to the top and never enter
    # the k-th smallest statistic.
    win = jnp.where(valid[None, None], win, jnp.inf)
    k = jnp.clip(kstat, 1, offs.shape[0])
    # k-th smallest = -(top_k of negated values)[k-1]
    kth = -jax.lax.top_k(-win, k)[0][..., -1]
    kth = jnp.where(jnp.isfinite(kth), kth, 0.0)
    mean = jnp.mean(raw, axis=-1, keepdims=True)
    T = threshold * kth + threshold2 * mean + threshold3
    band = _range_band_mask(R, res, minr, maxr, raw.dtype)
    return ((raw > T) & (band > 0)).astype(raw.dtype)


def modified_cacfar(
    raw: jax.Array,
    res: float,
    width: int = 101,
    guard: int = 5,
    threshold: float = 1.0,
    threshold2: float = 0.0,
    threshold3: float = 0.09,
    minr: float = 2.0,
    maxr: float = 80.0,
) -> jax.Array:
    """The greatest-of variant the training pipeline uses
    (`radar_config.yaml:113-118`; identical statistic to
    :func:`mm_masking_tpu.ops.cfar.cfar_mask` plus the mean term)."""
    from mm_masking_tpu.ops.cfar import cfar_mask

    mask = cfar_mask(
        raw, res, width=width, minr=minr, maxr=maxr, guard=guard,
        a_thresh=threshold, b_thresh=threshold3, diff=False,
    )
    if threshold2 != 0.0:
        mean = jnp.mean(raw, axis=-1, keepdims=True)
        extra = (raw > threshold2 * mean).astype(raw.dtype)
        mask = mask * extra
    return mask


DETECTORS = {
    "kstrongest": kstrongest,
    "cen2018": cen2018,
    "cacfar": cacfar,
    "oscfar": oscfar,
    "modified_cacfar": modified_cacfar,
}


def detect(name: str, raw: jax.Array, res: float, **kwargs) -> jax.Array:
    """Dispatch by detector name (the `radar_config.yaml:87` selector)."""
    return DETECTORS[name](raw, res, **kwargs)


def doppler_shift(
    points: jax.Array, azimuths: jax.Array, velocity: jax.Array,
    beta: float = 0.049,
) -> jax.Array:
    """Doppler range correction for an FMCW radar moving at ``velocity``.

    points: (B, N, 3) cartesian; azimuths: (B, N) the ray angle of each point;
    velocity: (B, 2) platform (vx, vy) in the sensor frame. The radial velocity
    component shifts the measured range by ``beta * v_radial``
    (`radar_config.yaml:92`).
    """
    v_rad = velocity[:, None, 0] * jnp.cos(azimuths) + velocity[
        :, None, 1
    ] * jnp.sin(azimuths)
    dr = beta * v_rad
    r = jnp.linalg.norm(points[..., :2] + 1e-30, axis=-1)
    scale = (r + dr) / jnp.maximum(r, 1e-9)
    out = points.at[..., :2].multiply(scale[..., None])
    return out


def motion_undistort(
    points: jax.Array,
    times: jax.Array,
    velocity: jax.Array,
    yaw_rate: jax.Array,
    t_ref: jax.Array | None = None,
    time_to_sec: float = 1e-9,
) -> jax.Array:
    """Constant-velocity motion-during-scan un-distortion (planar, exact).

    A Navtech scan sweeps its azimuths over ~0.25 s; a rotating/translating
    platform therefore observes each azimuth from a different pose — the
    reason the reference's odometry runs a continuous-time STEAM trajectory
    (`/root/reference/gen_data/config/radar_config.yaml:160-188`). This is
    the constant-velocity 80% of that capability: each extracted point
    observed at time tᵢ is mapped into the scan-reference-time frame by the
    exact planar exponential ``p₀ = R(ω·dtᵢ) pᵢ + V(ω·dtᵢ)·v·dtᵢ``.

    points: (B, N, 3); times: (B, N) per-point observation times
    (`extract_pc(..., return_times=True)`); velocity: (B, 2) body (vx, vy);
    yaw_rate: (B,) ω [rad/s]; t_ref: (B,) reference time (default: per-batch
    min over real points); time_to_sec: unit scale of `times` (ns default).
    Pad rows (x=y=0) are left untouched.
    """
    valid = ~((points[..., 0] == 0.0) & (points[..., 1] == 0.0))  # (B, N)
    if t_ref is None:
        t_ref = jnp.min(jnp.where(valid, times, jnp.inf), axis=1)
    dt = (times - t_ref[:, None]) * time_to_sec  # (B, N) seconds
    dt = jnp.where(valid, dt, 0.0)

    th = yaw_rate[:, None] * dt  # (B, N)
    c, s = jnp.cos(th), jnp.sin(th)
    x, y = points[..., 0], points[..., 1]
    rx = c * x - s * y
    ry = s * x + c * y
    # V(θ)·v·dt with the standard SE(2) left-Jacobian; series-guarded at ω→0.
    w = yaw_rate[:, None]
    small = jnp.abs(th) < 1e-6
    a = jnp.where(small, dt * (1.0 - th * th / 6.0),
                  s / jnp.where(small, 1.0, w))
    b = jnp.where(small, dt * th / 2.0,
                  (1.0 - c) / jnp.where(small, 1.0, w))
    tx = a * velocity[:, None, 0] - b * velocity[:, None, 1]
    ty = b * velocity[:, None, 0] + a * velocity[:, None, 1]
    out = jnp.stack([rx + tx, ry + ty, points[..., 2]], axis=-1)
    return jnp.where(valid[..., None], out, points)
