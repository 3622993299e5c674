"""Differentiable GO-CFAR detector and peak→pointcloud extraction.

Reimplements `/root/reference/mm_masking/radar_utils.py` `cfar_mask:29-69`,
`mean_peaks_parallel_fast:167-185`, `extract_pc:71-106` as TPU-friendly,
fixed-shape, fully vectorized ops:

* The reference computes the left/right CFAR window sums with a Python loop over
  ~1200 columns (its own hot spot). Here both windows come from one cumulative
  sum along range: ``sum(x[s:e]) = csum[e] - csum[s]`` — O(R) instead of
  O(R·width) and a single fused VPU pass under XLA.
* The reference's peak extraction returns a ragged per-batch list of clouds.
  Ragged shapes don't exist on TPU; here every scan yields exactly
  ``max_points`` rows, zero-padded — the (0, 0) padding convention downstream
  ops already treat as "no point" (weight 0 in ``extract_weights``, pad mask in
  ICP).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hardshrink(x: jax.Array, lambd: float = 0.5) -> jax.Array:
    """torch.hardshrink: zero out values with |x| <= lambd."""
    return jnp.where(jnp.abs(x) > lambd, x, jnp.zeros_like(x))


def cfar_mask(
    raw_scans: jax.Array,
    res: float,
    width: int = 101,
    minr: float = 2.0,
    maxr: float = 80.0,
    guard: int = 5,
    a_thresh: float = 1.0,
    b_thresh: float = 0.09,
    diff: bool = True,
    steep_fact: float = 10.0,
) -> jax.Array:
    """Batched 1-D greatest-of CFAR along the range axis.

    raw_scans: (B, A, R) polar power. Returns a (B, A, R) mask — soft
    (tanh + hardshrink, differentiable) when ``diff`` else hard {0, 1}.

    Semantics match reference `cfar_mask` (`radar_utils.py:29-69`): window is
    forced odd, valid columns span
    ``[int(minr/res + w2 + guard + 1), int(maxr/res - w2 - guard))``, the
    greatest-of statistic is ``max(left_sum, right_sum) / (width // 2)``,
    threshold ``a*stat + b`` inside the valid band and 1000 outside, soft mask
    ``0.5*tanh(steep*(x - thres) + 2.5) + 0.5`` hard-shrunk at 0.99.
    """
    assert raw_scans.ndim == 3, "raw_scans must be 3D"
    B, A, R = raw_scans.shape
    width = width + 1 if width % 2 == 0 else width
    w2 = width // 2

    mincol = max(0, int(minr / res + w2 + guard + 1))
    maxcol = min(R, int(maxr / res - w2 - guard))
    n_valid = maxcol - mincol

    # Inclusive-prefix cumulative sum with a leading zero: csum[k] = sum(x[:k]).
    csum = jnp.concatenate(
        [
            jnp.zeros(raw_scans.shape[:-1] + (1,), raw_scans.dtype),
            jnp.cumsum(raw_scans, axis=-1),
        ],
        axis=-1,
    )
    cols = jnp.arange(mincol, maxcol)
    # left window: [col - w2 - guard, col - guard)
    left = (
        jnp.take(csum, cols - guard, axis=-1)
        - jnp.take(csum, cols - w2 - guard, axis=-1)
    )
    # right window: [col + guard + 1, col + w2 + guard + 1)
    right = (
        jnp.take(csum, cols + w2 + guard + 1, axis=-1)
        - jnp.take(csum, cols + guard + 1, axis=-1)
    )

    stat = jnp.maximum(left, right) / w2  # GO-CFAR
    thres = a_thresh * stat + b_thresh

    thres_full = jnp.full(raw_scans.shape, 1000.0, raw_scans.dtype)
    thres_full = jax.lax.dynamic_update_slice(
        thres_full, thres.astype(raw_scans.dtype), (0, 0, mincol)
    )

    if diff:
        soft = 0.5 * jnp.tanh(steep_fact * (raw_scans - thres_full) + 2.5) + 0.5
        return hardshrink(soft, 0.99)
    return jnp.where(raw_scans > thres_full, 1.0, 0.0).astype(raw_scans.dtype)


def mean_peaks(arr: jax.Array, diff: bool, steep_fact: float = 10.0) -> jax.Array:
    """Mark the first and last bin of each contiguous nonzero run along range.

    arr: (B, A, R). Reference `mean_peaks_parallel_fast` (`radar_utils.py:167-185`):
    a soft zero-detector ``1 - tanh(steep * x)`` (diff) or exact ``x == 0`` gates
    each bin by its neighbors; the last range bin is always zero, so runs never
    span azimuth rows after flattening.
    """
    if diff:
        zero_detect = 1.0 - jnp.tanh(steep_fact * arr)
    else:
        zero_detect = (arr == 0).astype(arr.dtype)
    res_forward = arr[..., :-1] * zero_detect[..., 1:]
    res_backward = arr[..., 1:] * zero_detect[..., :-1]
    res = jnp.zeros_like(arr)
    return res.at[..., :-1].set(res_forward + res_backward)


def extract_pc(
    thres_mask: jax.Array,
    res: float,
    azimuth_angles: jax.Array,
    azimuth_times: jax.Array,
    max_points: int = 4096,
    T_ab: jax.Array | None = None,
    diff: bool = True,
    steep_fact: float = 10.0,
    return_times: bool = False,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Thresholded polar scan → fixed-size cartesian pointcloud (B, max_points, 3).

    Reference `extract_pc` (`radar_utils.py:71-106`): each detection blob
    contributes its (first, last) edge pair; the blob's point is the mean of the
    pair in (range, azimuth, time); ranges are ``res * bin_index`` gated by the
    mask. The reference pairs *consecutive nonzero entries* of the flattened
    (azimuth, range) peak array — including its quirk that single-bin blobs emit
    one merged entry (forward+backward gates sum at the same bin) and shift the
    pairing; reproduced as-is.

    TPU-native difference: instead of ragged `nonzero()` lists, entries are
    rank-ordered with a cumulative-sum scatter into a fixed buffer of
    ``2 * max_points`` slots; overflow drops, underflow leaves (0, 0, 0) rows
    (the downstream pad convention).
    """
    B, A, R = thres_mask.shape
    rng = jnp.arange(R, dtype=thres_mask.dtype)
    thres_scan = res * rng[None, None, :] * thres_mask

    peak_points = mean_peaks(thres_scan, diff=diff, steep_fact=steep_fact)

    az_mat = jnp.broadcast_to(azimuth_angles[..., None], (B, A, R))
    t_mat = jnp.broadcast_to(azimuth_times[..., None], (B, A, R))

    # Channels stay SEPARATE (B, A·R) planes through the scatter: stacking
    # them to (B, A·R, 3) first puts 3 on the lane dimension, which TPU
    # layout pads to 128 — a 42× inflation that turns this intermediate into
    # 22 GB at batch 32 full polar scale (observed compile-time OOM).
    r_flat = peak_points.reshape(B, -1)
    valid = r_flat != 0
    rank = jnp.cumsum(valid, axis=1) - 1  # 0-based order among nonzeros
    slots = 2 * max_points
    # Out-of-range / invalid ranks scatter to a dropped overflow slot.
    idx = jnp.where(valid & (rank < slots), rank, slots)
    rows = jnp.arange(B)[:, None]

    def scatter_channel(ch):
        buf = jnp.zeros((B, slots + 1), ch.dtype)
        # Fill value typed to the channel: a weak 0.0 promotes integer
        # channels (raw ns az_times) to f32 and the f32→int scatter is a
        # FutureWarning today, an error in future JAX.
        zero = jnp.zeros((), ch.dtype)
        buf = buf.at[rows, idx].set(jnp.where(valid, ch, zero))
        return buf[:, :slots]

    # Reference pairing: ends = nonzero[0::2], starts = nonzero[1::2].
    bufs = [scatter_channel(ch)
            for ch in (r_flat, az_mat.reshape(B, -1), t_mat.reshape(B, -1))]
    avg = jnp.stack(
        [(b[:, 1::2] + b[:, 0::2]) / 2.0 for b in bufs], axis=-1
    )  # (B, max_points, 3)

    pc = pol_2_cart_batched(avg)
    if T_ab is not None:
        pc = (
            jnp.einsum("bij,bnj->bni", T_ab[:, :3, :3], pc)
            + T_ab[:, None, :3, 3]
        )
    if return_times:
        # Per-point observation time (mean of the blob's azimuth times, same
        # averaging as range/angle) — feeds motion-during-scan un-distortion.
        return pc, avg[..., 2]
    return pc


def pol_2_cart_batched(pts: jax.Array) -> jax.Array:
    """(B, N, >=2) polar (rho, phi, …) → (B, N, 3) cartesian with z = 0."""
    rho = pts[..., 0]
    phi = pts[..., 1]
    return jnp.stack(
        [rho * jnp.cos(phi), rho * jnp.sin(phi), jnp.zeros_like(rho)], axis=-1
    )
