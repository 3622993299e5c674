"""Per-point weight lookup from the mask image + points→BEV occupancy.

Reimplements `/root/reference/mm_masking/radar_utils.py` `extract_weights:108-140`
and `extract_bev_from_pts:142-165` with static shapes and masked reductions.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mm_masking_tpu.ops.grid_sample import grid_sample_points
from mm_masking_tpu.ops.radar import (
    CART_PIXEL_WIDTH,
    CART_RESOLUTION,
    point_to_cart_idx,
)


class WeightStats(NamedTuple):
    """Diagnostics mirroring the reference's `extract_weights` return tuple."""

    diff_mean_num_non0: jax.Array  # differentiable count, per-batch mean
    mean_num_non0: jax.Array  # hard count of weights > 0.05, per-batch mean
    mean_w: jax.Array
    max_w: jax.Array
    min_w: jax.Array


def extract_weights(
    mask: jax.Array,
    scan_pc: jax.Array,
    cart_resolution: float = CART_RESOLUTION,
    cart_pixel_width: int = CART_PIXEL_WIDTH,
) -> tuple[jax.Array, WeightStats]:
    """Sample the weight mask at each scan point's BEV pixel.

    mask: (B, H, W); scan_pc: (B, N, 2/3) padded with (0, 0) rows. Returns
    per-point weights (B, N) and :class:`WeightStats`.

    Matches reference `extract_weights` (`radar_utils.py:108-140`): bilinear
    sampling with align_corners=True and zero padding; pad points
    (x == 0 ∧ y == 0) are routed to the far-out-of-bounds coordinate (−100, −100)
    so all four taps land outside and the weight is exactly 0. Stats are
    computed over real (non-pad) points only; all but the differentiable count
    are stop-gradient, as in the reference's ``.detach()``.
    """
    scan_pc = scan_pc.astype(mask.dtype)
    grid_pc = point_to_cart_idx(
        scan_pc, cart_resolution, cart_pixel_width, min_to_plus_1=True
    )  # (B, N, 2)

    fake = (scan_pc[..., 0] == 0.0) & (scan_pc[..., 1] == 0.0)  # (B, N)
    grid_pc = jnp.where(fake[..., None], jnp.asarray(-100.0, mask.dtype), grid_pc)

    weights = grid_sample_points(mask, grid_pc, align_corners=True)  # (B, N)

    B = weights.shape[0]
    real = ~fake
    n_real = jnp.maximum(jnp.sum(real), 1)

    mean_num_non0 = jax.lax.stop_gradient(
        jnp.sum((weights > 0.05) & real) / B
    )
    mean_w = jax.lax.stop_gradient(jnp.sum(jnp.where(real, weights, 0.0)) / n_real)
    max_w = jax.lax.stop_gradient(
        jnp.max(jnp.where(real, weights, -jnp.inf))
    )
    min_w = jax.lax.stop_gradient(jnp.min(jnp.where(real, weights, jnp.inf)))
    diff_mean_num_non0 = (
        jnp.sum(jnp.where(real, 0.5 * jnp.tanh(5.0 * weights) + 0.5, 0.0)) / B
    )

    return weights, WeightStats(
        diff_mean_num_non0, mean_num_non0, mean_w, max_w, min_w
    )


def extract_bev_from_pts(
    pc: jax.Array,
    cart_pixel_width: int = CART_PIXEL_WIDTH,
    cart_resolution: float = CART_RESOLUTION,
) -> jax.Array:
    """Points (B, N, 2/3) → binary BEV occupancy image (B, W, W).

    Matches reference `extract_bev_from_pts` (`radar_utils.py:142-165`):
    each point splats 1.0 into the 4 floor/ceil neighbor pixels of its
    fractional index; out-of-range indices are first redirected to the center
    pixel, which is zeroed at the end (this also swallows the (0, 0) pad
    points). Non-differentiable by construction — it is only ever a BCE target.
    """
    pc_idx = point_to_cart_idx(pc, cart_resolution, cart_pixel_width)  # (B, N, 2)
    mid = cart_pixel_width // 2
    pc_idx = jnp.where(pc_idx < 0, float(mid), pc_idx)
    pc_idx = jnp.where(pc_idx > (cart_pixel_width - 1), float(mid), pc_idx)

    B, N = pc_idx.shape[:2]
    i_floor = jnp.floor(pc_idx).astype(jnp.int32)
    i_ceil = jnp.ceil(pc_idx).astype(jnp.int32)

    bev = jnp.zeros((B, cart_pixel_width, cart_pixel_width), pc.dtype)
    b_idx = jnp.arange(B)[:, None]
    for u in (i_floor[..., 0], i_ceil[..., 0]):
        for v in (i_floor[..., 1], i_ceil[..., 1]):
            bev = bev.at[b_idx, u, v].set(1.0)
    bev = bev.at[:, mid, mid].set(0.0)
    return bev
