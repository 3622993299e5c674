"""Bilinear grid sampling with exact ``torch.nn.functional.grid_sample`` semantics.

Every interpolation in the reference pipeline goes through
``F.grid_sample(mode='bilinear', padding_mode='zeros', align_corners=True)``:
per-point weight lookup (`/root/reference/mm_masking/radar_utils.py:126`),
polar→cartesian warp (`:334`), cartesian→polar warp (`:370`). The grid carries
normalized coordinates in [-1, 1], where ``grid[..., 0]`` indexes the *last*
(width/x) axis and ``grid[..., 1]`` the height/y axis. With
``align_corners=True`` the mapping to pixel coordinates is

    p = (g + 1) / 2 * (size - 1)

Out-of-bounds taps contribute zero (``padding_mode='zeros'``), implemented as
per-corner validity masks so gradients match torch's subgradient behavior.
Off-by-half-pixel errors here silently break the ≤1 cm parity budget
(SURVEY.md §7 hard part b), so this module is golden-tested against torch CPU.

Implementation is pure gather + FMA — XLA fuses it; the hot batched NCHW case
is laid out so the channel gather vectorizes on the VPU lanes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_2d(
    input_: jax.Array,
    grid: jax.Array,
    *,
    align_corners: bool = True,
) -> jax.Array:
    """Bilinear sample ``input_`` (N, C, H, W) at ``grid`` (N, Ho, Wo, 2).

    Returns (N, C, Ho, Wo). Matches
    ``F.grid_sample(mode='bilinear', padding_mode='zeros', align_corners=...)``.
    """
    N, C, H, W = input_.shape
    x = _unnormalize(grid[..., 0], W, align_corners)  # (N, Ho, Wo)
    y = _unnormalize(grid[..., 1], H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    # Corner weights.
    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        # Validity before clipping; invalid taps contribute zero.
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat = input_.reshape(N, C, H * W)
        idx = iyc * W + ixc  # (N, Ho, Wo)
        idx_flat = idx.reshape(N, -1)  # (N, Ho*Wo)
        vals = jnp.take_along_axis(flat, idx_flat[:, None, :], axis=2)
        vals = vals.reshape(N, C, *ix.shape[1:])
        return vals * valid[:, None].astype(input_.dtype)

    out = (
        gather(x0, y0) * (wx0 * wy0)[:, None]
        + gather(x1, y0) * (wx1 * wy0)[:, None]
        + gather(x0, y1) * (wx0 * wy1)[:, None]
        + gather(x1, y1) * (wx1 * wy1)[:, None]
    )
    return out


def grid_sample_points(
    image: jax.Array,
    coords: jax.Array,
    *,
    align_corners: bool = True,
) -> jax.Array:
    """Sample a single-channel batched image (N, H, W) at per-point normalized
    coordinates (N, P, 2) → (N, P).

    Equivalent to the reference's ``extract_weights`` sampling path
    (`/root/reference/mm_masking/radar_utils.py:124-128`), which reshapes the
    point list to a (P, 1) pseudo-image; here the gather stays 1-D.
    """
    N, H, W = image.shape
    x = _unnormalize(coords[..., 0], W, align_corners)  # (N, P)
    y = _unnormalize(coords[..., 1], H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    flat = image.reshape(N, H * W)

    def gather(ix, iy):
        valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ixc = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        idx = iyc * W + ixc
        return jnp.take_along_axis(flat, idx, axis=1) * valid.astype(image.dtype)

    return (
        gather(x0, y0) * (wx0 * wy0)
        + gather(x1, y0) * (wx1 * wy0)
        + gather(x0, y1) * (wx0 * wy1)
        + gather(x1, y1) * (wx1 * wy1)
    )
