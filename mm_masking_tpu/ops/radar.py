"""Navtech radar geometry ops: decode, pixel grids, polar↔cartesian warps.

TPU-first reimplementation of the warp/grid half of
`/root/reference/mm_masking/radar_utils.py` (functions `load_radar:20-27`,
`radar_polar_to_cartesian_diff:258-336`, `radar_cartesian_to_polar:338-372`,
`point_to_cart_idx:374-397`, `form_cart_range_angle_grid:399-419`,
`form_polar_range_grid:421-437`, `pol_2_cart:187-195`). Everything is batched,
static-shape, differentiable jnp; interpolation goes through
:mod:`mm_masking_tpu.ops.grid_sample` which replicates torch's
``align_corners=True`` / zero-padding semantics exactly.

Default constants (Boreas CIR204 Navtech):
  polar resolution 0.0596 m/bin, 400 azimuths × 3360 range bins,
  encoder 5600 ticks/rev, cartesian BEV 640 px @ 0.2384 m/px.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mm_masking_tpu.ops.grid_sample import grid_sample_2d

POLAR_RESOLUTION = 0.0596  # m / range bin
CART_RESOLUTION = 0.2384  # m / cartesian pixel
CART_PIXEL_WIDTH = 640
POLAR_SHAPE = (400, 3360)  # (azimuths, range bins)
ENCODER_TICKS = 5600


def load_radar(raw_data: np.ndarray, normalize: bool = True):
    """Decode a raw Navtech scan image (host-side, numpy).

    Row layout (reference `radar_utils.py:20-27`): bytes 0-7 little-endian int64
    timestamp (×1000 → ns), bytes 8-9 uint16 encoder tick (× 2π/5600 → rad),
    byte 10 validity flag (unused), columns 11+ FFT power / 255.

    Returns (fft_data (A, R) float32, azimuths (A,) float64, timestamps (A,) int64).

    With ``normalize=False`` the FFT plane stays the on-disk uint8 (the /255 is
    deferred to the device — the input pipeline ships a quarter of the bytes
    through host memory and the host↔device link; the device divide matches
    numpy's f32 divide to within one ulp).
    """
    raw_data = np.asarray(raw_data)
    timestamps = np.frombuffer(raw_data[:, :8].tobytes(), dtype=np.int64) * 1000
    azimuths = (
        np.frombuffer(raw_data[:, 8:10].tobytes(), dtype=np.uint16)
        * (2 * np.pi / ENCODER_TICKS)
    )
    if normalize:
        fft_data = np.divide(raw_data[:, 11:], 255.0, dtype=np.float32)
    else:
        fft_data = np.ascontiguousarray(raw_data[:, 11:])
    return fft_data, azimuths, timestamps


def pol_2_cart(pointcloud: jax.Array) -> jax.Array:
    """(…, N, >=2) polar points (rho, phi, …) -> (…, N, 3) cartesian, z=0."""
    rho = pointcloud[..., 0]
    phi = pointcloud[..., 1]
    return jnp.stack(
        [rho * jnp.cos(phi), rho * jnp.sin(phi), jnp.zeros_like(rho)], axis=-1
    )


@functools.lru_cache(maxsize=8)
def _cart_range_angle_grid_np(cart_resolution: float, cart_pixel_width: int):
    """Host-side (numpy) per-pixel (range, angle) grid; cached, traced as consts."""
    if cart_pixel_width % 2 == 0:
        cart_min_range = (cart_pixel_width / 2 - 0.5) * cart_resolution
    else:
        cart_min_range = cart_pixel_width / 2 * cart_resolution
    coords = np.linspace(
        -cart_min_range, cart_min_range, cart_pixel_width, dtype=np.float32
    )
    Y, X = np.meshgrid(coords, -1 * coords, indexing="xy")
    sample_range = np.sqrt(Y * Y + X * X)
    sample_angle = np.arctan2(Y, X)
    sample_angle = sample_angle + (sample_angle < 0) * 2.0 * np.pi
    return sample_range.astype(np.float32), sample_angle.astype(np.float32)


def form_cart_range_angle_grid(
    cart_resolution: float = CART_RESOLUTION,
    cart_pixel_width: int = CART_PIXEL_WIDTH,
    dtype=jnp.float32,
):
    """Per-pixel (range m, angle rad ∈ [0, 2π)) of a centered cartesian BEV image.

    x points up (−u), y right (+v); matches reference `radar_utils.py:399-419`
    including the even-width half-pixel offset.
    """
    r, a = _cart_range_angle_grid_np(float(cart_resolution), int(cart_pixel_width))
    return jnp.asarray(r, dtype=dtype), jnp.asarray(a, dtype=dtype)


def form_polar_range_grid(
    polar_resolution: float = CART_RESOLUTION,
    polar_pixel_shape: tuple[int, int] = POLAR_SHAPE,
    dtype=jnp.float32,
):
    """(A, R) grid whose rows are the range (m) of each bin; bin 0 = 0 m.

    Reference `radar_utils.py:421-437` (note the reference's default resolution
    there is the *cartesian* one — reproduced; callers pass the polar one).
    """
    polar_range = (polar_pixel_shape[1] - 1) * polar_resolution
    range_coords = jnp.linspace(0.0, polar_range, polar_pixel_shape[1], dtype=dtype)
    return jnp.broadcast_to(range_coords[None, :], polar_pixel_shape)


def _wobble_sample_v(azimuths: jax.Array, sample_angle: jax.Array) -> jax.Array:
    """Azimuth-index lookup against the *real* (non-uniform) encoder azimuths.

    Fixes the CIR204 "wobble": instead of assuming a constant azimuth step, find
    for each cartesian pixel the bracketing measured azimuths by binary search
    and interpolate (reference `radar_utils.py:296-309`, torch.searchsorted path).

    azimuths: (B, A) sorted; sample_angle: (B, H, W). Returns (B, H, W) float.
    """
    B, A = azimuths.shape

    def one(azm, ang):
        c3 = jnp.searchsorted(azm, ang.ravel(), side="left").reshape(ang.shape)
        return c3

    c3 = jax.vmap(one)(azimuths, sample_angle)
    c3 = jnp.where(c3 == A, A - 1, c3)
    c2 = c3 - 1
    c2 = jnp.where(c2 < 0, c2 + 1, c2)
    a3 = jnp.take_along_axis(
        azimuths[:, None, :], c3.reshape(B, 1, -1), axis=2
    ).reshape(sample_angle.shape)
    a2 = jnp.take_along_axis(
        azimuths[:, None, :], c2.reshape(B, 1, -1), axis=2
    ).reshape(sample_angle.shape)
    diff = sample_angle - a3
    delta = diff * (diff < 0) * (c3 > 0) / (a3 - a2 + 1e-14)
    return c3.astype(sample_angle.dtype) + delta


def radar_polar_to_cartesian(
    fft_data: jax.Array,
    azimuths: jax.Array,
    radar_resolution: float = POLAR_RESOLUTION,
    cart_resolution: float = CART_RESOLUTION,
    cart_pixel_width: int = CART_PIXEL_WIDTH,
    interpolate_crossover: bool = True,
    fix_wobble: bool = True,
) -> jax.Array:
    """Differentiable batched polar→cartesian warp.

    fft_data (B, A, R), azimuths (B, A) → (B, W, W) BEV image. Matches reference
    `radar_polar_to_cartesian_diff` (`radar_utils.py:258-336`): half-bin range
    offset, searchsorted wobble fix, first/last-azimuth crossover padding,
    [-1, 1] grid normalization, bilinear/zeros/align_corners=True sampling.
    """
    B, A, R = fft_data.shape
    sample_range, sample_angle = form_cart_range_angle_grid(
        cart_resolution, cart_pixel_width, dtype=fft_data.dtype
    )
    sample_range = jnp.broadcast_to(
        sample_range[None], (B,) + sample_range.shape
    )
    sample_angle = jnp.broadcast_to(
        sample_angle[None], (B,) + sample_angle.shape
    )

    sample_u = (sample_range - radar_resolution / 2) / radar_resolution
    if fix_wobble:
        sample_v = _wobble_sample_v(azimuths, sample_angle)
    else:
        azimuth_step = (azimuths[:, -1] - azimuths[:, 0]) / (A - 1)
        sample_v = (sample_angle - azimuths[:, 0][:, None, None]) / azimuth_step[
            :, None, None
        ]

    # Clip to the minimum sensor range (centre of the image is undefined).
    sample_u = jnp.maximum(sample_u, 0.0)

    if interpolate_crossover:
        fft_data = jnp.concatenate(
            [fft_data[:, -1:], fft_data, fft_data[:, :1]], axis=1
        )
        sample_v = sample_v + 1
    A_pad = fft_data.shape[1]

    sample_u = sample_u / (R - 1) * 2 - 1
    sample_v = sample_v / (A_pad - 1) * 2 - 1

    warp = jnp.stack([sample_u, sample_v], axis=-1)
    out = grid_sample_2d(fft_data[:, None], warp, align_corners=True)
    return out[:, 0]


def radar_cartesian_to_polar(
    cart: jax.Array,
    azimuths: jax.Array,
    radar_resolution: float = POLAR_RESOLUTION,
    cart_resolution: float = CART_RESOLUTION,
    polar_pixel_shape: tuple[int, int] = POLAR_SHAPE,
) -> jax.Array:
    """Inverse warp: (B, W, W) cartesian BEV → (B, A, R) polar scan.

    Matches reference `radar_cartesian_to_polar` (`radar_utils.py:338-372`):
    project ranges along each measured azimuth into metric x/y, convert to the
    centered pixel grid (−y for top-to-bottom v), normalize, bilinear sample.
    """
    B, H, W = cart.shape
    range_grid = form_polar_range_grid(
        radar_resolution, polar_pixel_shape, dtype=cart.dtype
    )
    range_coords = range_grid[0]  # (R,)

    sample_X = jnp.sin(azimuths)[..., None] * range_coords[None, None, :]
    sample_Y = jnp.cos(azimuths)[..., None] * range_coords[None, None, :]

    sample_u = sample_X / cart_resolution
    sample_v = -sample_Y / cart_resolution

    sample_u = sample_u / (W - 1) * 2
    sample_v = sample_v / (H - 1) * 2

    warp = jnp.stack([sample_u, sample_v], axis=-1)
    out = grid_sample_2d(cart[:, None], warp, align_corners=True)
    return out[:, 0]


def point_to_cart_idx(
    pc: jax.Array,
    cart_resolution: float = CART_RESOLUTION,
    cart_pixel_width: int = CART_PIXEL_WIDTH,
    min_to_plus_1: bool = False,
) -> jax.Array:
    """Metric points (B, N, 2/3) → cartesian pixel coordinates (B, N, 2).

    Two conventions (reference `radar_utils.py:374-397`): x points up so the
    u/row index is −x; with ``min_to_plus_1`` the output is the (x=v, y=u)-ordered
    [-1, 1] grid for grid_sample, else top-left-origin pixel indices (+W/2).
    """
    grid_pc_u = -pc[..., 0] / cart_resolution
    grid_pc_v = pc[..., 1] / cart_resolution
    if min_to_plus_1:
        grid_pc = jnp.stack([grid_pc_v, grid_pc_u], axis=-1)
        return grid_pc / (cart_pixel_width - 1) * 2
    grid_pc = jnp.stack([grid_pc_u, grid_pc_v], axis=-1)
    return grid_pc + cart_pixel_width / 2
