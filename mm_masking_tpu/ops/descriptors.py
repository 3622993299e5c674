"""Keypoint descriptors + matching for RANSAC correspondence bootstrap.

Capability rebuild of the descriptor front-end of vtr `radar.mcransac`
(`/root/reference/gen_data/config/radar_config.yaml:146-153`: ``descriptor:
orb`` with ``patch_size: 31`` and an ``nndr`` ratio test, or BASD with
``nbins: 16`` / ``bin_size: 1``; the C++ lives in the empty vtr3 submodule).
The module consumes the detector's extracted keypoints (metric points on the
cartesian radar image) and produces binary descriptors + matched
correspondence pairs for :mod:`mm_masking_tpu.ops.mcransac`.

TPU-first shaping: everything is fixed-shape and gather-based —
  * descriptors for all N keypoints are one vmapped program of bilinear
    gathers over the (H, W) image (no per-keypoint Python);
  * ORB = steered BRIEF: patch orientation from the intensity centroid
    (the ORB moment method), a fixed 256-pair sampling pattern rotated by
    that angle, bits packed into 8×uint32;
  * BASD = annular statistics: mean intensity over ``nbins`` concentric
    rings (``bin_size`` px wide), binarized by adjacent-ring and
    ring-vs-patch-mean comparisons — rotation-invariant by construction;
  * matching = Hamming distance via XOR + ``lax.population_count`` on the
    packed words, full (N, N) matrix on the VPU, NNDR ratio test
    (``nndr: 1.0`` = test disabled, reference default) + mutual-best check.

Invalid keypoints (the x=y=0 pad convention) get all-zero descriptors and
are excluded from matching.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# shared sampling helpers
# ---------------------------------------------------------------------------


def _bilinear(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Bilinear sample img (H, W) at row u / col v (float, zero padded)."""
    H, W = img.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def at(ui, vi):
        inside = (ui >= 0) & (ui < H) & (vi >= 0) & (vi < W)
        val = img[jnp.clip(ui, 0, H - 1), jnp.clip(vi, 0, W - 1)]
        return jnp.where(inside, val, 0.0)

    return (
        at(u0i, v0i) * (1 - du) * (1 - dv)
        + at(u0i, v0i + 1) * (1 - du) * dv
        + at(u0i + 1, v0i) * du * (1 - dv)
        + at(u0i + 1, v0i + 1) * du * dv
    )


def points_to_pixels(
    pts: jax.Array, cart_resolution: float, cart_pixel_width: int
) -> tuple[jax.Array, jax.Array]:
    """Metric (x fwd, y left) → (row u, col v) on the cartesian image.

    Delegates to :func:`mm_masking_tpu.ops.radar.point_to_cart_idx` so the
    whole codebase carries ONE pixel convention (`radar_utils.py:374-397`:
    up = −x, +width/2 top-left origin) — a second local copy drifted by half
    a pixel before this."""
    from mm_masking_tpu.ops.radar import point_to_cart_idx

    uv = point_to_cart_idx(pts, cart_resolution, cart_pixel_width)
    return uv[..., 0], uv[..., 1]


def _pack_bits(bits: jax.Array) -> jax.Array:
    """(..., 256) bool → (..., 8) uint32."""
    b = bits.reshape(*bits.shape[:-1], 8, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# ORB (steered BRIEF)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _brief_pattern(patch_size: int, n_pairs: int = 256, seed: int = 42):
    """Fixed BRIEF pair pattern: (n_pairs, 2, 2) offsets in pixels, Gaussian
    around the keypoint (σ = patch/5, the BRIEF-32 recipe), clipped to the
    patch radius."""
    rng = np.random.default_rng(seed)
    r = patch_size / 2.0
    pat = rng.normal(0.0, patch_size / 5.0, size=(n_pairs, 2, 2))
    return np.clip(pat, -r, r).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _patch_grid(patch_size: int):
    """Circular patch sample offsets (K, 2) and their row/col for moments."""
    r = patch_size // 2
    yy, xx = np.mgrid[-r:r + 1, -r:r + 1]
    keep = (yy**2 + xx**2) <= r * r
    return np.stack([yy[keep], xx[keep]], axis=-1).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    patch_size: int = 31  # radar_config.yaml:149
    n_pairs: int = 256
    nndr: float = 1.0  # radar_config.yaml:150 (1.0 = ratio test off)


def orb_descriptors(
    img: jax.Array,
    pts: jax.Array,
    cart_resolution: float,
    cfg: OrbConfig = OrbConfig(),
) -> jax.Array:
    """Steered-BRIEF descriptors at metric keypoints.

    img: (H, W) cartesian radar image; pts: (N, 3) metric points (pad rows
    x=y=0 → zero descriptor). Returns (N, 8) uint32.
    """
    H = img.shape[0]
    u, v = points_to_pixels(pts, cart_resolution, H)
    grid = jnp.asarray(_patch_grid(cfg.patch_size))  # (K, 2)
    pat = jnp.asarray(_brief_pattern(cfg.patch_size, cfg.n_pairs))

    def one(u0, v0):
        # Orientation by intensity centroid (ORB moments).
        pu = u0 + grid[:, 0]
        pv = v0 + grid[:, 1]
        inten = _bilinear(img, pu, pv)  # (K,)
        m01 = jnp.sum(inten * grid[:, 0])
        m10 = jnp.sum(inten * grid[:, 1])
        theta = jnp.arctan2(m01, m10)
        c, s = jnp.cos(theta), jnp.sin(theta)
        # Rotate the pair pattern WITH the content. A world rotation by θ
        # moves patch content as (dr', dc') = (c·dr + s·dc, −s·dr + c·dc)
        # in (row, col) pixel space (row = −x/res, col = y/res), and the
        # centroid angle estimate grows by the same θ — so applying that
        # exact map with the estimated angle cancels the patch rotation
        # (the opposite sign DOUBLES it; caught by the steering test).
        rot = jnp.stack(
            [
                pat[..., 0] * c + pat[..., 1] * s,
                -pat[..., 0] * s + pat[..., 1] * c,
            ],
            axis=-1,
        )  # (P, 2, 2)
        a = _bilinear(img, u0 + rot[:, 0, 0], v0 + rot[:, 0, 1])
        b = _bilinear(img, u0 + rot[:, 1, 0], v0 + rot[:, 1, 1])
        return _pack_bits(a < b)

    desc = jax.vmap(one)(u, v)  # (N, 8) uint32
    valid = ~((pts[..., 0] == 0.0) & (pts[..., 1] == 0.0))
    return jnp.where(valid[:, None], desc, jnp.uint32(0))


# ---------------------------------------------------------------------------
# BASD (binary annular statistics)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BasdConfig:
    nbins: int = 16  # radar_config.yaml:152
    bin_size: float = 1.0  # ring width in px, radar_config.yaml:153
    samples_per_ring: int = 32


@functools.lru_cache(maxsize=8)
def _ring_offsets(nbins: int, bin_size: float, samples: int):
    """(nbins, samples, 2) row/col offsets of ring sample circles."""
    ang = np.linspace(0.0, 2 * np.pi, samples, endpoint=False)
    radii = (np.arange(nbins) + 0.5) * bin_size
    off = np.stack(
        [radii[:, None] * np.sin(ang)[None, :],
         radii[:, None] * np.cos(ang)[None, :]],
        axis=-1,
    )
    return off.astype(np.float32)


def basd_descriptors(
    img: jax.Array,
    pts: jax.Array,
    cart_resolution: float,
    cfg: BasdConfig = BasdConfig(),
) -> jax.Array:
    """Annular-statistics descriptors: rotation-invariant ring-mean
    comparisons, packed to uint32 words.

    Bits: adjacent-ring mean comparisons (nbins−1) + each ring vs the patch
    mean (nbins) → padded to a multiple of 32. Returns (N, ceil(bits/32))
    uint32.
    """
    H = img.shape[0]
    u, v = points_to_pixels(pts, cart_resolution, H)
    off = jnp.asarray(
        _ring_offsets(cfg.nbins, cfg.bin_size, cfg.samples_per_ring)
    )

    def one(u0, v0):
        vals = _bilinear(
            img, u0 + off[..., 0].ravel(), v0 + off[..., 1].ravel()
        ).reshape(cfg.nbins, cfg.samples_per_ring)
        ring_mean = jnp.mean(vals, axis=1)  # (nbins,)
        patch_mean = jnp.mean(ring_mean)
        bits = jnp.concatenate(
            [ring_mean[:-1] < ring_mean[1:], ring_mean > patch_mean]
        )
        n = bits.shape[0]
        pad = (-n) % 32
        bits = jnp.concatenate([bits, jnp.zeros((pad,), bool)])
        b = bits.reshape(-1, 32).astype(jnp.uint32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)

    desc = jax.vmap(one)(u, v)
    valid = ~((pts[..., 0] == 0.0) & (pts[..., 1] == 0.0))
    return jnp.where(valid[:, None], desc, jnp.uint32(0))


# ---------------------------------------------------------------------------
# Hamming matching with NNDR + mutual check
# ---------------------------------------------------------------------------


def match_descriptors(
    desc_a: jax.Array,
    desc_b: jax.Array,
    valid_a: jax.Array,
    valid_b: jax.Array,
    nndr: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Hamming NN matching a→b with ratio + mutual-consistency tests.

    desc_*: (N, W) uint32 packed descriptors; valid_*: (N,) bool.
    Returns (idx_b (N,) int32, ok (N,) bool): for each a-keypoint its matched
    b-index, ok where the match passes validity, NNDR (d1 < nndr·d2; 1.0
    disables, matching the reference default) and mutual-best checks.
    """
    x = jax.lax.population_count(
        jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    )
    d = jnp.sum(x, axis=-1).astype(jnp.int32)  # (Na, Nb)
    big = jnp.int32(1 << 20)
    d = jnp.where(valid_a[:, None] & valid_b[None, :], d, big)

    idx_b = jnp.argmin(d, axis=1).astype(jnp.int32)
    d1 = jnp.min(d, axis=1)
    # Second best for the ratio test.
    d_wo = d.at[jnp.arange(d.shape[0]), idx_b].set(big)
    d2 = jnp.min(d_wo, axis=1)
    # Non-strict ≤: at nndr=1.0 (the reference default) d1 ≤ d2 always holds
    # so the ratio test is genuinely disabled — a strict < would reject every
    # tied best/second-best pair, and integer Hamming ties are common for
    # 256-bit descriptors on low-texture radar patches.
    ratio_ok = d1.astype(jnp.float32) <= nndr * d2.astype(jnp.float32)
    # Mutual best: a must also be b's best.
    back = jnp.argmin(d, axis=0).astype(jnp.int32)  # (Nb,)
    mutual = back[idx_b] == jnp.arange(d.shape[0], dtype=jnp.int32)
    ok = valid_a & (d1 < big) & ratio_ok & mutual
    return idx_b, ok
