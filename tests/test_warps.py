"""Polar↔cartesian warp parity vs a torch oracle of the documented semantics."""
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mm_masking_tpu.ops import (
    radar_polar_to_cartesian,
    radar_cartesian_to_polar,
    form_cart_range_angle_grid,
    form_polar_range_grid,
)

RES = 0.0596


def oracle_polar_to_cart(fft, az, res, cart_res, width, crossover=True, wobble=True):
    """Torch oracle following radar_polar_to_cartesian_diff's documented contract."""
    fft = torch.from_numpy(fft)
    az = torch.from_numpy(az)
    B, A, R = fft.shape
    cart_min_range = (width / 2 - 0.5) * cart_res if width % 2 == 0 else width // 2 * cart_res
    coords = torch.linspace(-cart_min_range, cart_min_range, width)
    Y, X = torch.meshgrid(coords, -1 * coords, indexing="xy")
    sample_range = torch.sqrt(Y * Y + X * X)
    sample_angle = torch.arctan2(Y, X)
    sample_angle = sample_angle + torch.where(sample_angle < 0, 2 * torch.pi, 0.0)
    sample_range = sample_range.unsqueeze(0).expand(B, -1, -1)
    sample_angle = sample_angle.unsqueeze(0).expand(B, -1, -1)

    step = ((az[:, -1] - az[:, 0]) / (A - 1))[:, None, None]
    sample_u = (sample_range - res / 2) / res
    sample_v = (sample_angle - az[:, 0][:, None, None]) / step
    if wobble:
        azb = az.unsqueeze(1).expand(B, width, A)
        c3 = torch.searchsorted(azb.contiguous(), sample_angle.contiguous())
        c3[c3 == A] -= 1
        c2 = c3 - 1
        c2[c2 < 0] += 1
        a = az.unsqueeze(1).unsqueeze(3)
        bidx = torch.arange(B)[:, None, None]
        a3 = a[bidx, :, c3].squeeze(-1).squeeze(-1)
        diff = sample_angle - a3
        a2 = a[bidx, :, c2].squeeze(-1).squeeze(-1)
        delta = diff * (diff < 0) * (c3 > 0) / (a3 - a2 + 1e-14)
        sample_v = c3 + delta
    sample_u = torch.clamp(sample_u, min=0)
    if crossover:
        fft = torch.cat((fft[:, -1:], fft, fft[:, :1]), 1)
        sample_v = sample_v + 1
    su = sample_u / (fft.shape[2] - 1) * 2 - 1
    sv = sample_v / (fft.shape[1] - 1) * 2 - 1
    warp = torch.stack((su, sv), -1).float()
    out = F.grid_sample(fft.unsqueeze(1), warp, mode="bilinear",
                        padding_mode="zeros", align_corners=True)
    return out.squeeze(1).numpy()


def make_scan(seed=0, B=2, A=16, R=120, jitter=True):
    rng = np.random.default_rng(seed)
    fft = rng.uniform(size=(B, A, R)).astype(np.float32)
    base = np.linspace(0, 2 * np.pi * (A - 1) / A, A)
    az = np.stack([base] * B).astype(np.float32)
    if jitter:  # non-uniform encoder (the wobble)
        az += rng.uniform(0, 0.3 * 2 * np.pi / A, size=az.shape).astype(np.float32)
        az = np.sort(az, axis=1)
    return fft, az


def test_polar_to_cart_matches_oracle_wobble():
    fft, az = make_scan()
    width = 48
    cart_res = (RES * 120 * 2) / width  # cover the full range
    want = oracle_polar_to_cart(fft, az, RES, cart_res, width)
    got = np.asarray(
        radar_polar_to_cartesian(
            jnp.asarray(fft), jnp.asarray(az), RES, cart_res, width
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_polar_to_cart_matches_oracle_no_wobble():
    fft, az = make_scan(seed=4, jitter=False)
    width = 32
    cart_res = (RES * 120 * 2) / width
    want = oracle_polar_to_cart(fft, az, RES, cart_res, width, wobble=False)
    got = np.asarray(
        radar_polar_to_cartesian(
            jnp.asarray(fft), jnp.asarray(az), RES, cart_res, width,
            fix_wobble=False,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def oracle_cart_to_polar(cart, az, res, cart_res, polar_shape):
    cart = torch.from_numpy(cart)
    az = torch.from_numpy(az)
    A, R = polar_shape
    polar_range = (R - 1) * res
    range_coords = torch.linspace(0.0, polar_range, R)
    sample_X = torch.sin(az.unsqueeze(-1)) @ range_coords.unsqueeze(0)
    sample_Y = torch.cos(az.unsqueeze(-1)) @ range_coords.unsqueeze(0)
    su = (sample_X / cart_res) / (cart.shape[2] - 1) * 2
    sv = (-sample_Y / cart_res) / (cart.shape[1] - 1) * 2
    warp = torch.stack((su, sv), -1)
    out = F.grid_sample(cart.unsqueeze(1), warp, mode="bilinear",
                        padding_mode="zeros", align_corners=True)
    return out.squeeze(1).numpy()


def test_cart_to_polar_matches_oracle():
    rng = np.random.default_rng(5)
    B, width = 2, 40
    cart = rng.uniform(size=(B, width, width)).astype(np.float32)
    _, az = make_scan(seed=6, B=B, A=12)
    shape = (12, 60)
    cart_res = 0.2
    want = oracle_cart_to_polar(cart, az, RES, cart_res, shape)
    got = np.asarray(
        radar_cartesian_to_polar(
            jnp.asarray(cart), jnp.asarray(az), RES, cart_res, shape
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roundtrip_recovers_smooth_image():
    # polar -> cart -> polar on a smooth scan should approximately round-trip
    # away from the centre (where cartesian resolution undersamples azimuth).
    B, A, R = 1, 64, 100
    az = np.stack([np.linspace(0, 2 * np.pi * (A - 1) / A, A)]).astype(np.float32)
    r = np.linspace(0, 1, R, dtype=np.float32)
    fft = np.broadcast_to(np.exp(-((r - 0.5) ** 2) / 0.02), (B, A, R)).copy()
    width = 128
    cart_res = RES * R / (width / 2)
    cart = radar_polar_to_cartesian(jnp.asarray(fft), jnp.asarray(az), RES,
                                    cart_res, width)
    back = np.asarray(
        radar_cartesian_to_polar(cart, jnp.asarray(az), RES, cart_res, (A, R))
    )
    sl = slice(R // 3, 2 * R // 3)
    err = np.abs(back[:, :, sl] - fft[:, :, sl]).mean()
    assert err < 0.05, err


def test_warp_differentiable():
    fft, az = make_scan(seed=7, B=1, A=8, R=32)
    g = jax.grad(
        lambda f: jnp.sum(
            radar_polar_to_cartesian(f, jnp.asarray(az), RES, 0.3, 16)
        )
    )(jnp.asarray(fft))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
