"""Parity for extract_weights / extract_bev_from_pts vs torch oracles."""
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mm_masking_tpu.ops import extract_weights, extract_bev_from_pts

CART_RES = 0.2384
W = 64  # small BEV for tests


def oracle_extract_weights(mask, pc, cart_res, width):
    """Torch oracle: documented grid_sample path with pad-point redirection."""
    mask_t = torch.from_numpy(mask).unsqueeze(1)
    pc_t = torch.from_numpy(pc)
    u = -pc_t[:, :, 0] / cart_res
    v = pc_t[:, :, 1] / cart_res
    grid = torch.stack((v, u), dim=2) / (width - 1) * 2
    fake = (pc_t[:, :, 0] == 0) & (pc_t[:, :, 1] == 0)
    grid[fake] = -100.0
    out = F.grid_sample(
        mask_t, grid.unsqueeze(2), mode="bilinear",
        padding_mode="zeros", align_corners=True,
    )
    return out.squeeze(1).squeeze(-1).numpy(), fake.numpy()


def make_case(seed=0, B=2, N=40):
    rng = np.random.default_rng(seed)
    mask = rng.uniform(size=(B, W, W)).astype(np.float32)
    half = W / 2 * CART_RES
    pc = rng.uniform(-half * 1.2, half * 1.2, size=(B, N, 3)).astype(np.float32)
    pc[:, -5:] = 0.0  # pad rows
    return mask, pc


def test_extract_weights_matches_oracle():
    mask, pc = make_case()
    want, fake = oracle_extract_weights(mask, pc, CART_RES, W)
    got, stats = extract_weights(
        jnp.asarray(mask), jnp.asarray(pc), cart_resolution=CART_RES,
        cart_pixel_width=W,
    )
    got = np.asarray(got)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # Pad points get exactly zero weight.
    np.testing.assert_array_equal(got[fake], 0.0)
    # Stats over real points only.
    B = mask.shape[0]
    real = ~fake
    assert abs(float(stats.mean_num_non0) - (want[real] > 0.05).sum() / B) < 1e-5
    assert abs(float(stats.mean_w) - want[real].mean()) < 1e-5
    assert abs(float(stats.max_w) - want[real].max()) < 1e-6
    assert abs(float(stats.min_w) - want[real].min()) < 1e-6
    diff_count = (0.5 * np.tanh(5 * want[real]) + 0.5).sum() / B
    assert abs(float(stats.diff_mean_num_non0) - diff_count) < 1e-4


def test_extract_weights_gradient_flows_to_mask():
    mask, pc = make_case(seed=1)

    def f(m):
        w, _ = extract_weights(
            m, jnp.asarray(pc), cart_resolution=CART_RES, cart_pixel_width=W
        )
        return jnp.sum(w)

    g = jax.grad(f)(jnp.asarray(mask))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def oracle_bev(pc, width, cart_res):
    pc_t = torch.from_numpy(pc)
    u = -pc_t[:, :, 0] / cart_res + width / 2
    v = pc_t[:, :, 1] / cart_res + width / 2
    idx = torch.stack((u, v), dim=2)
    idx[idx < 0] = width // 2
    idx[idx > width - 1] = width // 2
    bev = torch.zeros((pc.shape[0], width, width))
    fl = torch.floor(idx).long()
    ce = torch.ceil(idx).long()
    b = torch.arange(pc.shape[0]).unsqueeze(1)
    bev[b, ce[:, :, 0], fl[:, :, 1]] = 1
    bev[b, ce[:, :, 0], ce[:, :, 1]] = 1
    bev[b, fl[:, :, 0], fl[:, :, 1]] = 1
    bev[b, fl[:, :, 0], ce[:, :, 1]] = 1
    bev[:, width // 2, width // 2] = 0.0
    return bev.numpy()


def test_bev_matches_oracle():
    _, pc = make_case(seed=2, B=3, N=60)
    want = oracle_bev(pc, W, CART_RES)
    got = np.asarray(
        extract_bev_from_pts(jnp.asarray(pc), cart_pixel_width=W,
                             cart_resolution=CART_RES)
    )
    np.testing.assert_array_equal(got, want)
