"""Golden parity: ops.grid_sample vs torch.nn.functional.grid_sample (CPU)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from mm_masking_tpu.ops import grid_sample_2d, grid_sample_points


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_2d_matches_torch(align_corners):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 17, 23)).astype(np.float32)
    # Grid spanning in-bounds, boundary, and far out-of-bounds coordinates.
    grid = rng.uniform(-1.6, 1.6, size=(2, 9, 11, 2)).astype(np.float32)
    grid[0, 0, 0] = [-1.0, -1.0]
    grid[0, 0, 1] = [1.0, 1.0]
    grid[0, 0, 2] = [-100.0, -100.0]

    want = F.grid_sample(
        torch.from_numpy(x),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    ).numpy()
    got = np.asarray(
        grid_sample_2d(jnp.asarray(x), jnp.asarray(grid), align_corners=align_corners)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_points_matches_torch_pseudoimage():
    # The reference samples points as an (N, P, 1, 2) pseudo-image grid
    # (radar_utils.py:124-128); grid_sample_points must agree with that path.
    rng = np.random.default_rng(1)
    mask = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, size=(3, 50, 2)).astype(np.float32)

    want = (
        F.grid_sample(
            torch.from_numpy(mask).unsqueeze(1),
            torch.from_numpy(coords).unsqueeze(2),
            mode="bilinear",
            padding_mode="zeros",
            align_corners=True,
        )
        .squeeze(1)
        .squeeze(-1)
        .numpy()
    )
    got = np.asarray(grid_sample_points(jnp.asarray(mask), jnp.asarray(coords)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grid_sample_gradients_match_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 1, 8, 8)).astype(np.float32)
    grid = rng.uniform(-1.1, 1.1, size=(1, 4, 4, 2)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    gt = torch.from_numpy(grid).requires_grad_(True)
    out = F.grid_sample(
        xt, gt, mode="bilinear", padding_mode="zeros", align_corners=True
    )
    out.sum().backward()

    import jax

    gx, gg = jax.grad(
        lambda a, g: jnp.sum(grid_sample_2d(a, g, align_corners=True)),
        argnums=(0, 1),
    )(jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg), gt.grad.numpy(), atol=1e-4)
