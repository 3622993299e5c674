"""Space-to-depth conv: exact equivalence with lax.conv SAME 3x3."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_masking_tpu.models.s2d import (
    conv3x3_s2d,
    depth_to_space,
    pick_block,
    space_to_depth,
)


def ref_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    for b in (2, 4):
        y = space_to_depth(x, b)
        assert y.shape == (2, 16 // b, 16 // b, b * b * 3)
        np.testing.assert_array_equal(np.asarray(depth_to_space(y, b)),
                                      np.asarray(x))
    # Layout: phase (u, v) major, channel minor.
    y = space_to_depth(x, 2)
    np.testing.assert_array_equal(
        np.asarray(y[0, 0, 0, :3]), np.asarray(x[0, 0, 0, :]))
    np.testing.assert_array_equal(
        np.asarray(y[0, 0, 0, 3:6]), np.asarray(x[0, 0, 1, :]))
    np.testing.assert_array_equal(
        np.asarray(y[0, 0, 0, 6:9]), np.asarray(x[0, 1, 0, :]))


@pytest.mark.parametrize("b", [2, 4])
@pytest.mark.parametrize("cin,cout", [(1, 8), (8, 8), (8, 16), (16, 16)])
def test_conv3x3_s2d_matches_lax_conv(b, cin, cout):
    rng = np.random.default_rng(cin * 100 + cout + b)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, cin)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(3, 3, cin, cout)) * 0.2).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    want = np.asarray(ref_conv(x, k) + bias)
    got = np.asarray(conv3x3_s2d(x, k, b, bias=bias))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_conv3x3_s2d_gradients_match():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(3, 3, 4, 8)) * 0.2).astype(np.float32))

    def loss_ref(k):
        return jnp.sum(jnp.tanh(ref_conv(x, k)))

    def loss_s2d(k):
        return jnp.sum(jnp.tanh(conv3x3_s2d(x, k, 2)))

    g_ref = np.asarray(jax.grad(loss_ref)(k))
    g_s2d = np.asarray(jax.grad(loss_s2d)(k))
    np.testing.assert_allclose(g_s2d, g_ref, atol=2e-5)


def test_pick_block():
    assert pick_block(640, 1, 8) == 4
    assert pick_block(640, 8, 16) == 4     # 16·16 = 256 ≥ 128 at b=4; b=2 gives 64
    assert pick_block(320, 16, 32) == 2
    assert pick_block(160, 32, 64) == 2
    assert pick_block(40, 128, 256) == 1
