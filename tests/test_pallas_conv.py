"""conv3x3_nhcw (Pallas NHCW conv + custom VJP) vs lax.conv ground truth.

Runs in interpret mode on the CPU test mesh; the same code path compiles via
Mosaic on TPU (chip-verified in benchmarks/probe_pallas_conv*.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_masking_tpu.ops.pallas.conv2d import conv3x3_nhcw


def conv_ref_nhwc(x_nhwc, k, b, relu):
    y = jax.lax.conv_general_dilated(
        x_nhwc, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    return jnp.maximum(y, 0.0) if relu else y


def to_nhcw(x_nhwc):
    return jnp.moveaxis(x_nhwc, -1, 2)


@pytest.mark.parametrize(
    "B,H,W,Ci,Co,relu",
    [
        (2, 32, 256, 8, 8, False),
        (1, 32, 128, 16, 16, True),
        (2, 24, 128, 3, 8, False),   # unaligned C_in (first UNet layer)
        (1, 16, 320, 8, 16, True),   # W not a 128-multiple (320^2 stages)
        (1, 20, 128, 8, 3, False),   # unaligned C_out, H needing TH=5
    ],
)
def test_forward_matches_lax_conv(B, H, W, Ci, Co, relu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)) * 0.1, jnp.float32)

    ref = conv_ref_nhwc(x, k, b, relu)
    got = conv3x3_nhcw(to_nhcw(x), k, b, relu)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got), 2, -1), np.asarray(ref),
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("W", [128, 320])
def test_gradients_match_lax_conv(relu, W):
    B, H, Ci, Co = 2, 16, 8, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Co,)) * 0.1, jnp.float32)
    # Cotangent defined by a fixed random projection so relu's kink pattern
    # is exercised without being differentiated at exactly 0.
    p = jnp.asarray(rng.standard_normal((B, H, Co, W)), jnp.float32)

    def loss_pallas(x_nhwc, k, b):
        return jnp.sum(conv3x3_nhcw(to_nhcw(x_nhwc), k, b, relu) * p)

    def loss_ref(x_nhwc, k, b):
        return jnp.sum(conv_ref_nhwc(x_nhwc, k, b, relu)
                       * jnp.moveaxis(p, 2, -1))

    gx, gk, gb = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    rx, rk, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb),
                               rtol=1e-4, atol=1e-4)


def test_bf16_forward_close_to_f32():
    B, H, W, Ci, Co = 1, 16, 128, 16, 16
    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, H, W, Ci)).astype(np.float32)
    k = (rng.standard_normal((3, 3, Ci, Co)) * 0.1).astype(np.float32)
    b = np.zeros((Co,), np.float32)
    ref = conv_ref_nhwc(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b), False)
    got = conv3x3_nhcw(
        to_nhcw(jnp.asarray(x, jnp.bfloat16)),
        jnp.asarray(k, jnp.bfloat16), jnp.asarray(b), False)
    err = np.max(np.abs(np.moveaxis(np.asarray(got, np.float32), 2, -1)
                        - np.asarray(ref)))
    assert err < 0.15, err  # bf16 inputs, f32 accumulate
