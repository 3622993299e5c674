"""UNet weight-mask network (flax linen, NHWC, TPU-friendly).

Architecture reproduces `/root/reference/mm_masking/icp_weight_policy.py`:
  * encoder channels [C, 8, 16, 32, 64, 128, 256]; each block is
    conv3x3 → relu → [bn] → conv3x3 → relu → [bn] → [dropout], with a trailing
    2×2 max-pool for every encoder block *except the first* (`:104-125`)
  * decoder channels [256, 128, 64, 32, 16, 8]; every decoder stage applies the
    SAME conv block twice — once on the upsampled features, once after
    concatenating the skip — a deliberate weight-sharing quirk of the reference
    (`:169-182`) reproduced exactly (calling one linen submodule twice shares
    its parameters; channel counts line up because dec[i] = 2 * dec[i+1])
  * bilinear upsampling with *align_corners=True* semantics
    (torch ``nn.UpsamplingBilinear2d``), implemented separably below — XLA's
    ``jax.image.resize`` uses half-pixel centers and would be off by a sub-pixel
    shift that breaks mask parity
  * final 1×1 conv + sigmoid (`:96-99`); Xavier-uniform kernel / zero bias init
    (`weights_init`, `:15-22`).

Layout is NHWC (TPU conv-native); callers hand in (B, H, W, C).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def upsample_bilinear_align_corners(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Separable bilinear resize with align_corners=True (torch semantics).

    x: (B, H, W, C) → (B, h, w, C). Output pixel i samples input coordinate
    ``i * (in - 1) / (out - 1)``.
    """
    B, H, W, C = x.shape
    h, w = size

    def axis_resize(arr, in_size, out_size, axis):
        if in_size == out_size:
            return arr
        if in_size == 1:
            reps = [1] * arr.ndim
            reps[axis] = out_size
            return jnp.tile(arr, reps)
        # Index math stays f32 regardless of activation dtype: bf16 linspace
        # rounds positions past in_size-1 (e.g. 320 for a 320-row input), and
        # jnp.take fills out-of-bounds gathers with NaN by default. Clamp i0
        # so i1 = i0 + 1 is always valid.
        pos = jnp.linspace(0.0, in_size - 1.0, out_size, dtype=jnp.float32)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 2)
        i1 = i0 + 1
        t = (pos - i0.astype(jnp.float32)).astype(arr.dtype)
        a0 = jnp.take(arr, i0, axis=axis)
        a1 = jnp.take(arr, i1, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_size
        t = t.reshape(shape)
        return a0 * (1.0 - t) + a1 * t

    x = axis_resize(x, H, h, axis=1)
    x = axis_resize(x, W, w, axis=2)
    return x


class ConvBlock(nn.Module):
    """conv3x3-relu[-bn]-conv3x3-relu[-bn][-dropout][-maxpool]."""

    features: int
    leaky: bool
    batch_norm: bool
    dropout: float
    pool: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        act = (lambda v: nn.leaky_relu(v, 0.1)) if self.leaky else nn.relu
        conv_kw = dict(
            kernel_size=(3, 3),
            padding=1,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
        )
        x = act(nn.Conv(self.features, **conv_kw)(x))
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = act(nn.Conv(self.features, **conv_kw)(x))
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        if self.pool:
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return x


class UNet(nn.Module):
    """Full-resolution sigmoid weight mask over the input image."""

    enc_channels: Sequence[int] = (8, 16, 32, 64, 128, 256)
    leaky: bool = False
    batch_norm: bool = False
    dropout: float = 0.05
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        enc = list(self.enc_channels)
        dec = list(reversed(enc))  # [256, 128, 64, 32, 16, 8]

        # Encoder; record each block's *input* as the skip (reference
        # `icp_weight_policy.py:162-166` stores pre-block activations).
        skips = []
        for i, ch in enumerate(enc):
            skips.append(x)
            x = ConvBlock(
                features=ch,
                leaky=self.leaky,
                batch_norm=self.batch_norm,
                dropout=self.dropout,
                pool=(i > 0),
                dtype=self.dtype,
            )(x, train=train)
        skips.reverse()

        # Decoder with the double-application weight sharing.
        for i in range(len(dec) - 1):
            block = ConvBlock(
                features=dec[i + 1],
                leaky=self.leaky,
                batch_norm=self.batch_norm,
                dropout=self.dropout,
                pool=False,
                dtype=self.dtype,
            )
            skip = skips[i]
            x = upsample_bilinear_align_corners(x, skip.shape[1:3])
            x = block(x, train=train)
            x = jnp.concatenate([skip, x], axis=-1)
            x = block(x, train=train)

        x = nn.Conv(
            1,
            kernel_size=(1, 1),
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
        )(x)
        return nn.sigmoid(x)[..., 0]  # (B, H, W)
