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


def upsample_bilinear_align_corners(
    x: jax.Array, size: tuple[int, int], axes: tuple[int, int] = (1, 2)
) -> jax.Array:
    """Separable bilinear resize with align_corners=True (torch semantics).

    x: (B, H, W, C) → (B, h, w, C) by default; ``axes`` selects the two
    spatial axes (NHCW layout passes (1, 3)). Output pixel i samples input
    coordinate ``i * (in - 1) / (out - 1)``.
    """
    H, W = x.shape[axes[0]], x.shape[axes[1]]
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

    x = axis_resize(x, H, h, axis=axes[0])
    x = axis_resize(x, W, w, axis=axes[1])
    return x


def conv3x3_tapsum(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """SAME 3×3 stride-1 conv as nine shifted (HW, Cin)×(Cin, Cout) matmuls.

    Numerically the same contraction as the conv (per-output sum over 9·Cin
    terms, bf16 inputs / f32 accumulate on the MXU), but measured ~1.2×
    faster than XLA's conv lowering at the UNet's low-channel 640² stages
    (benchmarks/probe_conv.py; all formulations saturate ~2.5-3 TF/s-eff on
    this chip, far below lane/HBM rooflines — see docs/BENCH_DETAIL.md)."""
    B, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for di in range(3):
        for dj in range(3):
            y = jnp.einsum(
                "bhwi,io->bhwo", xp[:, di:di + H, dj:dj + W, :], kernel[di, dj]
            )
            out = y if out is None else out + y
    return out


class Conv3x3(nn.Module):
    """3×3 SAME conv with a choice of execution path: XLA's conv, the
    tap-sum matmul form, the space-to-depth blocked layout, or the Pallas
    NHCW kernel (``impl="pallas_nhcw"`` — input/output are (B, H, C, W)).

    Parameter names/shapes match ``nn.Conv`` exactly (kernel (3, 3, Cin,
    Cout), bias (Cout,)), so checkpoints are interchangeable between all
    execution paths — these are *lowering* choices, not architecture changes
    (numerics verified equal in tests/test_s2d.py, test_unet.py,
    test_pallas_conv.py).
    """

    features: int
    use_s2d: bool = False
    impl: str = "xla"  # "xla" | "tapsum" | "pallas_nhcw"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fuse_relu: bool = False):
        cin = x.shape[2] if self.impl == "pallas_nhcw" else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.xavier_uniform(),
            (3, 3, cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        x = x.astype(self.dtype)
        if self.impl == "pallas_nhcw":
            W = x.shape[3]
            # Pallas pays off while the 128-lane W padding is small (the
            # 640/320-px stages, which carry ~90% of the UNet's HBM traffic);
            # deeper stages keep XLA's conv in the same NHCW layout (C there
            # is lane-aligned enough that XLA stops being padding-bound).
            if W % 128 == 0 or W >= 320:
                from mm_masking_tpu.ops.pallas.conv2d import conv3x3_nhcw

                return conv3x3_nhcw(x, kernel, bias, fuse_relu)
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), "SAME",
                dimension_numbers=("NHCW", "HWIO", "NHCW"),
            ) + bias.reshape(1, 1, -1, 1)
            return jnp.maximum(y, 0.0) if fuse_relu else y
        b = 1
        if self.use_s2d:
            from mm_masking_tpu.models.s2d import conv3x3_s2d, pick_block

            b = pick_block(x.shape[1], cin, self.features)
            if x.shape[1] % b or x.shape[2] % b:
                b = 1
        y = None
        if b > 1:
            y = conv3x3_s2d(x, kernel, b, bias=bias)
        elif self.impl == "tapsum":
            y = conv3x3_tapsum(x, kernel) + bias
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
        return jnp.maximum(y, 0.0) if fuse_relu else y


class ConvBlock(nn.Module):
    """conv3x3-relu[-bn]-conv3x3-relu[-bn][-dropout][-maxpool]."""

    features: int
    leaky: bool
    batch_norm: bool
    dropout: float
    pool: bool
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # `train` is positional (not keyword-only) so nn.remat can declare it
        # static (static_argnums below) — it reaches Python control flow.
        nhcw = self.conv_impl == "pallas_nhcw"
        act = (lambda v: nn.leaky_relu(v, 0.1)) if self.leaky else nn.relu
        # Plain ReLU rides the Pallas conv epilogue (one HBM round trip
        # saved per conv); leaky stays a separate elementwise op.
        fuse = nhcw and not self.leaky
        bn_axis = 2 if nhcw else -1
        # Explicit names keep the param tree identical to the former nn.Conv
        # modules — checkpoints restore across the layout switch.
        x = Conv3x3(self.features, use_s2d=self.s2d, impl=self.conv_impl,
                    dtype=self.dtype, name="Conv_0")(x, fuse)
        if not fuse:
            x = act(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             axis=bn_axis)(x)
        x = Conv3x3(self.features, use_s2d=self.s2d, impl=self.conv_impl,
                    dtype=self.dtype, name="Conv_1")(x, fuse)
        if not fuse:
            x = act(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             axis=bn_axis)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        if self.pool:
            if nhcw:
                # -inf init (not finfo.min): reduce_window only has a
                # reverse-mode rule for the canonical max-pool pattern.
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 1, 2), (1, 2, 1, 2),
                    "VALID")
            else:
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return x


class UNet(nn.Module):
    """Full-resolution sigmoid weight mask over the input image."""

    enc_channels: Sequence[int] = (8, 16, 32, 64, 128, 256)
    leaky: bool = False
    batch_norm: bool = False
    dropout: float = 0.05
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False  # execute low-channel convs in space-to-depth layout
    conv_impl: str = "xla"  # "xla" | "tapsum" | "pallas_nhcw" conv lowering
    # Rematerialize each conv block on the backward pass (jax.checkpoint).
    # The train step is padded-HBM-bound on this chip (docs/BENCH_DETAIL.md),
    # so trading recompute for resident activations lets batch 64 compile —
    # larger batches amortize XLA's 8x low-channel layout padding.
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        Block = nn.remat(ConvBlock, static_argnums=(2,)) if self.remat else ConvBlock
        enc = list(self.enc_channels)
        dec = list(reversed(enc))  # [256, 128, 64, 32, 16, 8]
        # The Pallas conv path runs the whole network in (B, H, C, W) —
        # W on the 128-lane dim keeps low-channel activations dense in HBM
        # where NHWC pads C to 128 (docs/BENCH_DETAIL.md). One transpose in;
        # the final 1×1 conv transposes back so its params stay nn.Conv's.
        nhcw = self.conv_impl == "pallas_nhcw"
        if nhcw:
            x = jnp.moveaxis(x, -1, 2)
        sp_axes = (1, 3) if nhcw else (1, 2)
        ch_axis = 2 if nhcw else -1

        # Encoder; record each block's *input* as the skip (reference
        # `icp_weight_policy.py:162-166` stores pre-block activations).
        skips = []
        for i, ch in enumerate(enc):
            skips.append(x)
            # Explicit names keep the param tree identical with and without
            # the remat wrapper (auto-naming would become CheckpointConvBlock).
            x = Block(
                features=ch,
                leaky=self.leaky,
                batch_norm=self.batch_norm,
                dropout=self.dropout,
                pool=(i > 0),
                dtype=self.dtype,
                s2d=self.s2d,
                conv_impl=self.conv_impl,
                name=f"ConvBlock_{i}",
            )(x, train)
        skips.reverse()

        # Decoder with the double-application weight sharing.
        for i in range(len(dec) - 1):
            block = Block(
                features=dec[i + 1],
                leaky=self.leaky,
                batch_norm=self.batch_norm,
                dropout=self.dropout,
                pool=False,
                dtype=self.dtype,
                s2d=self.s2d,
                conv_impl=self.conv_impl,
                name=f"ConvBlock_{len(enc) + i}",
            )
            skip = skips[i]
            size = (skip.shape[sp_axes[0]], skip.shape[sp_axes[1]])
            x = upsample_bilinear_align_corners(x, size, axes=sp_axes)
            x = block(x, train)
            x = jnp.concatenate([skip, x], axis=ch_axis)
            x = block(x, train)

        if nhcw:
            x = jnp.swapaxes(x, 2, 3)
        x = nn.Conv(
            1,
            kernel_size=(1, 1),
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros_init(),
            dtype=self.dtype,
        )(x)
        return nn.sigmoid(x)[..., 0]  # (B, H, W)
