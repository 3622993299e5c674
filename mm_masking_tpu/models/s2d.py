"""Space-to-depth convolution: exact 3×3 conv in a lane-dense layout.

The UNet's FLOPs concentrate in its full-resolution stages (640², 8-16
channels), where a TPU conv runs the MXU at ~3.5% utilization: an NHWC conv
lowers to a matmul with N = C_out ≤ 16 of 128 output lanes (and K = 9·C_in of
128), so >90% of the systolic array idles and every activation touch wastes
lanes.

Space-to-depth fixes the layout, not the math: block the image b×b so the
channel dimension becomes b²·C (8 → 128 at b=4), and rewrite the 3×3 stride-1
SAME conv as an **exactly equivalent** 2×2 VALID conv over the blocked
layout. The blocked kernel is built from the original by scattering taps
(`s2d_conv_kernel`), inflating FLOPs by 4b²/9 (1.78× at b=2, 7.1× at b=4) but
raising MXU occupancy by ~b²·C/8-fold — net wins whenever utilization, not
FLOPs, is the binding constraint, which is exactly the low-channel regime.

Derivation (per axis): pad the image by 1 on the leading edge and b−1 on the
trailing edge; S2D block K phase u then holds original row bK+u−1, and the
taps of output row bI+p (di ∈ {−1,0,1}) live at phases u = p+di+1−b·s of
blocks I+s with s ∈ {0,1} — two consecutive blocks always suffice for b ≥ 2,
hence the 2×2 blocked kernel.

Gradients flow through the blocked conv like any other conv (the kernel
scatter is a fixed linear map of the weights), so this is usable in both the
forward and training paths. Parity with `lax.conv` SAME is tested to f32
round-off in tests/test_s2d.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array, b: int) -> jax.Array:
    """(B, H, W, C) → (B, H/b, W/b, b·b·C); phase-major channel layout
    out[..., (u·b + v)·C + c] = x[..., bI+u, bJ+v, c]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/b, W/b, u, v, C)
    return x.reshape(B, H // b, W // b, b * b * C)


def depth_to_space(y: jax.Array, b: int) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    B, Hb, Wb, CC = y.shape
    C = CC // (b * b)
    y = y.reshape(B, Hb, Wb, b, b, C)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, Hb * b, Wb * b, C)


@functools.lru_cache(maxsize=64)
def _scatter_index(b: int, cin: int, cout: int):
    """Host-side index map for kernel construction: for each (s, t, u, v,
    p, q) the source tap (di+1, dj+1) or -1 if zero."""
    idx = np.full((2, 2, b, b, b, b), -1, np.int32)
    for s in range(2):
        for t in range(2):
            for u in range(b):
                for v in range(b):
                    for p in range(b):
                        for q in range(b):
                            di = u - 1 - p + b * s
                            dj = v - 1 - q + b * t
                            if -1 <= di <= 1 and -1 <= dj <= 1:
                                idx[s, t, u, v, p, q] = (di + 1) * 3 + (dj + 1)
    return idx


def s2d_conv_kernel(kernel: jax.Array, b: int) -> jax.Array:
    """(3, 3, Cin, Cout) → (2, 2, b²·Cin, b²·Cout) blocked-equivalent kernel."""
    _, _, cin, cout = kernel.shape
    idx = jnp.asarray(_scatter_index(b, cin, cout))  # (2,2,b,b,b,b)
    flat = kernel.reshape(9, cin, cout)
    flat = jnp.concatenate([flat, jnp.zeros((1, cin, cout), kernel.dtype)])
    # gather: W2[s,t,u,v,p,q,ci,co] = flat[idx or zero]
    W2 = flat[jnp.where(idx < 0, 9, idx)]  # (2,2,b,b,b,b,cin,cout)
    # reorder to ((u,v,ci), (p,q,co)) channel-major layout
    W2 = W2.transpose(0, 1, 2, 3, 6, 4, 5, 7)  # s,t,u,v,ci,p,q,co
    return W2.reshape(2, 2, b * b * cin, b * b * cout)


def conv3x3_s2d(x: jax.Array, kernel: jax.Array, b: int,
                bias: jax.Array | None = None) -> jax.Array:
    """Exact SAME 3×3 stride-1 conv of (B, H, W, Cin) via the blocked layout.

    H, W must be divisible by b (true for every UNet stage: 640/320 with
    b = 4/2)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, b - 1), (1, b - 1), (0, 0)))
    xs = space_to_depth(xp, b)  # (B, H/b + 1, W/b + 1, b²C)
    k2 = s2d_conv_kernel(kernel, b)
    ys = jax.lax.conv_general_dilated(
        xs, k2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        # bias repeats per phase: layout ((p, q), co).
        ys = ys + jnp.tile(bias, b * b)
    return depth_to_space(ys, b)


def pick_block(h: int, cin: int, cout: int, lane: int = 128) -> int:
    """Heuristic block factor: smallest b ∈ {1, 2, 4} that fills the lanes
    with b²·max(Cin, Cout) ≥ lane, without exceeding spatial size."""
    c = max(cin, cout)
    for b in (1, 2, 4):
        if b * b * c >= lane and h % b == 0:
            return b
    return 4 if h % 4 == 0 else (2 if h % 2 == 0 else 1)
