"""3x3 SAME conv Pallas kernels in NHCW layout, with a custom VJP.

Why this exists: the UNet's low-channel stages (8-32 channels at 640^2 /
320^2, reference architecture `/root/reference/mm_masking/icp_weight_policy.py:85-86`)
are PADDING-bound under XLA's conv lowering on TPU — NHWC puts C on the
128-lane dim, so bf16[16,640,640,8] is stored/streamed at 8-16x its logical
size (compile-dump evidence in docs/BENCH_DETAIL.md).  Putting W on the lane
dim and C on sublanes — layout (B, H, C, W), "NHCW" — stores the activation
dense: W=640 is 5x128 lanes, C>=8 fills sublanes.  The conv itself becomes,
per row, an im2col contraction K'(Co, 9Ci) @ X9(9Ci, W) on the MXU, with the
X9 gather built in VMEM (never materialized in HBM).

Measured on the tunneled v5e chip (benchmarks/probe_pallas_conv.py): 1.4-2.7x
over `lax.conv` at the UNet's 640^2 stages as standalone programs, more once
per-program dispatch overhead is amortized inside the train step.

Grid/pipelining design: grid (B, H/TH); the row-tile input block plus TWO
one-row halo arrays (the rows directly above/below each tile, pre-sliced as
(B, nblk, C, W) so they pipeline as ordinary block inputs).  This keeps input
DMA at (TH+2)/TH ~= 1.1x instead of the 3x of a halo-by-neighbor-blocks
scheme.

The custom VJP mirrors the standard conv adjoints:
  dx = conv3x3(dy, rot180(k)^T)    (same forward kernel, swapped kernel)
  dk = sum_tiles X9(9Ci, W) @ dy(W, Co)   (dedicated accumulation kernel)
  db = sum dy                      (XLA reduce)
An optional fused bias+ReLU epilogue saves one HBM round trip per conv; its
backward masks dy by (y > 0) which is exact for ReLU.

All shapes are padded internally: C to the sublane tile (8 f32 / 16 bf16),
W to a multiple of 128 lanes (zero-pad, slice back — zero padding commutes
with SAME conv so results are exact).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sublane_tile(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def _pick_th(H: int) -> int:
    for th in (16, 8, 5, 4, 2, 1):
        if H % th == 0:
            return th
    return 1


def _fwd_kernel(xprev, xcur, xnext, k_ref, b_ref, y_ref, xt, x9, *,
                TH, Ci, Co, relu):
    """One (batch, row-tile) grid step: halo-extend, im2col in VMEM, dot."""
    W = xcur.shape[-1]
    xt[0] = xprev[0, 0]
    xt[pl.ds(1, TH)] = xcur[0]
    xt[TH + 1] = xnext[0, 0]

    # x9[t, (di*3+dj)*Ci:(di*3+dj+1)*Ci, w] = xt[t+di, :, w+dj-1] (zero edge)
    for di in range(3):
        slab = xt[pl.ds(di, TH)]
        for dj in range(3):
            if dj == 0:
                sh = jnp.concatenate(
                    [jnp.zeros((TH, Ci, 1), slab.dtype), slab[..., :-1]],
                    axis=-1)
            elif dj == 2:
                sh = jnp.concatenate(
                    [slab[..., 1:], jnp.zeros((TH, Ci, 1), slab.dtype)],
                    axis=-1)
            else:
                sh = slab
            x9[:, pl.ds((di * 3 + dj) * Ci, Ci), :] = sh

    kmat = k_ref[:]
    bias = b_ref[:]  # (Co, 1)
    for t in range(TH):
        acc = jax.lax.dot_general(
            kmat, x9[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + bias
        if relu:
            acc = jnp.maximum(acc, 0.0)
        y_ref[0, t] = acc.astype(y_ref.dtype)


def _dk_kernel(xprev, xcur, xnext, dy_ref, dk_ref, xt, x9, *, TH, Ci, Co):
    """Accumulate dk(9Ci, Co) += sum_t X9[t](9Ci, W) @ dy[t](Co, W)^T."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    xt[0] = xprev[0, 0]
    xt[pl.ds(1, TH)] = xcur[0]
    xt[TH + 1] = xnext[0, 0]
    for di in range(3):
        slab = xt[pl.ds(di, TH)]
        for dj in range(3):
            if dj == 0:
                sh = jnp.concatenate(
                    [jnp.zeros((TH, Ci, 1), slab.dtype), slab[..., :-1]],
                    axis=-1)
            elif dj == 2:
                sh = jnp.concatenate(
                    [slab[..., 1:], jnp.zeros((TH, Ci, 1), slab.dtype)],
                    axis=-1)
            else:
                sh = slab
            x9[:, pl.ds((di * 3 + dj) * Ci, Ci), :] = sh

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    acc = jnp.zeros((9 * Ci, Co), jnp.float32)
    for t in range(TH):
        acc = acc + jax.lax.dot_general(
            x9[t], dy_ref[0, t], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    dk_ref[:] += acc


def _halo_rows(xp: jax.Array, TH: int, nblk: int):
    """Rows above/below each TH-tile of the (already 1-row-padded) array.

    xp: (B, H+2, C, W) where row r maps to x row r-1 (rows 0 and H+1 zero).
    Returns prev (B, nblk, C, W) = xp[:, i*TH] and next = xp[:, (i+1)*TH+1].
    """
    H = TH * nblk
    prev = xp[:, 0:H:TH]
    nxt = xp[:, TH + 1:H + 2:TH]
    return prev, nxt


def _conv_nhcw_raw(x: jax.Array, kmat: jax.Array, bias: jax.Array,
                   relu: bool, TH: int) -> jax.Array:
    """Padded-shape forward. x: (B, H, Ci, W); kmat: (Co, 9Ci); bias: (Co, 1)."""
    B, H, Ci, W = x.shape
    Co = kmat.shape[0]
    nblk = H // TH
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    prev, nxt = _halo_rows(xp, TH, nblk)

    row = pl.BlockSpec((1, 1, Ci, W), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, TH=TH, Ci=Ci, Co=Co, relu=relu),
        out_shape=jax.ShapeDtypeStruct((B, H, Co, W), x.dtype),
        grid=(B, nblk),
        in_specs=[
            row, pl.BlockSpec((1, TH, Ci, W), lambda b, i: (b, i, 0, 0),
                              memory_space=pltpu.VMEM), row,
            pl.BlockSpec((Co, 9 * Ci), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Co, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, Co, W), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, Ci, W), x.dtype),
            pltpu.VMEM((TH, 9 * Ci, W), x.dtype),
        ],
        interpret=_interpret(),
    )(prev, x, nxt, kmat, bias)


def _dk_nhcw_raw(x: jax.Array, dy: jax.Array, TH: int) -> jax.Array:
    """Padded-shape dk. x: (B, H, Ci, W); dy: (B, H, Co, W) -> (9Ci, Co) f32."""
    B, H, Ci, W = x.shape
    Co = dy.shape[2]
    nblk = H // TH
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    prev, nxt = _halo_rows(xp, TH, nblk)

    row = pl.BlockSpec((1, 1, Ci, W), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dk_kernel, TH=TH, Ci=Ci, Co=Co),
        out_shape=jax.ShapeDtypeStruct((9 * Ci, Co), jnp.float32),
        grid=(B, nblk),
        in_specs=[
            row, pl.BlockSpec((1, TH, Ci, W), lambda b, i: (b, i, 0, 0),
                              memory_space=pltpu.VMEM), row,
            pl.BlockSpec((1, TH, Co, W), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * Ci, Co), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, Ci, W), x.dtype),
            pltpu.VMEM((TH, 9 * Ci, W), x.dtype),
        ],
        interpret=_interpret(),
    )(prev, x, nxt, dy)


def _pad_cw(x: jax.Array, Cp: int, Wp: int) -> jax.Array:
    B, H, C, W = x.shape
    if C == Cp and W == Wp:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, Cp - C), (0, Wp - W)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_nhcw(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                 relu: bool = False) -> jax.Array:
    """3x3 SAME stride-1 conv (+bias, optional fused ReLU) in NHCW layout.

    x: (B, H, C_in, W); kernel: (3, 3, C_in, C_out) — the same HWIO parameter
    tensor `nn.Conv` uses, so checkpoints are layout-portable; bias: (C_out,).
    Returns (B, H, C_out, W).  Differentiable via a custom VJP (conv-adjoint
    dx, Pallas-accumulated dk); numerics match `lax.conv_general_dilated` with
    f32 accumulation.
    """
    y, _ = _conv_fwd(x, kernel, bias, relu)
    return y


def _conv_fwd(x, kernel, bias, relu):
    B, H, Ci, W = x.shape
    Co = kernel.shape[-1]
    tile = _sublane_tile(x.dtype)
    Cip = max(tile, -(-Ci // tile) * tile)
    Wp = -(-W // 128) * 128
    TH = _pick_th(H)

    xpad = _pad_cw(x, Cip, Wp)
    kp = jnp.pad(kernel, ((0, 0), (0, 0), (0, Cip - Ci), (0, 0)))
    kmat = jnp.transpose(kp, (3, 0, 1, 2)).reshape(Co, 9 * Cip).astype(x.dtype)
    bcol = bias.reshape(Co, 1).astype(jnp.float32)

    y = _conv_nhcw_raw(xpad, kmat, bcol, relu, TH)
    y = y[:, :, :, :W]
    return y, (x, kernel, bias, y)


def _conv_bwd(relu, res, dy):
    x, kernel, bias, y = res
    B, H, Ci, W = x.shape
    Co = kernel.shape[-1]
    if relu:
        dy = dy * (y > 0).astype(dy.dtype)

    tile = _sublane_tile(x.dtype)
    Cip = max(tile, -(-Ci // tile) * tile)
    Cop = max(tile, -(-Co // tile) * tile)
    Wp = -(-W // 128) * 128
    TH = _pick_th(H)

    dyp = _pad_cw(dy, Cop, Wp)

    # dx: conv of dy with the rotated/transposed kernel (standard adjoint).
    krot = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,Co,Ci)
    krotp = jnp.pad(krot, ((0, 0), (0, 0), (0, Cop - Co), (0, 0)))
    kmat_rot = jnp.transpose(krotp, (3, 0, 1, 2)).reshape(
        Ci, 9 * Cop).astype(dy.dtype)
    zbias = jnp.zeros((Ci, 1), jnp.float32)
    dx = _conv_nhcw_raw(dyp, kmat_rot, zbias, False, TH)[:, :, :, :W]

    # dk: accumulate X9 @ dy over all tiles.
    xpad = _pad_cw(x, Cip, Wp)
    dk9 = _dk_nhcw_raw(xpad, dyp, TH)  # (9*Cip, Cop) f32
    dk = dk9.reshape(3, 3, Cip, Cop)[:, :, :Ci, :Co].astype(kernel.dtype)

    db = jnp.sum(dy, axis=(0, 1, 3)).astype(bias.dtype)
    return dx, dk, db


conv3x3_nhcw.defvjp(_conv_fwd, _conv_bwd)
