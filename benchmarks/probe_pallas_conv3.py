"""Pallas conv3x3 v2: pipelined halo blocks instead of serial manual DMA.

probe_pallas_conv2.py showed all kernel variants share a ~4.5 ms floor —
the manual make_async_copy per grid step serializes DMA wait with compute.
Here the halo is fed as THREE BlockSpec inputs over the same H-padded array
(blocks i, i+1, i+2 of a (B, H + 2*TH, C, W) tensor), so Mosaic's grid
pipeline prefetches and double-buffers them like any other block input.

Usage:
  python benchmarks/probe_pallas_conv3.py          # correctness + timing on chip
"""
from __future__ import annotations

import functools
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mm_masking_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def _kernel(xprev, xcur, xnext, k_ref, y_ref, xt, x9, *, TH, Ci, Co, W,
            relu):
    # xt: (TH+2, Ci, W) — halo-extended row tile.
    xt[0] = xprev[0, TH - 1]
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

    kmat = k_ref[:]
    for t in range(TH):
        acc = jax.lax.dot_general(
            kmat, x9[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        y_ref[0, t] = acc.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("TH", "relu"))
def conv3x3_nhcw_v2(x, k, *, TH=16, relu=False):
    """3x3 SAME conv, x: (B, H, Ci, W) -> (B, H, Co, W); k: (3,3,Ci,Co)."""
    B, H, Ci, W = x.shape
    Co = k.shape[-1]
    assert H % TH == 0 and W % 128 == 0, (H, TH, W)
    tile = 16 if x.dtype == jnp.bfloat16 else 8
    Cp = max(tile, -(-Ci // tile) * tile)
    xp = jnp.pad(x, ((0, 0), (TH, TH), (0, Cp - Ci), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Cp - Ci), (0, 0)))
    Ci = Cp
    kmat = jnp.transpose(kp, (3, 0, 1, 2)).reshape(Co, 9 * Ci)

    blk = lambda off: pl.BlockSpec(  # noqa: E731
        (1, TH, Ci, W), lambda b, i, off=off: (b, i + off, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, TH=TH, Ci=Ci, Co=Co, W=W, relu=relu),
        out_shape=jax.ShapeDtypeStruct((B, H, Co, W), x.dtype),
        grid=(B, H // TH),
        in_specs=[blk(0), blk(1), blk(2),
                  pl.BlockSpec((Co, 9 * Ci), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TH, Co, W), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, Ci, W), x.dtype),
            pltpu.VMEM((TH, 9 * Ci, W), x.dtype),
        ],
    )(xp, xp, xp, kmat)


def conv_ref(x_nhwc, k):
    return jax.lax.conv_general_dilated(
        x_nhwc, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)
    # correctness (f32, exact)
    for (B, H, W, Ci, Co, TH) in [(2, 32, 256, 8, 8, 8),
                                  (1, 32, 128, 16, 16, 16),
                                  (2, 24, 128, 1, 8, 8)]:
        x = rng.standard_normal((B, H, W, Ci)).astype(np.float32)
        k = (rng.standard_normal((3, 3, Ci, Co)) * 0.1).astype(np.float32)
        ref = conv_ref(jnp.asarray(x), jnp.asarray(k))
        got = conv3x3_nhcw_v2(jnp.asarray(np.moveaxis(x, -1, 2)),
                              jnp.asarray(k), TH=TH)
        err = float(jnp.max(jnp.abs(jnp.moveaxis(got, 2, -1) - ref)))
        print(f"B{B} H{H} W{W} {Ci}->{Co} TH{TH}: maxerr {err:.2e}")
        assert err < 1e-4, err

    # timing
    from benchmarks.timing import timeit, measure_rtt
    print(f"rtt {measure_rtt():.1f} ms")
    B = 16
    for (HW, Ci, Co, TH) in [(640, 16, 16, 8), (640, 16, 16, 16),
                             (640, 16, 16, 32), (640, 8, 8, 16),
                             (640, 8, 16, 16), (640, 16, 8, 16),
                             (640, 1, 8, 16)]:
        x = jnp.asarray(rng.standard_normal((B, HW, HW, Ci)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.1,
                        jnp.bfloat16)
        x_nhcw = jnp.moveaxis(x, -1, 2)
        gflop = 2 * 9 * Ci * Co * HW * HW * B / 1e9
        ms_xla = timeit(jax.jit(conv_ref), x, k, n=10)
        f = jax.jit(functools.partial(conv3x3_nhcw_v2, TH=TH))
        ms = timeit(f, x_nhcw, k, n=10)
        print(f"{HW}² {Ci:3d}->{Co:3d} TH{TH:2d}: xla {ms_xla:7.2f} | "
              f"pallas-v2 {ms:7.2f} ms ({gflop/ms:5.1f} TF/s) "
              f"| {ms_xla/ms:4.2f}x")


if __name__ == "__main__":
    main()
