"""Probe: Pallas 3x3 conv for the UNet's low-channel stages.

Why: XLA lowers NHWC convs with C < 128 to ~1.5-7% MXU utilization — the
lane dimension is the channel count, padded to 128 (docs/BENCH_DETAIL.md
"conv lowering" table: 2.5-3.1 TF/s-eff at 16 channels, every alternative
formulation included). A direct matmul probe on the same chip reaches
~68 TF/s at 4096³ (benchmarks in round-4 STATUS), so the documented "chip
ceiling" was a *layout* ceiling, not a hardware one.

This kernel stores activations as (B, H, C, W) — "NHCW" — so the minor two
dims (C, W) are dense for small C (W = 640 = 5x128 lanes; C = 8/16 packs the
bf16 sublane tile exactly), builds the im2col matrix in VMEM per row-tile
(9 strided VMEM copies per tile, never touching HBM), and contracts
K' (Co, 9Ci) @ X''t (9Ci, W) on the MXU with K = 9*Ci instead of Ci.

Usage:
  python benchmarks/probe_pallas_conv.py            # correctness (CPU interpret)
  python benchmarks/probe_pallas_conv.py --chip     # timing vs XLA conv (TPU)
"""
from __future__ import annotations

import argparse
import functools
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, k_ref, y_ref, xt, x9, sem, *, TH, Ci, Co, W, relu):
    """One grid step: output rows [i*TH, i*TH+TH) of batch item b.

    x_hbm: (B, H+2, Ci, W) in ANY/HBM — H pre-padded by one zero row each side.
    k_ref: (Co, 9*Ci) VMEM — kernel already flattened (ci, di, dj) -> k index.
    y_ref: (TH, Co, W) VMEM output block.
    xt:    (TH+2, Ci, W) VMEM scratch — the row tile incl. halo.
    x9:    (TH, 9*Ci, W) VMEM scratch — im2col stack.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * TH, TH + 2)], xt, sem)
    cp.start()
    cp.wait()

    # Build the im2col stack: x9[t, (di*3+dj)*Ci + ci, w] = xt[t+di, ci, w+dj-1]
    for di in range(3):
        slab = xt[pl.ds(di, TH)]  # (TH, Ci, W)
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

    kmat = k_ref[:]  # (Co, 9Ci)
    for t in range(TH):
        acc = jax.lax.dot_general(
            kmat, x9[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Co, W)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        y_ref[0, t] = acc.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("TH", "relu", "interpret"))
def conv3x3_nhcw_pallas(x, k, *, TH=8, relu=False, interpret=False):
    """3x3 SAME conv. x: (B, H, C_in, W) -> (B, H, C_out, W).

    k: (3, 3, Ci, Co) HWIO (matches lax.conv_general_dilated NHWC/HWIO).
    """
    B, H, Ci, W = x.shape
    Co = k.shape[-1]
    assert H % TH == 0, (H, TH)
    # Sublane alignment: the im2col scratch writes Ci-row slabs at offsets
    # (di*3+dj)*Ci along the sublane dim — Mosaic requires tile-aligned
    # offsets, so pad Ci up to the dtype's sublane tile (zero channels
    # contribute nothing; k is padded to match).
    tile = {jnp.bfloat16: 16, jnp.float32: 8}.get(
        jnp.dtype(x.dtype).type, 8)
    Cp = max(tile, -(-Ci // tile) * tile)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, Cp - Ci), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Cp - Ci), (0, 0)))
    Ci = Cp
    # (3,3,Ci,Co) -> (Co, 9Ci) with k-index (di*3+dj)*Ci + ci
    kmat = jnp.transpose(kp, (3, 0, 1, 2)).reshape(Co, 9 * Ci)

    grid = (B, H // TH)
    return pl.pallas_call(
        functools.partial(_kernel, TH=TH, Ci=Ci, Co=Co, W=W, relu=relu),
        out_shape=jax.ShapeDtypeStruct((B, H, Co, W), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((Co, 9 * Ci), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, Co, W), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, Ci, W), x.dtype),
            pltpu.VMEM((TH, 9 * Ci, W), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, kmat)


def conv3x3_xla_nhwc(x_nhwc, k):
    return jax.lax.conv_general_dilated(
        x_nhwc, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def check_correctness():
    rng = np.random.default_rng(0)
    for (B, H, W, Ci, Co) in [(2, 32, 256, 8, 8), (1, 16, 128, 16, 8),
                              (2, 24, 128, 8, 16), (1, 8, 256, 3, 8)]:
        x = rng.standard_normal((B, H, W, Ci)).astype(np.float32)
        k = (rng.standard_normal((3, 3, Ci, Co)) * 0.1).astype(np.float32)
        ref = conv3x3_xla_nhwc(jnp.asarray(x), jnp.asarray(k))
        x_nhcw = jnp.asarray(np.moveaxis(x, -1, 2))
        got = conv3x3_nhcw_pallas(x_nhcw, jnp.asarray(k), TH=8,
                                  interpret=jax.default_backend() != "tpu")
        got_nhwc = jnp.moveaxis(got, 2, -1)
        err = float(jnp.max(jnp.abs(got_nhwc - ref)))
        print(f"B{B} H{H} W{W} {Ci}->{Co}: maxerr {err:.2e}")
        assert err < 1e-4, err
    print("correctness OK")


def time_chip():
    from benchmarks.timing import timeit, measure_rtt
    print(f"rtt {measure_rtt():.1f} ms")
    rng = np.random.default_rng(0)
    B = 16
    for (HW, Ci, Co, TH) in [(640, 8, 8, 8), (640, 8, 16, 8),
                             (640, 16, 16, 8), (640, 16, 16, 16),
                             (640, 16, 8, 8), (320, 16, 32, 8),
                             (320, 32, 32, 8), (640, 1, 8, 8)]:
        x = jnp.asarray(rng.standard_normal((B, HW, HW, Ci)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.1,
                        jnp.bfloat16)
        x_nhcw = jnp.moveaxis(x, -1, 2)
        gflop = 2 * 9 * Ci * Co * HW * HW * B / 1e9

        ms_xla = timeit(jax.jit(conv3x3_xla_nhwc), x, k, n=10)
        f = jax.jit(functools.partial(conv3x3_nhcw_pallas, TH=TH))
        ms_pal = timeit(f, x_nhcw, k, n=10)
        print(f"{HW}² {Ci:3d}->{Co:3d} TH{TH:2d}: xla {ms_xla:7.2f} ms "
              f"({gflop/ms_xla:5.1f} TF/s) | pallas {ms_pal:7.2f} ms "
              f"({gflop/ms_pal:5.1f} TF/s) | {ms_xla/ms_pal:4.2f}x")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--chip", action="store_true")
    args = ap.parse_args()
    if args.chip:
        from mm_masking_tpu.utils.cache import enable_compile_cache
        enable_compile_cache()
        time_chip()
    else:
        check_correctness()
