"""Pallas conv v3: flat-lane NCHW — few BIG dots per grid step.

probe_pallas_conv3.py showed a ~5 ms floor invariant to tile height and
channel count: the kernel issues one small (Co,9Ci)@(9Ci,W) dot PER ROW
(B*H = 10240 MXU dispatches at 640^2 b16), so dispatch latency, not FLOPs
or DMA, dominates.

Here activations live as (B, C, H*W) — each grid step's tile is a
lane-contiguous (Ci, TH*W) slab.  The dj=+-1 taps become single-lane shifts
of the flat slab (cross-row bleed zeroed by an iota mask — exactly the
SAME-conv zero edge), the di taps are lane-offset slices of the halo-extended
scratch, and the contraction is ONE (or three) big dots per grid step:
(Co, 9Ci) @ (9Ci, TH*W).  B*H/TH = 640 dispatches instead of 10240.

Usage: python benchmarks/probe_pallas_conv4.py
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


def _kernel(xprev, xcur, xnext, k_ref, y_ref, xt, *, TH, Ci, Co, W, ndot,
            relu):
    L = TH * W
    xt[:, :W] = xprev[0, 0]
    xt[:, pl.ds(W, L)] = xcur[0]
    xt[:, TH * W + W:] = xnext[0, 0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (Ci, L), 1) % W
    not_first = (lane != 0).astype(xt.dtype)
    not_last = (lane != W - 1).astype(xt.dtype)

    def taps(di):
        slab = xt[:, pl.ds(di * W, L)]
        left = jnp.concatenate(
            [jnp.zeros((Ci, 1), slab.dtype), slab[:, :-1]], axis=1) * not_first
        right = jnp.concatenate(
            [slab[:, 1:], jnp.zeros((Ci, 1), slab.dtype)], axis=1) * not_last
        return left, slab, right

    if ndot == 1:
        x9 = jnp.concatenate(
            [t for di in range(3) for t in taps(di)], axis=0)  # (9Ci, L)
        acc = jax.lax.dot_general(
            k_ref[:], x9, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((Co, L), jnp.float32)
        for di in range(3):
            x3 = jnp.concatenate(taps(di), axis=0)  # (3Ci, L)
            acc = acc + jax.lax.dot_general(
                k_ref[pl.ds(di * 3 * Ci, 3 * Ci)], x3,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    y_ref[0] = acc.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("TH", "ndot", "relu"))
def conv3x3_flat(x, k, *, TH=16, ndot=1, relu=False):
    """x: (B, Ci, H, W) NCHW -> (B, Co, H, W); k: (3,3,Ci,Co)."""
    B, Ci, H, W = x.shape
    Co = k.shape[-1]
    assert H % TH == 0 and W % 128 == 0, (H, TH, W)
    tile = 16 if x.dtype == jnp.bfloat16 else 8
    Cp = max(tile, -(-Ci // tile) * tile)
    xp = jnp.pad(x, ((0, 0), (0, Cp - Ci), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Cp - Ci), (0, 0)))
    Ci = Cp
    # kmat rows ordered (di, dj, ci) to match the taps() concat order.
    kmat = jnp.transpose(kp, (3, 0, 1, 2)).reshape(Co, 9 * Ci)

    nblk = H // TH
    xh = jnp.pad(x if Ci == x.shape[1] else xp, ((0, 0), (0, 0), (1, 1), (0, 0)))
    # (B, nblk, Ci, W): nblk leads so the block's last two dims are full.
    prev = jnp.moveaxis(xh[:, :, 0:H:TH], 2, 1)
    nxt = jnp.moveaxis(xh[:, :, TH + 1:H + 2:TH], 2, 1)
    xflat = xp.reshape(B, Ci, H * W)

    L = TH * W
    row = pl.BlockSpec((1, 1, Ci, W), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    kspec = (pl.BlockSpec((Co, 9 * Ci), lambda b, i: (0, 0),
                          memory_space=pltpu.VMEM) if ndot == 1 else
             pl.BlockSpec((9 * Ci, Co), lambda b, i: (0, 0),
                          memory_space=pltpu.VMEM))
    kin = kmat if ndot == 1 else kmat.T
    y = pl.pallas_call(
        functools.partial(_kernel, TH=TH, Ci=Ci, Co=Co, W=W, ndot=ndot,
                          relu=relu),
        out_shape=jax.ShapeDtypeStruct((B, Co, H * W), x.dtype),
        grid=(B, nblk),
        in_specs=[
            row,
            pl.BlockSpec((1, Ci, L), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            row, kspec,
        ],
        out_specs=pl.BlockSpec((1, Co, L), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Ci, (TH + 2) * W), x.dtype)],
        interpret=jax.default_backend() != "tpu",
    )(prev, xflat, nxt, kin)
    return y.reshape(B, Co, H, W)


def conv_ref(x_nchw, k):
    return jax.lax.conv_general_dilated(
        x_nchw, k, (1, 1), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))


def main():
    rng = np.random.default_rng(0)
    for (B, H, W, Ci, Co, TH, ndot) in [(2, 32, 256, 8, 8, 8, 1),
                                        (1, 32, 128, 16, 16, 16, 1),
                                        (1, 32, 128, 16, 16, 16, 3),
                                        (2, 24, 128, 1, 8, 8, 1)]:
        x = rng.standard_normal((B, Ci, H, W)).astype(np.float32)
        k = (rng.standard_normal((3, 3, Ci, Co)) * 0.1).astype(np.float32)
        ref = conv_ref(jnp.asarray(x), jnp.asarray(k))
        got = conv3x3_flat(jnp.asarray(x), jnp.asarray(k), TH=TH, ndot=ndot)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"B{B} H{H} W{W} {Ci}->{Co} TH{TH} ndot{ndot}: maxerr {err:.2e}",
              flush=True)
        assert err < 1e-4, err

    if jax.default_backend() != "tpu":
        print("no TPU: correctness only", flush=True)
        return

    from benchmarks.timing import timeit, measure_rtt
    print(f"rtt {measure_rtt():.1f} ms", flush=True)
    B = 16
    for (HW, Ci, Co, TH, ndot) in [(640, 16, 16, 16, 1), (640, 16, 16, 16, 3),
                                   (640, 16, 16, 32, 1), (640, 16, 16, 64, 1),
                                   (640, 8, 8, 16, 1), (640, 8, 16, 16, 1),
                                   (640, 1, 8, 16, 1), (640, 16, 8, 16, 1)]:
        x = jnp.asarray(rng.standard_normal((B, Ci, HW, HW)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.1,
                        jnp.bfloat16)
        gflop = 2 * 9 * Ci * Co * HW * HW * B / 1e9
        f = jax.jit(functools.partial(conv3x3_flat, TH=TH, ndot=ndot))
        try:
            ms = timeit(f, x, k, n=10)
        except Exception as e:  # noqa: BLE001
            print(f"{HW}² {Ci:3d}->{Co:3d} TH{TH:2d} ndot{ndot}: "
                  f"FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        print(f"{HW}² {Ci:3d}->{Co:3d} TH{TH:2d} ndot{ndot}: flat {ms:7.2f} ms"
              f" ({gflop/ms:5.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
