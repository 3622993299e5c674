"""Isolate the low-channel conv problem: what does a 3x3 conv at 640² really
cost on this chip, and does an explicit im2col matmul beat XLA's conv?

All variants are numerically the same SAME conv; timings amortize dispatch
overhead over many in-graph iterations via lax.scan-of-convs (one dispatch).

Usage: python benchmarks/probe_conv.py
"""
from __future__ import annotations

import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mm_masking_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def timeit_scan(step_fn, x, iters=20, warmup=1):
    """Time `iters` dependent applications inside ONE jitted program."""

    @jax.jit
    def run(x):
        def body(c, _):
            return step_fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    for _ in range(warmup):
        float(jnp.sum(run(x).astype(jnp.float32)))
    tic = time.perf_counter()
    float(jnp.sum(run(x).astype(jnp.float32)))
    return (time.perf_counter() - tic) / iters * 1e3


def main():
    B, H, C = 16, 640, 16
    rng = np.random.default_rng(0)
    kflop = 2 * 9 * C * C * H * H * B / 1e9

    for dtype in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(rng.random((B, H, H, C)), dtype)
        k = jnp.asarray(rng.random((3, 3, C, C)) * 0.05, dtype)

        def conv(v):
            return jax.lax.conv_general_dilated(
                v, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        ms = timeit_scan(conv, x)
        print(f"conv NHWC {dtype.__name__:9s} {ms:7.2f} ms  "
              f"{kflop / ms:6.1f} TF/s-eff")

        # NCHW layout
        xc = jnp.moveaxis(x, -1, 1)
        kc = jnp.transpose(k, (3, 2, 0, 1))  # OIHW

        def conv_nchw(v):
            return jax.lax.conv_general_dilated(
                v, kc, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )

        ms = timeit_scan(conv_nchw, xc)
        print(f"conv NCHW {dtype.__name__:9s} {ms:7.2f} ms  "
              f"{kflop / ms:6.1f} TF/s-eff")

        # tap-sum matmul: y = sum_{di,dj} shift(x) @ W[di,dj]  (9 matmuls of
        # (B*H*W, C) x (C, C), no im2col materialization)
        def conv_taps(v):
            vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = None
            for di in range(3):
                for dj in range(3):
                    xs = vp[:, di:di + H, dj:dj + H, :]
                    y = jnp.einsum("bhwi,io->bhwo", xs, k[di, dj])
                    out = y if out is None else out + y
            return out

        ms = timeit_scan(conv_taps, x)
        print(f"tap-sum   {dtype.__name__:9s} {ms:7.2f} ms  "
              f"{kflop / ms:6.1f} TF/s-eff")

        # im2col matmul: (B*HW, 9C) x (9C, C)
        def conv_im2col(v):
            vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = jnp.concatenate(
                [vp[:, di:di + H, dj:dj + H, :]
                 for di in range(3) for dj in range(3)], axis=-1
            )  # (B, H, W, 9C)
            km = k.reshape(9 * C, C)
            return jnp.einsum("bhwk,ko->bhwo", cols, km)

        ms = timeit_scan(conv_im2col, x)
        print(f"im2col    {dtype.__name__:9s} {ms:7.2f} ms  "
              f"{kflop / ms:6.1f} TF/s-eff")


if __name__ == "__main__":
    main()
