"""Per-op UNet timing on the real chip: where do the 259 ms go?

Times each conv stage shape in isolation (fwd and fwd+bwd), the bilinear
align-corners upsample, dropout RNG, batch-global normalization, and the full
UNet — with forced scalar readbacks (the axon tunnel's block_until_ready
returns early). Run this ONLY when no other TPU client is live.

Usage: python benchmarks/profile_unet.py [--batch 16] [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Runnable as `python benchmarks/profile_unet.py` without an installed
# package (do NOT use PYTHONPATH=/root/repo — it breaks the axon TPU plugin).
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.time() - t0) / n * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--s2d", action="store_true",
                    help="run the full-UNet timings in the space-to-depth "
                         "conv layout (models/s2d.py)")
    args = ap.parse_args()
    B = args.batch
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    W0 = args.width

    print(f"device={jax.devices()[0]}, batch={B}, dtype={args.dtype}")
    rng = np.random.default_rng(0)

    # --- individual conv stages (enc path shapes incl. pre-pool full-res) ---
    stages = [
        ("enc1a 1->8 @640", W0, 1, 8),
        ("enc1b 8->8 @640", W0, 8, 8),
        ("enc2a 8->16 @640", W0, 8, 16),
        ("enc2b 16->16 @640", W0, 16, 16),
        ("enc3a 16->32 @320", W0 // 2, 16, 32),
        ("enc4a 32->64 @160", W0 // 4, 32, 64),
        ("enc5a 64->128 @80", W0 // 8, 64, 128),
        ("enc6a 128->256 @40", W0 // 16, 128, 256),
        ("dec-last 16->8 @640", W0, 16, 8),
    ]
    total_fwd = 0.0
    for name, hw, cin, cout in stages:
        x = jnp.asarray(rng.random((B, hw, hw, cin)), dtype)
        k = jnp.asarray(rng.random((3, 3, cin, cout)) * 0.1, dtype)

        @jax.jit
        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        ms = timeit(conv, x, k)
        gflop = 2 * 9 * cin * cout * hw * hw * B / 1e9
        total_fwd += ms
        line = (f"{name:22s} {ms:8.2f} ms   {gflop:7.1f} GFLOP "
                f"{gflop / ms:8.1f} TF/s-eff")
        if args.s2d:
            from mm_masking_tpu.models.s2d import conv3x3_s2d, pick_block

            b = pick_block(hw, cin, cout)
            if b > 1:
                ms2 = timeit(jax.jit(lambda x, k, b=b: conv3x3_s2d(x, k, b)),
                             x, k)
                line += f"   | s2d b={b} {ms2:8.2f} ms ({ms / ms2:4.2f}x)"
        print(line)
    print(f"{'sum of probed convs':22s} {total_fwd:8.2f} ms")

    # --- upsample, dropout, normalize -----------------------------------
    from mm_masking_tpu.models.unet import upsample_bilinear_align_corners

    x = jnp.asarray(rng.random((B, W0 // 2, W0 // 2, 8)), dtype)
    up = jax.jit(lambda v: upsample_bilinear_align_corners(v, (W0, W0)))
    print(f"{'upsample 320->640 c8':22s} {timeit(up, x):8.2f} ms")

    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.random((B, W0, W0, 8)), dtype)

    @jax.jit
    def drop(k, v):
        keep = jax.random.bernoulli(k, 0.95, v.shape)
        return jnp.where(keep, v / 0.95, 0)

    print(f"{'dropout @640 c8':22s} {timeit(drop, key, x):8.2f} ms")

    xf = jnp.asarray(rng.random((B, W0, W0, 1)), jnp.float32)

    @jax.jit
    def minmax(v):
        mx = jnp.max(v, axis=(0, 1, 2), keepdims=True)
        mn = jnp.min(v, axis=(0, 1, 2), keepdims=True)
        return (v - mn) / (mx - mn)

    print(f"{'batch minmax @640':22s} {timeit(minmax, xf):8.2f} ms")

    # --- full UNet ---------------------------------------------------------
    from mm_masking_tpu.models.unet import UNet

    unet = UNet(dtype=dtype, dropout=0.05, s2d=args.s2d)
    xin = jnp.asarray(rng.random((B, W0, W0, 1)), dtype)
    variables = unet.init({"params": jax.random.PRNGKey(0)}, xin, train=False)

    fwd = jax.jit(lambda v, x: unet.apply(v, x, train=False))
    print(f"{'UNet fwd (no drop)':22s} {timeit(fwd, variables, xin):8.2f} ms")

    def loss_fn(v, x, k):
        out = unet.apply(v, x, train=True, rngs={"dropout": k})
        return jnp.sum(out.astype(jnp.float32))

    grad = jax.jit(jax.grad(loss_fn))
    print(f"{'UNet fwd+bwd (train)':22s} "
          f"{timeit(grad, variables, xin, key):8.2f} ms")

    def loss_nd(v, x):
        out = unet.apply(v, x, train=False)
        return jnp.sum(out.astype(jnp.float32))

    grad_nd = jax.jit(jax.grad(loss_nd))
    print(f"{'UNet fwd+bwd (nodrop)':22s} "
          f"{timeit(grad_nd, variables, xin):8.2f} ms")


if __name__ == "__main__":
    main()
