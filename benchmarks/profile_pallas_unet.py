"""Full-UNet chip timing: XLA NHWC lowering vs Pallas NHCW (conv_impl).

The question this answers: does the per-conv Pallas win (probe_pallas_conv*)
survive composition into the full network — transposes, fused relu epilogues,
pool/upsample in NHCW, custom-VJP backward — at the bench shapes?

Usage: python benchmarks/profile_pallas_unet.py [--batch 16] [--width 640]
Run ONLY when no other TPU client is live.
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp

from mm_masking_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from benchmarks.timing import measure_rtt, timeit  # noqa: E402
from mm_masking_tpu.models.unet import UNet  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impls", default="xla,pallas_nhcw")
    ap.add_argument("--skip-bwd", action="store_true")
    args = ap.parse_args()
    B, W, C = args.batch, args.width, args.channels
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    print(f"device={jax.devices()[0]} rtt={measure_rtt():.1f} ms "
          f"b{B} {W}x{W}x{C} {args.dtype}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, W, W, C)), dtype)

    variables = None
    for impl in args.impls.split(","):
        net = UNet(dropout=0.0, dtype=dtype, conv_impl=impl)
        if variables is None:
            variables = net.init({"params": jax.random.PRNGKey(0)}, x,
                                 train=False)

        fwd = jax.jit(lambda v, a, net=net: net.apply(v, a, train=False))
        ms = timeit(fwd, variables, x, n=10)
        print(f"{impl:12s} fwd     b{B}: {ms:7.1f} ms")

        if not args.skip_bwd:
            def loss(v, a, net=net):
                y = net.apply(v, a, train=False)
                return jnp.sum((y * y).astype(jnp.float32))

            grad = jax.jit(jax.grad(loss))
            ms = timeit(grad, variables, x, n=10)
            print(f"{impl:12s} fwd+bwd b{B}: {ms:7.1f} ms")


if __name__ == "__main__":
    main()
