"""Decompose the pallas conv3x3 kernel cost: im2col assembly vs MXU dot.

Variants (all at 640², 16->16, b16, bf16 — the canonical low-channel stage):
  full      — the probe_pallas_conv kernel (assembly + TH dots)
  asm-only  — build x9, skip the dots (sum x9 tile instead)
  dot-only  — skip assembly, dot on uninitialized scratch
  tap-dots  — no x9: accumulate 9 small K=Ci dots straight from xt
  row2      — dots over two rows at once (N = 2W) via x9 (TH, 9Ci, 2W) pairs

Usage: python benchmarks/probe_pallas_conv2.py
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


def make(variant, TH, Ci, Co, W):
    def kern(x_hbm, k_ref, y_ref, xt, x9, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * TH, TH + 2)], xt, sem)
        cp.start()
        cp.wait()

        if variant in ("full", "asm-only", "row2"):
            for di in range(3):
                slab = xt[pl.ds(di, TH)]
                for dj in range(3):
                    if dj == 0:
                        sh = jnp.concatenate(
                            [jnp.zeros((TH, Ci, 1), slab.dtype),
                             slab[..., :-1]], axis=-1)
                    elif dj == 2:
                        sh = jnp.concatenate(
                            [slab[..., 1:],
                             jnp.zeros((TH, Ci, 1), slab.dtype)], axis=-1)
                    else:
                        sh = slab
                    x9[:, pl.ds((di * 3 + dj) * Ci, Ci), :] = sh

        kmat = k_ref[:]
        if variant == "asm-only":
            y_ref[0, :, :, :] = jnp.repeat(
                x9[:, :Co, :], 1, axis=0).astype(y_ref.dtype)
        elif variant in ("full", "dot-only"):
            for t in range(TH):
                acc = jax.lax.dot_general(
                    kmat, x9[t], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y_ref[0, t] = acc.astype(y_ref.dtype)
        elif variant == "row2":
            for t in range(0, TH, 2):
                pair = jnp.concatenate([x9[t], x9[t + 1]], axis=-1)
                acc = jax.lax.dot_general(
                    kmat, pair, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y_ref[0, t] = acc[:, :W].astype(y_ref.dtype)
                y_ref[0, t + 1] = acc[:, W:].astype(y_ref.dtype)
        elif variant == "tap-dots":
            for t in range(TH):
                acc = jnp.zeros((Co, W), jnp.float32)
                for di in range(3):
                    row = xt[t + di]  # (Ci, W)
                    for dj in range(3):
                        if dj == 0:
                            sh = jnp.concatenate(
                                [jnp.zeros((Ci, 1), row.dtype),
                                 row[:, :-1]], axis=-1)
                        elif dj == 2:
                            sh = jnp.concatenate(
                                [row[:, 1:],
                                 jnp.zeros((Ci, 1), row.dtype)], axis=-1)
                        else:
                            sh = row
                        ktap = k_ref[:, pl.ds((di * 3 + dj) * Ci, Ci)]
                        acc = acc + jax.lax.dot_general(
                            ktap, sh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                y_ref[0, t] = acc.astype(y_ref.dtype)
        return

    return kern


def run(variant, x, kmat, TH, Ci, Co, W):
    B, Hp = x.shape[0], x.shape[1]
    H = Hp - 2
    return pl.pallas_call(
        make(variant, TH, Ci, Co, W),
        out_shape=jax.ShapeDtypeStruct((B, H, Co, W), x.dtype),
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((Co, 9 * Ci), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, Co, W), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, Ci, W), x.dtype),
            pltpu.VMEM((TH, 9 * Ci, W), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(x, kmat)


def main():
    from benchmarks.timing import timeit, measure_rtt
    print(f"rtt {measure_rtt():.1f} ms")
    rng = np.random.default_rng(0)
    B, HW, Ci, Co = 16, 640, 16, 16
    gflop = 2 * 9 * Ci * Co * HW * HW * B / 1e9
    x = jnp.asarray(rng.standard_normal((B, HW + 2, Ci, HW)), jnp.bfloat16)
    kmat = jnp.asarray(rng.standard_normal((Co, 9 * Ci)) * 0.1, jnp.bfloat16)
    for TH in (8, 16):
        for variant in ("full", "asm-only", "dot-only", "row2", "tap-dots"):
            f = jax.jit(functools.partial(
                run, variant, TH=TH, Ci=Ci, Co=Co, W=HW))
            try:
                ms = timeit(f, x, kmat, n=10)
            except Exception as e:  # noqa: BLE001
                print(f"TH{TH:2d} {variant:9s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")
                continue
            print(f"TH{TH:2d} {variant:9s}: {ms:7.2f} ms "
                  f"({gflop/ms:5.1f} TF/s-eff)")


if __name__ == "__main__":
    main()
