"""Benchmark: end-to-end scan-pairs/sec on the flagship configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the jitted inference step (UNet mask → weight lookup → 50-iteration
ICP localization) and the jitted training step (10-iter unrolled ICP + 6-term
loss + backprop + optimizer) at reference operating shapes
(640×640 cartesian input, batch 16 train / 32 eval — BASELINE.md), then reports
combined scan-pairs/sec/chip. ``vs_baseline`` compares against the reference
PyTorch pipeline measured on this host (stored in bench_baseline.json with
provenance; the reference repo ships no numbers of its own — BASELINE.md).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from mm_masking_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def _force(out):
    """Force completion with a scalar host readback.

    `block_until_ready` on the tunneled `axon` platform returns before remote
    execution finishes; pulling a value derived from the outputs is the only
    honest completion barrier.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def time_fn(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        _force(fn(*args))
    tic = time.perf_counter()
    for _ in range(iters):
        _force(fn(*args))
    return (time.perf_counter() - tic) / iters


def main():
    from mm_masking_tpu.config import Config, ModelConfig, TrainConfig
    from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch
    from mm_masking_tpu.parallel import make_mesh, shard_batch
    from mm_masking_tpu.train import Trainer

    spec = SyntheticSpec(n_scan=2048, n_map=8192)
    batch_train = 16
    batch_eval = 32
    # Production config: bf16 UNet activations (geometry stays f32 highest).
    # Measured bf16-vs-f32 deviation at these shapes: max 6.3e-6 m / 2.7e-7
    # sin-rot — five orders of magnitude inside the 1 cm / 0.05° parity budget.
    cfg = Config(
        model=ModelConfig(dropout=0.05, max_iter=10, inference_max_iter=50,
                          dtype="bfloat16"),
        train=TrainConfig(batch_size_train=batch_train,
                          batch_size_test=batch_eval),
    )
    trainer = Trainer(cfg, mesh=make_mesh())
    state = trainer.init_state()

    train_batch = shard_batch(
        synthetic_batch(0, batch=batch_train, spec=spec), trainer.mesh
    )
    eval_batch = shard_batch(
        synthetic_batch(1, batch=batch_eval, spec=spec), trainer.mesh
    )

    def train_step(state, batch):
        return trainer._train_step(state, batch, mask_losses_active=True)

    def eval_step(state, batch):
        return trainer._eval_step(state, batch, binary=False)

    t_train = time_fn(lambda: train_step(state, train_batch), iters=6)
    t_eval = time_fn(lambda: eval_step(state, eval_batch), iters=6)

    train_sps = batch_train / t_train
    eval_sps = batch_eval / t_eval
    # Combined metric: harmonic-style aggregate over the two phases (one train
    # scan-pair + one eval scan-pair processed back to back).
    combined = 2.0 / (1.0 / train_sps + 1.0 / eval_sps)

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs_baseline = 0.0
    if os.path.exists(baseline_path):
        ref = json.load(open(baseline_path))
        ref_combined = ref.get("combined_scan_pairs_per_sec")
        if ref_combined:
            vs_baseline = combined / ref_combined

    result = {
        "metric": "scan_pairs_per_sec_per_chip",
        "value": round(combined, 3),
        "unit": "scan-pairs/s",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "train_scan_pairs_per_sec": round(train_sps, 3),
            "eval_scan_pairs_per_sec": round(eval_sps, 3),
            "train_step_ms": round(t_train * 1e3, 2),
            "eval_step_ms": round(t_eval * 1e3, 2),
            "device": str(jax.devices()[0]),
            "shapes": {
                "cart": 640, "polar": [400, 3360],
                "n_scan": spec.n_scan, "n_map": spec.n_map,
                "batch_train": batch_train, "batch_eval": batch_eval,
            },
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
