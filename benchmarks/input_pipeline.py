"""Input-pipeline microbench: u8-on-the-wire + prefetch, measured controlled.

The reference hides its input cost in ``DataLoader(num_workers=4)`` worker
processes (`/root/reference/mm_masking/train_icp_weights.py:454-455`); this
repo's equivalent is a single prefetch thread plus shipping the polar image
planes uint8 (their on-disk format) and normalizing on device. Cross-run
epoch-time comparisons are polluted by tunnel-RTT variance (3-43 ms per
dispatch, session-dependent), so this bench measures both levers in ONE
process on the SAME shards:

  * host item decode (old: u8→f32 divide on host; new: planes stay u8)
  * collate + host→device transfer + device normalize, forced readback
  * a full epoch against a simulated consumer of --step-ms per batch,
    prefetch 0 (inline) vs 1 (the default): the overlap win

Usage (shards from benchmarks/e2e_product.py --datagen-only, full scale):
  python benchmarks/input_pipeline.py --root /tmp/e2e_product [--batches 6]

Prints one JSON line per measurement and a summary line.
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# in-process path setup (NOT PYTHONPATH — that shadows the axon plugin)
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


class _HostF32View:
    """The pre-u8 host pipeline, reproduced exactly: per-item f32 divide on
    the host, f32 collate, f32 host→device bytes. (The loader passes already-
    f32 planes through unchanged, so feeding these measures the old path.)"""

    def __init__(self, ds):
        self._ds = ds

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i):
        item = self._ds[i]
        loc = item["loc_data"]
        if loc["fft_data"].dtype == np.uint8:
            loc["fft_data"] = np.divide(loc["fft_data"], 255.0,
                                        dtype=np.float32)
            loc["fft_cfar"] = loc["fft_cfar"].astype(np.float32)
        return item


def _force(batch):
    """Force completion + readback of the staged device batch (the tunnel's
    block_until_ready returns early; a scalar readback does not)."""
    import jax.numpy as jnp

    return float(jnp.sum(batch["loc_data"]["fft_data"][..., :2, :2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/e2e_product",
                    help="e2e_product tree (run it with --datagen-only first)")
    ap.add_argument("--batches", type=int, default=6,
                    help="batches per timed epoch (b16 train shapes)")
    ap.add_argument("--step-ms", type=float, default=345.0,
                    help="simulated device-step time for the overlap test "
                         "(the measured full-scale train step)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from benchmarks.e2e_product import MAP_SEQ, VAL_SEQ, Scale
    from mm_masking_tpu.config import Config, DataConfig, ModelConfig
    from mm_masking_tpu.data import ICPWeightDataset, epoch_batches
    from mm_masking_tpu.data.loader import _collate, preprocess_batch

    sc = Scale()
    cfg = Config(
        model=ModelConfig(res=sc.res, polar_shape=(sc.A, sc.R),
                          cart_pixel_width=sc.cart, cart_resolution=sc.cart_res),
        data=DataConfig(map_sensor="lidar", loc_sensor="radar",
                        data_dir=args.root, pos_std=0.5, rot_std=0.1,
                        max_loc_pts=sc.max_loc_pts, max_map_pts=sc.max_map_pts),
        train_loc_pairs=((MAP_SEQ, "e2e-train"),),
        val_loc_pairs=((MAP_SEQ, VAL_SEQ),),
    )
    shard_dir = osp.join(args.root, "vtr_results", "radar_lidar", MAP_SEQ,
                         "e2e-train")
    if not osp.isdir(shard_dir):
        raise SystemExit(f"{shard_dir} missing — run benchmarks/e2e_product.py "
                         "--datagen-only (same --root) first")

    ds = ICPWeightDataset(list(cfg.train_loc_pairs), cfg, "train")
    b = 16
    # always fill full batches (items wrap around small datasets)
    n_items = args.batches * b
    results = {}

    for name, view in (("u8", ds), ("host_f32", _HostF32View(ds))):
        # 1) host item decode rate (includes PNG/npy decode, CFAR cache read,
        #    ragged filter + pad; f32 adds the host divide)
        t0 = time.perf_counter()
        items = [view[i % len(view)] for i in range(n_items)]
        t_items = time.perf_counter() - t0
        # 2) collate + H2D + device normalize (+warp at cartesian config),
        #    one warmup batch for the compile, then timed
        batches = [items[i * b:(i + 1) * b] for i in range(args.batches)]
        _force(preprocess_batch(_collate(batches[0]), cfg))
        t0 = time.perf_counter()
        for chunk in batches:
            _force(preprocess_batch(_collate(chunk), cfg))
        t_collate = time.perf_counter() - t0
        bytes_per_batch = sum(
            v.nbytes for v in _collate(batches[0])["loc_data"].values())
        rec = {"pipeline": name,
               "host_decode_items_per_s": round(n_items / t_items, 2),
               "collate_h2d_ms_per_batch": round(t_collate / args.batches * 1e3, 1),
               "host_batch_mb": round(bytes_per_batch / 1e6, 1)}
        results[name] = rec
        print(json.dumps(rec), flush=True)

    # 3) epoch wall-clock with a simulated --step-ms consumer: inline vs
    #    prefetch (content equality of the two orders is tested in
    #    tests/test_dataset.py; here we time only)
    for prefetch in (0, 1):
        t0 = time.perf_counter()
        n = 0
        for batch in epoch_batches(ds, b, cfg, shuffle=False,
                                   prefetch=prefetch):
            _force(batch)
            time.sleep(args.step_ms / 1e3)
            n += 1
            if n >= args.batches:
                break
        dt = time.perf_counter() - t0
        rec = {"pipeline": f"epoch_prefetch{prefetch}",
               "epoch_s_per_batch": round(dt / n, 3),
               "step_ms_simulated": args.step_ms, "batches": n}
        results[f"prefetch{prefetch}"] = rec
        print(json.dumps(rec), flush=True)

    summary = {
        "metric": "input_pipeline",
        "u8_vs_f32_collate_speedup": round(
            results["host_f32"]["collate_h2d_ms_per_batch"]
            / results["u8"]["collate_h2d_ms_per_batch"], 2),
        "u8_vs_f32_bytes_ratio": round(
            results["host_f32"]["host_batch_mb"]
            / results["u8"]["host_batch_mb"], 2),
        "prefetch_overlap_speedup": round(
            results["prefetch0"]["epoch_s_per_batch"]
            / results["prefetch1"]["epoch_s_per_batch"], 2),
        **{f"{k}.{kk}": vv for k, v in results.items()
           for kk, vv in v.items() if kk != "pipeline"},
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
