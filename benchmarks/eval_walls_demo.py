"""Learning-demo scorecard: learned mask vs init/ones/CFAR/oracle baselines.

Loads the best checkpoint of a walls-scene training run, evaluates the
canonical (norm, rot, trans) error triple on held-out scenes for:

  init        — the perturbed initial guess, no ICP
  ones        — ICP with all-ones weights (the reference's key baseline,
                `train_icp_weights.py:275-344`)
  cfar        — ICP weighted by the CFAR image sampled at the points
  learned     — ICP weighted by the trained UNet mask
  oracle      — ICP with ground-truth clutter labels (upper bound)

and dumps learned-mask / FFT images for the first batch. Writes a JSON
scorecard next to the checkpoint.

Usage: python benchmarks/eval_walls_demo.py --ckpt results/checkpoints/walls_demo_v2
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np

# Runnable as `python benchmarks/eval_walls_demo.py` without an installed
# package (do NOT use PYTHONPATH=/root/repo — it breaks the axon TPU plugin).
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="results/checkpoints/walls_demo_v2")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--loc-pts", type=int, default=768)
    ap.add_argument("--map-pts", type=int, default=2048)
    ap.add_argument("--pos-std", type=float, default=1.0)
    ap.add_argument("--rot-std", type=float, default=0.25)
    args = ap.parse_args()

    from mm_masking_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch
    from mm_masking_tpu.dicp import ICPConfig, icp
    from mm_masking_tpu.ops import extract_weights
    from mm_masking_tpu.train import Trainer
    from mm_masking_tpu.train.checkpoint import restore_checkpoint
    from mm_masking_tpu.train.loss import eval_validation_loss
    from mm_masking_tpu.utils.visualize import save_mask_image

    cfg = Config(
        model=ModelConfig(icp_type="pt2pl"),
        data=DataConfig(max_loc_pts=args.loc_pts, max_map_pts=args.map_pts,
                        pos_std=args.pos_std, rot_std=args.rot_std),
        # Optimizer knobs must match the training run: the checkpoint's
        # opt_state tree includes the clip stage.
        train=TrainConfig(checkpoint_dir=args.ckpt, learning_rate=3e-4,
                          clip_value=1.0),
    )
    spec = SyntheticSpec(scene="walls", clutter_frac=0.35,
                         pos_std=args.pos_std, rot_std=args.rot_std,
                         n_scan=args.loc_pts, n_map=args.map_pts)

    trainer = Trainer(cfg)
    state = restore_checkpoint(args.ckpt, "best_policy", trainer.init_state())

    icp_cfg = ICPConfig(icp_type="pt2pl", max_iterations=50,
                        differentiable=False)

    @jax.jit
    def run_weighted(scan, map_pc, T_init, w):
        return icp(scan, map_pc, T_init, weight=w, cfg=icp_cfg)["T"]

    rows = {k: [] for k in ("init", "ones", "cfar", "learned", "oracle")}
    for i in range(args.batches):
        b = synthetic_batch(20_000_000 + i, args.batch_size, spec,
                            with_oracle=True)
        scan = b["loc_data"]["filtered_pc"]
        map_pc = b["map_data"]["pc"]
        T_init = b["transforms"]["T_ml_init"]
        T_gt = b["transforms"]["T_ml_gt"]
        oracle = b["loc_data"]["oracle_weights"]
        valid = ~((scan[..., 0] == 0) & (scan[..., 1] == 0))

        def err(T):
            return [float(x) for x in eval_validation_loss(T, T_gt)]

        rows["init"].append(err(T_init))
        rows["ones"].append(err(run_weighted(scan, map_pc, T_init,
                                             valid.astype(scan.dtype))))
        w_cfar, _ = extract_weights(b["loc_data"]["fft_cfar"], scan)
        rows["cfar"].append(err(run_weighted(scan, map_pc, T_init, w_cfar)))
        rows["oracle"].append(err(run_weighted(scan, map_pc, T_init, oracle)))

        out = trainer.policy.apply(
            state.variables, b["loc_data"], b["map_data"], T_init, train=False
        )
        rows["learned"].append(err(out.T_pred))

        if i == 0:
            art = osp.join(args.ckpt, "demo_artifacts")
            save_mask_image(np.asarray(out.weight_mask)[0], art, "learned_mask")
            save_mask_image(np.asarray(b["loc_data"]["fft_data"])[0], art,
                            "fft_input")
            save_mask_image(np.asarray(b["loc_data"]["fft_cfar"])[0], art,
                            "cfar_mask")
            # Mask value at real vs clutter returns — the separation metric.
            w_learned, _ = extract_weights(out.weight_mask, scan)
            wl = np.asarray(w_learned)
            ocl = np.asarray(oracle)
            vmask = np.asarray(valid)
            sep = {
                "mean_w_real": float(wl[(ocl > 0.5) & vmask].mean()),
                "mean_w_clutter": float(wl[(ocl < 0.5) & vmask].mean()),
            }

    score = {
        k: {
            "norm": float(np.mean([r[0] for r in v])),
            "rot": float(np.mean([r[1] for r in v])),
            "trans": float(np.mean([r[2] for r in v])),
        }
        for k, v in rows.items()
    }
    score["mask_separation"] = sep
    score["wins"] = {
        "learned_beats_ones": score["learned"]["norm"] < score["ones"]["norm"],
        "learned_beats_cfar": score["learned"]["norm"] < score["cfar"]["norm"],
        "learned_vs_ones_ratio": score["learned"]["norm"] / score["ones"]["norm"],
        "learned_vs_oracle_ratio": (
            score["learned"]["norm"] / max(score["oracle"]["norm"], 1e-9)
        ),
    }
    out_path = osp.join(args.ckpt, "demo_scorecard.json")
    with open(out_path, "w") as f:
        json.dump(score, f, indent=2)
    print(json.dumps(score, indent=2))


if __name__ == "__main__":
    main()
