"""Deployment evaluation on the e2e corridor's HELD-OUT sequence.

Round 4 produced its deployed-in-loop numbers ad hoc; this script makes the
whole protocol reproducible in one command (VERDICT r4 #1 "deployed-in-loop
RMSE win reproduced on that sequence" + #9 per-sequence reporting):

  1. teach: odometry-built map from the teach sequence's lidar frames
     (the localization CLI's own `teach` command — no GT in the map).
  2. localize the held-out repeat sequence four ways through the SAME CLI
     path a product user runs: {unweighted ones, trained mask} ×
     {GT-prior warm starts, prior-free constant-velocity chain}.
  3. per-run stats JSON + the per-sequence error-over-trajectory plots.
  4. mechanism check: per-point mask weights on val scans classified as
     true-return vs multipath ghost against the KNOWN synthetic world
     (ghost offsets live at sc.ghost_off behind the wall face).

Usage (after `benchmarks/e2e_product.py` has trained a run):
  python benchmarks/eval_deployment.py --root /tmp/e2e_r5_m4 \
      --checkpoint results/checkpoints/e2e_product_r5 --out results/e2e_product_r5
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from mm_masking_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from mm_masking_tpu.localization.__main__ import main as loc_main  # noqa: E402


def seg_dist_2d(pts_xy: np.ndarray, segs) -> np.ndarray:
    """Min distance from each 2D point to any wall segment of the world."""
    best = np.full(pts_xy.shape[0], np.inf)
    for (x0, y0), (x1, y1) in segs:
        a = np.array([x0, y0])
        d = np.array([x1 - x0, y1 - y0])
        L2 = float(d @ d)
        if L2 < 1e-12:
            dist = np.linalg.norm(pts_xy - a, axis=-1)
        else:
            t = np.clip(((pts_xy - a) @ d) / L2, 0.0, 1.0)
            dist = np.linalg.norm(pts_xy - (a + t[:, None] * d), axis=-1)
        best = np.minimum(best, dist)
    return best


def ghost_suppression(root: str, checkpoint: str, scale, n_frames: int = 8):
    """Mean mask weight on true returns vs planted ghosts, classified
    against the exactly-known synthetic world."""
    from e2e_product import MAP_SEQ, VAL_SEQ, build_world  # noqa: F401

    from mm_masking_tpu.config import Config
    from mm_masking_tpu.data.boreas import read_traj_file_gt2
    from mm_masking_tpu.localization import LocalizationConfig
    from mm_masking_tpu.localization.__main__ import (
        _extract_clouds,
        _load_radar_frames,
        _scan_files,
        _stamp_of,
    )
    from mm_masking_tpu.models import LearnICPWeightPolicy
    from mm_masking_tpu.ops import extract_weights
    from mm_masking_tpu.train.checkpoint import load_policy_variables

    rng = np.random.default_rng(7)  # synthesize_tree's world seed
    _, segs = build_world(rng, scale)

    cfg = Config.from_dict(
        json.load(open(osp.join(checkpoint, "config.json"))))
    policy = LearnICPWeightPolicy(cfg)
    variables = load_policy_variables(checkpoint)

    scan_dir = osp.join(root, "vtr_data", VAL_SEQ, "radar")
    _, paths = _scan_files(scan_dir)
    paths = paths[:n_frames]
    stamps = [_stamp_of(p) for p in paths]
    frames = _load_radar_frames(paths)
    loc_cfg = LocalizationConfig(max_points=scale.max_loc_pts,
                                 radar_resolution=scale.res)
    clouds = np.asarray(_extract_clouds(frames, loc_cfg, batch_size=4))

    gt_poses, gt_times = read_traj_file_gt2(
        osp.join(root, "vtr_data", VAL_SEQ, "applanix", "radar_poses.csv"),
        dim=2)
    gt_times = list(gt_times)

    import jax.numpy as jnp

    mask = policy.mask_for_scan(
        variables, jnp.asarray(frames["fft"]), jnp.asarray(frames["azimuths"])
    )
    w, _stats = extract_weights(
        mask, jnp.asarray(clouds),
        cart_pixel_width=cfg.model.cart_pixel_width,
        cart_resolution=cfg.model.cart_resolution,
    )
    w = np.asarray(w)

    true_w, ghost_w = [], []
    lo, hi = scale.ghost_off
    for i, st in enumerate(stamps):
        T = gt_poses[gt_times.index(st)]
        c = clouds[i]
        valid = ~((c[:, 0] == 0.0) & (c[:, 1] == 0.0))
        pts_w = (c[valid] @ T[:3, :3].T + T[:3, 3])[:, :2]
        dist = seg_dist_2d(pts_w, segs)
        true_w.append(w[i, valid][dist <= min(0.35, lo * 0.7)])
        ghost_w.append(w[i, valid][(dist >= lo * 0.9) & (dist <= hi * 1.2)])
    tw = np.concatenate(true_w)
    gw = np.concatenate(ghost_w)
    return {
        "n_true": int(tw.size), "n_ghost": int(gw.size),
        "mean_w_true": float(tw.mean()), "mean_w_ghost": float(gw.mean()),
        "suppression_ratio": float(tw.mean() / max(gw.mean(), 1e-12)),
        "median_w_true": float(np.median(tw)),
        "median_w_ghost": float(np.median(gw)),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="/tmp/e2e_r5_m4")
    ap.add_argument("--checkpoint", default="results/checkpoints/e2e_product_r5")
    ap.add_argument("--out", default="results/e2e_product_r5")
    ap.add_argument("--scale", default="full", choices=["tiny", "mid", "full"])
    ap.add_argument("--init-pos-std", type=float, default=0.5)
    ap.add_argument("--init-rot-std", type=float, default=0.1)
    ap.add_argument("--skip-ghost", action="store_true")
    args = ap.parse_args()

    from e2e_product import MAP_SEQ, TINY, MID, VAL_SEQ, Scale

    sc = {"tiny": TINY, "mid": MID, "full": Scale()}[args.scale]
    os.makedirs(args.out, exist_ok=True)
    root = args.root

    map_npz = osp.join(args.out, "teach_map.npz")
    map_scans = osp.join(root, "vtr_data", MAP_SEQ, "lidar")
    val_scans = osp.join(root, "vtr_data", VAL_SEQ, "radar")
    map_gt = osp.join(root, "vtr_data", MAP_SEQ, "applanix",
                      "lidar_poses.csv")
    loc_gt = osp.join(root, "vtr_data", VAL_SEQ, "applanix",
                      "radar_poses.csv")

    if not osp.exists(map_npz):
        rc = loc_main([
            "teach", "--scans", map_scans, "--out-map", map_npz,
            "--max-points", str(sc.max_loc_pts),
            "--max-map-pts", str(sc.max_map_pts),
        ])
        assert rc == 0, "teach failed"

    summary = {}
    for label, extra in {
        "ones": [],
        "learned": ["--checkpoint", args.checkpoint],
        "chain_ones": ["--init-chain"],
        "chain_learned": ["--init-chain", "--checkpoint", args.checkpoint],
    }.items():
        stats_p = osp.join(args.out, f"stats_{label}.json")
        argv = [
            "localize", "--scans", val_scans, "--map", map_npz,
            "--out-traj", osp.join(args.out, f"traj_{label}.txt"),
            "--max-points", str(sc.max_loc_pts),
            # NB: the CLI's LocalizationConfig default radar_resolution
            # (0.0596) IS the full-scale world's resolution; tiny/mid
            # trees would need a flag the CLI doesn't expose per-scale.
            "--map-gt", map_gt, "--loc-gt", loc_gt,
            "--stats", stats_p,
            "--plots-dir", osp.join(args.out, "plots"),
        ] + extra
        if "--init-chain" not in extra:
            argv += ["--init-gt", "--init-pos-std", str(args.init_pos_std),
                     "--init-rot-std", str(args.init_rot_std)]
        rc = loc_main(argv)
        assert rc == 0, f"localize {label} failed"
        summary[label] = json.load(open(stats_p))
        print(f"[deploy] {label}: trans_rmse "
              f"{summary[label]['trans_rmse']:.4f} m", file=sys.stderr,
              flush=True)

    summary["rmse_ratio_gt_prior"] = (
        summary["ones"]["trans_rmse"] / summary["learned"]["trans_rmse"])
    summary["rmse_ratio_chain"] = (
        summary["chain_ones"]["trans_rmse"]
        / summary["chain_learned"]["trans_rmse"])

    if not args.skip_ghost:
        gs = ghost_suppression(root, args.checkpoint, sc)
        with open(osp.join(args.out, "ghost_suppression.json"), "w") as f:
            json.dump(gs, f, indent=1)
        summary["ghost_suppression"] = gs

    with open(osp.join(args.out, "deploy_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
