"""Diagnostic figure generation (replaces the reference's Neptune image
artifacts and the legacy `utils/gen_diagram_imgs.py`).

Renders the same artifact set the reference logs per validation epoch
(`train_icp_weights.py:109-169`, `icp_weight_policy.py:221-264`): learned
masks, raw BEV / CFAR / FFT-threshold / map-BEV masks, and weighted-pointcloud
scatter plots. Uses matplotlib's Agg backend; every function returns the saved
path.
"""
from __future__ import annotations

import os
import os.path as osp

import numpy as np

import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot as plt  # noqa: E402


def save_mask_image(mask: np.ndarray, out_dir: str, name: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = osp.join(out_dir, f"{name}.png")
    fig = plt.figure()
    plt.imshow(np.asarray(mask), cmap="gray")
    plt.colorbar(location="top", shrink=0.5)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def save_pointclouds(scan_pc: np.ndarray, map_pc: np.ndarray, out_dir: str,
                     name: str, pad_val: float = 1000.0) -> str:
    """Scan (blue) over map (red), pads stripped — the reference's
    "extracted_pc" artifact."""
    os.makedirs(out_dir, exist_ok=True)
    path = osp.join(out_dir, f"{name}.png")
    map_pc = np.asarray(map_pc)
    scan_pc = np.asarray(scan_pc)
    m = map_pc[(np.abs(map_pc[:, 0]) < pad_val) & (np.abs(map_pc[:, 1]) < pad_val)]
    s = scan_pc[np.abs(scan_pc[:, 0]) > 0.05]
    fig = plt.figure()
    plt.scatter(m[:, 0], m[:, 1], s=1.0, c="r")
    plt.scatter(s[:, 0], s[:, 1], s=0.5, c="b")
    plt.legend(["map", "scan"])
    plt.title("Pointclouds")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def save_weighted_scan(scan_pc: np.ndarray, weights: np.ndarray, out_dir: str,
                       name: str) -> str:
    """Weighted-scan scatter: used points colored by weight, near-zero-weight
    points in gray on black — the reference's "weighted_pc" artifact."""
    os.makedirs(out_dir, exist_ok=True)
    path = osp.join(out_dir, f"{name}.png")
    scan_pc = np.asarray(scan_pc)
    weights = np.asarray(weights)
    keep = np.abs(scan_pc[:, 0]) > 0.05
    pc, w = scan_pc[keep], weights[keep]
    if np.isnan(w.sum()):
        w = np.zeros_like(w)
    if w.max() > 0:
        w = w / w.max()
    used, unused = w > 0.01, w <= 0.01
    fig, ax = plt.subplots()
    ax.set_facecolor("black")
    sc = ax.scatter(pc[used, 0], pc[used, 1], c=w[used], cmap="spring",
                    s=0.5, vmin=0.0, vmax=1.0)
    ax.scatter(pc[unused, 0], pc[unused, 1], c=0.5 + w[unused],
               cmap="binary", s=0.5, vmin=0.0, vmax=1.0)
    plt.colorbar(sc, label="Weights")
    plt.xlabel("x (m)")
    plt.ylabel("y (m)")
    plt.title("Weighted Scan")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


def save_loc_error_plots(times_us: np.ndarray, rot_signed: np.ndarray,
                         lon: np.ndarray, lat: np.ndarray,
                         out_dir: str, seq_name: str) -> dict:
    """Per-sequence error-over-trajectory figure + CSV table, the
    pyboreas `plot_loc_stats` reporting surface the reference's GT
    extractors import (`/root/reference/mm_masking/utils/
    extract_loc_gt_v2.py:10`): signed longitudinal / lateral / heading
    localization error per frame over the run, with RMSE annotations.

    Returns {'png': path, 'csv': path}.
    """
    os.makedirs(out_dir, exist_ok=True)
    t = (np.asarray(times_us, np.int64) - int(times_us[0])) / 1e6

    fig, axes = plt.subplots(3, 1, figsize=(9, 7), sharex=True)
    for ax, series, name, unit in (
        (axes[0], lon, "longitudinal", "m"),
        (axes[1], lat, "lateral", "m"),
        (axes[2], np.degrees(rot_signed), "heading", "deg"),
    ):
        ax.plot(t, series, lw=0.9)
        ax.axhline(0.0, color="k", lw=0.5, alpha=0.4)
        rmse = float(np.sqrt(np.mean(series**2)))
        ax.set_ylabel(f"{name} [{unit}]")
        ax.set_title(f"{name} error  (rmse {rmse:.4f} {unit})", fontsize=9,
                     loc="left")
        ax.grid(alpha=0.25)
    axes[-1].set_xlabel("time since first frame [s]")
    fig.suptitle(f"{seq_name}: localization error over trajectory")
    fig.tight_layout()
    png = osp.join(out_dir, f"{seq_name}_loc_errors.png")
    fig.savefig(png, dpi=130)
    plt.close(fig)

    csv_path = osp.join(out_dir, f"{seq_name}_loc_errors.csv")
    with open(csv_path, "w") as f:
        f.write("time_us,longitudinal_m,lateral_m,heading_rad\n")
        for tu, lo, la, rr in zip(times_us, lon, lat, rot_signed):
            f.write(f"{int(tu)},{lo:.6f},{la:.6f},{rr:.6f}\n")
    return {"png": png, "csv": csv_path}
