"""dICP reconstruction assumption-sensitivity study (VERDICT r4 #6).

The solver in `mm_masking_tpu/dicp/icp.py` is reconstructed from dICP's call
sites (`/root/reference/mm_masking/icp_weight_policy.py:53-55,277-288` — the
submodule itself is empty), which leaves a set of genuinely free choices.
This script measures what each choice moves, two ways:

Part A (default): f64 oracle-parity + self-consistency sweep on the 128
structured scenes of `tests/test_solver_parity.py`:
  * planar retraction exp vs direct, Levenberg floor rel vs flat (the two
    knobs round 4 attributed the 10-iter transient to)
  * pt2pl robust magnitude: plane residual vs euclidean distance
  * while-loop stop metric: ‖δ₆‖ vs translation-only vs max-abs
  * map row permutation (association tie-break / reduction order)
  * uniform weight scaling ×10 (weight-normalization invariance)

Part B (--checkpoint RUN_DIR --data-root ROOT): the end-task metric — the
trained mask's held-out val norm on the corridor benchmark re-evaluated
under each solver variant (policy chain untouched, only ICPConfig flips via
ModelConfig.icp_overrides).

Emits one JSON to stdout and writes results/sensitivity_study*.json.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import os.path as osp
import sys

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, "tests"))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from mm_masking_tpu.dicp import ICPConfig, icp  # noqa: E402


def _solve(src, mp, T0, w, cfg: ICPConfig):
    import jax.numpy as jnp

    out = icp(jnp.asarray(src), jnp.asarray(mp), jnp.asarray(T0),
              weight=jnp.asarray(w), cfg=cfg)
    return np.asarray(out["T"])


def part_a() -> dict:
    jax.config.update("jax_enable_x64", True)
    from test_solver_parity import _make_batch, _pose_dev  # noqa: E402

    import torch  # noqa: E402
    from reference_torch import torch_icp  # noqa: E402

    def oracle(src, mp, T0, w, iters, normals=None):
        t = lambda a: torch.tensor(a, dtype=torch.float64)  # noqa: E731
        return torch_icp(t(src), t(mp), t(T0), t(w), iters=iters,
                         normals=None if normals is None else t(normals)
                         ).numpy()

    batches = [_make_batch(seed, B=32) for seed in range(4)]
    results = {}

    def record(name, devs):
        dt = max(d[0] for d in devs)
        dr = max(d[1] for d in devs)
        results[name] = {"max_trans_cm": round(dt * 100, 5),
                         "max_rot_deg": round(np.degrees(dr), 6)}
        print(f"[A] {name:55s} {dt*100:9.5f} cm  {np.degrees(dr):9.6f} deg",
              file=sys.stderr, flush=True)

    base = dict(trim_dist=5.0, loss_name="cauchy", loss_metric=1.0, dim=2,
                differentiable=True)
    for icp_type in ("pt2pt", "pt2pl"):
        for iters in (10, 50):
            ora = [
                oracle(src, mp[..., :3], T0, w, iters,
                       normals=mp[..., 3:6] if icp_type == "pt2pl" else None)
                for (src, mp, T0, w, _) in batches
            ]
            variants = {
                "default(exp,rel-floor)": {},
                "oracle-matched(direct,flat-floor)": {
                    "planar_retraction": "direct", "damping_rel": 0.0},
                "direct-retraction-only": {"planar_retraction": "direct"},
                "flat-floor-only": {"damping_rel": 0.0},
            }
            if icp_type == "pt2pl":
                variants["robust-on-distance"] = {"robust_on": "distance"}
            for vname, kv in variants.items():
                cfg = ICPConfig(icp_type=icp_type, max_iterations=iters,
                                **base, **kv)
                devs = [
                    _pose_dev(_solve(src, mp, T0, w, cfg), To)
                    for (src, mp, T0, w, _), To in zip(batches, ora)
                ]
                record(f"{icp_type}/{iters}it vs oracle: {vname}", devs)

    # Self-consistency sweeps (solver vs itself, defaults, pt2pl 50 it).
    cfg0 = ICPConfig(icp_type="pt2pl", max_iterations=50, **base)
    for (src, mp, T0, w, _) in batches[:1]:
        T_ref = _solve(src, mp, T0, w, cfg0)
        # map permutation: association tie-break + reduction-order choices
        rng = np.random.default_rng(0)
        perm = rng.permutation(mp.shape[1])
        record("self pt2pl/50it: map-row-permutation",
               [_pose_dev(_solve(src, mp[:, perm], T0, w, cfg0), T_ref)])
        # uniform weight scaling: normalization invariance (breaks only via
        # the absolute damping floor)
        record("self pt2pl/50it: weights x10",
               [_pose_dev(_solve(src, mp, T0, w * 10.0, cfg0), T_ref)])
        # stop metric (while-loop solver)
        wl = dataclasses.replace(cfg0, differentiable=False)
        T_wl = _solve(src, mp, T0, w, wl)
        for sm in ("trans", "maxabs"):
            record(f"self pt2pl/50it(while): stop_metric={sm}",
                   [_pose_dev(_solve(src, mp, T0, w,
                                     dataclasses.replace(wl, stop_metric=sm)),
                              T_wl)])
    jax.config.update("jax_enable_x64", False)
    return results


def part_b(run_dir: str, data_root: str) -> dict:
    """Trained-mask held-out val norm under each solver variant."""
    from mm_masking_tpu.config import Config
    from mm_masking_tpu.data import ICPWeightDataset, epoch_batches
    from mm_masking_tpu.train import Trainer
    from mm_masking_tpu.train.checkpoint import restore_checkpoint
    from mm_masking_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cfg = Config.from_dict(json.load(open(osp.join(run_dir, "config.json"))))
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, data_dir=data_root))

    variants = {
        "default": (),
        "direct-retraction": ("planar_retraction=direct",),
        "flat-floor": ("damping_rel=0.0",),
        "robust-on-distance": ("robust_on=distance",),
        "stop-metric-trans": ("stop_metric=trans",),
        "huber": ("loss_name=huber",),
        "trim-3m": ("trim_dist=3.0",),
    }
    import tempfile

    from mm_masking_tpu.train.metrics import MetricsLogger

    out = {}
    scratch = tempfile.mkdtemp(prefix="sensitivity_")
    val_ds = ICPWeightDataset(list(cfg.val_loc_pairs), cfg, "test")
    for name, ov in variants.items():
        vcfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, icp_overrides=ov))
        # scratch logger: must not append to the training run's metrics
        trainer = Trainer(vcfg, logger=MetricsLogger(scratch, verbose=False))
        state = restore_checkpoint(run_dir, "best_policy",
                                   trainer.init_state())
        err, *_ = trainer.validate(
            state,
            epoch_batches(val_ds, vcfg.train.batch_size_test, vcfg,
                          shuffle=False, drop_last=False),
        )
        out[name] = {"val_norm": float(err[0]), "val_rot": float(err[1]),
                     "val_trans": float(err[2])}
        print(f"[B] {name:25s} val_norm {float(err[0]):.5f}",
              file=sys.stderr, flush=True)
    ref = out["default"]["val_norm"]
    for name, rec in out.items():
        rec["vs_default_pct"] = round(
            100.0 * (rec["val_norm"] - ref) / max(ref, 1e-12), 2)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default="",
                    help="run dir with config.json + best_policy → part B")
    ap.add_argument("--data-root", default="",
                    help="corridor tree root for part B")
    ap.add_argument("--out", default="results/sensitivity_study.json")
    args = ap.parse_args()

    if args.checkpoint:
        res = {"part_b_end_task": part_b(args.checkpoint, args.data_root)}
        out_path = args.out.replace(".json", "_endtask.json")
    else:
        res = {"part_a_oracle_parity": part_a()}
        out_path = args.out
    os.makedirs(osp.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
