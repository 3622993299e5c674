"""The five BASELINE.json benchmark configurations as named entries.

From the driver metadata (`/root/repo/BASELINE.json` "configs"):
  1. unweighted pt2pl dICP on one scan pair
  2. CACFAR peak extraction + constant-weight ICP over a sequence
  3. UNet mask + learned-weight ICP, single pair end-to-end
  4. batched backprop-through-ICP training step
  5. parallel multi-sequence radar_lidar localization eval

Each entry returns a callable suite over a supplied data source; `bench.py`
and the round benchmarks drive these.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mm_masking_tpu.config import Config
from mm_masking_tpu.dicp import ICPConfig, icp
from mm_masking_tpu.ops import cfar_mask, extract_pc


def config1_unweighted_pt2pl(cfg: Config, batch: dict):
    """Unweighted point-to-plane ICP on scan pairs."""
    icp_cfg = ICPConfig(icp_type="pt2pl", max_iterations=50,
                        differentiable=False)
    scan = batch["loc_data"]["filtered_pc"]
    valid = ~((scan[..., 0] == 0.0) & (scan[..., 1] == 0.0))

    @jax.jit
    def run(scan, map_pc, T_init, w):
        return icp(scan, map_pc, T_init, weight=w, cfg=icp_cfg)["T"]

    return run(scan, batch["map_data"]["pc"],
               batch["transforms"]["T_ml_init"], valid.astype(scan.dtype))


def config2_cacfar_constant_icp(cfg: Config, batch: dict, max_points: int = 4096):
    """Online CACFAR peak extraction from the raw polar scan, then
    constant-weight ICP — the capability the reference holds in `extract_pc`
    but never wires into training (SURVEY.md §2.2)."""
    m = cfg.model

    @jax.jit
    def run(fft, azimuths, az_times, map_pc, T_init):
        mask = cfar_mask(fft, m.res, a_thresh=m.a_thresh, b_thresh=m.b_thresh,
                         diff=False)
        pc = extract_pc(mask, m.res, azimuths, az_times,
                        max_points=max_points, diff=False)
        valid = ~((pc[..., 0] == 0.0) & (pc[..., 1] == 0.0))
        out = icp(pc, map_pc, T_init, weight=valid.astype(pc.dtype),
                  cfg=ICPConfig(icp_type=m.icp_type, max_iterations=50,
                                differentiable=False))
        return out["T"], pc

    loc = batch["loc_data"]
    return run(loc["fft_polar"] if "fft_polar" in loc else loc["fft_data"],
               loc["azimuths"], loc["az_times"],
               batch["map_data"]["pc"], batch["transforms"]["T_ml_init"])


def config3_learned_mask_icp(policy, variables, batch: dict):
    """Learned UNet mask + weighted 50-iter ICP, end to end."""
    @jax.jit
    def run(variables, loc, mapd, T_init):
        out = policy.apply(variables, loc, mapd, T_init, train=False)
        return out.T_pred, out.weight_mask

    return run(variables, batch["loc_data"], batch["map_data"],
               batch["transforms"]["T_ml_init"])


def config4_train_step(trainer, state, batch):
    """One batched backprop-through-ICP training step."""
    return trainer._train_step(state, batch, mask_losses_active=True)


def config5_multi_sequence(trainer, state, sequences):
    """Parallel multi-sequence localization eval."""
    from mm_masking_tpu.evaluation.localization import (
        evaluate_policy_on_sequences,
    )

    return evaluate_policy_on_sequences(trainer, state, sequences)
