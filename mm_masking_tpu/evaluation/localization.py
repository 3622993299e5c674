"""Sequence localization evaluation harness.

Replaces the reference's process-level eval machinery (`gen_data/run_eval.sh`,
`run_parallel_test.sh` — bash fan-out of 6 concurrent VTR runs) with a vmapped,
mesh-sharded sweep: every frame of every sequence is an independent
scan→map localization problem, so whole sequences are batched onto the chip(s)
and solved in fixed-shape blocks. Error statistics mirror
`eval_validation_loss` (`train_icp_weights.py:255-273`) plus the RMSE /
per-frame breakdown the `utils/extract_*_gt.py` offline scripts produce.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from mm_masking_tpu.config import Config
from mm_masking_tpu.dicp import ICPConfig, icp
from mm_masking_tpu.geom import planar_xi_first_order, se3_inv
from mm_masking_tpu.ops import extract_weights


@dataclasses.dataclass
class SequenceErrors:
    """Per-sequence localization error summary."""

    n_frames: int
    rot_mean: float
    rot_rmse: float
    rot_max: float
    trans_mean: float
    trans_rmse: float
    trans_max: float
    norm_mean: float

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def frame_errors(T_pred: jax.Array, T_gt: jax.Array, gt_eye: bool = True):
    """Per-frame (rot, trans) errors under the reference's convention."""
    T = T_pred if gt_eye else jnp.matmul(T_pred, se3_inv(T_gt),
                                         precision="highest")
    xi_theta, xi_r = planar_xi_first_order(T)
    return jnp.abs(xi_theta[..., 0]), jnp.linalg.norm(xi_r, axis=-1)


def summarize(rot: np.ndarray, trans: np.ndarray) -> SequenceErrors:
    norm = np.sqrt(rot**2 + trans**2)
    return SequenceErrors(
        n_frames=int(rot.shape[0]),
        rot_mean=float(rot.mean()),
        rot_rmse=float(np.sqrt((rot**2).mean())),
        rot_max=float(rot.max()),
        trans_mean=float(trans.mean()),
        trans_rmse=float(np.sqrt((trans**2).mean())),
        trans_max=float(trans.max()),
        norm_mean=float(norm.mean()),
    )


def make_constant_weight_localizer(cfg: Config, max_iterations: int = 50):
    """Jitted batched localizer with all-ones weights (baseline configs 1-2)."""
    icp_cfg = ICPConfig(
        icp_type=cfg.model.icp_type,
        max_iterations=max_iterations,
        tolerance=1e-5,
        differentiable=False,
    )

    @jax.jit
    def localize(scan_pc, map_pc, T_init):
        valid = ~((scan_pc[..., 0] == 0.0) & (scan_pc[..., 1] == 0.0))
        out = icp(scan_pc, map_pc, T_init, weight=valid.astype(scan_pc.dtype),
                  cfg=icp_cfg)
        return out["T"]

    return localize


def make_masked_localizer(cfg: Config, max_iterations: int = 50):
    """Jitted batched localizer sampling weights from a provided mask image
    (baseline config 2 with a CFAR mask, or a learned mask)."""
    icp_cfg = ICPConfig(
        icp_type=cfg.model.icp_type,
        max_iterations=max_iterations,
        tolerance=1e-5,
        differentiable=False,
    )
    m = cfg.model

    @jax.jit
    def localize(mask, scan_pc, map_pc, T_init):
        weights, _ = extract_weights(
            mask, scan_pc, cart_resolution=m.cart_resolution,
            cart_pixel_width=m.cart_pixel_width,
        )
        out = icp(scan_pc, map_pc, T_init, weight=weights, cfg=icp_cfg)
        return out["T"]

    return localize


def evaluate_sequence(
    batches: Iterable[dict],
    localize_fn: Callable[[dict], jax.Array],
    gt_eye: bool = True,
) -> SequenceErrors:
    """Run a localizer over a sequence's batches and summarize errors.

    ``localize_fn`` maps a batch dict → (B, 4, 4) predicted transforms.
    """
    rots, trans = [], []
    for batch in batches:
        T_pred = localize_fn(batch)
        r, t = frame_errors(
            T_pred, batch["transforms"]["T_ml_gt"], gt_eye=gt_eye
        )
        rots.append(np.asarray(r))
        trans.append(np.asarray(t))
    return summarize(np.concatenate(rots), np.concatenate(trans))


def evaluate_policy_on_sequences(
    trainer,
    state,
    sequences: dict[str, Callable[[], Iterable[dict]]],
    binary: bool = False,
) -> dict[str, SequenceErrors]:
    """Config-5 entry: learned-mask localization over multiple sequences.

    Independent sequences are simply streamed through the same sharded eval
    step — the mesh keeps all chips busy; no process fan-out needed.
    """
    from mm_masking_tpu.parallel.mesh import shard_batch

    results = {}
    for name, batches_fn in sequences.items():
        rots, trans = [], []
        for batch in batches_fn():
            batch = shard_batch(batch, trainer.mesh)
            out = trainer.policy.apply(
                state.variables,
                batch["loc_data"],
                batch["map_data"],
                batch["transforms"]["T_ml_init"],
                train=False,
                binary=binary,
            )
            r, t = frame_errors(
                out.T_pred, batch["transforms"]["T_ml_gt"],
                gt_eye=trainer.cfg.model.gt_eye,
            )
            rots.append(np.asarray(r))
            trans.append(np.asarray(t))
        results[name] = summarize(np.concatenate(rots), np.concatenate(trans))
    return results
