"""Multi-term training loss and validation error metric.

Reimplements `eval_training_loss` (`/root/reference/mm_masking/train_icp_weights.py:179-253`)
and `eval_validation_loss` (`:255-273`) exactly:

  * ICP pose terms read the *first-order* planar twist from ``T − I`` (or
    ``T·T_gt⁻¹ − I`` when ``gt_eye`` is false): rot = mean |sinθ|,
    trans = mean ‖(x, y)‖. Reproduced as-is — not replaced with a proper log map.
  * Mask BCE terms against: the 3×-batch-sample-mean FFT threshold mask, the
    CFAR image, and the map-points BEV occupancy.
  * A point-count penalty ``mean_all_pts − diff_num_non0``.
  * ``icp_loss_only_iter`` gates the mask terms after that epoch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mm_masking_tpu.config import LossWeights
from mm_masking_tpu.geom import planar_xi_first_order, se3_inv
from mm_masking_tpu.ops import extract_bev_from_pts


class LossComponents(NamedTuple):
    rot: jax.Array
    trans: jax.Array
    fft: jax.Array
    mask_pts: jax.Array
    cfar: jax.Array
    num_pts: jax.Array


@jax.custom_vjp
def _bce_elem(pred: jax.Array, target: jax.Array) -> jax.Array:
    # Defensive clamp: TPU reciprocal-based division upstream can leave preds
    # an ulp outside [0, 1]; log of a negative silently NaNs the whole loss
    # (torch.BCELoss asserts on out-of-range inputs instead).
    pred = jnp.clip(pred, 0.0, 1.0)
    log_p = jnp.clip(jnp.log(pred), -100.0, None)
    log_1mp = jnp.clip(jnp.log1p(-pred), -100.0, None)
    return -(target * log_p + (1.0 - target) * log_1mp)


def _bce_elem_fwd(pred, target):
    return _bce_elem(pred, target), (pred, target)


def _bce_elem_bwd(res, g):
    pred, target = res
    # torch BCELoss backward: (p - t) / max(p (1 - p), 1e-12). Finite (huge)
    # at saturated predictions instead of the NaN a clipped-log autodiff gives
    # (norm_weights guarantees one mask pixel is exactly 1.0 every step).
    pred = jnp.clip(pred, 0.0, 1.0)
    denom = jnp.maximum(pred * (1.0 - pred), 1e-12)
    d_pred = g * (pred - target) / denom
    log_p = jnp.clip(jnp.log(pred), -100.0, None)
    log_1mp = jnp.clip(jnp.log1p(-pred), -100.0, None)
    d_target = g * (log_1mp - log_p)
    return d_pred, d_target


_bce_elem.defvjp(_bce_elem_fwd, _bce_elem_bwd)


def bce(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.BCELoss (mean) semantics — forward −100 log clamp and the
    torch backward formula (gradient-finite at pred ∈ {0, 1})."""
    return jnp.mean(_bce_elem(pred, target))


def pose_errors(T_pred: jax.Array, T_gt: jax.Array, gt_eye: bool = True):
    """(rot_err, trans_err) under the reference's first-order convention."""
    if gt_eye:
        T = T_pred
    else:
        T = jnp.matmul(T_pred, se3_inv(T_gt), precision="highest")
    xi_theta, xi_r = planar_xi_first_order(T)
    loss_rot = jnp.mean(jnp.linalg.norm(xi_theta, axis=-1))
    loss_trans = jnp.mean(jnp.linalg.norm(xi_r, axis=-1))
    return loss_rot, loss_trans


def eval_training_loss(
    T_pred: jax.Array,
    mask: jax.Array,
    diff_num_non0: jax.Array,
    mean_all_pts: jax.Array,
    T_gt: jax.Array,
    batch_scan: dict,
    batch_map: dict,
    weights: LossWeights,
    *,
    mask_losses_active: bool = True,
    gt_eye: bool = True,
    cart_pixel_width: int = 640,
    cart_resolution: float = 0.2384,
) -> tuple[jax.Array, LossComponents]:
    zero = jnp.zeros((), T_pred.dtype)
    loss_rot = loss_trans = loss_fft = loss_mask_pts = loss_cfar = loss_num_pts = zero

    if weights.icp_rot > 0.0 or weights.icp_trans > 0.0:
        loss_rot, loss_trans = pose_errors(T_pred, T_gt, gt_eye=gt_eye)

    # Reference gate (`:201-202`): mask losses run unless icp_loss_only_iter has
    # elapsed; always run when the ICP terms are off. Static (compile-time) so
    # at most two step variants are ever traced.
    use_mask_losses = mask_losses_active or (
        weights.icp_rot <= 0 and weights.icp_trans <= 0
    )
    if use_mask_losses:
        if weights.fft > 0.0:
            fft_data = batch_scan["fft_data"]
            mean_scan = jnp.mean(fft_data, axis=(1, 2), keepdims=True)
            fft_mask = jnp.where(fft_data > 3.0 * mean_scan, 1.0, 0.0)
            loss_fft = bce(mask, fft_mask)
        if weights.cfar > 0.0:
            loss_cfar = bce(mask, batch_scan["fft_cfar"])
        if weights.mask_pts > 0.0:
            map_bev = extract_bev_from_pts(
                batch_map["pc"][..., :3],
                cart_pixel_width=cart_pixel_width,
                cart_resolution=cart_resolution,
            )
            loss_mask_pts = bce(mask, map_bev)
        if weights.num_pts > 0.0:
            if weights.num_pts_floor > 0.0:
                # Hinged anti-collapse floor (round-3 diagnosis): same
                # gradient as the reference's linear term while the count is
                # below floor·mean_all_pts, exactly zero above it.
                loss_num_pts = jnp.maximum(
                    weights.num_pts_floor * mean_all_pts - diff_num_non0, 0.0
                )
            else:
                loss_num_pts = mean_all_pts - diff_num_non0

    loss = (
        weights.icp_rot * loss_rot
        + weights.icp_trans * loss_trans
        + weights.fft * loss_fft
        + weights.mask_pts * loss_mask_pts
        + weights.cfar * loss_cfar
        + weights.num_pts * loss_num_pts
    )
    comp = LossComponents(
        rot=jax.lax.stop_gradient(weights.icp_rot * loss_rot),
        trans=jax.lax.stop_gradient(weights.icp_trans * loss_trans),
        fft=jax.lax.stop_gradient(weights.fft * loss_fft),
        mask_pts=jax.lax.stop_gradient(weights.mask_pts * loss_mask_pts),
        cfar=jax.lax.stop_gradient(weights.cfar * loss_cfar),
        num_pts=jax.lax.stop_gradient(weights.num_pts * loss_num_pts),
    )
    return loss, comp


def eval_validation_loss(
    T_pred: jax.Array, T_gt: jax.Array, gt_eye: bool = True
) -> jax.Array:
    """(norm, rot, trans) error triple — the canonical metric
    (`train_icp_weights.py:255-273`)."""
    if gt_eye:
        T = T_pred
    else:
        T = jnp.matmul(T_pred, se3_inv(T_gt), precision="highest")
    xi_theta, xi_r = planar_xi_first_order(T)
    xi_stack = jnp.concatenate([xi_theta, xi_r], axis=-1)
    norm_err = jnp.mean(jnp.linalg.norm(xi_stack, axis=-1))
    rot_err = jnp.mean(jnp.linalg.norm(xi_theta, axis=-1))
    trans_err = jnp.mean(jnp.linalg.norm(xi_r, axis=-1))
    return jnp.stack([norm_err, rot_err, trans_err])
