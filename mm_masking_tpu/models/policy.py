"""Learned ICP-weight policy: UNet mask → per-point weights → differentiable ICP.

Functional JAX rebuild of `LearnICPWeightPolicy`
(`/root/reference/mm_masking/icp_weight_policy.py:24-288`). The torch module's
forward becomes a pure function of (params, batch); training/inference solver
selection, input assembly, batch-global normalization, weight normalization,
binary masks, override masks, and the mask-only path all mirror the reference.

The batch-global minmax/standardize normalization (`:151-159` — statistics over
the WHOLE batch, not per-sample) is kept as a plain ``jnp.max``/``jnp.mean``
over the batch axis: under `pjit` with a sharded batch XLA turns these into
cross-chip collectives automatically, preserving the reference's cross-sample
coupling on a mesh (SURVEY.md §7 hard part d).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from mm_masking_tpu.config import Config
from mm_masking_tpu.dicp import ICPConfig, icp, icp_implicit
from mm_masking_tpu.models.unet import UNet
from mm_masking_tpu.ops import (
    extract_weights,
    form_cart_range_angle_grid,
    form_polar_range_grid,
    radar_polar_to_cartesian,
)


@jax.custom_vjp
def _safe_amax_hw(x: jax.Array) -> jax.Array:
    """(B, H, W) → (B, 1, 1) max with a NaN-proof backward.

    `jnp.amax`'s automatic VJP detects ties by comparing elements against the
    reduced max; on TPU, when the operand was produced by a bf16 subgraph,
    XLA's fusion can compute the reduction at a different effective precision
    than the elementwise values it compares against — zero elements then
    "equal" the max and the even-tie-split divides by zero, flooding every
    upstream gradient with NaN (observed: bf16 UNet + norm_weights froze
    training; apply_if_finite dropped every update). This backward uses a
    ≥-comparison with the tie count clamped to ≥ 1: identical even-split
    semantics when equality holds, zero (finite) gradient instead of NaN
    when fusion rounding makes the compare come up empty.
    """
    return jnp.amax(x, axis=(1, 2), keepdims=True)


def _safe_amax_hw_fwd(x):
    m = jnp.amax(x, axis=(1, 2), keepdims=True)
    return m, (x, m)


def _safe_amax_hw_bwd(res, g):
    x, m = res
    ties = (x >= m).astype(x.dtype)
    cnt = jnp.maximum(jnp.sum(ties, axis=(1, 2), keepdims=True), 1.0)
    return (g * ties / cnt,)


_safe_amax_hw.defvjp(_safe_amax_hw_fwd, _safe_amax_hw_bwd)


class PolicyOutput(NamedTuple):
    T_pred: jax.Array  # (B, 4, 4)
    weight_mask: jax.Array  # (B, H, W)
    diff_mean_num_non0: jax.Array  # differentiable point count (scalar)
    stats: Any  # WeightStats
    mean_all_pts: jax.Array | None = None  # hard count of real scan points / B
    variable_updates: Any = None  # batch_stats updates when batch_norm trains


class LearnICPWeightPolicy:
    """Stateless policy: `init` makes params, `apply` runs the forward pass."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        m = cfg.model
        self.unet = UNet(
            enc_channels=m.enc_channels,
            leaky=m.leaky,
            batch_norm=m.batch_norm,
            dropout=m.dropout,
            dtype=m.jax_dtype,
            s2d=m.s2d_convs,
            conv_impl=m.conv_impl,
            remat=m.remat,
        )
        if m.network_input_type == "cartesian":
            self.range_mask, _ = form_cart_range_angle_grid(
                m.cart_resolution, m.cart_pixel_width
            )
        else:
            self.range_mask = form_polar_range_grid(m.res, m.polar_shape)
        self._icp_train = ICPConfig(
            icp_type=m.icp_type,
            max_iterations=m.max_iter,
            differentiable=True,
            remat_iters=m.icp_remat,
            max_step_m=m.icp_max_step_m,
        )
        self._icp_inference = ICPConfig(
            icp_type=m.icp_type,
            max_iterations=m.inference_max_iter,
            tolerance=1e-5,
            differentiable=False,
            nn_refresh_dist=m.nn_refresh_dist,
            max_step_m=m.icp_max_step_m,
        )
        if m.icp_overrides:
            kv = {}
            for ov in m.icp_overrides:
                key, val = ov.split("=", 1)
                cur = getattr(self._icp_inference, key)  # raises on typos
                kv[key] = type(cur)(val) if not isinstance(cur, bool) \
                    else val.lower() in ("1", "true", "yes")
            self._icp_train = dataclasses.replace(self._icp_train, **kv)
            self._icp_inference = dataclasses.replace(
                self._icp_inference, **kv)

    # -- parameter init ----------------------------------------------------
    def init(self, rng: jax.Array) -> Any:
        m = self.cfg.model
        if m.network_input_type == "cartesian":
            H = W = m.cart_pixel_width
        else:
            H, W = m.polar_shape
        dummy = jnp.zeros((1, H, W, m.in_channels), m.jax_dtype)
        return self.unet.init({"params": rng}, dummy, train=False)

    # -- network-only mask -------------------------------------------------
    def compute_mask(
        self,
        variables: Any,
        fft_data: jax.Array,
        fft_cfar: jax.Array | None,
        *,
        train: bool,
        rng: jax.Array | None = None,
    ) -> jax.Array:
        """Assemble input channels → normalize → UNet → (B, H, W) mask."""
        m = self.cfg.model
        chans = []
        if m.fft_input:
            chans.append(fft_data)
        if m.cfar_input:
            chans.append(fft_cfar)
        if m.range_input:
            chans.append(
                jnp.broadcast_to(
                    self.range_mask[None], (fft_data.shape[0],) + self.range_mask.shape
                )
            )
        x = jnp.stack(chans, axis=-1)  # (B, H, W, C)

        if m.log_transform:
            x = jnp.log(x + 1e-6)
        # Batch-global per-channel normalization (reference `:151-159`).
        # Denominators are floored at f32 tiny: a CONSTANT channel (e.g. a
        # frame batch with zero CFAR detections) normalizes to 0 instead of
        # NaN-poisoning the whole mask. Identical to the reference wherever
        # the channel has any spread (the reference divides unguarded and
        # NaNs on constant channels — a crash bug, not semantics to keep).
        if "minmax" in m.normalize:
            c_max = jnp.max(x, axis=(0, 1, 2), keepdims=True)
            c_min = jnp.min(x, axis=(0, 1, 2), keepdims=True)
            x = (x - c_min) / jnp.maximum(c_max - c_min, 1e-30)
        elif "standardize" in m.normalize:
            c_mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
            c_std = jnp.std(x, axis=(0, 1, 2), ddof=1, keepdims=True)
            x = (x - c_mean) / jnp.maximum(c_std, 1e-30)

        x = x.astype(m.jax_dtype)
        rngs = {"dropout": rng} if (train and m.dropout > 0.0) else None
        updates = None
        if train and "batch_stats" in variables:
            mask, updates = self.unet.apply(
                variables, x, train=train, rngs=rngs, mutable=["batch_stats"]
            )
        else:
            mask = self.unet.apply(variables, x, train=train, rngs=rngs)
        return mask.astype(jnp.float32), updates

    # -- deployment-path mask: raw polar scan → cartesian weight mask -------
    def mask_for_scan(
        self,
        variables: Any,
        fft_polar: jax.Array,
        azimuths: jax.Array,
    ) -> jax.Array:
        """(B, A, R) raw polar power + (B, A) azimuths → (B, Wc, Wc)
        cartesian weight mask, ready for `extract_weights` at scan points.

        The in-the-loop inference path the reference's deployment forks run
        with LibTorch inside vtr3 (SURVEY.md §2.3 LibTorch row): assemble the
        network input from the raw scan alone (CFAR channel computed here
        when configured, polar→cartesian warp when the network eats
        cartesian), then the same compute_mask → norm_weights → binary →
        output-warp chain as the training-time forward
        (`icp_weight_policy.py:127-196` semantics). Note the batch-global
        normalization: statistics are over whatever batch of frames is
        passed, exactly like validation batches in the reference.
        """
        from mm_masking_tpu.ops import cfar_mask

        m = self.cfg.model
        fft_in, cfar_in = fft_polar, None
        if m.cfar_input:
            cfar_in = cfar_mask(
                fft_polar, m.res, a_thresh=m.a_thresh, b_thresh=m.b_thresh,
                diff=False,
            )
        if m.network_input_type == "cartesian":
            fft_in = radar_polar_to_cartesian(
                fft_polar, azimuths, m.res, m.cart_resolution,
                m.cart_pixel_width,
            )
            if cfar_in is not None:
                cfar_in = radar_polar_to_cartesian(
                    cfar_in, azimuths, m.res, m.cart_resolution,
                    m.cart_pixel_width,
                )
        weight_mask, _ = self.compute_mask(
            variables, fft_in, cfar_in, train=False
        )
        if m.norm_weights:
            weight_mask = jnp.minimum(
                weight_mask / _safe_amax_hw(weight_mask), 1.0
            )
        if m.binary_inference:
            weight_mask = jnp.where(weight_mask > 0.5, 1.0, 0.0)
        if m.network_output_type == "polar":
            weight_mask = radar_polar_to_cartesian(
                weight_mask, azimuths, m.res, m.cart_resolution,
                m.cart_pixel_width,
            )
        return weight_mask

    # -- full forward ------------------------------------------------------
    def apply(
        self,
        variables: Any,
        batch_scan: dict,
        batch_map: dict,
        T_init: jax.Array,
        *,
        train: bool = False,
        binary: bool = False,
        override_mask: jax.Array | None = None,
        mask_only: bool = False,
        rng: jax.Array | None = None,
    ) -> PolicyOutput | jax.Array:
        """Mirror of the reference forward (`icp_weight_policy.py:127-275`).

        batch_scan: {'fft_data' (B,H,W), 'fft_cfar' (B,H,W), 'raw_pc' (B,N,3),
                     'filtered_pc' (B,N,3)}; batch_map: {'pc' (B,M,6)}.
        """
        m = self.cfg.model
        updates = None
        if override_mask is None:
            weight_mask, updates = self.compute_mask(
                variables,
                batch_scan["fft_data"],
                batch_scan.get("fft_cfar"),
                train=train,
                rng=rng,
            )
        else:
            weight_mask = override_mask

        if m.norm_weights:
            weight_mask = weight_mask / _safe_amax_hw(weight_mask)
            # XLA TPU lowers divide to multiply-by-reciprocal, which can
            # overshoot 1 by an ulp (observed: 1.0000001) — torch's true
            # division never does, and downstream BCE NaNs on p > 1.
            weight_mask = jnp.minimum(weight_mask, 1.0)
        if binary:
            weight_mask = jnp.where(weight_mask > 0.5, 1.0, 0.0)
        if mask_only:
            return weight_mask

        if m.network_output_type == "polar":
            # Capability extension: polar masks are warped to cartesian before
            # point sampling (the reference's extract_weights assumes a
            # cartesian mask; its polar path was never exercised end to end).
            cart_mask = radar_polar_to_cartesian(
                weight_mask,
                batch_scan["azimuths"],
                m.res,
                m.cart_resolution,
                m.cart_pixel_width,
            )
        else:
            cart_mask = weight_mask

        weights, stats = extract_weights(
            cart_mask,
            batch_scan["raw_pc"],
            cart_resolution=m.cart_resolution,
            cart_pixel_width=m.cart_pixel_width,
        )

        # Hard count of real (non-pad) scan points per batch (`:211-214`),
        # consumed by the num_pts loss term.
        raw = batch_scan["raw_pc"]
        non0 = (raw[..., 0] != 0.0) & (raw[..., 1] != 0.0)
        mean_all_pts = jnp.sum(non0) / raw.shape[0]

        # Training without ICP loss: skip the solver entirely (`:270-271`).
        if train and not self.cfg.use_icp_4_train:
            return PolicyOutput(
                T_init, weight_mask, stats.diff_mean_num_non0, stats,
                mean_all_pts, updates,
            )

        if train and m.icp_diff_mode == "implicit":
            # O(1)-memory backward: converge with the while-loop solver and
            # differentiate via the implicit function theorem.
            cfg_icp = dataclasses.replace(
                self._icp_inference, max_iterations=max(m.max_iter * 5, 50),
                dim=2,
            )
            T_est = icp_implicit(
                batch_scan["filtered_pc"], batch_map["pc"], T_init, weights,
                cfg_icp,
            )
            return PolicyOutput(
                T_est, weight_mask, stats.diff_mean_num_non0, stats,
                mean_all_pts, updates,
            )
        cfg_icp = self._icp_train if train else self._icp_inference
        result = icp(
            batch_scan["filtered_pc"],
            batch_map["pc"],
            T_init,
            weight=weights,
            cfg=dataclasses.replace(cfg_icp, dim=2),
        )
        return PolicyOutput(
            result["T"], weight_mask, stats.diff_mean_num_non0, stats,
            mean_all_pts, updates,
        )
