"""Jitted, mesh-sharded training driver.

Rebuild of `/root/reference/mm_masking/train_icp_weights.py`: the same epoch
structure (baselines → pre-train validation → train/validate per epoch → best +
per-epoch checkpoints → final best validation) with the torch loop replaced by

  * one jitted `train_step` (UNet fwd → weight lookup → unrolled ICP → 6-term
    loss → grads → optax update) compiled once and executed per batch entirely
    on device;
  * batches sharded over the data-parallel mesh axis
    (:mod:`mm_masking_tpu.parallel.mesh`) with parameters replicated — GSPMD
    inserts gradient psums and the batch-global-normalization collectives;
  * orbax full-state checkpoints (resumable, unlike the reference);
  * JSONL metrics mirroring the reference's Neptune scalar set.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mm_masking_tpu.config import Config
from mm_masking_tpu.models import LearnICPWeightPolicy
from mm_masking_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from mm_masking_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from mm_masking_tpu.train.loss import (
    LossComponents,
    eval_training_loss,
    eval_validation_loss,
)
from mm_masking_tpu.train.metrics import MetricsLogger
from mm_masking_tpu.ops import extract_bev_from_pts


class TrainState(NamedTuple):
    variables: Any  # flax variables ({'params': …[, 'batch_stats': …]})
    opt_state: Any
    step: jax.Array
    epoch: jax.Array
    best_norm: jax.Array
    rng: jax.Array


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    if t.lr_schedule == "constant":
        lr = t.learning_rate
    elif t.lr_schedule == "cosine":
        if t.lr_decay_steps <= 0:
            raise ValueError(
                "lr_schedule='cosine' needs lr_decay_steps > 0 "
                "(num_epochs * ceil(samples / batch_size_train))"
            )
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if t.lr_warmup_steps > 0 else t.learning_rate,
            peak_value=t.learning_rate,
            warmup_steps=t.lr_warmup_steps,
            decay_steps=t.lr_decay_steps,
        )
    else:
        raise ValueError(t.lr_schedule)
    if t.optimizer == "adam":
        tx = optax.adam(lr)
    elif t.optimizer == "sgd":
        tx = optax.sgd(lr, momentum=1.0, nesterov=True)
    else:
        raise ValueError(t.optimizer)
    if t.clip_value > 0.0:
        tx = optax.chain(optax.clip(t.clip_value), tx)
    # Backprop through the unrolled GN solve can spike to non-finite grads
    # when the learned weights collapse a batch's system to near-singular;
    # dropping those updates keeps one bad step from NaN-poisoning the run
    # (observed: a walls-scene run died at epoch 3 and flatlined without this).
    # max_consecutive_errors must be effectively infinite: optax GIVES UP and
    # APPLIES the non-finite update after that many consecutive errors —
    # walls_full r2 hit exactly this (~100 bad steps over epochs 14-19, NaN
    # params at epoch 20, loss flatlined at the init baseline forever). A
    # paused-but-alive run can recover; NaN params cannot.
    return optax.apply_if_finite(tx, max_consecutive_errors=10**8)


def _notfinite_count(opt_state) -> float:
    """Total dropped-update count from the apply_if_finite wrapper (a rising
    value across epochs is the 'training silently frozen' tell)."""
    for leaf_name in ("total_notfinite", "notfinite_count"):
        cnt = getattr(opt_state, leaf_name, None)
        if cnt is not None:
            return float(jax.device_get(cnt))
    return 0.0


class Trainer:
    def __init__(self, cfg: Config, mesh=None, logger: MetricsLogger | None = None):
        self.cfg = cfg
        self.policy = LearnICPWeightPolicy(cfg)
        self.tx = make_optimizer(cfg)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.train.num_devices)
        self.logger = logger or MetricsLogger(cfg.train.checkpoint_dir)
        self._train_step = jax.jit(
            self._train_step_impl, static_argnames=("mask_losses_active",)
        )
        self._eval_step = jax.jit(
            self._eval_step_impl, static_argnames=("binary",)
        )

    # ------------------------------------------------------------------ init
    def init_state(self, seed: int | None = None) -> TrainState:
        seed = self.cfg.train.seed if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        rng, init_rng = jax.random.split(rng)
        variables = self.policy.init(init_rng)
        opt_state = self.tx.init(variables["params"])
        state = TrainState(
            variables=variables,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
            best_norm=jnp.asarray(jnp.inf),
            rng=rng,
        )
        return replicate(state, self.mesh)

    # ------------------------------------------------------------ train step
    def _train_step_impl(self, state: TrainState, batch, *, mask_losses_active: bool):
        cfg = self.cfg
        rng, step_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = dict(state.variables)
            variables["params"] = params
            out = self.policy.apply(
                variables,
                batch["loc_data"],
                batch["map_data"],
                batch["transforms"]["T_ml_init"],
                train=True,
                rng=step_rng,
            )
            loss, comp = eval_training_loss(
                out.T_pred,
                out.weight_mask,
                out.diff_mean_num_non0,
                out.mean_all_pts,
                batch["transforms"]["T_ml_gt"],
                batch["loc_data"],
                batch["map_data"],
                cfg.loss,
                mask_losses_active=mask_losses_active,
                gt_eye=cfg.model.gt_eye,
                cart_pixel_width=cfg.model.cart_pixel_width,
                cart_resolution=cfg.model.cart_resolution,
            )
            return loss, (comp, out.variable_updates)

        (loss, (comp, var_updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.variables["params"])
        # Collapse diagnostics (VERDICT r2 #3): the raw gradient magnitude per
        # step is the cheapest signal separating "converged, gradients died"
        # from "gradients exploded and apply_if_finite froze the run".
        grad_norm = optax.global_norm(grads)
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.variables["params"]
        )
        params = optax.apply_updates(state.variables["params"], updates)
        variables = dict(state.variables)
        variables["params"] = params
        if var_updates is not None:
            variables.update(var_updates)
        new_state = TrainState(
            variables=variables,
            opt_state=opt_state,
            step=state.step + 1,
            epoch=state.epoch,
            best_norm=state.best_norm,
            rng=rng,
        )
        return new_state, loss, comp, grad_norm

    # ------------------------------------------------------------- eval step
    def _eval_step_impl(self, state: TrainState, batch, *, binary: bool):
        out = self.policy.apply(
            state.variables,
            batch["loc_data"],
            batch["map_data"],
            batch["transforms"]["T_ml_init"],
            train=False,
            binary=binary,
        )
        err = eval_validation_loss(
            out.T_pred, batch["transforms"]["T_ml_gt"], gt_eye=self.cfg.model.gt_eye
        )
        return err, out.stats, out.weight_mask

    # ------------------------------------------------------------ public API
    def train_epoch(self, state: TrainState, batches: Iterable, epoch: int):
        loss_hist = []
        comp_hist = []
        gnorm_hist = []
        it = self.cfg.train.icp_loss_only_iter
        mask_on = it <= 0 or epoch < it
        for batch in batches:
            batch = shard_batch(batch, self.mesh)
            state, loss, comp, gnorm = self._train_step(
                state, batch, mask_losses_active=mask_on
            )
            loss_hist.append(loss)
            comp_hist.append(comp)
            gnorm_hist.append(gnorm)
        mean_loss = float(jnp.mean(jnp.stack(loss_hist)))
        mean_comp = {
            f: float(jnp.mean(jnp.stack([getattr(c, f) for c in comp_hist])))
            for f in LossComponents._fields
        }
        g = jnp.stack(gnorm_hist)
        mean_comp["grad_norm"] = float(jnp.mean(g))
        mean_comp["grad_norm_max"] = float(jnp.max(g))
        mean_comp["notfinite_count"] = _notfinite_count(state.opt_state)
        return state, mean_loss, mean_comp

    def validate(self, state: TrainState, batches: Iterable, binary: bool = False,
                 epoch: int | None = None, dump_artifacts: bool = False):
        """Validation pass; optionally dump the reference's image artifact set
        (learned masks each logged epoch; raw BEV/CFAR/FFT-threshold/map-BEV
        masks at the pre-train epoch −1 — `train_icp_weights.py:109-169`)."""
        # Accumulate on device; one host readback after the last batch (a
        # per-batch float() would serialize device work on every step).
        errs, num_pc, ws, max_ws, min_ws = [], [], [], [], []
        n = 0
        for batch in batches:
            batch = shard_batch(batch, self.mesh)
            err, stats, mask = self._eval_step(state, batch, binary=binary)
            if dump_artifacts and n == 0:
                self._dump_artifacts(batch, mask, epoch)
            errs.append(err)
            num_pc.append(stats.mean_num_non0)
            ws.append(stats.mean_w)
            max_ws.append(stats.max_w)
            min_ws.append(stats.min_w)
            n += 1
        err = jnp.mean(jnp.stack(errs), axis=0)
        return (
            err,
            float(jnp.mean(jnp.stack(num_pc))),
            float(jnp.mean(jnp.stack(ws))),
            float(jnp.max(jnp.stack(max_ws))),
            float(jnp.min(jnp.stack(min_ws))),
        )

    def _dump_artifacts(self, batch, mask, epoch: int | None):
        from mm_masking_tpu.utils.visualize import save_mask_image

        art_dir = self.logger.art_dir
        tag = "pre" if (epoch is None or epoch < 0) else str(epoch)
        save_mask_image(np.asarray(mask)[0], art_dir, f"learned_mask_e{tag}")
        if epoch is not None and epoch < 0:
            cfg = self.cfg
            fft = batch["loc_data"]["fft_data"]
            save_mask_image(np.asarray(fft)[0], art_dir, "raw_scan")
            save_mask_image(
                np.asarray(batch["loc_data"]["fft_cfar"])[0], art_dir,
                "cfar_mask",
            )
            mean_scan = jnp.mean(fft, axis=(1, 2), keepdims=True)
            fft_mask = jnp.where(fft > 3.0 * mean_scan, 1.0, 0.0)
            save_mask_image(np.asarray(fft_mask)[0], art_dir, "fft_mask")
            bev = extract_bev_from_pts(
                batch["map_data"]["pc"][..., :3],
                cart_pixel_width=cfg.model.cart_pixel_width,
                cart_resolution=cfg.model.cart_resolution,
            )
            save_mask_image(np.asarray(bev)[0], art_dir, "map_mask")

    def generate_baseline(self, state: TrainState, batches: Iterable,
                          baseline_type: str = "val", binary: bool = False,
                          mask_kind: str = "auto"):
        """Init vs baseline-mask ICP losses (`train_icp_weights.py:275-344`).

        With ``mask_kind="auto"`` the baseline mask is chosen by the active
        loss weights, mirroring the reference: CFAR image if the cfar term is
        on, the FFT threshold mask if fft is on, the map BEV if mask_pts is
        on, else all-ones. Explicit kinds ("ones", "cfar", "fft", "mask_pts")
        force one baseline regardless of the loss config — the reference
        evaluates the CFAR baseline as its own run configuration
        (`train_icp_weights.py:287-305`); here it is one more pass.
        """
        cfg = self.cfg
        loss_init_hist, loss_ones_hist = [], []
        for batch in batches:
            batch = shard_batch(batch, self.mesh)
            scan = batch["loc_data"]
            if (mask_kind == "cfar"
                    or (mask_kind == "auto" and cfg.loss.cfar > 0.0)):
                ones_mask = scan["fft_cfar"]
            elif (mask_kind == "fft"
                    or (mask_kind == "auto" and cfg.loss.fft > 0.0)):
                fft = scan["fft_data"]
                mean_scan = jnp.mean(fft, axis=(1, 2), keepdims=True)
                ones_mask = jnp.where(fft > 3.0 * mean_scan, 1.0, 0.0)
            elif (mask_kind == "mask_pts"
                    or (mask_kind == "auto" and cfg.loss.mask_pts > 0.0)):
                ones_mask = extract_bev_from_pts(
                    batch["map_data"]["pc"][..., :3],
                    cart_pixel_width=cfg.model.cart_pixel_width,
                    cart_resolution=cfg.model.cart_resolution,
                )
            else:
                ones_mask = jnp.ones_like(scan["fft_data"])

            out = self.policy.apply(
                state.variables, scan, batch["map_data"],
                batch["transforms"]["T_ml_init"],
                train=(baseline_type == "train"), binary=binary,
                override_mask=ones_mask,
                rng=jax.random.PRNGKey(0),
            )
            T_gt = batch["transforms"]["T_ml_gt"]
            T_init = batch["transforms"]["T_ml_init"]
            if baseline_type == "train":
                li, _ = eval_training_loss(
                    T_init, ones_mask, out.diff_mean_num_non0, out.mean_all_pts,
                    T_gt, scan, batch["map_data"], cfg.loss,
                    gt_eye=cfg.model.gt_eye,
                    cart_pixel_width=cfg.model.cart_pixel_width,
                    cart_resolution=cfg.model.cart_resolution,
                )
                lo, _ = eval_training_loss(
                    out.T_pred, ones_mask, out.diff_mean_num_non0,
                    out.mean_all_pts, T_gt, scan, batch["map_data"], cfg.loss,
                    gt_eye=cfg.model.gt_eye,
                    cart_pixel_width=cfg.model.cart_pixel_width,
                    cart_resolution=cfg.model.cart_resolution,
                )
                loss_init_hist.append(li)
                loss_ones_hist.append(lo)
            else:
                li = eval_validation_loss(T_init, T_gt, gt_eye=cfg.model.gt_eye)
                lo = eval_validation_loss(out.T_pred, T_gt, gt_eye=cfg.model.gt_eye)
                loss_init_hist.append(li[0])
                loss_ones_hist.append(lo[0])
        # Device arrays accumulate without syncing; read back once.
        return (
            float(jnp.mean(jnp.stack(loss_init_hist))),
            float(jnp.mean(jnp.stack(loss_ones_hist))),
        )

    # ---------------------------------------------------------------- resume
    def resume(self, state: TrainState | None = None) -> TrainState:
        """Restore the latest epoch checkpoint (deterministic resume —
        capability the reference lacks: its checkpoints held weights only)."""
        from mm_masking_tpu.train.checkpoint import latest_epoch

        template = state if state is not None else self.init_state()
        n = latest_epoch(self.cfg.train.checkpoint_dir)
        if n is None:
            return template
        restored = restore_checkpoint(
            self.cfg.train.checkpoint_dir, f"epoch_{n}", template
        )
        self.logger.log("resume", {"epoch": int(restored.epoch)})
        return restored

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        train_batches_fn: Callable[[int], Iterable],
        val_batches_fn: Callable[[], Iterable],
        state: TrainState | None = None,
        num_epochs: int | None = None,
    ) -> TrainState:
        """Full training run mirroring the reference `main()` flow."""
        cfg = self.cfg
        log = self.logger
        state = state if state is not None else self.init_state()
        num_epochs = num_epochs or cfg.train.num_epochs
        ckpt_dir = cfg.train.checkpoint_dir

        # The reference registers the full params dict with the experiment
        # tracker at run init (`train_icp_weights.py:354`); mirror that via
        # the optional uploader (no-op without MM_UPLOAD_URL).
        log.uploader.log_params(log.run_name, dataclasses.asdict(cfg))
        # Persist the run's exact configuration next to its checkpoints so
        # downstream consumers (the localization CLI's --checkpoint mode,
        # Config.from_dict) can rebuild the policy without guessing shapes.
        os.makedirs(ckpt_dir, exist_ok=True)
        with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=1)

        t0 = time.time()
        tr_init, tr_ones = self.generate_baseline(
            state, train_batches_fn(0), baseline_type="train"
        )
        va_init, va_ones = self.generate_baseline(
            state, val_batches_fn(), baseline_type="val",
            binary=cfg.model.binary_inference,
        )
        log.log("baseline", {
            "train_init": tr_init, "train_ones": tr_ones,
            "val_init": va_init, "val_ones": va_ones,
            "elapsed": time.time() - t0,
        })

        err, *_ = self.validate(
            state, val_batches_fn(), binary=cfg.model.binary_inference,
            epoch=-1, dump_artifacts=True,
        )
        best_norm = float(err[0])
        log.log("pretrain_val", {"norm": best_norm, "rot": float(err[1]),
                                 "trans": float(err[2])})

        start_epoch = int(state.epoch)
        for epoch in range(start_epoch, num_epochs):
            tic = time.time()
            state, mean_loss, comp = self.train_epoch(
                state, train_batches_fn(epoch), epoch
            )
            train_time = time.time() - tic

            tic = time.time()
            err, mean_num_pc, mean_w, max_w, min_w = self.validate(
                state, val_batches_fn(), binary=cfg.model.binary_inference,
                epoch=epoch, dump_artifacts=True,
            )
            val_time = time.time() - tic
            norm = float(err[0])

            if norm < best_norm or epoch == 0:
                best_norm = norm
                save_checkpoint(ckpt_dir, "best_policy", state)
            state = state._replace(
                epoch=jnp.asarray(epoch + 1, jnp.int32),
                best_norm=jnp.asarray(best_norm),
            )
            if (epoch + 1) % cfg.train.checkpoint_every == 0:
                save_checkpoint(ckpt_dir, f"epoch_{epoch}", state)

            log.log("epoch", {
                "epoch": epoch, "loss": mean_loss, **comp,
                "acc": norm, "acc_rot": float(err[1]), "acc_trans": float(err[2]),
                "mean_num_pc": mean_num_pc, "mean_w": mean_w,
                "max_w": max_w, "min_w": min_w,
                "epoch_train_time": train_time, "epoch_val_time": val_time,
                "train_init_baseline": tr_init, "train_ones_baseline": tr_ones,
                "val_init_baseline": va_init, "val_ones_baseline": va_ones,
                "best_norm": best_norm,
            })

        # Final validation with the best policy.
        best_state = restore_checkpoint(ckpt_dir, "best_policy", state)
        err, *_ = self.validate(
            best_state, val_batches_fn(), binary=cfg.model.binary_inference
        )
        log.log("final_val", {"norm": float(err[0]), "rot": float(err[1]),
                              "trans": float(err[2])})
        # The reference ships the checkpoint files to the tracker at the end
        # of the run (`train_icp_weights.py:579` upload_files); here the best
        # checkpoint dir goes through the same optional uploader.
        best_dir = os.path.join(ckpt_dir, "best_policy")
        if log.uploader.enabled and os.path.isdir(best_dir):
            log.uploader.upload_dir(log.run_name, best_dir)
        return state
