"""Decompose the TRAIN step's non-UNet remainder on the real chip.

The headline train step (374 ms @ b16) is UNet fwd+bwd (252) + everything
else (~120). This probe times the "everything else" pieces, each as ONE
jitted fwd+bwd program at the train shapes, to find what is worth
optimizing:

  * extract_weights fwd+bwd (the 4-tap bilinear gather + its scatter VJP)
  * 10-iter unrolled ICP fwd+bwd (stripe association, training semantics)
  * loss terms fwd+bwd (pose errors + mask BCE terms + BEV scatter)
  * optimizer update alone (adam + apply_if_finite on the UNet tree)
  * train step minus each piece (by zero-weighting), as a cross-check

Usage: python benchmarks/profile_train_parts.py
"""
from __future__ import annotations

import os.path as osp
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mm_masking_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from benchmarks.timing import measure_rtt, timeit  # noqa: E402


def main():
    import optax

    from mm_masking_tpu.config import Config, ModelConfig, TrainConfig
    from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch
    from mm_masking_tpu.ops import extract_weights
    from mm_masking_tpu.parallel import make_mesh, shard_batch
    from mm_masking_tpu.train import Trainer
    from mm_masking_tpu.train.loss import eval_training_loss

    n_scan, n_map = 4096, 16384
    bt = 16
    spec = SyntheticSpec(n_scan=n_scan, n_map=n_map)
    cfg = Config(
        model=ModelConfig(dropout=0.05, max_iter=10, inference_max_iter=50,
                          dtype="bfloat16"),
        train=TrainConfig(batch_size_train=bt, batch_size_test=bt),
    )
    trainer = Trainer(cfg, mesh=make_mesh())
    state = trainer.init_state()
    tb = shard_batch(synthetic_batch(0, batch=bt, spec=spec), trainer.mesh)
    print(f"device={jax.devices()[0]} b{bt} n_scan={n_scan} n_map={n_map} "
          f"tunnel_rtt={measure_rtt():.1f} ms")

    t_full = timeit(
        lambda: trainer._train_step(state, tb, mask_losses_active=True))
    print(f"{'train step (b16)':38s} {t_full:8.1f} ms")

    # --- extract_weights fwd+bwd ---------------------------------------
    W = cfg.model.cart_pixel_width
    mask = jax.random.uniform(jax.random.PRNGKey(0), (bt, W, W))
    raw = tb["loc_data"]["raw_pc"]

    def ew_loss(m):
        w, stats = extract_weights(
            m, raw, cart_resolution=cfg.model.cart_resolution,
            cart_pixel_width=W)
        return jnp.sum(w) + stats.diff_mean_num_non0

    g_ew = jax.jit(jax.grad(ew_loss))
    print(f"{'extract_weights fwd+bwd':38s} {timeit(g_ew, mask):8.1f} ms")

    # --- loss terms fwd+bwd (pose fixed, mask differentiated) ----------
    T = tb["transforms"]["T_ml_init"]

    def loss_terms(m):
        loss, _ = eval_training_loss(
            T, m, jnp.sum(m), jnp.asarray(4096.0),
            tb["transforms"]["T_ml_gt"], tb["loc_data"], tb["map_data"],
            cfg.loss, mask_losses_active=True, gt_eye=cfg.model.gt_eye,
            cart_pixel_width=W, cart_resolution=cfg.model.cart_resolution)
        return loss

    g_lt = jax.jit(jax.grad(loss_terms))
    print(f"{'loss terms fwd+bwd (mask grad)':38s} {timeit(g_lt, mask):8.1f} ms")

    # --- optimizer update alone ----------------------------------------
    params = state.variables["params"]
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def opt_step(g, os_, p):
        up, os2 = trainer.tx.update(g, os_, p)
        return optax.apply_updates(p, up), os2

    print(f"{'optimizer update alone':38s} "
          f"{timeit(opt_step, grads, state.opt_state, params):8.1f} ms")

    # --- train step with ICP terms zero-weighted (skips solver) --------
    import dataclasses as dc
    cfg_noicp = dc.replace(
        cfg, loss=dc.replace(cfg.loss, icp_rot=0.0, icp_trans=0.0))
    tr2 = Trainer(cfg_noicp, mesh=trainer.mesh)
    st2 = tr2.init_state()
    t = timeit(lambda: tr2._train_step(st2, tb, mask_losses_active=True))
    print(f"{'train step w/o ICP solve':38s} {t:8.1f} ms")

    # --- train step with per-iteration ICP remat ------------------------
    # (ICPConfig.remat_iters: recompute each GN iteration in the backward
    # instead of storing 10 iterations of padded (B, N, ·) residuals)
    cfg_remat = dc.replace(cfg, model=dc.replace(cfg.model, icp_remat=True))
    tr3 = Trainer(cfg_remat, mesh=trainer.mesh)
    st3 = tr3.init_state()
    t = timeit(lambda: tr3._train_step(st3, tb, mask_losses_active=True))
    print(f"{'train step + icp_remat':38s} {t:8.1f} ms")


if __name__ == "__main__":
    main()
