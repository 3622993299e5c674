"""Decompose the bench.py train/eval steps on the real chip.

Times, each as ONE jitted program (per-dispatch tunnel overhead ~3 ms makes
per-op microbenchmarks meaningless — see profile_unet.py results):

  * policy forward (UNet → weights → 50-iter ICP) at eval batch
  * UNet-only forward / fwd+bwd at train batch
  * 50-iter inference ICP alone, dense vs sorted-stripe NN
  * 10-iter unrolled ICP fwd+bwd alone, dense vs stripe
  * full train step

Usage: python benchmarks/profile_step.py
"""
from __future__ import annotations

import os.path as osp
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from mm_masking_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

# Pipelined timing (round 4): the previous per-iteration forced readback
# added one tunnel RTT (3-30 ms, session-dependent) to every step; numbers
# in docs/BENCH_DETAIL.md predating the r4 re-measure include it.
from benchmarks.timing import measure_rtt, timeit  # noqa: E402


def main():
    from mm_masking_tpu.config import Config, ModelConfig, TrainConfig
    from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch
    from mm_masking_tpu.dicp import ICPConfig, icp
    from mm_masking_tpu.parallel import make_mesh, shard_batch
    from mm_masking_tpu.train import Trainer

    n_scan, n_map = 4096, 16384
    bt, be = 16, 32
    spec = SyntheticSpec(n_scan=n_scan, n_map=n_map)
    cfg = Config(
        model=ModelConfig(dropout=0.05, max_iter=10, inference_max_iter=50,
                          nn_refresh_dist=0.05,  # speed knob: bench opts in
                          dtype="bfloat16"),
        train=TrainConfig(batch_size_train=bt, batch_size_test=be),
    )
    trainer = Trainer(cfg, mesh=make_mesh())
    state = trainer.init_state()
    tb = shard_batch(synthetic_batch(0, batch=bt, spec=spec), trainer.mesh)
    eb = shard_batch(synthetic_batch(1, batch=be, spec=spec), trainer.mesh)

    print(f"device={jax.devices()[0]} shapes n_scan={n_scan} n_map={n_map} "
          f"tunnel_rtt={measure_rtt():.1f} ms")

    # --- full steps (bench.py headline) --------------------------------
    t = timeit(lambda: trainer._train_step(state, tb, mask_losses_active=True))
    print(f"{'train step (b16)':34s} {t:8.1f} ms")
    t = timeit(lambda: trainer._eval_step(state, eb, binary=False))
    print(f"{'eval step (b32)':34s} {t:8.1f} ms")

    # --- UNet alone ------------------------------------------------------
    from mm_masking_tpu.models.unet import UNet

    unet = UNet(dtype=jnp.bfloat16, dropout=0.0)
    x16 = jnp.zeros((bt, 640, 640, 1), jnp.bfloat16)
    x32 = jnp.zeros((be, 640, 640, 1), jnp.bfloat16)
    uv = unet.init({"params": jax.random.PRNGKey(0)}, x16, train=False)
    fwd = jax.jit(lambda v, x: unet.apply(v, x, train=False))
    print(f"{'UNet fwd b16':34s} {timeit(fwd, uv, x16):8.1f} ms")
    print(f"{'UNet fwd b32':34s} {timeit(fwd, uv, x32):8.1f} ms")
    g = jax.jit(jax.grad(
        lambda v, x: jnp.sum(unet.apply(v, x, train=False).astype(jnp.float32))
    ))
    print(f"{'UNet fwd+bwd b16':34s} {timeit(g, uv, x16):8.1f} ms")

    # --- ICP alone, dense vs stripe -------------------------------------
    scan = eb["loc_data"]["filtered_pc"]
    mapp = eb["map_data"]["pc"]
    T0 = eb["transforms"]["T_ml_init"]
    w = jnp.ones(scan.shape[:2], jnp.float32)

    for label, stripe, refresh in (
        ("dense", False, 0.0),
        ("stripe", True, 0.0),
        ("stripe+refresh.05", True, 0.05),
        ("dense+refresh.05", False, 0.05),
    ):
        c50 = ICPConfig(icp_type="pt2pt", max_iterations=50,
                        differentiable=False, nn_stripe=stripe,
                        nn_refresh_dist=refresh)
        f50 = jax.jit(lambda s, m, t, w, c=c50: icp(s, m, t, weight=w, cfg=c)["T"])
        print(f"{'icp 50-iter b32 ' + label:34s} {timeit(f50, scan, mapp, T0, w):8.1f} ms")

    # How many iterations does the while-loop actually run, and how many
    # associations does the gated solver skip? (iterations is part of the
    # solver output; associations inferred from the delta trajectory.)
    c_iters = ICPConfig(icp_type="pt2pt", max_iterations=50,
                        differentiable=False, nn_stripe=True)
    out = jax.jit(lambda s, m, t, w: icp(s, m, t, weight=w, cfg=c_iters))(
        scan, mapp, T0, w)
    print(f"{'while-loop iterations executed':34s} {int(out['iterations']):8d}")

    scan_t = tb["loc_data"]["filtered_pc"]
    mapp_t = tb["map_data"]["pc"]
    T0_t = tb["transforms"]["T_ml_init"]
    w_t = jnp.ones(scan_t.shape[:2], jnp.float32)

    for label, stripe in (("dense", False), ("stripe", True)):
        c10 = ICPConfig(icp_type="pt2pt", max_iterations=10,
                        differentiable=True, nn_stripe=stripe)

        def loss(w, s=scan_t, m=mapp_t, t=T0_t, c=c10):
            T = icp(s, m, t, weight=w, cfg=c)["T"]
            return jnp.sum(jnp.abs(T))

        gi = jax.jit(jax.grad(loss))
        print(f"{'icp 10-iter fwd+bwd b16 ' + label:34s} {timeit(gi, w_t):8.1f} ms")

        f10 = jax.jit(loss)
        print(f"{'icp 10-iter fwd b16 ' + label:34s} {timeit(f10, w_t):8.1f} ms")

    # --- the rest of the train-step margin -------------------------------
    # extract_weights (gather) fwd and fwd+bwd at the train batch: the
    # backward is a scatter-add into the (B, 640, 640) mask gradient.
    from mm_masking_tpu.ops import extract_bev_from_pts, extract_weights
    from mm_masking_tpu.train.loss import bce

    raw_t = tb["loc_data"]["raw_pc"]
    mask16 = jnp.ones((bt, 640, 640), jnp.float32) * 0.5

    ew = jax.jit(lambda m, p: extract_weights(m, p)[0])
    print(f"{'extract_weights fwd b16':34s} {timeit(ew, mask16, raw_t):8.1f} ms")
    gew = jax.jit(jax.grad(
        lambda m, p: jnp.sum(extract_weights(m, p)[0]), argnums=0))
    print(f"{'extract_weights fwd+bwd b16':34s} {timeit(gew, mask16, raw_t):8.1f} ms")

    # mask-loss images (3×BCE at 640² + the map-BEV scatter), grad wrt mask —
    # the loss-side share of the train step.
    fft_mask = (tb["loc_data"]["fft_data"] > 0.5).astype(jnp.float32)
    cfar_img = tb["loc_data"]["fft_cfar"]

    def mask_losses(m, t1=fft_mask, t2=cfar_img, mp=mapp_t):
        bev = extract_bev_from_pts(mp[..., :3])
        return bce(m, t1) + bce(m, t2) + bce(m, bev)

    gm = jax.jit(jax.grad(mask_losses))
    print(f"{'mask losses fwd+bwd b16':34s} {timeit(gm, mask16):8.1f} ms")


if __name__ == "__main__":
    main()
