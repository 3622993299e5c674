"""Trainer: sharded train step on the 8-device mesh, fit loop, checkpoints."""
import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_masking_tpu.config import Config, ModelConfig, TrainConfig, LossWeights
from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch
from mm_masking_tpu.parallel import make_mesh, shard_batch
from mm_masking_tpu.train import Trainer, save_checkpoint, restore_checkpoint

SPEC = SyntheticSpec(
    n_scan=128,
    n_map=512,
    polar_shape=(64, 256),
    cart_pixel_width=64,
    res=0.25,
    cart_resolution=0.5,
    max_range=15.0,
    min_range=2.0,
    pos_std=0.4,
    rot_std=0.15,
)


def tiny_config(tmp_path, **loss_kw) -> Config:
    return Config(
        model=ModelConfig(
            enc_channels=(4, 8),
            dropout=0.0,
            cart_pixel_width=SPEC.cart_pixel_width,
            cart_resolution=SPEC.cart_resolution,
            res=SPEC.res,
            polar_shape=SPEC.polar_shape,
            max_iter=3,
            inference_max_iter=8,
        ),
        train=TrainConfig(
            batch_size_train=8, batch_size_test=8, num_epochs=2,
            checkpoint_dir=str(tmp_path),
        ),
        loss=LossWeights(**loss_kw) if loss_kw else LossWeights(),
    )


def batches(n, batch=8, seed0=0):
    return [synthetic_batch(seed0 + i, batch=batch, spec=SPEC) for i in range(n)]


def test_train_step_runs_on_8_device_mesh(tmp_path):
    assert len(jax.devices()) == 8
    cfg = tiny_config(tmp_path)
    trainer = Trainer(cfg)
    assert trainer.mesh.devices.size == 8
    state = trainer.init_state()
    batch = shard_batch(batches(1)[0], trainer.mesh)
    new_state, loss, comp, _ = trainer._train_step(
        state, batch, mask_losses_active=True
    )
    assert np.isfinite(float(loss))
    # Params actually changed.
    p0 = jax.tree_util.tree_leaves(state.variables["params"])[0]
    p1 = jax.tree_util.tree_leaves(new_state.variables["params"])[0]
    assert float(jnp.abs(p1 - p0).max()) > 0


def test_fit_loop_and_checkpoints(tmp_path):
    cfg = tiny_config(tmp_path)
    trainer = Trainer(cfg)
    train_data = batches(2)
    val_data = batches(1, seed0=100)
    state = trainer.fit(
        lambda epoch: train_data, lambda: val_data, num_epochs=2
    )
    assert int(state.epoch) == 2
    assert os.path.isdir(os.path.join(str(tmp_path), "best_policy"))
    assert os.path.isdir(os.path.join(str(tmp_path), "epoch_0"))
    # Metrics stream exists and has epoch events.
    jsonl = [f for f in os.listdir(str(tmp_path)) if f.endswith(".jsonl")]
    assert jsonl
    content = open(os.path.join(str(tmp_path), jsonl[0])).read()
    assert '"event": "epoch"' in content and '"event": "baseline"' in content


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config(tmp_path)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    save_checkpoint(str(tmp_path), "test_state", state)
    restored = restore_checkpoint(str(tmp_path), "test_state", state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.variables),
        jax.tree_util.tree_leaves(restored.variables),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_equals_single_device(tmp_path):
    # The jitted step must be numerically equivalent on a 1-device and an
    # 8-device mesh (batch-global normalization collectives included).
    cfg = tiny_config(tmp_path)
    batch = batches(1)[0]

    t8 = Trainer(cfg, mesh=make_mesh(8))
    t1 = Trainer(cfg, mesh=make_mesh(1))
    s8 = t8.init_state()
    s1 = t1.init_state()

    b8 = shard_batch(batch, t8.mesh)
    b1 = shard_batch(batch, t1.mesh)
    _, loss8, *_ = t8._train_step(s8, b8, mask_losses_active=True)
    _, loss1, *_ = t1._train_step(s1, b1, mask_losses_active=True)
    assert abs(float(loss8) - float(loss1)) < 1e-4, (float(loss8), float(loss1))


def test_multi_sequence_eval_on_mesh(tmp_path):
    # Config-5 surface: several independent "sequences" streamed through the
    # sharded eval path on the 8-device mesh.
    from mm_masking_tpu.evaluation import evaluate_policy_on_sequences

    cfg = tiny_config(tmp_path)
    trainer = Trainer(cfg)
    state = trainer.init_state()
    seqs = {
        "seq_a": lambda: iter(batches(1, seed0=10)),
        "seq_b": lambda: iter(batches(1, seed0=20)),
    }
    res = evaluate_policy_on_sequences(trainer, state, seqs)
    assert set(res) == {"seq_a", "seq_b"}
    for errs in res.values():
        assert errs.n_frames == 8
        assert np.isfinite(errs.trans_rmse)
        d = errs.as_dict()
        assert "rot_rmse" in d


def test_cosine_lr_schedule_decays_updates():
    """lr_schedule='cosine' must shrink Adam's effective step over
    lr_decay_steps (constant grads -> Adam's update magnitude tracks the lr
    schedule), reach ~0 at the end, and refuse a missing lr_decay_steps."""
    import optax

    from mm_masking_tpu.train.trainer import make_optimizer

    cfg = Config(train=TrainConfig(learning_rate=1e-2, lr_schedule="cosine",
                                   lr_decay_steps=20))
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.full((3,), 0.5)}
    steps = []
    for _ in range(20):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        steps.append(float(jnp.abs(updates["w"]).max()))
    assert steps[0] == pytest.approx(1e-2, rel=0.05)  # peak lr, no warmup
    assert steps[10] < steps[0] * 0.8
    assert steps[-1] < steps[0] * 0.05  # cosine tail ~0

    # warmup ramps in
    cfg_w = Config(train=TrainConfig(learning_rate=1e-2, lr_schedule="cosine",
                                     lr_decay_steps=20, lr_warmup_steps=5))
    txw = make_optimizer(cfg_w)
    sw = txw.init(params)
    up0, sw = txw.update(grads, sw, params)
    assert float(jnp.abs(up0["w"]).max()) < 1e-3  # first warmup step tiny

    with pytest.raises(ValueError, match="lr_decay_steps"):
        make_optimizer(Config(train=TrainConfig(lr_schedule="cosine")))
    # default config is untouched reference semantics
    assert Config().train.lr_schedule == "constant"


def test_full_fit_sharded_equals_single_device(tmp_path):
    """Multi-epoch `Trainer.fit` equivalence on the 1- vs 8-device mesh
    (VERDICT r4 #7): the whole loop — baselines, per-epoch train/validate,
    best-checkpoint selection — must produce the same loss curve and final
    parameters within f32 reduction-order tolerance, and restoring the
    epoch-0 checkpoint mid-run must continue to the same end state."""
    cfg = tiny_config(tmp_path)
    train_data = batches(2)
    val_data = batches(1, seed0=100)

    def run(mesh_n, sub):
        c = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, checkpoint_dir=str(tmp_path / sub)))
        tr = Trainer(c, mesh=make_mesh(mesh_n))
        state = tr.fit(lambda epoch: train_data, lambda: val_data,
                       num_epochs=2)
        recs = [r for r in map(
            __import__("json").loads, open(tr.logger.path))
            if r.get("event") == "epoch"]
        return tr, state, recs

    t8, s8, r8 = run(8, "m8")
    t1, s1, r1 = run(1, "m1")

    assert len(r8) == len(r1) == 2
    for a, b in zip(r8, r1):
        assert abs(a["loss"] - b["loss"]) < 1e-3 * max(1.0, abs(b["loss"]))
        assert abs(a["acc"] - b["acc"]) < 2e-3
    for pa, pb in zip(jax.tree_util.tree_leaves(s8.variables["params"]),
                      jax.tree_util.tree_leaves(s1.variables["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=5e-3, rtol=1e-3)

    # Checkpoint-restore equivalence: resume the 8-device run from its
    # epoch_0 checkpoint on a FRESH trainer and fit the remaining epoch —
    # the final params must match the uninterrupted run on the same mesh.
    c8 = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, checkpoint_dir=str(tmp_path / "m8")))
    tr_resume = Trainer(c8, mesh=make_mesh(8))
    restored = restore_checkpoint(str(tmp_path / "m8"), "epoch_0",
                                  tr_resume.init_state())
    assert int(restored.epoch) == 1
    s8b = tr_resume.fit(lambda epoch: train_data, lambda: val_data,
                        state=restored, num_epochs=2)
    for pa, pb in zip(jax.tree_util.tree_leaves(s8.variables["params"]),
                      jax.tree_util.tree_leaves(s8b.variables["params"])):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-6)
