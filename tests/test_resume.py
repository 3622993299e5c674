"""Deterministic resume: fit -> resume() restores the latest epoch state."""
import numpy as np
import jax

from mm_masking_tpu.data.synthetic import synthetic_batch
from mm_masking_tpu.train import Trainer

from test_train import SPEC, batches, tiny_config


def test_resume_restores_latest_epoch(tmp_path):
    cfg = tiny_config(tmp_path)
    trainer = Trainer(cfg)
    train_data = batches(1)
    val_data = batches(1, seed0=50)
    state = trainer.fit(lambda e: train_data, lambda: val_data, num_epochs=2)

    fresh = Trainer(cfg)
    resumed = fresh.resume()
    assert int(resumed.epoch) == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(state.variables["params"]),
        jax.tree_util.tree_leaves(resumed.variables["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Optimizer state round-trips too (the reference lost it).
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(resumed.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_noop_without_checkpoints(tmp_path):
    cfg = tiny_config(tmp_path / "empty")
    trainer = Trainer(cfg)
    state = trainer.resume()
    assert int(state.epoch) == 0
