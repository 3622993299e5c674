"""End-to-end policy forward on synthetic data (small shapes)."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mm_masking_tpu.config import Config, ModelConfig, LossWeights
from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch
from mm_masking_tpu.models import LearnICPWeightPolicy
from mm_masking_tpu.geom import planar_xi_first_order


SMALL_SPEC = SyntheticSpec(
    n_scan=128,
    n_map=512,
    polar_shape=(64, 256),
    cart_pixel_width=64,
    res=0.25,
    cart_resolution=0.5,
    max_range=15.0,
    min_range=2.0,
    pos_std=0.5,
    rot_std=0.2,
)


def small_config(**model_kw) -> Config:
    m = ModelConfig(
        enc_channels=(4, 8, 16),
        dropout=0.0,
        cart_pixel_width=SMALL_SPEC.cart_pixel_width,
        cart_resolution=SMALL_SPEC.cart_resolution,
        res=SMALL_SPEC.res,
        polar_shape=SMALL_SPEC.polar_shape,
        max_iter=5,
        inference_max_iter=15,
        **model_kw,
    )
    return Config(model=m)


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(0, batch=2, spec=SMALL_SPEC)


def test_policy_forward_inference(batch):
    cfg = small_config()
    policy = LearnICPWeightPolicy(cfg)
    variables = policy.init(jax.random.PRNGKey(0))
    out = policy.apply(
        variables,
        batch["loc_data"],
        batch["map_data"],
        batch["transforms"]["T_ml_init"],
        train=False,
    )
    assert out.T_pred.shape == (2, 4, 4)
    assert out.weight_mask.shape == (2, 64, 64)
    m = np.asarray(out.weight_mask)
    assert np.isfinite(m).all() and m.min() >= 0.0 and m.max() <= 1.0


def test_policy_mask_only_and_binary(batch):
    cfg = small_config()
    policy = LearnICPWeightPolicy(cfg)
    variables = policy.init(jax.random.PRNGKey(0))
    mask = policy.apply(
        variables,
        batch["loc_data"],
        batch["map_data"],
        batch["transforms"]["T_ml_init"],
        train=False,
        mask_only=True,
        binary=True,
    )
    vals = np.unique(np.asarray(mask))
    assert set(vals).issubset({0.0, 1.0})


def test_policy_override_mask_ones_improves_pose(batch):
    # CFAR-quality synthetic scans: solver with an all-ones mask must reduce
    # the initial-guess error (the reference "ones baseline").
    cfg = small_config()
    policy = LearnICPWeightPolicy(cfg)
    variables = policy.init(jax.random.PRNGKey(0))
    ones = jnp.ones_like(batch["loc_data"]["fft_data"])
    out = policy.apply(
        variables,
        batch["loc_data"],
        batch["map_data"],
        batch["transforms"]["T_ml_init"],
        train=False,
        override_mask=ones,
    )

    def err(T):
        th, r = planar_xi_first_order(T)
        return float(jnp.mean(jnp.linalg.norm(jnp.concatenate([th, r], -1), axis=-1)))

    e_init = err(batch["transforms"]["T_ml_init"])
    e_icp = err(out.T_pred)
    assert e_icp < 0.5 * e_init, (e_init, e_icp)


def test_policy_train_grad_through_icp(batch):
    cfg = small_config()
    policy = LearnICPWeightPolicy(cfg)
    variables = policy.init(jax.random.PRNGKey(0))

    def loss_fn(v):
        out = policy.apply(
            v,
            batch["loc_data"],
            batch["map_data"],
            batch["transforms"]["T_ml_init"],
            train=True,
            rng=jax.random.PRNGKey(1),
        )
        th, r = planar_xi_first_order(out.T_pred)
        return jnp.mean(jnp.abs(th)) + jnp.mean(jnp.linalg.norm(r, axis=-1))

    g = jax.grad(loss_fn)(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0, "no gradient reached the UNet through the ICP unroll"


def test_policy_no_icp_when_loss_weights_zero(batch):
    cfg = dataclasses.replace(
        small_config(), loss=LossWeights(icp_rot=0.0, icp_trans=0.0, cfar=1.0)
    )
    policy = LearnICPWeightPolicy(cfg)
    variables = policy.init(jax.random.PRNGKey(0))
    out = policy.apply(
        variables,
        batch["loc_data"],
        batch["map_data"],
        batch["transforms"]["T_ml_init"],
        train=True,
        rng=jax.random.PRNGKey(1),
    )
    np.testing.assert_array_equal(
        np.asarray(out.T_pred), np.asarray(batch["transforms"]["T_ml_init"])
    )


def test_policy_polar_input_end_to_end():
    # Polar network input/output: UNet on the (A, R) polar image, mask warped
    # to cartesian for weight lookup (capability extension documented in the
    # policy).
    spec = dataclasses.replace(SMALL_SPEC, network_input_type="polar")
    b = synthetic_batch(3, batch=2, spec=spec)
    cfg = small_config(network_input_type="polar", network_output_type="polar")
    policy = LearnICPWeightPolicy(cfg)
    variables = policy.init(jax.random.PRNGKey(0))
    out = policy.apply(
        variables, b["loc_data"], b["map_data"],
        b["transforms"]["T_ml_init"], train=False,
    )
    assert out.weight_mask.shape == (2,) + SMALL_SPEC.polar_shape
    assert np.isfinite(np.asarray(out.T_pred)).all()


def test_policy_implicit_diff_mode(batch):
    cfg = small_config(icp_diff_mode="implicit")
    policy = LearnICPWeightPolicy(cfg)
    variables = policy.init(jax.random.PRNGKey(0))

    def loss_fn(v):
        out = policy.apply(
            v, batch["loc_data"], batch["map_data"],
            batch["transforms"]["T_ml_init"], train=True,
            rng=jax.random.PRNGKey(1),
        )
        th, r = planar_xi_first_order(out.T_pred)
        return jnp.mean(jnp.abs(th)) + jnp.mean(jnp.linalg.norm(r, axis=-1))

    g = jax.grad(loss_fn)(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


@pytest.mark.parametrize("normalize", ["minmax", "standardize"])
def test_compute_mask_constant_channel_stays_finite(normalize):
    """A CONSTANT input channel (e.g. a frame batch with zero CFAR hits) must
    normalize to 0, not NaN-poison the mask: the batch-global minmax /
    standardize denominators are floored (the reference divides unguarded —
    `icp_weight_policy.py:151-159` — and NaNs on this input; that is a crash
    bug, not semantics to reproduce)."""
    cfg = small_config(normalize=normalize, cfar_input=True)
    policy = LearnICPWeightPolicy(cfg)
    variables = policy.init(jax.random.PRNGKey(0))
    B, W = 2, cfg.model.cart_pixel_width
    fft = jnp.asarray(
        np.random.default_rng(0).random((B, W, W), np.float32))
    cfar = jnp.zeros((B, W, W), jnp.float32)  # no detections anywhere
    mask, _ = policy.compute_mask(variables, fft, cfar, train=False)
    m = np.asarray(mask)
    assert np.isfinite(m).all()
    # and the fft channel's normalization is unchanged by the guard
    mask2, _ = policy.compute_mask(
        variables, fft, cfar.at[0, 0, 0].set(1.0), train=False)
    assert np.isfinite(np.asarray(mask2)).all()
