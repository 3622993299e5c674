"""UNet: upsample parity vs torch, shapes, decoder weight sharing, init."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from mm_masking_tpu.models import UNet, upsample_bilinear_align_corners


def test_upsample_matches_torch_align_corners():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    for size in [(10, 14), (9, 13), (5, 7), (3, 4)]:
        want = (
            torch.nn.UpsamplingBilinear2d(size=size)(
                torch.from_numpy(x).permute(0, 3, 1, 2)
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        got = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), size))
        np.testing.assert_allclose(got, want, atol=1e-5)


def _tiny_unet():
    return UNet(enc_channels=(4, 8, 16), dropout=0.0)


def test_unet_output_shape_and_range():
    net = _tiny_unet()
    x = jnp.ones((2, 32, 48, 1))
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = net.apply(variables, x, train=False)
    assert y.shape == (2, 32, 48)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_decoder_weight_sharing():
    # Each decoder stage must own exactly ONE conv block (applied twice), so a
    # 3-level UNet has 3 encoder + 2 decoder blocks + final conv.
    net = _tiny_unet()
    x = jnp.ones((1, 16, 16, 1))
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    block_names = [k for k in variables["params"] if k.startswith("ConvBlock")]
    assert len(block_names) == 3 + 2, block_names


def test_unet_differentiable_wrt_params():
    net = _tiny_unet()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 16, 16, 1)),
                    dtype=jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def loss(v):
        return jnp.sum(net.apply(v, x, train=False) ** 2)

    g = jax.grad(loss)(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_xavier_init_zero_bias():
    net = _tiny_unet()
    x = jnp.ones((1, 16, 16, 1))
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    biases = [v for p, v in flat if "bias" in str(p)]
    assert biases and all(float(jnp.abs(b).max()) == 0.0 for b in biases)


def test_s2d_unet_matches_baseline_unet():
    """The s2d flag is a layout choice: same params, same outputs."""
    import jax
    import numpy as np

    from mm_masking_tpu.models.unet import UNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32))
    base = UNet(enc_channels=(4, 8, 16), dropout=0.0)
    fast = UNet(enc_channels=(4, 8, 16), dropout=0.0, s2d=True)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y0 = np.asarray(base.apply(variables, x, train=False))
    y1 = np.asarray(fast.apply(variables, x, train=False))
    np.testing.assert_allclose(y1, y0, atol=3e-6)


def test_tapsum_conv_matches_xla_lowering():
    """conv_impl is a lowering choice: identical params, same outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mm_masking_tpu.models.unet import UNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    u_x = UNet(enc_channels=(8, 16), dropout=0.0, conv_impl="xla")
    u_t = UNet(enc_channels=(8, 16), dropout=0.0, conv_impl="tapsum")
    v = u_x.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y_x = u_x.apply(v, x, train=False)
    y_t = u_t.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_t), np.asarray(y_x),
                               rtol=1e-5, atol=1e-6)


def test_remat_blocks_match_plain_execution():
    """remat is an execution choice: same param tree, same outputs/grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mm_masking_tpu.models.unet import UNet

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    u0 = UNet(enc_channels=(8, 16), dropout=0.0, remat=False)
    u1 = UNet(enc_channels=(8, 16), dropout=0.0, remat=True)
    v = u0.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    np.testing.assert_array_equal(
        np.asarray(u1.apply(v, x, train=False)),
        np.asarray(u0.apply(v, x, train=False)),
    )
    g0 = jax.grad(lambda v: jnp.sum(u0.apply(v, x, train=False)))(v)
    g1 = jax.grad(lambda v: jnp.sum(u1.apply(v, x, train=False)))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_nhcw_unet_matches_xla_lowering():
    """pallas_nhcw is a lowering/layout choice: identical params and outputs
    (interpret-mode Pallas on CPU; the same path Mosaic-compiles on TPU).

    Grads are covered op-level in tests/test_pallas_conv.py; here the full
    forward (transpose-in, fused relu, NHCW pool/upsample/concat,
    transpose-out) must match the NHWC reference graph."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mm_masking_tpu.models.unet import UNet

    rng = np.random.default_rng(0)
    # W=128-multiple at the top stage; deeper stages (W=64, 32) take the
    # NHCW lax.conv fallback, so both kernel paths are exercised.
    x = jnp.asarray(rng.random((2, 128, 128, 2)), jnp.float32)
    u_x = UNet(enc_channels=(8, 16, 32), dropout=0.0, conv_impl="xla")
    u_p = UNet(enc_channels=(8, 16, 32), dropout=0.0, conv_impl="pallas_nhcw")
    v = u_x.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y_x = u_x.apply(v, x, train=False)
    y_p = u_p.apply(v, x, train=False)
    assert y_p.shape == y_x.shape
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=1e-5, atol=2e-6)


def test_pallas_nhcw_unet_grads_match_xla():
    """Full fwd+bwd through the NHCW UNet (custom VJPs inside) matches the
    NHWC autodiff graph parameter-for-parameter."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mm_masking_tpu.models.unet import UNet

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 128, 128, 1)), jnp.float32)
    u_x = UNet(enc_channels=(8, 16), dropout=0.0, conv_impl="xla")
    u_p = UNet(enc_channels=(8, 16), dropout=0.0, conv_impl="pallas_nhcw")
    v = u_x.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def loss(u):
        def f(params):
            y = u.apply({"params": params}, x, train=False)
            return jnp.sum(y * y)
        return f

    g_x = jax.grad(loss(u_x))(v["params"])
    g_p = jax.grad(loss(u_p))(v["params"])
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_p = {jax.tree_util.keystr(k): a
              for k, a in jax.tree_util.tree_leaves_with_path(g_p)}
    for k, a in flat_x:
        np.testing.assert_allclose(
            np.asarray(flat_p[jax.tree_util.keystr(k)]), np.asarray(a),
            rtol=2e-4, atol=2e-5, err_msg=jax.tree_util.keystr(k))
