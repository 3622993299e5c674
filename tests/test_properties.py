"""Property tests from the SURVEY §4 plan: gradient checks through the ICP
unroll vs finite differences, and augmentation equivariance."""
import numpy as np
import jax
import jax.numpy as jnp

from mm_masking_tpu.dicp import ICPConfig, icp
from mm_masking_tpu.geom import planar_xi_first_order, se3_exp


def scene(seed=0, B=1, N=64, M=128):
    rng = np.random.default_rng(seed)
    mp = np.zeros((B, M, 3), np.float32)
    mp[..., 0] = rng.uniform(-20, 20, (B, M))
    mp[..., 1] = rng.uniform(-20, 20, (B, M))
    src = mp[:, :N] + rng.normal(0, 0.05, (B, N, 3)).astype(np.float32)
    src[..., 2] = 0
    return jnp.asarray(src), jnp.asarray(mp)


def test_icp_weight_gradient_matches_finite_differences():
    src, tgt = scene()
    xi = jnp.zeros((1, 6)).at[0, 0].set(0.3).at[0, 5].set(0.1)
    T_init = se3_exp(xi)
    w0 = jnp.ones((1, src.shape[1]))
    cfg = ICPConfig(icp_type="pt2pt", max_iterations=3, differentiable=True)

    def loss(w):
        T = icp(src, tgt, T_init, weight=w, cfg=cfg)["T"]
        th, r = planar_xi_first_order(T)
        return jnp.sum(th**2) + jnp.sum(r**2)

    g = np.asarray(jax.grad(loss)(w0))
    # Directional central differences: per-weight gradients are ~1e-5, below
    # what f32 loss evaluations can resolve pointwise; a random direction
    # aggregates the signal well above the noise floor.
    rng = np.random.default_rng(1)
    loss_j = jax.jit(loss)
    for trial in range(3):
        d = jnp.asarray(rng.normal(size=w0.shape).astype(np.float32))
        eps = 1e-2
        fd = (float(loss_j(w0 + eps * d)) - float(loss_j(w0 - eps * d))) / (
            2 * eps
        )
        gd = float(jnp.sum(jnp.asarray(g) * d))
        denom = max(abs(fd), abs(gd), 1e-5)
        assert abs(fd - gd) / denom < 0.1, (trial, fd, gd)


def test_icp_rotation_equivariance():
    # Rotating scan AND map by R must rotate the ICP solution conjugately:
    # T' = R T R^-1 (for planar R). Mirrors the dataset's rotation
    # augmentation consistency.
    src, tgt = scene(seed=2)
    xi_r = jnp.zeros((1, 6)).at[0, 5].set(0.7)
    R = se3_exp(xi_r)
    xi0 = jnp.zeros((1, 6)).at[0, 0].set(0.2).at[0, 1].set(-0.1).at[0, 5].set(0.05)
    T_init = se3_exp(xi0)

    cfg = ICPConfig(icp_type="pt2pt", max_iterations=10, differentiable=True)
    w = jnp.ones((1, src.shape[1]))
    T = icp(src, tgt, T_init, weight=w, cfg=cfg)["T"]

    rot = R[:, :3, :3]
    src_r = jnp.einsum("bij,bnj->bni", rot, src)
    tgt_r = tgt.at[..., :3].set(jnp.einsum("bij,bnj->bni", rot, tgt[..., :3]))
    T_init_r = R @ T_init @ jnp.linalg.inv(R)
    T_r = icp(src_r, tgt_r, T_init_r, weight=w, cfg=cfg)["T"]

    want = np.asarray(R @ T @ jnp.linalg.inv(R))
    np.testing.assert_allclose(np.asarray(T_r), want, atol=2e-3)


def test_unrolled_matches_while_loop_at_convergence():
    # At convergence both solver modes must land on the same pose.
    src, tgt = scene(seed=3)
    T_init = se3_exp(jnp.zeros((1, 6)).at[0, 0].set(0.2))
    w = jnp.ones((1, src.shape[1]))
    T_a = icp(src, tgt, T_init, weight=w,
              cfg=ICPConfig(max_iterations=40, differentiable=True))["T"]
    T_b = icp(src, tgt, T_init, weight=w,
              cfg=ICPConfig(max_iterations=40, differentiable=False,
                            tolerance=1e-9))["T"]
    np.testing.assert_allclose(np.asarray(T_a), np.asarray(T_b), atol=1e-5)


def test_implicit_gradient_matches_unrolled_at_convergence():
    # Implicit-function-theorem gradients (one 3x3 solve) must agree with the
    # unrolled-to-convergence gradients on the weight input.
    from mm_masking_tpu.dicp.icp import icp_implicit

    src, tgt = scene(seed=5, B=1, N=96, M=200)
    T_init = se3_exp(jnp.zeros((1, 6)).at[0, 0].set(0.15).at[0, 5].set(0.05))
    w0 = jnp.ones((1, src.shape[1]))
    cfg = ICPConfig(icp_type="pt2pt", max_iterations=60, tolerance=1e-9,
                    loss_name="cauchy")

    def loss_unroll(w):
        T = icp(src, tgt, T_init, weight=w,
                cfg=ICPConfig(icp_type="pt2pt", max_iterations=60,
                              differentiable=True))["T"]
        th, r = planar_xi_first_order(T)
        return jnp.sum(th**2) + jnp.sum(r**2)

    def loss_implicit(w):
        T = icp_implicit(src, tgt, T_init, w, cfg)
        th, r = planar_xi_first_order(T)
        return jnp.sum(th**2) + jnp.sum(r**2)

    g_u = np.asarray(jax.grad(loss_unroll)(w0))
    g_i = np.asarray(jax.grad(loss_implicit)(w0))
    assert np.isfinite(g_i).all()
    # Direction agreement (the IFT approximation freezes robust weights and
    # correspondences, so magnitudes differ slightly).
    cos = (g_u * g_i).sum() / (np.linalg.norm(g_u) * np.linalg.norm(g_i) + 1e-12)
    assert cos > 0.9, cos


def test_implicit_forward_equals_solver():
    from mm_masking_tpu.dicp.icp import icp_implicit

    src, tgt = scene(seed=6, B=2, N=64, M=128)
    T_init = se3_exp(jnp.zeros((2, 6)).at[:, 0].set(0.1))
    w = jnp.ones((2, src.shape[1]))
    cfg = ICPConfig(icp_type="pt2pt", max_iterations=40, tolerance=1e-9)
    T_i = icp_implicit(src, tgt, T_init, w, cfg)
    T_s = icp(src, tgt, T_init, weight=w,
              cfg=ICPConfig(icp_type="pt2pt", max_iterations=40,
                            tolerance=1e-9, differentiable=False))["T"]
    np.testing.assert_allclose(np.asarray(T_i), np.asarray(T_s), atol=1e-6)
