"""Batched planar RANSAC (vtr radar.mcransac capability,
`radar_config.yaml:140-158`): outlier rejection + pose recovery."""
import numpy as np
import jax
import jax.numpy as jnp

from mm_masking_tpu.ops.mcransac import (
    RansacConfig,
    mcransac,
    ransac_filter_pc,
)


def make_matched(seed=0, B=3, N=256, outlier_frac=0.3, theta=0.2,
                 t=(1.0, -0.5), noise=0.01):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-20, 20, (B, N, 2)).astype(np.float32)
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s], [s, c]], np.float32)
    tgt = src @ R.T + np.asarray(t, np.float32)
    tgt += rng.normal(0, noise, tgt.shape).astype(np.float32)
    n_out = int(outlier_frac * N)
    is_out = np.zeros((B, N), bool)
    for b in range(B):
        idx = rng.permutation(N)[:n_out]
        tgt[b, idx] += rng.uniform(2.0, 15.0, (n_out, 2)) * rng.choice(
            [-1, 1], (n_out, 2)
        )
        is_out[b, idx] = True
    return src, tgt, is_out, R, np.asarray(t, np.float32)


def test_recovers_pose_under_gross_outliers():
    src, tgt, is_out, R, t = make_matched()
    out = mcransac(jnp.asarray(src), jnp.asarray(tgt),
                   rng=jax.random.PRNGKey(1))
    T = np.asarray(out["T"])
    for b in range(src.shape[0]):
        np.testing.assert_allclose(T[b, :2, :2], R, atol=5e-3)
        np.testing.assert_allclose(T[b, :2, 3], t, atol=2e-2)
    inl = np.asarray(out["inliers"])
    # All true inliers kept, all gross outliers rejected.
    assert (inl & is_out).sum() == 0
    assert (~inl & ~is_out).mean() < 0.02
    frac = np.asarray(out["inlier_frac"])
    np.testing.assert_allclose(frac, 0.7, atol=0.03)
    # ok flag reflects the 0.9 inlier_ratio target.
    assert not bool(np.asarray(out["ok"]).any())
    out2 = mcransac(jnp.asarray(src), jnp.asarray(tgt),
                    cfg=RansacConfig(inlier_ratio=0.5),
                    rng=jax.random.PRNGKey(1))
    assert bool(np.asarray(out2["ok"]).all())


def test_respects_valid_mask_and_pads():
    src, tgt, is_out, R, t = make_matched(seed=4, B=2, N=128)
    valid = np.ones((2, 128), bool)
    valid[:, -30:] = False
    src[:, -30:] = 0.0
    tgt[:, -30:] = 0.0  # pads — perfectly "matched" but must not count
    out = mcransac(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(valid),
                   rng=jax.random.PRNGKey(2))
    T = np.asarray(out["T"])
    np.testing.assert_allclose(T[0, :2, :2], R, atol=5e-3)
    inl = np.asarray(out["inliers"])
    assert not inl[:, -30:].any()


def test_filter_pc_zeroes_outliers():
    pc = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 3)),
                     jnp.float32)
    inl = jnp.asarray([[True] * 4 + [False] * 4] * 2)
    out = np.asarray(ransac_filter_pc(pc, inl))
    assert (out[:, 4:] == 0).all()
    np.testing.assert_array_equal(out[:, :4], np.asarray(pc)[:, :4])


def test_register_frame_with_mcransac_flag():
    """Odometry integration: with a reasonable warm start (the motion prior's
    job), the RANSAC pre-filter rejects gross out-of-map clutter and the
    registration still lands on the truth. (Bootstrap from a *far* init needs
    appearance descriptors — the C++ module's ORB path — not NN pairing.)"""
    from mm_masking_tpu.geom import se3_exp
    from mm_masking_tpu.localization.odometry import (
        OdometryConfig,
        register_frame,
    )

    rng = np.random.default_rng(6)
    M = 2048
    map_pts = np.zeros((M, 3), np.float32)
    r = rng.uniform(3, 25, M)
    a = rng.uniform(0, 2 * np.pi, M)
    map_pts[:, 0] = r * np.cos(a)
    map_pts[:, 1] = r * np.sin(a)

    N = 256
    n_clutter = 80
    sel = rng.permutation(M)[: N - n_clutter]
    T_true = np.asarray(se3_exp(jnp.asarray([0.2, -0.1, 0, 0, 0, 0.04])))
    T_rw = np.linalg.inv(T_true)
    scan = np.zeros((N, 3), np.float32)
    scan[: N - n_clutter] = map_pts[sel] @ T_rw[:3, :3].T + T_rw[:3, 3]
    scan += rng.normal(0, 0.01, scan.shape).astype(np.float32)
    # Gross clutter: points far from any map structure.
    cr = rng.uniform(26, 35, n_clutter)
    ca = rng.uniform(0, 2 * np.pi, n_clutter)
    scan[N - n_clutter :, 0] = cr * np.cos(ca)
    scan[N - n_clutter :, 1] = cr * np.sin(ca)
    scan[:, 2] = 0.0

    cfg = OdometryConfig(use_mcransac=True, mcransac_filter_pc=True,
                         mcransac_tolerance=0.5, max_iterations=25)
    T = np.asarray(register_frame(
        jnp.asarray(scan)[None], jnp.asarray(map_pts)[None],
        jnp.eye(4)[None], cfg,
    ))[0]
    D = T @ np.linalg.inv(T_true)
    assert np.linalg.norm(D[:2, 3]) < 0.05, D
    assert abs(D[1, 0]) < 0.01
