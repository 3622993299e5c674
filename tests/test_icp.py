"""ICP property tests: recovery of known perturbations, trimming, robustness,
weight gradients through the unrolled solver, and NN-association parity."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mm_masking_tpu.dicp import ICP, ICPConfig, icp, TARGET_PAD_VAL
from mm_masking_tpu.geom import se3_exp, se3_inv, transform_points, planar_xi_first_order
from mm_masking_tpu.ops.pallas.nn_assoc import nn_argmin_blocked


def make_scene(seed=0, B=2, N=256, M=400, n_pad_src=20, n_pad_map=50,
               with_normals=True):
    """Synthetic planar scene: map cloud + scan = gt-aligned subsample."""
    rng = np.random.default_rng(seed)
    map_pts = np.zeros((B, M, 3), np.float32)
    map_pts[..., 0] = rng.uniform(-40, 40, (B, M))
    map_pts[..., 1] = rng.uniform(-40, 40, (B, M))
    nrm = rng.normal(size=(B, M, 3)).astype(np.float32)
    nrm[..., 2] *= 0.1  # mostly planar normals
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    # scan: first N map points (gt = identity), mild noise
    src = map_pts[:, :N].copy() + rng.normal(0, 0.01, (B, N, 3)).astype(np.float32)
    src[..., 2] = 0.0
    src[:, N - n_pad_src:] = 0.0  # zero pads
    map_pts[:, M - n_pad_map:] = TARGET_PAD_VAL
    nrm[:, M - n_pad_map:] = TARGET_PAD_VAL
    target = np.concatenate([map_pts, nrm], axis=-1) if with_normals else map_pts
    return jnp.asarray(src), jnp.asarray(target)


def perturb(B, seed=1, pos=0.5, rot=0.1):
    rng = np.random.default_rng(seed)
    xi = np.zeros((B, 6), np.float32)
    xi[:, 0:2] = rng.uniform(-pos, pos, (B, 2))
    xi[:, 5] = rng.uniform(-rot, rot, B)
    return se3_exp(jnp.asarray(xi))


def planar_err(T):
    th, r = planar_xi_first_order(T)
    return float(jnp.max(jnp.abs(th))), float(jnp.max(jnp.linalg.norm(r, axis=-1)))


def test_pt2pt_recovers_identity():
    src, tgt = make_scene()
    T_init = perturb(2)
    cfg = ICPConfig(icp_type="pt2pt", max_iterations=30, differentiable=True)
    out = icp(src, tgt, T_init, cfg=cfg)
    rot_e, tr_e = planar_err(out["T"])
    assert rot_e < 5e-3, rot_e
    assert tr_e < 5e-2, tr_e


def test_pt2pl_recovers_identity():
    src, tgt = make_scene(seed=2)
    T_init = perturb(2, seed=3)
    cfg = ICPConfig(icp_type="pt2pl", max_iterations=30, differentiable=True)
    out = icp(src, tgt, T_init, cfg=cfg)
    rot_e, tr_e = planar_err(out["T"])
    assert rot_e < 5e-3, rot_e
    assert tr_e < 5e-2, tr_e


def test_inference_while_loop_converges():
    src, tgt = make_scene(seed=4)
    T_init = perturb(2, seed=5)
    alg = ICP(icp_type="pt2pt", differentiable=False, max_iterations=50)
    out = alg.icp(src, tgt, T_init)
    rot_e, tr_e = planar_err(out["T"])
    assert rot_e < 5e-3
    assert tr_e < 5e-2
    assert int(out["iterations"]) <= 50


def test_dim2_keeps_z_roll_pitch_fixed():
    src, tgt = make_scene(seed=6)
    T_init = perturb(2, seed=7)
    out = icp(src, tgt, T_init, cfg=ICPConfig(max_iterations=10))
    T = np.asarray(out["T"])
    Ti = np.asarray(T_init)
    # z-translation unchanged; rotation stays about z (third row/col of R fixed).
    np.testing.assert_allclose(T[:, 2, 3], Ti[:, 2, 3], atol=1e-6)
    np.testing.assert_allclose(T[:, 2, :3], Ti[:, 2, :3], atol=1e-6)


def test_weights_mask_outliers():
    # Corrupt a block of scan points; with those points' weights zeroed the
    # solve must recover cleanly even though unweighted ICP is pulled away.
    src, tgt = make_scene(seed=8, B=1, N=256, M=400)
    src_bad = np.asarray(src).copy()
    src_bad[:, :64, 0] += 8.0  # gross outliers
    src_bad = jnp.asarray(src_bad)
    T_init = perturb(1, seed=9, pos=0.3, rot=0.05)
    w = np.ones((1, 256), np.float32)
    w[:, :64] = 0.0
    cfg = ICPConfig(icp_type="pt2pt", max_iterations=25, loss_name="none",
                    trim_dist=50.0)
    out_w = icp(src_bad, tgt, T_init, weight=jnp.asarray(w), cfg=cfg)
    rot_e, tr_e = planar_err(out_w["T"])
    assert tr_e < 5e-2, tr_e


def test_gradient_flows_to_weights():
    src, tgt = make_scene(seed=10, B=1)
    T_init = perturb(1, seed=11)
    w = jnp.ones((1, src.shape[1]))

    def loss(w):
        out = icp(src, tgt, T_init, weight=w,
                  cfg=ICPConfig(max_iterations=5))
        th, r = planar_xi_first_order(out["T"])
        return jnp.sum(jnp.abs(th)) + jnp.sum(jnp.linalg.norm(r, axis=-1))

    g = jax.grad(loss)(w)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_nn_blocked_matches_naive():
    rng = np.random.default_rng(12)
    p = jnp.asarray(rng.normal(size=(2, 100, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(2, 333, 3)).astype(np.float32))
    idx, d2 = nn_argmin_blocked(p, q, chunk=64)
    # Naive full-matrix reference.
    d_full = np.linalg.norm(
        np.asarray(p)[:, :, None] - np.asarray(q)[:, None], axis=-1
    ) ** 2
    want_idx = d_full.argmin(axis=2)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(d2), d_full.min(axis=2), atol=1e-4)


def test_target_pads_never_selected():
    src, tgt = make_scene(seed=13, B=1, N=64, M=128, n_pad_map=40)
    idx, _ = nn_argmin_blocked(src, tgt[..., :3], chunk=32)
    assert int(jnp.max(idx)) < 128 - 40


def test_nn_pallas_interpret_matches_blocked():
    # Interpreter-mode run of the Pallas kernel (CPU) against the blocked path.
    from mm_masking_tpu.ops.pallas.nn_assoc import nn_argmin_pallas

    rng = np.random.default_rng(21)
    p = jnp.asarray(rng.uniform(-30, 30, (2, 160, 3)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-30, 30, (2, 300, 3)).astype(np.float32))
    idx_i, d2_i = nn_argmin_pallas(p, q, tn=128, tm=256, interpret=True)
    idx_b, d2_b = nn_argmin_blocked(p, q, chunk=128)
    assert (np.asarray(idx_i) == np.asarray(idx_b)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(d2_i), np.asarray(d2_b), atol=1e-2)


def test_prior_fusion_constrains_unobservable_dof():
    """WNOA-style prior fused into the GN solve (ICPConfig.prior_weight):
    against a single straight wall, pt2pl ICP observes only the cross-wall
    translation and yaw — along-wall x is a gauge freedom. The prior pins it;
    warm-start-only leaves it wherever the init put it."""
    import numpy as np

    from mm_masking_tpu.dicp import ICPConfig, icp

    rng = np.random.default_rng(0)
    M = 1024
    # Wall: y = 5 line, normals (0, -1, 0) (toward the sensor at origin).
    map_pc = np.zeros((1, M, 6), np.float32)
    map_pc[0, :, 0] = rng.uniform(-20, 20, M)
    map_pc[0, :, 1] = 5.0
    map_pc[0, :, 4] = -1.0
    scan = map_pc[:, ::4, :3].copy()
    scan += rng.normal(0, 0.01, scan.shape).astype(np.float32)
    scan[..., 2] = 0.0

    # Init offset: 0.5 m along the wall (unobservable) + 0.3 m across.
    T_init = np.eye(4, dtype=np.float32)[None].copy()
    T_init[0, 0, 3] = 0.5
    T_init[0, 1, 3] = 0.3
    T_prior = np.eye(4, dtype=np.float32)[None]  # truth

    base = dict(icp_type="pt2pl", max_iterations=30, differentiable=False,
                dim=2)
    out0 = icp(jnp.asarray(scan), jnp.asarray(map_pc), jnp.asarray(T_init),
               cfg=ICPConfig(**base))
    T0 = np.asarray(out0["T"])[0]
    # Cross-wall error corrected, along-wall error stays (gauge freedom).
    assert abs(T0[1, 3]) < 0.02
    assert abs(T0[0, 3]) > 0.3

    out1 = icp(jnp.asarray(scan), jnp.asarray(map_pc), jnp.asarray(T_init),
               cfg=ICPConfig(**base, prior_weight=5.0),
               T_prior=jnp.asarray(T_prior))
    T1 = np.asarray(out1["T"])[0]
    assert abs(T1[1, 3]) < 0.05
    assert abs(T1[0, 3]) < 0.02, T1


def test_strong_prior_dominates():
    """With overwhelming prior weight the solution reproduces T_prior."""
    import numpy as np

    from mm_masking_tpu.dicp import ICPConfig, icp
    from mm_masking_tpu.geom import se3_exp

    rng = np.random.default_rng(1)
    map_pc = jnp.asarray(rng.uniform(-10, 10, (1, 256, 3)).astype(np.float32))
    scan = map_pc[:, ::2] + 0.01
    T_prior = np.asarray(se3_exp(jnp.asarray([[0.3, -0.2, 0, 0, 0, 0.1]])))
    out = icp(scan, map_pc, jnp.eye(4)[None],
              cfg=ICPConfig(icp_type="pt2pt", max_iterations=30,
                            differentiable=False, prior_weight=1e7),
              T_prior=jnp.asarray(T_prior))
    T = np.asarray(out["T"])[0]
    np.testing.assert_allclose(T[:2, 3], T_prior[0, :2, 3], atol=5e-3)
    np.testing.assert_allclose(T[1, 0], T_prior[0, 1, 0], atol=5e-3)


# --------------------------------------------------------------- stripe NN
def _naive_nn(p, q):
    d = np.linalg.norm(np.asarray(p)[:, :, None] - np.asarray(q)[:, None], axis=-1)
    return d.argmin(-1), (d.min(-1) ** 2)


def _stripe(p, target, trim=5.0, window=None, tn=64):
    from mm_masking_tpu.ops.pallas.nn_assoc import (
        nn_argmin_stripe,
        stripe_sort_target,
    )

    q_sorted, key_sorted, use_x = stripe_sort_target(target)
    idx, d2 = nn_argmin_stripe(
        p, q_sorted, key_sorted, use_x, trim_dist=trim, window=window, tn=tn
    )
    return q_sorted, idx, d2


def test_stripe_nn_matches_dense_distances():
    p, target = make_scene(seed=3, B=2, N=256, M=512)
    q_sorted, idx, d2 = _stripe(p, target, window=128)
    # Stripe must select the same neighbors as the dense kernel. Raw d² values
    # carry layout-dependent f32 cancellation noise (~1e-4 at |p|~40 via the
    # |p|² − 2pq + |q|² expansion), so assert on indices tightly and d² loosely.
    idx_dense, d2_dense = nn_argmin_blocked(p, jnp.asarray(q_sorted[..., :3]))
    assert (np.asarray(idx) == np.asarray(idx_dense)).all()
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_dense), atol=1e-3)
    # Gathered coordinates agree with the naive NN's point (ties aside).
    _, d2_naive = _naive_nn(p, target[..., :3])
    q_at = np.take_along_axis(np.asarray(q_sorted)[..., :3],
                              np.asarray(idx)[..., None], axis=1)
    d_gather = np.linalg.norm(np.asarray(p) - q_at, axis=-1) ** 2
    np.testing.assert_allclose(d_gather, d2_naive, rtol=1e-3, atol=1e-6)


def test_stripe_nn_overflow_falls_back_dense():
    # All map mass inside one stripe cell: every tile's needed span is the
    # whole map, far above the window -> exact dense fallback must kick in.
    rng = np.random.default_rng(0)
    q = np.zeros((1, 256, 3), np.float32)
    q[..., 0] = rng.uniform(-0.1, 0.1, (1, 256))  # x collapsed
    q[..., 1] = rng.uniform(-40, 40, (1, 256))
    # y wider than x -> stripe key is y; now collapse y too so spans overflow
    q[..., 1] = rng.uniform(-0.05, 0.05, (1, 256))
    p = q[:, :64] + 0.01
    q_sorted, idx, d2 = _stripe(jnp.asarray(p), jnp.asarray(q), window=32, tn=16)
    _, d2_naive = _naive_nn(p, q)
    np.testing.assert_allclose(np.asarray(d2), d2_naive, rtol=1e-4, atol=1e-6)


def test_stripe_nn_icp_equals_dense_icp():
    src, target = make_scene(seed=4, B=2, N=192, M=512)
    T0 = perturb(2, seed=5, pos=0.4, rot=0.1)
    cfg_d = ICPConfig(icp_type="pt2pl", max_iterations=8, nn_stripe=False)
    cfg_s = ICPConfig(icp_type="pt2pl", max_iterations=8, nn_stripe=True,
                      nn_stripe_window=128)
    T_d = icp(src, target, T0, cfg=cfg_d)["T"]
    T_s = icp(src, target, T0, cfg=cfg_s)["T"]
    np.testing.assert_allclose(np.asarray(T_s), np.asarray(T_d),
                               rtol=1e-5, atol=1e-5)


def test_stripe_nn_grad_matches_dense():
    src, target = make_scene(seed=6, B=1, N=128, M=384)
    T0 = perturb(1, seed=7, pos=0.3, rot=0.05)
    w0 = jnp.ones(src.shape[:2])

    def loss(w, stripe):
        cfg = ICPConfig(icp_type="pt2pt", max_iterations=4, nn_stripe=stripe,
                        nn_stripe_window=96)
        T = icp(src, target, T0, weight=w, cfg=cfg)["T"]
        return jnp.sum(jnp.abs(T - jnp.eye(4)))

    g_d = jax.grad(loss)(w0, False)
    g_s = jax.grad(loss)(w0, True)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               rtol=1e-4, atol=1e-6)


def test_nn_pallas_fmt_coordmajor_matches_blocked():
    """The pre-formatted coord-major kernel entry (the stripe fast path)
    returns the same minima as the blocked kernel."""
    from mm_masking_tpu.ops.pallas.nn_assoc import (
        _nn_argmin_pallas_fmt,
        coord_major,
    )

    rng = np.random.default_rng(11)
    p = jnp.asarray(rng.uniform(-30, 30, (2, 192, 3)), jnp.float32)
    q = jnp.asarray(rng.uniform(-30, 30, (2, 512, 3)), jnp.float32)
    qt = coord_major(q)
    idx_f, d2_f = _nn_argmin_pallas_fmt(p, qt, tn=64, tm=512, interpret=True)
    idx_b, d2_b = nn_argmin_blocked(p, q)
    assert (np.asarray(idx_f) == np.asarray(idx_b)).all()
    np.testing.assert_allclose(np.asarray(d2_f), np.asarray(d2_b), atol=1e-3)


def test_stripe_axis_choice_ignores_pad_rows():
    """Sentinel pad rows (+1000) must not steer the sort-axis heuristic:
    with x collapsed and y wide, the key axis must be y even though the pad
    value dominates both raw spans."""
    from mm_masking_tpu.ops.pallas.nn_assoc import stripe_sort_target

    rng = np.random.default_rng(5)
    q = np.zeros((1, 128, 3), np.float32)
    q[0, :, 0] = rng.uniform(10, 15, 128)     # x span 5
    q[0, :, 1] = rng.uniform(20, 120, 128)    # y span 100
    q[0, -30:, :] = 1000.0                    # pad sentinels
    _, _, use_x = stripe_sort_target(jnp.asarray(q))
    assert not bool(use_x[0])


def test_nn_stripe_prefetch_kernel_matches_blocked():
    """Scalar-prefetch stripe kernel (interpret mode): global indices and
    distances match the dense blocked kernel wherever the true NN lies
    inside the tile's block span."""
    from mm_masking_tpu.ops.pallas.nn_assoc import (
        _nn_stripe_pallas,
        coord_major,
    )

    rng = np.random.default_rng(17)
    B, N, M, tn, tm = 2, 128, 1024, 64, 128
    # Scan and map over the same 1-D band so sorted tiles see local windows.
    q = np.zeros((B, M, 3), np.float32)
    q[..., 0] = np.sort(rng.uniform(-50, 50, (B, M)), axis=1)
    q[..., 1] = rng.uniform(-5, 5, (B, M))
    p = np.zeros((B, N, 3), np.float32)
    p[..., 0] = np.sort(rng.uniform(-45, 45, (B, N)), axis=1)
    p[..., 1] = rng.uniform(-5, 5, (B, N))

    # Per-tile block starts sized to cover each tile's span generously.
    T = N // tn
    nk = M // tm  # cover the whole map -> must equal dense exactly
    start_blk = np.zeros((B, T), np.int32)
    P8 = jnp.pad(jnp.asarray(p), ((0, 0), (0, 0), (0, 5)))
    idx_s, d2_s = _nn_stripe_pallas(
        P8, coord_major(jnp.asarray(q)), jnp.asarray(start_blk),
        tn=tn, tm=tm, nk=nk, interpret=True,
    )
    idx_b, d2_b = nn_argmin_blocked(jnp.asarray(p), jnp.asarray(q))
    assert (np.asarray(idx_s) == np.asarray(idx_b)).all()
    np.testing.assert_allclose(np.asarray(d2_s), np.asarray(d2_b), atol=1e-3)


def test_stripe_nn_target_grad_matches_dense():
    """ADVICE r2: the stripe path must keep the TARGET-value gradient (the
    sort permutation is discrete, but the gathered q coordinates are
    differentiable, same as the dense path)."""
    src, target = make_scene(seed=16, B=2, N=96, M=256)
    T0 = perturb(2, seed=17, pos=0.2, rot=0.05)

    def loss(tgt, stripe):
        cfg = ICPConfig(icp_type="pt2pt", max_iterations=3, nn_stripe=stripe,
                        nn_stripe_window=96)
        T = icp(src, tgt, T0, cfg=cfg)["T"]
        return jnp.sum(jnp.abs(T - jnp.eye(4)))

    g_d = jax.grad(loss)(target, False)
    g_s = jax.grad(loss)(target, True)
    assert float(jnp.sum(jnp.abs(g_d))) > 0.0  # dense target grad is real
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               rtol=1e-4, atol=1e-6)


def test_motion_gated_refresh_matches_always_associate():
    """nn_refresh_dist > 0 (skip the NN search while the pose has moved less
    than the threshold) must land within ≤1 mm / ≤0.005° of the
    search-every-iteration solver on converging scenes."""
    src, target = make_scene(seed=26, B=8, N=192, M=512)
    T0 = perturb(8, seed=27, pos=0.4, rot=0.1)

    def solve(refresh):
        cfg = ICPConfig(icp_type="pt2pt", max_iterations=50,
                        differentiable=False, nn_refresh_dist=refresh)
        return np.asarray(icp(src, target, T0, cfg=cfg)["T"])

    T_ref = solve(0.0)
    T_gated = solve(0.05)
    dt = np.linalg.norm(T_ref[:, :2, 3] - T_gated[:, :2, 3], axis=-1)
    dR = np.einsum("bij,bkj->bik", T_ref[:, :2, :2], T_gated[:, :2, :2])
    dth = np.abs(np.arctan2(dR[:, 1, 0], dR[:, 0, 0]))
    assert dt.max() <= 1e-3, dt.max()
    assert dth.max() <= np.radians(0.005), dth.max()


def test_motion_gated_refresh_through_stripe():
    """Gated refresh composes with the stripe association path."""
    src, target = make_scene(seed=28, B=2, N=128, M=384)
    T0 = perturb(2, seed=29, pos=0.3, rot=0.05)
    cfg_a = ICPConfig(icp_type="pt2pt", max_iterations=50,
                      differentiable=False, nn_stripe=True,
                      nn_stripe_window=128, nn_refresh_dist=0.0)
    cfg_b = dataclasses.replace(cfg_a, nn_refresh_dist=0.05)
    Ta = np.asarray(icp(src, target, T0, cfg=cfg_a)["T"])
    Tb = np.asarray(icp(src, target, T0, cfg=cfg_b)["T"])
    np.testing.assert_allclose(Tb[:, :3, 3], Ta[:, :3, 3], atol=2e-3)


def test_nn_stripe_adaptive_depth_matches_blocked():
    """Per-tile adaptive-depth prefetch kernel: with nblk[b, t] covering each
    tile's true span (block-aligned), skipped beyond-need blocks must not
    change the result — indices/distances equal the dense blocked kernel."""
    from mm_masking_tpu.ops.pallas.nn_assoc import (
        _nn_stripe_pallas,
        coord_major,
    )

    rng = np.random.default_rng(23)
    B, N, M, tn, tm = 2, 128, 1024, 32, 128
    trim = 2.0
    # Non-uniform density along the key axis: tiles need very different runs.
    q = np.zeros((B, M, 3), np.float32)
    half = M // 2
    q[:, :half, 0] = np.sort(rng.uniform(-50, -20, (B, half)), axis=1)  # sparse
    q[:, half:, 0] = np.sort(rng.uniform(20, 24, (B, half)), axis=1)    # dense
    q[..., 1] = rng.uniform(-4, 4, (B, M))
    qs = np.sort(q[..., 0], axis=1)
    q[..., 0] = qs  # globally sorted by x
    p = np.zeros((B, N, 3), np.float32)
    p[..., 0] = np.sort(rng.uniform(-48, 23, (B, N)), axis=1)
    p[..., 1] = rng.uniform(-4, 4, (B, N))

    T = N // tn
    nk = 8  # static budget = whole map; per-tile nblk must stay below it
    key_t = p[..., 0].reshape(B, T, tn)
    lo = key_t.min(axis=2) - trim
    hi = key_t.max(axis=2) + trim
    start_needed = np.stack([np.searchsorted(q[b, :, 0], lo[b]) for b in range(B)])
    end_needed = np.stack([np.searchsorted(q[b, :, 0], hi[b]) for b in range(B)])
    start_blk = (start_needed // tm).astype(np.int32)
    nblk = np.clip(-(-end_needed // tm) - start_blk, 1, None).astype(np.int32)
    assert nblk.max() <= nk, "test setup must fit the block budget"
    assert nblk.min() < nblk.max(), "test must exercise varying depths"

    P8 = jnp.pad(jnp.asarray(p), ((0, 0), (0, 0), (0, 5)))
    idx_s, d2_s = _nn_stripe_pallas(
        P8, coord_major(jnp.asarray(q)), jnp.asarray(start_blk),
        tn=tn, tm=tm, nk=nk, interpret=True, nblk=jnp.asarray(nblk),
    )
    idx_b, d2_b = nn_argmin_blocked(jnp.asarray(p), jnp.asarray(q))
    # within-trim associations must be identical (beyond trim both answers
    # are weighted to zero by the GN step)
    within = np.asarray(d2_b) < trim * trim
    assert (np.asarray(idx_s) == np.asarray(idx_b))[within].all()
    np.testing.assert_allclose(np.asarray(d2_s)[within],
                               np.asarray(d2_b)[within], atol=1e-3)


def test_stripe_presorted_adaptive_pallas_interpret():
    """Integration: nn_argmin_stripe_presorted's adaptive TPU path (forced
    via use_pallas + interpret-capable kernels is NOT available on CPU, so
    drive the block-math helper directly): block-aligned covers derived from
    searchsorted must cover every tile's needed run."""
    from mm_masking_tpu.ops.pallas.nn_assoc import stripe_sort_target

    rng = np.random.default_rng(29)
    B, N, M = 2, 192, 1024
    q = np.zeros((B, M, 3), np.float32)
    q[..., 0] = rng.uniform(-40, 40, (B, M))
    q[..., 1] = rng.uniform(-8, 8, (B, M))
    p = np.asarray(q[:, :N] + 0.05, np.float64).astype(np.float32)
    q_sorted, key_sorted, use_x = stripe_sort_target(jnp.asarray(q))
    tn, tm, trim = 64, 128, 5.0
    p_key = np.where(np.asarray(use_x)[:, None], p[..., 0], p[..., 1])
    order = np.argsort(p_key, axis=1)
    p_s = np.take_along_axis(p, order[..., None], axis=1)
    T = N // tn
    key_t = np.take_along_axis(p_key, order, axis=1).reshape(B, T, tn)
    lo, hi = key_t.min(2) - trim, key_t.max(2) + trim
    ks = np.asarray(key_sorted)
    start_needed = np.stack([np.searchsorted(ks[b], lo[b]) for b in range(B)])
    end_needed = np.stack([np.searchsorted(ks[b], hi[b]) for b in range(B)])
    start_blk = start_needed // tm
    end_blk = -(-end_needed // tm)
    # block cover property: [start_blk·tm, end_blk·tm) ⊇ [start_needed, end_needed)
    assert (start_blk * tm <= start_needed).all()
    assert (end_blk * tm >= end_needed).all()
    assert (end_blk * tm <= M).all()


def test_nn_stripe_per_item_gate_interpret():
    """Per-item refresh gate: items with nblk == 0 skip ALL association
    (outputs are the init sentinels — inf distance, index 0) while other
    items' results are untouched and still match the blocked kernel."""
    from mm_masking_tpu.ops.pallas.nn_assoc import (
        _nn_stripe_pallas,
        coord_major,
    )

    rng = np.random.default_rng(31)
    B, N, M, tn, tm, nk = 2, 128, 1024, 32, 128, 8
    q = np.zeros((B, M, 3), np.float32)
    q[..., 0] = np.sort(rng.uniform(-40, 40, (B, M)), axis=1)
    q[..., 1] = rng.uniform(-4, 4, (B, M))
    p = np.zeros((B, N, 3), np.float32)
    p[..., 0] = np.sort(rng.uniform(-38, 38, (B, N)), axis=1)
    p[..., 1] = rng.uniform(-4, 4, (B, N))

    T = N // tn
    start_blk = np.zeros((B, T), np.int32)
    nblk = np.full((B, T), nk, np.int32)
    nblk[0, :] = 0  # item 0 gated off

    P8 = jnp.pad(jnp.asarray(p), ((0, 0), (0, 0), (0, 5)))
    idx_s, d2_s = _nn_stripe_pallas(
        P8, coord_major(jnp.asarray(q)), jnp.asarray(start_blk),
        tn=tn, tm=tm, nk=nk, interpret=True, nblk=jnp.asarray(nblk),
    )
    idx_b, d2_b = nn_argmin_blocked(jnp.asarray(p), jnp.asarray(q))
    # gated item: deterministic sentinels
    assert np.isinf(np.asarray(d2_s)[0]).all()
    assert (np.asarray(idx_s)[0] == 0).all()
    # ungated item: full-depth exact
    np.testing.assert_array_equal(np.asarray(idx_s)[1], np.asarray(idx_b)[1])
    np.testing.assert_allclose(np.asarray(d2_s)[1], np.asarray(d2_b)[1],
                               atol=1e-3)


def test_remat_iters_exact_forward_and_grad():
    """ICPConfig.remat_iters (jax.checkpoint on the unrolled scan body) is a
    memory/speed layout knob only: pose AND weight-gradient must be
    bit-identical to the default unrolled solve."""
    src, tgt = make_scene(seed=5)
    T_init = perturb(2, seed=6)
    w0 = jnp.ones(src.shape[:2], jnp.float32) * 0.7

    def run(remat):
        cfg = ICPConfig(icp_type="pt2pl", max_iterations=8,
                        differentiable=True, remat_iters=remat)

        def loss(w):
            T = icp(src, tgt, T_init, weight=w, cfg=cfg)["T"]
            th, r = planar_xi_first_order(T)
            return jnp.sum(jnp.abs(th)) + jnp.sum(jnp.linalg.norm(r, axis=-1))

        return jax.value_and_grad(loss)(w0)

    (l0, g0), (l1, g1) = run(False), run(True)
    # checkpoint changes XLA's fusion/residual choices, so values can drift
    # at rounding level — assert tight closeness, not bit equality
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-7)


def test_max_step_trust_region():
    """max_step_m: (a) inactive on a healthy solve (identical result),
    (b) bounds every iteration's translation when active."""
    src, tgt = make_scene(seed=7)
    T_init = perturb(2, seed=8)
    base = ICPConfig(icp_type="pt2pt", max_iterations=20, differentiable=True)
    out0 = icp(src, tgt, T_init, cfg=base)
    out1 = icp(src, tgt, T_init,
               cfg=dataclasses.replace(base, max_step_m=100.0))
    np.testing.assert_array_equal(np.asarray(out0["T"]), np.asarray(out1["T"]))

    # a pathological system: 3 nearly-colinear active points far from the
    # scan → huge unconstrained GN step without the clamp
    rng = np.random.default_rng(0)
    B, N, M = 1, 64, 64
    s = np.zeros((B, N, 3), np.float32)
    s[..., 0] = np.linspace(0, 0.5, N)  # tight colinear cluster
    s[..., 1] = rng.normal(0, 1e-4, (B, N))
    t = np.full((B, M, 3), TARGET_PAD_VAL, np.float32)
    t[:, :3, 0] = [4.0, 4.2, 4.4]  # few in-trim targets, colinear
    t[:, :3, 1] = 0.0
    t[:, :3, 2] = 0.0
    cfg = ICPConfig(icp_type="pt2pt", max_iterations=1, differentiable=True,
                    max_step_m=0.5)
    out = icp(jnp.asarray(s), jnp.asarray(t), jnp.eye(4)[None], cfg=cfg)
    step = np.linalg.norm(np.asarray(out["T"])[0, :3, 3])
    assert step <= 0.5 + 1e-5, step


def test_max_step_grad_finite_on_dead_item():
    """Regression: an item with ZERO in-trim points (delta == 0 from step
    one) must not NaN the clamp's backward — t² underflows f32 at delta=0
    and the naive min(1, max/‖t‖) formulation produced 0·inf there."""
    B, N, M = 2, 32, 64
    src = np.zeros((B, N, 3), np.float32)
    src[..., 0] = np.linspace(1, 3, N)
    tgt = np.full((B, M, 6), TARGET_PAD_VAL, np.float32)
    # item 0: map 100 m away (nothing in trim); item 1: healthy overlap
    tgt[0, :20, 0] = np.linspace(100, 102, 20)
    tgt[1, :20, 0] = np.linspace(1, 3, 20)
    tgt[:, :20, 1:3] = 0.0
    tgt[:, :20, 3:6] = np.asarray([0.0, 1.0, 0.0])
    w0 = jnp.ones((B, N), jnp.float32) * 0.8
    cfg = ICPConfig(icp_type="pt2pl", max_iterations=3, differentiable=True,
                    max_step_m=2.0)

    def loss(w):
        T = icp(jnp.asarray(src), jnp.asarray(tgt), jnp.eye(4)[None].repeat(B, 0),
                weight=w, cfg=cfg)["T"]
        th, r = planar_xi_first_order(T)
        # sum(abs), not sum(norm): the dead item's pose stays exactly at
        # identity and norm's VJP is 0/0 at r == 0 (a loss-side property,
        # not the solver's)
        return jnp.sum(jnp.abs(th)) + jnp.sum(jnp.abs(r))

    g = jax.grad(loss)(w0)
    assert bool(jnp.isfinite(g).all())


def test_sensitivity_knobs_and_overrides():
    """The assumption-sensitivity knobs (VERDICT r4 #6) exist, default to
    reference semantics, and plumb through ModelConfig.icp_overrides."""
    import dataclasses

    from mm_masking_tpu.config import Config, ModelConfig
    from mm_masking_tpu.models import LearnICPWeightPolicy

    cfg = ICPConfig()
    assert cfg.robust_on == "residual" and cfg.stop_metric == "norm6"

    # overrides reach BOTH solver configs through the policy ctor
    c = Config(model=ModelConfig(
        enc_channels=(4, 8), cart_pixel_width=64, cart_resolution=0.5,
        res=0.25, polar_shape=(64, 256),
        icp_overrides=("robust_on=distance", "damping_rel=0.0",
                       "stop_metric=maxabs")))
    pol = LearnICPWeightPolicy(c)
    for icfg in (pol._icp_train, pol._icp_inference):
        assert icfg.robust_on == "distance"
        assert icfg.damping_rel == 0.0
        assert icfg.stop_metric == "maxabs"
    # typos fail loudly instead of silently no-op'ing
    import pytest as _pytest
    with _pytest.raises(AttributeError):
        LearnICPWeightPolicy(Config(model=dataclasses.replace(
            c.model, icp_overrides=("no_such_field=1",))))

    # robust_on=distance changes the pt2pl solution; stop_metric only
    # affects the while-loop stopping, not a fixed-iteration solve
    src, mp = make_scene(seed=3)
    T0 = perturb(src.shape[0], pos=0.4, rot=0.1)
    base = ICPConfig(icp_type="pt2pl", max_iterations=10,
                     differentiable=True)
    Ta = np.asarray(icp(src, mp, T0, cfg=base)["T"])
    Tb = np.asarray(icp(src, mp, T0, cfg=dataclasses.replace(
        base, robust_on="distance"))["T"])
    Tc = np.asarray(icp(src, mp, T0, cfg=dataclasses.replace(
        base, stop_metric="maxabs"))["T"])
    assert np.abs(Ta - Tb).max() > 0  # different robust weights, diff pose
    np.testing.assert_array_equal(Ta, Tc)  # unrolled: stop metric unused
