"""Teach-pass odometry: trajectory recovery + map growth on synthetic motion."""
import numpy as np
import jax.numpy as jnp

from mm_masking_tpu.geom import se3_exp, transform_points, se3_inv
from mm_masking_tpu.localization.odometry import OdometryConfig, TeachPass


def make_world(seed=0, n=400):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 3), np.float32)
    r = rng.uniform(3, 25, n)
    a = rng.uniform(0, 2 * np.pi, n)
    pts[:, 0] = r * np.cos(a)
    pts[:, 1] = r * np.sin(a)
    return pts


def test_teach_pass_tracks_motion_and_builds_map():
    world = make_world()
    cfg = OdometryConfig(max_map_pts=1024, voxel_size=0.4, max_iterations=30)
    tp = TeachPass(cfg)

    # Robot path: small forward steps with slight yaw.
    poses = [np.eye(4)]
    for i in range(4):
        xi = jnp.asarray([0.4, 0.05, 0, 0, 0, 0.03])
        poses.append(np.asarray(se3_exp(xi) @ jnp.asarray(poses[-1])))
    # NB: pose convention: T_world_robot; scan = world points in robot frame.
    errs = []
    rng = np.random.default_rng(1)
    for i, T_wr in enumerate(poses):
        T_rw = np.asarray(se3_inv(jnp.asarray(T_wr)[None]))[0]
        scan = (world @ T_rw[:3, :3].T + T_rw[:3, 3]).astype(np.float32)
        scan += rng.normal(0, 0.01, scan.shape).astype(np.float32)
        keep = np.linalg.norm(scan[:, :2], axis=1) < 30
        scan = scan[keep][:256]
        scan = np.pad(scan, ((0, 256 - scan.shape[0]), (0, 0)))
        T_est = np.asarray(tp.process(jnp.asarray(scan)))
        err = np.linalg.norm((T_est @ np.linalg.inv(T_wr))[:2, 3])
        errs.append(err)

    assert max(errs[1:]) < 0.15, errs
    assert tp.n_keyframes >= 4  # thresholds 0 -> every frame keyframes
    # Map holds real points and pads at the sentinel.
    mp = np.asarray(tp.map_pts)
    real = mp[np.abs(mp[:, 0]) < 500]
    assert real.shape[0] > 100
    mwn = np.asarray(tp.map_with_normals())
    assert mwn.shape[-1] == 6


def test_teach_then_repeat_roundtrip():
    # Full T&R loop: TeachPass builds a world map from scans along a path;
    # the repeat pass localizes a perturbed scan against that map (pt2pl via
    # map_with_normals) — the data-generation parity story end to end.
    from mm_masking_tpu.dicp import ICPConfig, icp
    from mm_masking_tpu.geom import planar_xi_first_order

    world = make_world(seed=5, n=500)
    cfg = OdometryConfig(max_map_pts=2048, voxel_size=0.3, max_iterations=30)
    tp = TeachPass(cfg)

    rng = np.random.default_rng(7)
    poses = [np.eye(4)]
    for _ in range(3):
        poses.append(np.asarray(se3_exp(jnp.asarray([0.5, 0.0, 0, 0, 0, 0.02]))
                                @ jnp.asarray(poses[-1])))
    for T_wr in poses:
        T_rw = np.asarray(se3_inv(jnp.asarray(T_wr)[None]))[0]
        scan = (world @ T_rw[:3, :3].T + T_rw[:3, 3]).astype(np.float32)
        scan = scan[np.linalg.norm(scan[:, :2], axis=1) < 30][:256]
        scan = np.pad(scan, ((0, 256 - scan.shape[0]), (0, 0)))
        tp.process(jnp.asarray(scan))

    # Repeat pass: a new scan at a pose near the teach path, perturbed init.
    map_pc = tp.map_with_normals()  # (1, M, 6) world frame
    T_true = poses[2]
    T_rw = np.asarray(se3_inv(jnp.asarray(T_true)[None]))[0]
    scan = (world @ T_rw[:3, :3].T + T_rw[:3, 3]).astype(np.float32)
    scan = scan[np.linalg.norm(scan[:, :2], axis=1) < 30][:256]
    scan = np.pad(scan, ((0, 256 - scan.shape[0]), (0, 0)))

    # Localize scan (robot frame) against the world map: solve T_world_robot.
    # NB pt2pt, not pt2pl: on this planar scatter the PCA normals point ±z, so
    # point-to-plane residuals carry no planar constraint (real lidar maps have
    # walls; the synthetic world has none).
    T_init = jnp.asarray(T_true)[None] @ se3_exp(
        jnp.asarray([[0.2, -0.1, 0, 0, 0, 0.05]])
    )
    valid = ~((scan[:, 0] == 0) & (scan[:, 1] == 0))
    out = icp(jnp.asarray(scan)[None], map_pc, T_init,
              weight=jnp.asarray(valid[None], jnp.float32),
              cfg=ICPConfig(icp_type="pt2pt", max_iterations=40,
                            differentiable=False, tolerance=1e-8))
    D = np.asarray(out["T"])[0] @ np.linalg.inv(T_true)
    assert np.linalg.norm(D[:2, 3]) < 0.1, D[:2, 3]
    assert abs(D[1, 0]) < 0.02


def test_constant_velocity_prior_reduces_drift():
    """WNOA-style warm start (constant-velocity extrapolation) must track a
    fast constant-velocity path better than the constant-position warm start
    when the per-frame ICP budget is tight (`radar_config.yaml:160-188` is the
    capability bar)."""
    world = make_world(seed=9, n=700)

    def run(motion_prior):
        cfg = OdometryConfig(max_map_pts=2048, voxel_size=0.3,
                             max_iterations=4, motion_prior=motion_prior)
        tp = TeachPass(cfg)
        rng = np.random.default_rng(3)
        T = np.eye(4)
        errs = []
        for i in range(8):
            T_rw = np.asarray(se3_inv(jnp.asarray(T)[None]))[0]
            scan = (world @ T_rw[:3, :3].T + T_rw[:3, 3]).astype(np.float32)
            scan += rng.normal(0, 0.01, scan.shape).astype(np.float32)
            scan = scan[np.linalg.norm(scan[:, :2], axis=1) < 28][:256]
            scan = np.pad(scan, ((0, 256 - scan.shape[0]), (0, 0)))
            T_est = np.asarray(tp.process(jnp.asarray(scan)))
            errs.append(np.linalg.norm((T_est @ np.linalg.inv(T))[:2, 3]))
            # Fast constant-velocity motion: 1.2 m + 0.05 rad per frame — more
            # than a 4-iteration ICP recovers from a stale constant-position
            # warm start, easily absorbed with a velocity extrapolation.
            T = np.asarray(se3_exp(jnp.asarray([1.2, 0.06, 0, 0, 0, 0.05]))) @ T
        # Skip the bootstrap frames: the first registration has no velocity
        # history, so both priors start identically.
        return float(np.max(errs[2:])), tp

    cv_err, tp_cv = run("constant_velocity")
    cp_err, _ = run("constant_position")
    assert cv_err < 0.05, cv_err
    assert cv_err < 0.2 * cp_err, (cv_err, cp_err)
    # Velocity estimate reflects the body-frame step / dt.
    v = np.asarray(tp_cv.velocity_estimate(dt=1.0))
    assert 0.9 < np.linalg.norm(v) < 1.6, v


def test_pose_determinant_stays_orthonormal_over_long_runs():
    """Regression: f32 matmul round-off in the composed pose used to survive
    into the constant-velocity warm start T·(T_prev⁻¹·T), which SQUARES it
    every frame — log-det follows d_{k+1}=2d_k−d_{k-1}+ε and blows up
    quadratically-to-exponentially (measured det(R) 3.7 by frame 19 on the
    e2e corridor, scan scaled 3.7× → divergence → NaN). The odometry layer
    now re-orthonormalizes every registered pose."""
    from mm_masking_tpu.localization.odometry import orthonormalize_planar

    world = make_world(seed=5, n=600)
    cfg = OdometryConfig(max_map_pts=2048, voxel_size=0.3, max_iterations=30)
    tp = TeachPass(cfg)
    rng = np.random.default_rng(7)
    T = np.eye(4)
    errs, dets = [], []
    for i in range(20):
        T_rw = np.asarray(se3_inv(jnp.asarray(T)[None]))[0]
        scan = (world @ T_rw[:3, :3].T + T_rw[:3, 3]).astype(np.float32)
        scan += rng.normal(0, 0.01, scan.shape).astype(np.float32)
        scan = scan[np.linalg.norm(scan[:, :2], axis=1) < 28][:384]
        scan = np.pad(scan, ((0, 384 - scan.shape[0]), (0, 0)))
        T_est = np.asarray(tp.process(jnp.asarray(scan)))
        errs.append(np.linalg.norm((T_est @ np.linalg.inv(T))[:2, 3]))
        dets.append(np.linalg.det(T_est[:3, :3]))
        T = np.asarray(se3_exp(jnp.asarray([0.8, 0.04, 0, 0, 0, 0.04]))) @ T
    assert max(abs(d - 1.0) for d in dets) < 1e-5, dets
    assert max(errs[2:]) < 0.08, errs

    # unit behavior: a scaled planar rotation projects back to the exact angle
    th = 0.3
    c, s = np.cos(th), np.sin(th)
    Tm = np.eye(4, dtype=np.float32)
    Tm[:2, :2] = 1.01 * np.array([[c, -s], [s, c]], np.float32)
    out = np.asarray(orthonormalize_planar(jnp.asarray(Tm)[None]))[0]
    assert np.allclose(out[:2, :2], [[c, -s], [s, c]], atol=1e-6)
    assert np.isclose(np.linalg.det(out[:3, :3]), 1.0, atol=1e-6)
