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
