"""Raw lidar ingestion (`lidar.velodyne_converter` + `lidar.preprocessing`,
lidar_config.yaml:81-117): FOV limit, crop, voxel, scaled-polar normals,
two-stage planarity filtering."""
import numpy as np
import jax.numpy as jnp

from mm_masking_tpu.ops.lidar import (
    LidarPreprocessConfig,
    lidar_frame_to_map_cloud,
    lidar_preprocess,
    velodyne_convert,
)


def make_room(seed=0, n_wall=3000, n_floor=1500, n_noise=120):
    """Box room: 4 vertical walls (planar, horizontal normals) + floor +
    isolated noise. Sensor at origin, 1.5 m above the floor."""
    rng = np.random.default_rng(seed)
    pts = []
    for axis, sign in ((0, 1), (0, -1), (1, 1), (1, -1)):
        p = np.zeros((n_wall // 4, 3))
        p[:, axis] = sign * 10.0
        p[:, 1 - axis] = rng.uniform(-10, 10, n_wall // 4)
        p[:, 2] = rng.uniform(-1.5, 2.5, n_wall // 4)
        pts.append(p)
    floor = np.zeros((n_floor, 3))
    floor[:, 0] = rng.uniform(-10, 10, n_floor)
    floor[:, 1] = rng.uniform(-10, 10, n_floor)
    floor[:, 2] = -1.5
    pts.append(floor)
    noise = rng.uniform(-9, 9, (n_noise, 3))
    pts.append(noise)
    out = np.concatenate(pts).astype(np.float32)
    return out + rng.normal(0, 0.005, out.shape).astype(np.float32)


def test_velodyne_convert_fov_limit():
    pts = np.array(
        [[10.0, 0, 0], [0, 10.0, 0], [-10.0, 0, 0], [7.07, 7.07, 0]],
        np.float32,
    )
    out = velodyne_convert(jnp.asarray(pts), use_fov_limit=True,
                           fov_center=45.0, fov=92.0)
    v = np.asarray(out["valid"])
    # 45° ± 46°: keeps 0° (x-axis, boundary inside), 90° (y), 45°; drops 180°.
    assert v.tolist() == [True, True, False, True]
    assert (np.asarray(out["points"])[2] == 0).all()
    polar = np.asarray(out["polar"])
    np.testing.assert_allclose(polar[0, 0], 10.0, rtol=1e-6)
    np.testing.assert_allclose(polar[3, 2], np.pi / 4, atol=1e-5)


def test_preprocess_keeps_walls_drops_noise():
    room = make_room()
    cfg = LidarPreprocessConfig(
        crop_range=30.0, frame_voxel_size=0.4, num_sample1=1024,
        num_sample2=2048, min_norm_score1=0.9, max_voxels=8192,
    )
    out = lidar_preprocess(jnp.asarray(room), cfg)
    pts = np.asarray(out["points"])
    nrm = np.asarray(out["normals"])
    valid = np.asarray(out["valid"])
    assert valid.sum() > 500
    kept = pts[valid]
    kn = nrm[valid]
    # Surviving points lie on the walls/floor (|x|≈10, |y|≈10 or z≈-1.5).
    on_surface = (
        (np.abs(np.abs(kept[:, 0]) - 10.0) < 0.35)
        | (np.abs(np.abs(kept[:, 1]) - 10.0) < 0.35)
        | (np.abs(kept[:, 2] + 1.5) < 0.35)
    )
    assert on_surface.mean() > 0.95, on_surface.mean()
    # Normals are unit and oriented toward the sensor.
    norms = np.linalg.norm(kn, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    assert (np.sum(kn * kept, axis=-1) <= 1e-3).all()
    # Stage-1 (strict planarity) is a subset-sized, stricter selection.
    assert np.asarray(out["stage1_valid"]).sum() <= valid.sum()


def test_crop_range_drops_far_points():
    pts = np.array([[5.0, 0, 0], [80.0, 0, 0]], np.float32)
    pts = np.tile(pts, (50, 1))
    cfg = LidarPreprocessConfig(crop_range=20.0, frame_voxel_size=0.5,
                                num_sample1=64, num_sample2=64,
                                min_norm_score1=-1.0, min_norm_score2=-1.0,
                                min_normal_estimate_dist=0.0,
                                max_normal_estimate_angle=0.5,
                                max_voxels=256)
    out = lidar_preprocess(jnp.asarray(pts), cfg)
    kept = np.asarray(out["points"])[np.asarray(out["valid"])]
    assert (np.linalg.norm(kept, axis=-1) <= 20.0 + 1e-3).all()


def test_frame_to_map_cloud_shape():
    room = make_room(seed=3)
    cfg = LidarPreprocessConfig(num_sample1=512, num_sample2=1024,
                                frame_voxel_size=0.5, max_voxels=4096)
    cloud = lidar_frame_to_map_cloud(jnp.asarray(room), cfg)
    assert cloud.shape == (1024, 6)
    v = np.asarray(jnp.any(cloud[:, :3] != 0, axis=-1))
    assert v.sum() > 200
