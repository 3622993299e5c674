"""End-to-end self-contained data generation (`localization.datagen`):
synthetic world → teach odometry + map → repeat shards → the SAME
`ICPWeightDataset` that trains on converter output loads them.

This is the in-process replacement for the reference's entire gen_data half
(`/root/reference/gen_data/run_test.sh:7-24` odometry + localization with
`save_raw_point_cloud`, `radar_lidar_config.yaml:78`)."""
import json
import os.path as osp

import numpy as np
import pytest

from mm_masking_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from mm_masking_tpu.data.boreas import (
    get_inverse_tf,
    load_calib,
    read_traj_file_gt2,
    yawPitchRollToRot,
)
from mm_masking_tpu.localization.datagen import DatagenConfig, generate_pair

A, R = 64, 256
RES = 15.0 / R
MAP_SEQ, LOC_SEQ = "gen-map", "gen-loc"


def _pose(x, y, h):
    T = np.eye(4)
    T[:3, :3] = yawPitchRollToRot(h, 0, 0)
    T[:3, 3] = [x, y, 0.0]
    return T


def _write_csv(path, rows):
    with open(path, "w") as f:
        f.write("GPSTime,easting,northing,altitude,vel_e,vel_n,vel_u,"
                "roll,pitch,heading\n")
        for t_us, x, y, h in rows:
            f.write(f"{t_us/1e6:.6f},{x},{y},0.0,0,0,0,0.0,0.0,{h}\n")


def _write_raw_image(radar_dir, t_us, scan, rng):
    """Raw Navtech byte image with bright returns at the scan points."""
    fft = (0.05 * rng.random((A, R)) ** 2).astype(np.float32)
    rr = np.linalg.norm(scan[:, :2], axis=-1)
    aa = np.mod(np.arctan2(scan[:, 1], scan[:, 0]), 2 * np.pi)
    ai = np.clip((aa / (2 * np.pi / A)).astype(int), 0, A - 1)
    ri = np.clip((rr / RES).astype(int), 0, R - 2)
    fft[ai, ri] = 0.8
    img = np.zeros((A, 11 + R), np.uint8)
    ts = np.arange(A, dtype=np.int64) * 400 + t_us * 1000
    img[:, :8] = np.frombuffer(ts.tobytes(), np.uint8).reshape(A, 8)
    enc = (np.arange(A, dtype=np.float64) / A * 5600).astype(np.uint16)
    img[:, 8:10] = np.frombuffer(enc.tobytes(), np.uint8).reshape(A, 2)
    img[:, 11:] = np.clip(fft * 255, 0, 255).astype(np.uint8)
    radar_dir.mkdir(parents=True, exist_ok=True)
    np.save(radar_dir / f"{t_us}.npy", img)


@pytest.fixture(scope="module")
def gen_root(tmp_path_factory):
    rng = np.random.default_rng(11)
    root = tmp_path_factory.mktemp("datagen")

    # world: ring + walls (planar structure, pt2pt-friendly)
    n = 600
    world = np.zeros((n, 3), np.float32)
    r = rng.uniform(3, 11, n // 2)
    a = rng.uniform(0, 2 * np.pi, n // 2)
    world[: n // 2, 0] = r * np.cos(a)
    world[: n // 2, 1] = r * np.sin(a)
    t = rng.uniform(-8, 8, n - n // 2)
    world[n // 2:, 0] = t
    world[n // 2:, 1] = np.where(t > 0, 5.0, -6.0)

    teach_rows = [(1_000_000 + 250_000 * i, 0.5 * i, 0.0, 0.0)
                  for i in range(3)]
    loc_rows = [(2_000_000 + 250_000 * i, 0.1 + 0.3 * i, 0.05 * i, 0.02 * i)
                for i in range(4)]

    for seq, rows in ((MAP_SEQ, teach_rows), (LOC_SEQ, loc_rows)):
        d = root / "vtr_data" / seq
        (d / "applanix").mkdir(parents=True)
        (d / "calib").mkdir()
        np.savetxt(d / "calib" / "T_applanix_lidar.txt", np.eye(4))
        np.savetxt(d / "calib" / "T_radar_lidar.txt", np.eye(4))
        _write_csv(d / "applanix" / "radar_poses.csv", rows)
        _write_csv(d / "applanix" / "lidar_poses.csv", rows)

    def write_scans(d, rows, raw_images=False):
        d.mkdir(parents=True, exist_ok=True)
        scans = {}
        for t_us, x, y, h in rows:
            Ti = get_inverse_tf(_pose(x, y, h))
            s = (world @ Ti[:3, :3].T + Ti[:3, 3]).astype(np.float32)
            s += rng.normal(0, 0.01, s.shape).astype(np.float32)
            s[:, 2] = 0.0
            np.savez_compressed(d / f"frame_{t_us}.npz", filt_pc=s, raw_pc=s)
            scans[t_us] = s
            if raw_images:
                # the dataset's fft path; load_radar must decode it
                _write_raw_image(root / "vtr_data" / LOC_SEQ / "radar",
                                 t_us, s, rng)
        return scans

    write_scans(root / "scans_teach", teach_rows)
    loc_scans = write_scans(root / "scans_loc", loc_rows, raw_images=True)

    index = generate_pair(
        str(root), MAP_SEQ, LOC_SEQ,
        DatagenConfig(max_points=1024, max_map_pts=4096, voxel_size=0.3,
                      batch_size=4),
        map_scan_dir=str(root / "scans_teach"),
        loc_scan_dir=str(root / "scans_loc"),
    )
    return root, index, teach_rows, loc_rows, loc_scans


def test_shards_written_in_converter_schema(gen_root):
    root, index, teach_rows, loc_rows, _ = gen_root
    shard_dir = root / "vtr_results" / "radar" / MAP_SEQ / LOC_SEQ / "shards"
    assert json.load(open(shard_dir / "index.json")) == index
    assert len(index["frames"]) == len(loc_rows)
    teach_stamps = {r[0] for r in teach_rows}
    for name in index["frames"]:
        z = np.load(shard_dir / name)
        assert z["raw_pc"].shape == z["filt_pc"].shape
        assert z["raw_pc"].shape[1] == 3 and z["map_pc"].shape[1] == 6
        assert int(z["map_stamp"]) in teach_stamps  # dataset asserts this
        assert index["max_map"] >= z["map_pc"].shape[0] > 100


def test_shard_geometry_consistent_with_gt(gen_root):
    """map_pc (keyframe robot frame) → T_msr → T_gt must land on the scan:
    the exact chain `ICPWeightDataset._load_clouds` applies."""
    root, index, _, loc_rows, loc_scans = gen_root
    shard_dir = root / "vtr_results" / "radar" / MAP_SEQ / LOC_SEQ / "shards"
    gt_map_poses, gt_map_times = read_traj_file_gt2(
        str(root / "vtr_data" / MAP_SEQ / "applanix" / "radar_poses.csv"),
        dim=2)
    T_msr = load_calib(str(root / "vtr_data" / MAP_SEQ), "radar")

    t_us, x, y, h = loc_rows[0]
    z = np.load(shard_dir / f"frame_{t_us}.npz")
    T_gt = get_inverse_tf(_pose(x, y, h)) @ gt_map_poses[
        list(gt_map_times).index(int(z["map_stamp"]))]
    pts = z["map_pc"][:, :3] @ T_msr[:3, :3].T + T_msr[:3, 3]
    pts = pts @ T_gt[:3, :3].T + T_gt[:3, 3]

    scan = loc_scans[t_us]
    d = np.linalg.norm(scan[:, None, :2] - pts[None, :, :2], axis=-1)
    nn = d.min(axis=1)
    # odometry drift + voxel quantization bound the alignment, not break it
    assert np.median(nn) < 0.25, float(np.median(nn))


def test_dataset_trains_from_datagen_output(gen_root):
    root, index, _, loc_rows, _ = gen_root
    from mm_masking_tpu.data import ICPWeightDataset, epoch_batches

    cfg = Config(
        model=ModelConfig(
            enc_channels=(4, 8), dropout=0.0, res=RES, polar_shape=(A, R),
            cart_pixel_width=64, cart_resolution=2 * 15.0 / 64,
            max_iter=3, inference_max_iter=8,
        ),
        data=DataConfig(
            map_sensor="radar", loc_sensor="radar", data_dir=str(root),
            pos_std=0.3, rot_std=0.1, max_loc_pts=1024, max_map_pts=4096,
        ),
        train=TrainConfig(batch_size_train=2, batch_size_test=2),
    )
    ds = ICPWeightDataset([(MAP_SEQ, LOC_SEQ)], cfg, "train")
    assert len(ds) == len(loc_rows)
    item = ds[0]
    # pad sizes come from the generated index (metadata.csv equivalent)
    assert item["loc_data"]["raw_pc"].shape == (index["max_loc"], 3)
    assert item["map_data"]["pc"].shape == (index["max_map"], 6)
    assert np.isfinite(item["transforms"]["T_ml_gt"]).all()
    batches = list(epoch_batches(ds, 2, cfg, shuffle=False))
    assert batches and np.isfinite(
        np.asarray(batches[0]["loc_data"]["fft_data"])).all()


def test_radar_lidar_datagen(tmp_path):
    """The flagship reference configuration: lidar teach map + radar
    repeats → radar_lidar shards; the dataset's radar_lidar filter chain
    (elevation + z-normal gates, `icp_weight_dataset.py:402-423`) keeps the
    wall structure and drops the ground plane."""
    from mm_masking_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from mm_masking_tpu.data import ICPWeightDataset
    from mm_masking_tpu.dicp import TARGET_PAD_VAL

    rng = np.random.default_rng(3)
    root = tmp_path
    # 3D world: low walls (vertical faces, z in [0, 0.4]) + ground plane
    nw, ng = 500, 300
    t = rng.uniform(-8, 8, nw)
    walls = np.zeros((nw, 3), np.float32)
    walls[:, 0] = t
    walls[:, 1] = np.where(t > 0, 5.0, -6.0)
    walls[:, 2] = rng.uniform(0.0, 0.4, nw)
    ground = np.zeros((ng, 3), np.float32)
    ground[:, 0] = rng.uniform(-8, 8, ng)
    ground[:, 1] = rng.uniform(-6, 5, ng)
    world3d = np.concatenate([walls, ground])

    teach_rows = [(1_000_000 + 250_000 * i, 0.4 * i, 0.0, 0.0)
                  for i in range(3)]
    loc_rows = [(2_000_000 + 250_000 * i, 0.2 + 0.2 * i, 0.05 * i, 0.01 * i)
                for i in range(3)]
    for seq, rows in ((MAP_SEQ, teach_rows), (LOC_SEQ, loc_rows)):
        d = root / "vtr_data" / seq
        (d / "applanix").mkdir(parents=True)
        (d / "calib").mkdir()
        np.savetxt(d / "calib" / "T_applanix_lidar.txt", np.eye(4))
        np.savetxt(d / "calib" / "T_radar_lidar.txt", np.eye(4))
        _write_csv(d / "applanix" / "lidar_poses.csv", rows)
        _write_csv(d / "applanix" / "radar_poses.csv", rows)

    # teach lidar frames: Boreas-style float32 (N, 6) .bin dumps
    ldir = root / "vtr_data" / MAP_SEQ / "lidar"
    ldir.mkdir()
    for t_us, x, y, h in teach_rows:
        Ti = get_inverse_tf(_pose(x, y, h))
        s = (world3d @ Ti[:3, :3].T + Ti[:3, 3]).astype(np.float32)
        s += rng.normal(0, 0.01, s.shape).astype(np.float32)
        np.concatenate([s, np.zeros_like(s)], axis=1).astype(
            np.float32).tofile(ldir / f"{t_us}.bin")

    # repeat radar: planar wall footprints as pre-extracted cloud shards +
    # raw Navtech images for the dataset's fft path
    rdir = root / "scans_loc"
    rdir.mkdir()
    for t_us, x, y, h in loc_rows:
        Ti = get_inverse_tf(_pose(x, y, h))
        w2 = walls.copy()
        w2[:, 2] = 0.0
        s = (w2 @ Ti[:3, :3].T + Ti[:3, 3]).astype(np.float32)
        s += rng.normal(0, 0.01, s.shape).astype(np.float32)
        s[:, 2] = 0.0
        np.savez_compressed(rdir / f"frame_{t_us}.npz", filt_pc=s, raw_pc=s)
        _write_raw_image(root / "vtr_data" / LOC_SEQ / "radar", t_us, s, rng)

    index = generate_pair(
        str(root), MAP_SEQ, LOC_SEQ,
        DatagenConfig(map_sensor="lidar", loc_sensor="radar",
                      max_points=1024, max_map_pts=4096, voxel_size=0.3,
                      batch_size=4),
        loc_scan_dir=str(rdir),
    )
    assert len(index["frames"]) == len(loc_rows)
    shard_dir = (root / "vtr_results" / "radar_lidar" / MAP_SEQ / LOC_SEQ
                 / "shards")
    z = np.load(shard_dir / index["frames"][0])
    assert z["map_pc"].shape[1] == 6

    cfg = Config(
        model=ModelConfig(
            enc_channels=(4, 8), dropout=0.0, res=RES, polar_shape=(A, R),
            cart_pixel_width=64, cart_resolution=2 * 15.0 / 64,
            max_iter=3, inference_max_iter=8,
        ),
        data=DataConfig(
            map_sensor="lidar", loc_sensor="radar", data_dir=str(root),
            pos_std=0.3, rot_std=0.1, max_loc_pts=1024, max_map_pts=4096,
        ),
        train=TrainConfig(batch_size_train=2, batch_size_test=2),
    )
    ds = ICPWeightDataset([(MAP_SEQ, LOC_SEQ)], cfg, "train")
    item = ds[0]
    mp = np.asarray(item["map_data"]["pc"])
    real = np.abs(mp[:, 0]) < TARGET_PAD_VAL / 2
    # the elevation/z-normal chain keeps a usable wall map
    assert real.sum() > 50, int(real.sum())
    # surviving normals are horizontal (walls), not ground
    assert np.abs(mp[real, 5]).max() <= 0.9 + 1e-6
