"""End-to-end drive of the composed CLI driver
(`python -m mm_masking_tpu.localization`): teach over converter shards →
map.npz, localize a repeat sequence → trajectory + GT stats. This is the
in-process equivalent of `run_test.sh odometry` → `run_test.sh localization`
→ `run_eval.sh` (`/root/reference/gen_data/run_test.sh:7-24`)."""
import json

import numpy as np
import pytest

from mm_masking_tpu.localization.__main__ import main


def _planar_T(x, y, h):
    T = np.eye(4)
    T[:2, :2] = [[np.cos(h), -np.sin(h)], [np.sin(h), np.cos(h)]]
    T[:2, 3] = [x, y]
    return T


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(21)
    n = 800
    pts = np.zeros((n, 3), np.float32)
    # ring + two walls: enough planar structure for pt2pl
    r = rng.uniform(4, 12, n // 2)
    a = rng.uniform(0, 2 * np.pi, n // 2)
    pts[: n // 2, 0] = r * np.cos(a)
    pts[: n // 2, 1] = r * np.sin(a)
    t = rng.uniform(-8, 8, n - n // 2)
    pts[n // 2 :, 0] = t
    pts[n // 2 :, 1] = np.where(t > 0, 6.0, -7.0)
    return pts


def _write_shards(d, world, poses, stamps, rng):
    d.mkdir(parents=True, exist_ok=True)
    for T_wr, st in zip(poses, stamps):
        Ti = np.linalg.inv(T_wr)
        s = (world @ Ti[:3, :3].T + Ti[:3, 3]).astype(np.float32)
        s += rng.normal(0, 0.01, s.shape).astype(np.float32)
        np.savez_compressed(d / f"frame_{st}.npz", filt_pc=s, raw_pc=s)


def test_cli_teach_then_localize_with_gt(tmp_path, world):
    rng = np.random.default_rng(5)
    teach_dir = tmp_path / "teach"
    rep_dir = tmp_path / "repeat"

    teach_stamps = [1_000_000 + 100_000 * i for i in range(3)]
    _write_shards(teach_dir, world, [np.eye(4)] * 3, teach_stamps, rng)

    reps = [(0.3 * i, 0.05 * i, 0.03 * i) for i in range(4)]
    rep_poses = [_planar_T(*r) for r in reps]
    rep_stamps = [2_000_000 + 100_000 * i for i in range(4)]
    _write_shards(rep_dir, world, rep_poses, rep_stamps, rng)

    map_npz = str(tmp_path / "map.npz")
    rc = main(["teach", "--scans", str(teach_dir), "--out-map", map_npz,
               "--out-traj", str(tmp_path / "odo.txt"),
               "--interp-period-us", "50000",
               "--max-points", "1024", "--max-map-pts", "2048"])
    assert rc == 0
    m = np.load(map_npz)["map_pc"]
    assert m.shape[-1] == 6  # normals present
    # GP-interpolated continuous-time trajectory: 200 ms span @ 50 ms → 5
    # poses, timestamps within the processed span, valid rigid transforms.
    interp_rows = open(tmp_path / "odo_interp.txt").read().splitlines()
    assert len(interp_rows) == 5
    first = np.asarray([float(v) for v in interp_rows[0].split()])
    assert int(first[0]) == teach_stamps[0]
    R = first[1:].reshape(3, 4)[:, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

    # GT CSVs: map sensor sits at the ENU origin; repeat poses are the GT.
    def write_csv(path, rows):
        with open(path, "w") as f:
            f.write("GPSTime,easting,northing,altitude,ve,vn,vu,"
                    "roll,pitch,heading\n")
            for t_us, x, y, h in rows:
                f.write(f"{t_us/1e6:.6f},{x},{y},0,0,0,0,0,0,{h}\n")

    map_csv = str(tmp_path / "map_gt.csv")
    loc_csv = str(tmp_path / "loc_gt.csv")
    write_csv(map_csv, [(1_000_000, 0.0, 0.0, 0.0)])
    write_csv(loc_csv, [(t, x, y, h)
                        for t, (x, y, h) in zip(rep_stamps, reps)])

    traj = str(tmp_path / "traj.txt")
    stats_json = str(tmp_path / "stats.json")
    rc = main(["localize", "--scans", str(rep_dir), "--map", map_npz,
               "--out-traj", traj, "--map-gt", map_csv, "--loc-gt", loc_csv,
               "--stats", stats_json, "--max-points", "1024",
               "--batch-size", "2",
               # synthetic world is strictly planar: every estimated normal
               # is ±z, so use pt2pt and disable the z-normal gate (the
               # same setup the in-process test uses)
               "--icp-type", "pt2pt", "--normal-threshold", "1.0"])
    assert rc == 0
    stats = json.load(open(stats_json))
    assert stats["n_frames"] == 4
    # Poses start within 0.45 m of the map; 50-iter pt2pl must land well
    # under the 5 cm / map-noise scale.
    assert stats["trans_rmse"] < 0.08, stats
    assert stats["rot_rmse"] < 0.02, stats


def test_cli_refuses_map_without_normals(tmp_path, world):
    rng = np.random.default_rng(6)
    rep = tmp_path / "rep"
    _write_shards(rep, world, [np.eye(4)], [1], rng)
    bad_map = str(tmp_path / "bad.npz")
    np.savez_compressed(bad_map, map_pc=world)  # (N, 3): no normals
    with pytest.raises(SystemExit, match="normals"):
        main(["localize", "--scans", str(rep), "--map", bad_map,
              "--out-traj", str(tmp_path / "t.txt")])


def _write_raw_scans(d, world, poses, stamps, A=64, R=512, res=15.0 / 512):
    """Raw Navtech .npy images (load_radar layout: int64 stamp bytes 0-7,
    uint16 encoder bytes 8-9, power cols 11+) rendered from world points."""
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(3)
    for T_wr, st in zip(poses, stamps):
        Ti = np.linalg.inv(T_wr)
        s = world @ Ti[:3, :3].T + Ti[:3, 3]
        rr = np.hypot(s[:, 0], s[:, 1])
        aa = np.mod(np.arctan2(s[:, 1], s[:, 0]), 2 * np.pi)
        keep = (rr > 2.0) & (rr < (R - 4) * res)
        ai = np.clip((aa[keep] / (2 * np.pi / A)).astype(int), 0, A - 1)
        ri = np.clip((rr[keep] / res).astype(int), 0, R - 3)
        fft = (0.03 * rng.random((A, R))).astype(np.float32)
        for dd in range(2):
            fft[ai, ri + dd] = np.maximum(fft[ai, ri + dd], 0.85 - 0.2 * dd)
        img = np.zeros((A, 11 + R), np.uint8)
        ts = (np.arange(A, dtype=np.int64) * 400)
        img[:, :8] = np.frombuffer(ts.tobytes(), np.uint8).reshape(A, 8)
        enc = (np.arange(A, dtype=np.float64) / A * 5600).astype(np.uint16)
        img[:, 8:10] = np.frombuffer(enc.tobytes(), np.uint8).reshape(A, 2)
        img[:, 11:] = np.clip(fft * 255, 0, 255).astype(np.uint8)
        np.save(d / f"{st}.npy", img)


def test_cli_localize_with_learned_mask_checkpoint(tmp_path, world):
    """--checkpoint drives the learned-mask-in-the-loop path end to end:
    Trainer-format orbax checkpoint + config.json → policy rebuild → mask
    inference inside the fused localization program (the deployment-fork
    flow; SURVEY.md §2.3 LibTorch row)."""
    import dataclasses

    import jax

    from mm_masking_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from mm_masking_tpu.train.checkpoint import save_checkpoint
    from mm_masking_tpu.train.trainer import Trainer

    A, R, res = 64, 512, 15.0 / 512
    raw_dir = tmp_path / "raw"
    reps = [(0.2 * i, 0.04 * i, 0.02 * i) for i in range(4)]
    stamps = [3_000_000 + 100_000 * i for i in range(4)]
    _write_raw_scans(raw_dir, world, [_planar_T(*r) for r in reps], stamps,
                     A=A, R=R, res=res)
    map_npz = str(tmp_path / "map.npz")
    np.savez_compressed(map_npz, map_pc=world.astype(np.float32))

    ck = tmp_path / "run"
    cfg = Config(
        model=ModelConfig(enc_channels=(4, 8), dropout=0.0, res=res,
                          polar_shape=(A, R), cart_pixel_width=64,
                          cart_resolution=0.5),
        data=DataConfig(max_loc_pts=256, max_map_pts=1024),
        train=TrainConfig(checkpoint_dir=str(ck), num_devices=1),
    )
    trainer = Trainer(cfg)
    save_checkpoint(str(ck), "best_policy", trainer.init_state())
    with open(ck / "config.json", "w") as f:
        json.dump(dataclasses.asdict(cfg), f)

    traj = str(tmp_path / "traj_mask.txt")
    rc = main(["localize", "--scans", str(raw_dir), "--map", map_npz,
               "--out-traj", traj, "--checkpoint", str(ck),
               "--max-points", "256", "--batch-size", "2",
               "--icp-type", "pt2pt", "--normal-threshold", "1.0",
               "--det", "width=21", "--det", "guard=2", "--det", "maxr=15.0"])
    assert rc == 0
    rows = open(traj).read().splitlines()
    assert len(rows) == 4
    first = np.asarray([float(v) for v in rows[0].split()])
    Rm = first[1:].reshape(3, 4)[:, :3]
    np.testing.assert_allclose(Rm @ Rm.T, np.eye(3), atol=1e-4)

    # a shard directory must be refused (mask needs the raw image)
    shard_dir = tmp_path / "shards"
    _write_shards(shard_dir, world, [_planar_T(*r) for r in reps], stamps,
                  np.random.default_rng(0))
    with pytest.raises(SystemExit):
        main(["localize", "--scans", str(shard_dir), "--map", map_npz,
              "--out-traj", traj, "--checkpoint", str(ck)])


def test_cli_localize_init_gt_warm_start(tmp_path, world):
    """--init-gt warm-starts each frame from its (perturbed) GT pose — the
    repeat pass's pose-graph prior against a global map. With a far-from-
    origin repeat (beyond trim_dist) identity inits cannot converge, the GT
    prior must."""
    rng = np.random.default_rng(9)
    rep_dir = tmp_path / "repeat"
    # poses ~12 m from the origin: far outside the 5 m pairing distance
    reps = [(12.0 + 0.3 * i, 3.0 - 0.2 * i, 0.05 * i) for i in range(4)]
    rep_poses = [_planar_T(*r) for r in reps]
    stamps = [5_000_000 + 100_000 * i for i in range(4)]
    _write_shards(rep_dir, world, rep_poses, stamps, rng)
    map_npz = str(tmp_path / "map.npz")
    np.savez_compressed(map_npz, map_pc=world.astype(np.float32))

    loc_csv = str(tmp_path / "loc_gt.csv")
    with open(loc_csv, "w") as f:
        f.write("GPSTime,easting,northing,altitude,ve,vn,vu,"
                "roll,pitch,heading\n")
        for t_us, (x, y, h) in zip(stamps, reps):
            f.write(f"{t_us/1e6:.6f},{x},{y},0,0,0,0,0,0,{h}\n")
    map_csv = str(tmp_path / "map_gt.csv")
    with open(map_csv, "w") as f:
        f.write("GPSTime,easting,northing,altitude,ve,vn,vu,"
                "roll,pitch,heading\n0.000001,0,0,0,0,0,0,0,0,0\n")

    traj = str(tmp_path / "traj.txt")
    stats_json = str(tmp_path / "stats.json")
    rc = main(["localize", "--scans", str(rep_dir), "--map", map_npz,
               "--out-traj", traj, "--map-gt", map_csv, "--loc-gt", loc_csv,
               "--stats", stats_json, "--init-gt", "--init-pos-std", "0.3",
               "--init-rot-std", "0.05", "--max-points", "1024",
               "--batch-size", "2", "--icp-type", "pt2pt",
               "--normal-threshold", "1.0"])
    assert rc == 0
    stats = json.load(open(stats_json))
    assert stats["n_frames"] == 4
    # the GT-prior warm start must let ICP converge from 12+ m away
    assert stats["trans_rmse"] < 0.15, stats

    # --init-gt without --loc-gt is refused
    with pytest.raises(SystemExit):
        main(["localize", "--scans", str(rep_dir), "--map", map_npz,
              "--out-traj", traj, "--init-gt"])


def test_cli_teach_from_lidar_bins(tmp_path, world):
    """The flagship radar_lidar teach sensor is LIDAR: `teach` must consume
    Boreas .bin frames ((N, 6) float32) directly, like datagen does."""
    ldir = tmp_path / "lidar"
    ldir.mkdir()
    rng = np.random.default_rng(1)
    for st in (1_000_000, 1_100_000, 1_200_000):
        s = world + rng.normal(0, 0.01, world.shape).astype(np.float32)
        np.concatenate([s, np.zeros_like(s)], 1).astype(np.float32).tofile(
            ldir / f"{st}.bin")
    map_npz = str(tmp_path / "map.npz")
    rc = main(["teach", "--scans", str(ldir), "--out-map", map_npz,
               "--max-points", "1024", "--max-map-pts", "2048"])
    assert rc == 0
    m = np.load(map_npz)["map_pc"]
    assert m.shape[-1] == 6
    # the map must actually cover the world (teach consumed the bins)
    real = m[(np.abs(m[:, :3]) < 900).all(-1)][:, :2]
    d = np.sqrt(((world[::10, None, :2] - real[None]) ** 2).sum(-1)).min(1)
    assert np.median(d) < 0.5, np.median(d)


def test_cli_localize_init_chain_tracking(tmp_path, world):
    """--init-chain tracks a repeat that walks away from the origin with NO
    external prior: constant-velocity warm starts from previous solutions.
    One-shot identity inits cannot follow (later frames start > trim_dist
    from their basin); the chain must."""
    rng = np.random.default_rng(13)
    rep_dir = tmp_path / "repeat"
    reps = [(1.5 * i, 0.1 * i, 0.02 * i) for i in range(7)]  # out to 10.5 m
    rep_poses = [_planar_T(*r) for r in reps]
    stamps = [7_000_000 + 100_000 * i for i in range(7)]
    _write_shards(rep_dir, world, rep_poses, stamps, rng)
    map_npz = str(tmp_path / "map.npz")
    np.savez_compressed(map_npz, map_pc=world.astype(np.float32))

    traj = str(tmp_path / "traj.txt")
    rc = main(["localize", "--scans", str(rep_dir), "--map", map_npz,
               "--out-traj", traj, "--init-chain", "--max-points", "1024",
               "--batch-size", "2", "--icp-type", "pt2pt",
               "--normal-threshold", "1.0"])
    assert rc == 0
    rows = [np.asarray([float(v) for v in r.split()])
            for r in open(traj).read().splitlines()]
    assert len(rows) == 7
    # rows carry T_loc_map: position of the map origin in the loc frame =
    # -R^T t of the pose, so recover each pose and check against GT
    errs = []
    for row, T_gt in zip(rows, rep_poses):
        M = row[1:].reshape(3, 4)
        R, t = M[:, :3], M[:, 3]
        pos = -R.T @ t  # sensor position in the map frame
        errs.append(np.linalg.norm(pos[:2] - T_gt[:2, 3]))
    errs = np.asarray(errs)
    assert errs[-1] < 0.2, errs  # tracked to the end (10.5 m from origin)
    assert np.median(errs) < 0.15, errs


def test_load_radar_frames_epoch_times_survive_f32(tmp_path):
    """Real Navtech stamps are epoch time (~1.7e18 ns), far beyond f32's ulp
    (~137 s there): the loader must re-reference per scan BEFORE the f32
    cast or the whole 0.25 s sweep quantizes to one value (regression for
    the motion_undistort/ct_icp timing path)."""
    from mm_masking_tpu.localization.__main__ import _load_radar_frames

    A, R = 16, 64
    base_us = 1_700_000_000_000_000  # ~2023 epoch in microseconds
    img = np.zeros((A, 11 + R), np.uint8)
    ts = base_us + np.arange(A, dtype=np.int64) * 250  # 250 us per azimuth
    img[:, :8] = np.frombuffer(ts.tobytes(), np.uint8).reshape(A, 8)
    enc = (np.arange(A, dtype=np.float64) / A * 5600).astype(np.uint16)
    img[:, 8:10] = np.frombuffer(enc.tobytes(), np.uint8).reshape(A, 2)
    p = tmp_path / f"{base_us}.npy"
    np.save(p, img)

    frames = _load_radar_frames([str(p)])
    azt = frames["az_times"][0]
    # per-azimuth deltas must survive exactly (250 us = 250_000 ns steps)
    np.testing.assert_allclose(np.diff(azt), 250_000.0, rtol=0, atol=0.5)
    assert azt[0] == 0.0


def test_load_radar_frames_normalizes_fft_scale(tmp_path):
    """The u8-on-the-wire decoder keeps the FFT plane uint8 for the
    dataset path (device-side /255); THIS loader's consumers (detectors
    with [0,1]-scale thresholds, mask_for_scan) need the normalized plane.
    Round-5 regression: un-normalized 0-255 power made CFAR fire on
    essentially every bin and the fixed-size extraction filled its whole
    budget from the first few azimuths — datagen emitted garbage clouds
    for every repeat sequence."""
    import jax.numpy as jnp

    from mm_masking_tpu.localization import LocalizationConfig
    from mm_masking_tpu.localization.__main__ import (
        _extract_clouds,
        _load_radar_frames,
    )

    A, R = 64, 256
    rng = np.random.default_rng(0)
    img = np.zeros((A, 11 + R), np.uint8)
    ts = np.arange(A, dtype=np.int64) * 400
    img[:, :8] = np.frombuffer(ts.tobytes(), np.uint8).reshape(A, 8)
    enc = (np.arange(A, dtype=np.float64) / A * 5600).astype(np.uint16)
    img[:, 8:10] = np.frombuffer(enc.tobytes(), np.uint8).reshape(A, 2)
    fft = 0.05 * rng.random((A, R)) ** 2  # noise floor
    # one bright wall return per azimuth at varying range
    ri = (R // 4 + (np.arange(A) * 3) % (R // 2)).astype(int)
    fft[np.arange(A), ri] = 0.9
    img[:, 11:] = np.clip(fft * 255, 0, 255).astype(np.uint8)
    p = tmp_path / "1000000.npy"
    np.save(p, img)

    frames = _load_radar_frames([str(p)])
    # scale contract: normalized [0, 1] power
    assert float(np.max(frames["fft"])) <= 1.0
    assert 0.85 <= float(np.max(frames["fft"]))  # the wall returns

    cfg = LocalizationConfig(detector="modified_cacfar", max_points=256,
                             radar_resolution=0.1)
    clouds = np.asarray(_extract_clouds(frames, cfg, 1))[0]
    valid = (clouds[:, 0] != 0) | (clouds[:, 1] != 0)
    pts = clouds[valid]
    # detections are SPARSE (≈ one peak per azimuth, nothing near the cap)
    assert 0 < valid.sum() <= 3 * A, int(valid.sum())
    # and they span the full sweep, not a leading wedge
    ang = np.mod(np.arctan2(pts[:, 1], pts[:, 0]), 2 * np.pi)
    assert float(ang.max()) - float(ang.min()) > 4.0, (ang.min(), ang.max())
