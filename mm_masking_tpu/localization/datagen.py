"""Self-contained training-data generation: raw scans → teach map → shards.

The reference produces its training data with the full C++/ROS2 VTR stack:
`run_test.sh odometry` builds a teach map, `run_test.sh localization` replays
repeat sequences against it, and `save_raw_point_cloud`/vertex-test-zero
settings make every localization frame persist its raw/filtered/map clouds
into a rosbag2 pose graph (`/root/reference/gen_data/run_test.sh:7-24`,
`radar_lidar_config.yaml:74-78,203-204`, `README.md:144-152`), which
`icp_weight_dataset.py` then reads. This module is that entire half of the
reference collapsed into one in-process pass with zero ROS:

    teach scans ──detector──► clouds ──TeachPass odometry──► map (+normals)
    repeat scans ─detector──► raw/filt clouds ─closest teach keyframe──►
        frame_<t>.npz shards {raw_pc, filt_pc, map_pc, loc_stamp, map_stamp}
        + index.json — byte-compatible with `data/convert.py` output, i.e.
        directly trainable by `ICPWeightDataset`.

Deliberate simplifications vs VTR, documented for parity auditing:

- One global teach map expressed per-shard in the chosen keyframe's robot
  frame, instead of VTR's per-vertex sliding submaps — the dataset's own
  `filter_map` FOV gating (`icp_weight_dataset.py:402-423` semantics)
  restricts it to the local neighborhood at load time anyway.
- The closest teach keyframe is chosen by ground-truth position distance
  (the same information VTR's spatially-linked pose graph encodes via
  `get_closest_teach_vertex`).
- `filt_pc` equals `raw_pc`: the detector's fixed-size peak extraction
  already plays the role of VTR's preprocessing filter, and the dataset
  requires the two clouds row-aligned (`assert raw.shape == filt.shape`).
  The converter applies the same fallback for bags without a raw topic.
- Odometry drift enters the map exactly as it does in VTR (the map sits in
  estimated keyframe frames while T_gt comes from the GT CSVs); datagen is
  not a GT oracle, it reproduces the reference's label-noise model.
"""
from __future__ import annotations

import dataclasses
import json
import os
import os.path as osp

import jax.numpy as jnp
import numpy as np

from mm_masking_tpu.data.boreas import (
    get_inverse_tf,
    load_calib,
    read_traj_file_gt2,
)
from mm_masking_tpu.dicp import TARGET_PAD_VAL


@dataclasses.dataclass(frozen=True)
class DatagenConfig:
    # sensor pair → output branch: radar/radar → "radar",
    # lidar/radar → "radar_lidar" (the reference's flagship configuration),
    # lidar/lidar → "lidar" (`icp_weight_dataset.py` sensor_dir logic)
    map_sensor: str = "radar"
    loc_sensor: str = "radar"
    detector: str = "modified_cacfar"
    detector_kwargs: tuple = ()
    max_points: int = 1024
    batch_size: int = 8
    radar_resolution: float = 0.0596
    # odometry / map building (vertex-test thresholds 0 = every frame a
    # keyframe, the reference's data-gen setting `radar_config.yaml:203-206`)
    max_map_pts: int = 16384
    voxel_size: float = 0.5
    odometry_iterations: int = 30
    limit: int = -1  # cap frames per sequence (<=0 = all)


def _sensor_dir(cfg: DatagenConfig) -> str:
    if cfg.map_sensor == "lidar" and cfg.loc_sensor == "radar":
        return "radar_lidar"
    if cfg.map_sensor == "radar" and cfg.loc_sensor == "radar":
        return "radar"
    if cfg.map_sensor == "lidar" and cfg.loc_sensor == "lidar":
        return "lidar"
    raise ValueError(
        f"unsupported sensor pair {cfg.map_sensor}/{cfg.loc_sensor}"
    )


def _load_clouds_any(scan_dir: str, cfg: DatagenConfig, sensor: str):
    """(stamps, clouds (F, N, 3)) from a directory of raw Navtech scans
    (detector extraction), lidar .bin dumps, or converter shards
    (pre-extracted clouds)."""
    from mm_masking_tpu.localization import LocalizationConfig
    from mm_masking_tpu.localization.__main__ import (
        _extract_clouds,
        _load_radar_frames,
        _load_shard_clouds,
        _scan_files,
        _stamp_of,
    )

    bins = sorted(
        f for f in os.listdir(scan_dir) if f.endswith(".bin")
    ) if sensor == "lidar" else []
    if bins:
        # Boreas lidar frames: float32 (N, 6) binaries
        # (`radar_utils.py:10-18` layout). Subsample to the static cap.
        from mm_masking_tpu.data.boreas import load_pc_from_file

        if cfg.limit > 0:
            bins = bins[: cfg.limit]
        stamps = [int(osp.splitext(f)[0]) for f in bins]
        rng = np.random.default_rng(0)
        out = np.zeros((len(bins), cfg.max_points, 3), np.float32)
        for i, f in enumerate(bins):
            pc = load_pc_from_file(osp.join(scan_dir, f))[:, :3]
            if pc.shape[0] > cfg.max_points:
                pc = pc[rng.permutation(pc.shape[0])[: cfg.max_points]]
            out[i, : pc.shape[0]] = pc
        return stamps, out

    kind, paths = _scan_files(scan_dir)
    if cfg.limit > 0:
        paths = paths[: cfg.limit]
    stamps = [_stamp_of(p) for p in paths]
    if kind == "radar":
        if sensor != "radar":
            raise ValueError(
                f"{scan_dir}: raw Navtech scans found but sensor={sensor}"
            )
        loc_cfg = LocalizationConfig(
            detector=cfg.detector,
            detector_kwargs=tuple(cfg.detector_kwargs),
            max_points=cfg.max_points,
            radar_resolution=cfg.radar_resolution,
        )
        clouds = _extract_clouds(
            _load_radar_frames(paths), loc_cfg, cfg.batch_size
        )
    else:
        clouds = _load_shard_clouds(paths, cfg.max_points)
    return stamps, np.asarray(clouds)


def generate_pair(
    root: str,
    map_seq: str,
    loc_seq: str,
    cfg: DatagenConfig = DatagenConfig(),
    map_scan_dir: str | None = None,
    loc_scan_dir: str | None = None,
    out_dir: str | None = None,
) -> dict:
    """Generate training shards for one (teach, repeat) sequence pair.

    Expects the Boreas-style tree the dataset reads
    (`<root>/vtr_data/<seq>/applanix/<sensor>_poses.csv`, `calib/`), with the
    scans under `<root>/vtr_data/<seq>/<map|loc sensor>/` unless explicit
    scan directories are given. Writes shards + index.json under
    `<root>/vtr_results/<sensor_dir>/<map_seq>/<loc_seq>/shards/` (the
    converter layout) and returns the index dict.
    """
    from mm_masking_tpu.data.convert import _write_shard
    from mm_masking_tpu.geom import se3_inv
    from mm_masking_tpu.localization.odometry import OdometryConfig, TeachPass

    dataset_dir = osp.join(root, "vtr_data")
    map_scan_dir = map_scan_dir or osp.join(
        dataset_dir, map_seq, cfg.map_sensor)
    loc_scan_dir = loc_scan_dir or osp.join(
        dataset_dir, loc_seq, cfg.loc_sensor)
    out_dir = out_dir or osp.join(
        root, "vtr_results", _sensor_dir(cfg), map_seq, loc_seq, "shards"
    )
    os.makedirs(out_dir, exist_ok=True)

    # --- teach: odometry + map building over the map sequence -------------
    map_stamps, map_clouds = _load_clouds_any(map_scan_dir, cfg,
                                              cfg.map_sensor)
    teach = TeachPass(OdometryConfig(
        max_map_pts=cfg.max_map_pts,
        voxel_size=cfg.voxel_size,
        max_iterations=cfg.odometry_iterations,
    ))
    # The GLOBAL teach map is accumulated HOST-side from every frame's
    # world-aligned points: the odometry's fixed-size device buffer is a
    # sliding LOCAL map (nearest-to-robot eviction on overflow) and must not
    # double as the route-wide localization map — on routes whose voxel count
    # exceeds the buffer, reusing it silently dropped distant (early-route)
    # structure. vtr stores per-vertex submaps for the same reason.
    world_pts = []
    for i in range(map_clouds.shape[0]):
        T = np.asarray(teach.process(map_clouds[i], stamp_us=map_stamps[i]))
        c = np.asarray(map_clouds[i])
        valid = ~((c[:, 0] == 0.0) & (c[:, 1] == 0.0))
        world_pts.append(c[valid] @ T[:3, :3].T + T[:3, 3])
    T_world_sensor = np.stack(teach.trajectory)  # (K, 4, 4), world = frame 0

    # one exact voxel-mean pass over the whole route (numpy group-by)
    allw = np.concatenate(world_pts).astype(np.float64)
    cells = np.floor(allw / cfg.voxel_size).astype(np.int64)
    _, inv, counts = np.unique(cells, axis=0, return_inverse=True,
                               return_counts=True)
    sums = np.zeros((counts.shape[0], 3))
    np.add.at(sums, inv, allw)
    map_world = (sums / counts[:, None]).astype(np.float32)
    if map_world.shape[0] > cfg.max_map_pts:
        print(
            f"datagen: global map {map_world.shape[0]} voxels > cap "
            f"{cfg.max_map_pts} — even subsample (raise max_map_pts to keep "
            "the full route)"
        )
        sel = np.random.default_rng(0).permutation(
            map_world.shape[0])[: cfg.max_map_pts]
        map_world = map_world[np.sort(sel)]
    # normals on the global map (same estimator as TeachPass.map_with_normals)
    from mm_masking_tpu.ops.preprocessing import estimate_normals

    pad_n = int(cfg.max_map_pts) - map_world.shape[0]
    padded = np.concatenate(
        [map_world, np.full((max(pad_n, 0), 3), TARGET_PAD_VAL, np.float32)]
    ) if pad_n > 0 else map_world
    nrm = np.asarray(estimate_normals(
        jnp.asarray(padded)[None], k=teach.cfg.normals_k)[0][0])
    map_world = np.concatenate(
        [map_world, nrm[: map_world.shape[0]]], axis=-1)

    # --- GT + calib (the same files the dataset reads) ---------------------
    gt_map_poses, gt_map_times = read_traj_file_gt2(
        osp.join(dataset_dir, map_seq, "applanix",
                 cfg.map_sensor + "_poses.csv"),
        dim=2,
    )
    gt_loc_poses, gt_loc_times = read_traj_file_gt2(
        osp.join(dataset_dir, loc_seq, "applanix",
                 cfg.loc_sensor + "_poses.csv"),
        dim=2,
    )
    gt_map_times = list(gt_map_times)
    keyframe_rows = []
    for k, st in enumerate(map_stamps):
        if st not in gt_map_times:
            raise ValueError(
                f"teach stamp {st} missing from {map_seq} GT CSV — datagen "
                "requires a GT row per teach scan (the dataset asserts "
                "map_stamp equality at load time)"
            )
        keyframe_rows.append((k, st, gt_map_poses[gt_map_times.index(st)]))
    gt_loc_times = list(gt_loc_times)

    T_msr = np.asarray(
        load_calib(osp.join(dataset_dir, map_seq), cfg.map_sensor))
    T_msr_inv = np.asarray(get_inverse_tf(T_msr))

    # --- repeat: raw/filt clouds + per-frame map in the keyframe frame -----
    loc_stamps, loc_clouds = _load_clouds_any(loc_scan_dir, cfg,
                                              cfg.loc_sensor)
    index = {"frames": [], "max_loc": 0, "max_map": 0}
    kf_xy = np.stack([p[:2, 3] for _, _, p in keyframe_rows])
    for i, stamp in enumerate(loc_stamps):
        if stamp not in gt_loc_times:
            print(f"datagen: skipping frame {stamp} — no GT row")
            continue
        T_enu_loc = gt_loc_poses[gt_loc_times.index(stamp)]
        # closest teach keyframe by GT position (VTR: spatial-edge closest
        # teach vertex)
        k, map_stamp, _ = keyframe_rows[
            int(np.argmin(np.linalg.norm(kf_xy - T_enu_loc[:2, 3], axis=-1)))
        ]
        # map: world → keyframe sensor frame → keyframe robot frame
        T_sw = np.asarray(se3_inv(T_world_sensor[k]))
        R = (T_msr_inv[:3, :3] @ T_sw[:3, :3]).astype(np.float32)
        t = (T_msr_inv[:3, :3] @ T_sw[:3, 3] + T_msr_inv[:3, 3]).astype(
            np.float32
        )
        pts = map_world[:, :3] @ R.T + t
        nrm = map_world[:, 3:6] @ R.T
        scan = loc_clouds[i]
        nz = ~((scan[:, 0] == 0.0) & (scan[:, 1] == 0.0))
        scan = scan[nz].astype(np.float32)
        shard = {
            "raw_pc": scan,
            "filt_pc": scan,
            "loc_stamp": np.int64(stamp),
            "map_pc": np.concatenate([pts, nrm], axis=-1).astype(np.float32),
            "map_stamp": np.int64(map_stamp),
        }
        _write_shard(out_dir, index, shard)

    with open(osp.join(out_dir, "index.json"), "w") as f:
        json.dump(index, f)
    print(
        f"datagen: {len(index['frames'])} shards "
        f"({map_clouds.shape[0]} teach frames, map {map_world.shape[0]} pts) "
        f"→ {out_dir}"
    )
    return index
