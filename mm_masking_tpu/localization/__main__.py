"""Composed data-gen / evaluation driver CLI.

The rebuild's equivalent of the reference's shell drivers
(`/root/reference/gen_data/run_test.sh:7-24` — `run_test.sh MODE SENSOR SEQ`,
and `run_eval.sh:18`): one entry point that runs teach (odometry + map
building) or localization over a directory of scans and produces a trajectory
file plus GT error statistics. The pieces it composes are the library
surfaces (`TeachPass`, `localize_sequence_to_traj`,
`evaluation.gt_tools.eval_localization_run`).

Usage:
  # Teach pass: build a map from a scan directory.
  python -m mm_masking_tpu.localization teach \
      --scans <dir> --out-map map.npz [--out-traj odo_traj.txt]

  # Repeat pass: localize a scan directory against a map, write the
  # trajectory, and (with GT CSVs) the error stats.
  python -m mm_masking_tpu.localization localize \
      --scans <dir> --map map.npz --out-traj traj.txt \
      [--map-gt <applanix csv> --loc-gt <applanix csv> --stats stats.json]

Scan directories may contain either raw Navtech scans (`<stamp>.png` /
`<stamp>.npy`, decoded with `ops.load_radar`) or converter shards
(`frame_<stamp>.npz` with `filt_pc` clouds, `data/convert.py`); the mode is
detected from the files present.
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

import numpy as np


def _scan_files(scan_dir: str) -> tuple[str, list[str]]:
    """Detect directory kind → ('radar'|'lidar'|'shards', sorted file list)."""
    files = sorted(os.listdir(scan_dir))
    shards = [f for f in files if f.startswith("frame_") and f.endswith(".npz")]
    if shards:
        return "shards", [osp.join(scan_dir, f) for f in shards]
    bins = [f for f in files if f.endswith(".bin")]
    if bins:
        # Boreas lidar frames (float32 (N, 6) binaries) — the teach sensor of
        # the reference's flagship radar_lidar configuration.
        return "lidar", [osp.join(scan_dir, f) for f in bins]
    scans = [f for f in files if f.endswith((".png", ".npy"))]
    if not scans:
        raise SystemExit(
            f"{scan_dir}: no radar scans (*.png/*.npy), lidar frames "
            f"(*.bin), or converter shards (frame_*.npz) found"
        )
    return "radar", [osp.join(scan_dir, f) for f in scans]


def _stamp_of(path: str) -> int:
    stem = osp.splitext(osp.basename(path))[0]
    return int(stem.removeprefix("frame_"))


def _parse_det_kwargs(items) -> tuple:
    """--det KEY=VALUE list → detector kwargs tuple (ints stay ints: window
    widths are static shapes)."""
    out = []
    for it in items or ():
        k, _, v = it.partition("=")
        if not _:
            raise SystemExit(f"--det expects KEY=VALUE, got {it!r}")
        try:
            val = int(v)
        except ValueError:
            try:
                val = float(v)
            except ValueError:
                raise SystemExit(
                    f"--det {k}: numeric value expected, got {v!r}"
                ) from None
        out.append((k, val))
    return tuple(out)


def _load_radar_frames(paths: list[str]):
    """Decode raw Navtech scans → stacked {'fft','azimuths','az_times'}.

    az_times are re-referenced to each scan's FIRST azimuth before the f32
    cast: absolute epoch-nanosecond stamps (~1.7e18) exceed f32's ulp
    (~1.4e11 ns ≈ 137 s) and would quantize the whole 0.25 s sweep to a
    single value, silently destroying the per-azimuth timing that
    motion-during-scan un-distortion and the continuous-time solver need.
    Every pipeline consumer of these times works with per-scan deltas
    (`motion_undistort` centers on its own t_ref; `ct_icp` normalizes to
    [-1/2, 1/2]), so relative times are semantics-preserving.
    """
    from mm_masking_tpu.data.dataset import _decode_radar_file

    ffts, azs, azts = [], [], []
    for p in paths:
        fft, az, azt = _decode_radar_file(p)
        ffts.append(fft)
        azs.append(az)
        azts.append(np.asarray(azt) - np.asarray(azt).flat[0])
    # _decode_radar_file keeps the FFT plane uint8 (the u8-on-the-wire
    # input pipeline normalizes /255 on DEVICE, `loader.preprocess_batch`);
    # every consumer here (detectors with [0,1]-scale thresholds like
    # modified_cacfar's b=0.09, `radar_utils.py:20-27` "FFT power /255",
    # policy.mask_for_scan) expects the normalized plane — divide on load.
    # Round-5 regression fix: without this, CFAR fired on essentially every
    # bin of a 0-255-scale scan and the fixed-size extraction filled its
    # whole budget from the first ~14 azimuths — datagen emitted garbage
    # clouds for every repeat sequence (teach lidar unaffected). The r4
    # e2e artifacts predate the u8 pipeline; its bit-transparency check
    # covered the dataset path only (tests/test_cli_localization.py now
    # pins this loader's scale).
    return {
        "fft": np.stack(ffts).astype(np.float32) / 255.0,
        "azimuths": np.stack(azs).astype(np.float32),
        "az_times": np.stack(azts).astype(np.float32),
    }


def _load_shard_clouds(paths: list[str], max_pts: int) -> np.ndarray:
    """(F, max_pts, 3) zero-padded clouds from converter shards."""
    out = np.zeros((len(paths), max_pts, 3), np.float32)
    for i, p in enumerate(paths):
        pc = np.load(p)["filt_pc"][:max_pts]
        out[i, : pc.shape[0]] = pc[:, :3]
    return out


def _load_lidar_clouds(paths: list[str], max_pts: int) -> np.ndarray:
    """(F, max_pts, 3) clouds from Boreas lidar .bin frames, random-
    subsampled to the static cap (same convention as datagen's loader)."""
    from mm_masking_tpu.data.boreas import load_pc_from_file

    rng = np.random.default_rng(0)
    out = np.zeros((len(paths), max_pts, 3), np.float32)
    for i, p in enumerate(paths):
        pc = load_pc_from_file(p)[:, :3]
        if pc.shape[0] > max_pts:
            pc = pc[rng.permutation(pc.shape[0])[:max_pts]]
        out[i, : pc.shape[0]] = pc
    return out


def _clouds_for(kind: str, paths: list[str], max_pts: int) -> np.ndarray:
    return (_load_lidar_clouds if kind == "lidar" else _load_shard_clouds)(
        paths, max_pts)


def _extract_clouds(frames: dict, cfg, batch_size: int) -> np.ndarray:
    """Detector + peak extraction over stacked radar frames → (F, N, 3)."""
    import functools

    import jax
    import jax.numpy as jnp

    from mm_masking_tpu.ops import extract_pc
    from mm_masking_tpu.ops.detectors import detect

    @functools.partial(jax.jit, static_argnames=())
    def one(fft, az, azt):
        mask = detect(cfg.detector, fft, cfg.radar_resolution,
                      **dict(cfg.detector_kwargs))
        return extract_pc(mask, cfg.radar_resolution, az, azt,
                          max_points=cfg.max_points, diff=False)

    F = frames["fft"].shape[0]
    outs = []
    for s in range(0, F, batch_size):
        outs.append(one(jnp.asarray(frames["fft"][s:s + batch_size]),
                        jnp.asarray(frames["azimuths"][s:s + batch_size]),
                        jnp.asarray(frames["az_times"][s:s + batch_size])))
    return np.concatenate([np.asarray(o) for o in outs])[:F]


def cmd_teach(args) -> int:
    from mm_masking_tpu.evaluation.gt_tools import write_traj_file
    from mm_masking_tpu.localization import LocalizationConfig
    from mm_masking_tpu.localization.odometry import OdometryConfig, TeachPass

    kind, paths = _scan_files(args.scans)
    if args.limit > 0:
        paths = paths[: args.limit]
    stamps = [_stamp_of(p) for p in paths]
    loc_cfg = LocalizationConfig(detector=args.detector,
                                 detector_kwargs=_parse_det_kwargs(args.det),
                                 max_points=args.max_points)
    if kind == "radar":
        clouds = _extract_clouds(_load_radar_frames(paths), loc_cfg,
                                 args.batch_size)
    else:
        clouds = _clouds_for(kind, paths, args.max_points)

    teach = TeachPass(OdometryConfig(max_map_pts=args.max_map_pts))
    for i in range(clouds.shape[0]):
        teach.process(clouds[i], stamp_us=stamps[i])
    map_pc = np.asarray(teach.map_with_normals()[0])

    np.savez_compressed(args.out_map, map_pc=map_pc)
    print(f"teach: {clouds.shape[0]} frames, {teach.n_keyframes} keyframes "
          f"→ {args.out_map}")
    if args.out_traj:
        write_traj_file(args.out_traj, teach.trajectory, stamps)
        print(f"teach: odometry trajectory → {args.out_traj}")
    if args.interp_period_us > 0:
        # Continuous-time trajectory export: WNOA Gauss-process query of the
        # odometry trajectory at a fixed period (the user-facing form of the
        # reference's steam trajectory interpolation,
        # `/root/reference/gen_data/config/radar_config.yaml:160-188`).
        if not args.out_traj:
            print("teach: --interp-period-us requires --out-traj",
                  file=sys.stderr)
            return 2
        from mm_masking_tpu.geom.gp_interp import interpolate_trajectory

        q_us = np.arange(stamps[0], stamps[-1] + 1, args.interp_period_us,
                         dtype=np.int64)
        Ts, _ = interpolate_trajectory(
            np.stack(teach.trajectory).astype(np.float32),
            np.asarray(stamps, np.float64).astype(np.float32) * 1e-6,
            q_us.astype(np.float32) * 1e-6,
        )
        root, ext = os.path.splitext(args.out_traj)
        interp_path = f"{root}_interp{ext or '.txt'}"
        write_traj_file(interp_path, list(np.asarray(Ts)), list(q_us))
        print(f"teach: GP-interpolated trajectory ({len(q_us)} poses @ "
              f"{args.interp_period_us} us) → {interp_path}")
    return 0


def _load_map(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        z = np.load(path)
        key = "map_pc" if "map_pc" in z else list(z.keys())[0]
        return z[key]
    from mm_masking_tpu.data.boreas import load_pc_from_file

    return load_pc_from_file(path)


def cmd_datagen(args) -> int:
    from mm_masking_tpu.localization.datagen import (
        DatagenConfig,
        generate_pair,
    )

    cfg = DatagenConfig(
        map_sensor=args.map_sensor,
        loc_sensor=args.loc_sensor,
        detector=args.detector,
        detector_kwargs=_parse_det_kwargs(args.det),
        max_points=args.max_points,
        batch_size=args.batch_size,
        max_map_pts=args.max_map_pts,
        voxel_size=args.voxel_size,
        limit=args.limit,
    )
    for loc_seq in args.loc_seq:
        generate_pair(
            args.data_root, args.map_seq, loc_seq, cfg,
            map_scan_dir=args.map_scans or None,
            loc_scan_dir=args.loc_scans or None,
        )
    return 0


def cmd_localize(args) -> int:
    import jax.numpy as jnp

    from mm_masking_tpu.evaluation.gt_tools import (
        eval_localization_run,
        write_traj_file,
    )
    from mm_masking_tpu.geom import se3_inv
    from mm_masking_tpu.localization import (
        LocalizationConfig,
        localize_sequence_to_traj,
    )

    kind, paths = _scan_files(args.scans)
    if args.limit > 0:
        paths = paths[: args.limit]
    stamps = [_stamp_of(p) for p in paths]
    map_pc = _load_map(args.map)
    if args.icp_type == "pt2pl" and map_pc.shape[-1] < 6:
        raise SystemExit(
            f"map {args.map} has no normals (shape {map_pc.shape}); "
            f"pt2pl localization needs (M, 6) — build it with `teach` or the "
            f"converter, or pass --icp-type pt2pt"
        )
    if map_pc.shape[-1] < 6:
        # pt2pt map without normals: pad zero normals so project_map's
        # z-normal read and the pipeline's (M, 6) contract hold.
        map_pc = np.concatenate([map_pc, np.zeros_like(map_pc)], axis=-1)
    cfg = LocalizationConfig(detector=args.detector,
                             detector_kwargs=_parse_det_kwargs(args.det),
                             max_points=args.max_points,
                             icp_type=args.icp_type,
                             normal_threshold=args.normal_threshold,
                             min_matched_ratio=args.min_matched_ratio,
                             nn_refresh_dist=args.nn_refresh_dist,
                             max_step_m=args.max_step)

    T_inits = None
    if args.init_gt:
        # GT-prior warm starts: the repeat pass in VTR starts each
        # localization from the pose-graph/odometry prior; against a global
        # map the equivalent prior is the (perturbed) GT pose — the exact
        # convention the training dataset uses for its val split
        # (`icp_weight_dataset.py:260-280`: gaussian x/y/yaw, z/pitch/roll
        # zeroed). Deterministic under --init-seed.
        if not args.loc_gt:
            raise SystemExit("--init-gt needs --loc-gt (the Applanix CSV "
                             "supplying the prior poses)")
        from mm_masking_tpu.data.boreas import (
            get_closest_index,
            read_traj_file_gt2,
        )
        from mm_masking_tpu.data.convert import se3_exp_np

        poses, gt_times = read_traj_file_gt2(args.loc_gt, dim=2)
        gt_times = list(gt_times)
        rng = np.random.default_rng(args.init_seed)
        rows = []
        # Closest-index with a tolerance, like every other GT consumer
        # (eval_localization_run tol_us, dataset get_closest_index): real
        # Applanix CSVs' µs-rounded GPSTime can differ from scan stamps.
        tol_us = 1000
        for st in stamps:
            i = get_closest_index(st, gt_times)
            if abs(int(gt_times[i]) - int(st)) > tol_us:
                raise SystemExit(
                    f"--init-gt: scan stamp {st} has no GT row within "
                    f"{tol_us} us in {args.loc_gt} (closest: {gt_times[i]})"
                )
            xi = np.zeros(6)
            xi[0] = rng.normal(0.0, args.init_pos_std)
            xi[1] = rng.normal(0.0, args.init_pos_std)
            xi[5] = rng.normal(0.0, args.init_rot_std)
            rows.append(se3_exp_np(xi) @ poses[i])
        T_inits = np.stack(rows).astype(np.float32)

    weight_policy = policy_variables = None
    if args.checkpoint:
        # Learned-mask-in-the-loop localization (the reference deployment
        # forks' LibTorch mask inference inside vtr3, SURVEY.md §2.3): the
        # trained run's config.json rebuilds the exact policy, the orbax
        # checkpoint supplies the UNet weights, and `localize_sequence` runs
        # mask inference per frame inside the fused program.
        if kind != "radar":
            raise SystemExit(
                "--checkpoint needs raw radar scans (the mask is computed "
                "from the scan image); converter shards carry clouds only"
            )
        from mm_masking_tpu.config import Config
        from mm_masking_tpu.models import LearnICPWeightPolicy
        from mm_masking_tpu.train.checkpoint import load_policy_variables

        cfg_path = osp.join(args.checkpoint, "config.json")
        if not osp.exists(cfg_path):
            raise SystemExit(
                f"{cfg_path} not found — train with this repo's Trainer "
                "(it writes the run config next to its checkpoints)"
            )
        run_cfg = Config.from_dict(json.load(open(cfg_path)))
        weight_policy = LearnICPWeightPolicy(run_cfg)
        policy_variables = load_policy_variables(
            args.checkpoint, args.checkpoint_name)
        print(f"localize: learned mask from {args.checkpoint} "
              f"({args.checkpoint_name})")

    if args.init_chain:
        # Prior-free repeat-pass tracking: frame k warm-starts from the
        # constant-velocity extrapolation of the previous two solutions
        # (the role VTR's live odometry plays in the repeat pass). T0 comes
        # from --init-gt's first frame when both are given, else identity.
        from mm_masking_tpu.geom import se3_inv as _inv
        from mm_masking_tpu.localization import localize_sequence_tracked

        T0 = T_inits[0] if T_inits is not None else None
        if kind == "radar":
            out = localize_sequence_tracked(
                _load_radar_frames(paths), jnp.asarray(map_pc), cfg=cfg,
                T0=T0, weight_policy=weight_policy,
                policy_variables=policy_variables,
            )
        else:
            out = localize_sequence_tracked(
                None, jnp.asarray(map_pc), cfg=cfg, T0=T0,
                clouds=_clouds_for(kind, paths, args.max_points),
            )
        write_traj_file(args.out_traj, list(np.asarray(_inv(out["T"]))),
                        stamps)
    elif kind == "radar":
        frames = _load_radar_frames(paths)
        out = localize_sequence_to_traj(
            frames, jnp.asarray(map_pc), stamps, args.out_traj, cfg=cfg,
            T_inits=T_inits, batch_size=args.batch_size,
            weight_policy=weight_policy, policy_variables=policy_variables,
        )
    else:
        # Converter shards: pre-extracted clouds skip the detector but run
        # the SAME registration pipeline (map projection, two-phase ICP,
        # matched-ratio gate) via localize_cloud_sequence.
        from mm_masking_tpu.localization import localize_cloud_sequence

        clouds = _clouds_for(kind, paths, args.max_points)
        out = localize_cloud_sequence(
            clouds, jnp.asarray(map_pc), cfg=cfg, T_inits=T_inits,
            batch_size=args.batch_size,
        )
        T_loc_map = np.asarray(se3_inv(out["T"]))
        write_traj_file(args.out_traj, list(T_loc_map), stamps)
    n_ok = int(np.sum(np.asarray(out["ok"])))
    print(f"localize: {len(stamps)} frames ({n_ok} matched-ratio ok) "
          f"→ {args.out_traj}")

    if args.map_gt and args.loc_gt:
        stats = eval_localization_run(
            args.out_traj, args.map_gt, args.loc_gt,
            out_gt_path=args.out_gt or None,
            plots_dir=args.plots_dir or None,
            seq_name=osp.splitext(osp.basename(args.out_traj))[0],
            map_frame=args.map_frame,
        )
        line = json.dumps(stats, indent=2)
        if args.stats:
            with open(args.stats, "w") as f:
                f.write(line + "\n")
            print(f"localize: stats → {args.stats}")
        print(line)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m mm_masking_tpu.localization",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--scans", required=True,
                        help="directory of radar scans or converter shards")
    common.add_argument("--detector", default="modified_cacfar")
    common.add_argument("--det", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="detector tunable, repeatable (e.g. --det "
                             "width=41 --det maxr=15.0 — the "
                             "radar_config.yaml:87-118 surface)")
    common.add_argument("--max-points", type=int, default=4096)
    common.add_argument("--batch-size", type=int, default=8)
    common.add_argument("--limit", type=int, default=-1,
                        help="only process the first N frames")
    common.add_argument("--icp-type", default="pt2pl",
                        choices=("pt2pl", "pt2pt"))
    common.add_argument("--normal-threshold", type=float, default=0.5,
                        help="|z-normal| map-projection gate "
                             "(radar_lidar_config.yaml:248)")
    common.add_argument("--min-matched-ratio", type=float, default=0.0,
                        help="matched-ratio gate for 'ok' frames "
                             "(radar_lidar_config.yaml localization_icp)")
    common.add_argument("--nn-refresh-dist", type=float, default=0.0,
                        help="motion-gated NN refresh (m) in the refined "
                             "ICP; 0 = search every iteration (reference "
                             "semantics), 0.05 = measured speed knob")
    common.add_argument("--max-step", type=float, default=0.0,
                        help="ICP trust-region step clamp (m); 0 = off "
                             "(reference semantics)")

    t = sub.add_parser("teach", parents=[common],
                       help="odometry + map building (run_test.sh odometry)")
    t.add_argument("--out-map", required=True)
    t.add_argument("--out-traj", default="")
    t.add_argument("--interp-period-us", type=int, default=0,
                   help="also write <out-traj>_interp: the WNOA "
                        "Gauss-process continuous-time trajectory sampled "
                        "every N microseconds")
    t.add_argument("--max-map-pts", type=int, default=16384)
    t.set_defaults(fn=cmd_teach)

    l = sub.add_parser("localize", parents=[common],
                       help="localize against a map (run_test.sh localization"
                            " + run_eval.sh)")
    l.add_argument("--map", required=True, help="map npz (map_pc (M, 6))")
    l.add_argument("--out-traj", required=True)
    l.add_argument("--checkpoint", default="",
                   help="trained run dir (results/checkpoints/<run>): apply "
                        "its UNet mask inside the localization loop (the "
                        "deployment-fork mask inference)")
    l.add_argument("--checkpoint-name", default="best_policy",
                   help="checkpoint entry inside --checkpoint "
                        "(best_policy | epoch_N)")
    l.add_argument("--init-gt", action="store_true",
                   help="warm-start each frame from its (perturbed) GT pose "
                        "in --loc-gt — the repeat pass's pose-graph prior "
                        "against a global map")
    l.add_argument("--init-pos-std", type=float, default=0.0,
                   help="gaussian x/y perturbation of the --init-gt prior (m)")
    l.add_argument("--init-rot-std", type=float, default=0.0,
                   help="gaussian yaw perturbation of the --init-gt prior (rad)")
    l.add_argument("--init-seed", type=int, default=99)
    l.add_argument("--init-chain", action="store_true",
                   help="prior-free sequential tracking: warm-start each "
                        "frame from the constant-velocity extrapolation of "
                        "the previous two solutions (VTR's live-odometry "
                        "prior role); first frame from --init-gt if given, "
                        "else identity")
    l.add_argument("--map-gt", default="",
                   help="Applanix GT CSV of the map (teach) sequence")
    l.add_argument("--loc-gt", default="",
                   help="Applanix GT CSV of the localized sequence")
    l.add_argument("--out-gt", default="",
                   help="write the aligned GT trajectory here")
    l.add_argument("--stats", default="", help="write error stats JSON here")
    l.add_argument("--plots-dir", default="",
                   help="also emit the per-sequence error-over-trajectory "
                        "figure + CSV table (pyboreas plot_loc_stats "
                        "reporting surface) into this directory")
    l.add_argument("--map-frame", default="first",
                   choices=["first", "closest_time"],
                   help="GT map-pose convention for --stats: 'first' = the "
                        "teach CSV's row 0 (matches maps built by the teach "
                        "command — ONE global map in the first keyframe's "
                        "frame); 'closest_time' = per-frame closest teach "
                        "row (the reference's per-vertex-submap proxy)")
    l.set_defaults(fn=cmd_localize)

    g = sub.add_parser(
        "datagen",
        help="teach + repeat → training shards in one pass (the reference's "
             "entire gen_data half: run_test.sh odometry + localization + "
             "save_raw_point_cloud, with zero ROS)")
    g.add_argument("--data-root", required=True,
                   help="Boreas-style tree root (vtr_data/<seq>/...)")
    g.add_argument("--map-seq", required=True)
    g.add_argument("--loc-seq", required=True, nargs="+")
    g.add_argument("--map-scans", default="",
                   help="override teach scan dir (default "
                        "<root>/vtr_data/<map-seq>/radar)")
    g.add_argument("--loc-scans", default="",
                   help="override repeat scan dir")
    g.add_argument("--map-sensor", default="radar",
                   choices=("radar", "lidar"),
                   help="teach sensor (lidar + radar loc = the reference's "
                        "flagship radar_lidar configuration)")
    g.add_argument("--loc-sensor", default="radar",
                   choices=("radar", "lidar"))
    g.add_argument("--detector", default="modified_cacfar")
    g.add_argument("--det", action="append", default=[], metavar="KEY=VALUE",
                   help="detector tunable, repeatable")
    g.add_argument("--max-points", type=int, default=1024)
    g.add_argument("--batch-size", type=int, default=8)
    g.add_argument("--max-map-pts", type=int, default=16384)
    g.add_argument("--voxel-size", type=float, default=0.5)
    g.add_argument("--limit", type=int, default=-1)
    g.set_defaults(fn=cmd_datagen)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
