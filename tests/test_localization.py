"""Full localization pipeline: raw scan -> detector -> cloud -> 2-phase ICP."""
import numpy as np
import jax.numpy as jnp

from mm_masking_tpu.data.synthetic import SyntheticSpec, synthetic_batch
from mm_masking_tpu.geom import planar_xi_first_order
from mm_masking_tpu.localization import (
    LocalizationConfig,
    localize_frame,
    project_map,
)

SPEC = SyntheticSpec(
    n_scan=128, n_map=512, polar_shape=(64, 512), cart_pixel_width=64,
    res=15.0 / 512, cart_resolution=0.5, max_range=14.0, min_range=2.0,
    pos_std=0.3, rot_std=0.1, network_input_type="polar",
)


def test_localize_frame_recovers_pose():
    b = synthetic_batch(0, batch=6, spec=SPEC)
    cfg = LocalizationConfig(
        detector="modified_cacfar",
        detector_kwargs=(("width", 21), ("guard", 2), ("maxr", 15.0)),
        radar_resolution=SPEC.res,
        max_points=256,
        beta=0.0,
        icp_type="pt2pl",
        refined_max_iter=50,
    )
    out = localize_frame(
        b["loc_data"]["fft_data"],  # polar (network_input_type='polar')
        b["loc_data"]["azimuths"],
        b["loc_data"]["az_times"],
        b["map_data"]["pc"],
        b["transforms"]["T_ml_init"],
        cfg,
    )
    import numpy as np

    th, r = planar_xi_first_order(out["T"])
    trans = np.asarray(jnp.linalg.norm(r, axis=-1))
    # The typical frame must shed most of the (0.3 m, 0.1 rad) perturbation
    # (an occasional frame lands in a wrong basin on this sparse scene).
    th0, r0 = planar_xi_first_order(b["transforms"]["T_ml_init"])
    init_trans = np.asarray(jnp.linalg.norm(r0, axis=-1))
    assert float(np.median(trans)) < 0.6 * float(np.median(init_trans)), (
        trans, init_trans)
    assert float(jnp.mean(out["matched_ratio"])) > 0.5
    assert bool(out["ok"].all())


def test_project_map_filters_elevation_and_normals():
    cfg = LocalizationConfig(elevation_threshold=0.05, normal_threshold=0.5)
    pts = jnp.asarray([[
        [10.0, 0.0, 0.0, 0.0, 1.0, 0.0],   # keep
        [10.0, 0.0, 5.0, 0.0, 1.0, 0.0],   # high elevation -> drop
        [10.0, 0.0, 0.0, 0.0, 0.0, 1.0],   # z-normal -> drop
    ]])
    out = np.asarray(project_map(pts, cfg))
    assert out[0, 0, 0] == 10.0
    assert np.all(out[0, 1] == 1000.0)
    assert np.all(out[0, 2] == 1000.0)


def test_teach_localize_eval_end_to_end(tmp_path):
    """Close the data-gen → eval seam in-process: TeachPass builds the map,
    `localize_sequence_to_traj` batches jitted frame localization and writes a
    trajectory file, `gt_tools.eval_localization_run` scores it against
    Applanix-format GT CSVs (the flow the reference drives through
    `run_test.sh` → `run_eval.sh` → `extract_loc_gt_v2.py`)."""
    import os.path as osp

    from mm_masking_tpu.evaluation.gt_tools import eval_localization_run
    from mm_masking_tpu.geom import se3_exp, se3_inv
    from mm_masking_tpu.localization import localize_sequence_to_traj
    from mm_masking_tpu.localization.odometry import OdometryConfig, TeachPass

    rng = np.random.default_rng(11)
    n_world = 900
    world = np.zeros((n_world, 3), np.float32)
    r = rng.uniform(3, 13, n_world)
    a = rng.uniform(0, 2 * np.pi, n_world)
    world[:, 0] = r * np.cos(a)
    world[:, 1] = r * np.sin(a)

    def scan_at(T_wr, n=256, noise=0.01):
        T_rw = np.asarray(se3_inv(jnp.asarray(T_wr)[None]))[0]
        s = (world @ T_rw[:3, :3].T + T_rw[:3, 3]).astype(np.float32)
        s += rng.normal(0, noise, s.shape).astype(np.float32)
        s = s[np.linalg.norm(s[:, :2], axis=1) < 14.0][:n]
        return np.pad(s, ((0, n - s.shape[0]), (0, 0)))

    # --- teach: 4 frames along a straight path build the world map.
    tp = TeachPass(OdometryConfig(max_map_pts=2048, voxel_size=0.25,
                                  max_iterations=30))
    T = np.eye(4)
    for i in range(4):
        tp.process(jnp.asarray(scan_at(T)))
        T = np.asarray(se3_exp(jnp.asarray([0.4, 0.0, 0, 0, 0, 0.0]))) @ T

    # --- repeat: 5 frames at planar poses (x, y, heading); synthesize polar
    # scans from the world and localize against the teach map.
    A, R = 128, 512  # 128 azimuths: extraction quantization ~0.012 rad std
    res = 15.0 / R
    reps = [(0.2 + 0.3 * i, 0.1 * i, 0.04 * i) for i in range(5)]
    times = [2_000_000 + 100_000 * i for i in range(5)]
    ffts, azs, azts, T_gt = [], [], [], []
    az_grid = np.linspace(0, 2 * np.pi * (A - 1) / A, A).astype(np.float32)
    for x, y, h in reps:
        T_wr = np.eye(4)
        T_wr[:2, :2] = [[np.cos(h), -np.sin(h)], [np.sin(h), np.cos(h)]]
        T_wr[:2, 3] = [x, y]
        T_gt.append(T_wr)
        s = scan_at(T_wr, n=512)
        fft = (0.03 * rng.random((A, R)) ** 2).astype(np.float32)
        pr = np.linalg.norm(s[:, :2], axis=-1)
        pa = np.mod(np.arctan2(s[:, 1], s[:, 0]), 2 * np.pi)
        ok = pr > 0.5
        ai = np.clip((pa / (2 * np.pi / A)).astype(int), 0, A - 1)[ok]
        ri = np.clip((pr / res).astype(int), 0, R - 2)[ok]
        fft[ai, ri] = rng.uniform(0.6, 1.0, ok.sum()).astype(np.float32)
        ffts.append(fft)
        azs.append(az_grid)
        azts.append(np.zeros(A, np.float32))

    frames = {
        "fft": jnp.asarray(np.stack(ffts)),
        "azimuths": jnp.asarray(np.stack(azs)),
        "az_times": jnp.asarray(np.stack(azts)),
    }
    # Warm starts: GT perturbed by ~(0.2 m, 0.04 rad).
    T_inits = jnp.asarray(np.stack(T_gt)) @ se3_exp(jnp.asarray(
        [[0.15, -0.1, 0, 0, 0, 0.04]] * 5
    ))
    cfg = LocalizationConfig(
        detector="modified_cacfar",
        detector_kwargs=(("width", 21), ("guard", 2), ("maxr", 15.0)),
        radar_resolution=res, max_points=512, beta=0.0,
        icp_type="pt2pt", normal_threshold=1.0, refined_max_iter=50,
    )
    est_path = str(tmp_path / "loc_traj.txt")
    out = localize_sequence_to_traj(
        frames, tp.map_with_normals(), times, est_path, cfg=cfg,
        T_inits=T_inits, batch_size=4,
    )
    assert np.asarray(out["T"]).shape == (5, 4, 4)

    # --- GT CSVs (Applanix format): map = identity pose, loc = repeat poses.
    def write_csv(path, rows):
        with open(path, "w") as f:
            f.write("GPSTime,easting,northing,altitude,vel_e,vel_n,vel_u,"
                    "roll,pitch,heading\n")
            for t_us, x, y, h in rows:
                f.write(f"{t_us/1e6:.6f},{x},{y},0,0,0,0,0,0,{h}\n")

    map_csv = str(tmp_path / "map_gt.csv")
    loc_csv = str(tmp_path / "loc_gt.csv")
    write_csv(map_csv, [(1_000_000, 0.0, 0.0, 0.0)])
    write_csv(loc_csv, [(t, x, y, h) for t, (x, y, h) in zip(times, reps)])

    stats = eval_localization_run(
        est_path, map_csv, loc_csv,
        out_gt_path=str(tmp_path / "aligned_gt.txt"),
    )
    assert stats["n_frames"] == 5
    assert stats["trans_rmse"] < 0.15, stats
    assert stats["rot_rmse"] < 0.03, stats
    assert osp.exists(tmp_path / "aligned_gt.txt")


def test_localize_sequence_mesh_equals_single_device():
    """Config-5 multichip surface: sharding frames over the 8-device mesh
    must give the same trajectory as a 1-device run (and as the batched
    list-of-frames input form)."""
    import jax
    from mm_masking_tpu.localization import localize_sequence
    from mm_masking_tpu.parallel.mesh import make_mesh

    b = synthetic_batch(3, batch=8, spec=SPEC)
    frames = {
        "fft": b["loc_data"]["fft_data"],
        "azimuths": b["loc_data"]["azimuths"],
        "az_times": b["loc_data"]["az_times"],
    }
    cfg = LocalizationConfig(
        detector="modified_cacfar",
        detector_kwargs=(("width", 21), ("guard", 2), ("maxr", 15.0)),
        radar_resolution=SPEC.res, max_points=256, beta=0.0,
        icp_type="pt2pl", refined_max_iter=8,
    )
    map_pc = b["map_data"]["pc"][:1]
    out1 = localize_sequence(frames, map_pc, cfg=cfg, batch_size=8,
                             mesh=make_mesh(1))
    out8 = localize_sequence(frames, map_pc, cfg=cfg, batch_size=8,
                             mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(out8["T"]), np.asarray(out1["T"]),
                               rtol=1e-5, atol=1e-5)

    # list-of-frames input with a batch axis must NOT drop frames
    split = [
        {k: v[:5] for k, v in frames.items()},
        {k: v[5:] for k, v in frames.items()},
    ]
    out_l = localize_sequence(split, map_pc, cfg=cfg, batch_size=8)
    assert out_l["T"].shape[0] == 8
    np.testing.assert_allclose(np.asarray(out_l["T"]), np.asarray(out1["T"]),
                               rtol=1e-5, atol=1e-5)


def test_localize_cloud_sequence_matches_frame_path():
    """Pre-extracted clouds routed through localize_cloud_sequence must
    produce the same poses as the frame path produces from the same clouds
    (same registration back end: project_map → two-phase ICP → gate), and
    the matched-ratio gate must be computed, not assumed."""
    from mm_masking_tpu.localization import (
        localize_cloud_sequence,
        localize_clouds,
    )

    b = synthetic_batch(7, batch=5, spec=SPEC)
    cfg = LocalizationConfig(
        detector="modified_cacfar",
        detector_kwargs=(("width", 21), ("guard", 2), ("maxr", 15.0)),
        radar_resolution=SPEC.res, max_points=256, beta=0.0,
        icp_type="pt2pl", refined_max_iter=8, min_matched_ratio=0.3,
    )
    clouds = b["loc_data"]["filtered_pc"][..., :3]
    map_pc = b["map_data"]["pc"][:1]
    T0 = b["transforms"]["T_ml_init"]

    # direct batched call = oracle
    ref = localize_clouds(
        jnp.asarray(clouds), jnp.broadcast_to(map_pc, (5,) + map_pc.shape[1:]),
        jnp.asarray(T0), cfg=cfg)
    # chunked sequence driver (odd batch_size forces padding)
    out = localize_cloud_sequence(clouds, map_pc, cfg=cfg, T_inits=T0,
                                  batch_size=2)
    np.testing.assert_allclose(np.asarray(out["T"]), np.asarray(ref["T"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["matched_ratio"]),
                               np.asarray(ref["matched_ratio"]),
                               rtol=1e-5, atol=1e-5)
    # on-structure scenes must actually match; the gate is real
    assert float(np.asarray(out["matched_ratio"]).min()) > 0.0
    assert out["ok"].shape == (5,)

    # a 3-column map (pt2pt, no normals) must not crash: zero normals padded
    cfg_pt = LocalizationConfig(
        radar_resolution=SPEC.res, max_points=256, beta=0.0,
        icp_type="pt2pt", refined_max_iter=4, normal_threshold=1.0)
    out3 = localize_cloud_sequence(clouds, map_pc[..., :3], cfg=cfg_pt,
                                   T_inits=T0, batch_size=4)
    assert out3["T"].shape == (5, 4, 4)


def test_matched_ratio_gate_fails_on_wrong_map():
    """Frames registered against a far-away map must FAIL the gate — `ok`
    reflects the computed matched ratio (the CLI prints this count)."""
    from mm_masking_tpu.localization import localize_cloud_sequence

    b = synthetic_batch(9, batch=3, spec=SPEC)
    clouds = b["loc_data"]["filtered_pc"][..., :3]
    wrong_map = np.asarray(b["map_data"]["pc"][:1]).copy()
    valid = ~np.all(wrong_map[..., :3] == 0.0, axis=-1)
    wrong_map[..., 0] += 500.0 * valid  # shift real points far away
    cfg = LocalizationConfig(
        radar_resolution=SPEC.res, max_points=256, beta=0.0,
        icp_type="pt2pl", refined_max_iter=4, min_matched_ratio=0.5)
    out = localize_cloud_sequence(clouds, jnp.asarray(wrong_map), cfg=cfg,
                                  batch_size=3)
    assert not bool(np.asarray(out["ok"]).any())


def test_localize_sequence_learned_mask_in_the_loop():
    """A trained (here random-init) policy's UNet mask weights the ICP
    INSIDE the fused sequence program — the reference deployment forks'
    in-the-loop LibTorch mask inference (SURVEY.md §2.3 LibTorch row).
    The plumbing must equal the manual chain (mask_for_scan →
    localize_frame(weight_mask=…)) and actually change the per-point
    weights vs the uniform path."""
    import jax

    from mm_masking_tpu.config import Config, ModelConfig
    from mm_masking_tpu.localization import localize_sequence
    from mm_masking_tpu.localization.pipeline import localize_frame
    from mm_masking_tpu.models import LearnICPWeightPolicy

    b = synthetic_batch(5, batch=4, spec=SPEC)
    frames = {
        "fft": b["loc_data"]["fft_data"],
        "azimuths": b["loc_data"]["azimuths"],
        "az_times": b["loc_data"]["az_times"],
    }
    cfg = LocalizationConfig(
        detector="modified_cacfar",
        detector_kwargs=(("width", 21), ("guard", 2), ("maxr", 15.0)),
        radar_resolution=SPEC.res, max_points=256, beta=0.0,
        icp_type="pt2pl", refined_max_iter=8,
    )
    pol_cfg = Config(model=ModelConfig(
        enc_channels=(4, 8), dropout=0.0,
        res=SPEC.res, polar_shape=SPEC.polar_shape,
        cart_pixel_width=SPEC.cart_pixel_width,
        cart_resolution=SPEC.cart_resolution,
    ))
    policy = LearnICPWeightPolicy(pol_cfg)
    variables = policy.init(jax.random.PRNGKey(0))
    map_pc = b["map_data"]["pc"][:1]
    T0 = b["transforms"]["T_ml_init"]

    out_uni = localize_sequence(frames, map_pc, cfg=cfg, T_inits=T0,
                                batch_size=4)
    out_mask = localize_sequence(frames, map_pc, cfg=cfg, T_inits=T0,
                                 batch_size=4, weight_policy=policy,
                                 policy_variables=variables)

    # One chunk (F == batch_size): the fused path must equal the manual chain.
    wm = policy.mask_for_scan(variables, frames["fft"], frames["azimuths"])
    assert wm.shape == (4, SPEC.cart_pixel_width, SPEC.cart_pixel_width)
    ref = localize_frame(
        frames["fft"], frames["azimuths"], frames["az_times"],
        jnp.broadcast_to(map_pc, (4,) + map_pc.shape[1:]), T0, cfg=cfg,
        weight_mask=wm,
        mask_cart_resolution=SPEC.cart_resolution,
        mask_cart_width=SPEC.cart_pixel_width,
    )
    np.testing.assert_allclose(np.asarray(out_mask["T"]),
                               np.asarray(ref["T"]), rtol=1e-6, atol=1e-6)

    w = np.asarray(out_mask["weights"])
    pts = np.asarray(out_mask["points"])
    pad = (pts[..., 0] == 0.0) & (pts[..., 1] == 0.0)
    assert np.all(w >= 0.0) and np.all(w <= 1.0 + 1e-6)
    assert np.all(w[pad] == 0.0)  # pad points never weigh in
    # the mask actually reweights real points (uniform path gives exactly 1)
    assert np.std(w[~pad]) > 1e-3
    assert not np.allclose(np.asarray(out_uni["T"]),
                           np.asarray(out_mask["T"]))


def test_localize_sequence_learned_mask_mesh_equals_single_device():
    """The deployment path under the data mesh: learned-mask localization
    sharded over 8 devices must match the 1-device run — this pins the
    batch-global mask normalization (a cross-sample coupling, SURVEY §7d)
    lowering to GSPMD collectives inside the fused program."""
    import jax

    from mm_masking_tpu.config import Config, ModelConfig
    from mm_masking_tpu.localization import localize_sequence
    from mm_masking_tpu.models import LearnICPWeightPolicy
    from mm_masking_tpu.parallel.mesh import make_mesh

    b = synthetic_batch(7, batch=8, spec=SPEC)
    frames = {
        "fft": b["loc_data"]["fft_data"],
        "azimuths": b["loc_data"]["azimuths"],
        "az_times": b["loc_data"]["az_times"],
    }
    cfg = LocalizationConfig(
        detector="modified_cacfar",
        detector_kwargs=(("width", 21), ("guard", 2), ("maxr", 15.0)),
        radar_resolution=SPEC.res, max_points=256, beta=0.0,
        icp_type="pt2pl", refined_max_iter=8,
    )
    pol_cfg = Config(model=ModelConfig(
        enc_channels=(4, 8), dropout=0.0,
        res=SPEC.res, polar_shape=SPEC.polar_shape,
        cart_pixel_width=SPEC.cart_pixel_width,
        cart_resolution=SPEC.cart_resolution,
    ))
    policy = LearnICPWeightPolicy(pol_cfg)
    variables = policy.init(jax.random.PRNGKey(2))
    map_pc = b["map_data"]["pc"][:1]
    T0 = b["transforms"]["T_ml_init"]

    out1 = localize_sequence(frames, map_pc, cfg=cfg, T_inits=T0,
                             batch_size=8, mesh=make_mesh(1),
                             weight_policy=policy,
                             policy_variables=variables)
    out8 = localize_sequence(frames, map_pc, cfg=cfg, T_inits=T0,
                             batch_size=8, mesh=make_mesh(8),
                             weight_policy=policy,
                             policy_variables=variables)
    np.testing.assert_allclose(np.asarray(out8["T"]), np.asarray(out1["T"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out8["weights"]),
                               np.asarray(out1["weights"]),
                               rtol=1e-5, atol=1e-5)
