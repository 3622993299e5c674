"""GT-extraction tools: trajectory roundtrip, alignment, error stats."""
import numpy as np

from mm_masking_tpu.data.boreas import yawPitchRollToRot, get_inverse_tf
from mm_masking_tpu.evaluation.gt_tools import (
    align_gt_to_traj,
    check_time_match,
    eval_localization_run,
    read_traj_file,
    write_traj_file,
)


def make_T(x, y, h):
    T = np.eye(4)
    T[:3, :3] = yawPitchRollToRot(h, 0, 0)
    T[:3, 3] = [x, y, 0]
    return T


def test_traj_roundtrip(tmp_path):
    poses = [make_T(1.0, 2.0, 0.3), make_T(-1.0, 0.5, -0.2)]
    times = [1_000_000, 1_100_000]
    p = str(tmp_path / "traj.txt")
    write_traj_file(p, poses, times)
    poses2, times2 = read_traj_file(p)
    assert times2 == times
    np.testing.assert_allclose(poses2[0], poses[0], atol=1e-8)


def test_time_match_and_alignment():
    gt_times = [1000, 2000, 3000]
    gt_poses = [make_T(i, 0, 0) for i in range(3)]
    assert check_time_match([1000, 3000], gt_times)
    assert not check_time_match([1500], gt_times)
    poses, times = align_gt_to_traj([2000, 1000], gt_poses, gt_times, tol_us=0)
    assert times == [2000, 1000]
    np.testing.assert_allclose(poses[0], gt_poses[1])


def test_eval_localization_run(tmp_path):
    # Build GT CSVs + a perfect estimated trajectory; errors must be ~0.
    def write_csv(path, rows):
        with open(path, "w") as f:
            f.write("GPSTime,easting,northing,altitude,ve,vn,vu,"
                    "roll,pitch,heading\n")
            for t_us, x, y, h in rows:
                f.write(f"{t_us/1e6:.6f},{x},{y},0,0,0,0,0,0,{h}\n")

    map_csv = str(tmp_path / "map.csv")
    loc_csv = str(tmp_path / "loc.csv")
    write_csv(map_csv, [(500_000, 5.0, 3.0, 0.1)])
    loc_rows = [(1_000_000 + 100_000 * i, 5.0 + 0.3 * i, 3.0, 0.1 + 0.02 * i)
                for i in range(4)]
    write_csv(loc_csv, loc_rows)

    T_enu_map = make_T(5.0, 3.0, 0.1)
    est_poses, est_times = [], []
    for t_us, x, y, h in loc_rows:
        T_enu_loc = make_T(x, y, h)
        est_poses.append(get_inverse_tf(T_enu_loc) @ T_enu_map)
        est_times.append(t_us)
    est_path = str(tmp_path / "est.txt")
    write_traj_file(est_path, est_poses, est_times)

    stats = eval_localization_run(est_path, map_csv, loc_csv,
                                  out_gt_path=str(tmp_path / "gt_out.txt"))
    assert stats["n_frames"] == 4
    assert stats["rot_rmse"] < 1e-6
    assert stats["trans_rmse"] < 1e-6
    # Aligned GT file written and readable.
    poses, times = read_traj_file(str(tmp_path / "gt_out.txt"))
    assert len(poses) == 4

    # Per-sequence reporting surface (VERDICT r4 #9): the pyboreas
    # plot_loc_stats-style error-over-trajectory figure + CSV table.
    stats_p = eval_localization_run(
        est_path, map_csv, loc_csv,
        plots_dir=str(tmp_path / "plots"), seq_name="val_seq")
    assert set(stats_p["plots"]) == {"png", "csv"}
    import os
    assert os.path.getsize(stats_p["plots"]["png"]) > 1000
    rows = open(stats_p["plots"]["csv"]).read().strip().splitlines()
    assert rows[0] == "time_us,longitudinal_m,lateral_m,heading_rad"
    assert len(rows) == 5  # header + 4 frames
    # perfect trajectory -> all error components ~0
    for r in rows[1:]:
        _, lon, lat, rot = r.split(",")
        assert abs(float(lon)) < 1e-6 and abs(float(lat)) < 1e-6
        assert abs(float(rot)) < 1e-6
    assert stats_p["trans_p90"] < 1e-6 and stats_p["trans_max"] < 1e-6


def test_pc_bin_roundtrip(tmp_path):
    from mm_masking_tpu.data.boreas import dump_pc_to_file, load_pc_from_file

    rng = np.random.default_rng(0)
    pc = rng.normal(size=(17, 6)).astype(np.float32)
    p = str(tmp_path / "cloud.bin")
    dump_pc_to_file(pc, p)
    out = load_pc_from_file(p)
    np.testing.assert_array_equal(out, pc)
    # 3-column clouds get zero normals.
    dump_pc_to_file(pc[:, :3], p)
    out = load_pc_from_file(p)
    np.testing.assert_array_equal(out[:, :3], pc[:, :3])
    assert np.all(out[:, 3:] == 0)


def test_eval_odometry_run(tmp_path):
    from mm_masking_tpu.evaluation.gt_tools import eval_odometry_run

    def write_csv(path, rows):
        with open(path, "w") as f:
            f.write("GPSTime,easting,northing,altitude,ve,vn,vu,"
                    "roll,pitch,heading\n")
            for t_us, x, y, h in rows:
                f.write(f"{t_us/1e6:.6f},{x},{y},0,0,0,0,0,0,{h}\n")

    rows = [(1_000_000 + 100_000 * i, 0.4 * i, 0.1 * i, 0.02 * i)
            for i in range(4)]
    csv = str(tmp_path / "odo.csv")
    write_csv(csv, rows)
    # Perfect estimate: relative transform of each frame to its own closest GT
    # is identity.
    est_poses, est_times = [], []
    for t_us, x, y, h in rows:
        est_poses.append(np.eye(4))
        est_times.append(t_us)
    est = str(tmp_path / "est.txt")
    write_traj_file(est, est_poses, est_times)
    stats = eval_odometry_run(est, csv)
    assert stats["n_frames"] == 4
    assert stats["trans_rmse"] < 1e-9


def test_extract_localization_gt_from_bag(tmp_path):
    """v1 GT path: localization_result messages decoded straight from a bag
    and joined with Applanix GT (`utils/extract_odo_gt.py` flow)."""
    import sqlite3

    import numpy as np

    from mm_masking_tpu.data.convert import (
        encode_localization_result,
        parse_localization_result,
    )
    from mm_masking_tpu.evaluation.gt_tools import extract_localization_gt

    # Round-trip the codec first.
    blob = encode_localization_result(123_456_789_000, 987_000_000, 42,
                                      np.diag([1.0, 1.0, 1.0, 1.0]))
    msg = parse_localization_result(blob)
    assert msg["timestamp"] == 123_456_789_000
    assert msg["vertex_timestamp"] == 987_000_000
    assert msg["vertex_id"] == 42
    np.testing.assert_array_equal(msg["T_robot_vertex"], np.eye(4))

    # GT CSVs: loc at (x=1..3), map vertex fixed at origin with heading 0.2.
    loc_times_us = [2_000_000 + i * 250_000 for i in range(3)]
    map_time_us = 1_000_000

    def write_csv(path, rows):
        with open(path, "w") as f:
            f.write("GPSTime,easting,northing,altitude,vel_e,vel_n,vel_u,"
                    "roll,pitch,heading\n")
            for t_us, x, y, h in rows:
                f.write(f"{t_us/1e6:.6f},{x},{y},0,0,0,0,0,0,{h}\n")

    loc_csv = str(tmp_path / "loc.csv")
    map_csv = str(tmp_path / "map.csv")
    write_csv(loc_csv, [(t, 1.0 + i, 0.5, 0.0)
                        for i, t in enumerate(loc_times_us)])
    write_csv(map_csv, [(map_time_us, 0.0, 0.0, 0.2)])

    # Bag: 3 result messages + one with an unmatched timestamp (skipped).
    bag = str(tmp_path / "localization_result_0.db3")
    conn = sqlite3.connect(bag)
    c = conn.cursor()
    c.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
              "type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)")
    c.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,"
              " timestamp INTEGER, data BLOB)")
    c.execute("INSERT INTO topics VALUES (1, 'localization_result', "
              "'vtr_msgs/msg/LocalizationResult', 'cdr', '')")
    for i, t_us in enumerate(loc_times_us):
        c.execute("INSERT INTO messages VALUES (?,?,?,?)", (None, 1, t_us * 1000,
                  encode_localization_result(t_us * 1000, map_time_us * 1000, 7)))
    c.execute("INSERT INTO messages VALUES (?,?,?,?)", (None, 1, 999,
              encode_localization_result(999_999_999_999_000, map_time_us * 1000, 7)))
    conn.commit()
    conn.close()

    out = str(tmp_path / "gt" / "out.txt")
    n = extract_localization_gt(bag, loc_csv, map_csv, out)
    assert n == 3  # unmatched message skipped

    rows = [line.split() for line in open(out)]
    assert len(rows) == 3
    assert int(rows[0][0]) == loc_times_us[0]
    assert int(rows[0][1]) == map_time_us
    # Row carries inv(T_enu_loc) @ T_enu_map: for loc at (1, 0.5, yaw 0) and
    # map at (0, 0, yaw 0.2) the translation is (-1, -0.5).
    T = np.asarray([float(v) for v in rows[0][2:14]]).reshape(3, 4)
    np.testing.assert_allclose(T[:2, 3], [-1.0, -0.5], atol=1e-9)
    np.testing.assert_allclose(T[0, 0], np.cos(0.2), atol=1e-9)
