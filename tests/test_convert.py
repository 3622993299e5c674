"""ROS-free converter: CDR encode (test oracle) → parse roundtrip, and a full
rosbag2-sqlite → shard conversion."""
import os
import sqlite3
import struct

import numpy as np

from mm_masking_tpu.data.convert import (
    CdrReader,
    Rosbag2Reader,
    convert_graph,
    parse_pointcloud2,
    parse_vtr_pointcloud_msg,
    se3_exp_np,
)


class CdrWriter:
    """Minimal XCDR1 little-endian encoder (test oracle for the reader)."""

    def __init__(self):
        self.buf = bytearray(b"\x00\x01\x00\x00")  # CDR_LE encapsulation

    def _align(self, size):
        off = (len(self.buf) - 4) % size
        if off:
            self.buf += b"\x00" * (size - off)

    def u8(self, v): self.buf += struct.pack("<B", v)
    def u16(self, v): self._align(2); self.buf += struct.pack("<H", v)
    def u32(self, v): self._align(4); self.buf += struct.pack("<I", v)
    def i32(self, v): self._align(4); self.buf += struct.pack("<i", v)
    def f64(self, v): self._align(8); self.buf += struct.pack("<d", v)

    def string(self, s):
        b = s.encode() + b"\x00"
        self.u32(len(b))
        self.buf += b

    def bytes_seq(self, b):
        self.u32(len(b))
        self.buf += b

    def f64_array(self, arr):
        self._align(8)
        self.buf += np.asarray(arr, "<f8").tobytes()


def encode_vtr_pointcloud(points: np.ndarray, xi: np.ndarray,
                          stamp_ns: int) -> bytes:
    """Encode the VTR pointcloud message: PointCloud2(x..normal_z) + xi[6]."""
    w = CdrWriter()
    # Header: stamp + frame_id
    w.i32(stamp_ns // 1_000_000_000)
    w.u32(stamp_ns % 1_000_000_000)
    w.string("radar")
    n = points.shape[0]
    w.u32(1)  # height
    w.u32(n)  # width
    names = ["x", "y", "z", "normal_x", "normal_y", "normal_z"]
    w.u32(len(names))
    for i, name in enumerate(names):
        w.string(name)
        w.u32(4 * i)  # offset
        w.u8(7)  # FLOAT32
        w.u32(1)  # count
    w.u8(0)  # is_bigendian
    w.u32(24)  # point_step
    w.u32(24 * n)  # row_step
    w.bytes_seq(points.astype("<f4").tobytes())
    w.u8(1)  # is_dense
    w.f64_array(xi)
    return bytes(w.buf)


def test_cdr_primitives_alignment():
    w = CdrWriter()
    w.u8(7)
    w.u32(123456)  # forces 3-byte alignment pad
    w.f64(3.5)
    w.string("hello")
    r = CdrReader(bytes(w.buf))
    assert r.uint8() == 7
    assert r.uint32() == 123456
    assert r.float64() == 3.5
    assert r.string() == "hello"


def test_pointcloud2_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 6)).astype(np.float32)
    xi = rng.normal(size=6)
    blob = encode_vtr_pointcloud(pts, xi, stamp_ns=1_234_567_890_123)
    out = parse_vtr_pointcloud_msg(blob)
    np.testing.assert_allclose(out["points"], pts, atol=1e-7)
    np.testing.assert_allclose(out["xi"], xi, atol=1e-12)
    assert out["stamp"] == 1_234_567_890_123


def make_bag(path, topic_msgs):
    conn = sqlite3.connect(path)
    c = conn.cursor()
    c.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
              "type TEXT, serialization_format TEXT, "
              "offered_qos_profiles TEXT)")
    c.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,"
              " timestamp INTEGER, data BLOB)")
    for tid, (name, msgs) in enumerate(topic_msgs.items(), start=1):
        c.execute("INSERT INTO topics VALUES (?,?,?,?,?)",
                  (tid, name, "vtr_msgs/msg/PointCloudMsg", "cdr", ""))
        for k, (ts, blob) in enumerate(msgs):
            c.execute("INSERT INTO messages VALUES (?,?,?,?)",
                      (None, tid, ts, blob))
    conn.commit()
    conn.close()


def test_convert_graph_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    graph_dir = tmp_path / "graph"
    out_dir = tmp_path / "shards"
    os.makedirs(graph_dir)

    xi_map = np.array([1.0, -0.5, 0.0, 0.0, 0.0, 0.3])
    map_pts = rng.normal(size=(80, 6)).astype(np.float32)
    frames = []
    for i in range(3):
        stamp_ns = (1_000_000 + i * 100_000) * 1000  # µs→ns (loc_stamp µs)
        pts = rng.normal(size=(40 + i, 6)).astype(np.float32)
        frames.append((stamp_ns, pts))

    topic_msgs = {
        "/vtr/radar_raw_point_cloud": [
            (ns, encode_vtr_pointcloud(p, np.zeros(6), ns)) for ns, p in frames
        ],
        "/vtr/radar_filtered_point_cloud": [
            (ns, encode_vtr_pointcloud(p, np.zeros(6), ns)) for ns, p in frames
        ],
        "/vtr/pointmap": [
            (frames[0][0], encode_vtr_pointcloud(map_pts, xi_map, 500_000_000))
        ],
    }
    make_bag(str(graph_dir / "graph_0.db3"), topic_msgs)

    index = convert_graph(str(graph_dir), str(out_dir), msg_prefix="radar_")
    assert len(index["frames"]) == 3
    assert index["max_loc"] == 42
    shard = np.load(out_dir / index["frames"][0])
    np.testing.assert_allclose(shard["raw_pc"], frames[0][1][:, :3], atol=1e-7)
    # Map points must be transformed into the map-vertex frame by exp(xi).
    T = se3_exp_np(xi_map)
    want = map_pts[:, :3] @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(shard["map_pc"][:, :3], want, atol=1e-5)
    assert int(shard["loc_stamp"]) == 1_000_000


def test_rosbag_reader(tmp_path):
    blob = encode_vtr_pointcloud(np.zeros((3, 6), np.float32), np.zeros(6), 42)
    make_bag(str(tmp_path / "b.db3"), {"/t": [(7, blob)]})
    r = Rosbag2Reader(str(tmp_path / "b.db3"))
    assert r.topics() == ["/t"]
    msgs = list(r.messages("/t"))
    assert msgs[0][0] == 7
    out = parse_pointcloud2(CdrReader(msgs[0][1]))
    assert out["points"].shape[0] == 3


# ---------------------------------------------------------------------------
# Pose-graph walk (reference semantics: icp_weight_dataset.py:150-165)
# ---------------------------------------------------------------------------
from mm_masking_tpu.data.pose_graph import (  # noqa: E402
    INVALID_ID,
    SPATIAL,
    TEMPORAL,
    GraphError,
    PoseGraph,
    encode_edge_msg,
    encode_pointmap_ptr_msg,
    encode_vertex_msg,
    vid_pack,
)


def make_typed_bag(path, topics):
    """topics: {name: (type_str, [(ts, blob), ...])}"""
    conn = sqlite3.connect(path)
    c = conn.cursor()
    c.execute("CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, "
              "type TEXT, serialization_format TEXT, "
              "offered_qos_profiles TEXT)")
    c.execute("CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,"
              " timestamp INTEGER, data BLOB)")
    for tid, (name, (type_, msgs)) in enumerate(topics.items(), start=1):
        c.execute("INSERT INTO topics VALUES (?,?,?,?,?)",
                  (tid, name, type_, "cdr", ""))
        for ts, blob in msgs:
            c.execute("INSERT INTO messages VALUES (?,?,?,?)", (None, tid, ts, blob))
    conn.commit()
    conn.close()


def _build_two_run_graph(graph_dir, rng, n_repeat=5, broken_vertex=None):
    """Teach run 0 with 2 map vertices; repeat run 1 with n_repeat vertices.

    Repeat vertices alternate spatial edges between the two teach vertices,
    whose pointmap_ptrs point at *different* map vertices. Returns
    (map clouds by teach minor, repeat stamps).
    """
    os.makedirs(graph_dir, exist_ok=True)
    teach_stamps = [100_000_000_000, 200_000_000_000]
    maps = {}
    vert_msgs, edge_msgs, ptr_msgs, map_msgs = [], [], [], []
    for minor, ts in enumerate(teach_stamps):
        vid = vid_pack(0, minor)
        vert_msgs.append((ts, encode_vertex_msg(vid, ts)))
        # pointmap_ptr points back at the teach vertex itself.
        ptr_msgs.append((ts, encode_pointmap_ptr_msg(vid)))
        pts = rng.normal(size=(30 + 10 * minor, 6)).astype(np.float32)
        maps[minor] = pts
        map_msgs.append((ts, encode_vtr_pointcloud(pts, np.zeros(6), ts)))
        if minor > 0:
            edge_msgs.append((ts, encode_edge_msg(
                minor, TEMPORAL, vid_pack(0, minor - 1), vid)))
    make_typed_bag(str(graph_dir / "run_000000.db3"), {
        "/graph/vertexes": ("vtr/Vertex", vert_msgs),
        "/graph/edges": ("vtr/Edge", edge_msgs),
        "/vtr/pointmap_ptr": ("vtr/PtrMsg", ptr_msgs),
        "/vtr/pointmap": ("vtr/PointCloudMsg", map_msgs),
    })

    rep_stamps = [(1_000_000 + i * 100_000) * 1000 for i in range(n_repeat)]
    vert_msgs, edge_msgs, raw_msgs, filt_msgs = [], [], [], []
    for i, ts in enumerate(rep_stamps):
        vid = vid_pack(1, i)
        vert_msgs.append((ts, encode_vertex_msg(vid, ts)))
        if i > 0:
            edge_msgs.append((ts, encode_edge_msg(
                100 + i, TEMPORAL, vid_pack(1, i - 1), vid)))
        if broken_vertex is None or i != broken_vertex:
            # Spatial edge to alternating teach vertices.
            edge_msgs.append((ts, encode_edge_msg(
                200 + i, SPATIAL, vid, vid_pack(0, i % 2))))
        pts = rng.normal(size=(20 + i, 6)).astype(np.float32)
        raw_msgs.append((ts, encode_vtr_pointcloud(pts, np.zeros(6), ts)))
        filt_msgs.append((ts, encode_vtr_pointcloud(pts[: 10 + i], np.zeros(6), ts)))
    make_typed_bag(str(graph_dir / "run_000001.db3"), {
        "/graph/vertexes": ("vtr/Vertex", vert_msgs),
        "/graph/edges": ("vtr/Edge", edge_msgs),
        "/vtr/radar_raw_point_cloud": ("vtr/PointCloudMsg", raw_msgs),
        "/vtr/radar_filtered_point_cloud": ("vtr/PointCloudMsg", filt_msgs),
    })
    return maps, rep_stamps


def test_graph_walk_multi_pointmap(tmp_path):
    """Frames under different teach vertices pair with different pointmaps."""
    rng = np.random.default_rng(3)
    graph_dir = tmp_path / "graph"
    out_dir = tmp_path / "shards"
    maps, rep_stamps = _build_two_run_graph(graph_dir, rng)

    index = convert_graph(str(graph_dir), str(out_dir))
    # Vertex (1,0) has an invalid incoming edge (chain start) and is skipped,
    # exactly like the reference's first-vertex skip.
    assert len(index["frames"]) == 4
    for i in (1, 2, 3, 4):
        shard = np.load(out_dir / f"frame_{rep_stamps[i] // 1000}.npz")
        want_map = maps[i % 2]
        np.testing.assert_allclose(shard["map_pc"][:, :3], want_map[:, :3],
                                   atol=1e-6)
        assert shard["raw_pc"].shape[0] == 20 + i
        assert shard["filt_pc"].shape[0] == 10 + i


def test_graph_walk_skips_malformed_vertex(tmp_path):
    """A repeat vertex with no spatial connection to the teach run is skipped
    (reference GraphError path), the rest still convert."""
    rng = np.random.default_rng(4)
    graph_dir = tmp_path / "graph"
    out_dir = tmp_path / "shards"
    _, rep_stamps = _build_two_run_graph(graph_dir, rng, broken_vertex=2)

    index = convert_graph(str(graph_dir), str(out_dir))
    assert len(index["frames"]) == 3  # 4 valid minus the malformed one
    assert f"frame_{rep_stamps[2] // 1000}.npz" not in index["frames"]


def test_graph_walk_skips_corrupt_db3(tmp_path):
    rng = np.random.default_rng(5)
    graph_dir = tmp_path / "graph"
    out_dir = tmp_path / "shards"
    _build_two_run_graph(graph_dir, rng)
    (graph_dir / "run_000002.db3").write_bytes(b"this is not a sqlite file")

    g = PoseGraph.from_dir(str(graph_dir))
    assert any("run_000002" in f for f in g.skipped_files)
    index = convert_graph(str(graph_dir), str(out_dir))
    assert len(index["frames"]) == 4


def test_closest_teach_vertex_chain(tmp_path):
    """Spatial chains through intermediate repeat runs still reach run 0."""
    g = PoseGraph()
    from mm_masking_tpu.data.pose_graph import Edge, Vertex
    for vid, ts in ((vid_pack(0, 0), 10), (vid_pack(1, 0), 20),
                    (vid_pack(2, 0), 30)):
        g.vertices[vid] = Vertex(id=vid, stamp=ts)
    # run2 → run1 → run0 spatial chain.
    g.edges.append(Edge(1, SPATIAL, vid_pack(2, 0), vid_pack(1, 0),
                        np.zeros(6)))
    g.edges.append(Edge(2, SPATIAL, vid_pack(1, 0), vid_pack(0, 0),
                        np.zeros(6)))
    teach = g.closest_teach_vertex(g.get_vertex((2, 0)))
    assert teach.id == vid_pack(0, 0)

    g2 = PoseGraph()
    g2.vertices[vid_pack(2, 0)] = Vertex(id=vid_pack(2, 0), stamp=1)
    import pytest
    with pytest.raises(GraphError):
        g2.closest_teach_vertex(g2.get_vertex((2, 0)))


def test_temporal_iterator_sentinel():
    from mm_masking_tpu.data.pose_graph import Edge, Vertex
    g = PoseGraph()
    for i in range(3):
        vid = vid_pack(1, i)
        g.vertices[vid] = Vertex(id=vid, stamp=1000 + i)
        if i > 0:
            g.edges.append(Edge(i, TEMPORAL, vid_pack(1, i - 1), vid,
                                np.zeros(6)))
    out = list(g.temporal_iterator(g.get_vertex((1, 0))))
    assert len(out) == 3
    assert out[0][1].from_id == INVALID_ID
    assert out[1][1].from_id == vid_pack(1, 0)
    assert out[2][1].from_id == vid_pack(1, 1)


# ---------------------------------------------------------------------------
# Schema dispatch on recorded `topics.type` strings
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

from mm_masking_tpu.data.convert import (  # noqa: E402
    UnknownSchemaError,
    parse_pointcloud_any,
)


def encode_bare_pointcloud2(points_xyz: np.ndarray, stamp_ns: int) -> bytes:
    """Second serialization variant: a bare sensor_msgs/msg/PointCloud2 with
    only x/y/z fields and NO VTR wrapper (no trailing xi)."""
    w = CdrWriter()
    w.i32(stamp_ns // 1_000_000_000)
    w.u32(stamp_ns % 1_000_000_000)
    w.string("radar")
    n = points_xyz.shape[0]
    w.u32(1)
    w.u32(n)
    names = ["x", "y", "z"]
    w.u32(len(names))
    for i, name in enumerate(names):
        w.string(name)
        w.u32(4 * i)
        w.u8(7)
        w.u32(1)
    w.u8(0)
    w.u32(12)
    w.u32(12 * n)
    w.bytes_seq(points_xyz.astype("<f4").tobytes())
    w.u8(1)
    return bytes(w.buf)


def test_parse_pointcloud_any_bare_pc2_variant():
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(17, 3)).astype(np.float32)
    blob = encode_bare_pointcloud2(pts, stamp_ns=77_000_000_123)
    out = parse_pointcloud_any(blob, "sensor_msgs/msg/PointCloud2")
    np.testing.assert_allclose(out["points"][:, :3], pts, atol=1e-7)
    # Missing normal fields decode as zeros; no wrapper → identity twist.
    assert np.all(out["points"][:, 3:] == 0.0)
    assert np.all(out["xi"] == 0.0)
    assert out["stamp"] == 77_000_000_123
    # The same blob under the VTR-wrapper type would mis-parse — the
    # dispatcher must pick the layout from the type string, so routing the
    # wrapper blob explicitly still works:
    wrapped = encode_vtr_pointcloud(
        np.zeros((3, 6), np.float32), np.arange(6.0), 42
    )
    out2 = parse_pointcloud_any(wrapped, "vtr_msgs/msg/PointCloudMsg")
    np.testing.assert_allclose(out2["xi"], np.arange(6.0))


def test_unknown_pointcloud_type_refused():
    blob = encode_bare_pointcloud2(np.zeros((2, 3), np.float32), 1)
    with pytest.raises(UnknownSchemaError) as ei:
        parse_pointcloud_any(blob, "std_msgs/msg/Image", topic="/vtr/x")
    # Actionable: names the topic and the offending type string.
    assert "std_msgs/msg/Image" in str(ei.value)
    assert "/vtr/x" in str(ei.value)


def test_unknown_vertex_type_refused(tmp_path):
    """A graph bag whose vertexes topic records a foreign type must fail
    loudly at load (not be silently mis-parsed or skipped as corrupt)."""
    graph_dir = tmp_path / "graph"
    os.makedirs(graph_dir)
    vid = vid_pack(1, 0)
    make_typed_bag(str(graph_dir / "run.db3"), {
        "/graph/vertexes": (
            "some_other_stack/msg/VertexInfo",
            [(10, encode_vertex_msg(vid, 10))],
        ),
    })
    with pytest.raises(UnknownSchemaError) as ei:
        PoseGraph.from_dir(str(graph_dir))
    assert "some_other_stack/msg/VertexInfo" in str(ei.value)


def test_flat_conversion_bare_pc2_bag(tmp_path):
    """Flat bags recorded as bare PointCloud2 convert via the dispatcher."""
    rng = np.random.default_rng(6)
    graph_dir = tmp_path / "graph"
    out_dir = tmp_path / "shards"
    os.makedirs(graph_dir)
    frames = []
    for i in range(2):
        ns = (2_000_000 + i * 100_000) * 1000
        frames.append((ns, rng.normal(size=(12 + i, 3)).astype(np.float32)))
    make_typed_bag(str(graph_dir / "g.db3"), {
        "/vtr/radar_filtered_point_cloud": (
            "sensor_msgs/msg/PointCloud2",
            [(ns, encode_bare_pointcloud2(p, ns)) for ns, p in frames],
        ),
    })
    index = convert_graph(str(graph_dir), str(out_dir), msg_prefix="radar_")
    assert len(index["frames"]) == 2
    shard = np.load(out_dir / index["frames"][0])
    np.testing.assert_allclose(shard["filt_pc"], frames[0][1], atol=1e-7)


def test_adjacency_cache_invalidation():
    """Edges appended after a traversal are picked up (cache keyed on count)."""
    from mm_masking_tpu.data.pose_graph import Edge, Vertex
    g = PoseGraph()
    for i in range(3):
        vid = vid_pack(1, i)
        g.vertices[vid] = Vertex(id=vid, stamp=1000 + i)
    g.edges.append(Edge(1, TEMPORAL, vid_pack(1, 0), vid_pack(1, 1),
                        np.zeros(6)))
    out = list(g.temporal_iterator(g.get_vertex((1, 0))))
    assert len(out) == 2
    g.edges.append(Edge(2, TEMPORAL, vid_pack(1, 1), vid_pack(1, 2),
                        np.zeros(6)))
    out = list(g.temporal_iterator(g.get_vertex((1, 0))))
    assert len(out) == 3
