"""Adversarial CDR/rosbag2 decoding tests (VERDICT r4 #5).

Every prior converter test decoded bytes this repo's own ``encode_*``
helpers wrote — a self-consistent round trip. These tests attack that
circularity: messages are built byte-by-byte by an INDEPENDENT CDR writer
implemented directly from the OMG CDR rules (alignment relative to the
payload start, 4-byte encapsulation header, strings carrying their NUL),
with every padding byte poisoned to 0xAA so any mis-aligned read surfaces
as corrupted values instead of silently passing on zero padding.

Coverage per the layouts the reference's live-ROS path tolerates
(`/root/reference/mm_masking/utils/extract_pointcloud.py:16-36` reads
sensor_msgs/PointCloud2 via rclpy; field access is by NAME, so field
order/extra fields/point_step slack must all decode):

  * golden byte-level fixture (values chosen bit-exactly representable)
  * both CDR encapsulation endiannesses (0x0000 BE / 0x0001 LE)
  * big-endian point DATA (`is_bigendian`) independent of CDR endianness
  * permuted field declaration order; extra unknown fields; point_step
    slack (trailing pad inside each point record)
  * XCDR2 / PL_CDR / unknown encapsulation ids → loud refusal
  * truncation at every structural boundary → exception, never garbage
  * unknown topic type strings → UnknownSchemaError
  * VTR wrapper (PointCloudMsg: PointCloud2 + float64[6] twist) with the
    8-byte alignment gap before the twist
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from mm_masking_tpu.data.convert import (
    CdrReader,
    UnknownSchemaError,
    parse_localization_result,
    parse_pointcloud2,
    parse_pointcloud_any,
    parse_vtr_pointcloud_msg,
)

F32 = 7  # PointField.FLOAT32
U8 = 2   # PointField.UINT8


class CdrWriter:
    """Independent XCDR1 writer (built from the spec, not from the repo's
    readers/encoders). Pad bytes are 0xAA: a reader that mis-computes
    alignment reads poison, not plausible zeros."""

    def __init__(self, little: bool = True):
        self.b = bytearray(b"\x00\x01\x00\x00" if little
                           else b"\x00\x00\x00\x00")
        self.little = little

    def align(self, n: int):
        off = (len(self.b) - 4) % n
        if off:
            self.b += b"\xaa" * (n - off)

    def _prim(self, fmt: str, size: int, v):
        self.align(size)
        self.b += struct.pack(("<" if self.little else ">") + fmt, v)

    def u8(self, v): self._prim("B", 1, v)
    def u32(self, v): self._prim("I", 4, v)
    def i32(self, v): self._prim("i", 4, v)
    def i64(self, v): self._prim("q", 8, v)
    def u64(self, v): self._prim("Q", 8, v)

    def string(self, s: str):
        raw = s.encode() + b"\x00"
        self.u32(len(raw))
        self.b += raw

    def f64_array(self, arr):
        self.align(8)
        self.b += np.asarray(
            arr, dtype="<f8" if self.little else ">f8").tobytes()

    def bytes_seq(self, data: bytes):
        self.u32(len(data))
        self.b += data

    def done(self) -> bytes:
        return bytes(self.b)


# Golden values: exactly representable in f32, asymmetric per field so any
# field/offset shuffle is caught.
GOLD = np.array(
    [[1.5, -2.25, 0.125, 0.5, -0.75, 1.0],
     [100.0, 0.0625, -8.0, 0.0, 1.0, -0.5],
     [-3.5, 7.0, 2.5, -1.0, 0.25, 0.875]], dtype=np.float32)
NAMES = ["x", "y", "z", "normal_x", "normal_y", "normal_z"]


def encode_pc2(w: CdrWriter, values: np.ndarray, fields, point_step: int,
               bigendian_data: bool = False, stamp=(5, 123),
               frame: str = "radar", extra_bytes: dict | None = None):
    """Hand-build a sensor_msgs/PointCloud2 payload onto ``w``.

    fields: [(name, offset, datatype, count)] — declaration order is the
    wire order of the FIELD DESCRIPTORS only; data layout follows offsets.
    """
    n = values.shape[0]
    w.i32(stamp[0])
    w.u32(stamp[1])
    w.string(frame)
    w.u32(1)  # height
    w.u32(n)  # width
    w.u32(len(fields))
    for name, off, dt, cnt in fields:
        w.string(name)
        w.u32(off)
        w.u8(dt)
        w.u32(cnt)
    w.u8(1 if bigendian_data else 0)
    w.u32(point_step)
    w.u32(point_step * n)  # row_step
    data = bytearray(b"\xaa" * (point_step * n))  # poisoned slack
    endf = ">f4" if bigendian_data else "<f4"
    for i in range(n):
        for (name, off, dt, cnt) in fields:
            if name in NAMES and dt == F32:
                v = np.asarray(values[i, NAMES.index(name)], dtype=endf)
                data[i * point_step + off:i * point_step + off + 4] = \
                    v.tobytes()
        if extra_bytes:
            for off, payload in extra_bytes.items():
                data[i * point_step + off:
                     i * point_step + off + len(payload)] = payload
    w.bytes_seq(bytes(data))
    w.u8(0)  # is_dense
    return w


def std_fields(order=None, base_off: int = 0, step: int = 4):
    idx = order if order is not None else range(6)
    return [(NAMES[j], base_off + j * step, F32, 1) for j in idx]


def check_points(pts, values=GOLD):
    for j, name in enumerate(NAMES):
        np.testing.assert_array_equal(
            np.asarray(pts[name], np.float32), values[:, j], err_msg=name)


class TestGoldenFixture:
    def test_little_endian_golden(self):
        w = encode_pc2(CdrWriter(True), GOLD, std_fields(), 24)
        out = parse_pointcloud2(CdrReader(w.done()))
        assert out["stamp"] == 5 * 1_000_000_000 + 123
        assert out["frame_id"] == "radar"
        check_points(out["points"])

    def test_golden_first_bytes(self):
        """Byte-level spot check of the writer itself (the fixture's own
        honesty): encapsulation, stamp, frame_id length/NUL."""
        raw = encode_pc2(CdrWriter(True), GOLD, std_fields(), 24).done()
        assert raw[:4] == b"\x00\x01\x00\x00"
        assert struct.unpack_from("<i", raw, 4)[0] == 5
        assert struct.unpack_from("<I", raw, 8)[0] == 123
        assert struct.unpack_from("<I", raw, 12)[0] == 6  # len("radar\0")
        assert raw[16:22] == b"radar\x00"

    def test_big_endian_cdr(self):
        w = encode_pc2(CdrWriter(False), GOLD, std_fields(), 24)
        out = parse_pointcloud2(CdrReader(w.done()))
        assert out["stamp"] == 5 * 1_000_000_000 + 123
        check_points(out["points"])

    def test_big_endian_point_data(self):
        w = encode_pc2(CdrWriter(True), GOLD, std_fields(), 24,
                       bigendian_data=True)
        check_points(parse_pointcloud2(CdrReader(w.done()))["points"])

    def test_big_endian_cdr_and_data(self):
        w = encode_pc2(CdrWriter(False), GOLD, std_fields(), 24,
                       bigendian_data=True)
        check_points(parse_pointcloud2(CdrReader(w.done()))["points"])


class TestLayoutVariants:
    def test_permuted_field_declarations(self):
        # Descriptors declared z, normal_y, x, normal_z, y, normal_x — data
        # offsets unchanged. Name-keyed access must be order-independent.
        w = encode_pc2(CdrWriter(True), GOLD,
                       std_fields(order=[2, 4, 0, 5, 1, 3]), 24)
        check_points(parse_pointcloud2(CdrReader(w.done()))["points"])

    def test_point_step_slack(self):
        # 32-byte records: 8 bytes of poisoned slack after the 6 floats.
        w = encode_pc2(CdrWriter(True), GOLD, std_fields(), 32)
        check_points(parse_pointcloud2(CdrReader(w.done()))["points"])

    def test_extra_unknown_field(self):
        # A u8 'intensity' field lives in the slack; known fields intact.
        fields = std_fields() + [("intensity", 24, U8, 1)]
        w = encode_pc2(CdrWriter(True), GOLD, fields, 28,
                       extra_bytes={24: b"\x07"})
        pts = parse_pointcloud2(CdrReader(w.done()))["points"]
        check_points(pts)
        np.testing.assert_array_equal(np.asarray(pts["intensity"]),
                                      [7, 7, 7])

    def test_offset_gap_before_first_field(self):
        # x at offset 4 (leading pad in each record).
        w = encode_pc2(CdrWriter(True), GOLD, std_fields(base_off=4), 28)
        check_points(parse_pointcloud2(CdrReader(w.done()))["points"])

    def test_empty_cloud(self):
        w = encode_pc2(CdrWriter(True), GOLD[:0], std_fields(), 24)
        pts = parse_pointcloud2(CdrReader(w.done()))["points"]
        assert pts.shape[0] == 0

    def test_long_frame_id_alignment(self):
        # frame_id whose length breaks 4-alignment → poisoned pad before
        # the next uint32 must be skipped, not read.
        for frame in ("a", "ab", "abc", "abcd", "abcde"):
            w = encode_pc2(CdrWriter(True), GOLD, std_fields(), 24,
                           frame=frame)
            out = parse_pointcloud2(CdrReader(w.done()))
            assert out["frame_id"] == frame
            check_points(out["points"])


class TestRefusals:
    @pytest.mark.parametrize("rep_id", [0x0006, 0x0007, 0x0008, 0x0009,
                                        0x000A, 0x000B, 0x1234])
    def test_xcdr2_and_unknown_encapsulation_refused(self, rep_id):
        # XCDR2 (CDR2/D_CDR2/PL_CDR2) uses 4-byte max alignment — decoding
        # it with XCDR1 rules would silently shift every 8-byte field.
        body = encode_pc2(CdrWriter(True), GOLD, std_fields(), 24).done()[4:]
        blob = struct.pack(">HH", rep_id, 0) + body
        with pytest.raises(ValueError):
            CdrReader(blob)

    def test_unknown_topic_type_refused(self):
        blob = encode_pc2(CdrWriter(True), GOLD, std_fields(), 24).done()
        with pytest.raises(UnknownSchemaError):
            parse_pointcloud_any(blob, "mystery_pkg/msg/Mystery", topic="/t")

    def test_unknown_point_datatype_refused(self):
        # datatype 9 doesn't exist in the PointField enum.
        w = encode_pc2(CdrWriter(True), GOLD,
                       std_fields() + [("w", 24, 9, 1)], 28)
        with pytest.raises(KeyError):
            parse_pointcloud2(CdrReader(w.done()))

    def test_truncation_never_garbage(self):
        """Cut the golden blob at every length; the decoder must raise or
        (only when the cut lands beyond the last consumed byte) return the
        golden values — never return successfully with corrupt points."""
        full = encode_pc2(CdrWriter(True), GOLD, std_fields(), 24).done()
        for cut in range(4, len(full)):
            blob = full[:cut]
            try:
                out = parse_pointcloud2(CdrReader(blob))
            except Exception:
                continue  # loud failure is the contract
            check_points(out["points"])  # silent success must be correct

    def test_truncated_encapsulation(self):
        for cut in range(0, 4):
            with pytest.raises(Exception):
                CdrReader(b"\x00\x01\x00"[:cut])


class TestVtrWrapper:
    def test_wrapper_with_twist_alignment(self):
        # After is_dense (1 byte) the payload is odd-offset; the float64[6]
        # twist must consume up to 7 poisoned pad bytes first.
        xi = np.array([0.5, -0.25, 0.125, 0.0625, -0.5, 1.0])
        w = encode_pc2(CdrWriter(True), GOLD, std_fields(), 24)
        w.f64_array(xi)
        out = parse_vtr_pointcloud_msg(w.done())
        np.testing.assert_array_equal(out["xi"], xi)
        np.testing.assert_array_equal(out["points"], GOLD)

    def test_wrapper_via_dispatch(self):
        xi = np.zeros(6)
        w = encode_pc2(CdrWriter(True), GOLD, std_fields(), 24)
        w.f64_array(xi)
        out = parse_pointcloud_any(w.done(), "vtr_msgs/msg/PointCloudMsg",
                                   topic="/vtr/pointmap")
        np.testing.assert_array_equal(out["points"], GOLD)

    def test_bare_cloud_missing_normals(self):
        fields = std_fields()[:3]  # x, y, z only
        w = encode_pc2(CdrWriter(True), GOLD, fields, 12)
        out = parse_pointcloud_any(w.done(), "sensor_msgs/msg/PointCloud2",
                                   topic="/vtr/filtered_point_cloud")
        np.testing.assert_array_equal(out["points"][:, :3], GOLD[:, :3])
        np.testing.assert_array_equal(out["points"][:, 3:],
                                      np.zeros((3, 3), np.float32))


class TestLocalizationResult:
    def test_big_endian_hand_built(self):
        w = CdrWriter(False)
        w.i64(1_700_000_000_123_456_789)
        w.i64(1_700_000_000_000_000_000)
        w.u64(0x0002_0000_0005)
        T = np.arange(16, dtype=np.float64).reshape(4, 4) / 8.0
        w.f64_array(T.ravel())
        out = parse_localization_result(w.done())
        assert out["timestamp"] == 1_700_000_000_123_456_789
        assert out["vertex_timestamp"] == 1_700_000_000_000_000_000
        assert out["vertex_id"] == 0x0002_0000_0005
        np.testing.assert_array_equal(out["T_robot_vertex"], T)

    def test_truncated_refused(self):
        w = CdrWriter(True)
        w.i64(1)
        with pytest.raises(Exception):
            parse_localization_result(w.done())
