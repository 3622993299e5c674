"""Native fastload library vs numpy reference paths."""
import io
import numpy as np
import pytest

from mm_masking_tpu.data import native
from mm_masking_tpu.ops import load_radar

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libfastload.so not built"
)


def make_raw_scan(seed=0, A=16, W=64):
    rng = np.random.default_rng(seed)
    raw = np.zeros((A, 11 + W), np.uint8)
    ts = rng.integers(1, 2**40, A).astype(np.int64)
    raw[:, :8] = np.frombuffer(ts.tobytes(), np.uint8).reshape(A, 8)
    enc = rng.integers(0, 5600, A).astype(np.uint16)
    raw[:, 8:10] = np.frombuffer(enc.tobytes(), np.uint8).reshape(A, 2)
    raw[:, 11:] = rng.integers(0, 256, (A, W)).astype(np.uint8)
    return raw


def test_navtech_decode_matches_numpy():
    raw = make_raw_scan()
    fft_n, az_n, ts_n = native.navtech_decode(raw)
    fft_p, az_p, ts_p = load_radar(raw)
    np.testing.assert_allclose(fft_n, fft_p, atol=1e-7)
    np.testing.assert_allclose(az_n, az_p, atol=1e-12)
    np.testing.assert_array_equal(ts_n, ts_p)


def test_batch_decode_threads():
    raws = [make_raw_scan(seed=i) for i in range(6)]
    fft, az, ts = native.batch_navtech_decode(raws, n_threads=3)
    for i, r in enumerate(raws):
        f, a, t = load_radar(r)
        np.testing.assert_allclose(fft[i], f, atol=1e-7)
        np.testing.assert_array_equal(ts[i], t)


def test_png_decode_matches_writer():
    # Round-trip through a PNG encoder (zlib + filter 0) written here.
    import struct
    import zlib

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 53)).astype(np.uint8)

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    scanlines = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b""))

    out = native.png_decode_gray8(png)
    np.testing.assert_array_equal(out, img)


def test_pad_cloud():
    rng = np.random.default_rng(4)
    src = rng.normal(size=(10, 3)).astype(np.float32)
    out = native.pad_cloud(src, 16, pad_val=7.5)
    np.testing.assert_array_equal(out[:10], src)
    assert np.all(out[10:] == 7.5)
