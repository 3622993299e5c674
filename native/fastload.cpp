// fastload: native host-side data plumbing for the TPU input pipeline.
//
// The reference leans on cv2 + 4 torch DataLoader worker processes for its
// host-side decode path (icp_weight_dataset.py:336-343, train_icp_weights.py:
// 454-455). This library provides the same capabilities as a single
// thread-pooled C++ shared object driven through ctypes:
//
//   * png_decode_gray8   — minimal zlib-backed PNG reader (8-bit grayscale,
//                          non-interlaced: exactly the Boreas radar scans)
//   * navtech_decode     — raw Navtech byte image -> fft/azimuths/timestamps
//                          (radar layout documented at radar_utils.py:20-27)
//   * pad_cloud          — ragged (n,3) cloud -> fixed (max,3) with pad value
//   * batch_navtech_decode — thread-pooled decode of a whole batch of scans
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links zlib)
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <thread>
#include <atomic>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------- PNG decode
// Returns 0 on success. Decodes an 8-bit grayscale, non-interlaced PNG into
// out (h*w bytes). Width/height are returned through out params; if the
// provided buffer is too small (cap bytes), returns -2 and sets dims anyway.
int png_decode_gray8(const uint8_t* buf, int64_t len, uint8_t* out,
                     int64_t cap, int32_t* out_h, int32_t* out_w) {
  if (len < 8 || std::memcmp(buf, "\x89PNG\r\n\x1a\n", 8) != 0) return -1;
  int64_t pos = 8;
  int32_t W = 0, H = 0;
  int bit_depth = 0, color_type = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= len) {
    uint32_t chunk_len = (uint32_t(buf[pos]) << 24) | (uint32_t(buf[pos + 1]) << 16) |
                         (uint32_t(buf[pos + 2]) << 8) | uint32_t(buf[pos + 3]);
    const uint8_t* type = buf + pos + 4;
    const uint8_t* data = buf + pos + 8;
    if (pos + 12 + chunk_len > (uint64_t)len) return -1;
    if (!std::memcmp(type, "IHDR", 4)) {
      W = (data[0] << 24) | (data[1] << 16) | (data[2] << 8) | data[3];
      H = (data[4] << 24) | (data[5] << 16) | (data[6] << 8) | data[7];
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
      if (bit_depth != 8 || color_type != 0 || interlace != 0) return -3;
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + chunk_len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + chunk_len;
  }
  if (W <= 0 || H <= 0 || idat.empty()) return -1;
  *out_h = H;
  *out_w = W;
  if ((int64_t)W * H > cap) return -2;

  // Inflate the filtered scanlines: H * (1 + W) bytes.
  std::vector<uint8_t> raw((size_t)H * (W + 1));
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -4;
  zs.next_in = idat.data();
  zs.avail_in = (uInt)idat.size();
  zs.next_out = raw.data();
  zs.avail_out = (uInt)raw.size();
  int zr = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (zr != Z_STREAM_END && zr != Z_OK) return -4;

  // Unfilter (grayscale: bpp = 1).
  for (int y = 0; y < H; ++y) {
    const uint8_t* line = raw.data() + (size_t)y * (W + 1);
    uint8_t filter = line[0];
    const uint8_t* src = line + 1;
    uint8_t* dst = out + (size_t)y * W;
    const uint8_t* up = (y > 0) ? out + (size_t)(y - 1) * W : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(dst, src, W);
        break;
      case 1:  // Sub
        dst[0] = src[0];
        for (int x = 1; x < W; ++x) dst[x] = src[x] + dst[x - 1];
        break;
      case 2:  // Up
        for (int x = 0; x < W; ++x) dst[x] = src[x] + (up ? up[x] : 0);
        break;
      case 3:  // Average
        for (int x = 0; x < W; ++x) {
          int a = x > 0 ? dst[x - 1] : 0;
          int b = up ? up[x] : 0;
          dst[x] = src[x] + ((a + b) >> 1);
        }
        break;
      case 4: {  // Paeth
        for (int x = 0; x < W; ++x) {
          int a = x > 0 ? dst[x - 1] : 0;
          int b = up ? up[x] : 0;
          int c = (up && x > 0) ? up[x - 1] : 0;
          int p = a + b - c;
          int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
          int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
          dst[x] = src[x] + pred;
        }
        break;
      }
      default:
        return -5;
    }
  }
  return 0;
}

// ------------------------------------------------------------ Navtech decode
// raw: (H, W) uint8 row-major. Layout: bytes 0-7 LE int64 timestamp (x1000 ->
// ns), bytes 8-9 LE uint16 encoder (x 2pi/5600 -> rad), byte 10 flag, 11+ FFT
// power / 255 -> f32.
void navtech_decode(const uint8_t* raw, int32_t h, int32_t w, float* fft,
                    double* azimuths, int64_t* timestamps) {
  const double enc_scale = 2.0 * 3.14159265358979323846 / 5600.0;
  const int rbins = w - 11;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = raw + (size_t)y * w;
    int64_t ts;
    std::memcpy(&ts, row, 8);
    timestamps[y] = ts * 1000;
    uint16_t enc;
    std::memcpy(&enc, row + 8, 2);
    azimuths[y] = enc * enc_scale;
    float* frow = fft + (size_t)y * rbins;
    const uint8_t* prow = row + 11;
    for (int x = 0; x < rbins; ++x) frow[x] = prow[x] * (1.0f / 255.0f);
  }
}

// -------------------------------------------------------------- cloud padding
// src: (n, dims) f32 -> dst: (max_n, dims) with rows >= n set to pad_val.
void pad_cloud(const float* src, int64_t n, int64_t max_n, int32_t dims,
               float pad_val, float* dst) {
  int64_t copy = n < max_n ? n : max_n;
  std::memcpy(dst, src, (size_t)copy * dims * sizeof(float));
  for (int64_t i = copy; i < max_n; ++i)
    for (int32_t d = 0; d < dims; ++d) dst[i * dims + d] = pad_val;
}

// --------------------------------------------------- thread-pooled batch work
// Decode B raw Navtech scans concurrently. raws: B pointers; each (h, w).
void batch_navtech_decode(const uint8_t** raws, int32_t b, int32_t h,
                          int32_t w, float* fft, double* azimuths,
                          int64_t* timestamps, int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int32_t> next(0);
  auto work = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= b) return;
      navtech_decode(raws[i], h, w, fft + (size_t)i * h * (w - 11),
                     azimuths + (size_t)i * h, timestamps + (size_t)i * h);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(work);
  for (auto& th : pool) th.join();
}

}  // extern "C"
