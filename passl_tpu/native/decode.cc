// Native JPEG decode + random-resized-crop worker for the input
// pipeline — the TPU-world replacement for the reference's reliance on
// Paddle's C++ DataLoader workers / DALI (passl/data/__init__.py:72-80).
//
// Exposed C API (ctypes, GIL released during calls):
//   passl_jpeg_size(buf, n, &w, &h)            -> 0 on success
//   passl_decode_crop_resize(buf, n, x, y, cw, ch, out_size, flip, out)
//       decode (DCT-scaled to the smallest size covering the crop),
//       crop [x,y,cw,ch] in ORIGINAL image coordinates, bilinear-resize
//       to out_size x out_size RGB uint8 (HWC), optional horizontal flip.
//   passl_decode_batch(...)                    same, batched with an
//       internal thread pool (for many-core hosts with num_workers=0).
//
// The DCT scaling is the speed win: for a typical 0.08-1.0 scale RRC on
// a 1500px JPEG resized to 224, libjpeg can decode at 1/2..1/8 scale,
// skipping most of the IDCT + color conversion work.
#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize RGB uint8 HWC (src region already cropped).
void resize_bilinear(const uint8_t* src, int sw, int sh, int stride,
                     uint8_t* dst, int ow, int oh, bool flip) {
  const float fx = static_cast<float>(sw) / ow;
  const float fy = static_cast<float>(sh) / oh;
  for (int y = 0; y < oh; ++y) {
    float syf = (y + 0.5f) * fy - 0.5f;
    int sy0 = static_cast<int>(std::floor(syf));
    float wy = syf - sy0;
    int sy1 = std::min(sy0 + 1, sh - 1);
    sy0 = std::max(sy0, 0);
    const uint8_t* row0 = src + static_cast<size_t>(sy0) * stride;
    const uint8_t* row1 = src + static_cast<size_t>(sy1) * stride;
    uint8_t* out_row = dst + static_cast<size_t>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      float sxf = (x + 0.5f) * fx - 0.5f;
      int sx0 = static_cast<int>(std::floor(sxf));
      float wx = sxf - sx0;
      int sx1 = std::min(sx0 + 1, sw - 1);
      sx0 = std::max(sx0, 0);
      int xo = flip ? (ow - 1 - x) : x;
      for (int c = 0; c < 3; ++c) {
        float top = row0[sx0 * 3 + c] * (1 - wx) + row0[sx1 * 3 + c] * wx;
        float bot = row1[sx0 * 3 + c] * (1 - wx) + row1[sx1 * 3 + c] * wx;
        float v = top * (1 - wy) + bot * wy;
        out_row[xo * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

int passl_jpeg_size(const uint8_t* buf, size_t n, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, n);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Crop box (x, y, cw, ch) is in ORIGINAL image coordinates.
int passl_decode_crop_resize(const uint8_t* buf, size_t n, int x, int y,
                             int cw, int ch, int out_size, int flip,
                             uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, n);
  jpeg_read_header(&cinfo, TRUE);

  // DCT-scale: decode at the coarsest 1/1..1/8 scale that still gives
  // the crop at least out_size pixels on each side.
  int denom = 1;
  while (denom < 8 && (cw / (denom * 2) >= out_size) &&
         (ch / (denom * 2) >= out_size)) {
    denom *= 2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int dw = cinfo.output_width;
  const int dh = cinfo.output_height;
  const int stride = dw * 3;
  std::vector<uint8_t> full(static_cast<size_t>(stride) * dh);
  // decode only the rows covering the (scaled) crop
  int sy = std::max(0, y / denom);
  int sh_end = std::min(dh, (y + ch + denom - 1) / denom);
  JSAMPROW rowptr[1];
  while (static_cast<int>(cinfo.output_scanline) < sh_end) {
    int line = cinfo.output_scanline;
    rowptr[0] = full.data() + static_cast<size_t>(line) * stride;
    jpeg_read_scanlines(&cinfo, rowptr, 1);
  }
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  int sx = std::max(0, x / denom);
  int scw = std::min(dw - sx, std::max(1, cw / denom));
  int sch = std::min(sh_end - sy, std::max(1, ch / denom));
  const uint8_t* crop_ptr = full.data() + static_cast<size_t>(sy) * stride + sx * 3;
  resize_bilinear(crop_ptr, scw, sch, stride, out, out_size, out_size,
                  flip != 0);
  return 0;
}

// Batched variant with an internal thread pool. Arrays of per-image
// buffer pointers/lengths/boxes; out is [count, out_size, out_size, 3].
int passl_decode_batch(const uint8_t** bufs, const size_t* lens,
                       const int* boxes /* count*4: x,y,cw,ch */,
                       const int* flips, int count, int out_size,
                       int num_threads, uint8_t* out) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t img_bytes =
      static_cast<size_t>(out_size) * out_size * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= count) break;
      int rc = passl_decode_crop_resize(
          bufs[i], lens[i], boxes[i * 4], boxes[i * 4 + 1], boxes[i * 4 + 2],
          boxes[i * 4 + 3], out_size, flips[i], out + img_bytes * i);
      if (rc != 0) failures.fetch_add(1);
    }
  };
  int nt = std::max(1, num_threads);
  std::vector<std::thread> pool;
  pool.reserve(nt - 1);
  for (int t = 0; t < nt - 1; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
