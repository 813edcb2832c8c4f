// Native batch image decoder for the semanticlens_tpu input pipeline.
//
// The reference's input path is torchvision's PIL loader inside DataLoader
// workers (reference activation_based.py:344-349). This library is the
// TPU-host equivalent: a C++ thread pool decoding JPEGs straight into one
// caller-owned contiguous uint8 batch buffer — the exact layout the engine
// uploads — with libjpeg DCT-domain prescaling (decode at 1/2..1/8 size when
// the target is small) and a separable bilinear resize + center crop.
//
// Exposed as a tiny C ABI for ctypes (no pybind11 in this image):
//   sl_decode_batch(paths, n, out, target, threads, fail_flags) -> n_failed
//   sl_version() -> int
//
// Python side: semanticlens_tpu/data/native_decoder.py (builds this file on
// first use via g++ if the shared object is missing; falls back to PIL).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<ErrorMgr*>(cinfo->err)->jump, 1);
}

void on_message(j_common_ptr) {}  // silence libjpeg warnings

// Separable bilinear resize, RGB8. src is h*w*3, dst is oh*ow*3.
void resize_bilinear(const uint8_t* src, int w, int h, uint8_t* dst, int ow, int oh) {
  const float sx = static_cast<float>(w) / ow;
  const float sy = static_cast<float>(h) / oh;
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> fx(ow);
  for (int x = 0; x < ow; ++x) {
    float cx = (x + 0.5f) * sx - 0.5f;
    cx = std::max(0.0f, std::min(cx, static_cast<float>(w - 1)));
    x0[x] = static_cast<int>(cx);
    x1[x] = std::min(x0[x] + 1, w - 1);
    fx[x] = cx - x0[x];
  }
  for (int y = 0; y < oh; ++y) {
    float cy = (y + 0.5f) * sy - 0.5f;
    cy = std::max(0.0f, std::min(cy, static_cast<float>(h - 1)));
    const int y0 = static_cast<int>(cy);
    const int y1 = std::min(y0 + 1, h - 1);
    const float fy = cy - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * w * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * w * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      const int a = x0[x] * 3, b = x1[x] * 3;
      const float gx = fx[x];
      for (int c = 0; c < 3; ++c) {
        const float top = r0[a + c] + (r0[b + c] - r0[a + c]) * gx;
        const float bot = r1[a + c] + (r1[b + c] - r1[a + c]) * gx;
        out[x * 3 + c] = static_cast<uint8_t>(top + (bot - top) * fy + 0.5f);
      }
    }
  }
}

// Decode one JPEG to target×target×3 uint8 (shorter-side resize, center crop).
bool decode_one(const char* path, uint8_t* out, int target) {
  FILE* f = std::fopen(path, "rb");
  if (f == nullptr) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = on_error;
  err.pub.output_message = on_message;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // DCT-domain prescale: largest num/8 whose shorter side still covers the
  // target, so the IDCT does most of the downscaling for free.
  unsigned shorter = std::min(cinfo.image_width, cinfo.image_height);
  int num = 8;
  while (num > 1 && shorter * static_cast<unsigned>(num - 1) / 8 >= static_cast<unsigned>(target)) {
    --num;
  }
  cinfo.scale_num = static_cast<unsigned>(num);
  cinfo.scale_denom = 8;

  jpeg_start_decompress(&cinfo);
  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  std::vector<uint8_t> raw(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = raw.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  const bool gray = cinfo.out_color_components == 1;
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  if (gray) return false;  // out_color_space=RGB should prevent this

  // shorter-side resize to target, then center crop target×target
  const float scale = static_cast<float>(target) / std::min(w, h);
  const int rw = std::max(target, static_cast<int>(std::lround(w * scale)));
  const int rh = std::max(target, static_cast<int>(std::lround(h * scale)));
  std::vector<uint8_t> resized(static_cast<size_t>(rw) * rh * 3);
  resize_bilinear(raw.data(), w, h, resized.data(), rw, rh);
  const int ox = (rw - target) / 2;
  const int oy = (rh - target) / 2;
  for (int y = 0; y < target; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * target * 3,
                resized.data() + (static_cast<size_t>(oy + y) * rw + ox) * 3,
                static_cast<size_t>(target) * 3);
  }
  return true;
}

}  // namespace

extern "C" {

int sl_version() { return 1; }

// Decode n files into out (n × target × target × 3, contiguous uint8).
// fail_flags (length n) gets 1 for every file that failed (caller re-decodes
// those via its fallback). Returns the number of failures.
int sl_decode_batch(const char** paths, int n, uint8_t* out, int target,
                    int threads, uint8_t* fail_flags) {
  if (n <= 0 || target <= 0) return 0;
  std::memset(fail_flags, 0, static_cast<size_t>(n));
  const size_t stride = static_cast<size_t>(target) * target * 3;
  std::atomic<int> next{0};
  std::atomic<int> failed{0};

  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      if (!decode_one(paths[i], out + stride * i, target)) {
        fail_flags[i] = 1;
        failed.fetch_add(1);
      }
    }
  };

  const int t = std::max(1, std::min(threads, n));
  if (t == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(static_cast<size_t>(t));
    for (int i = 0; i < t; ++i) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failed.load();
}

}  // extern "C"
