// Native preprocessing core for the host-side data loader.
//
// Role: the reference leans on detectron2's native-backed data layer and a
// CUDA extension for its hot ops (SURVEY.md §2.8); on the TPU stack the
// device-side ops are XLA/Pallas, and THIS file is the native half of the
// input pipeline: multi-threaded bilinear resize, square padding and
// float normalization of uint8 images, so image preprocessing never
// bottlenecks the host while the TPU runs.
//
// Built as a plain shared library (no pybind11 in this image) and bound via
// ctypes — see iuvl_tpu/native/__init__.py. All buffers are caller-owned
// contiguous arrays.

#include <cstdint>
#include <cstring>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Bilinear resize HWC uint8 -> uint8 (half-pixel centers, matches
// jax.image/PIL semantics used by the python fallback).
void resize_bilinear_u8(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
                        uint8_t* dst, int64_t dh, int64_t dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < dh; ++y) {
    const double fy = (y + 0.5) * sy - 0.5;
    int64_t y0 = static_cast<int64_t>(fy >= 0 ? fy : fy - 1);
    double wy = fy - y0;
    int64_t y0c = std::min(std::max(y0, int64_t{0}), sh - 1);
    int64_t y1c = std::min(y0c + 1, sh - 1);
    if (y0 < 0) { wy = 0.0; }
    for (int64_t x = 0; x < dw; ++x) {
      const double fx = (x + 0.5) * sx - 0.5;
      int64_t x0 = static_cast<int64_t>(fx >= 0 ? fx : fx - 1);
      double wx = fx - x0;
      int64_t x0c = std::min(std::max(x0, int64_t{0}), sw - 1);
      int64_t x1c = std::min(x0c + 1, sw - 1);
      if (x0 < 0) { wx = 0.0; }
      const uint8_t* p00 = src + (y0c * sw + x0c) * c;
      const uint8_t* p01 = src + (y0c * sw + x1c) * c;
      const uint8_t* p10 = src + (y1c * sw + x0c) * c;
      const uint8_t* p11 = src + (y1c * sw + x1c) * c;
      uint8_t* out = dst + (y * dw + x) * c;
      for (int64_t ch = 0; ch < c; ++ch) {
        const double top = p00[ch] * (1.0 - wx) + p01[ch] * wx;
        const double bot = p10[ch] * (1.0 - wx) + p11[ch] * wx;
        const double v = top * (1.0 - wy) + bot * wy;
        out[ch] = static_cast<uint8_t>(v + 0.5);
      }
    }
  }
}

// Resize-longest-side + zero-pad to (size, size) + optional normalize to
// float32 (mean/std per channel). dst must hold size*size*c floats.
void resize_pad_normalize(const uint8_t* src, int64_t sh, int64_t sw,
                          int64_t c, float* dst, int64_t size,
                          const float* mean, const float* std_,
                          uint8_t* scratch /* size*size*c bytes */) {
  const double scale = static_cast<double>(size) / std::max(sh, sw);
  const int64_t nh = static_cast<int64_t>(sh * scale + 0.5);
  const int64_t nw = static_cast<int64_t>(sw * scale + 0.5);
  resize_bilinear_u8(src, sh, sw, c, scratch, nh, nw);
  std::memset(dst, 0, sizeof(float) * size * size * c);
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < nh; ++y) {
    for (int64_t x = 0; x < nw; ++x) {
      const uint8_t* in = scratch + (y * nw + x) * c;
      float* out = dst + (y * size + x) * c;
      for (int64_t ch = 0; ch < c; ++ch) {
        out[ch] = (static_cast<float>(in[ch]) - mean[ch]) / std_[ch];
      }
    }
  }
}

// Batched collate: N variable-size images -> (N, size, size, c) float32.
void collate_batch(const uint8_t** srcs, const int64_t* shs,
                   const int64_t* sws, int64_t n, int64_t c, float* dst,
                   int64_t size, const float* mean, const float* std_,
                   uint8_t* scratch /* n * size*size*c bytes */) {
#pragma omp parallel for schedule(dynamic)
  for (int64_t i = 0; i < n; ++i) {
    resize_pad_normalize(srcs[i], shs[i], sws[i], c,
                         dst + i * size * size * c, size, mean, std_,
                         scratch + i * size * size * c);
  }
}

int64_t native_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
