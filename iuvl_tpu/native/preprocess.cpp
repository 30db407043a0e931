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

// ---------------------------------------------------------------------- //
// AMG host post-processing (reference sam/utils/amg.py leans on
// pycocotools' C RLE codec; SamAutomaticMaskGenerator NMS runs on-GPU via
// torchvision). Here the masks come back from the TPU as host bool arrays,
// so the NMS/RLE pass is host-native: packed-bitset IoU via popcount.
// ---------------------------------------------------------------------- //

// Greedy mask NMS on packed bitsets. bits: (n, words) uint64 rows (one
// mask's HW pixels, bit order irrelevant — only AND/popcount is used).
// order: score-descending candidate indices. Writes kept indices to
// kept_out, returns how many. Matches the numpy oracle in
// iuvl_tpu/inference/amg.py:mask_nms (zero-area masks skipped; any
// not-yet-kept mask with IoU > thresh against a kept mask is suppressed).
int64_t mask_nms_bits(const uint64_t* bits, int64_t n, int64_t words,
                      const int64_t* order, double iou_thresh,
                      int64_t* kept_out) {
  int64_t* area = new int64_t[n];
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    int64_t a = 0;
    const uint64_t* row = bits + i * words;
    for (int64_t w = 0; w < words; ++w) a += __builtin_popcountll(row[w]);
    area[i] = a;
  }
  uint8_t* suppressed = new uint8_t[n]();
  int64_t k = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t i = order[oi];
    if (suppressed[i] || area[i] == 0) continue;
    kept_out[k++] = i;
    suppressed[i] = 1;
    const uint64_t* ri = bits + i * words;
#pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < n; ++j) {
      if (suppressed[j]) continue;
      const uint64_t* rj = bits + j * words;
      int64_t inter = 0;
      for (int64_t w = 0; w < words; ++w)
        inter += __builtin_popcountll(ri[w] & rj[w]);
      const int64_t uni = area[i] + area[j] - inter;
      if (uni > 0 && static_cast<double>(inter) / uni > iou_thresh)
        suppressed[j] = 1;
    }
  }
  delete[] area;
  delete[] suppressed;
  return k;
}

// Batched uncompressed COCO RLE (column-major scan, runs alternating
// 0s/1s starting with the zero-run) for (n, h, w) uint8 masks. Each mask's
// counts go to counts_out[i*cap : i*cap+ncounts[i]]; ncounts[i] = -1 when
// a mask has more than cap runs (caller falls back to the numpy path).
void masks_to_rle_batch(const uint8_t* masks, int64_t n, int64_t h,
                        int64_t w, int32_t* counts_out, int64_t cap,
                        int64_t* ncounts) {
#pragma omp parallel
  {
    uint8_t* tr = new uint8_t[h * w];  // per-thread transpose scratch
#pragma omp for schedule(dynamic)
    for (int64_t i = 0; i < n; ++i) {
      const uint8_t* m = masks + i * h * w;
      // Tiled transpose first: a direct column-major scan touches a fresh
      // cache line per pixel (stride w); 64x64 tiles keep it resident.
      constexpr int64_t T = 64;
      for (int64_t x0 = 0; x0 < w; x0 += T)
        for (int64_t y0 = 0; y0 < h; y0 += T) {
          const int64_t x1 = std::min(x0 + T, w), y1 = std::min(y0 + T, h);
          for (int64_t x = x0; x < x1; ++x)
            for (int64_t y = y0; y < y1; ++y)
              tr[x * h + y] = m[y * w + x];
        }
      int32_t* out = counts_out + i * cap;
      int64_t nc = 0;
      uint8_t cur = 0;  // COCO RLE starts with the count of leading zeros
      int64_t run = 0;
      bool overflow = false;
      const int64_t hw = h * w;
      for (int64_t p = 0; p < hw; ++p) {
        const uint8_t v = tr[p] ? 1 : 0;
        if (v == cur) {
          ++run;
        } else {
          if (nc >= cap) { overflow = true; break; }
          out[nc++] = static_cast<int32_t>(run);
          cur = v;
          run = 1;
        }
      }
      if (!overflow && nc < cap) {
        out[nc++] = static_cast<int32_t>(run);
        ncounts[i] = nc;
      } else {
        ncounts[i] = -1;
      }
    }
    delete[] tr;
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
