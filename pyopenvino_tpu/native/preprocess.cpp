// Native data-loading / preprocessing core (libtpuov_native).
//
// The reference's input pipeline is cv2 calls inside each demo script
// (reference: test_googlenet_v1.py:20-27, draw-and-infer.py:56-57) and its
// weight decode is per-element struct.unpack re-run every inference
// (reference: inference_engine.py:188-199, op_plugins/Const.py:11-14).
// This module is the framework's native runtime tier for the host side of
// serving: batched image -> NCHW blob conversion and fp16 weight decode,
// multi-threaded, exposed to Python over a minimal C ABI (ctypes — no
// pybind11 in this environment).
//
// Everything here is host-side data movement; device compute stays in
// XLA/Pallas where it belongs on TPU.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1Fu;
  uint32_t mant = h & 0x3FFu;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;  // +-0
    } else {
      // subnormal: value = mant * 2^-24; normalize so the leading bit is
      // implicit → exponent = 113 - shift (E-127 = -14 - shift)
      int shift = 0;
      while (!(mant & 0x400u)) {
        mant <<= 1;
        ++shift;
      }
      mant &= 0x3FFu;
      bits = sign | ((uint32_t)(113 - shift) << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (mant << 13);  // inf / nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &bits, sizeof(f));
  return f;
}

void parallel_for(int64_t n, int nthreads, const std::function<void(int64_t, int64_t)>& fn) {
  if (nthreads <= 1 || n < 2) {
    fn(0, n);
    return;
  }
  nthreads = std::min<int64_t>(nthreads, n);
  std::vector<std::thread> threads;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(lo + chunk, n);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// Bilinear-resize one HWC uint8 image to (oh, ow) and write NCHW float32,
// optionally scaled/biased per-channel: out = px * scale + bias.
void preprocess_one(const uint8_t* img, int ih, int iw, int c, float* out,
                    int oh, int ow, const float* scale, const float* bias) {
  const float ry = oh > 1 ? (float)(ih - 1) / (float)(oh - 1) : 0.f;
  const float rx = ow > 1 ? (float)(iw - 1) / (float)(ow - 1) : 0.f;
  for (int y = 0; y < oh; ++y) {
    float fy = y * ry;
    int y0 = (int)fy;
    int y1 = std::min(y0 + 1, ih - 1);
    float wy = fy - y0;
    for (int x = 0; x < ow; ++x) {
      float fx = x * rx;
      int x0 = (int)fx;
      int x1 = std::min(x0 + 1, iw - 1);
      float wx = fx - x0;
      const uint8_t* p00 = img + (y0 * iw + x0) * c;
      const uint8_t* p01 = img + (y0 * iw + x1) * c;
      const uint8_t* p10 = img + (y1 * iw + x0) * c;
      const uint8_t* p11 = img + (y1 * iw + x1) * c;
      for (int ch = 0; ch < c; ++ch) {
        float v = (1 - wy) * ((1 - wx) * p00[ch] + wx * p01[ch]) +
                  wy * ((1 - wx) * p10[ch] + wx * p11[ch]);
        if (scale) v = v * scale[ch];
        if (bias) v = v + bias[ch];
        out[(int64_t)ch * oh * ow + (int64_t)y * ow + x] = v;
      }
    }
  }
}

}  // namespace

extern "C" {

// fp16 buffer -> fp32, parallel.  (The .bin weight-decode hot path.)
void ov_fp16_to_fp32(const uint16_t* src, float* dst, int64_t n, int nthreads) {
  parallel_for(n, nthreads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) dst[i] = half_to_float(src[i]);
  });
}

// (B, ih, iw, c) uint8 -> (B, c, oh, ow) float32 blobs, bilinear, parallel
// over the batch.  scale/bias are per-channel and may be null.
void ov_preprocess_batch(const uint8_t* imgs, int batch, int ih, int iw, int c,
                         float* out, int oh, int ow, const float* scale,
                         const float* bias, int nthreads) {
  const int64_t in_stride = (int64_t)ih * iw * c;
  const int64_t out_stride = (int64_t)c * oh * ow;
  parallel_for(batch, nthreads, [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      preprocess_one(imgs + b * in_stride, ih, iw, c, out + b * out_stride,
                     oh, ow, scale, bias);
    }
  });
}

// Gather `batch` separately-allocated float32 example blobs (each `elems`
// long) into one contiguous batch buffer — the server's stacking step,
// parallel memcpy.
void ov_stack_f32(const float** srcs, int batch, int64_t elems, float* dst,
                  int nthreads) {
  parallel_for(batch, nthreads, [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      std::memcpy(dst + b * elems, srcs[b], elems * sizeof(float));
    }
  });
}

int ov_native_abi_version() { return 1; }

}  // extern "C"
