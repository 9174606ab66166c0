// Native raster preprocessing kernels for the TPU input pipeline.
//
// Plays the role the reference delegates to rasterio/cv2 python loops
// (pretraining/utils/multimodal_dfc2023.py:10-141): per-modality
// normalization and channel-wise area resize, multithreaded over the batch
// so GeoTIFF tiles keep a v5e fed. Bound from Python via ctypes
// (incomplete_multimodal_fusion_tpu/data/native.py); a pure-numpy fallback
// with identical semantics lives next to it and parity is tested.
//
// Build: make -C native   (produces native/libraster_ops.so)
#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// Run fn(i) for i in [0, n) over a small thread pool.
void parallel_for(int64_t n, int num_threads, const std::function<void(int64_t)>& fn) {
  if (n <= 1 || num_threads <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      fn(i);
    }
  };
  int t = std::min<int64_t>(num_threads, n);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// Vectorizable log10f: exponent extraction + degree-5 minimax polynomial for
// log2 of the mantissa in [1, 2); ~2e-7 relative error, >10x faster than
// glibc log10f when gcc auto-vectorizes the loop. Valid for x > 0 (the SAR
// path guarantees x + 1e-7 > 0); returns NaN-ish garbage for x <= 0, handled
// by the caller's isfinite check.
static inline float fast_log10(float x) {
  union {
    float f;
    uint32_t i;
  } u{x};
  const int e = static_cast<int>(u.i >> 23) - 127;
  u.i = (u.i & 0x007FFFFFu) | 0x3F800000u;  // mantissa in [1, 2)
  const float m = u.f;
  // degree-7 least-squares fit of log2(m)/(m-1) on [1, 2); max err ~5e-7
  float p = -0.0122142052f;
  p = p * m + 0.1484852832f;
  p = p * m - 0.7884900135f;
  p = p * m + 2.3974439602f;
  p = p * m - 4.5998710352f;
  p = p * m + 5.8089844912f;
  p = p * m - 4.9923888430f;
  p = p * m + 3.4807447076f;
  const float log2x = p * (m - 1.0f) + static_cast<float>(e);
  return log2x * 0.30102999566f;  // log10(2)
}

}  // namespace

extern "C" {

// SAR: 10*log10(x + 1e-7), clip [-25, 0], z-score
// (multimodal_dfc2023.py:130-141; stats :36-41).
void sar_normalize(const float* in, float* out, int64_t n, float mean,
                   float std, int num_threads) {
  const int64_t chunk = 1 << 16;
  const int64_t chunks = (n + chunk - 1) / chunk;
  parallel_for(chunks, num_threads, [&](int64_t c) {
    const int64_t lo = c * chunk, hi = std::min(n, lo + chunk);
    const float inv_std = 1.0f / std;
    for (int64_t i = lo; i < hi; ++i) {
      const float x = in[i] + 1e-7f;
      float v = 10.0f * fast_log10(x);
      // numpy clip propagates NaN; nan_to_num comes after (reference order).
      // x <= 0 or non-finite input -> 0 like np.nan_to_num(log10(<=0)).
      if (!(x > 0.0f) || !std::isfinite(v)) {
        v = 0.0f;
      } else {
        v = std::min(0.0f, std::max(-25.0f, v));
      }
      out[i] = (v - mean) * inv_std;
    }
  });
}

// Per-channel z-score over [C, H*W] planes (RGB path,
// multimodal_dfc2023.py:27-33,116-126).
void channel_zscore(const float* in, float* out, int64_t channels,
                    int64_t plane, const float* mean, const float* std,
                    int num_threads) {
  parallel_for(channels, num_threads, [&](int64_t c) {
    const float m = mean[c], s = std[c];
    const float* src = in + c * plane;
    float* dst = out + c * plane;
    for (int64_t i = 0; i < plane; ++i) {
      float v = src[i];
      if (!std::isfinite(v)) v = 0.0f;
      dst[i] = (v - m) / s;
    }
  });
}

// Per-image standardize: (x - mean) / sqrt(var + 1e-6)
// (DSM path, multimodal_dfc2023.py:99-112). NaNs -> 0 first.
void standardize(const float* in, float* out, int64_t n, int num_threads) {
  (void)num_threads;
  double sum = 0.0, sq = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    float v = std::isfinite(in[i]) ? in[i] : 0.0f;
    sum += v;
    sq += static_cast<double>(v) * v;
  }
  const double mean = sum / n;
  const double var = sq / n - mean * mean;
  const float inv = 1.0f / std::sqrt(static_cast<float>(var) + 1e-6f);
  for (int64_t i = 0; i < n; ++i) {
    float v = std::isfinite(in[i]) ? in[i] : 0.0f;
    out[i] = (v - static_cast<float>(mean)) * inv;
  }
}

// Channel-wise integer-factor box-average resize [C, H, W] -> [C, h, w]
// (resiz_4pl INTER_AREA role, multimodal_dfc2023.py:10-16).
void box_resize(const float* in, float* out, int64_t channels, int64_t h_in,
                int64_t w_in, int64_t h_out, int64_t w_out, int num_threads) {
  const int64_t fy = h_in / h_out, fx = w_in / w_out;
  parallel_for(channels, num_threads, [&](int64_t c) {
    const float* src = in + c * h_in * w_in;
    float* dst = out + c * h_out * w_out;
    if (fy * h_out == h_in && fx * w_out == w_in && fy > 0 && fx > 0) {
      const float inv = 1.0f / static_cast<float>(fy * fx);
      for (int64_t y = 0; y < h_out; ++y) {
        for (int64_t x = 0; x < w_out; ++x) {
          float acc = 0.0f;
          for (int64_t dy = 0; dy < fy; ++dy) {
            const float* row = src + (y * fy + dy) * w_in + x * fx;
            for (int64_t dx = 0; dx < fx; ++dx) acc += row[dx];
          }
          dst[y * w_out + x] = acc * inv;
        }
      }
    } else {  // nearest fallback for non-integer factors
      for (int64_t y = 0; y < h_out; ++y) {
        const int64_t sy = y * h_in / h_out;
        for (int64_t x = 0; x < w_out; ++x) {
          const int64_t sx = x * w_in / w_out;
          dst[y * w_out + x] = src[sy * w_in + sx];
        }
      }
    }
  });
}

// Batched end-to-end tile prep: SAR normalize the whole [B, ...] batch in
// one call (amortizes the ctypes crossing; one thread per tile).
void sar_normalize_batch(const float* in, float* out, int64_t batch,
                         int64_t per_tile, float mean, float std,
                         int num_threads) {
  parallel_for(batch, num_threads, [&](int64_t b) {
    sar_normalize(in + b * per_tile, out + b * per_tile, per_tile, mean, std, 1);
  });
}

void standardize_batch(const float* in, float* out, int64_t batch,
                       int64_t per_tile, int num_threads) {
  parallel_for(batch, num_threads, [&](int64_t b) {
    standardize(in + b * per_tile, out + b * per_tile, per_tile, 1);
  });
}

// Fused single-pass RGB prep: raw uint8 HWC pixels (straight from the TIFF
// strip buffer) -> normalized float32 HWC, written into a caller-provided
// destination (the batch buffer slot). Replaces four numpy passes
// (astype + nan_to_num + subtract + divide) with one read + one write —
// the single-core input pipeline is memory-bound, so pass count IS the
// throughput (multimodal_dfc2023.py:116-126 semantics).
void rgb_u8_hwc_normalize(const unsigned char* in, float* out, int64_t npix,
                          const float* mean, const float* std) {
  const float m0 = mean[0], m1 = mean[1], m2 = mean[2];
  const float i0 = 1.0f / std[0], i1 = 1.0f / std[1], i2 = 1.0f / std[2];
  for (int64_t p = 0; p < npix; ++p) {
    out[3 * p + 0] = (static_cast<float>(in[3 * p + 0]) - m0) * i0;
    out[3 * p + 1] = (static_cast<float>(in[3 * p + 1]) - m1) * i1;
    out[3 * p + 2] = (static_cast<float>(in[3 * p + 2]) - m2) * i2;
  }
}

// uint16 variant (DFC2023 distributes some RGB tiles as uint16).
void rgb_u16_hwc_normalize(const unsigned short* in, float* out, int64_t npix,
                           const float* mean, const float* std) {
  const float m0 = mean[0], m1 = mean[1], m2 = mean[2];
  const float i0 = 1.0f / std[0], i1 = 1.0f / std[1], i2 = 1.0f / std[2];
  for (int64_t p = 0; p < npix; ++p) {
    out[3 * p + 0] = (static_cast<float>(in[3 * p + 0]) - m0) * i0;
    out[3 * p + 1] = (static_cast<float>(in[3 * p + 1]) - m1) * i1;
    out[3 * p + 2] = (static_cast<float>(in[3 * p + 2]) - m2) * i2;
  }
}

}  // extern "C"
