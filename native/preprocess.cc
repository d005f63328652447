// Native host-side image preprocessing for the data loader (SURVEY.md §2.8).
//
// Real datasets arrive as variably-sized images; XLA needs static shapes, so
// the ragged->fixed step (square crop + bilinear resize + normalize) must run
// on the host. This is that hot loop as multithreaded C++ (the reference does
// it in Python/cv2 inside its generator): one pass per output pixel, batch
// rows fanned across a thread pool, uint8 source -> float32 [-1, 1] output.
//
// Exposed as a plain C ABI consumed via ctypes (data/native_preprocess.py);
// no Python headers needed.
//
// Build: make -C native   (produces libilps_preprocess.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cmath>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline float lerp(float a, float b, float t) { return a + (b - a) * t; }

// Bilinear sample of channel c at (y, x); zero outside the image (matches
// the on-device path, where scale_and_translate zero-fills).
inline float sample(const uint8_t* img, int h, int w, int channels, float y,
                    float x, int c) {
  if (y < 0.0f || y > h - 1.0f || x < 0.0f || x > w - 1.0f) return 0.0f;
  const int y0 = static_cast<int>(y);
  const int x0 = static_cast<int>(x);
  const int y1 = std::min(y0 + 1, h - 1);
  const int x1 = std::min(x0 + 1, w - 1);
  const float ty = y - y0;
  const float tx = x - x0;
  const float v00 = img[(y0 * w + x0) * channels + c];
  const float v01 = img[(y0 * w + x1) * channels + c];
  const float v10 = img[(y1 * w + x0) * channels + c];
  const float v11 = img[(y1 * w + x1) * channels + c];
  return lerp(lerp(v00, v01, tx), lerp(v10, v11, tx), ty);
}

// Nearest-neighbor sample (for label masks); zero (= background) outside.
// Half-up rounding (floor(x+0.5)) — the tie-break every path (C++, numpy
// reference, on-device gather) agrees on; lround/np.round disagree at .5.
inline uint8_t sample_nn(const uint8_t* img, int h, int w, float y, float x) {
  const int yi = static_cast<int>(std::floor(y + 0.5f));
  const int xi = static_cast<int>(std::floor(x + 0.5f));
  if (yi < 0 || yi >= h || xi < 0 || xi >= w) return 0;
  return img[yi * w + xi];
}

void parallel_for(int n, int num_threads, const std::function<void(int)>& fn) {
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> threads;
  const int workers = std::min(num_threads, n);
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    threads.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Batched square crop + bilinear resize + normalize to [-1, 1].
//
// images:  concatenated uint8 HWC buffers (per-image offsets/shapes below)
// offsets: [batch] element offsets into `images`
// heights/widths: [batch] source dims (channels fixed = 3)
// bboxes:  [batch, 3] float32 (cy, cx, size) in source pixels
// out:     [batch, out_size, out_size, 3] float32
void ilps_crop_resize_normalize(const uint8_t* images, const int64_t* offsets,
                                const int32_t* heights, const int32_t* widths,
                                const float* bboxes, int batch, int out_size,
                                float* out, int num_threads) {
  parallel_for(batch, num_threads, [&](int b) {
    const uint8_t* img = images + offsets[b];
    const int h = heights[b];
    const int w = widths[b];
    const float cy = bboxes[b * 3 + 0];
    const float cx = bboxes[b * 3 + 1];
    const float size = bboxes[b * 3 + 2];
    const float step = size / out_size;
    const float y_start = cy - size * 0.5f;
    const float x_start = cx - size * 0.5f;
    float* dst = out + static_cast<int64_t>(b) * out_size * out_size * 3;
    for (int oy = 0; oy < out_size; ++oy) {
      const float sy = y_start + (oy + 0.5f) * step - 0.5f;
      for (int ox = 0; ox < out_size; ++ox) {
        const float sx = x_start + (ox + 0.5f) * step - 0.5f;
        for (int c = 0; c < 3; ++c) {
          const float v = sample(img, h, w, 3, sy, sx, c);
          dst[(oy * out_size + ox) * 3 + c] = v * (1.0f / 127.5f) - 1.0f;
        }
      }
    }
  });
}

// Same geometry for single-channel label masks, nearest-neighbor.
void ilps_crop_resize_mask(const uint8_t* masks, const int64_t* offsets,
                           const int32_t* heights, const int32_t* widths,
                           const float* bboxes, int batch, int out_size,
                           uint8_t* out, int num_threads) {
  parallel_for(batch, num_threads, [&](int b) {
    const uint8_t* img = masks + offsets[b];
    const int h = heights[b];
    const int w = widths[b];
    const float cy = bboxes[b * 3 + 0];
    const float cx = bboxes[b * 3 + 1];
    const float size = bboxes[b * 3 + 2];
    const float step = size / out_size;
    const float y_start = cy - size * 0.5f;
    const float x_start = cx - size * 0.5f;
    uint8_t* dst = out + static_cast<int64_t>(b) * out_size * out_size;
    for (int oy = 0; oy < out_size; ++oy) {
      const float sy = y_start + (oy + 0.5f) * step - 0.5f;
      for (int ox = 0; ox < out_size; ++ox) {
        const float sx = x_start + (ox + 0.5f) * step - 0.5f;
        dst[oy * out_size + ox] = sample_nn(img, h, w, sy, sx);
      }
    }
  });
}

// Tight bbox (cy, cx, size) around nonzero mask pixels, padded by `pad`.
void ilps_bbox_from_mask(const uint8_t* mask, int h, int w, float pad,
                         float* bbox_out) {
  int y0 = h, y1 = -1, x0 = w, x1 = -1;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = mask + static_cast<int64_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      if (row[x]) {
        if (y < y0) y0 = y;
        if (y > y1) y1 = y;
        if (x < x0) x0 = x;
        if (x > x1) x1 = x;
      }
    }
  }
  if (y1 < 0) {  // empty mask: full-frame fallback
    bbox_out[0] = h * 0.5f;
    bbox_out[1] = w * 0.5f;
    bbox_out[2] = static_cast<float>(std::max(h, w));
    return;
  }
  // Continuous-coordinate centre/extent (pixel i spans [i, i+1)).
  bbox_out[0] = (y0 + y1 + 1) * 0.5f;
  bbox_out[1] = (x0 + x1 + 1) * 0.5f;
  bbox_out[2] = std::max(8.0f, std::max(y1 - y0 + 1, x1 - x0 + 1) * pad);
}

}  // extern "C"
