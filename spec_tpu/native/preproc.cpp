// Native host preprocessing engine for the SPEC data path.
//
// The reference's per-sample python/cv2 pipeline (SPIN crop -> resize ->
// normalize; reference spec/dataset/cam_dataset.py:252-280 and the demo
// crop loop spec/tester.py:116-125) is the host-side bottleneck when the
// device is fast. This implements the same math as one fused pass in C++
// with OpenMP across crops:
//
//   For a bbox (center, scale) with side = scale * 200 px, integer crop
//   corners ul/br come from the inverse SPIN point transform; each output
//   pixel bilinearly samples the source at
//     src = ul + (dst + 0.5) * (br - ul) / res - 0.5
//   (identical to zero-pad-slice + cv2 INTER_LINEAR resize on float32),
//   then ImageNet-normalizes in the same pass.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>

namespace {

inline float sample_bilinear(const float* img, int H, int W, int C,
                             float y, float x, int c) {
  // Zero padding outside the source (the SPIN crop zero-fills).
  const int x0 = static_cast<int>(std::floor(x));
  const int y0 = static_cast<int>(std::floor(y));
  const float fx = x - x0;
  const float fy = y - y0;
  float acc = 0.0f;
  for (int dy = 0; dy < 2; ++dy) {
    const int yy = y0 + dy;
    if (yy < 0 || yy >= H) continue;
    const float wy = dy ? fy : 1.0f - fy;
    for (int dx = 0; dx < 2; ++dx) {
      const int xx = x0 + dx;
      if (xx < 0 || xx >= W) continue;
      const float wx = dx ? fx : 1.0f - fx;
      acc += wy * wx * img[(static_cast<int64_t>(yy) * W + xx) * C + c];
    }
  }
  return acc;
}

}  // namespace

extern "C" {

// One source image, n crops. img: HxWx3 float32 RGB in [0, 255].
// corners: n x 4 int32 (ulx, uly, brx, bry) — the integer SPIN crop box,
// computed host-side by the exact python transform so knife-edge
// truncation matches bit-for-bit.
// out: n x res x res x 3, normalized ((v/255 - mean) / std) when
// normalize != 0, else v/255.
void spin_crop_batch(const float* img, int H, int W,
                     const int32_t* corners, int n,
                     int res, const float* mean, const float* stdv,
                     int normalize, float* out) {
  const int C = 3;
#pragma omp parallel for schedule(dynamic)
  for (int k = 0; k < n; ++k) {
    const int ulx = corners[4 * k + 0];
    const int uly = corners[4 * k + 1];
    const int brx = corners[4 * k + 2];
    const int bry = corners[4 * k + 3];

    const float box_w = static_cast<float>(brx - ulx);
    const float box_h = static_cast<float>(bry - uly);
    float* dst = out + static_cast<int64_t>(k) * res * res * C;

    for (int y = 0; y < res; ++y) {
      const float src_y = uly + (y + 0.5f) * box_h / res - 0.5f;
      for (int x = 0; x < res; ++x) {
        const float src_x = ulx + (x + 0.5f) * box_w / res - 0.5f;
        for (int c = 0; c < C; ++c) {
          float v = sample_bilinear(img, H, W, C, src_y, src_x, c) / 255.0f;
          if (normalize) v = (v - mean[c]) / stdv[c];
          dst[(static_cast<int64_t>(y) * res + x) * C + c] = v;
        }
      }
    }
  }
}

}  // extern "C"
