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

// Bilinear tap with cv2 box-edge semantics: the host golden path
// zero-pad-slices the crop box then cv2.resize's it, so sample taps are
// computed in BOX coordinates, CLAMPED at the box boundary (edge pixel
// replication — NOT neighboring frame pixels), mapped into the frame by
// (ulx, uly), and zero outside the frame (the SPIN zero padding).
inline float sample_box_bilinear(const float* img, int H, int W, int C,
                                 float yb, float xb, float box_h,
                                 float box_w, int ulx, int uly, int c) {
  const float max_x = box_w > 1.0f ? box_w - 1.0f : 0.0f;
  const float max_y = box_h > 1.0f ? box_h - 1.0f : 0.0f;
  xb = xb < 0.0f ? 0.0f : (xb > max_x ? max_x : xb);
  yb = yb < 0.0f ? 0.0f : (yb > max_y ? max_y : yb);
  const int x0 = static_cast<int>(std::floor(xb));
  const int y0 = static_cast<int>(std::floor(yb));
  const float fx = xb - x0;
  const float fy = yb - y0;
  const int x1 = x0 + 1 > static_cast<int>(max_x) ? x0 : x0 + 1;
  const int y1 = y0 + 1 > static_cast<int>(max_y) ? y0 : y0 + 1;
  const int xs[2] = {x0, x1};
  const int ys[2] = {y0, y1};
  float acc = 0.0f;
  for (int dy = 0; dy < 2; ++dy) {
    const int yy = uly + ys[dy];
    if (yy < 0 || yy >= H) continue;
    const float wy = dy ? fy : 1.0f - fy;
    for (int dx = 0; dx < 2; ++dx) {
      const int xx = ulx + xs[dx];
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
      const float yb = (y + 0.5f) * box_h / res - 0.5f;  // box coords
      for (int x = 0; x < res; ++x) {
        const float xb = (x + 0.5f) * box_w / res - 0.5f;
        for (int c = 0; c < C; ++c) {
          float v = sample_box_bilinear(img, H, W, C, yb, xb, box_h,
                                        box_w, ulx, uly, c) / 255.0f;
          if (normalize) v = (v - mean[c]) / stdv[c];
          dst[(static_cast<int64_t>(y) * res + x) * C + c] = v;
        }
      }
    }
  }
}

}  // extern "C"
