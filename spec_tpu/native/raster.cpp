// Native z-buffer mesh rasterizer — the TPU-framework equivalent of the
// OpenGL/EGL rasterizer the reference reaches through pyrender
// (reference spec/utils/renderer_cam.py:26). Rendering is host-side
// observability work; this keeps it off the Python interpreter (the
// per-triangle cv2 fill loop costs ~220 ms/frame for a 13.8k-face SMPL
// mesh; this path renders the same frame in a few ms).
//
// Semantics match spec_tpu/utils/renderer.py:rasterize_mesh:
//   * camera-frame vertices, pinhole projection by K
//   * back-face culling against the view ray through the face center
//   * faces with any vertex at z <= 1e-3 dropped
//   * flat Lambertian shading per face: ambient 0.3 + 0.35 * sum over
//     lights of clamp(n . l, 0), intensity clamped to 1.3
// but with a per-pixel z-buffer (exact hidden-surface removal) instead of
// the painter's algorithm, and edge-function coverage at pixel centers
// instead of cv2 integer polygon fill — output differs only on boundary
// pixels and where painter's face-center ordering was wrong.
//
// Parallelism: face setup is serial (O(F) trivial work); rasterization is
// OpenMP-parallel over horizontal image bands, each band owning its rows
// of the frame buffer and z-buffer (no atomics, no false sharing).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct FaceSetup {
  float x[3], y[3], z[3];  // screen x/y and camera z per vertex
  float r, g, b;           // flat-shaded color
  int minx, maxx, miny, maxy;
};

}  // namespace

extern "C" {

// verts_cam: (V,3) row-major; faces: (F,3); K: (3,3) row-major;
// base_color: (3,); light_dirs: (n_lights,3) pre-normalized;
// rgb_out: (H,W,3) — written only where covered; mask_out: (H,W) 0/1.
void raster_mesh(const float* verts_cam, int V, const int32_t* faces,
                 int F, const float* K, int H, int W,
                 const float* base_color, const float* light_dirs,
                 int n_lights, float* rgb_out, uint8_t* mask_out) {
  const float fx = K[0], cx = K[2], fy = K[4], cy = K[5];

  // --- serial face setup: project, cull, shade ---
  std::vector<FaceSetup> kept;
  kept.reserve(F);
  for (int f = 0; f < F; ++f) {
    const int i0 = faces[3 * f], i1 = faces[3 * f + 1],
              i2 = faces[3 * f + 2];
    if (i0 < 0 || i0 >= V || i1 < 0 || i1 >= V || i2 < 0 || i2 >= V)
      continue;
    const float* v0 = verts_cam + 3 * i0;
    const float* v1 = verts_cam + 3 * i1;
    const float* v2 = verts_cam + 3 * i2;
    if (v0[2] <= 1e-3f || v1[2] <= 1e-3f || v2[2] <= 1e-3f) continue;

    const float e1x = v1[0] - v0[0], e1y = v1[1] - v0[1],
                e1z = v1[2] - v0[2];
    const float e2x = v2[0] - v0[0], e2y = v2[1] - v0[1],
                e2z = v2[2] - v0[2];
    float nx = e1y * e2z - e1z * e2y;
    float ny = e1z * e2x - e1x * e2z;
    float nz = e1x * e2y - e1y * e2x;
    const float nl = std::sqrt(nx * nx + ny * ny + nz * nz);
    if (nl < 1e-12f) continue;
    nx /= nl; ny /= nl; nz /= nl;
    const float mx = (v0[0] + v1[0] + v2[0]) / 3.0f;
    const float my = (v0[1] + v1[1] + v2[1]) / 3.0f;
    const float mz = (v0[2] + v1[2] + v2[2]) / 3.0f;
    const float ml = std::sqrt(mx * mx + my * my + mz * mz);
    if (ml < 1e-9f) continue;
    // view direction from face toward camera = -center/|center|
    if (-(nx * mx + ny * my + nz * mz) / ml <= 0.0f) continue;

    float intensity = 0.3f;
    for (int l = 0; l < n_lights; ++l) {
      const float d = nx * light_dirs[3 * l] + ny * light_dirs[3 * l + 1]
          + nz * light_dirs[3 * l + 2];
      if (d > 0.0f) intensity += 0.35f * d;
    }
    intensity = std::min(intensity, 1.3f);

    FaceSetup s;
    const float* vs[3] = {v0, v1, v2};
    for (int k = 0; k < 3; ++k) {
      s.x[k] = fx * vs[k][0] / vs[k][2] + cx;
      s.y[k] = fy * vs[k][1] / vs[k][2] + cy;
      s.z[k] = vs[k][2];
    }
    s.r = std::min(intensity * base_color[0], 1.0f);
    s.g = std::min(intensity * base_color[1], 1.0f);
    s.b = std::min(intensity * base_color[2], 1.0f);
    s.minx = std::max(0, (int)std::floor(std::min({s.x[0], s.x[1], s.x[2]})));
    s.maxx = std::min(W - 1,
                      (int)std::ceil(std::max({s.x[0], s.x[1], s.x[2]})));
    s.miny = std::max(0, (int)std::floor(std::min({s.y[0], s.y[1], s.y[2]})));
    s.maxy = std::min(H - 1,
                      (int)std::ceil(std::max({s.y[0], s.y[1], s.y[2]})));
    if (s.minx > s.maxx || s.miny > s.maxy) continue;
    kept.push_back(s);
  }

  std::vector<float> zbuf((size_t)H * W,
                          std::numeric_limits<float>::infinity());

  // --- parallel rasterization over row bands ---
#pragma omp parallel
  {
#ifdef _OPENMP
    const int nt = omp_get_num_threads();
    const int tid = omp_get_thread_num();
#else
    const int nt = 1, tid = 0;
#endif
    const int band = (H + nt - 1) / nt;
    const int y_lo = tid * band;
    const int y_hi = std::min(H, y_lo + band);

    for (const FaceSetup& s : kept) {
      const int fy0 = std::max(s.miny, y_lo);
      const int fy1 = std::min(s.maxy, y_hi - 1);
      if (fy0 > fy1) continue;
      // signed twice-area; orient so inside tests are >= 0
      const float area = (s.x[1] - s.x[0]) * (s.y[2] - s.y[0])
          - (s.y[1] - s.y[0]) * (s.x[2] - s.x[0]);
      if (std::fabs(area) < 1e-9f) continue;
      const float inv_area = 1.0f / area;
      for (int py = fy0; py <= fy1; ++py) {
        const float qy = (float)py;
        float* rgb_row = rgb_out + (size_t)py * W * 3;
        float* z_row = zbuf.data() + (size_t)py * W;
        uint8_t* m_row = mask_out + (size_t)py * W;
        for (int px = s.minx; px <= s.maxx; ++px) {
          const float qx = (float)px;
          // barycentric weights (w0 at v0, ...)
          float w0 = ((s.x[1] - qx) * (s.y[2] - qy)
                      - (s.y[1] - qy) * (s.x[2] - qx)) * inv_area;
          float w1 = ((s.x[2] - qx) * (s.y[0] - qy)
                      - (s.y[2] - qy) * (s.x[0] - qx)) * inv_area;
          float w2 = 1.0f - w0 - w1;
          if (w0 < 0.0f || w1 < 0.0f || w2 < 0.0f) continue;
          const float z = w0 * s.z[0] + w1 * s.z[1] + w2 * s.z[2];
          if (z >= z_row[px]) continue;
          z_row[px] = z;
          rgb_row[3 * px] = s.r;
          rgb_row[3 * px + 1] = s.g;
          rgb_row[3 * px + 2] = s.b;
          m_row[px] = 1;
        }
      }
    }
  }
}

}  // extern "C"
