// jperceiver_tpu native host-pipeline core.
//
// The TPU compute path is XLA; this library accelerates the HOST side of
// the input pipeline — the per-sample CPU work that must keep up with the
// chips (the reference delegates the same work to scipy/PIL/numpy C code:
// `boundary_loss.py:121-147` EDT, `mono_dataset.py` resizes,
// `kitti_utils.py:50-102` velodyne projection).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency):
//   jp_sdf            signed distance field of a binary mask (exact EDT)
//   jp_resize_bilinear float32 HWC bilinear resize (half-pixel centers)
//   jp_velo_project   velodyne->image sparse depth with min-depth dedup
//
// Build: `make -C native` -> libjperceiver_host.so; the Python wrapper
// (`jperceiver_tpu/native.py`) falls back to numpy/scipy when absent.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Exact 1-D squared distance transform (Felzenszwalb & Huttenlocher 2004).
// ---------------------------------------------------------------------------
static void dt1d(const float* f, float* d, int n, int* v, float* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -std::numeric_limits<float>::infinity();
  z[1] = std::numeric_limits<float>::infinity();
  for (int q = 1; q < n; q++) {
    float s;
    while (true) {
      s = ((f[q] + q * (float)q) - (f[v[k]] + v[k] * (float)v[k])) /
          (2.0f * q - 2.0f * v[k]);
      if (s <= z[k]) {
        k--;
      } else {
        break;
      }
    }
    k++;
    v[k] = q;
    z[k] = s;
    z[k + 1] = std::numeric_limits<float>::infinity();
  }
  k = 0;
  for (int q = 0; q < n; q++) {
    while (z[k + 1] < q) k++;
    float dq = q - (float)v[k];
    d[q] = dq * dq + f[v[k]];
  }
}

// 2-D exact squared EDT of "distance to nearest zero of mask".
static void edt2d_sq(const uint8_t* mask, float* out, int h, int w) {
  const float INF = 1e20f;
  std::vector<float> f(std::max(h, w));
  std::vector<float> d(std::max(h, w));
  std::vector<int> v(std::max(h, w));
  std::vector<float> z(std::max(h, w) + 1);

  // columns
  for (int x = 0; x < w; x++) {
    for (int y = 0; y < h; y++) f[y] = mask[y * w + x] ? INF : 0.0f;
    dt1d(f.data(), d.data(), h, v.data(), z.data());
    for (int y = 0; y < h; y++) out[y * w + x] = d[y];
  }
  // rows
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) f[x] = out[y * w + x];
    dt1d(f.data(), d.data(), w, v.data(), z.data());
    for (int x = 0; x < w; x++) out[y * w + x] = d[x];
  }
}

// Signed distance field: EDT(outside) - EDT(inside), 0 on the inner
// boundary (8-connectivity) — semantics of `boundary_loss.py:121-147`.
void jp_sdf(const uint8_t* mask, float* out, int h, int w) {
  std::vector<float> dist_out((size_t)h * w);   // distance to mask
  std::vector<float> dist_in((size_t)h * w);    // distance to ~mask
  std::vector<uint8_t> inv((size_t)h * w);
  bool any = false;
  for (int i = 0; i < h * w; i++) {
    inv[i] = mask[i] ? 0 : 1;
    any |= (mask[i] != 0);
  }
  if (!any) {
    std::memset(out, 0, sizeof(float) * h * w);
    return;
  }
  // scipy semantics: EDT(x) = distance from x to nearest ZERO of input.
  // posdis = EDT over pos mask (distance of inside pixels to background),
  // negdis = EDT over ~pos. sdf = negdis - posdis.
  edt2d_sq(inv.data(), dist_out.data(), h, w);  // zero where mask=1
  edt2d_sq(mask, dist_in.data(), h, w);         // zero where mask=0

  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      int i = y * w + x;
      float sdf = std::sqrt(dist_out[i]) - std::sqrt(dist_in[i]);
      out[i] = sdf;
    }
  }
  // zero the inner boundary: mask pixels with any 8-neighbour outside.
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++) {
      int i = y * w + x;
      if (!mask[i]) continue;
      bool boundary = false;
      for (int dy = -1; dy <= 1 && !boundary; dy++) {
        for (int dx = -1; dx <= 1; dx++) {
          if (!dy && !dx) continue;
          int ny = y + dy, nx = x + dx;
          if (ny < 0 || nx < 0 || ny >= h || nx >= w || !mask[ny * w + nx]) {
            boundary = true;
            break;
          }
        }
      }
      if (boundary) out[i] = 0.0f;
    }
  }
}

// ---------------------------------------------------------------------------
// float32 HWC bilinear resize, half-pixel centers (torch align_corners=False)
// ---------------------------------------------------------------------------
void jp_resize_bilinear(const float* src, float* dst, int sh, int sw, int c,
                        int dh, int dw) {
  const float sy = (float)sh / dh;
  const float sx = (float)sw / dw;
  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y0c = std::clamp(y0, 0, sh - 1);
    int y1c = std::clamp(y0 + 1, 0, sh - 1);
    for (int x = 0; x < dw; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x0c = std::clamp(x0, 0, sw - 1);
      int x1c = std::clamp(x0 + 1, 0, sw - 1);
      const float* p00 = src + ((size_t)y0c * sw + x0c) * c;
      const float* p01 = src + ((size_t)y0c * sw + x1c) * c;
      const float* p10 = src + ((size_t)y1c * sw + x0c) * c;
      const float* p11 = src + ((size_t)y1c * sw + x1c) * c;
      float* o = dst + ((size_t)y * dw + x) * c;
      for (int ch = 0; ch < c; ch++) {
        float top = p00[ch] * (1 - wx) + p01[ch] * wx;
        float bot = p10[ch] * (1 - wx) + p11[ch] * wx;
        o[ch] = top * (1 - wy) + bot * wy;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Velodyne -> image sparse depth (min depth per pixel).
// pts: (n, 4) x,y,z,refl; P: 3x4 row-major projection.
// ---------------------------------------------------------------------------
void jp_velo_project(const float* pts, int64_t n, const double* P, float* depth,
                     int h, int w) {
  std::memset(depth, 0, sizeof(float) * (size_t)h * w);
  for (int64_t i = 0; i < n; i++) {
    const float* p = pts + i * 4;
    if (p[0] < 0) continue;  // behind the image plane
    double X = p[0], Y = p[1], Z = p[2];
    double u = P[0] * X + P[1] * Y + P[2] * Z + P[3];
    double v = P[4] * X + P[5] * Y + P[6] * Z + P[7];
    double z = P[8] * X + P[9] * Y + P[10] * Z + P[11];
    if (z <= 0) continue;
    // KITTI matlab convention: round then -1 (`kitti_utils.py:81-83`).
    long xi = (long)std::llround(u / z) - 1;
    long yi = (long)std::llround(v / z) - 1;
    if (xi < 0 || yi < 0 || xi >= w || yi >= h) continue;
    float* cell = depth + (size_t)yi * w + xi;
    float d = (float)z;
    if (d < 0) d = 0;
    if (*cell == 0.0f || d < *cell) *cell = d;
  }
}

}  // extern "C"
