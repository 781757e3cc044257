// gpnerf_host — native host-side data-pipeline kernels.
//
// The reference's data path leans on native code throughout (cv2/imageio
// C++, spconv CUDA; SURVEY.md §2.9). On this framework the device compute
// is XLA, and the host pipeline's hot loops live here: ray/AABB slab
// intersection over full images (libs/datasets/data_utils.py:96-130
// semantics), bilinear remap (cv2.undistort's inner loop), and the
// z-buffered point splat used by the synthetic fixture scene.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC gpnerf_host.cpp -o libgpnerf_host.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Ray/AABB slab intersection with "exactly two plane hits" semantics and
// the negative-direction sign handling (data_utils.py:96-130). Inputs are
// float64 to match the numpy reference bit-for-bit where possible.
// bounds: (2,3) already including the +-0.01 pad? No: pad applied here.
void near_far(const double* bounds_in,  // (2,3)
              const double* ray_o,      // (N,3)
              const double* ray_d_in,   // (N,3)
              int64_t n,
              double* near_out,         // (N,) compacted later by caller
              double* far_out,          // (N,)
              uint8_t* mask_out) {      // (N,)
  double bounds[6];
  for (int j = 0; j < 3; ++j) {
    bounds[j] = bounds_in[j] - 0.01;
    bounds[3 + j] = bounds_in[3 + j] + 0.01;
  }
  const double eps = 1e-6;
  for (int64_t i = 0; i < n; ++i) {
    const double* o = ray_o + 3 * i;
    double d[3];
    for (int j = 0; j < 3; ++j) {
      d[j] = ray_d_in[3 * i + j];
      if (std::fabs(d[j]) < 1e-5) d[j] = 1e-5;
    }
    // six plane intersections; keep those inside the box
    double hits[6][3];
    int nhits = 0;
    for (int p = 0; p < 6; ++p) {
      int axis = p % 3;
      double plane = (p < 3) ? bounds[axis] : bounds[3 + axis];
      double t = (plane - o[axis]) / d[axis];
      double pt[3];
      bool ok = true;
      for (int j = 0; j < 3; ++j) {
        pt[j] = o[j] + t * d[j];
        if (pt[j] < bounds[j] - eps || pt[j] > bounds[3 + j] + eps) ok = false;
      }
      if (ok && nhits < 6) {
        std::memcpy(hits[nhits], pt, sizeof(pt));
        ++nhits;
      }
    }
    if (nhits != 2) {
      mask_out[i] = 0;
      near_out[i] = 0.0;
      far_out[i] = 0.0;
      continue;
    }
    mask_out[i] = 1;
    double norm = std::sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
    double v0[3], v1[3];
    for (int j = 0; j < 3; ++j) {
      v0[j] = hits[0][j] - o[j];
      v1[j] = hits[1][j] - o[j];
    }
    double dot0 = v0[0] * d[0] + v0[1] * d[1] + v0[2] * d[2];
    double sign = dot0 < 0.0 ? -1.0 : 1.0;  // data_utils.py:123-127
    double d0 = sign * std::sqrt(v0[0] * v0[0] + v0[1] * v0[1] + v0[2] * v0[2]) / norm;
    double d1 = sign * std::sqrt(v1[0] * v1[0] + v1[1] * v1[1] + v1[2] * v1[2]) / norm;
    near_out[i] = std::min(d0, d1);
    far_out[i] = std::max(d0, d1);
  }
}

// NOTE near_far plane ordering: the numpy reference evaluates the 6 planes
// as (min_x, min_y, min_z, max_x, max_y, max_z) and keeps the first two
// in-box hits in that order; the sign factor uses hit[0]. The loop above
// preserves that ordering so results match the reference bit-close.

// Bilinear remap: out[y, x, c] = src(map_v[y,x], map_u[y,x]) with zeros
// outside (cv2.undistort inner loop; ops/image.py undistort).
void bilinear_remap(const float* src, int64_t h, int64_t w, int64_t c,
                    const double* map_u, const double* map_v,
                    float* out) {
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      double u = map_u[y * w + x];
      double v = map_v[y * w + x];
      int64_t x0 = (int64_t)std::floor(u);
      int64_t y0 = (int64_t)std::floor(v);
      double fx = u - x0, fy = v - y0;
      for (int64_t ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int dy = 0; dy <= 1; ++dy) {
          for (int dx = 0; dx <= 1; ++dx) {
            int64_t xx = x0 + dx, yy = y0 + dy;
            if (xx < 0 || xx >= w || yy < 0 || yy >= h) continue;
            double wgt = (dx ? fx : 1.0 - fx) * (dy ? fy : 1.0 - fy);
            acc += wgt * src[(yy * w + xx) * c + ch];
          }
        }
        out[(y * w + x) * c + ch] = (float)acc;
      }
    }
  }
}

// Nearest remap for integer masks.
void nearest_remap_u8(const uint8_t* src, int64_t h, int64_t w,
                      const double* map_u, const double* map_v,
                      uint8_t* out) {
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      int64_t xx = (int64_t)std::lround(map_u[y * w + x]);
      int64_t yy = (int64_t)std::lround(map_v[y * w + x]);
      out[y * w + x] =
          (xx < 0 || xx >= w || yy < 0 || yy >= h) ? 0 : src[yy * w + xx];
    }
  }
}

// Z-buffered point splat (synthetic fixture renderer,
// gpnerf_tpu/data/synthetic.py).
void zsplat(const double* px, const double* py, const double* z,
            const float* colors, int64_t n, int64_t radius,
            int64_t h, int64_t w, float* img, float* zbuf) {
  for (int64_t i = 0; i < (int64_t)(h * w); ++i) zbuf[i] = 1e30f;
  for (int64_t i = 0; i < n; ++i) {
    if (z[i] <= 1e-6) continue;
    int64_t cx = (int64_t)std::lround(px[i]);
    int64_t cy = (int64_t)std::lround(py[i]);
    for (int64_t dy = -radius; dy <= radius; ++dy) {
      for (int64_t dx = -radius; dx <= radius; ++dx) {
        if (dx * dx + dy * dy > radius * radius) continue;
        int64_t x = cx + dx, y = cy + dy;
        if (x < 0 || x >= w || y < 0 || y >= h) continue;
        int64_t idx = y * w + x;
        if ((float)z[i] <= zbuf[idx] * (1.0f + 1e-4f)) {
          if ((float)z[i] < zbuf[idx]) zbuf[idx] = (float)z[i];
          img[idx * 3 + 0] = colors[i * 3 + 0];
          img[idx * 3 + 1] = colors[i * 3 + 1];
          img[idx * 3 + 2] = colors[i * 3 + 2];
        }
      }
    }
  }
}

}  // extern "C"
