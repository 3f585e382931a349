// aadff_io — native host-side image ops for the data-loading path.
//
// The DFF training loop's host-side cost is image augmentation
// (rotate/flip/resize on float32 images; the reference uses
// scipy.ndimage.rotate + cv2.resize per sample, dff/dataset.py:252-286).
// These C++ kernels keep the host feeding the TPU: contiguous float32
// HWC buffers in, no Python-object overhead, OpenMP-parallel when the host
// has cores to spare.
//
// Exposed via a plain C ABI and loaded from Python with ctypes
// (aadff_tpu/dff/native_ops.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Bilinear rotation about the image centre, matching
// scipy.ndimage.rotate(reshape=False, order=1, mode='constant', cval=0).
// img: [H, W, C] float32, out: [H, W, C] float32, angle in degrees.
void rotate_bilinear(const float* img, float* out, int H, int W, int C,
                     float angle_deg) {
  // scipy.ndimage.rotate's positive direction is the opposite sign in this
  // inverse-map formulation; double-precision coordinates match scipy's
  // float64 affine (exact-0 sources at multiples of 90 deg)
  const double a = -angle_deg * 3.14159265358979323846 / 180.0;
  const double ca = std::cos(a), sa = std::sin(a);
  const double cy = (H - 1) * 0.5, cx = (W - 1) * 0.5;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      // inverse map: output pixel -> source coordinates
      const double dy = y - cy, dx = x - cx;
      double sy = ca * dy - sa * dx + cy;
      double sx = sa * dy + ca * dx + cx;
      // snap float noise at the frame border (scipy hard-cuts outside
      // [0, size-1] for order=1 mode='constant')
      if (sy > -1e-9 && sy < 0) sy = 0;
      if (sx > -1e-9 && sx < 0) sx = 0;
      float* dst = out + (static_cast<int64_t>(y) * W + x) * C;
      if (sy < 0 || sy > H - 1 || sx < 0 || sx > W - 1) {
        for (int c = 0; c < C; ++c) dst[c] = 0.0f;
        continue;
      }
      const int y0 = static_cast<int>(sy), x0 = static_cast<int>(sx);
      const int y1 = std::min(y0 + 1, H - 1), x1 = std::min(x0 + 1, W - 1);
      const float fy = static_cast<float>(sy - y0);
      const float fx = static_cast<float>(sx - x0);
      const float* p00 = img + (static_cast<int64_t>(y0) * W + x0) * C;
      const float* p01 = img + (static_cast<int64_t>(y0) * W + x1) * C;
      const float* p10 = img + (static_cast<int64_t>(y1) * W + x0) * C;
      const float* p11 = img + (static_cast<int64_t>(y1) * W + x1) * C;
      for (int c = 0; c < C; ++c) {
        const float top = p00[c] * (1 - fx) + p01[c] * fx;
        const float bot = p10[c] * (1 - fx) + p11[c] * fx;
        dst[c] = top * (1 - fy) + bot * fy;
      }
    }
  }
}

// Bilinear resize (half-pixel centers — matches cv2.INTER_LINEAR / jax
// "linear" with align_corners=False). img: [H, W, C] -> out: [OH, OW, C].
void resize_bilinear(const float* img, float* out, int H, int W, int C,
                     int OH, int OW) {
  const float sy = static_cast<float>(H) / OH;
  const float sx = static_cast<float>(W) / OW;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < OH; ++y) {
    const float fy_src = (y + 0.5f) * sy - 0.5f;
    const float fy_cl = std::min(std::max(fy_src, 0.0f),
                                 static_cast<float>(H - 1));
    const int y0 = static_cast<int>(fy_cl);
    const int y1 = std::min(y0 + 1, H - 1);
    const float fy = fy_cl - y0;
    for (int x = 0; x < OW; ++x) {
      const float fx_src = (x + 0.5f) * sx - 0.5f;
      const float fx_cl = std::min(std::max(fx_src, 0.0f),
                                   static_cast<float>(W - 1));
      const int x0 = static_cast<int>(fx_cl);
      const int x1 = std::min(x0 + 1, W - 1);
      const float fx = fx_cl - x0;
      const float* p00 = img + (static_cast<int64_t>(y0) * W + x0) * C;
      const float* p01 = img + (static_cast<int64_t>(y0) * W + x1) * C;
      const float* p10 = img + (static_cast<int64_t>(y1) * W + x0) * C;
      const float* p11 = img + (static_cast<int64_t>(y1) * W + x1) * C;
      float* dst = out + (static_cast<int64_t>(y) * OW + x) * C;
      for (int c = 0; c < C; ++c) {
        const float top = p00[c] * (1 - fx) + p01[c] * fx;
        const float bot = p10[c] * (1 - fx) + p11[c] * fx;
        dst[c] = top * (1 - fy) + bot * fy;
      }
    }
  }
}

// In-place horizontal / vertical flip. axis: 0 = vertical (rows), 1 = horizontal.
void flip_inplace(float* img, int H, int W, int C, int axis) {
  if (axis == 0) {
#pragma omp parallel for schedule(static)
    for (int y = 0; y < H / 2; ++y) {
      float* a = img + static_cast<int64_t>(y) * W * C;
      float* b = img + static_cast<int64_t>(H - 1 - y) * W * C;
      for (int i = 0; i < W * C; ++i) std::swap(a[i], b[i]);
    }
  } else {
#pragma omp parallel for schedule(static)
    for (int y = 0; y < H; ++y) {
      float* row = img + static_cast<int64_t>(y) * W * C;
      for (int x = 0; x < W / 2; ++x) {
        for (int c = 0; c < C; ++c)
          std::swap(row[x * C + c], row[(W - 1 - x) * C + c]);
      }
    }
  }
}

// Brightness/contrast jitter: out = clip(0.5 + contrast*(img-0.5) + brightness)
// (reference dff/dataset.py:260-263).
void color_jitter(float* img, int64_t n, float contrast, float brightness) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const float v = 0.5f + contrast * (img[i] - 0.5f) + brightness;
    img[i] = std::min(std::max(v, 0.0f), 1.0f);
  }
}

int aadff_io_version() { return 1; }

}  // extern "C"
