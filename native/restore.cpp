// Native restore runtime: inverse-affine face paste-back.
//
// Replaces the per-frame cv2 pipeline of the reference's
// AlignRestore.restore_img (ref:latentsync/utils/affine_transform.py:85-115)
// — warpAffine(face), warpAffine(mask), erode, erode, GaussianBlur,
// float compositing — with one fused pass per frame, OpenMP-parallel
// across frames. All intermediate math in float32; the mask geometry
// (erosion radii, blur sigma) follows the reference's area-derived
// formula per frame.
//
// Exposed C ABI (ctypes):
//   restore_frames(frames u8[N,H,W,3] inout, faces u8[N,fh,fw,3],
//                  inv_mats f64[N,2,3], N, H, W, fh, fw, threads)
//
// Build: make -C native   (produces librestore.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Affine {
  double a, b, tx, c, d, ty;  // [a b tx; c d ty]
};

// Bilinear sample with zero outside.
template <int C>
inline void sample_bilinear(const uint8_t* img, int h, int w, float x, float y,
                            float* out) {
  if (x < 0.f || y < 0.f || x > w - 1.f || y > h - 1.f) {
    for (int k = 0; k < C; ++k) out[k] = 0.f;
    return;
  }
  int x0 = static_cast<int>(x), y0 = static_cast<int>(y);
  int x1 = std::min(x0 + 1, w - 1), y1 = std::min(y0 + 1, h - 1);
  float fx = x - x0, fy = y - y0;
  const uint8_t* p00 = img + (static_cast<size_t>(y0) * w + x0) * C;
  const uint8_t* p01 = img + (static_cast<size_t>(y0) * w + x1) * C;
  const uint8_t* p10 = img + (static_cast<size_t>(y1) * w + x0) * C;
  const uint8_t* p11 = img + (static_cast<size_t>(y1) * w + x1) * C;
  for (int k = 0; k < C; ++k) {
    float top = p00[k] * (1.f - fx) + p01[k] * fx;
    float bot = p10[k] * (1.f - fx) + p11[k] * fx;
    out[k] = top * (1.f - fy) + bot * fy;
  }
}

// In-region test of the inverse warp of a full-ones (fh, fw) mask:
// a destination pixel maps back into the face crop iff its source coord
// lies inside the crop. Returns coverage in [0,1] with bilinear edges.
inline float mask_coverage(float sx, float sy, int fh, int fw) {
  if (sx < -1.f || sy < -1.f || sx > fw || sy > fh) return 0.f;
  float cx = std::min(std::max((sx + 1.f) / 1.f, 0.f), 1.f) *
             std::min(std::max((fw - sx) / 1.f, 0.f), 1.f);
  float cy = std::min(std::max((sy + 1.f) / 1.f, 0.f), 1.f) *
             std::min(std::max((fh - sy) / 1.f, 0.f), 1.f);
  return std::min(cx, 1.f) * std::min(cy, 1.f);
}

// Separable box-min (erosion by k×k square), in-place via temp buffer.
void erode(std::vector<float>& m, std::vector<float>& tmp, int h, int w, int k) {
  if (k <= 1) return;
  int r = k / 2;
  // horizontal pass
  for (int y = 0; y < h; ++y) {
    const float* row = m.data() + static_cast<size_t>(y) * w;
    float* trow = tmp.data() + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      float v = 1.f;
      int x0 = std::max(0, x - r), x1 = std::min(w - 1, x + k - 1 - r);
      for (int xx = x0; xx <= x1; ++xx) v = std::min(v, row[xx]);
      // cv2.erode with even kernels anchors at k/2; borders replicate —
      // clamping the window approximates BORDER_REPLICATE
      trow[x] = v;
    }
  }
  // vertical pass
  for (int y = 0; y < h; ++y) {
    float* row = m.data() + static_cast<size_t>(y) * w;
    int y0 = std::max(0, y - r), y1 = std::min(h - 1, y + k - 1 - r);
    for (int x = 0; x < w; ++x) {
      float v = 1.f;
      for (int yy = y0; yy <= y1; ++yy)
        v = std::min(v, tmp[static_cast<size_t>(yy) * w + x]);
      row[x] = v;
    }
  }
}

// Separable Gaussian blur, sigma derived from kernel size like cv2
// (sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8).
void gaussian_blur(std::vector<float>& m, std::vector<float>& tmp, int h, int w,
                   int ksize) {
  if (ksize <= 1) return;
  int r = ksize / 2;
  double sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8;
  std::vector<float> kern(2 * r + 1);
  double s = 0;
  for (int i = -r; i <= r; ++i) {
    kern[i + r] = static_cast<float>(std::exp(-(i * i) / (2 * sigma * sigma)));
    s += kern[i + r];
  }
  for (auto& v : kern) v = static_cast<float>(v / s);

  for (int y = 0; y < h; ++y) {
    const float* row = m.data() + static_cast<size_t>(y) * w;
    float* trow = tmp.data() + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      float acc = 0.f;
      for (int i = -r; i <= r; ++i) {
        int xx = std::min(std::max(x + i, 0), w - 1);
        acc += row[xx] * kern[i + r];
      }
      trow[x] = acc;
    }
  }
  for (int y = 0; y < h; ++y) {
    float* row = m.data() + static_cast<size_t>(y) * w;
    for (int x = 0; x < w; ++x) {
      float acc = 0.f;
      for (int i = -r; i <= r; ++i) {
        int yy = std::min(std::max(y + i, 0), h - 1);
        acc += tmp[static_cast<size_t>(yy) * w + x] * kern[i + r];
      }
      row[x] = acc;
    }
  }
}

void restore_one(uint8_t* frame, const uint8_t* face, const double* align_m,
                 int h, int w, int fh, int fw) {
  // align_m maps FRAME→CROP coords (the forward align matrix). For each
  // destination frame pixel the crop source coordinate is align_m·(x,y)
  // — the same sampling cv2 performs when the reference passes the
  // inverted matrix to warpAffine (which inverts it back internally,
  // ref:affine_transform.py:89-96).
  Affine m{align_m[0], align_m[1], align_m[2], align_m[3], align_m[4],
           align_m[5]};
  double ia = m.a, ib = m.b, itx = m.tx;
  double ic = m.c, id = m.d, ity = m.ty;

  std::vector<float> mask(static_cast<size_t>(h) * w);
  std::vector<float> tmp(static_cast<size_t>(h) * w);
  std::vector<float> pasted(static_cast<size_t>(h) * w * 3);

  double area = 0;
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float sx = static_cast<float>(ia * x + ib * y + itx);
      float sy = static_cast<float>(ic * x + id * y + ity);
      size_t i = static_cast<size_t>(y) * w + x;
      float cov = mask_coverage(sx, sy, fh, fw);
      mask[i] = cov;
      float px[3];
      sample_bilinear<3>(face, fh, fw, sx, sy, px);
      pasted[i * 3 + 0] = px[0];
      pasted[i * 3 + 1] = px[1];
      pasted[i * 3 + 2] = px[2];
    }
  }
  // erosion #1: 2×2 (ref: np.ones((2,2)))
  erode(mask, tmp, h, w, 2);
  for (size_t i = 0; i < mask.size(); ++i) area += mask[i];

  int w_edge = static_cast<int>(std::sqrt(std::max(area, 0.0))) / 20;
  std::vector<float> soft(mask);
  if (w_edge > 0) {
    erode(soft, tmp, h, w, w_edge * 2);
    gaussian_blur(soft, tmp, h, w, w_edge * 2 + 1);
  }

  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      size_t i = static_cast<size_t>(y) * w + x;
      float sm = soft[i];
      float hard = mask[i];
      uint8_t* dst = frame + i * 3;
      for (int k = 0; k < 3; ++k) {
        float v = sm * (hard * pasted[i * 3 + k]) + (1.f - sm) * dst[k];
        dst[k] = static_cast<uint8_t>(std::min(std::max(v, 0.f), 255.f));
      }
    }
  }
}

}  // namespace

extern "C" {

void restore_frames(uint8_t* frames, const uint8_t* faces,
                    const double* inv_mats, int n, int h, int w, int fh,
                    int fw, int threads) {
#ifdef _OPENMP
  if (threads > 0) omp_set_num_threads(threads);
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < n; ++i) {
    restore_one(frames + static_cast<size_t>(i) * h * w * 3,
                faces + static_cast<size_t>(i) * fh * fw * 3,
                inv_mats + static_cast<size_t>(i) * 6, h, w, fh, fw);
  }
}

// Batched resize (bilinear) u8 HWC — used for the face-crop → box resize
// before paste-back (ref:lipsync_pipeline.py:343-358).
void resize_frames(const uint8_t* src, int n, int sh, int sw, uint8_t* dst,
                   int dh, int dw, int threads) {
#ifdef _OPENMP
  if (threads > 0) omp_set_num_threads(threads);
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < n; ++i) {
    const uint8_t* s = src + static_cast<size_t>(i) * sh * sw * 3;
    uint8_t* d = dst + static_cast<size_t>(i) * dh * dw * 3;
    float sy_ratio = static_cast<float>(sh) / dh;
    float sx_ratio = static_cast<float>(sw) / dw;
    for (int y = 0; y < dh; ++y) {
      float syf = (y + 0.5f) * sy_ratio - 0.5f;
      for (int x = 0; x < dw; ++x) {
        float sxf = (x + 0.5f) * sx_ratio - 0.5f;
        float px[3];
        sample_bilinear<3>(s, sh, sw, std::max(sxf, 0.f), std::max(syf, 0.f), px);
        uint8_t* o = d + (static_cast<size_t>(y) * dw + x) * 3;
        for (int k = 0; k < 3; ++k)
          o[k] = static_cast<uint8_t>(std::min(std::max(px[k], 0.f), 255.f));
      }
    }
  }
}

}  // extern "C"
