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

// Border read for the bbox-restricted passes: a coordinate beyond the
// working region is 0 (the true mask value there — the region is padded
// past the mask's support) unless it is also beyond the FRAME edge,
// where cv2's BORDER_REPLICATE clamps to the edge pixel; the clipped
// working region contains that pixel whenever the clamp applies.
inline float border_read(const float* row, int n, int x, bool rep_lo,
                         bool rep_hi) {
  if (x < 0) return rep_lo ? row[0] : 0.f;
  if (x >= n) return rep_hi ? row[n - 1] : 0.f;
  return row[x];
}

// Sliding-window minimum over one line with the erode window
// [x-r, x+k-1-r] (cv2 anchor k/2), van Herk/Gil-Werman: block prefix +
// suffix running mins over a border-padded copy, then
// out[x] = min(suffix[win_lo], prefix[win_hi]) — ~3 linear passes with
// no per-element branching (the former monotonic deque paid two border
// branches plus deque traffic per access). min() is order-independent,
// so results are exactly the former ones. `scratch` is caller-provided
// reusable storage (3 spans of n + k floats).
void slide_min_line(const float* src, float* dst, int n, int k, bool rep_lo,
                    bool rep_hi, std::vector<float>& scratch) {
  int r = k / 2;
  int lead = k - 1 - r;
  int np = n + r + lead;  // padded indices map x → x + r
  if (static_cast<int>(scratch.size()) < 3 * np) scratch.resize(3 * np);
  float* pad = scratch.data();
  float* pre = pad + np;
  float* suf = pre + np;
  float lo_v = rep_lo ? src[0] : 0.f;
  float hi_v = rep_hi ? src[n - 1] : 0.f;
  for (int i = 0; i < r; ++i) pad[i] = lo_v;
  std::memcpy(pad + r, src, sizeof(float) * n);
  for (int i = 0; i < lead; ++i) pad[r + n + i] = hi_v;
  // block prefix mins (left→right within blocks of k)
  for (int b = 0; b < np; b += k) {
    int e = std::min(b + k, np);
    float m = pad[b];
    pre[b] = m;
    for (int i = b + 1; i < e; ++i) { m = std::min(m, pad[i]); pre[i] = m; }
  }
  // block suffix mins (right→left within the same blocks)
  for (int b = 0; b < np; b += k) {
    int e = std::min(b + k, np);
    float m = pad[e - 1];
    suf[e - 1] = m;
    for (int i = e - 2; i >= b; --i) { m = std::min(m, pad[i]); suf[i] = m; }
  }
  // window [x, x+k-1] in padded coords; its halves land in ≤2 blocks
  for (int x = 0; x < n; ++x) {
    int wl = x, wh = x + k - 1;
    dst[x] = (wh < np ? std::min(suf[wl], pre[wh]) : suf[wl]);
  }
}

// Separable box-min (erosion by k×k square) over an (h, w) working
// region; rep_* flag frame-edge replicate semantics per side.
//
// The vertical pass runs tap-outer over whole ROWS (elementwise min of
// shifted rows — contiguous, SIMD-friendly) instead of the former
// per-column copy/deque/copy-back, which thrashed the cache at the
// ~1000-row working regions the live path produces. min() is
// order-independent, so the result is exactly the former one; an
// out-of-range tap row reads as 0 (the true mask value beyond the
// region) unless frame-edge replicate applies, and min(x, 0) == 0 for
// the non-negative mask values, so such rows zero out exactly as the
// former border_read did.
void erode(std::vector<float>& m, std::vector<float>& tmp, int h, int w, int k,
           bool rep_l = false, bool rep_r = false, bool rep_t = false,
           bool rep_b = false) {
  if (k <= 1) return;
  std::vector<float> scratch;
  for (int y = 0; y < h; ++y)
    slide_min_line(m.data() + static_cast<size_t>(y) * w,
                   tmp.data() + static_cast<size_t>(y) * w, w, k, rep_l, rep_r,
                   scratch);
  int r = k / 2;
  int lead = k - 1 - r;  // window rows [y-r, y+lead]
  for (int y = 0; y < h; ++y) {
    float* dst = m.data() + static_cast<size_t>(y) * w;
    bool first = true;
    for (int j = -r; j <= lead; ++j) {
      int yy = y + j;
      if (yy < 0) {
        if (!rep_t) { std::fill(dst, dst + w, 0.f); first = false; break; }
        yy = 0;
      } else if (yy >= h) {
        if (!rep_b) { std::fill(dst, dst + w, 0.f); first = false; break; }
        yy = h - 1;
      }
      const float* src = tmp.data() + static_cast<size_t>(yy) * w;
      if (first) {
        std::memcpy(dst, src, sizeof(float) * w);
        first = false;
      } else {
        for (int x = 0; x < w; ++x) dst[x] = std::min(dst[x], src[x]);
      }
    }
  }
}

// Separable Gaussian blur, sigma derived from kernel size like cv2
// (sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8).
//
// Both passes run tap-outer: acc[x] += src[x+i]·kern[i] sweeps whole
// contiguous spans per tap, which auto-vectorizes (no per-pixel FP
// reduction — with -ffp-contract=off the former pixel-inner dot product
// compiled to a 2·r-deep sequential add chain, ~70 ms/frame at the live
// path's k≈71). The per-pixel accumulation ORDER is unchanged
// (ascending tap index), so output is bit-identical to the former
// lowering; border pixels/rows use the same border_read semantics.
void gaussian_blur(std::vector<float>& m, std::vector<float>& tmp, int h, int w,
                   int ksize, bool rep_l = false, bool rep_r = false,
                   bool rep_t = false, bool rep_b = false) {
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

  // horizontal: tap-outer over a border-padded copy of each row, full
  // width — no scalar border columns (at the live path's r≈35 those 2r
  // columns × 2r+1 taps were most of the pass). Padding replicates the
  // edge pixel or holds 0, exactly what border_read returned, and taps
  // accumulate in the same ascending order → bit-identical.
  std::vector<float> pad(static_cast<size_t>(w) + 2 * r);
  for (int y = 0; y < h; ++y) {
    const float* row = m.data() + static_cast<size_t>(y) * w;
    float* trow = tmp.data() + static_cast<size_t>(y) * w;
    float lo_v = rep_l ? row[0] : 0.f;
    float hi_v = rep_r ? row[w - 1] : 0.f;
    for (int i = 0; i < r; ++i) pad[i] = lo_v;
    std::memcpy(pad.data() + r, row, sizeof(float) * w);
    for (int i = 0; i < r; ++i) pad[r + w + i] = hi_v;
    std::fill(trow, trow + w, 0.f);
    for (int i = 0; i <= 2 * r; ++i) {
      const float* src = pad.data() + i;
      float kv = kern[i];
      for (int x = 0; x < w; ++x) trow[x] += src[x] * kv;
    }
  }
  // vertical: tap-outer over whole rows; an out-of-range tap row reads
  // as the replicated edge row or as zeros (then contributes +0·kern,
  // a no-op for the non-negative finite values here — skipped)
  for (int y = 0; y < h; ++y) {
    float* dst = m.data() + static_cast<size_t>(y) * w;
    std::fill(dst, dst + w, 0.f);
    for (int i = -r; i <= r; ++i) {
      int yy = y + i;
      if (yy < 0) {
        if (!rep_t) continue;
        yy = 0;
      } else if (yy >= h) {
        if (!rep_b) continue;
        yy = h - 1;
      }
      const float* src = tmp.data() + static_cast<size_t>(yy) * w;
      float kv = kern[i + r];
      for (int x = 0; x < w; ++x) dst[x] += src[x] * kv;
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

  // All passes run only on the padded bounding box of the inverse-warped
  // crop quad: the mask is zero outside it, erosion only shrinks the
  // support, and the blur extends it by a radius the padding covers —
  // everything beyond the box is bit-identical to the full-frame pass
  // (frame pixels untouched where soft == 0). On a 1080×1920 frame this
  // is ~5× less work than the former full-frame passes.
  double det = ia * id - ib * ic;
  int bx0 = 0, by0 = 0, bx1 = w - 1, by1 = h - 1;
  if (std::abs(det) > 1e-12) {
    double ja = id / det, jb = -ib / det, jc = -ic / det, jd = ia / det;
    double jtx = (ib * ity - id * itx) / det;
    double jty = (ic * itx - ia * ity) / det;
    double xs[4], ys[4];
    const double cx[4] = {-1.0, static_cast<double>(fw), -1.0,
                          static_cast<double>(fw)};
    const double cy[4] = {-1.0, -1.0, static_cast<double>(fh),
                          static_cast<double>(fh)};
    double x_lo = 1e30, x_hi = -1e30, y_lo = 1e30, y_hi = -1e30;
    for (int i = 0; i < 4; ++i) {
      xs[i] = ja * cx[i] + jb * cy[i] + jtx;
      ys[i] = jc * cx[i] + jd * cy[i] + jty;
      x_lo = std::min(x_lo, xs[i]); x_hi = std::max(x_hi, xs[i]);
      y_lo = std::min(y_lo, ys[i]); y_hi = std::max(y_hi, ys[i]);
    }
    // upper bound on w_edge from the quad area (area after the 2×2
    // erosion can only be smaller)
    double area_ub = static_cast<double>(fw) * fh / std::abs(det);
    int we_ub = static_cast<int>(std::sqrt(std::max(area_ub, 0.0))) / 20 + 1;
    int pad = 2 * we_ub + 4;
    bx0 = std::max(0, static_cast<int>(std::floor(x_lo)) - pad);
    by0 = std::max(0, static_cast<int>(std::floor(y_lo)) - pad);
    bx1 = std::min(w - 1, static_cast<int>(std::ceil(x_hi)) + pad);
    by1 = std::min(h - 1, static_cast<int>(std::ceil(y_hi)) + pad);
    if (bx0 > bx1 || by0 > by1) return;  // face entirely off-frame
  }
  int bw = bx1 - bx0 + 1, bh = by1 - by0 + 1;
  bool rep_l = bx0 == 0, rep_r = bx1 == w - 1;
  bool rep_t = by0 == 0, rep_b = by1 == h - 1;

  std::vector<float> mask(static_cast<size_t>(bh) * bw);
  std::vector<float> tmp(static_cast<size_t>(bh) * bw);
  std::vector<float> pasted(static_cast<size_t>(bh) * bw * 3);

  // Per row, coverage can only be non-zero where the (monotone-in-gx)
  // source coords land inside the crop: solve the two double-precision
  // inequalities for a conservative gx interval (eps absorbs the
  // float-cast rounding of sx/sy, ±2 px absorbs everything else) and
  // zero-fill outside it — the bbox's blur padding (~2·w_edge per side)
  // plus the quad's corner triangles drop out of the per-pixel math.
  // Pixels inside the interval run the exact original test, so output
  // is bit-identical.
  const double eps = 1e-3;
  auto axis_range = [&](double slope, double off, double lo, double hi,
                        double& g0, double& g1) -> bool {
    // conservative gx range with lo-eps <= slope*gx + off <= hi+eps
    if (std::abs(slope) < 1e-9) {
      return off >= lo - eps - std::abs(slope) * 16384.0 &&
             off <= hi + eps + std::abs(slope) * 16384.0;  // whole row or none
    }
    double a = (lo - eps - off) / slope, b = (hi + eps - off) / slope;
    g0 = std::max(g0, std::min(a, b));
    g1 = std::min(g1, std::max(a, b));
    return true;
  };
  double area = 0;
  for (int y = 0; y < bh; ++y) {
    int gy = by0 + y;
    size_t rowi = static_cast<size_t>(y) * bw;
    double g0 = bx0, g1 = bx1;
    bool any = axis_range(ia, ib * gy + itx, -1.0, fw, g0, g1) &&
               axis_range(ic, id * gy + ity, -1.0, fh, g0, g1) && g0 <= g1;
    int x_beg = any ? std::max(0, static_cast<int>(std::floor(g0)) - bx0 - 2)
                    : bw;
    int x_end = any ? std::min(bw, static_cast<int>(std::ceil(g1)) - bx0 + 3)
                    : bw;
    if (x_beg > 0 || !any) {
      int n0 = any ? x_beg : bw;
      std::memset(mask.data() + rowi, 0, sizeof(float) * n0);
      std::memset(pasted.data() + rowi * 3, 0, sizeof(float) * n0 * 3);
    }
    if (any && x_end < bw) {
      std::memset(mask.data() + rowi + x_end, 0, sizeof(float) * (bw - x_end));
      std::memset(pasted.data() + (rowi + x_end) * 3, 0,
                  sizeof(float) * (bw - x_end) * 3);
    }
    for (int x = x_beg; x < x_end; ++x) {
      int gx = bx0 + x;
      float sx = static_cast<float>(ia * gx + ib * gy + itx);
      float sy = static_cast<float>(ic * gx + id * gy + ity);
      size_t i = rowi + x;
      float cov = mask_coverage(sx, sy, fh, fw);
      mask[i] = cov;
      if (cov == 0.f) {
        // composite multiplies pasted by the (eroded) mask — zero here
        pasted[i * 3 + 0] = pasted[i * 3 + 1] = pasted[i * 3 + 2] = 0.f;
        continue;
      }
      float px[3];
      sample_bilinear<3>(face, fh, fw, sx, sy, px);
      pasted[i * 3 + 0] = px[0];
      pasted[i * 3 + 1] = px[1];
      pasted[i * 3 + 2] = px[2];
    }
  }
  // erosion #1: 2×2 (ref: np.ones((2,2)))
  erode(mask, tmp, bh, bw, 2, rep_l, rep_r, rep_t, rep_b);
  for (size_t i = 0; i < mask.size(); ++i) area += mask[i];

  int w_edge = static_cast<int>(std::sqrt(std::max(area, 0.0))) / 20;
  std::vector<float> soft(mask);
  if (w_edge > 0) {
    erode(soft, tmp, bh, bw, w_edge * 2, rep_l, rep_r, rep_t, rep_b);
    gaussian_blur(soft, tmp, bh, bw, w_edge * 2 + 1, rep_l, rep_r, rep_t,
                  rep_b);
  }

  for (int y = 0; y < bh; ++y) {
    for (int x = 0; x < bw; ++x) {
      size_t i = static_cast<size_t>(y) * bw + x;
      float sm = soft[i];
      float hard = mask[i];
      uint8_t* dst = frame + (static_cast<size_t>(by0 + y) * w + bx0 + x) * 3;
      for (int k = 0; k < 3; ++k) {
        float v = sm * (hard * pasted[i * 3 + k]) + (1.f - sm) * dst[k];
        dst[k] = static_cast<uint8_t>(std::min(std::max(v, 0.f), 255.f));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Constant-geometry plan: on the live pipeline path every clip has ONE
// box and one (near-)constant align matrix, so the inverse-warp source
// coordinates, the eroded hard mask and the blurred soft mask are
// identical for all ~125 frames. Build them once, then applying to a
// frame is a sparse gather+blend over only the active (soft>0) pixels —
// the erosions, blur, coverage test and affine math all drop out of the
// per-frame cost. Arithmetic per pixel is kept EXACTLY the ops
// restore_one performs (same top/bot bilinear form, same
// sm*(hard*pasted)+(1-sm)*dst composite) so output is bit-identical.
// ---------------------------------------------------------------------------

struct PlanPx {
  uint32_t dst_off;            // pixel index into the (h, w) frame
  uint32_t o00, o01, o10, o11; // pixel indices into the (fh, fw) face
  float fx, fy;                // bilinear fractions (0 when cov == 0)
  float sm, hard;              // soft + eroded mask values
};

struct RestorePlan {
  int h, w, fh, fw;
  std::vector<PlanPx> px;
};

RestorePlan* plan_build(const double* align_m, int h, int w, int fh, int fw) {
  Affine m{align_m[0], align_m[1], align_m[2],
           align_m[3], align_m[4], align_m[5]};
  double ia = m.a, ib = m.b, itx = m.tx;
  double ic = m.c, id = m.d, ity = m.ty;

  // identical bbox derivation to restore_one
  double det = ia * id - ib * ic;
  int bx0 = 0, by0 = 0, bx1 = w - 1, by1 = h - 1;
  if (std::abs(det) > 1e-12) {
    double ja = id / det, jb = -ib / det, jc = -ic / det, jd = ia / det;
    double jtx = (ib * ity - id * itx) / det;
    double jty = (ic * itx - ia * ity) / det;
    const double cx[4] = {-1.0, static_cast<double>(fw), -1.0,
                          static_cast<double>(fw)};
    const double cy[4] = {-1.0, -1.0, static_cast<double>(fh),
                          static_cast<double>(fh)};
    double x_lo = 1e30, x_hi = -1e30, y_lo = 1e30, y_hi = -1e30;
    for (int i = 0; i < 4; ++i) {
      double X = ja * cx[i] + jb * cy[i] + jtx;
      double Y = jc * cx[i] + jd * cy[i] + jty;
      x_lo = std::min(x_lo, X); x_hi = std::max(x_hi, X);
      y_lo = std::min(y_lo, Y); y_hi = std::max(y_hi, Y);
    }
    double area_ub = static_cast<double>(fw) * fh / std::abs(det);
    int we_ub = static_cast<int>(std::sqrt(std::max(area_ub, 0.0))) / 20 + 1;
    int pad = 2 * we_ub + 4;
    bx0 = std::max(0, static_cast<int>(std::floor(x_lo)) - pad);
    by0 = std::max(0, static_cast<int>(std::floor(y_lo)) - pad);
    bx1 = std::min(w - 1, static_cast<int>(std::ceil(x_hi)) + pad);
    by1 = std::min(h - 1, static_cast<int>(std::ceil(y_hi)) + pad);
  }
  auto* plan = new RestorePlan{h, w, fh, fw, {}};
  if (bx0 > bx1 || by0 > by1) return plan;  // face entirely off-frame
  int bw = bx1 - bx0 + 1, bh = by1 - by0 + 1;
  bool rep_l = bx0 == 0, rep_r = bx1 == w - 1;
  bool rep_t = by0 == 0, rep_b = by1 == h - 1;

  std::vector<float> mask(static_cast<size_t>(bh) * bw);
  std::vector<float> tmp(static_cast<size_t>(bh) * bw);
  std::vector<float> sxs(static_cast<size_t>(bh) * bw);
  std::vector<float> sys(static_cast<size_t>(bh) * bw);
  for (int y = 0; y < bh; ++y) {
    int gy = by0 + y;
    for (int x = 0; x < bw; ++x) {
      int gx = bx0 + x;
      float sx = static_cast<float>(ia * gx + ib * gy + itx);
      float sy = static_cast<float>(ic * gx + id * gy + ity);
      size_t i = static_cast<size_t>(y) * bw + x;
      sxs[i] = sx;
      sys[i] = sy;
      mask[i] = mask_coverage(sx, sy, fh, fw);
    }
  }
  erode(mask, tmp, bh, bw, 2, rep_l, rep_r, rep_t, rep_b);
  double area = 0;
  for (size_t i = 0; i < mask.size(); ++i) area += mask[i];
  int w_edge = static_cast<int>(std::sqrt(std::max(area, 0.0))) / 20;
  std::vector<float> soft(mask);
  if (w_edge > 0) {
    erode(soft, tmp, bh, bw, w_edge * 2, rep_l, rep_r, rep_t, rep_b);
    gaussian_blur(soft, tmp, bh, bw, w_edge * 2 + 1, rep_l, rep_r, rep_t,
                  rep_b);
  }

  plan->px.reserve(static_cast<size_t>(bh) * bw / 2);
  for (int y = 0; y < bh; ++y) {
    for (int x = 0; x < bw; ++x) {
      size_t i = static_cast<size_t>(y) * bw + x;
      float sm = soft[i];
      if (sm == 0.f) continue;  // composite leaves dst bit-identical
      PlanPx p;
      p.dst_off = static_cast<uint32_t>((by0 + y) * w + (bx0 + x));
      p.sm = sm;
      p.hard = mask[i];
      float sx = sxs[i], sy = sys[i];
      if (sx < 0.f || sy < 0.f || sx > fw - 1.f || sy > fh - 1.f) {
        // cov==0 here (hard==0 too): pasted sample is exactly 0
        p.o00 = p.o01 = p.o10 = p.o11 = 0;
        p.fx = p.fy = 0.f;
        p.hard = 0.f;
      } else {
        int x0 = static_cast<int>(sx), y0 = static_cast<int>(sy);
        int x1 = std::min(x0 + 1, fw - 1), y1 = std::min(y0 + 1, fh - 1);
        p.fx = sx - x0;
        p.fy = sy - y0;
        p.o00 = static_cast<uint32_t>(y0 * fw + x0);
        p.o01 = static_cast<uint32_t>(y0 * fw + x1);
        p.o10 = static_cast<uint32_t>(y1 * fw + x0);
        p.o11 = static_cast<uint32_t>(y1 * fw + x1);
      }
      plan->px.push_back(p);
    }
  }
  return plan;
}

void plan_apply_one(const RestorePlan& plan, uint8_t* frame,
                    const uint8_t* face) {
  for (const PlanPx& p : plan.px) {
    uint8_t* dst = frame + static_cast<size_t>(p.dst_off) * 3;
    const uint8_t* f00 = face + static_cast<size_t>(p.o00) * 3;
    const uint8_t* f01 = face + static_cast<size_t>(p.o01) * 3;
    const uint8_t* f10 = face + static_cast<size_t>(p.o10) * 3;
    const uint8_t* f11 = face + static_cast<size_t>(p.o11) * 3;
    float fx = p.fx, fy = p.fy, sm = p.sm, hard = p.hard;
    for (int k = 0; k < 3; ++k) {
      float top = f00[k] * (1.f - fx) + f01[k] * fx;
      float bot = f10[k] * (1.f - fx) + f11[k] * fx;
      float pasted = top * (1.f - fy) + bot * fy;
      float v = sm * (hard * pasted) + (1.f - sm) * dst[k];
      dst[k] = static_cast<uint8_t>(std::min(std::max(v, 0.f), 255.f));
    }
  }
}

}  // namespace

extern "C" {

// Constant-geometry plan API (one matrix shared by all frames).
void* restore_plan_build(const double* mat, int h, int w, int fh, int fw) {
  return plan_build(mat, h, w, fh, fw);
}

void restore_plan_apply(void* plan_ptr, uint8_t* frames, const uint8_t* faces,
                        int n, int fh, int fw, int threads) {
  const RestorePlan& plan = *static_cast<RestorePlan*>(plan_ptr);
#ifdef _OPENMP
  if (threads > 0) omp_set_num_threads(threads);
#pragma omp parallel for schedule(dynamic)
#endif
  for (int i = 0; i < n; ++i) {
    plan_apply_one(plan,
                   frames + static_cast<size_t>(i) * plan.h * plan.w * 3,
                   faces + static_cast<size_t>(i) * fh * fw * 3);
  }
}

void restore_plan_free(void* plan_ptr) {
  delete static_cast<RestorePlan*>(plan_ptr);
}

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
