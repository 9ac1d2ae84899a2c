"""Face geometry: landmark smoothing, similarity alignment, warp/restore.

Covers the reference's geometry layer (ref:latentsync/utils/
affine_transform.py, image_processor.py:118-143):

- `similarity_from_points`: least-squares similarity transform (SVD
  orthogonal Procrustes) from 3 anchor points (brow means + nose mean)
  to the canonical face template, with the exponential temporal bias
  smoothing of ref:affine_transform.py:24-31.
- `LandmarkSmoother`: exponential landmark smoothing keyed on motion
  magnitude (ref:affine_transform.py:118-144).
- `AlignRestore`: template warp to the 210×280 face crop and inverse
  warp + eroded/blurred soft-mask composite for paste-back
  (ref:affine_transform.py:35-115). Host path uses cv2 (matching
  LANCZOS4 + erode/GaussianBlur semantics); `warp_affine_batch` is the
  device-side batched bilinear sampler for the TPU fast path.
- Landmark sources are pluggable: precomputed arrays (the serving path,
  ref:lipsync_pipeline.py:400-405), a FAN/S3FD detector (weights
  permitting), or a Haar-cascade box heuristic fallback.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


# ---------------------------------------------------------------------------
# similarity transform
# ---------------------------------------------------------------------------


def similarity_from_points(
    src: np.ndarray,
    dst: np.ndarray,
    smooth: bool = True,
    prev_bias: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """2×3 similarity transform mapping src → dst points.

    Orthogonal-Procrustes on standardized point sets; when `smooth`, the
    translation is nudged by an EMA of the STANDARDIZED third-point
    residual (bias = 0.2·prev + 0.8·cur) — the reference standardizes its
    point arrays in place before taking the residual
    (ref:affine_transform.py:10-31), so the bias lives in normalized
    units, a sub-pixel-scale stabilizer rather than a raw-pixel shift.
    """
    src = np.asarray(src, np.float64).copy()
    dst = np.asarray(dst, np.float64).copy()
    c1, c2 = src.mean(0), dst.mean(0)
    s1 = np.std(src - c1)
    s2 = np.std(dst - c2)
    if s1 < 1e-9 or s2 < 1e-9:
        # degenerate anchors (all points coincide — e.g. a detector
        # whiff on a flat frame) must not NaN the whole clip: fall back
        # to pure translation at unit scale
        m = np.array([[1.0, 0.0, c2[0] - c1[0]],
                      [0.0, 1.0, c2[1] - c1[1]]], np.float64)
        return m, (prev_bias if smooth else None)
    a = (src - c1) / s1
    b = (dst - c2) / s2
    u, _, vt = np.linalg.svd(a.T @ b)
    r = (u @ vt).T
    scale = s2 / s1
    m = np.empty((2, 3), np.float64)
    m[:, :2] = scale * r
    m[:, 2] = c2 - scale * (r @ c1)
    bias = None
    if smooth:
        cur = b[2] - a[2]  # standardized residual of the 3rd (nose) point
        bias = cur if prev_bias is None else prev_bias * 0.2 + cur * 0.8
        m[:, 2] += bias
    return m, bias


class LandmarkSmoother:
    """Exponential landmark smoothing weighted by per-point motion
    (ref:affine_transform.py:118-144)."""

    def __init__(self, alpha: float = 0.3):
        self.alpha = alpha
        self.prev: Optional[np.ndarray] = None

    def reset(self):
        self.prev = None

    def __call__(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, np.float64)
        if self.prev is None:
            self.prev = pts.copy()
            return pts.copy()
        width = pts[:, 0].max() - pts[:, 0].min()
        d2 = ((pts - self.prev) ** 2).sum(axis=1)
        w = np.exp(-d2 / (width * self.alpha))[:, None]
        out = self.prev * w + pts * (1 - w)
        self.prev = out.copy()
        return out


def landmarks68_to_anchor3(lm68: np.ndarray) -> np.ndarray:
    """68-point landmarks → 3 alignment anchors: left-brow mean,
    right-brow mean, nose mean (ref:image_processor.py:132-135)."""
    out = np.zeros((3, 2))
    out[0] = lm68[17:22].mean(0)
    out[1] = lm68[22:27].mean(0)
    out[2] = lm68[27:36].mean(0)
    return out


# ---------------------------------------------------------------------------
# align / restore
# ---------------------------------------------------------------------------


@dataclass
class AlignRestore:
    """Canonical face-crop geometry (ratio 2.8 → 210×280 crop,
    ref:affine_transform.py:36-44)."""

    ratio: float = 2.8
    upscale_factor: float = 1.0
    prev_bias: Optional[np.ndarray] = None

    def __post_init__(self):
        template = np.array([[17.0, 20.0], [58.0, 20.0], [37.5, 40.0]])
        self.face_template = template * self.ratio
        self.face_size = (int(75 * self.ratio), int(100 * self.ratio))  # (w, h)

    def reset(self):
        self.prev_bias = None

    def align_warp_face(
        self, img: np.ndarray, anchor3: np.ndarray, smooth: bool = True,
        border_value=(127, 127, 127),
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Warp the frame to the canonical crop; returns (face, 2×3 M)."""
        m, self.prev_bias = similarity_from_points(
            anchor3, self.face_template, smooth, self.prev_bias
        )
        face = cv2.warpAffine(
            img, m, self.face_size, flags=cv2.INTER_LANCZOS4,
            borderMode=cv2.BORDER_CONSTANT, borderValue=border_value,
        )
        return face, m

    def restore_img(
        self, frame: np.ndarray, face: np.ndarray, affine_matrix: np.ndarray
    ) -> np.ndarray:
        """Inverse-warp the synthesized face crop into the original frame
        with an eroded + blurred soft mask (ref:affine_transform.py:85-115)."""
        h, w = frame.shape[:2]
        inv = cv2.invertAffineTransform(np.asarray(affine_matrix, np.float64))
        restored = cv2.warpAffine(face, inv, (w, h), flags=cv2.INTER_LANCZOS4)
        # mask covers the pasted face's own extent. The reference hardcodes
        # self.face_size here (ref:affine_transform.py:92) — identical when
        # the face is the align output (its only domain), but per-frame-box
        # bundles resize faces to their own boxes (ref:lipsync_pipeline.py:
        # 343-350), where a fixed-size mask would blend black borders in.
        mask = np.ones(face.shape[:2], np.float32)
        inv_mask = cv2.warpAffine(mask, inv, (w, h))
        k = max(int(2 * self.upscale_factor), 1)
        inv_mask = cv2.erode(inv_mask, np.ones((k, k), np.uint8))
        area = inv_mask.sum()
        edge = int(area**0.5) // 20
        if edge > 0:
            center = cv2.erode(inv_mask, np.ones((edge * 2, edge * 2), np.uint8))
            soft = cv2.GaussianBlur(center, (edge * 2 + 1, edge * 2 + 1), 0)
        else:
            soft = inv_mask
        soft = soft[:, :, None]
        out = soft * (inv_mask[:, :, None] * restored) + (1 - soft) * frame
        return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# device-side batched warp (TPU fast path)
# ---------------------------------------------------------------------------


def warp_affine_batch(images, matrices, out_hw: Tuple[int, int], fill: float = 127.0):
    """Batched inverse-mapped bilinear affine warp on device.

    images: (B, H, W, C) float; matrices: (B, 2, 3) mapping INPUT→OUTPUT
    coords (cv2 convention); output (B, out_h, out_w, C). Gathers lower to
    one XLA gather per batch — replaces per-frame cv2.warpAffine on the
    hot path (SURVEY §7 "device-side warp").
    """
    import jax.numpy as jnp

    b = images.shape[0]
    out_h, out_w = out_hw
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    grid = jnp.stack([xs, ys, ones], axis=-1).reshape(-1, 3)  # (P, 3)

    m = jnp.asarray(matrices, jnp.float32)  # forward 2x3
    # invert each 2x3: [A|t]⁻¹ = [A⁻¹ | -A⁻¹t]
    a = m[:, :, :2]
    t = m[:, :, 2:]
    det = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    inv_a = (
        jnp.stack(
            [a[:, 1, 1], -a[:, 0, 1], -a[:, 1, 0], a[:, 0, 0]], axis=-1
        ).reshape(b, 2, 2)
        / det[:, None, None]
    )
    inv_t = -jnp.einsum("bij,bjk->bik", inv_a, t)

    src = jnp.einsum("bij,pj->bpi", inv_a, grid[:, :2]) + inv_t[:, None, :, 0]
    sx, sy = src[..., 0], src[..., 1]

    h, w = images.shape[1:3]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    def gather(yi, xi):
        valid = (
            (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        )[..., None]
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jnp.take_along_axis(
            images.reshape(b, h * w, -1),
            (yi * w + xi)[..., None].astype(jnp.int32),
            axis=1,
        )
        return jnp.where(valid, vals, fill)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    return out.reshape(b, out_h, out_w, -1)


# ---------------------------------------------------------------------------
# landmark sources
# ---------------------------------------------------------------------------


class HaarAnchorDetector:
    """Dependency-free fallback landmark source.

    Prefers an OpenCV Haar cascade face box (OpenCV ≤4; removed in
    OpenCV 5), degrading to a static talking-head heuristic (face box
    centered in the upper half of the frame). Either way the box becomes
    a 3-anchor estimate (brows ≈33% down the box, nose ≈55%). Lets the
    pipeline run end-to-end where no FAN/S3FD weights are available;
    accuracy is box-level only — production paths use precomputed
    bundles (ref:lipsync_pipeline.py:400-405) or the FAN detector."""

    def __init__(self):
        self.cascade = None
        if hasattr(cv2, "CascadeClassifier") and hasattr(cv2, "data"):
            try:
                self.cascade = cv2.CascadeClassifier(
                    cv2.data.haarcascades + "haarcascade_frontalface_default.xml"
                )
            except Exception:
                self.cascade = None
        self.prev: Optional[np.ndarray] = None

    def _detect_box(self, image_rgb: np.ndarray):
        h, w = image_rgb.shape[:2]
        if self.cascade is not None:
            gray = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2GRAY)
            faces = self.cascade.detectMultiScale(gray, 1.1, 4, minSize=(40, 40))
            if len(faces):
                return max(faces, key=lambda f: f[2] * f[3])
        # static heuristic: centered face occupying ~45% of frame width,
        # upper 40% of the frame (portrait talking-head framing)
        fw = int(w * 0.45)
        fh = int(fw * 1.2)
        return (w // 2 - fw // 2, int(h * 0.18), fw, fh)

    def __call__(self, image_rgb: np.ndarray) -> np.ndarray:
        x, y, fw, fh = self._detect_box(image_rgb)
        anchors = np.array(
            [
                [x + 0.30 * fw, y + 0.33 * fh],
                [x + 0.70 * fw, y + 0.33 * fh],
                [x + 0.50 * fw, y + 0.55 * fh],
            ]
        )
        self.prev = anchors
        return anchors
