"""Face detection / landmark models: S3FD, 2D-FAN, RetinaFace-mobile.

Coverage of the reference's detector zoo:
- S3FD (ref:eval/detectors/s3fd/nets.py + box_utils.py): VGG16-based
  single-shot detector with L2Norm-scaled multi-scale heads; used by the
  eval face-track extractor (ref:eval/syncnet_detect.py:25).
- 2D-FAN (the face_alignment package's 68-landmark stacked-hourglass
  model the pipeline uses on GPU, ref:latentsync/utils/
  image_processor.py:61-63).
- RetinaFace-style mobile detector (ref:facelib/detection/retinaface/)
  used by the CodeFormer restore helper.

All are flax modules with torch-weight converters; detection decoding
(priors, NMS) is vectorized jnp/numpy.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# shared box utilities (ref:eval/detectors/s3fd/box_utils.py)
# ---------------------------------------------------------------------------


def decode_boxes(loc: np.ndarray, priors: np.ndarray,
                 variances=(0.1, 0.2)) -> np.ndarray:
    """SSD box decoding: offsets (cx, cy, w, h) → corner boxes."""
    centers = priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:]
    sizes = priors[:, 2:] * np.exp(loc[:, 2:] * variances[1])
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1)
    return boxes


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float = 0.3) -> List[int]:
    """Greedy IoU NMS."""
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        iou = inter / (areas[i] + areas[order[1:]] - inter + 1e-9)
        order = order[1:][iou <= thresh]
    return keep


def bounding_box_iou(a, b) -> float:
    """(ref:eval/syncnet_detect.py:239-251)."""
    xx1 = max(a[0], b[0]); yy1 = max(a[1], b[1])
    xx2 = min(a[2], b[2]); yy2 = min(a[3], b[3])
    inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
    union = ((a[2] - a[0]) * (a[3] - a[1])
             + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / (union + 1e-9)


def iou_tracking(detections: List[np.ndarray], min_track: int = 11,
                 iou_thresh: float = 0.5, num_failed_det: int = 25,
                 min_face_size: float = 0.0) -> List[dict]:
    """Greedy IoU face tracking with the reference's stitching semantics
    (ref:eval/syncnet_detect.py:108-148 track_face): repeated passes each
    consume one track; a track tolerates up to `num_failed_det` missed
    frames between detections, gaps are filled by per-coordinate linear
    interpolation, and tracks whose mean box is smaller than
    `min_face_size` px are dropped.

    detections: per-frame arrays of (x1, y1, x2, y2[, conf]) rows.
    Returns [{"frames": [int], "boxes": [np.ndarray(4)]}] with gap-filled
    consecutive frame ranges.
    """
    remaining: List[List[np.ndarray]] = [
        [np.asarray(d, np.float64) for d in dets] for dets in detections
    ]
    tracks: List[dict] = []
    while True:
        track: List[tuple] = []  # (frame, box)
        for f, faces in enumerate(remaining):
            for face in list(faces):
                if not track:
                    track.append((f, face[:4]))
                    faces.remove(face)
                elif f - track[-1][0] <= num_failed_det:
                    if bounding_box_iou(face[:4], track[-1][1]) > iou_thresh:
                        track.append((f, face[:4]))
                        faces.remove(face)
                        continue
                else:
                    break
        if not track:
            break
        if len(track) > min_track:
            framenum = np.array([f for f, _ in track])
            bboxes = np.array([b for _, b in track])
            frame_i = np.arange(framenum[0], framenum[-1] + 1)
            # linear interpolation over detection gaps (ref:136-141)
            bboxes_i = np.stack(
                [np.interp(frame_i, framenum, bboxes[:, c]) for c in range(4)],
                axis=1,
            )
            mean_w = np.mean(bboxes_i[:, 2] - bboxes_i[:, 0])
            mean_h = np.mean(bboxes_i[:, 3] - bboxes_i[:, 1])
            if max(mean_w, mean_h) > min_face_size:
                tracks.append({
                    "frames": [int(f) for f in frame_i],
                    "boxes": [b.astype(np.float32) for b in bboxes_i],
                })
    return tracks


# ---------------------------------------------------------------------------
# S3FD
# ---------------------------------------------------------------------------


class L2Norm(nn.Module):
    """Channel-wise L2 normalization with learned scale
    (ref:s3fd/nets.py L2Norm)."""

    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "weight", nn.initializers.constant(self.init_scale), (x.shape[-1],)
        )
        norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)) + 1e-10
        return (x / norm * scale).astype(x.dtype)


class S3FD(nn.Module):
    """S3FD detector: VGG16 trunk + extra layers, 6 detection scales.

    Input (B, H, W, 3) BGR-mean-subtracted; returns per-scale
    (cls_logits, box_regs) lists for decoding on host.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def conv(x, ch, name, k=3, s=1, p=1):
            return nn.Conv(ch, (k, k), strides=(s, s), padding=p,
                           dtype=self.dtype, name=name)(x)

        def block(x, chs, prefix, start):
            for i, ch in enumerate(chs):
                x = nn.relu(conv(x, ch, f"{prefix}_{start + i}"))
            return x

        def pool_ceil(x):
            # torch MaxPool2d(2,2, ceil_mode=True) (ref:nets.py:52): pad
            # odd edges with -inf so the extra cell takes the valid max
            ph, pw = x.shape[1] % 2, x.shape[2] % 2
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                            constant_values=-jnp.inf)
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        sources = []
        h = block(x.astype(self.dtype), (64, 64), "vgg", 0)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = block(h, (128, 128), "vgg", 2)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = block(h, (256, 256, 256), "vgg", 4)
        sources.append(L2Norm(10.0, name="l2norm3")(h))  # conv3_3
        h = pool_ceil(h)  # the ONE ceil_mode pool (ref:nets.py:52)
        h = block(h, (512, 512, 512), "vgg", 7)
        sources.append(L2Norm(8.0, name="l2norm4")(h))  # conv4_3
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = block(h, (512, 512, 512), "vgg", 10)
        sources.append(L2Norm(5.0, name="l2norm5")(h))  # conv5_3
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        # fc6/fc7 as convs — fc6 is the atrous VGG head: 3×3, dilation 6,
        # padding 6 (ref:nets.py:70)
        h = nn.relu(nn.Conv(1024, (3, 3), padding=6, kernel_dilation=(6, 6),
                            dtype=self.dtype, name="fc6")(h))
        h = nn.relu(nn.Conv(1024, (1, 1), dtype=self.dtype, name="fc7")(h))
        sources.append(h)
        # extras
        h = nn.relu(conv(h, 256, "conv6_1", k=1, p=0))
        h = nn.relu(conv(h, 512, "conv6_2", s=2))
        sources.append(h)
        h = nn.relu(conv(h, 128, "conv7_1", k=1, p=0))
        h = nn.relu(conv(h, 256, "conv7_2", s=2))
        sources.append(h)

        cls_outs, box_outs = [], []
        for i, src in enumerate(sources):
            # first scale uses max-out background (4 cls channels)
            ncls = 4 if i == 0 else 2
            cls_outs.append(conv(src, ncls, f"cls_{i}"))
            box_outs.append(conv(src, 4, f"box_{i}"))
        return cls_outs, box_outs


class S3FDDetector:
    """Host-side decoding: anchors at strides (4..128), scales 4×stride."""

    def __init__(self, params=None, dtype=jnp.float32):
        self.model = S3FD(dtype=dtype)
        if params is None:
            from ..utils.params import fast_init

            params = fast_init(
                lambda x: self.model.init(jax.random.PRNGKey(0), x),
                jnp.zeros((1, 128, 128, 3)),
            )
        self.params = params
        self._fn = jax.jit(lambda p, x: self.model.apply(p, x))

    def detect(self, image_rgb: np.ndarray, conf_thresh: float = 0.8) -> np.ndarray:
        mean = np.array([123.0, 117.0, 104.0], np.float32)
        x = image_rgb.astype(np.float32) - mean
        cls_outs, box_outs = self._fn(self.params, jnp.asarray(x[None]))
        h, w = image_rgb.shape[:2]
        dets = []
        for i, (cls, box) in enumerate(zip(cls_outs, box_outs)):
            stride = 4 * (2 ** i)
            cls = np.asarray(cls[0], np.float32)
            box = np.asarray(box[0], np.float32)
            if cls.shape[-1] == 4:  # max-out bg for the first scale
                bg = cls[..., :3].max(axis=-1, keepdims=True)
                cls = np.concatenate([bg, cls[..., 3:]], axis=-1)
            prob = np.exp(cls) / np.exp(cls).sum(-1, keepdims=True)
            score = prob[..., 1]
            ys, xs = np.where(score > conf_thresh)
            for yy, xx in zip(ys, xs):
                cx = (xx + 0.5) * stride
                cy = (yy + 0.5) * stride
                anchor = np.array([cx, cy, stride * 4.0, stride * 4.0])
                loc = box[yy, xx]
                decoded = decode_boxes(loc[None], anchor[None])[0]
                dets.append(np.concatenate([decoded, [score[yy, xx]]]))
        if not dets:
            return np.zeros((0, 5), np.float32)
        dets = np.stack(dets)
        keep = nms(dets[:, :4], dets[:, 4])
        return dets[keep]


# ---------------------------------------------------------------------------
# 2D-FAN (stacked hourglass, 68 landmarks)
# ---------------------------------------------------------------------------


class ConvBlock(nn.Module):
    """FAN conv block: 3-way split residual (ref face_alignment models)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x):
        c = self.out_channels
        in_ch = x.shape[-1]

        def bn_relu_conv(x, ch, k, name):
            x = nn.BatchNorm(use_running_average=not self.train,
                             dtype=jnp.float32, name=f"{name}_bn")(x)
            x = nn.relu(x).astype(self.dtype)
            return nn.Conv(ch, (k, k), padding=k // 2, use_bias=False,
                           dtype=self.dtype, name=f"{name}_conv")(x)

        y1 = bn_relu_conv(x, c // 2, 3, "b1")
        y2 = bn_relu_conv(y1, c // 4, 3, "b2")
        y3 = bn_relu_conv(y2, c // 4, 3, "b3")
        out = jnp.concatenate([y1, y2, y3], axis=-1)
        if in_ch != c:
            skip = nn.BatchNorm(use_running_average=not self.train,
                                dtype=jnp.float32, name="ds_bn")(x)
            skip = nn.relu(skip).astype(self.dtype)
            skip = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                           name="ds_conv")(skip)
            return out + skip
        return out + x


class Hourglass(nn.Module):
    depth: int = 4
    features: int = 256
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x):
        def recurse(x, level):
            up1 = ConvBlock(self.features, dtype=self.dtype, train=self.train,
                            name=f"up1_{level}")(x)
            low = nn.avg_pool(x, (2, 2), strides=(2, 2))
            low = ConvBlock(self.features, dtype=self.dtype, train=self.train,
                            name=f"low1_{level}")(low)
            if level > 1:
                low = recurse(low, level - 1)
            else:
                low = ConvBlock(self.features, dtype=self.dtype,
                                train=self.train, name=f"low2_{level}")(low)
            low = ConvBlock(self.features, dtype=self.dtype, train=self.train,
                            name=f"low3_{level}")(low)
            b, h, w, c = low.shape
            up2 = jax.image.resize(low, (b, h * 2, w * 2, c), "nearest")
            return up1 + up2

        return recurse(x, self.depth)


class FAN2D(nn.Module):
    """2D-FAN 68-landmark heatmap regressor (4 stacked hourglasses).

    Input (B, 256, 256, 3) in [0, 1]; output (B, 64, 64, 68) heatmaps
    per stack (last one used for landmarks).

    `features`/`num_modules` default to the face_alignment 2DFAN4 shape
    (converter target); the packaged no-checkpoint fallback trains a
    1-module, narrower instance (scripts/train_landmark_fallback.py)."""

    num_modules: int = 4
    features: int = 256
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x):
        F = self.features
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype,
                    name="conv1")(x.astype(self.dtype))
        h = nn.BatchNorm(use_running_average=not self.train,
                         dtype=jnp.float32, name="bn1")(h)
        h = nn.relu(h).astype(self.dtype)
        h = ConvBlock(F // 2, dtype=self.dtype, train=self.train,
                      name="conv2")(h)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = ConvBlock(F // 2, dtype=self.dtype, train=self.train,
                      name="conv3")(h)
        h = ConvBlock(F, dtype=self.dtype, train=self.train, name="conv4")(h)

        outputs = []
        prev = h
        for m in range(self.num_modules):
            hg = Hourglass(4, F, dtype=self.dtype, train=self.train,
                           name=f"m{m}_hg")(prev)
            ll = ConvBlock(F, dtype=self.dtype, train=self.train,
                           name=f"m{m}_top")(hg)
            ll = nn.Conv(F, (1, 1), dtype=self.dtype, name=f"m{m}_conv_last")(ll)
            ll = nn.BatchNorm(use_running_average=not self.train,
                              dtype=jnp.float32, name=f"m{m}_bn_end")(ll)
            ll = nn.relu(ll).astype(self.dtype)
            heat = nn.Conv(68, (1, 1), dtype=self.dtype, name=f"m{m}_l")(ll)
            outputs.append(heat)
            if m < self.num_modules - 1:
                prev = (
                    prev
                    + nn.Conv(F, (1, 1), dtype=self.dtype, name=f"m{m}_bl")(ll)
                    + nn.Conv(F, (1, 1), dtype=self.dtype, name=f"m{m}_al")(heat)
                )
        return outputs


def decode_heatmaps_device(heat: jnp.ndarray, scale: float = 4.0) -> jnp.ndarray:
    """Device-side mirror of heatmaps_to_landmarks: (N, H, W, K) →
    (N, K, 2) sub-pixel argmax coords in input pixels. Keeping the
    decode inside the jitted forward shrinks the per-call fetch from
    the full heatmap volume (~1.1 MB/frame through the tunneled
    transport) to 68 coordinate pairs."""
    n, h, w, k = heat.shape
    flat = heat.reshape(n, h * w, k)
    idx = jnp.argmax(flat, axis=1)  # (N, K)
    ys, xs = idx // w, idx % w
    ni = jnp.arange(n)[:, None]
    ki = jnp.arange(k)[None, :]

    def at(y, x):
        return heat[ni, y, x, ki]

    interior = (xs > 0) & (xs < w - 1) & (ys > 0) & (ys < h - 1)
    xc = jnp.clip(xs, 1, w - 2)
    yc = jnp.clip(ys, 1, h - 2)
    dx = jnp.sign(at(yc, xc + 1) - at(yc, xc - 1)) * 0.25
    dy = jnp.sign(at(yc + 1, xc) - at(yc - 1, xc)) * 0.25
    coords = jnp.stack([xs, ys], -1).astype(jnp.float32)
    coords = coords + jnp.where(
        interior[..., None], jnp.stack([dx, dy], -1).astype(jnp.float32), 0.0)
    return (coords + 0.5) * scale


def heatmaps_to_landmarks(heatmaps: np.ndarray, scale: float = 4.0) -> np.ndarray:
    """(B, 64, 64, 68) → (B, 68, 2) sub-pixel argmax landmark coords in
    input-image pixels (face_alignment decoding with the ±0.25 refinement)."""
    b, h, w, n = heatmaps.shape
    flat = heatmaps.reshape(b, h * w, n)
    idx = flat.argmax(axis=1)  # (B, 68)
    ys, xs = np.divmod(idx, w)
    coords = np.stack([xs, ys], axis=-1).astype(np.float64)
    for bi in range(b):
        for li in range(n):
            x, y = int(xs[bi, li]), int(ys[bi, li])
            if 0 < x < w - 1 and 0 < y < h - 1:
                hm = heatmaps[bi, :, :, li]
                dx = np.sign(hm[y, x + 1] - hm[y, x - 1]) * 0.25
                dy = np.sign(hm[y + 1, x] - hm[y - 1, x]) * 0.25
                coords[bi, li] += (dx, dy)
    return (coords + 0.5) * scale


class HaarBoxDetector:
    """Face-BOX stage adapter: wraps HaarAnchorDetector's cascade box
    search behind the `.detect(image_rgb) → (N, ≥4)` protocol the
    landmark detectors expect, so a FAN crop stage works with zero
    model checkpoints (the packaged-fallback configuration)."""

    def __init__(self):
        from ..utils.face import HaarAnchorDetector

        self._haar = HaarAnchorDetector()

    def detect(self, image_rgb: np.ndarray) -> np.ndarray:
        x, y, w, h = self._haar._detect_box(image_rgb)
        # expand: Haar boxes hug the inner face; FAN crops train on a
        # full-head framing with margin (synthetic_faces.render_face)
        cx, cy = x + w / 2.0, y + h / 2.0
        half = max(w, h) * 0.72
        return np.array([[cx - half, cy - half * 1.05,
                          cx + half, cy + half * 0.95, 1.0]], np.float32)


class FANLandmarkDetector:
    """68-landmark source pluggable into ImageProcessor: face box (S3FD or
    provided) → 256² crop → FAN heatmaps → landmarks.

    Architecture (stack count / width) is inferred from the checkpoint so
    the same class serves converted 2DFAN4 weights and the packaged
    1-module fallback."""

    def __init__(self, fan_params=None, face_detector=None, dtype=jnp.float32):
        num_modules, features = 4, 256
        if fan_params is not None:
            p = fan_params.get("params", fan_params)
            num_modules = sum(1 for k in p if k.startswith("m") and
                              k.endswith("_hg"))
            features = np.asarray(p["m0_conv_last"]["kernel"]).shape[-1]
        self.model = FAN2D(num_modules=num_modules, features=features,
                           dtype=dtype)
        if fan_params is None:
            from ..utils.params import fast_init

            fan_params = fast_init(
                lambda x: self.model.init(jax.random.PRNGKey(0), x),
                jnp.zeros((1, 256, 256, 3)),
            )
        self.params = fan_params
        self.face_detector = face_detector
        # uint8 in (4× less H2D traffic on the tunneled transport),
        # landmark decode ON DEVICE (fetch 68 coord pairs, not the
        # ~1.1 MB/frame heatmap volume)
        self._fn = jax.jit(lambda p, x: decode_heatmaps_device(
            self.model.apply(p, x.astype(jnp.float32) / 255.0)[-1]))
        # batch-size buckets bound the compile-variant count when a
        # whole clip's crops run as one device call (detect_batch)
        self._buckets = (1, 16, 128)

    def _crop_box(self, image_rgb: np.ndarray):
        h, w = image_rgb.shape[:2]
        if self.face_detector is not None:
            dets = self.face_detector.detect(image_rgb)
            if len(dets):
                x1, y1, x2, y2 = dets[0][:4]
            else:
                x1, y1, x2, y2 = 0, 0, w, h
        else:
            x1, y1, x2, y2 = 0, 0, w, h
        x1, y1 = max(int(x1), 0), max(int(y1), 0)
        x2, y2 = min(int(x2), w), min(int(y2), h)
        return x1, y1, x2, y2

    def _run_bucketed(self, crops_u8: np.ndarray) -> np.ndarray:
        """(N, 256, 256, 3) uint8 → (N, 68, 2) crop-space landmarks via
        fixed-size padded device calls."""
        n = crops_u8.shape[0]
        out = np.empty((n, 68, 2), np.float32)
        i = 0
        while i < n:
            take = min(n - i, self._buckets[-1])
            size = next(b for b in self._buckets if b >= take)
            batch = np.zeros((size, 256, 256, 3), np.uint8)
            batch[:take] = crops_u8[i : i + take]
            lm = np.asarray(self._fn(self.params, jnp.asarray(batch)))
            out[i : i + take] = lm[:take]
            i += take
        return out

    def _pass(self, images, boxes) -> np.ndarray:
        import cv2

        crops = np.stack([
            cv2.resize(img[y1:y2, x1:x2], (256, 256))
            for img, (x1, y1, x2, y2) in zip(images, boxes)
        ])
        lms = self._run_bucketed(crops)
        for lm, (x1, y1, x2, y2) in zip(lms, boxes):
            lm[:, 0] = lm[:, 0] * (x2 - x1) / 256.0 + x1
            lm[:, 1] = lm[:, 1] * (y2 - y1) / 256.0 + y1
        return lms

    def detect_batch(self, images) -> np.ndarray:
        """Whole-clip landmark pass: per-frame box detect (host) +
        ONE bucketed device call for the FAN forward — through the
        tunneled transport this replaces per-frame dispatch+fetch
        round-trips with a single transfer each way.

        Two passes, self-localizing: when the box stage is weak (the
        OpenCV-5 no-cascade heuristic), pass 1's crop carries a lot of
        background, outside the face-filling crop distribution the net
        was trained on. Pass 2 re-crops around pass 1's landmark bbox
        (median-pooled over the clip — the track is for one face) and
        re-runs, which puts the face at the trained framing."""
        # pass 1 only feeds the clip-level consensus box — a stride
        # subsample (≤16 frames) is statistically identical for the
        # median and cuts the tunnel H2D payload ~8×
        n = len(images)
        sub = list(range(0, n, max(1, n // 16)))[:16]
        sub_imgs = [images[i] for i in sub]
        boxes = [self._crop_box(img) for img in sub_imgs]
        lms = self._pass(sub_imgs, boxes)
        per = np.stack([
            [lm[:, 0].min(), lm[:, 1].min(), lm[:, 0].max(), lm[:, 1].max()]
            for lm in lms
        ])
        x1, y1 = np.median(per[:, 0]), np.median(per[:, 1])
        x2, y2 = np.median(per[:, 2]), np.median(per[:, 3])
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        half = max(x2 - x1, y2 - y1) * 0.62  # landmark span → head + margin
        h_img, w_img = images[0].shape[:2]
        rx1 = int(max(cx - half, 0))
        rx2 = int(min(cx + half, w_img))
        ry1 = int(max(cy - half * 1.1, 0))
        ry2 = int(min(cy + half * 0.9, h_img))
        if rx2 - rx1 > 16 and ry2 - ry1 > 16:
            return self._pass(images, [(rx1, ry1, rx2, ry2)] * n)
        # degenerate consensus box: per-frame detector boxes, full set
        return self._pass(images, [self._crop_box(img) for img in images])

    def __call__(self, image_rgb: np.ndarray) -> np.ndarray:
        return self.detect_batch([image_rgb])[0]


def init_detection_model(model_name: str, params=None, dtype=None):
    """Detector factory matching the reference's four names
    (ref:facelib/detection/__init__.py:14-51 init_detection_model →
    init_retinaface_model / init_yolov5face_model): returns an object
    with .detect(image_rgb) → (N, 15) rows [x1,y1,x2,y2,conf,5·(lx,ly)].

    The reference restoration default is 'retinaface_resnet50'
    (ref:facelib/utils/face_restoration_helper.py:61)."""
    import jax.numpy as jnp

    dtype = jnp.float32 if dtype is None else dtype
    if "retinaface" in model_name:
        from .retinaface import RetinaFaceDetector

        if model_name not in ("retinaface_resnet50", "retinaface_mobile0.25"):
            raise NotImplementedError(f"{model_name} is not implemented.")
        return RetinaFaceDetector(params=params, dtype=dtype,
                                  network=model_name)
    if "YOLOv5" in model_name:
        from .yolov5face import YOLOv5FaceDetector

        if model_name not in ("YOLOv5l", "YOLOv5n"):
            raise NotImplementedError(f"{model_name} is not implemented.")
        return YOLOv5FaceDetector(params=params, dtype=dtype,
                                  network=model_name)
    raise NotImplementedError(f"{model_name} is not implemented.")
