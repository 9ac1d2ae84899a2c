"""YOLOv5-face detector (yolov5n-face) in flax, channels-last.

Re-derivation of ref:facelib/detection/yolov5face/ (models/yolo.py:30-95
Detect, models/common.py:42-171 Conv/StemBlock/ShuffleV2Block/C3,
models/yolov5n.yaml layer plan, face_detector.py YoloDetector wrapper,
utils/general.py:89 non_max_suppression_face). Outputs per face:
(x1, y1, x2, y2, conf, 5 landmark points) — the facelib 5-point
alignment source alternative to RetinaFace.

TPU-first: NHWC, BN folded at inference, the whole backbone+head one
jit; box/landmark decode stays in the program (pure elementwise);
NMS + letterbox bookkeeping on host (tiny)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (ref:models/yolov5n.yaml anchors)
ANCHORS = np.array([
    [[4, 5], [8, 10], [13, 16]],        # P3/8
    [[23, 29], [43, 55], [73, 105]],    # P4/16
    [[146, 217], [231, 300], [335, 433]],  # P5/32
], np.float32)
STRIDES = (8, 16, 32)


class ConvBNSiLU(nn.Module):
    """common.py Conv: conv(no bias) + BN + SiLU."""

    c2: int
    k: int = 1
    s: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=self.k // 2, feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn")(x)
        return nn.silu(x).astype(self.dtype)


def channel_shuffle(x, groups: int = 2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(b, h, w, c)


class StemBlock(nn.Module):
    """(ref:common.py:57-71)."""

    c2: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = ConvBNSiLU(self.c2, 3, 2, dtype=self.dtype, name="stem_1")(x)
        s2a = ConvBNSiLU(self.c2 // 2, 1, 1, dtype=self.dtype, name="stem_2a")(s1)
        s2b = ConvBNSiLU(self.c2, 3, 2, dtype=self.dtype, name="stem_2b")(s2a)
        s2p = nn.max_pool(s1, (2, 2), strides=(2, 2), padding="SAME")  # ceil_mode
        return ConvBNSiLU(self.c2, 1, 1, dtype=self.dtype, name="stem_3")(
            jnp.concatenate([s2b, s2p], axis=-1)
        )


class _BranchConv(nn.Module):
    """conv(no bias)+BN with optional SiLU — one torch Sequential slot pair."""

    c2: int
    k: int = 1
    s: int = 1
    groups: int = 1
    act: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s),
                    padding=self.k // 2, feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn")(x)
        return nn.silu(x).astype(self.dtype) if self.act else x.astype(self.dtype)


class ShuffleV2Block(nn.Module):
    """(ref:common.py:120-170)."""

    oup: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bf = self.oup // 2
        inp = x.shape[-1]
        if self.stride > 1:
            b1 = _BranchConv(inp, 3, self.stride, groups=inp,
                             dtype=self.dtype, name="b1_dw")(x)
            b1 = _BranchConv(bf, 1, act=True, dtype=self.dtype, name="b1_pw")(b1)
            b2_in = x
        else:
            b1, b2_in = jnp.split(x, 2, axis=-1)
        b2 = _BranchConv(bf, 1, act=True, dtype=self.dtype, name="b2_pw1")(b2_in)
        b2 = _BranchConv(bf, 3, self.stride, groups=bf,
                         dtype=self.dtype, name="b2_dw")(b2)
        b2 = _BranchConv(bf, 1, act=True, dtype=self.dtype, name="b2_pw2")(b2)
        return channel_shuffle(jnp.concatenate([b1, b2], axis=-1), 2)


class Bottleneck(nn.Module):
    """(ref:common.py:74-84)."""

    c2: int
    shortcut: bool = True
    e: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = int(self.c2 * self.e)
        h = ConvBNSiLU(c_, 1, 1, dtype=self.dtype, name="cv1")(x)
        h = ConvBNSiLU(self.c2, 3, 1, dtype=self.dtype, name="cv2")(h)
        return x + h if self.shortcut and x.shape[-1] == self.c2 else h


class C3(nn.Module):
    """(ref:common.py:106-117)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = self.c2 // 2
        h = ConvBNSiLU(c_, 1, 1, dtype=self.dtype, name="cv1")(x)
        for i in range(self.n):
            h = Bottleneck(c_, self.shortcut, dtype=self.dtype, name=f"m_{i}")(h)
        y = ConvBNSiLU(c_, 1, 1, dtype=self.dtype, name="cv2")(x)
        return ConvBNSiLU(self.c2, 1, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([h, y], axis=-1)
        )


class SPP(nn.Module):
    """Spatial pyramid pooling (ref:common.py:173-184): cv1 → concat
    [x, maxpool_k(x) for k] → cv2."""

    c2: int
    ks: Tuple[int, ...] = (3, 5, 7)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = x.shape[-1] // 2
        h = ConvBNSiLU(c_, 1, 1, dtype=self.dtype, name="cv1")(x)
        pools = [
            nn.max_pool(h, (k, k), strides=(1, 1),
                        padding=((k // 2, k // 2), (k // 2, k // 2)))
            for k in self.ks
        ]
        return ConvBNSiLU(self.c2, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([h] + pools, axis=-1)
        )


def decode_level(p, li: int, nc: int = 1):
    """Grid/anchor decode for one detect level (ref:models/yolo.py:53-88).
    p: (B, ny, nx, 3·no) raw head conv output → (B, ny·nx·3, no)."""
    no = nc + 5 + 10
    b, ny, nx, _ = p.shape
    # (B, ny, nx, na, no) — channel layout matches torch's
    # view(bs, na, no, ny, nx).permute(0,1,3,4,2) after our NHWC conv
    p = p.reshape(b, ny, nx, 3, no).astype(jnp.float32)
    gx, gy = jnp.meshgrid(jnp.arange(nx, dtype=jnp.float32),
                          jnp.arange(ny, dtype=jnp.float32))
    grid = jnp.stack([gx, gy], -1)[None, :, :, None, :]  # (1,ny,nx,1,2)
    anchor = jnp.asarray(ANCHORS[li])[None, None, None]   # (1,1,1,3,2)
    stride = float(STRIDES[li])
    xy = (jax.nn.sigmoid(p[..., 0:2]) * 2.0 - 0.5 + grid) * stride
    wh = (jax.nn.sigmoid(p[..., 2:4]) * 2.0) ** 2 * anchor
    conf = jax.nn.sigmoid(p[..., 4:5])
    lmk = p[..., 5:15].reshape(b, ny, nx, 3, 5, 2)
    lmk = lmk * anchor[:, :, :, :, None, :] + grid[:, :, :, :, None, :] * stride
    cls = jax.nn.sigmoid(p[..., 15:])
    out = jnp.concatenate(
        [xy, wh, conf, lmk.reshape(b, ny, nx, 3, 10), cls], axis=-1
    )
    return out.reshape(b, ny * nx * 3, no)


class YOLOv5lFace(nn.Module):
    """yolov5l-face graph (ref:models/yolov5l.yaml; shipped by
    ref:facelib/detection/__init__.py:51 as the large YOLO option):
    StemBlock(64) → CSP C3 stages (3/9/9) with stride convs → SPP(3,5,7)
    → C3 → PANet head with 3-repeat C3 blocks. Same Detect decode as
    yolov5n. Input (B, H, W, 3) in [0, 1] → (B, N, 16)."""

    nc: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = x.astype(dt)
        y0 = StemBlock(64, dtype=dt, name="m0")(x)                     # /4
        y1 = C3(128, 3, True, dtype=dt, name="m1")(y0)
        y2 = ConvBNSiLU(256, 3, 2, dtype=dt, name="m2")(y1)            # /8
        y3 = C3(256, 9, True, dtype=dt, name="m3")(y2)
        y4 = ConvBNSiLU(512, 3, 2, dtype=dt, name="m4")(y3)            # /16
        y5 = C3(512, 9, True, dtype=dt, name="m5")(y4)
        y6 = ConvBNSiLU(1024, 3, 2, dtype=dt, name="m6")(y5)           # /32
        y7 = SPP(1024, (3, 5, 7), dtype=dt, name="m7")(y6)
        y8 = C3(1024, 3, False, dtype=dt, name="m8")(y7)

        y9 = ConvBNSiLU(512, 1, 1, dtype=dt, name="m9")(y8)
        b, h, w, c = y9.shape
        y10 = jax.image.resize(y9, (b, h * 2, w * 2, c), "nearest")
        y12 = C3(512, 3, False, dtype=dt, name="m12")(
            jnp.concatenate([y10, y5], axis=-1))
        y13 = ConvBNSiLU(256, 1, 1, dtype=dt, name="m13")(y12)
        b, h, w, c = y13.shape
        y14 = jax.image.resize(y13, (b, h * 2, w * 2, c), "nearest")
        y16 = C3(256, 3, False, dtype=dt, name="m16")(
            jnp.concatenate([y14, y3], axis=-1))                       # P3
        y17 = ConvBNSiLU(256, 3, 2, dtype=dt, name="m17")(y16)
        y19 = C3(512, 3, False, dtype=dt, name="m19")(
            jnp.concatenate([y17, y13], axis=-1))                      # P4
        y20 = ConvBNSiLU(512, 3, 2, dtype=dt, name="m20")(y19)
        y22 = C3(1024, 3, False, dtype=dt, name="m22")(
            jnp.concatenate([y20, y9], axis=-1))                       # P5

        no = self.nc + 5 + 10
        outs = []
        for li, feat in enumerate((y16, y19, y22)):
            p = nn.Conv(no * 3, (1, 1), dtype=dt, name=f"detect_m{li}")(feat)
            outs.append(decode_level(p, li, self.nc))
        return jnp.concatenate(outs, axis=1)


class YOLOv5nFace(nn.Module):
    """yolov5n-face graph (ref:models/yolov5n.yaml). Input (B, H, W, 3)
    in [0, 1]; returns decoded (B, N, 16) = xyxy-style cxcywh+conf+10
    landmark coords + cls, already grid/anchor-decoded like
    ref:models/yolo.py:53-88."""

    nc: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = x.astype(dt)
        y0 = StemBlock(32, dtype=dt, name="m0")(x)                    # /4
        y1 = ShuffleV2Block(128, 2, dtype=dt, name="m1")(y0)          # /8
        y2 = y1
        for i in range(3):
            y2 = ShuffleV2Block(128, 1, dtype=dt, name=f"m2_{i}")(y2)
        y3 = ShuffleV2Block(256, 2, dtype=dt, name="m3")(y2)          # /16
        y4 = y3
        for i in range(7):
            y4 = ShuffleV2Block(256, 1, dtype=dt, name=f"m4_{i}")(y4)
        y5 = ShuffleV2Block(512, 2, dtype=dt, name="m5")(y4)          # /32
        y6 = y5
        for i in range(3):
            y6 = ShuffleV2Block(512, 1, dtype=dt, name=f"m6_{i}")(y6)

        y7 = ConvBNSiLU(128, 1, 1, dtype=dt, name="m7")(y6)
        b, h, w, c = y7.shape
        y8 = jax.image.resize(y7, (b, h * 2, w * 2, c), "nearest")
        y10 = C3(128, 1, False, dtype=dt, name="m10")(
            jnp.concatenate([y8, y4], axis=-1))
        y11 = ConvBNSiLU(128, 1, 1, dtype=dt, name="m11")(y10)
        b, h, w, c = y11.shape
        y12 = jax.image.resize(y11, (b, h * 2, w * 2, c), "nearest")
        y14 = C3(128, 1, False, dtype=dt, name="m14")(
            jnp.concatenate([y12, y2], axis=-1))                      # P3
        y15 = ConvBNSiLU(128, 3, 2, dtype=dt, name="m15")(y14)
        y17 = C3(128, 1, False, dtype=dt, name="m17")(
            jnp.concatenate([y15, y11], axis=-1))                     # P4
        y18 = ConvBNSiLU(128, 3, 2, dtype=dt, name="m18")(y17)
        y20 = C3(128, 1, False, dtype=dt, name="m20")(
            jnp.concatenate([y18, y7], axis=-1))                      # P5

        no = self.nc + 5 + 10
        outs = []
        for li, feat in enumerate((y14, y17, y20)):
            p = nn.Conv(no * 3, (1, 1), dtype=dt, name=f"detect_m{li}")(feat)
            outs.append(decode_level(p, li, self.nc))
        return jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# host-side wrapper: letterbox → net → NMS → rescale
# ---------------------------------------------------------------------------


def _nms_face(pred: np.ndarray, conf_thres=0.25, iou_thres=0.45,
              max_det=300) -> np.ndarray:
    """(ref:utils/general.py:89-170 non_max_suppression_face) for one
    image: pred (N, 16) cxcywh+conf+lmk10+cls → (M, 16) xyxy+conf+lmk10+cls."""
    mask = pred[:, 4] > conf_thres
    pred = pred[mask]
    if not len(pred):
        return np.zeros((0, 16), np.float32)
    boxes = np.empty_like(pred[:, :4])
    boxes[:, 0] = pred[:, 0] - pred[:, 2] / 2
    boxes[:, 1] = pred[:, 1] - pred[:, 3] / 2
    boxes[:, 2] = pred[:, 0] + pred[:, 2] / 2
    boxes[:, 3] = pred[:, 1] + pred[:, 3] / 2
    scores = pred[:, 4] * pred[:, 15]
    order = scores.argsort()[::-1][: max_det * 4]
    boxes, pred, scores = boxes[order], pred[order], scores[order]
    keep = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    idxs = np.arange(len(boxes))
    while len(idxs):
        i = idxs[0]
        keep.append(i)
        if len(keep) >= max_det:
            break
        xx1 = np.maximum(boxes[i, 0], boxes[idxs[1:], 0])
        yy1 = np.maximum(boxes[i, 1], boxes[idxs[1:], 1])
        xx2 = np.minimum(boxes[i, 2], boxes[idxs[1:], 2])
        yy2 = np.minimum(boxes[i, 3], boxes[idxs[1:], 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[i] + areas[idxs[1:]] - inter + 1e-9)
        idxs = idxs[1:][iou <= iou_thres]
    out = np.concatenate(
        [boxes[keep], pred[keep, 4:5], pred[keep, 5:15], pred[keep, 15:16]],
        axis=1,
    )
    return out.astype(np.float32)


class YOLOv5FaceDetector:
    """Drop-in face/landmark source (ref:face_detector.py YoloDetector):
    detect(image) → (M, 15) [x1,y1,x2,y2,conf, 5·(lx,ly)]."""

    def __init__(self, params=None, img_size: int = 640, min_face: int = 10,
                 dtype=jnp.float32, network: str = "YOLOv5n"):
        net = network.lower()
        if net == "yolov5n":
            self.model = YOLOv5nFace(dtype=dtype)
        elif net == "yolov5l":
            self.model = YOLOv5lFace(dtype=dtype)
        else:
            raise ValueError(f"unknown YOLOv5-face network {network!r}")
        if params is None:
            from ..utils.params import fast_init

            params = fast_init(
                lambda x: self.model.init(jax.random.PRNGKey(0), x),
                jnp.zeros((1, img_size, img_size, 3)),
            )
        self.params = params
        self.img_size = img_size
        self.min_face = min_face
        self._fn = jax.jit(lambda p, x: self.model.apply(p, x))

    def detect(self, image_rgb: np.ndarray, conf_thres=0.25, iou_thres=0.45):
        import cv2

        h0, w0 = image_rgb.shape[:2]
        s = self.img_size / max(h0, w0)
        nh, nw = int(round(h0 * s)), int(round(w0 * s))
        resized = cv2.resize(image_rgb, (nw, nh))
        canvas = np.full((self.img_size, self.img_size, 3), 114, np.uint8)
        canvas[:nh, :nw] = resized
        x = jnp.asarray(canvas[None].astype(np.float32) / 255.0)
        pred = np.asarray(self._fn(self.params, x)[0], np.float32)
        dets = _nms_face(pred, conf_thres, iou_thres)
        if len(dets):
            dets[:, :4] /= s
            dets[:, 5:15] /= s
            keep = (dets[:, 2] - dets[:, 0]) >= self.min_face
            dets = dets[keep]
        return dets[:, :15]


# ---------------------------------------------------------------------------
# converter
# ---------------------------------------------------------------------------


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


# our ShuffleV2Block name → (torch branch, torch Sequential conv/bn slots)
_SHUF = {
    "b1_dw": ("branch1", "0", "1"),
    "b1_pw": ("branch1", "2", "3"),
    "b2_pw1": ("branch2", "0", "1"),
    "b2_dw": ("branch2", "3", "4"),
    "b2_pw2": ("branch2", "5", "6"),
}
_SHUF_T = {(v[0], v[1]): (k, "conv") for k, v in _SHUF.items()}
_SHUF_T.update({(v[0], v[2]): (k, "bn") for k, v in _SHUF.items()})

# yaml layer index → (our name, repeats)
_LAYERS = {
    0: ("m0", 0), 1: ("m1", 0), 2: ("m2", 3), 3: ("m3", 0), 4: ("m4", 7),
    5: ("m5", 0), 6: ("m6", 3), 7: ("m7", 0), 10: ("m10", 0), 11: ("m11", 0),
    14: ("m14", 0), 15: ("m15", 0), 17: ("m17", 0), 18: ("m18", 0),
    20: ("m20", 0),
}


def convert_yolov5face(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch `model.{i}...` state dict (ref:models/yolo.py parse_model
    naming) → YOLOv5nFace variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(path: Tuple[str, ...], leaf: str, w):
        tree = stats if leaf in ("mean", "var") else params
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = w

    def put_convbn(base, parts, w):
        # parts like ("conv", "weight") or ("bn", "running_mean")
        kind, leaf = parts[0], parts[1]
        if kind == "conv" and leaf == "weight":
            put(base + ("conv",), "kernel", _conv2d(w))
        elif kind == "bn":
            name = {"weight": "scale", "bias": "bias",
                    "running_mean": "mean", "running_var": "var"}.get(leaf)
            if name:
                put(base + ("bn",), name, w)

    for key, w in sd.items():
        parts = key.split(".")
        if parts[0] != "model":
            continue
        idx = int(parts[1])
        rest = parts[2:]
        if idx == 21:  # Detect: m.{0,1,2} 1x1 convs with bias
            li = rest[1]
            leaf = rest[2]
            if leaf == "weight":
                put((f"detect_m{li}",), "kernel", _conv2d(w))
            elif leaf == "bias":
                put((f"detect_m{li}",), "bias", w)
            continue
        if idx not in _LAYERS:
            continue
        name, repeats = _LAYERS[idx]
        if repeats:  # Sequential of ShuffleV2Blocks: model.{i}.{j}.branch...
            sub = f"{name}_{rest[0]}"
            branch, slot = rest[1], rest[2]
            ours = _SHUF_T.get((branch, slot))
            if ours:
                put_convbn((sub, ours[0]), (ours[1], rest[3]), w)
            continue
        if idx == 0:  # StemBlock
            put_convbn((name, rest[0]), rest[1:3], w)
        elif idx in (1, 3, 5):  # single ShuffleV2Block
            ours = _SHUF_T.get((rest[0], rest[1]))
            if ours:
                put_convbn((name, ours[0]), (ours[1], rest[2]), w)
        elif idx in (7, 11, 15, 18):  # Conv
            put_convbn((name,), rest, w)
        else:  # C3: cv1/cv2/cv3/m.{j}
            if rest[0] == "m":
                put_convbn((name, f"m_{rest[1]}", rest[2]), rest[3:5], w)
            else:
                put_convbn((name, rest[0]), rest[1:3], w)
    return {"params": params, "batch_stats": stats}


# yolov5l yaml layer index → (our name, module kind)
_L_LAYERS = {
    0: ("m0", "stem"), 1: ("m1", "c3"), 2: ("m2", "conv"), 3: ("m3", "c3"),
    4: ("m4", "conv"), 5: ("m5", "c3"), 6: ("m6", "conv"), 7: ("m7", "spp"),
    8: ("m8", "c3"), 9: ("m9", "conv"), 12: ("m12", "c3"),
    13: ("m13", "conv"), 16: ("m16", "c3"), 17: ("m17", "conv"),
    19: ("m19", "c3"), 20: ("m20", "conv"), 22: ("m22", "c3"),
}


def convert_yolov5l_face(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """yolov5l-face torch `model.{i}...` state dict (ref:models/yolo.py
    parse_model over models/yolov5l.yaml) → YOLOv5lFace variables.
    Detect sits at layer 23 (vs 21 in yolov5n)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(path: Tuple[str, ...], leaf: str, w):
        tree = stats if leaf in ("mean", "var") else params
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = w

    def put_convbn(base, parts, w):
        kind, leaf = parts[0], parts[1]
        if kind == "conv" and leaf == "weight":
            put(base + ("conv",), "kernel", _conv2d(w))
        elif kind == "bn":
            name = {"weight": "scale", "bias": "bias",
                    "running_mean": "mean", "running_var": "var"}.get(leaf)
            if name:
                put(base + ("bn",), name, w)

    for key, w in sd.items():
        parts = key.split(".")
        if parts[0] != "model":
            continue
        idx = int(parts[1])
        rest = parts[2:]
        if idx == 23:  # Detect: m.{0,1,2} 1x1 convs with bias
            li, leaf = rest[1], rest[2]
            if leaf == "weight":
                put((f"detect_m{li}",), "kernel", _conv2d(w))
            elif leaf == "bias":
                put((f"detect_m{li}",), "bias", w)
            continue
        if idx not in _L_LAYERS:
            continue
        name, kind = _L_LAYERS[idx]
        if kind == "stem":
            put_convbn((name, rest[0]), rest[1:3], w)
        elif kind in ("conv",):
            put_convbn((name,), rest, w)
        elif kind == "spp":
            put_convbn((name, rest[0]), rest[1:3], w)
        else:  # C3: cv1/cv2/cv3/m.{j}.cv1/cv2
            if rest[0] == "m":
                put_convbn((name, f"m_{rest[1]}", rest[2]), rest[3:5], w)
            else:
                put_convbn((name, rest[0]), rest[1:3], w)
    return {"params": params, "batch_stats": stats}
