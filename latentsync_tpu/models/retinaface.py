"""RetinaFace detector (MobileNet0.25 backbone) in flax.

Re-derivation of ref:facelib/detection/retinaface/ (retinaface.py,
retinaface_net.py): depthwise-separable MobileNet backbone, 3-level FPN,
SSH context modules, per-level class/box/landmark heads over 2 anchors,
SSD-style decoding with prior boxes. Used by the CodeFormer restore
helper's detection stage; shares decode/NMS with face_detection.py.
"""

from __future__ import annotations

import itertools
import math
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .face_detection import decode_boxes, nms


def conv_bn(x, ch, stride, name, dtype, leaky=0.1):
    x = nn.Conv(ch, (3, 3), strides=(stride, stride), padding=1,
                use_bias=False, dtype=dtype, name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                     name=f"{name}_bn")(x)
    return jax.nn.leaky_relu(x, leaky)


def conv_dw(x, ch, stride, name, dtype):
    """Depthwise separable conv block (MobileNet)."""
    in_ch = x.shape[-1]
    x = nn.Conv(in_ch, (3, 3), strides=(stride, stride), padding=1,
                feature_group_count=in_ch, use_bias=False, dtype=dtype,
                name=f"{name}_dw")(x)
    x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                     name=f"{name}_dwbn")(x)
    x = jax.nn.leaky_relu(x, 0.1)
    x = nn.Conv(ch, (1, 1), use_bias=False, dtype=dtype, name=f"{name}_pw")(x)
    x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                     name=f"{name}_pwbn")(x)
    return jax.nn.leaky_relu(x, 0.1)


class SSH(nn.Module):
    """Context module: 3×3 + 5×5 + 7×7 receptive branches.

    `leaky` follows ref:facelib/detection/retinaface/retinaface_net.py:41
    — 0.1 only when out_channel ≤ 64 (MobileNet config), plain ReLU for
    the ResNet50 config's 256 channels."""

    out_channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        half = self.out_channel // 2
        quarter = self.out_channel // 4
        leaky = 0.1 if self.out_channel <= 64 else 0.0

        def cbn(x, ch, name, act=True):
            x = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                             name=f"{name}_bn")(x)
            return jax.nn.leaky_relu(x, leaky) if act else x

        c3 = cbn(x, half, "conv3x3", act=False)
        c5_1 = cbn(x, quarter, "conv5x5_1")
        c5 = cbn(c5_1, quarter, "conv5x5_2", act=False)
        c7_1 = cbn(c5_1, quarter, "conv7x7_2")
        c7 = cbn(c7_1, quarter, "conv7x7_3", act=False)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class RetinaFaceMobile(nn.Module):
    """MobileNet0.25 RetinaFace. Input (B, H, W, 3) BGR-mean-subtracted;
    returns per-level (cls, box, landmark) head outputs."""

    out_channel: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        # MobileNet0.25 stages (channels ×0.25 of standard)
        h = conv_bn(x, 8, 2, "stage1_0", d)
        h = conv_dw(h, 16, 1, "stage1_1", d)
        h = conv_dw(h, 32, 2, "stage1_2", d)
        h = conv_dw(h, 32, 1, "stage1_3", d)
        h = conv_dw(h, 64, 2, "stage1_4", d)
        h = conv_dw(h, 64, 1, "stage1_5", d)
        c1 = h  # stride 8
        h = conv_dw(h, 128, 2, "stage2_0", d)
        for i in range(5):
            h = conv_dw(h, 128, 1, f"stage2_{i + 1}", d)
        c2 = h  # stride 16
        h = conv_dw(h, 256, 2, "stage3_0", d)
        h = conv_dw(h, 256, 1, "stage3_1", d)
        c3 = h  # stride 32

        # FPN
        def lateral(x, name):
            x = nn.Conv(self.out_channel, (1, 1), use_bias=False, dtype=d,
                        name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                             name=f"{name}_bn")(x)
            return jax.nn.leaky_relu(x, 0.1)

        p3 = lateral(c3, "fpn_out3")
        p2 = lateral(c2, "fpn_out2")
        p1 = lateral(c1, "fpn_out1")
        b, h2, w2, _ = p2.shape
        p2 = p2 + jax.image.resize(p3, (b, h2, w2, self.out_channel), "nearest")
        p2 = conv_bn(p2, self.out_channel, 1, "fpn_merge2", d)
        b, h1, w1, _ = p1.shape
        p1 = p1 + jax.image.resize(p2, (b, h1, w1, self.out_channel), "nearest")
        p1 = conv_bn(p1, self.out_channel, 1, "fpn_merge1", d)

        feats = [
            SSH(self.out_channel, dtype=d, name=f"ssh{i + 1}")(p)
            for i, p in enumerate((p1, p2, p3))
        ]
        outputs = []
        for i, f in enumerate(feats):
            cls = nn.Conv(2 * 2, (1, 1), dtype=d, name=f"class_head_{i}")(f)
            box = nn.Conv(2 * 4, (1, 1), dtype=d, name=f"bbox_head_{i}")(f)
            ldm = nn.Conv(2 * 10, (1, 1), dtype=d, name=f"ldm_head_{i}")(f)
            outputs.append((cls, box, ldm))
        return outputs


class RetinaFaceResNet50(nn.Module):
    """ResNet50 RetinaFace — the restoration stack's DEFAULT detector
    (ref:facelib/utils/face_restoration_helper.py:61 det_model=
    'retinaface_resnet50'; built in ref:facelib/detection/retinaface/
    retinaface.py:69-97 from torchvision resnet50 layers 2/3/4 with
    in_channel=256, out_channel=256). FPN/SSH use plain ReLU (leaky=0
    at 256 channels, ref:retinaface_net.py:41,70-72). Input (B, H, W, 3)
    BGR-mean-subtracted; returns per-level (cls, box, landmark) heads."""

    out_channel: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .hyper_iqa import ResNet50Backbone

        d = self.dtype
        x = x.astype(d)
        # torchvision resnet50: layer2 (512, stride 8), layer3 (1024,
        # stride 16), layer4 (2048, stride 32)
        _, c1, c2, c3 = ResNet50Backbone(dtype=d, name="body")(x)

        def lateral(x, name):
            x = nn.Conv(self.out_channel, (1, 1), use_bias=False, dtype=d,
                        name=f"{name}_conv")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                             name=f"{name}_bn")(x)
            return nn.relu(x)

        p3 = lateral(c3, "fpn_out3")
        p2 = lateral(c2, "fpn_out2")
        p1 = lateral(c1, "fpn_out1")
        b, h2, w2, _ = p2.shape
        p2 = p2 + jax.image.resize(p3, (b, h2, w2, self.out_channel), "nearest")
        p2 = conv_bn(p2, self.out_channel, 1, "fpn_merge2", d, leaky=0.0)
        b, h1, w1, _ = p1.shape
        p1 = p1 + jax.image.resize(p2, (b, h1, w1, self.out_channel), "nearest")
        p1 = conv_bn(p1, self.out_channel, 1, "fpn_merge1", d, leaky=0.0)

        feats = [
            SSH(self.out_channel, dtype=d, name=f"ssh{i + 1}")(p)
            for i, p in enumerate((p1, p2, p3))
        ]
        outputs = []
        for i, f in enumerate(feats):
            cls = nn.Conv(2 * 2, (1, 1), dtype=d, name=f"class_head_{i}")(f)
            box = nn.Conv(2 * 4, (1, 1), dtype=d, name=f"bbox_head_{i}")(f)
            ldm = nn.Conv(2 * 10, (1, 1), dtype=d, name=f"ldm_head_{i}")(f)
            outputs.append((cls, box, ldm))
        return outputs


def prior_boxes(image_hw: Tuple[int, int]) -> np.ndarray:
    """Anchor priors: strides (8, 16, 32), two sizes per level
    (ref:facelib/detection/retinaface/retinaface_utils.py PriorBox)."""
    h, w = image_hw
    min_sizes = [[16, 32], [64, 128], [256, 512]]
    steps = [8, 16, 32]
    anchors = []
    for k, step in enumerate(steps):
        fh, fw = math.ceil(h / step), math.ceil(w / step)
        for i, j in itertools.product(range(fh), range(fw)):
            for ms in min_sizes[k]:
                cx = (j + 0.5) * step / w
                cy = (i + 0.5) * step / h
                anchors.append([cx, cy, ms / w, ms / h])
    return np.asarray(anchors, np.float32)


class RetinaFaceDetector:
    """Both reference backbones (ref:facelib/detection/retinaface/
    retinaface.py:20-73 generate_config): 'mobile0.25' and 'resnet50'
    (the restoration default). Decode/NMS shared — both configs use the
    same priors/variance."""

    def __init__(self, params=None, dtype=jnp.float32,
                 network: str = "mobile0.25"):
        net = network.replace("retinaface_", "")
        if net == "mobile0.25":
            self.model = RetinaFaceMobile(dtype=dtype)
        elif net == "resnet50":
            self.model = RetinaFaceResNet50(dtype=dtype)
        else:
            raise ValueError(f"unknown RetinaFace network {network!r}")
        if params is None:
            from ..utils.params import fast_init

            params = fast_init(
                lambda x: self.model.init(jax.random.PRNGKey(0), x),
                jnp.zeros((1, 128, 128, 3)),
            )
        self.params = params
        self._fn = jax.jit(lambda p, x: self.model.apply(p, x))

    def detect(self, image_rgb: np.ndarray, conf_thresh: float = 0.8,
               nms_thresh: float = 0.4) -> np.ndarray:
        """(N, 15): box(4) + score(1) + 5 landmarks(10), pixel coords."""
        h, w = image_rgb.shape[:2]
        mean = np.array([104.0, 117.0, 123.0], np.float32)  # BGR means
        x = image_rgb[..., ::-1].astype(np.float32) - mean
        outs = self._fn(self.params, jnp.asarray(x[None]))
        cls_list, box_list, ldm_list = [], [], []
        for cls, box, ldm in outs:
            cls_list.append(np.asarray(cls[0], np.float32).reshape(-1, 2))
            box_list.append(np.asarray(box[0], np.float32).reshape(-1, 4))
            ldm_list.append(np.asarray(ldm[0], np.float32).reshape(-1, 10))
        scores_raw = np.concatenate(cls_list)
        loc = np.concatenate(box_list)
        ldm = np.concatenate(ldm_list)
        priors = prior_boxes((h, w))
        n = min(len(priors), len(loc))
        priors, loc, ldm, scores_raw = priors[:n], loc[:n], ldm[:n], scores_raw[:n]

        e = np.exp(scores_raw - scores_raw.max(-1, keepdims=True))
        scores = (e / e.sum(-1, keepdims=True))[:, 1]
        boxes = decode_boxes(loc, priors) * np.array([w, h, w, h], np.float32)
        keep = scores > conf_thresh
        if not keep.any():
            return np.zeros((0, 15), np.float32)
        boxes, scores, ldm, priors = boxes[keep], scores[keep], ldm[keep], priors[keep]
        # landmark decoding: cx + dx*var*pw per point
        pts = priors[:, None, :2] + ldm.reshape(-1, 5, 2) * 0.1 * priors[:, None, 2:]
        pts = (pts * np.array([w, h], np.float32)).reshape(-1, 10)
        dets = np.concatenate([boxes, scores[:, None], pts], axis=1)
        keep_idx = nms(dets[:, :4], dets[:, 4], nms_thresh)
        return dets[keep_idx]


def convert_retinaface_resnet50(sd):
    """detection_Resnet50_Final.pth → RetinaFaceResNet50 params.

    torch naming (ref:facelib/detection/retinaface/retinaface.py:93-113):
    body.{conv1,bn1,layer{L}.{i}.(conv1..3|bn1..3|downsample.0/1)}
    (torchvision resnet50 via IntermediateLayerGetter), fpn.output{N}.0/1
    + fpn.merge{N}.0/1, ssh{N}.conv{KxK}*, {Class,Bbox,Landmark}Head.{i}.
    conv1x1."""
    import numpy as np

    params = {}
    stats = {}

    def put(tree, path, name, w):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[name] = w

    def put_cv(path, leaf, w):
        if leaf == "weight":
            put(params, path, "kernel", np.transpose(w, (2, 3, 1, 0)))
        else:
            put(params, path, "bias", w)

    def put_bn(path, leaf, w):
        if leaf == "weight":
            put(params, path, "scale", w)
        elif leaf == "bias":
            put(params, path, "bias", w)
        elif leaf == "running_mean":
            put(stats, path, "mean", w)
        elif leaf == "running_var":
            put(stats, path, "var", w)

    _SSH_BRANCH = {"conv3X3": "conv3x3", "conv5X5_1": "conv5x5_1",
                   "conv5X5_2": "conv5x5_2", "conv7X7_2": "conv7x7_2",
                   "conv7x7_3": "conv7x7_3"}
    _HEAD = {"ClassHead": "class_head", "BboxHead": "bbox_head",
             "LandmarkHead": "ldm_head"}

    for key, w in sd.items():
        key = key.replace("module.", "")
        if key.endswith("num_batches_tracked") or key.startswith(
                ("body.fc", "body.avgpool")):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "body":
            sub = parts[1]
            if sub == "conv1":
                put_cv(("body", "conv1"), leaf, w)
            elif sub == "bn1":
                put_bn(("body", "bn1"), leaf, w)
            elif sub.startswith("layer"):
                blk = f"{sub}_{parts[2]}"
                inner = parts[3]
                if inner.startswith("conv"):
                    put_cv(("body", blk, inner), leaf, w)
                elif inner.startswith("bn"):
                    put_bn(("body", blk, inner), leaf, w)
                elif inner == "downsample":
                    if parts[4] == "0":
                        put_cv(("body", blk, "ds_conv"), leaf, w)
                    else:
                        put_bn(("body", blk, "ds_bn"), leaf, w)
        elif parts[0] == "fpn":
            name = parts[1].replace("output", "fpn_out").replace(
                "merge", "fpn_merge")
            j = int(parts[2])
            tgt = (f"{name}_conv",) if j == 0 else (f"{name}_bn",)
            (put_cv if j == 0 else put_bn)(tgt, leaf, w)
        elif parts[0].startswith("ssh"):
            branch = _SSH_BRANCH[parts[1]]
            j = int(parts[2])
            tgt = ((parts[0], f"{branch}_conv") if j == 0
                   else (parts[0], f"{branch}_bn"))
            (put_cv if j == 0 else put_bn)(tgt, leaf, w)
        elif parts[0] in _HEAD:
            put_cv((f"{_HEAD[parts[0]]}_{parts[1]}",), leaf, w)
    return {"params": params, "batch_stats": stats}


def convert_retinaface(sd):
    """mobilenet0.25_Final.pth → RetinaFaceMobile params
    (ref:facelib/detection/retinaface/retinaface_net.py naming:
    body.stageN.i Sequentials, fpn.output/merge, sshN.convKxK branches,
    ClassHead/BboxHead/LandmarkHead conv1x1 lists)."""
    import numpy as np

    params = {}
    stats = {}

    def put(tree, path, name, w):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[name] = w

    def put_cv(path, leaf, w):
        if leaf == "weight":
            put(params, path, "kernel", np.transpose(w, (2, 3, 1, 0)))
        else:
            put(params, path, "bias", w)

    def put_bn(path, leaf, w):
        if leaf == "weight":
            put(params, path, "scale", w)
        elif leaf == "bias":
            put(params, path, "bias", w)
        elif leaf == "running_mean":
            put(stats, path, "mean", w)
        elif leaf == "running_var":
            put(stats, path, "var", w)

    _SSH_BRANCH = {"conv3X3": "conv3x3", "conv5X5_1": "conv5x5_1",
                   "conv5X5_2": "conv5x5_2", "conv7X7_2": "conv7x7_2",
                   "conv7x7_3": "conv7x7_3"}
    _HEAD = {"ClassHead": "class_head", "BboxHead": "bbox_head",
             "LandmarkHead": "ldm_head"}

    for key, w in sd.items():
        key = key.replace("module.", "")
        if key.endswith("num_batches_tracked") or key.startswith(("body.fc", "body.avg")):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "body":
            stage, i, j = parts[1], int(parts[2]), int(parts[3])
            mod = f"{stage}_{i}"
            if stage == "stage1" and i == 0:  # plain conv_bn
                tgt = (f"{mod}_conv",) if j == 0 else (f"{mod}_bn",)
                (put_cv if j == 0 else put_bn)(tgt, leaf, w)
            else:  # conv_dw: 0 dw, 1 dwbn, 3 pw, 4 pwbn
                sub = {0: "_dw", 1: "_dwbn", 3: "_pw", 4: "_pwbn"}[j]
                (put_cv if j in (0, 3) else put_bn)((f"{mod}{sub}",), leaf, w)
        elif parts[0] == "fpn":
            name = parts[1].replace("output", "fpn_out").replace("merge", "fpn_merge")
            j = int(parts[2])
            tgt = (f"{name}_conv",) if j == 0 else (f"{name}_bn",)
            (put_cv if j == 0 else put_bn)(tgt, leaf, w)
        elif parts[0].startswith("ssh"):
            branch = _SSH_BRANCH[parts[1]]
            j = int(parts[2])
            tgt = (parts[0], f"{branch}_conv") if j == 0 else (parts[0], f"{branch}_bn")
            (put_cv if j == 0 else put_bn)(tgt, leaf, w)
        elif parts[0] in _HEAD:
            put_cv((f"{_HEAD[parts[0]]}_{parts[1]}",), leaf, w)
    return {"params": params, "batch_stats": stats}
