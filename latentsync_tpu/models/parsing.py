"""Face parsing: ParseNet (ref:facelib/parsing/parsenet.py) used by the
restore helper for seamless paste-back masks
(ref:facelib/utils/face_restoration_helper.py:372-520)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class PConvLayer(nn.Module):
    """ConvLayer (ref:facelib/parsing/parsenet.py:74-111): optional
    nearest-up / stride-down, reflection pad, conv, optional BN, optional
    LeakyReLU(0.2). BN implies bias-free conv, exactly as upstream."""

    out_ch: int
    scale: str = "none"  # none | down | up
    norm: bool = False
    relu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.scale == "up":
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        stride = 2 if self.scale == "down" else 1
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = nn.Conv(self.out_ch, (3, 3), strides=(stride, stride),
                    padding="VALID", use_bias=not self.norm,
                    dtype=self.dtype, name="conv2d")(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                             name="norm")(x).astype(self.dtype)
        if self.relu:
            x = jax.nn.leaky_relu(x, 0.2)
        return x


class PResidualBlock(nn.Module):
    """(ref:parsenet.py:113-137): conv1 (BN+LeakyReLU) -> conv2 (BN only)
    + shortcut (plain scaled conv, or identity); NO activation after the
    add."""

    out_ch: int
    scale: str = "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.scale == "none" and x.shape[-1] == self.out_ch:
            identity = x
        else:
            identity = PConvLayer(self.out_ch, self.scale, dtype=self.dtype,
                                  name="shortcut_func")(x)
        scale_conf = {"down": ("none", "down"), "up": ("up", "none"),
                      "none": ("none", "none")}[self.scale]
        h = PConvLayer(self.out_ch, scale_conf[0], norm=True, relu=True,
                       dtype=self.dtype, name="conv1")(x)
        h = PConvLayer(self.out_ch, scale_conf[1], norm=True, relu=False,
                       dtype=self.dtype, name="conv2")(h)
        return identity + h


class ParseNet(nn.Module):
    """Encoder-body-decoder face parser (ref:parsenet.py:140-193;
    released config in_size=out_size=512, min_feat 32, base 64,
    res_depth 10, ch_range [32, 256]): (B, 512, 512, 3) normalized input
    -> (seg_logits (B, 512, 512, 19), recovered image). Global residual
    around the body stack, no U-Net skips."""

    in_size: int = 512
    out_size: int = 512
    min_feat_size: int = 32
    base_ch: int = 64
    num_classes: int = 19
    res_depth: int = 10
    ch_range: Tuple[int, int] = (32, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        lo, hi = self.ch_range
        clip = lambda c: max(lo, min(c, hi))
        min_feat = min(self.in_size, self.min_feat_size)
        down_steps = int(np.log2(self.in_size // min_feat))
        up_steps = int(np.log2(self.out_size // min_feat))

        h = PConvLayer(self.base_ch, dtype=self.dtype, name="encoder_0")(x)
        head = self.base_ch
        for i in range(down_steps):
            h = PResidualBlock(clip(head * 2), "down", self.dtype,
                               name=f"encoder_{i + 1}")(h)
            head *= 2
        feat = h
        for i in range(self.res_depth):
            h = PResidualBlock(clip(head), "none", self.dtype,
                               name=f"body_{i}")(h)
        h = feat + h  # global residual (ref:parsenet.py:189)
        for i in range(up_steps):
            h = PResidualBlock(clip(head // 2), "up", self.dtype,
                               name=f"decoder_{i}")(h)
            head //= 2
        img = PConvLayer(3, dtype=self.dtype, name="out_img_conv")(h)
        seg = PConvLayer(self.num_classes, dtype=self.dtype,
                         name="out_mask_conv")(h)
        return seg, img


def convert_parsenet(sd):
    """parsing_parsenet.pth -> ParseNet params (torch naming:
    encoder.N / body.N / decoder.N with conv1/conv2/shortcut_func
    ConvLayers whose BN sits at <layer>.norm.norm)."""
    params = {}
    stats = {}

    def put(tree, path, name, w):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[name] = w

    for key, w in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] in ("encoder", "body", "decoder"):
            mod = f"{parts[0]}_{parts[1]}"
            rest = parts[2:-1]
        else:  # out_img_conv / out_mask_conv (plain ConvLayer)
            mod = parts[0]
            rest = parts[1:-1]
        if rest and rest[0] in ("conv1", "conv2", "shortcut_func"):
            sub, rest2 = rest[0], rest[1:]
        else:
            sub, rest2 = None, rest
        base = (mod,) + ((sub,) if sub else ())
        if rest2 and rest2[0] == "conv2d":
            if leaf == "weight":
                put(params, base + ("conv2d",), "kernel",
                    np.transpose(w, (2, 3, 1, 0)))
            else:
                put(params, base + ("conv2d",), "bias", w)
        elif rest2 and rest2[0] == "norm":
            if leaf == "weight":
                put(params, base + ("norm",), "scale", w)
            elif leaf == "bias":
                put(params, base + ("norm",), "bias", w)
            elif leaf == "running_mean":
                put(stats, base + ("norm",), "mean", w)
            elif leaf == "running_var":
                put(stats, base + ("norm",), "var", w)
    return {"params": params, "batch_stats": stats}


FACE_CLASS_IDS = tuple(range(1, 14))  # skin..lips classes form the face mask


class FaceParser:
    """Parsing-mask provider for FaceRestoreHelper.paste_faces.

    model_name selects the parser like ref:facelib/parsing/__init__.py:
    6-23 init_parsing_model: 'parsenet' (512², default for paste-back) or
    'bisenet' (the heavier 19-class parser)."""

    def __init__(self, params=None, dtype=jnp.float32, model_name: str = "parsenet"):
        if model_name == "bisenet":
            self.model = BiSeNet(dtype=dtype)
        elif model_name == "parsenet":
            self.model = ParseNet(dtype=dtype)
        else:
            raise NotImplementedError(f"{model_name} is not implemented.")
        if params is None:
            from ..utils.params import fast_init

            params = fast_init(
                lambda x: self.model.init(jax.random.PRNGKey(0), x),
                jnp.zeros((1, 512, 512, 3)),
            )
        self.params = params
        self._fn = jax.jit(lambda p, x: self.model.apply(p, x)[0])

    def __call__(self, face_crop_rgb: np.ndarray) -> np.ndarray:
        import cv2

        size = face_crop_rgb.shape[0]
        x = cv2.resize(face_crop_rgb, (512, 512)).astype(np.float32) / 127.5 - 1.0
        seg = np.asarray(self._fn(self.params, jnp.asarray(x[None]))[0])
        labels = seg.argmax(-1)
        mask = np.isin(labels, FACE_CLASS_IDS).astype(np.float32)
        return cv2.resize(mask, (size, size))


# ---------------------------------------------------------------------------
# BiSeNet (ref:facelib/parsing/bisenet.py + resnet.py): the face parser
# CodeFormer's FaceRestoreHelper uses for 512² paste-back masks when
# model_name == "bisenet" (ref:facelib/parsing/__init__.py:6-23)
# ---------------------------------------------------------------------------


def _resize_bilinear_align_corners(x, out_hw):
    """torch F.interpolate(..., mode="bilinear", align_corners=True) on
    NHWC: sample positions linspace(0, in-1, out) — jax.image.resize uses
    half-pixel centers, so the corners-aligned grid is built explicitly."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - fx) + x[:, y0][:, :, x1] * fx
    bot = x[:, y1][:, :, x0] * (1 - fx) + x[:, y1][:, :, x1] * fx
    return top * (1 - fy) + bot * fy


class ConvBNReLU(nn.Module):
    out_ch: int
    ks: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (self.ks, self.ks),
                    strides=(self.stride, self.stride), padding=self.ks // 2,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x).astype(self.dtype)


class BasicBlock18(nn.Module):
    """(ref:facelib/parsing/resnet.py:10-38) — note the unusual ordering:
    bn2 output is NOT relu'd before the residual add."""

    out_ch: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = nn.Conv(self.out_ch, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        r = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn1")(r)
        r = nn.relu(r).astype(self.dtype)
        r = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(r)
        r = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn2")(r)
        sc = x
        if x.shape[-1] != self.out_ch or self.stride != 1:
            sc = nn.Conv(self.out_ch, (1, 1), strides=(self.stride, self.stride),
                         use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            sc = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                              name="ds_bn")(sc)
        return nn.relu(sc + r).astype(self.dtype)


class ResNet18Trunk(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x).astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for i in range(2):
            x = BasicBlock18(64, dtype=self.dtype, name=f"layer1_{i}")(x)
        x = BasicBlock18(128, 2, dtype=self.dtype, name="layer2_0")(x)
        feat8 = BasicBlock18(128, dtype=self.dtype, name="layer2_1")(x)
        x = BasicBlock18(256, 2, dtype=self.dtype, name="layer3_0")(feat8)
        feat16 = BasicBlock18(256, dtype=self.dtype, name="layer3_1")(x)
        x = BasicBlock18(512, 2, dtype=self.dtype, name="layer4_0")(feat16)
        feat32 = BasicBlock18(512, dtype=self.dtype, name="layer4_1")(x)
        return feat8, feat16, feat32


class AttentionRefinement(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.out_ch, dtype=self.dtype, name="conv")(x)
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_atten")(atten)
        atten = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                             name="bn_atten")(atten)
        return feat * jax.nn.sigmoid(atten).astype(self.dtype)


class FeatureFusion(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fsp, fcp):
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = ConvBNReLU(self.out_ch, ks=1, dtype=self.dtype, name="convblk")(fcat)
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_ch // 4, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv1")(atten)
        atten = nn.relu(atten)
        atten = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv2")(atten)
        atten = jax.nn.sigmoid(atten).astype(self.dtype)
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    mid_ch: int
    num_class: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.mid_ch, dtype=self.dtype, name="conv")(x)
        out = nn.Conv(self.num_class, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv_out")(feat)
        return out, feat


class BiSeNet(nn.Module):
    """(B, H, W, 3) normalized face → 3 seg-logit maps at full resolution
    (main, aux16, aux32), matching ref:facelib/parsing/bisenet.py:111-140."""

    num_class: int = 19
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        x = x.astype(self.dtype)
        feat8, feat16, feat32 = ResNet18Trunk(dtype=self.dtype, name="cp_resnet")(x)

        avg = feat32.mean(axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, ks=1, dtype=self.dtype, name="cp_conv_avg")(avg)
        avg_up = jnp.broadcast_to(
            avg, (avg.shape[0],) + feat32.shape[1:3] + (avg.shape[-1],)
        )
        f32 = AttentionRefinement(128, dtype=self.dtype, name="cp_arm32")(feat32)
        f32 = f32 + avg_up
        f32_up = jax.image.resize(
            f32, (f32.shape[0],) + feat16.shape[1:3] + (128,), "nearest"
        )
        f32_up = ConvBNReLU(128, dtype=self.dtype, name="cp_conv_head32")(f32_up)

        f16 = AttentionRefinement(128, dtype=self.dtype, name="cp_arm16")(feat16)
        f16 = f16 + f32_up
        f16_up = jax.image.resize(
            f16, (f16.shape[0],) + feat8.shape[1:3] + (128,), "nearest"
        )
        f16_up = ConvBNReLU(128, dtype=self.dtype, name="cp_conv_head16")(f16_up)

        fuse = FeatureFusion(256, dtype=self.dtype, name="ffm")(feat8, f16_up)
        out, _ = BiSeNetOutput(256, self.num_class, dtype=self.dtype,
                               name="conv_out")(fuse)
        out16, _ = BiSeNetOutput(64, self.num_class, dtype=self.dtype,
                                 name="conv_out16")(f16_up)
        out32, _ = BiSeNetOutput(64, self.num_class, dtype=self.dtype,
                                 name="conv_out32")(f32_up)
        out = _resize_bilinear_align_corners(out.astype(jnp.float32), (h, w))
        out16 = _resize_bilinear_align_corners(out16.astype(jnp.float32), (h, w))
        out32 = _resize_bilinear_align_corners(out32.astype(jnp.float32), (h, w))
        return out, out16, out32
