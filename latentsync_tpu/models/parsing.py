"""Face parsing: ParseNet (ref:facelib/parsing/parsenet.py) used by the
restore helper for seamless paste-back masks
(ref:facelib/utils/face_restoration_helper.py:372-520)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ParseBlock(nn.Module):
    out_ch: int
    mode: str = "none"  # none | down | up
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        stride = 2 if self.mode == "down" else 1
        if self.mode == "up":
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        sc = nn.Conv(self.out_ch, (3, 3), strides=(stride, stride), padding=1,
                     dtype=self.dtype, name="shortcut")(x)
        h1 = nn.Conv(self.out_ch, (3, 3), strides=(stride, stride), padding=1,
                     dtype=self.dtype, name="conv1")(x)
        h1 = jax.nn.leaky_relu(h1, 0.2)
        h1 = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h1)
        return jax.nn.leaky_relu(h1 + sc, 0.2)


class ParseNet(nn.Module):
    """Encoder-decoder face parser: (B, 512, 512, 3) in [-1,1] →
    (seg_logits (B, 512, 512, 19), recovered image)."""

    min_feat: int = 32
    max_feat: int = 512
    num_classes: int = 19
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        chans = [64, 128, 256, 512, 512]
        h = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        skips = []
        for i, ch in enumerate(chans):
            h = ParseBlock(ch, "down", self.dtype, name=f"enc_{i}")(h)
            skips.append(h)
        h = ParseBlock(chans[-1], "none", self.dtype, name="body_0")(h)
        h = ParseBlock(chans[-1], "none", self.dtype, name="body_1")(h)
        for i, ch in enumerate(reversed(chans)):
            h = ParseBlock(ch, "up", self.dtype, name=f"dec_{i}")(h)
            skip = skips[len(chans) - 1 - i]
            if skip.shape == h.shape:
                h = h + skip
        seg = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                      name="out_mask")(h)
        img = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="out_img")(h)
        return seg, img


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
