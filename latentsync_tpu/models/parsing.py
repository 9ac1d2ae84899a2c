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
    """Parsing-mask provider for FaceRestoreHelper.paste_faces."""

    def __init__(self, params=None, dtype=jnp.float32):
        self.model = ParseNet(dtype=dtype)
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
