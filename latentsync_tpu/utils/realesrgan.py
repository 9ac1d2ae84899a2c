"""Tiled RealESRGAN-style upsampler (ref:basicsr/utils/realesrgan_utils.py):
runs RRDBNet over overlapping tiles so arbitrary-size frames fit memory;
used as the background/face upsampler in the CodeFormer CLI
(ref:inference_codeformer.py:19-53)."""

from __future__ import annotations

from typing import Optional

import numpy as np


class RealESRGANUpsampler:
    def __init__(self, params=None, scale: int = 2, tile: int = 256,
                 tile_pad: int = 16, dtype=None):
        import jax
        import jax.numpy as jnp

        from ..models.rrdbnet import RRDBNet
        from ..utils.params import fast_init

        dtype = dtype or jnp.bfloat16
        self.scale = scale
        self.tile = tile
        self.tile_pad = tile_pad
        self.model = RRDBNet(scale=scale, dtype=dtype)
        if params is None:
            params = fast_init(
                lambda x: self.model.init(jax.random.PRNGKey(0), x),
                jnp.zeros((1, tile, tile, 3)),
            )
        self.params = params
        self._fn = jax.jit(lambda p, x: self.model.apply(p, x))

    def enhance(self, img_rgb: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        h, w = img_rgb.shape[:2]
        s, t, pad = self.scale, self.tile, self.tile_pad
        out = np.zeros((h * s, w * s, 3), np.float32)
        x = img_rgb.astype(np.float32) / 255.0
        for y0 in range(0, h, t):
            for x0 in range(0, w, t):
                ya, yb = max(y0 - pad, 0), min(y0 + t + pad, h)
                xa, xb = max(x0 - pad, 0), min(x0 + t + pad, w)
                tile_in = x[ya:yb, xa:xb]
                th, tw = tile_in.shape[:2]
                # pad to the fixed tile shape to bound compile variants
                canvas = np.zeros((t + 2 * pad, t + 2 * pad, 3), np.float32)
                canvas[:th, :tw] = tile_in
                tile_out = np.asarray(
                    self._fn(self.params, jnp.asarray(canvas[None]))[0],
                    np.float32,
                )[: th * s, : tw * s]
                oy, ox = (y0 - ya) * s, (x0 - xa) * s
                core = tile_out[oy : oy + min(t, h - y0) * s,
                                ox : ox + min(t, w - x0) * s]
                out[y0 * s : y0 * s + core.shape[0],
                    x0 * s : x0 * s + core.shape[1]] = core
        return np.clip(out * 255, 0, 255).astype(np.uint8)
