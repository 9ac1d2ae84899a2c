"""RRDBNet (RealESRGAN backbone) + ArcFace identity net.

- RRDBNet (ref:basicsr/archs/rrdbnet_arch.py): residual-in-residual dense
  blocks; the background/face upsampler used by the CodeFormer CLI
  (ref:inference_codeformer.py set_realesrgan :19).
- ArcFace ResNet (ref:basicsr/archs/arcface_arch.py): identity embedding
  network used by identity-preserving losses.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResidualDenseBlock(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(4):
            h = nn.Conv(self.num_grow_ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{i + 1}")(jnp.concatenate(feats, axis=-1))
            h = jax.nn.leaky_relu(h, 0.2)
            feats.append(h)
        out = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                      name="conv5")(jnp.concatenate(feats, axis=-1))
        return out * 0.2 + x


class RRDB(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype, name="rdb1")(x)
        h = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype, name="rdb2")(h)
        h = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype, name="rdb3")(h)
        return h * 0.2 + x


class RRDBNet(nn.Module):
    """x2/x4 super-resolution net. Input (B, H, W, 3) in [0, 1]."""

    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    scale: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_first")(x.astype(self.dtype))
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, self.dtype,
                        name=f"body_{i}")(body)
        body = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_body")(body)
        feat = feat + body
        ups = 1
        while ups < self.scale:
            b, h, w, c = feat.shape
            feat = jax.image.resize(feat, (b, h * 2, w * 2, c), "nearest")
            feat = jax.nn.leaky_relu(
                nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv_up{ups}")(feat), 0.2)
            ups *= 2
        feat = jax.nn.leaky_relu(
            nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_hr")(feat), 0.2)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="conv_last")(feat)


class ArcFaceBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn0")(x)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn1")(h)
        h = nn.PReLU(name="prelu")(h)
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            identity = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                                    name="ds_bn")(identity)
        return h + identity


class ArcFaceResNet18(nn.Module):
    """Identity embedding net (ref:basicsr/archs/arcface_arch.py)."""

    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x.astype(self.dtype))
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn1")(h)
        h = nn.PReLU(name="prelu1")(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        for i, (planes, blocks, stride) in enumerate(
            [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)]
        ):
            for b in range(blocks):
                h = ArcFaceBlock(planes, stride if b == 0 else 1, self.dtype,
                                 name=f"layer{i + 1}_{b}")(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn2")(h)
        h = h.reshape(h.shape[0], -1)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc")(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                         use_bias=False, use_scale=False, name="features")(h)
        return h
