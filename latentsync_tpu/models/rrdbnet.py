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


def pixel_unshuffle(x, r: int):
    """Channels-last pixel unshuffle with torch's [c][i][j] channel
    ordering (ref:basicsr/archs/arch_util.py pixel_unshuffle) so
    converted conv_first kernels line up."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


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
        # the reference ALWAYS upsamples 4× (conv_up1 AND conv_up2); for
        # net scales 2/1 it pixel-unshuffles the input first
        # (ref:rrdbnet_arch.py:105-112) — required for the released
        # RealESRGAN_x2plus checkpoint whose conv_first has 12 in-channels
        if self.scale == 2:
            x = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            x = pixel_unshuffle(x, 4)
        feat = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_first")(x.astype(self.dtype))
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, self.dtype,
                        name=f"body_{i}")(body)
        body = nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_body")(body)
        feat = feat + body
        for name in ("conv_up1", "conv_up2"):
            b, h, w, c = feat.shape
            feat = jax.image.resize(feat, (b, h * 2, w * 2, c), "nearest")
            feat = jax.nn.leaky_relu(
                nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                        name=name)(feat), 0.2)
        feat = jax.nn.leaky_relu(
            nn.Conv(self.num_feat, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_hr")(feat), 0.2)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="conv_last")(feat)


def _prelu(x, alpha):
    """torch nn.PReLU() with a single shared slope parameter."""
    a = alpha.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return jnp.where(xf >= 0, xf, a * xf).astype(x.dtype)


class SEBlock(nn.Module):
    """Squeeze-excite (ref:arcface_arch.py:149-168): global pool →
    fc (PReLU) → fc (sigmoid) channel gates."""

    channel: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        y = nn.Dense(self.channel // self.reduction, dtype=self.dtype,
                     name="fc_0")(y.astype(self.dtype))
        y = _prelu(y, self.param("fc_1_alpha", nn.initializers.constant(0.25), (1,)))
        y = nn.Dense(self.channel, dtype=self.dtype, name="fc_2")(y)
        y = jax.nn.sigmoid(y.astype(jnp.float32)).astype(x.dtype)
        return x * y[:, None, None, :]


class IRBlock(nn.Module):
    """(ref:arcface_arch.py:56-101): bn0 → conv1(keep channels) → bn1 →
    prelu → conv2(stride) → bn2 → [SE] → +downsample(x) → prelu."""

    planes: int
    stride: int = 1
    use_se: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        identity = x
        # ONE shared slope for both activations — the torch block reuses
        # self.prelu (ref:arcface_arch.py:73,87,98)
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,))
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn0")(x)
        h = nn.Conv(inplanes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(h.astype(self.dtype))
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn1")(h)
        h = _prelu(h, alpha)
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn2")(h)
        if self.use_se:
            h = SEBlock(self.planes, dtype=self.dtype, name="se")(h)
        if self.stride != 1 or inplanes != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                                    name="downsample_bn")(identity)
        return _prelu(h + identity, alpha)


class ArcFaceResNet18(nn.Module):
    """ResNetArcFace identity net (ref:basicsr/archs/arcface_arch.py:170-244,
    CodeFormer's network_identity: IRBlock ×(2,2,2,2), use_se False).
    Input (B, 128, 128, 1) GRAYSCALE; returns (B, 512) embedding."""

    layers: Tuple[int, ...] = (2, 2, 2, 2)
    use_se: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x.astype(self.dtype))
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn1")(h)
        h = _prelu(h, self.param("prelu_alpha", nn.initializers.constant(0.25), (1,)))
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        for i, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if i == 0 else 2
            for b in range(self.layers[i]):
                h = IRBlock(planes, stride if b == 0 else 1, self.use_se,
                            self.dtype, name=f"layer{i + 1}_{b}")(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn4")(h)
        # torch flattens (B, C, H, W) channel-major; transpose to match
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
        h = nn.Dense(512, dtype=self.dtype, name="fc5")(h.astype(self.dtype))
        return nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                            name="bn5")(h)


def convert_rrdbnet(sd):
    """RealESRGAN_x{2,4}plus.pth ({'params_ema'} or flat) → RRDBNet
    params (ref:basicsr/archs/rrdbnet_arch.py naming: conv_first,
    body.N.rdbM.convK, conv_body, conv_up1/2, conv_hr, conv_last)."""
    import numpy as np

    sd = sd.get("params_ema", sd.get("params", sd))
    params = {}
    unmapped = []

    def put(path, leaf, w):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        if leaf == "weight":
            node.setdefault(path[-1], {})["kernel"] = np.transpose(w, (2, 3, 1, 0))
        else:
            node.setdefault(path[-1], {})["bias"] = w

    for key, w in sd.items():
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "body":
            put((f"body_{parts[1]}", parts[2], parts[3]), leaf, w)
        elif parts[0] in ("conv_first", "conv_body", "conv_up1", "conv_up2",
                          "conv_hr", "conv_last"):
            put((parts[0],), leaf, w)
        else:
            unmapped.append(key)
    if unmapped:
        raise ValueError(f"unmapped RRDBNet keys: {unmapped[:10]}")
    return {"params": params}


def convert_arcface(sd):
    """arcface_resnet18.pth → ArcFaceResNet18 params
    (ref:basicsr/archs/arcface_arch.py naming: conv1/bn1/prelu,
    layerN.B.{bn0,conv1,bn1,prelu,conv2,bn2,downsample.0/.1,se.fc.0/.2},
    bn4, fc5, bn5)."""
    import numpy as np

    params = {}
    stats = {}

    def put(tree, path, name, w):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[name] = w

    def put_bn(base, leaf, w):
        if leaf == "weight":
            put(params, base, "scale", w)
        elif leaf == "bias":
            put(params, base, "bias", w)
        elif leaf == "running_mean":
            put(stats, base, "mean", w)
        elif leaf == "running_var":
            put(stats, base, "var", w)

    for key, w in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0].startswith("layer"):
            base = (f"{parts[0]}_{parts[1]}",)
            sub = parts[2]
            if sub in ("bn0", "bn1", "bn2"):
                put_bn(base + (sub,), leaf, w)
            elif sub in ("conv1", "conv2"):
                put(params, base + (sub,), "kernel", np.transpose(w, (2, 3, 1, 0)))
            elif sub == "prelu":
                put(params, base, "prelu_alpha", w)
            elif sub == "downsample":
                if parts[3] == "0":
                    put(params, base + ("downsample_conv",), "kernel",
                        np.transpose(w, (2, 3, 1, 0)))
                else:
                    put_bn(base + ("downsample_bn",), leaf, w)
            elif sub == "se":
                if parts[4] == "0":
                    tgt = "fc_0"
                elif parts[4] == "1":
                    put(params, base + ("se",), "fc_1_alpha", w)
                    continue
                else:
                    tgt = "fc_2"
                if leaf == "weight":
                    put(params, base + ("se", tgt), "kernel", w.T)
                else:
                    put(params, base + ("se", tgt), "bias", w)
        elif parts[0] == "conv1":
            put(params, ("conv1",), "kernel", np.transpose(w, (2, 3, 1, 0)))
        elif parts[0] in ("bn1", "bn4", "bn5"):
            put_bn((parts[0],), leaf, w)
        elif parts[0] == "prelu":
            put(params, (), "prelu_alpha", w)
        elif parts[0] == "fc5":
            if leaf == "weight":
                put(params, ("fc5",), "kernel", w.T)
            else:
                put(params, ("fc5",), "bias", w)
    return {"params": params, "batch_stats": stats}
