"""SyncNet models: StableSyncNet (trainable supervisor) and the
Wav2Lip-style ablation variant.

Re-derivation of ref:latentsync/models/stable_syncnet.py: twin
DownEncoder2D towers reduce (a) the Wav2Lip mel window (1×80×52) and
(b) 16 stacked lower-half face frames (48×128×256) to unit embeddings
whose cosine similarity supervises lip sync. Architecture is fully
config-driven (blocks/downsample factors/attention placement,
ref:configs/syncnet/*.yaml).

TPU notes: channels-last; the asymmetric stride-2 padding of the
reference (F.pad (0,1,0,1) then VALID conv, ref:stable_syncnet.py:
128-131) is reproduced exactly so converted weights match; attention
blocks run on flattened (H·W) tokens with the shared fused attention op.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import math

from ..config import SyncNetConfig, SyncNetEncoderConfig
from ..ops.attention import dot_product_attention
from .unet3d import GEGLUFeedForward


def _factor2d(f) -> Tuple[int, int]:
    if isinstance(f, (tuple, list)):
        return (int(f[0]), int(f[1]))
    return (int(f), int(f))


class SyncResnetBlock2D(nn.Module):
    """(ref:stable_syncnet.py:65-133)."""

    out_channels: int
    downsample_factor: Union[int, Tuple[int, int]] = 2
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        g1 = math.gcd(self.groups, in_ch)
        g2 = math.gcd(self.groups, self.out_channels)
        h = nn.GroupNorm(g1, epsilon=self.eps, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(g2, epsilon=self.eps, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        h = h + x

        fy, fx = _factor2d(self.downsample_factor)
        if (fy, fx) != (1, 1):
            # asymmetric pad mirrors torch F.pad (left,right,top,bottom)
            # rules at ref:stable_syncnet.py:104-109
            if fy == 1:
                pad = ((1, 1), (0, 1))
            elif fx == 1:
                pad = ((0, 1), (1, 1))
            else:
                pad = ((0, 1), (0, 1))
            h = jnp.pad(h, ((0, 0), pad[0], pad[1], (0, 0)))
            h = nn.Conv(
                self.out_channels, (3, 3), strides=(fy, fx), padding="VALID",
                dtype=self.dtype, name="downsample_conv",
            )(h)
        return h


class SyncAttentionBlock2D(nn.Module):
    """(ref:stable_syncnet.py:136-169): GN → 1×1 conv in → biased MHA +
    GEGLU FF on (H·W) tokens → 1×1 conv out, residual."""

    query_dim: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        residual = x
        h = nn.GroupNorm(math.gcd(self.groups, c), epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_in")(h.astype(self.dtype))
        h = h.reshape(b, hh * ww, c)

        hn = nn.LayerNorm(dtype=jnp.float32, name="norm2")(h).astype(self.dtype)
        heads, dim_head = 8, c // 8
        q = nn.Dense(c, use_bias=True, dtype=self.dtype, name="attn_to_q")(hn)
        k = nn.Dense(c, use_bias=True, dtype=self.dtype, name="attn_to_k")(hn)
        v = nn.Dense(c, use_bias=True, dtype=self.dtype, name="attn_to_v")(hn)
        q = q.reshape(b, hh * ww, heads, dim_head)
        k = k.reshape(b, hh * ww, heads, dim_head)
        v = v.reshape(b, hh * ww, heads, dim_head)
        o = dot_product_attention(q, k, v).reshape(b, hh * ww, c)
        o = nn.Dense(c, dtype=self.dtype, name="attn_to_out")(o)
        h = h + o

        hn = nn.LayerNorm(dtype=jnp.float32, name="norm3")(h).astype(self.dtype)
        h = h + GEGLUFeedForward(c, dtype=self.dtype, name="ff")(hn)

        h = h.reshape(b, hh, ww, c)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv_out")(h)
        return h + residual


class DownEncoder2D(nn.Module):
    """(ref:stable_syncnet.py:172-233)."""

    config: SyncNetEncoderConfig
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in"
        )(x.astype(self.dtype))
        idx = 0
        for i, ch in enumerate(cfg.block_out_channels):
            h = SyncResnetBlock2D(
                ch, cfg.downsample_factors[i], self.groups,
                dtype=self.dtype, name=f"down_blocks_{idx}",
            )(h)
            idx += 1
            if cfg.attn_blocks[i] == 1:
                h = SyncAttentionBlock2D(
                    ch, self.groups, dtype=self.dtype, name=f"down_blocks_{idx}"
                )(h)
                idx += 1
        h = nn.GroupNorm(math.gcd(self.groups, h.shape[-1]), epsilon=1e-6,
                         dtype=jnp.float32, name="norm_out")(h)
        return nn.relu(h).astype(self.dtype)


class StableSyncNet(nn.Module):
    """Twin towers → L2-normalized embeddings (ref:stable_syncnet.py:28-62).

    image_sequences: (B, H, W, F·3) stacked frames channels-last;
    audio_sequences: (B, 80, 52, 1) mel. Returns (vision, audio) unit
    embeddings (B, D)."""

    config: SyncNetConfig = SyncNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_sequences, audio_sequences):
        v = DownEncoder2D(self.config.visual_encoder, dtype=self.dtype,
                          name="visual_encoder")(image_sequences)
        a = DownEncoder2D(self.config.audio_encoder, dtype=self.dtype,
                          name="audio_encoder")(audio_sequences)
        v = v.reshape(v.shape[0], -1).astype(jnp.float32)
        a = a.reshape(a.shape[0], -1).astype(jnp.float32)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
        return v, a


class Wav2LipSyncNet(nn.Module):
    """Wav2Lip-style SyncNet ablation model (ref:latentsync/models/
    wav2lip_syncnet.py:8-90): exact conv/BN tower stacks — 21 visual +
    16 audio Conv2d blocks with in-place residuals added BEFORE the
    activation. Visual input (B, 128, 256, 15) stacked half-frames,
    audio (B, 80, 16, 1) mel; both towers reduce to 1×1×1024 and
    L2-normalize. Default act_fn matches the reference's LeakyReLU(0.2)
    (ref:latentsync/models/wav2lip_syncnet.py:9)."""

    act_fn: str = "leaky"
    dtype: jnp.dtype = jnp.float32

    # (cout, kernel, stride, padding, residual, act_override)
    VISUAL = (
        (32, 7, 1, 3, False, None), (64, 5, (1, 2), 1, False, None),
        (64, 3, 1, 1, True, None), (64, 3, 1, 1, True, None),
        (128, 3, 2, 1, False, None),
        (128, 3, 1, 1, True, None), (128, 3, 1, 1, True, None),
        (128, 3, 1, 1, True, None),
        (256, 3, 3, 1, False, None),
        (256, 3, 1, 1, True, None), (256, 3, 1, 1, True, None),
        (512, 3, 2, 1, False, None),
        (512, 3, 1, 1, True, None), (512, 3, 1, 1, True, None),
        (1024, 3, 2, 1, False, None),
        (1024, 3, 1, 1, True, None), (1024, 3, 1, 1, True, None),
        (1024, 3, 2, 1, False, "relu"),
        (1024, 3, 1, 0, False, "relu"),
        (1024, 1, 1, 0, False, "relu"),
    )
    AUDIO = (
        (32, 3, 1, 1, False, None),
        (32, 3, 1, 1, True, None), (32, 3, 1, 1, True, None),
        (64, 3, (3, 1), 1, False, None),
        (64, 3, 1, 1, True, None), (64, 3, 1, 1, True, None),
        (128, 3, 3, 1, False, None),
        (128, 3, 1, 1, True, None), (128, 3, 1, 1, True, None),
        (256, 3, (3, 2), 1, False, None),
        (256, 3, 1, 1, True, None), (256, 3, 1, 1, True, None),
        (512, 3, 1, 1, False, None),
        (512, 3, 1, 1, True, None), (512, 3, 1, 1, True, None),
        (1024, 3, 1, 0, False, "relu"),
        (1024, 1, 1, 0, False, "relu"),
    )

    def _act(self, x, act):
        act = act or self.act_fn
        if act == "relu":
            return nn.relu(x)
        if act == "leaky":
            return jax.nn.leaky_relu(x, 0.2)
        if act == "silu":
            return nn.silu(x)
        if act == "tanh":
            return jnp.tanh(x)
        raise ValueError(act)

    def _tower(self, x, specs, prefix):
        for i, (ch, k, s, p, res, act) in enumerate(specs):
            ks = (k, k)
            st = s if isinstance(s, tuple) else (s, s)
            h = nn.Conv(ch, ks, strides=st, padding=p, dtype=self.dtype,
                        name=f"{prefix}_{i}_conv")(x)
            h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                             name=f"{prefix}_{i}_bn")(h)
            if res:
                h = h + x
            x = self._act(h, act).astype(self.dtype)
        return x

    @nn.compact
    def __call__(self, faces, audio):
        v = self._tower(faces.astype(self.dtype), self.VISUAL, "visual_encoder")
        a = self._tower(audio.astype(self.dtype), self.AUDIO, "audio_encoder")
        v = v.reshape(v.shape[0], -1).astype(jnp.float32)
        a = a.reshape(a.shape[0], -1).astype(jnp.float32)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
        return v, a


def convert_wav2lip_syncnet(sd):
    """wav2lip SyncNet state dict → Wav2LipSyncNet params (torch naming:
    {visual,audio}_encoder.N.conv_block.0 conv / .1 BatchNorm)."""
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
        tower, i, _, j = parts[0], parts[1], parts[2], parts[3]
        if j == "0":  # conv
            if leaf == "weight":
                put(params, (f"{tower}_{i}_conv",), "kernel",
                    np.transpose(w, (2, 3, 1, 0)))
            else:
                put(params, (f"{tower}_{i}_conv",), "bias", w)
        else:  # bn
            base = (f"{tower}_{i}_bn",)
            if leaf == "weight":
                put(params, base, "scale", w)
            elif leaf == "bias":
                put(params, base, "bias", w)
            elif leaf == "running_mean":
                put(stats, base, "mean", w)
            elif leaf == "running_var":
                put(stats, base, "var", w)
    return {"params": params, "batch_stats": stats}
