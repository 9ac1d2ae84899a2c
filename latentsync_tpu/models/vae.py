"""Stable Diffusion VAE (AutoencoderKL) in flax.linen, channels-last.

Re-derivation of the `stabilityai/sd-vae-ft-mse` architecture the
pipeline loads (ref:scripts/inference.py:53-58: scaling 0.18215,
shift 0; consumed at ref:latentsync/pipelines/lipsync_pipeline.py:
145-149 decode, :284-320 encode). Standard SD-KL shape: 4 encoder
stages (128,256,512,512)×2 resnets + mid attention, 4 decoder stages
×3 resnets, GroupNorm(32, eps 1e-6) + SiLU throughout, 4 latent
channels with quant/post-quant 1×1 convs.

TPU notes: NHWC layout end-to-end (convs hit the MXU without layout
transposes); frames fold into the batch axis so a whole 16-frame
window encodes/decodes in one call; the mid-block single-head
attention uses the shared fused attention op.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VAEConfig
from ..ops.attention import dot_product_attention
from ..ops.qconv import QConv


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions (SD VAE mid)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        y = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="group_norm")(x)
        y = y.reshape(b, h * w, c).astype(self.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        o = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return res + o.reshape(b, h, w, c)


class Downsample(nn.Module):
    """Stride-2 conv with SD's asymmetric (0,1) padding."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return QConv(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return QConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = QConv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                name=f"down_{i}_block_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32, name="conv_norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        h = QConv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return h


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        rev = tuple(reversed(cfg.block_out_channels))
        h = QConv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(rev[0], cfg.norm_num_groups, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(cfg.norm_num_groups, dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(rev[0], cfg.norm_num_groups, dtype=self.dtype, name="mid_block_2")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                name=f"up_{i}_block_{j}")(h)
            if i < len(rev) - 1:
                h = Upsample(ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32, name="conv_norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        return QConv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """KL autoencoder. Input/output (B, H, W, 3) in [-1, 1]."""

    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def moments(self, x):
        """Posterior (mean, logvar)."""
        h = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng: Optional[jax.Array] = None, sample: bool = True):
        """Encode to *unscaled* latents; sampling matches diffusers'
        DiagonalGaussianDistribution.sample()."""
        mean, logvar = self.moments(x)
        if sample and rng is not None:
            std = jnp.exp(0.5 * logvar)
            return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng: Optional[jax.Array] = None):
        z = self.encode(x, rng)
        return self.decode(z)


def scale_latents(z, cfg: VAEConfig):
    """(z - shift) * scale (ref:lipsync_pipeline.py:297,316)."""
    return (z - cfg.shift_factor) * cfg.scaling_factor


def unscale_latents(z, cfg: VAEConfig):
    """z / scale + shift (ref:lipsync_pipeline.py:146)."""
    return z / cfg.scaling_factor + cfg.shift_factor
