"""Whisper audio encoder in JAX (flax.linen), with all-layer embeddings.

Re-derivation of the vendored Whisper encoder the reference uses
(ref:latentsync/whisper/whisper/model.py:131-171): two GELU conv1d stems
(the second stride-2), sinusoidal positions, pre-LN transformer blocks.
The lip-sync path never runs the text decoder — `transcribe()` upstream is
rewritten to only collect per-layer encoder embeddings over 30 s windows
(ref:latentsync/whisper/whisper/transcribe.py:104-126) — so only the
encoder exists here, and `include_embeddings` behavior (stack of the
block *inputs+outputs*, NOT ln_post'd) is reproduced exactly.

TPU notes: layout is (B, T, C) channels-last; all segments of one clip are
batched into a single encoder call rather than looped; LayerNorm/softmax
accumulate in f32 while matmuls run in bf16 on the MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..ops.attention import dot_product_attention


def sinusoid_positions(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Concatenated [sin | cos] positional table (whisper layout,
    ref:whisper/model.py:48-54)."""
    assert channels % 2 == 0
    log_inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


class MHA(nn.Module):
    """Whisper multi-head attention: q/v/out biased, k unbiased."""

    n_state: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.n_state // self.n_head
        q = nn.Dense(self.n_state, dtype=self.dtype, name="query")(x)
        k = nn.Dense(self.n_state, use_bias=False, dtype=self.dtype, name="key")(x)
        v = nn.Dense(self.n_state, dtype=self.dtype, name="value")(x)
        b, t, _ = x.shape
        q = q.reshape(b, t, self.n_head, d)
        k = k.reshape(b, t, self.n_head, d)
        v = v.reshape(b, t, self.n_head, d)
        o = dot_product_attention(q, k, v)  # f32 softmax inside
        o = o.reshape(b, t, self.n_state)
        return nn.Dense(self.n_state, dtype=self.dtype, name="out")(o)


class ResidualBlock(nn.Module):
    n_state: int
    n_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=jnp.float32, name="attn_ln")(x)
        x = x + MHA(self.n_state, self.n_head, dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="mlp_ln")(x)
        h = nn.Dense(self.n_state * 4, dtype=self.dtype, name="mlp_0")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.n_state, dtype=self.dtype, name="mlp_2")(h)
        return x + h


class WhisperEncoder(nn.Module):
    """Audio encoder. Input mel: (B, n_mels, T) torch layout or (B, T,
    n_mels) channels-last; returns the (n_layer+1)-deep embedding stack.
    """

    config: WhisperConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, include_embeddings: bool = True):
        cfg = self.config
        if mel.shape[-1] == cfg.n_mels:
            x = mel  # already (B, T, n_mels)
        else:
            x = jnp.swapaxes(mel, -1, -2)
        x = x.astype(self.dtype)
        x = nn.Conv(cfg.n_audio_state, (3,), padding=((1, 1),), dtype=self.dtype, name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            cfg.n_audio_state, (3,), strides=(2,), padding=((1, 1),),
            dtype=self.dtype, name="conv2",
        )(x)
        x = nn.gelu(x, approximate=False)

        pos = sinusoid_positions(cfg.n_audio_ctx, cfg.n_audio_state)
        assert x.shape[1] == cfg.n_audio_ctx, (
            f"incorrect audio shape {x.shape}, expected ctx {cfg.n_audio_ctx}"
        )
        x = (x + jnp.asarray(pos, dtype=x.dtype)).astype(x.dtype)

        embeddings = [x]
        for i in range(cfg.n_audio_layer):
            x = ResidualBlock(
                cfg.n_audio_state, cfg.n_audio_head, dtype=self.dtype, name=f"blocks_{i}"
            )(x)
            embeddings.append(x)

        x = nn.LayerNorm(dtype=jnp.float32, name="ln_post")(x).astype(self.dtype)

        if include_embeddings:
            # (B, n_layer+1, T', n_state) — stack of block inputs/outputs,
            # before ln_post (ref:whisper/model.py:157-169)
            return x, jnp.stack(embeddings, axis=1)
        return x


def init_whisper_params(config: WhisperConfig, rng: jax.Array, dtype=jnp.float32):
    model = WhisperEncoder(config, dtype=dtype)
    mel = jnp.zeros((1, config.n_mels, config.n_audio_ctx * 2), dtype)
    return model, model.init(rng, mel)
