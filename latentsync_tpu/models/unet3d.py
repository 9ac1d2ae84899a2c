"""Audio-conditioned 3D UNet (AnimateDiff lineage) in flax.linen.

Re-derivation of UNet3DConditionModel (ref:latentsync/models/unet.py:39-471)
and its blocks (ref:latentsync/models/unet_blocks.py, attention.py,
resnet.py, motion_module.py) as a TPU-first design:

- canonical layout (B, F, H, W, C) channels-last; "inflated" 2D ops fold
  frames into batch with reshapes that XLA elides
- plain (non-inflated) GroupNorms in resnets normalize across frames
  jointly, exactly like torch GroupNorm on 5D input (the stage2 config
  leaves use_inflated_groupnorm=False), while transformer GroupNorms are
  per-frame (ref:attention.py:86-91)
- spatial self-attn + audio cross-attn run per-frame with (H·W)-token
  sequences; the temporal module attends across the 16-frame axis with an
  interleaved sin/cos positional table (ref:motion_module.py:221-234)
- zero-initialized conv_in / conv_out (ref:unet.py:92,241) and
  zero-initialized temporal proj_out (ref:motion_module.py:65-66)
- the whole model is one jittable pure function; 20-step CFG denoising
  wraps it in a lax.fori_loop (see pipelines/lipsync.py)

in_channels=13 = 4 noise + 1 mask + 4 masked-image + 4 reference latents
(ref:configs/unet/stage2.yaml:77).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import MotionModuleConfig, UNet3DConfig
from ..ops.attention import dot_product_attention

# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """diffusers get_timestep_embedding semantics (ref:unet.py:95 uses
    Timesteps(320, flip_sin_to_cos=True, freq_shift=0))."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class InflatedConv(nn.Module):
    """2D conv applied per-frame on (B, F, H, W, C)
    (ref:resnet.py:10-18). LATENTSYNC_INT8=1 routes through the int8
    dynamic-quantization path (ops/qconv.py QConv — measured 1.5-1.6×
    over bf16 at the UNet's 3×3 shapes on v5e); identical param tree
    either way."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    dtype: jnp.dtype = jnp.float32
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.qconv import QConv

        b, f = x.shape[:2]
        x2 = x.reshape((b * f,) + x.shape[2:])
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        y = QConv(
            self.features, self.kernel, self.strides, self.padding,
            dtype=self.dtype, kernel_init=init, name="conv",
        )(x2)
        return y.reshape((b, f) + y.shape[1:])


def group_norm_5d(x, groups, eps, name, dtype=jnp.float32):
    """torch GroupNorm on (B,C,F,H,W): stats over (C/G, F, H, W)."""
    return nn.GroupNorm(groups, epsilon=eps, dtype=dtype, name=name)(x)


class FusedGroupNorm(nn.Module):
    """GroupNorm (+ optionally fused SiLU) routed through the Pallas
    GN kernels on TPU (ops/groupnorm.py) — stats + normalize + act in
    one HBM round trip instead of XLA's f32-materializing chain.

    Param tree is identical to nn.GroupNorm ({scale, bias}) so weight
    converters and checkpoints are unaffected. `sample_axes` gives how
    many leading axes index independent statistics samples: 1 → torch 5D
    GroupNorm semantics (stats across F·H·W, ref:resnet.py:21-29), 2 →
    per-frame stats (transformer norms, ref:attention.py:86-91).

    This module is the Pallas path only; use the `gn_silu` helper at
    call sites — it defaults to plain flax nn.GroupNorm (+ silu), which
    XLA input-fuses into the consuming conv and is the fastest measured
    in context (bench r02, docs/perf_audit.md): the Pallas kernels are
    1.7-2.8× faster *standalone* but ~15 ms/fwd slower in-model because
    the opaque pallas_call boundary forces an extra HBM round trip, and
    a hand-rolled (..., g, c/g) jnp reduction is ~12% slower end-to-end
    (c/g = 10 lanes). LATENTSYNC_PALLAS_GN=1 opts the model into these
    kernels for re-measurement on future hardware/compilers."""

    groups: int = 32
    eps: float = 1e-5
    silu: bool = False
    sample_axes: int = 1

    @nn.compact
    def __call__(self, x):
        from ..ops.groupnorm import group_norm_silu_auto

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        rows = int(np.prod(x.shape[self.sample_axes:-1]))
        y = group_norm_silu_auto(
            x.reshape(-1, c), scale, bias, self.groups, rows,
            eps=self.eps, silu=self.silu,
        )
        return y.reshape(x.shape)


def gn_silu(x, groups, eps, name, silu=False):
    """GroupNorm (+ optional SiLU) with the measured-fastest lowering:
    flax nn.GroupNorm by default, FusedGroupNorm kernels under
    LATENTSYNC_PALLAS_GN=1 (same param tree either way — {name}/{scale,
    bias}). Statistics span all non-batch axes of `x`, so callers pick
    per-frame vs cross-frame semantics by the shape they pass (4D
    frame-folded vs 5D)."""
    import os

    if os.environ.get("LATENTSYNC_PALLAS_GN") == "1":
        return FusedGroupNorm(groups, eps, silu=silu, name=name)(x)
    y = nn.GroupNorm(groups, epsilon=eps, dtype=jnp.float32, name=name)(x)
    return nn.silu(y) if silu else y


class ResnetBlock3D(nn.Module):
    """(ref:resnet.py:104-223). Plain GroupNorm (cross-frame stats)."""

    out_channels: int
    temb_channels: int
    groups: int = 32
    eps: float = 1e-5
    time_embedding_norm: str = "default"
    output_scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        h = gn_silu(x, self.groups, self.eps, name="norm1", silu=True)
        h = h.astype(self.dtype)
        h = InflatedConv(self.out_channels, dtype=self.dtype, name="conv1")(h)

        if temb is not None:
            t = nn.silu(temb.astype(jnp.float32)).astype(self.dtype)
            out_mult = 2 if self.time_embedding_norm == "scale_shift" else 1
            t = nn.Dense(self.out_channels * out_mult, dtype=self.dtype,
                         name="time_emb_proj")(t)
            t = t[:, None, None, None, :]  # broadcast over F, H, W

        if temb is not None and self.time_embedding_norm == "default":
            h = h + t

        if self.time_embedding_norm == "scale_shift" and temb is not None:
            h = gn_silu(h, self.groups, self.eps, name="norm2", silu=False)
            scale, shift = jnp.split(t, 2, axis=-1)
            h = h * (1 + scale) + shift
            h = nn.silu(h.astype(jnp.float32)).astype(self.dtype)
        else:
            h = gn_silu(h, self.groups, self.eps, name="norm2", silu=True)
            h = h.astype(self.dtype)
        h = InflatedConv(self.out_channels, dtype=self.dtype, name="conv2")(h)

        if in_ch != self.out_channels:
            x = InflatedConv(
                self.out_channels, kernel=(1, 1), padding=0,
                dtype=self.dtype, name="conv_shortcut",
            )(x)
        return (x + h) / self.output_scale_factor


class CrossAttention(nn.Module):
    """diffusers-style attention (ref:attention.py:202-280): unbiased
    q/k/v projections, biased output projection, f32 softmax.

    `temporal=True` routes self-attention through the fused Pallas
    small-sequence kernel (ops/temporal_attention.py) — same math, one
    VMEM-resident program instead of transposes + HBM logits.

    q/k/v stay three separate matmuls: a fused (C, 3C) projection was
    measured SLOWER end-to-end (8.51 → 8.13 fps, bench r03) — at C=320
    the 960-lane output splits at non-128-aligned boundaries, forcing
    relayout copies that cost more than the saved input reads."""

    query_dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    temporal: bool = False
    spatial: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        from ..ops.qconv import QDense

        inner = self.heads * self.dim_head
        context = x if context is None else context
        q = QDense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = QDense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = QDense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, sq, _ = q.shape
        if self.temporal and context is x:
            from ..ops.temporal_attention import temporal_attention

            o = temporal_attention(q, k, v, self.heads)
        elif self.spatial and context is x:
            from ..ops.temporal_attention import spatial_attention

            o = spatial_attention(q, k, v, self.heads)
        else:
            sk = k.shape[1]
            q = q.reshape(b, sq, self.heads, self.dim_head)
            k = k.reshape(b, sk, self.heads, self.dim_head)
            v = v.reshape(b, sk, self.heads, self.dim_head)
            o = dot_product_attention(q, k, v).reshape(b, sq, inner)
        return QDense(self.query_dim, dtype=self.dtype, name="to_out_0")(o)


class GEGLUFeedForward(nn.Module):
    """diffusers FeedForward(activation_fn="geglu"), mult=4."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln=None):
        """ln=(scale, bias): fold the preceding LayerNorm INTO the fused
        kernel and return x + FF(LN(x)) — norm + FF + residual as one
        program (the pallas boundary otherwise forces the normalized
        activations and the residual add through HBM). Without ln, plain
        FF(x) for pre-normalized input."""
        from ..ops.ffn import fused_ffn_enabled, geglu_ffn
        from ..ops.qconv import DenseParams, dense_with_params, int8_dense_mode

        # the GEGLU pair carries 31% of forward FLOPs (docs/perf_audit.md).
        # Default path on TPU: ops/ffn.geglu_ffn — up-proj, erf-GELU gate
        # and down-proj in ONE Pallas kernel with the (M, 4C) hidden
        # resident in VMEM (measured r4: 2.61→2.04 ms at M=65536/C=320;
        # exact math, not a fidelity knob). Param tree unchanged
        # (net_0_proj/net_2 {kernel, bias}).
        inner = self.dim * 4
        k0, b0 = DenseParams(inner * 2, name="net_0_proj")(x.shape[-1])
        k2, b2 = DenseParams(self.dim, name="net_2")(inner)
        if fused_ffn_enabled() and not int8_dense_mode():
            ls, lb = (None, None) if ln is None else ln
            return geglu_ffn(x.astype(self.dtype), k0, b0, k2, b2,
                             ln_scale=ls, ln_bias=lb,
                             residual=ln is not None)
        h = x.astype(self.dtype)
        if ln is not None:
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            xc = xf - mu
            var = jnp.mean(xc * xc, axis=-1, keepdims=True)
            h = (xc * jax.lax.rsqrt(var + 1e-6) * ln[0]
                 + ln[1]).astype(self.dtype)
        ff = dense_with_params(h, k0, b0, self.dtype)
        value, gate = jnp.split(ff, 2, axis=-1)
        ff = dense_with_params(value * nn.gelu(gate, approximate=False),
                               k2, b2, self.dtype)
        return x + ff if ln is not None else ff


class LayerNormParams(nn.Module):
    """nn.LayerNorm-identical param subtree ({scale, bias}) returned as
    raw arrays — for fused kernels that fold the norm in (ops/attn_block)."""

    @nn.compact
    def __call__(self, dim: int):
        s = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return s, b


class _SelfAttnParams(nn.Module):
    """CrossAttention-identical param subtree (to_q/to_k/to_v unbiased,
    to_out_0 biased) returned as raw arrays for ops/attn_block."""

    query_dim: int
    inner: int
    kv_dim: int = 0  # 0 → self-attention (kv from the query stream)

    @nn.compact
    def __call__(self):
        from ..ops.qconv import DenseParams

        kv_dim = self.kv_dim or self.query_dim
        wq, _ = DenseParams(self.inner, use_bias=False,
                            name="to_q")(self.query_dim)
        wk, _ = DenseParams(self.inner, use_bias=False,
                            name="to_k")(kv_dim)
        wv, _ = DenseParams(self.inner, use_bias=False,
                            name="to_v")(kv_dim)
        wo, bo = DenseParams(self.query_dim, name="to_out_0")(self.inner)
        return wq, wk, wv, wo, bo


def _self_attn_composed(x, ls, lb, wq, wk, wv, wo, bo, heads, dtype,
                        temporal=False, pe=None):
    """The pre-r4 composed path, kept for LATENTSYNC_INT8_DENSE (routes
    the projections through the int8 dense kernels) and as the explicit
    opt-out (LATENTSYNC_FUSED_ATTN=0)."""
    from ..ops.qconv import dense_with_params
    from ..ops.temporal_attention import spatial_attention, temporal_attention

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = (xc * jax.lax.rsqrt(var + 1e-6) * ls + lb).astype(dtype)
    if pe is not None:
        h = h + jnp.asarray(pe, dtype)
    q = dense_with_params(h, wq, None, dtype)
    k = dense_with_params(h, wk, None, dtype)
    v = dense_with_params(h, wv, None, dtype)
    o = (temporal_attention if temporal else spatial_attention)(q, k, v, heads)
    return x + dense_with_params(o, wo, bo, dtype)


def _cross_attn_composed(x, ls, lb, ctx, wq, wk, wv, wo, bo, heads, dtype):
    """Composed norm2 + attn2 + residual (the LATENTSYNC_INT8_DENSE /
    LATENTSYNC_FUSED_ATTN=0 path — projections route through the int8
    dense kernels when enabled, like _self_attn_composed)."""
    from ..ops.qconv import dense_with_params

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = (xc * jax.lax.rsqrt(var + 1e-6) * ls + lb).astype(dtype)
    ctx = ctx.astype(dtype)
    inner = wq.shape[1]
    d = inner // heads
    b, s, _ = h.shape
    q = dense_with_params(h, wq, None, dtype).reshape(b, s, heads, d)
    k = dense_with_params(ctx, wk, None, dtype).reshape(
        b, ctx.shape[1], heads, d)
    v = dense_with_params(ctx, wv, None, dtype).reshape(
        b, ctx.shape[1], heads, d)
    o = dot_product_attention(q, k, v).reshape(b, s, inner)
    return x + dense_with_params(o, wo, bo, dtype)


class BasicTransformerBlock(nn.Module):
    """Self-attn + optional audio cross-attn + GEGLU FF
    (ref:attention.py:127-199).

    norm1 + attn1 + residual run as ONE fused Pallas program on TPU
    (ops/attn_block.self_attention_block — exact math, r4; the param
    tree is unchanged: norm1/{scale,bias}, attn1/to_*)."""

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int
    add_audio_layer: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, audio_context=None):
        from ..ops.attn_block import fused_attn_block_enabled, self_attention_block
        from ..ops.qconv import int8_dense_mode

        inner = self.heads * self.dim_head
        ls, lb = LayerNormParams(name="norm1")(self.dim)
        wq, wk, wv, wo, bo = _SelfAttnParams(self.dim, inner, name="attn1")()
        if fused_attn_block_enabled() and not int8_dense_mode():
            x = self_attention_block(x.astype(self.dtype), ls, lb, wq, wk,
                                     wv, wo, bo, self.heads)
        else:
            x = _self_attn_composed(x.astype(self.dtype), ls, lb, wq, wk,
                                    wv, wo, bo, self.heads, self.dtype)
        if self.add_audio_layer and audio_context is not None:
            # norm2 + attn2 + residual as one fused program on TPU
            # (ops/attn_block.cross_attention_block; ctx used raw like
            # the reference) — same param tree as the module composition
            from ..ops.attn_block import cross_attention_block

            ls2, lb2 = LayerNormParams(name="norm2")(self.dim)
            cwq, cwk, cwv, cwo, cbo = _SelfAttnParams(
                self.dim, inner, kv_dim=self.cross_attention_dim or self.dim,
                name="attn2")()
            if fused_attn_block_enabled() and not int8_dense_mode():
                x = cross_attention_block(
                    x.astype(self.dtype), ls2, lb2,
                    audio_context.astype(self.dtype),
                    cwq, cwk, cwv, cwo, cbo, self.heads)
            else:
                x = _cross_attn_composed(
                    x.astype(self.dtype), ls2, lb2, audio_context,
                    cwq, cwk, cwv, cwo, cbo, self.heads, self.dtype)
        # norm3 + FF + residual fold into the fused GEGLU program
        ls3, lb3 = LayerNormParams(name="norm3")(self.dim)
        return GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(
            x.astype(self.dtype), ln=(ls3, lb3))


class SpatialTransformer(nn.Module):
    """Transformer3DModel (ref:attention.py:23-124): per-frame GroupNorm,
    1×1 conv proj in/out, residual."""

    in_channels: int
    heads: int
    dim_head: int
    cross_attention_dim: int
    add_audio_layer: bool
    num_layers: int = 1
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, audio_context=None):
        b, f, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        x2 = x.reshape(b * f, hh, ww, c)
        residual = x2
        h = gn_silu(x2, self.norm_groups, 1e-6, name="norm")
        h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h.astype(self.dtype))
        h = h.reshape(b * f, hh * ww, inner)

        if audio_context is not None and audio_context.ndim == 4:
            # (B, F, S, D) → (B·F, S, D) (ref:attention.py:184-185)
            audio_context = audio_context.reshape(
                b * f, audio_context.shape[2], audio_context.shape[3]
            )

        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                inner, self.heads, self.dim_head, self.cross_attention_dim,
                self.add_audio_layer, dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, audio_context)

        h = h.reshape(b * f, hh, ww, inner)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        out = h + residual
        return out.reshape(b, f, hh, ww, c)


def interleaved_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """pe[:, 0::2]=sin, 1::2=cos (ref:motion_module.py:221-230)."""
    position = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class _TemporalAttnParams(nn.Module):
    """VersatileAttention Temporal_Self param subtree
    (ref:motion_module.py:237-313): nests the CrossAttention-shaped
    params under "attn" so the checkpoint path
    …/attention_blocks_{j}/attn/to_q is preserved. The forward itself
    (PE add + attention across the frame axis per spatial location, in
    the (b·s, f, c) layout TemporalModule transposes ONCE for the whole
    stack) lives in ops/attn_block.self_attention_block(temporal=True)."""

    query_dim: int
    inner: int

    @nn.compact
    def __call__(self):
        return _SelfAttnParams(self.query_dim, self.inner, name="attn")()


class TemporalModule(nn.Module):
    """VanillaTemporalModule → TemporalTransformer3DModel
    (ref:motion_module.py:39-151). proj_out zero-init so the module is an
    identity at init (ref:motion_module.py:65-66)."""

    in_channels: int
    mm: MotionModuleConfig
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, hh, ww, c = x.shape
        heads = self.mm.num_attention_heads
        dim_head = c // heads // self.mm.temporal_attention_dim_div
        inner = heads * dim_head

        x2 = x.reshape(b * f, hh, ww, c)
        residual = x2
        h = gn_silu(x2, self.norm_groups, 1e-6, name="norm")
        h = h.reshape(b * f, hh * ww, c).astype(self.dtype)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)

        # ONE layout change for the whole temporal block stack:
        # (b·f, s, c) → (b·s, f, c); norms/FF are per-token so every inner
        # op is layout-equivalent to the reference's per-attention reshapes
        s = hh * ww
        h = h.reshape(b, f, s, inner).transpose(0, 2, 1, 3).reshape(b * s, f, inner)

        from ..ops.attn_block import fused_attn_block_enabled, self_attention_block
        from ..ops.qconv import int8_dense_mode

        fused = fused_attn_block_enabled() and not int8_dense_mode()
        pe_full = (interleaved_positional_encoding(
            self.mm.temporal_position_encoding_max_len, inner)
            if self.mm.temporal_position_encoding else None)
        for i in range(self.mm.num_transformer_block):
            blk = f"transformer_blocks_{i}"
            for j, _ in enumerate(self.mm.attention_block_types):
                # norm + attention + residual as one fused program
                # (ops/attn_block); param tree identical to the module
                # composition it replaces
                ls, lb = LayerNormParams(name=f"{blk}_norms_{j}")(inner)
                wq, wk, wv, wo, bo = _TemporalAttnParams(
                    inner, heads * dim_head,
                    name=f"{blk}_attention_blocks_{j}")()
                pe = None if pe_full is None else pe_full[:f]
                fn = self_attention_block if fused else functools.partial(
                    _self_attn_composed, dtype=self.dtype)
                h = fn(h.astype(self.dtype), ls, lb, wq, wk, wv, wo, bo,
                       heads, temporal=True, pe=pe)
            lsf, lbf = LayerNormParams(name=f"{blk}_ff_norm")(inner)
            h = GEGLUFeedForward(inner, dtype=self.dtype,
                                 name=f"{blk}_ff")(
                h.astype(self.dtype), ln=(lsf, lbf))

        h = h.reshape(b, s, f, inner).transpose(0, 2, 1, 3).reshape(b * f, s, inner)

        h = nn.Dense(
            c, dtype=self.dtype, name="proj_out",
            kernel_init=(nn.initializers.zeros if self.mm.zero_initialize
                         else nn.initializers.lecun_normal()),
        )(h)
        h = h.reshape(b * f, hh, ww, c)
        return (h + residual).reshape(b, f, hh, ww, c)


class Downsample3D(nn.Module):
    out_channels: int
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return InflatedConv(
            self.out_channels, strides=(2, 2), padding=self.padding,
            dtype=self.dtype, name="conv",
        )(x)


class Upsample3D(nn.Module):
    """Nearest 2× spatial upsample + conv (ref:resnet.py:32-75)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        x = x.reshape(b * f, h, w, c)
        x = jax.image.resize(x, (b * f, h * 2, w * 2, c), method="nearest")
        x = x.reshape(b, f, h * 2, w * 2, c)
        return InflatedConv(self.out_channels, dtype=self.dtype, name="conv")(x)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


class DownBlock3D(nn.Module):
    """CrossAttnDownBlock3D / DownBlock3D (ref:unet_blocks.py:263-516)."""

    cfg: UNet3DConfig
    out_channels: int
    num_layers: int
    has_attention: bool
    use_motion_module: bool
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, audio_context=None):
        cfg = self.cfg
        outputs = []
        for i in range(self.num_layers):
            x = ResnetBlock3D(
                self.out_channels, cfg.time_embed_dim, cfg.norm_num_groups,
                cfg.norm_eps, cfg.resnet_time_scale_shift,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            if self.has_attention:
                x = SpatialTransformer(
                    self.out_channels, cfg.attention_head_dim,
                    self.out_channels // cfg.attention_head_dim,
                    cfg.cross_attention_dim, cfg.add_audio_layer,
                    norm_groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f"attentions_{i}",
                )(x, audio_context)
            if self.use_motion_module:
                x = TemporalModule(
                    self.out_channels, cfg.motion_module, cfg.norm_num_groups,
                    dtype=self.dtype, name=f"motion_modules_{i}",
                )(x)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample3D(
                self.out_channels, cfg.downsample_padding,
                dtype=self.dtype, name="downsamplers_0",
            )(x)
            outputs.append(x)
        return x, outputs


class MidBlock3D(nn.Module):
    """UNetMidBlock3DCrossAttn (ref:unet_blocks.py:153-260)."""

    cfg: UNet3DConfig
    use_motion_module: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, audio_context=None):
        cfg = self.cfg
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock3D(
            ch, cfg.time_embed_dim, cfg.norm_num_groups, cfg.norm_eps,
            cfg.resnet_time_scale_shift,
            output_scale_factor=cfg.mid_block_scale_factor,
            dtype=self.dtype, name="resnets_0",
        )(x, temb)
        x = SpatialTransformer(
            ch, cfg.attention_head_dim, ch // cfg.attention_head_dim,
            cfg.cross_attention_dim, cfg.add_audio_layer,
            norm_groups=cfg.norm_num_groups, dtype=self.dtype,
            name="attentions_0",
        )(x, audio_context)
        if self.use_motion_module:
            x = TemporalModule(
                ch, cfg.motion_module, cfg.norm_num_groups,
                dtype=self.dtype, name="motion_modules_0",
            )(x)
        x = ResnetBlock3D(
            ch, cfg.time_embed_dim, cfg.norm_num_groups, cfg.norm_eps,
            cfg.resnet_time_scale_shift,
            output_scale_factor=cfg.mid_block_scale_factor,
            dtype=self.dtype, name="resnets_1",
        )(x, temb)
        return x


class UpBlock3D(nn.Module):
    """CrossAttnUpBlock3D / UpBlock3D (ref:unet_blocks.py:519-777).

    `start_layer` skips the first layers (their params stay unused —
    the DeepCache sub-block read path replays a cached mid-block
    feature instead); `capture_layer` additionally returns the feature
    entering that layer (the write path's capture point)."""

    cfg: UNet3DConfig
    out_channels: int
    num_layers: int
    has_attention: bool
    use_motion_module: bool
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32
    start_layer: int = 0
    capture_layer: Optional[int] = None

    @nn.compact
    def __call__(self, x, skips, temb, audio_context=None):
        cfg = self.cfg
        captured = None
        for i in range(self.num_layers):
            if i < self.start_layer:
                continue
            if self.capture_layer is not None and i == self.capture_layer:
                captured = x
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock3D(
                self.out_channels, cfg.time_embed_dim, cfg.norm_num_groups,
                cfg.norm_eps, cfg.resnet_time_scale_shift,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            if self.has_attention:
                x = SpatialTransformer(
                    self.out_channels, cfg.attention_head_dim,
                    self.out_channels // cfg.attention_head_dim,
                    cfg.cross_attention_dim, cfg.add_audio_layer,
                    norm_groups=cfg.norm_num_groups, dtype=self.dtype,
                    name=f"attentions_{i}",
                )(x, audio_context)
            if self.use_motion_module:
                x = TemporalModule(
                    self.out_channels, cfg.motion_module, cfg.norm_num_groups,
                    dtype=self.dtype, name=f"motion_modules_{i}",
                )(x)
        if self.add_upsample:
            x = Upsample3D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        if self.capture_layer is not None:
            return x, captured
        return x


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


class UNet3DConditionModel(nn.Module):
    """Forward: sample (B, F, H, W, Cin), timestep (B,) or scalar,
    audio embeds (B, F, S, D) or None → eps (B, F, H, W, Cout)."""

    config: UNet3DConfig = UNet3DConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states=None,
                 deep_cache=None, cache_depth: int = 0,
                 cache_read: bool = False, cache_encoder: bool = False,
                 cache_sub: int = 0):
        """`cache_depth`/`cache_read` implement DeepCache-style step
        caching over the DDIM trajectory (SyncCache / DeepCache family;
        PAPERS.md): with `cache_depth=d > 0` the call returns
        `(eps, cache)` where `cache` is the feature entering up block
        `nb-d` (the output of up block `nb-1-d`). A cache-read call
        (`cache_read=True`, `deep_cache=<that feature>`) executes ONLY
        the shallow slice — conv_in, down blocks `0..d-1`, up blocks
        `nb-d..nb-1`, conv_out — and splices the cached deep feature in
        place of the skipped deep trunk; unused deep-path outputs
        (e.g. the last shallow downsampler) are dead-code-eliminated by
        XLA. Numerics are exact on write steps and approximate on read
        steps; the fidelity gate is statistical (BASELINE.md), and the
        technique is off unless the caller opts in.

        `cache_encoder=True` additionally caches the shallow ENCODER
        skips (encoder-propagation, Faster Diffusion family; PAPERS.md):
        the cache becomes `(deep_feature, skip_tuple)` and a read step
        runs ONLY up blocks `nb-d..` + conv_out on the cached features —
        skipping conv_in and the shallow down blocks, whose 32²-level
        attention dominates the plain read step's time. Read-step output
        then depends on the cached features and t only; the DDIM update
        still integrates it against the CURRENT latents, so the
        trajectory remains live.

        `cache_sub=k` (enc mode only) moves the cut INSIDE the first
        executed up block: the cache captures the feature entering its
        layer k, and a read step replays only layers k.. + conv_out —
        the sub-block continuation of the interval/depth curve (reads
        cannot otherwise get cheaper than the whole of up block nb-d)."""
        cfg = self.config
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.full((sample.shape[0],), timesteps)

        # time embedding (ref:unet.py:95-98,376-382)
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        emb = nn.Dense(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding_linear_1")(t_emb)
        emb = nn.silu(emb)
        emb = nn.Dense(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding_linear_2")(emb)

        if cfg.center_input_sample:
            sample = 2 * sample - 1.0

        sample = sample.astype(self.dtype)
        nb = len(cfg.block_out_channels)
        shallow_only = bool(cache_depth) and cache_read
        enc = bool(cache_depth) and cache_encoder
        sub = (min(cache_sub, cfg.layers_per_block)
               if (bool(cache_depth) and cache_encoder) else 0)
        n_down = (0 if enc else cache_depth) if shallow_only else nb

        # down
        if shallow_only and enc:
            skips = []  # replayed from the cache below
        else:
            x = InflatedConv(
                cfg.block_out_channels[0], dtype=self.dtype, zero_init=True,
                name="conv_in",
            )(sample)
            skips = [x]
        for i, block_type in enumerate(cfg.down_block_types):
            if i >= n_down:
                break
            res = 2 ** i
            is_final = i == nb - 1
            use_mm = (
                cfg.use_motion_module
                and res in cfg.motion_module_resolutions
                and not cfg.motion_module_decoder_only
            )
            x, outs = DownBlock3D(
                cfg,
                cfg.block_out_channels[i],
                cfg.layers_per_block,
                has_attention=block_type.startswith("CrossAttn"),
                use_motion_module=use_mm,
                add_downsample=not is_final,
                dtype=self.dtype,
                name=f"down_blocks_{i}",
            )(x, emb, encoder_hidden_states)
            skips.extend(outs)

        if shallow_only:
            if enc:
                deep, enc_skips = deep_cache
                skips = [s.astype(self.dtype) for s in enc_skips]
                x = deep.astype(self.dtype)
            else:
                # the last shallow block's downsampler output feeds only
                # the skipped deep trunk (its skip belongs to up block
                # nb-1-d)
                skips.pop()
                x = deep_cache.astype(self.dtype)
        else:
            # mid
            x = MidBlock3D(
                cfg,
                use_motion_module=cfg.use_motion_module and cfg.motion_module_mid_block,
                dtype=self.dtype,
                name="mid_block",
            )(x, emb, encoder_hidden_states)

        # up
        cache_out = deep_cache
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            if shallow_only and i < nb - cache_depth:
                continue
            first_cached = bool(cache_depth) and i == nb - cache_depth
            # sub-block cut: write path captures INSIDE this block via
            # capture_layer; read path starts at layer `sub`
            capture = sub if (first_cached and not cache_read and sub) else None
            if first_cached and not cache_read and capture is None:
                # with encoder-propagation the remaining (unconsumed)
                # skips at this point are exactly the shallow-slice set
                cache_out = (x, tuple(skips)) if enc else x
            # the last `sub` skips feed only the skipped leading layers
            enc_keep = (tuple(skips[: len(skips) - sub])
                        if capture is not None else None)
            start = sub if (first_cached and shallow_only) else 0
            res = 2 ** (3 - i)
            is_final = i == nb - 1
            use_mm = cfg.use_motion_module and res in cfg.motion_module_resolutions
            n_layers = cfg.layers_per_block + 1
            take = n_layers - start
            block_skips = skips[-take:] if take else []
            skips = skips[:-take] if take else skips
            out = UpBlock3D(
                cfg,
                rev_channels[i],
                n_layers,
                has_attention=block_type.startswith("CrossAttn"),
                use_motion_module=use_mm,
                add_upsample=not is_final,
                dtype=self.dtype,
                start_layer=start,
                capture_layer=capture,
                name=f"up_blocks_{i}",
            )(x, block_skips, emb, encoder_hidden_states)
            if capture is not None:
                x, captured = out
                cache_out = (captured, enc_keep)
            else:
                x = out

        # out (ref:unet.py:231-241,463-466)
        x = gn_silu(x, cfg.norm_num_groups, cfg.norm_eps,
                    name="conv_norm_out", silu=True)
        x = x.astype(self.dtype)
        x = InflatedConv(
            cfg.out_channels, dtype=self.dtype, zero_init=True, name="conv_out"
        )(x)
        if cache_depth:
            return x, cache_out
        return x


def init_unet_params(config: UNet3DConfig, rng, dtype=jnp.float32, num_frames=16, size=32):
    model = UNet3DConditionModel(config, dtype=dtype)
    sample = jnp.zeros((1, num_frames, size, size, config.in_channels), dtype)
    audio = (
        jnp.zeros((1, num_frames, 50, config.cross_attention_dim), dtype)
        if config.add_audio_layer
        else None
    )
    params = model.init(rng, sample, jnp.zeros((1,), jnp.int32), audio)
    return model, params
