"""VQGAN + CodeFormer face-restoration models in flax (channels-last).

Re-derivation of the reference's CodeFormer stack
(ref:basicsr/archs/vqgan_arch.py — VectorQuantizer :24, GumbelQuantizer
:87, Encoder :229, Generator :276, VQAutoEncoder :327, VQGANDiscriminator
:395; ref:basicsr/archs/codeformer_arch.py — CodeFormer :~160, AdaIN :29,
TransformerSALayer :101, Fuse_sft_block :137).

The sequential block lists are reproduced index-for-index (the fuse skip
connections key on *block indices* — encoder {'512':2,'256':5,'128':8,
'64':11,'32':14,'16':18}, generator {'16':6,'32':9,'64':12,'128':15,
'256':18,'512':21}), so released torch checkpoints map mechanically onto
`blocks_{i}` names. The three CUDA ops of the upstream stack map to
latentsync_tpu.ops.{deform_conv, upfirdn} and a fused XLA leaky-relu.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def swish(x):
    return x * jax.nn.sigmoid(x)


def _gn(groups=32, eps=1e-6, name=None):
    # groups=32 everywhere upstream (ref:vqgan_arch.py:14-15); fall back to
    # gcd for tiny test channel counts
    class _GN(nn.Module):
        @nn.compact
        def __call__(self, x):
            g = groups if x.shape[-1] % groups == 0 else math.gcd(groups, x.shape[-1])
            return nn.GroupNorm(g, epsilon=eps, dtype=jnp.float32, name="gn")(x)
    return _GN(name=name)


class ResBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn(name="norm1")(x)
        h = swish(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = _gn(name="norm2")(h)
        h = swish(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_out")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head conv-projected self-attention (ref:vqgan_arch.py:167)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = _gn(name="norm")(x).astype(self.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn).reshape(b, h * w, c)
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits * (c ** -0.5), axis=-1).astype(self.dtype)
        o = jnp.einsum("bqk,bkc->bqc", weights, v).reshape(b, h, w, c)
        o = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(o)
        return x + o


class Downsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


def encoder_block_specs(nf, ch_mult, num_res_blocks, resolution, attn_resolutions, emb_dim):
    """(kind, out_ch) list mirroring ref:vqgan_arch.py:241-267."""
    specs: List[Tuple[str, int]] = [("conv_in", nf)]
    curr = resolution
    in_mult = (1,) + tuple(ch_mult)
    ch = nf
    for i in range(len(ch_mult)):
        out_ch = nf * ch_mult[i]
        for _ in range(num_res_blocks):
            specs.append(("res", out_ch))
            ch = out_ch
            if curr in attn_resolutions:
                specs.append(("attn", ch))
        if i != len(ch_mult) - 1:
            specs.append(("down", ch))
            curr //= 2
    specs += [("res", ch), ("attn", ch), ("res", ch), ("norm", ch), ("conv_out", emb_dim)]
    return specs


def generator_block_specs(nf, ch_mult, num_res_blocks, resolution, attn_resolutions, emb_dim):
    """(kind, out_ch) list mirroring ref:vqgan_arch.py:290-316."""
    ch = nf * ch_mult[-1]
    curr = resolution // 2 ** (len(ch_mult) - 1)
    specs: List[Tuple[str, int]] = [
        ("conv_in", ch), ("res", ch), ("attn", ch), ("res", ch)
    ]
    for i in reversed(range(len(ch_mult))):
        out_ch = nf * ch_mult[i]
        for _ in range(num_res_blocks):
            specs.append(("res", out_ch))
            ch = out_ch
            if curr in attn_resolutions:
                specs.append(("attn", ch))
        if i != 0:
            specs.append(("up", ch))
            curr *= 2
    specs += [("norm", ch), ("conv_out", 3)]
    return specs


class BlockStack(nn.Module):
    """Sequential indexed block list; optionally returns intermediates."""

    specs: Tuple[Tuple[str, int], ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, taps: Sequence[int] = (), injections: Optional[Dict[int, object]] = None):
        tapped = {}
        for i, (kind, ch) in enumerate(self.specs):
            name = f"blocks_{i}"
            if kind in ("conv_in", "conv_out"):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=name)(x)
            elif kind == "res":
                x = ResBlock(ch, dtype=self.dtype, name=name)(x)
            elif kind == "attn":
                x = AttnBlock(dtype=self.dtype, name=name)(x)
            elif kind == "down":
                x = Downsample(dtype=self.dtype, name=name)(x)
            elif kind == "up":
                x = Upsample(dtype=self.dtype, name=name)(x)
            elif kind == "norm":
                # bare GroupNorm before the final conv — the reference
                # applies NO activation here (ref:vqgan_arch.py:264-266,
                # 314-316 run blocks sequentially with no swish between
                # normalize and the output conv)
                x = _gn(name=name)(x).astype(self.dtype)
            # skips tap and fuse injections run AFTER block i
            # (ref:codeformer_arch.py:228-230, :273-277)
            if injections and i in injections:
                x = injections[i](x)
            if i in taps:
                tapped[i] = x
        return (x, tapped) if taps else x


class VectorQuantizer(nn.Module):
    """Nearest-codebook quantizer (ref:vqgan_arch.py:24-84)."""

    codebook_size: int = 1024
    emb_dim: int = 256
    beta: float = 0.25

    def setup(self):
        # declared in setup (not compact) so codebook_lookup can run
        # without a prior __call__ in the same trace
        self.embedding = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(
                k, s, minval=-1.0 / self.codebook_size, maxval=1.0 / self.codebook_size
            ),
            (self.codebook_size, self.emb_dim),
        )

    def __call__(self, z):
        emb = self.embedding
        flat = z.reshape(-1, self.emb_dim).astype(jnp.float32)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(emb**2, axis=1)
            - 2.0 * flat @ emb.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = emb[idx].reshape(z.shape).astype(z.dtype)
        loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + self.beta * jnp.mean(
            (z_q - jax.lax.stop_gradient(z)) ** 2
        )
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through
        return z_q, loss, idx.reshape(z.shape[:-1])

    def codebook_lookup(self, idx, shape):
        return self.embedding[idx.reshape(-1)].reshape(shape)


class GumbelQuantizer(nn.Module):
    """(ref:vqgan_arch.py:87-114)."""

    codebook_size: int = 1024
    emb_dim: int = 256
    kl_weight: float = 1e-8
    straight_through: bool = False

    @nn.compact
    def __call__(self, z, rng=None, hard: bool = True, temperature: float = 1.0):
        logits = nn.Conv(self.codebook_size, (1, 1), name="proj")(z)
        emb = self.param(
            "embed", nn.initializers.normal(1.0), (self.codebook_size, self.emb_dim)
        )
        if rng is not None:
            g = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape) + 1e-10) + 1e-10)
            y = jax.nn.softmax((logits + g) / temperature, axis=-1)
        else:
            y = jax.nn.softmax(logits / temperature, axis=-1)
        if hard:
            idx = jnp.argmax(y, axis=-1)
            y_hard = jax.nn.one_hot(idx, self.codebook_size, dtype=y.dtype)
            y = y + jax.lax.stop_gradient(y_hard - y)
        else:
            idx = jnp.argmax(y, axis=-1)
        z_q = jnp.einsum("bhwn,nd->bhwd", y, emb)
        qy = jax.nn.softmax(logits, axis=-1)
        diff = self.kl_weight * jnp.mean(
            jnp.sum(qy * jnp.log(qy * self.codebook_size + 1e-10), axis=-1)
        )
        return z_q, diff, idx


class VQAutoEncoder(nn.Module):
    """(ref:vqgan_arch.py:327-392)."""

    img_size: int = 512
    nf: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4, 4, 8)
    quantizer: str = "nearest"
    res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    codebook_size: int = 1024
    emb_dim: int = 256
    beta: float = 0.25
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = BlockStack(
            tuple(encoder_block_specs(self.nf, self.ch_mult, self.res_blocks,
                                      self.img_size, self.attn_resolutions, self.emb_dim)),
            dtype=self.dtype, name="encoder",
        )
        self.generator = BlockStack(
            tuple(generator_block_specs(self.nf, self.ch_mult, self.res_blocks,
                                        self.img_size, self.attn_resolutions, self.emb_dim)),
            dtype=self.dtype, name="generator",
        )
        if self.quantizer == "nearest":
            self.quantize = VectorQuantizer(self.codebook_size, self.emb_dim, self.beta)
        else:
            self.quantize = GumbelQuantizer(self.codebook_size, self.emb_dim)

    def __call__(self, x):
        z = self.encoder(x)
        z_q, loss, idx = self.quantize(z)
        rec = self.generator(z_q)
        return rec, loss, idx


class TransformerSALayer(nn.Module):
    """Pre-LN self-attention layer with learned query positions
    (ref:codeformer_arch.py:101-135). Tokens-first layout (B, T, C)."""

    embed_dim: int = 512
    nhead: int = 8
    dim_mlp: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        qk = h + query_pos.astype(self.dtype)
        d = self.embed_dim // self.nhead
        b, t, _ = x.shape
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(qk)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(qk)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(h)
        from ..ops.attention import dot_product_attention

        o = dot_product_attention(
            q.reshape(b, t, self.nhead, d),
            k.reshape(b, t, self.nhead, d),
            v.reshape(b, t, self.nhead, d),
        ).reshape(b, t, self.embed_dim)
        x = x + nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(o)

        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(self.dim_mlp, dtype=self.dtype, name="linear1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear2")(h)
        return x + h


def adaptive_instance_norm(content, style, eps=1e-5):
    """AdaIN over (B, H, W, C) (ref:codeformer_arch.py:11-43)."""
    def stats(f):
        m = f.mean(axis=(1, 2), keepdims=True)
        v = f.var(axis=(1, 2), keepdims=True) + eps
        return m, jnp.sqrt(v)

    cm, cs = stats(content)
    sm, ss = stats(style)
    return (content - cm) / cs * ss + sm


class FuseSftBlock(nn.Module):
    """SFT-style skip fusion (ref:codeformer_arch.py:137-156)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, enc_feat, dec_feat, w: float = 1.0):
        h = ResBlock(self.out_channels, dtype=self.dtype, name="encode_enc")(
            jnp.concatenate([enc_feat, dec_feat], axis=-1)
        )
        def head(name):
            y = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_0")(h)
            y = jax.nn.leaky_relu(y, 0.2)
            return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                           name=f"{name}_2")(y)
        scale = head("scale")
        shift = head("shift")
        return dec_feat + w * (dec_feat * scale + shift)


class CodeFormer(nn.Module):
    """(ref:codeformer_arch.py:160-279). Input (B, 512, 512, 3) in [-1,1]
    (normalized), output restored image + code logits + lq feature."""

    dim_embd: int = 512
    n_head: int = 8
    n_layers: int = 9
    codebook_size: int = 1024
    latent_size: int = 256
    connect_list: Tuple[str, ...] = ("32", "64", "128", "256")
    dtype: jnp.dtype = jnp.float32

    # fixed VQGAN geometry (super().__init__ args in the reference)
    img_size: int = 512
    nf: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4, 4, 8)
    emb_dim: int = 256

    FUSE_ENCODER = {"512": 2, "256": 5, "128": 8, "64": 11, "32": 14, "16": 18}
    FUSE_GENERATOR = {"16": 6, "32": 9, "64": 12, "128": 15, "256": 18, "512": 21}
    # fuse channels per f_size as nf multiples — ×64 reproduces the
    # reference's hardcoded dict (ref:codeformer_arch.py:194-201)
    CHANNEL_MULT = {"16": 8, "32": 4, "64": 4, "128": 2, "256": 2, "512": 1}

    @property
    def CHANNELS(self):
        return {f: self.nf * m for f, m in self.CHANNEL_MULT.items()}

    def setup(self):
        self.latent_hw = self.img_size // 2 ** (len(self.ch_mult) - 1)
        self.encoder = BlockStack(
            tuple(encoder_block_specs(self.nf, self.ch_mult, 2, self.img_size,
                                      (self.latent_hw,), self.emb_dim)),
            dtype=self.dtype, name="encoder",
        )
        self.generator = BlockStack(
            tuple(generator_block_specs(self.nf, self.ch_mult, 2, self.img_size,
                                        (self.latent_hw,), self.emb_dim)),
            dtype=self.dtype, name="generator",
        )
        self.quantize = VectorQuantizer(self.codebook_size, self.emb_dim)
        self.position_emb = self.param(
            "position_emb", nn.initializers.zeros, (self.latent_size, self.dim_embd)
        )
        self.feat_emb = nn.Dense(self.dim_embd, dtype=self.dtype, name="feat_emb")
        self.ft_layers = [
            TransformerSALayer(self.dim_embd, self.n_head, self.dim_embd * 2,
                               dtype=self.dtype, name=f"ft_layers_{i}")
            for i in range(self.n_layers)
        ]
        self.idx_norm = nn.LayerNorm(dtype=jnp.float32, name="idx_pred_norm")
        self.idx_linear = nn.Dense(
            self.codebook_size, use_bias=False, dtype=self.dtype, name="idx_pred_linear"
        )
        self.fuse_convs = {
            f: FuseSftBlock(self.CHANNELS[f], dtype=self.dtype, name=f"fuse_convs_{f}")
            for f in self.connect_list
        }

    def __call__(self, x, w: float = 0.0, adain: bool = False, code_only: bool = False):
        enc_taps = tuple(self.FUSE_ENCODER[f] for f in self.connect_list)
        if enc_taps:
            z, tapped = self.encoder(x, taps=enc_taps)
        else:  # no fuse connects (e.g. reduced test configs): plain encode
            z, tapped = self.encoder(x), {}
        enc_feats = {
            f: tapped[self.FUSE_ENCODER[f]] for f in self.connect_list
        }
        lq_feat = z  # (B, latent_hw, latent_hw, emb_dim)

        b = z.shape[0]
        tokens = z.reshape(b, -1, z.shape[-1])  # (B, 256, 256)
        h = self.feat_emb(tokens.astype(self.dtype))
        pos = self.position_emb[None]  # (1, T, C)
        for layer in self.ft_layers:
            h = layer(h, pos)
        logits = self.idx_linear(self.idx_norm(h).astype(self.dtype))  # (B, T, K)
        if code_only:
            return logits, lq_feat

        idx = jnp.argmax(logits, axis=-1)  # (B, T)
        quant = self.quantize.codebook_lookup(
            idx, (b, self.latent_hw, self.latent_hw, self.emb_dim)
        ).astype(self.dtype)
        quant = jax.lax.stop_gradient(quant)  # detach_16 generation path
        if adain:
            quant = adaptive_instance_norm(quant, lq_feat)

        # the fuse residual is w·(dec·scale+shift), identically zero at
        # w=0, so the blocks always run (jit-safe, params always created;
        # w can be a traced scalar without recompiles)
        injections = {}
        for f in self.connect_list:
            gi = self.FUSE_GENERATOR[f]
            enc = enc_feats[f]
            fuse = self.fuse_convs[f]
            injections[gi] = (lambda fuse, enc: lambda d: fuse(enc, d, w))(fuse, enc)
        out = self.generator(quant, injections=injections or None)
        return out, logits, lq_feat


class VQGANDiscriminator(nn.Module):
    """PatchGAN discriminator (ref:vqgan_arch.py:395-433)."""

    nc: int = 3
    ndf: int = 64
    n_layers: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    dtype=self.dtype, name="main_0")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        idx = 2
        ndf_mult = 1
        for n in range(1, self.n_layers + 1):
            ndf_mult = min(2**n, 8)
            stride = 2 if n != self.n_layers else 1
            h = nn.Conv(self.ndf * ndf_mult, (4, 4), strides=(stride, stride),
                        padding=1, use_bias=False, dtype=self.dtype,
                        name=f"main_{idx}")(h)
            h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                             name=f"main_{idx + 1}")(h)
            h = jax.nn.leaky_relu(h, 0.2)
            idx += 3
        return nn.Conv(1, (4, 4), padding=1, dtype=self.dtype, name=f"main_{idx}")(h)
