"""Independent PyTorch implementations of the LatentSync UNet3D and the SD
AutoencoderKL used as parity oracles (same role as HF's WhisperEncoder in
test_whisper.py).

Written fresh from the documented architecture (SURVEY.md §2.1;
ref:latentsync/models/{unet,unet_blocks,attention,resnet,motion_module}.py
for behavior, diffusers AutoencoderKL for the VAE). State-dict KEY NAMES
follow the reference's checkpoint layout — that naming is the interface
`latentsync_tpu.utils.convert.{convert_unet,convert_vae}` consumes, so
matching it is what lets the tests exercise converter numerics and model
semantics in one pass: random torch weights → convert → flax forward must
equal the torch forward.

Layout: torch (B, C, F, H, W) like the reference; the tests transpose to
the flax channels-last (B, F, H, W, C).
"""

import math
import numpy as np

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(timesteps, dim, max_period=10000.0):
    """diffusers get_timestep_embedding with flip_sin_to_cos=True,
    freq_shift=0 (the UNet's Timesteps config)."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / half
    freqs = torch.exp(exponent)
    args = timesteps.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class InflatedConv2d(nn.Conv2d):
    """2D conv applied per frame on (B, C, F, H, W)."""

    def forward(self, x):
        b, c, f, h, w = x.shape
        y = super().forward(x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w))
        return y.reshape(b, f, *y.shape[1:]).permute(0, 2, 1, 3, 4)


class ResnetBlock3D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, groups=32, eps=1e-5,
                 output_scale_factor=1.0):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = InflatedConv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = InflatedConv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            InflatedConv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )
        self.scale = output_scale_factor

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        t = self.time_emb_proj(F.silu(temb))[:, :, None, None, None]
        h = h + t
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return (x + h) / self.scale


class Attention(nn.Module):
    """diffusers-style MHA: unbiased q/k/v, biased out projection."""

    def __init__(self, query_dim, heads, dim_head, cross_dim=None):
        super().__init__()
        inner = heads * dim_head
        cross_dim = cross_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(cross_dim, inner, bias=False)
        self.to_v = nn.Linear(cross_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(0.0)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, s, _ = x.shape
        sk = context.shape[1]

        def split(t, n):
            return t.reshape(b, n, self.heads, self.dim_head).permute(0, 2, 1, 3)

        q = split(self.to_q(x), s)
        k = split(self.to_k(context), sk)
        v = split(self.to_v(context), sk)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.permute(0, 2, 1, 3).reshape(b, s, -1)
        return self.to_out[0](o)


class FeedForward(nn.Module):
    """GEGLU FF, mult=4. Keys: ff.net.0.proj, ff.net.2."""

    def __init__(self, dim):
        super().__init__()
        inner = dim * 4

        class GEGLU(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, inner * 2)

            def forward(self, x):
                val, gate = self.proj(x).chunk(2, dim=-1)
                return val * F.gelu(gate)

        self.net = nn.ModuleList([GEGLU(), nn.Dropout(0.0), nn.Linear(inner, dim)])

    def forward(self, x):
        return self.net[2](self.net[1](self.net[0](x)))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, cross_dim, add_audio_layer):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads, dim_head)
        self.add_audio_layer = add_audio_layer
        if add_audio_layer:
            self.norm2 = nn.LayerNorm(dim)
            self.attn2 = Attention(dim, heads, dim_head, cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, audio=None):
        x = self.attn1(self.norm1(x)) + x
        if self.add_audio_layer and audio is not None:
            if audio.dim() == 4:  # (B, F, S, D) → (B·F, S, D)
                audio = audio.reshape(-1, audio.shape[2], audio.shape[3])
            x = self.attn2(self.norm2(x), audio) + x
        return self.ff(self.norm3(x)) + x


class SpatialTransformer(nn.Module):
    """Transformer3DModel, use_linear_projection=False (conv 1×1 proj)."""

    def __init__(self, in_ch, heads, dim_head, cross_dim, add_audio_layer,
                 groups=32, num_layers=1):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(groups, in_ch, eps=1e-6)
        self.proj_in = nn.Conv2d(in_ch, inner, 1)
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlock(inner, heads, dim_head, cross_dim, add_audio_layer)
            for _ in range(num_layers)
        ])
        self.proj_out = nn.Conv2d(inner, in_ch, 1)

    def forward(self, x, audio=None):
        b, c, f, hh, ww = x.shape
        x2 = x.permute(0, 2, 1, 3, 4).reshape(b * f, c, hh, ww)
        residual = x2
        h = self.proj_in(self.norm(x2))
        inner = h.shape[1]
        h = h.permute(0, 2, 3, 1).reshape(b * f, hh * ww, inner)
        for blk in self.transformer_blocks:
            h = blk(h, audio)
        h = h.reshape(b * f, hh, ww, inner).permute(0, 3, 1, 2)
        h = self.proj_out(h) + residual
        return h.reshape(b, f, c, hh, ww).permute(0, 2, 1, 3, 4)


class TemporalTransformerBlock(nn.Module):
    """Two Temporal_Self VersatileAttention blocks + GEGLU FF. Keys follow
    the checkpoint layout: attention_blocks.{i}, norms.{i}, ff, ff_norm."""

    def __init__(self, dim, heads, dim_head, max_len=24):
        super().__init__()
        self.attention_blocks = nn.ModuleList(
            [Attention(dim, heads, dim_head) for _ in range(2)]
        )
        self.norms = nn.ModuleList([nn.LayerNorm(dim) for _ in range(2)])
        self.ff = FeedForward(dim)
        self.ff_norm = nn.LayerNorm(dim)
        pos = torch.arange(max_len)[:, None]
        div = torch.exp(torch.arange(0, dim, 2) * (-math.log(10000.0) / dim))
        pe = torch.zeros(max_len, dim)
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe)

    def forward(self, h, video_length):
        # h: (B·F, S, C); each attention attends across frames per location
        bf, s, c = h.shape
        b = bf // video_length
        for attn, norm in zip(self.attention_blocks, self.norms):
            hn = norm(h)
            hn = hn.reshape(b, video_length, s, c).permute(0, 2, 1, 3)
            hn = hn.reshape(b * s, video_length, c)
            hn = hn + self.pe[:video_length]
            o = attn(hn)
            o = o.reshape(b, s, video_length, c).permute(0, 2, 1, 3)
            h = h + o.reshape(bf, s, c)
        return self.ff(self.ff_norm(h)) + h


class TemporalModule(nn.Module):
    """VanillaTemporalModule → TemporalTransformer3DModel. State-dict keys
    nest under `temporal_transformer.`."""

    def __init__(self, in_ch, heads, num_blocks=1, groups=32, max_len=24):
        super().__init__()
        dim_head = in_ch // heads
        inner = heads * dim_head

        tt = nn.Module()
        tt.norm = nn.GroupNorm(groups, in_ch, eps=1e-6)
        tt.proj_in = nn.Linear(in_ch, inner)
        tt.transformer_blocks = nn.ModuleList([
            TemporalTransformerBlock(inner, heads, dim_head, max_len)
            for _ in range(num_blocks)
        ])
        tt.proj_out = nn.Linear(inner, in_ch)
        self.temporal_transformer = tt

    def forward(self, x, temb=None, encoder_hidden_states=None):
        tt = self.temporal_transformer
        b, c, f, hh, ww = x.shape
        x2 = x.permute(0, 2, 1, 3, 4).reshape(b * f, c, hh, ww)
        residual = x2
        h = tt.norm(x2).permute(0, 2, 3, 1).reshape(b * f, hh * ww, c)
        h = tt.proj_in(h)
        for blk in tt.transformer_blocks:
            h = blk(h, f)
        h = tt.proj_out(h)
        h = h.reshape(b * f, hh, ww, c).permute(0, 3, 1, 2) + residual
        return h.reshape(b, f, c, hh, ww).permute(0, 2, 1, 3, 4)


class Downsample3D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = InflatedConv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample3D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = InflatedConv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        b, c, f, h, w = x.shape
        x2 = x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
        x2 = F.interpolate(x2, scale_factor=2.0, mode="nearest")
        x2 = x2.reshape(b, f, c, h * 2, w * 2).permute(0, 2, 1, 3, 4)
        return self.conv(x2)


class TorchUNet3D(nn.Module):
    """Flagship topology at configurable width: 3×CrossAttnDown + Down,
    mid CrossAttn (no motion), Up + 3×CrossAttnUp; motion modules on every
    non-mid layer (stage2.yaml: motion_module_resolutions [1,2,4,8],
    motion_module_mid_block false)."""

    def __init__(self, channels=(32, 64, 64, 64), layers_per_block=1,
                 groups=8, heads=4, cross_dim=16, in_ch=13, out_ch=4,
                 mm_heads=4):
        super().__init__()
        temb_ch = channels[0] * 4
        self.channels = channels
        self.conv_in = InflatedConv2d(in_ch, channels[0], 3, padding=1)
        te = nn.Module()
        te.linear_1 = nn.Linear(channels[0], temb_ch)
        te.linear_2 = nn.Linear(temb_ch, temb_ch)
        self.time_embedding = te

        def make_layer(block, ch_in, ch_out, has_attn):
            layer = nn.Module()
            layer.resnet = ResnetBlock3D(ch_in, ch_out, temb_ch, groups)
            layer.attn = (
                SpatialTransformer(ch_out, heads, ch_out // heads, cross_dim,
                                   True, groups)
                if has_attn else None
            )
            layer.mm = TemporalModule(ch_out, mm_heads, groups=groups)
            return layer

        self.down_blocks = nn.ModuleList()
        ch = channels[0]
        for i, ch_out in enumerate(channels):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            blk.motion_modules = nn.ModuleList()
            has_attn = i < len(channels) - 1  # last block is DownBlock3D
            for j in range(layers_per_block):
                blk.resnets.append(ResnetBlock3D(ch if j == 0 else ch_out,
                                                 ch_out, temb_ch, groups))
                if has_attn:
                    blk.attentions.append(
                        SpatialTransformer(ch_out, heads, ch_out // heads,
                                           cross_dim, True, groups))
                blk.motion_modules.append(TemporalModule(ch_out, mm_heads,
                                                         groups=groups))
            blk.has_attn = has_attn
            if i < len(channels) - 1:
                blk.downsamplers = nn.ModuleList([Downsample3D(ch_out)])
            else:
                blk.downsamplers = None
            self.down_blocks.append(blk)
            ch = ch_out

        mid = nn.Module()
        mch = channels[-1]
        mid.resnets = nn.ModuleList([
            ResnetBlock3D(mch, mch, temb_ch, groups),
            ResnetBlock3D(mch, mch, temb_ch, groups),
        ])
        mid.attentions = nn.ModuleList([
            SpatialTransformer(mch, heads, mch // heads, cross_dim, True, groups)
        ])
        self.mid_block = mid

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(channels))
        skip_chs = [channels[0]]
        for i, ch_out in enumerate(channels):
            skip_chs += [ch_out] * layers_per_block
            if i < len(channels) - 1:
                skip_chs.append(ch_out)
        ch = rev[0]
        for i, ch_out in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            blk.motion_modules = nn.ModuleList()
            has_attn = i > 0  # first up block is UpBlock3D
            for j in range(layers_per_block + 1):
                skip = skip_chs.pop()
                blk.resnets.append(ResnetBlock3D(ch + skip, ch_out, temb_ch, groups))
                ch = ch_out
                if has_attn:
                    blk.attentions.append(
                        SpatialTransformer(ch_out, heads, ch_out // heads,
                                           cross_dim, True, groups))
                blk.motion_modules.append(TemporalModule(ch_out, mm_heads,
                                                         groups=groups))
            blk.has_attn = has_attn
            if i < len(channels) - 1:
                blk.upsamplers = nn.ModuleList([Upsample3D(ch_out)])
            else:
                blk.upsamplers = None
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(groups, channels[0], eps=1e-5)
        self.conv_out = InflatedConv2d(channels[0], out_ch, 3, padding=1)

    def forward(self, sample, timesteps, audio):
        temb = timestep_embedding(timesteps, self.channels[0])
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))

        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            for j, resnet in enumerate(blk.resnets):
                x = resnet(x, temb)
                if blk.has_attn:
                    x = blk.attentions[j](x, audio)
                x = blk.motion_modules[j](x)
                skips.append(x)
            if blk.downsamplers is not None:
                x = blk.downsamplers[0](x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, audio)
        x = self.mid_block.resnets[1](x, temb)

        for blk in self.up_blocks:
            for j, resnet in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = resnet(x, temb)
                if blk.has_attn:
                    x = blk.attentions[j](x, audio)
                x = blk.motion_modules[j](x)
            if blk.upsamplers is not None:
                x = blk.upsamplers[0](x)

        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        return x


# ---------------------------------------------------------------------------
# SD AutoencoderKL (diffusers state-dict key layout)
# ---------------------------------------------------------------------------


class VAEResnet(nn.Module):
    def __init__(self, in_ch, out_ch, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class VAEAttn(nn.Module):
    """Single-head spatial self-attention (diffusers Attention keys)."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch), nn.Dropout(0.0)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        o = F.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None])[:, 0]
        o = self.to_out[0](o)
        return x + o.reshape(b, h, w, c).permute(0, 3, 1, 2)


class TorchVAE(nn.Module):
    """AutoencoderKL with diffusers key names (encoder.down_blocks.i.
    resnets.j..., mid_block.resnets/attentions, quant_conv...)."""

    def __init__(self, channels=(8, 16), layers_per_block=1, groups=4,
                 latent=4):
        super().__init__()

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, channels[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        ch = channels[0]
        for i, ch_out in enumerate(channels):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                VAEResnet(ch if j == 0 else ch_out, ch_out, groups)
                for j in range(layers_per_block)
            ])
            if i < len(channels) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(ch_out, ch_out, 3, stride=2, padding=0)
                blk.downsamplers = nn.ModuleList([ds])
            else:
                blk.downsamplers = None
            enc.down_blocks.append(blk)
            ch = ch_out
        mid = nn.Module()
        mid.resnets = nn.ModuleList([VAEResnet(ch, ch, groups),
                                     VAEResnet(ch, ch, groups)])
        mid.attentions = nn.ModuleList([VAEAttn(ch, groups)])
        enc.mid_block = mid
        enc.conv_norm_out = nn.GroupNorm(groups, ch, eps=1e-6)
        enc.conv_out = nn.Conv2d(ch, 2 * latent, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        rev = list(reversed(channels))
        dec.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        dmid = nn.Module()
        dmid.resnets = nn.ModuleList([VAEResnet(rev[0], rev[0], groups),
                                      VAEResnet(rev[0], rev[0], groups)])
        dmid.attentions = nn.ModuleList([VAEAttn(rev[0], groups)])
        dec.mid_block = dmid
        dec.up_blocks = nn.ModuleList()
        ch = rev[0]
        for i, ch_out in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([
                VAEResnet(ch if j == 0 else ch_out, ch_out, groups)
                for j in range(layers_per_block + 1)
            ])
            if i < len(rev) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(ch_out, ch_out, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            else:
                blk.upsamplers = None
            dec.up_blocks.append(blk)
            ch = ch_out
        dec.conv_norm_out = nn.GroupNorm(groups, ch, eps=1e-6)
        dec.conv_out = nn.Conv2d(ch, 3, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

    def encode_moments(self, x):
        h = self.encoder.conv_in(x)
        for blk in self.encoder.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if blk.downsamplers is not None:
                h = F.pad(h, (0, 1, 0, 1))  # SD's asymmetric (0,1) padding
                h = blk.downsamplers[0].conv(h)
        mid = self.encoder.mid_block
        h = mid.resnets[0](h)
        h = mid.attentions[0](h)
        h = mid.resnets[1](h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        mid = self.decoder.mid_block
        h = mid.resnets[0](h)
        h = mid.attentions[0](h)
        h = mid.resnets[1](h)
        for blk in self.decoder.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if blk.upsamplers is not None:
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))


def randomize_(model: nn.Module, seed: int = 0, scale: float = 0.2):
    """Replace every parameter with seeded random values — zero-init
    convs/projections must carry signal for parity to be meaningful."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    return model


# ---------------------------------------------------------------------------
# StableSyncNet (ref:latentsync/models/stable_syncnet.py)
# ---------------------------------------------------------------------------


class SyncResnetBlock2D(nn.Module):
    """ResnetBlock2D with the asymmetric stride-2 downsample padding
    (ref:stable_syncnet.py:65-133)."""

    def __init__(self, cin, cout, factor=2, groups=32):
        super().__init__()
        import math as _m

        self.norm1 = nn.GroupNorm(_m.gcd(groups, cin), cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(_m.gcd(groups, cout), cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None
        f = tuple(factor) if isinstance(factor, (list, tuple)) else (factor, factor)
        self.factor = f
        if f != (1, 1):
            self.downsample_conv = nn.Conv2d(cout, cout, 3, stride=f, padding=0)
            # (left, right, top, bottom)
            self.pad = (0, 1, 0, 1)
            if f[0] == 1:
                self.pad = (0, 1, 1, 1)
            elif f[1] == 1:
                self.pad = (1, 1, 0, 1)
        else:
            self.downsample_conv = None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        h = h + x
        if self.downsample_conv is not None:
            h = F.pad(h, self.pad)
            h = self.downsample_conv(h)
        return h


class SyncAttentionBlock2D(nn.Module):
    """(ref:stable_syncnet.py:136-169): biased MHA + GEGLU FF."""

    def __init__(self, dim, groups=32):
        super().__init__()
        import math as _m

        self.norm1 = nn.GroupNorm(_m.gcd(groups, dim), dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)
        self.conv_in = nn.Conv2d(dim, dim, 1)
        self.conv_out = nn.Conv2d(dim, dim, 1)
        self.attn = Attention(dim, 8, dim // 8)
        # the reference constructs Attention(bias=True)
        inner = dim
        self.attn.to_q = nn.Linear(dim, inner, bias=True)
        self.attn.to_k = nn.Linear(dim, inner, bias=True)
        self.attn.to_v = nn.Linear(dim, inner, bias=True)

    def forward(self, x):
        b, c, hh, ww = x.shape
        residual = x
        h = self.conv_in(self.norm1(x))
        h = h.flatten(2).permute(0, 2, 1)  # b (h w) c
        h = self.attn(self.norm2(h)) + h
        h = self.ff(self.norm3(h)) + h
        h = h.permute(0, 2, 1).reshape(b, c, hh, ww)
        h = self.conv_out(h)
        return h + residual


class DownEncoder2D(nn.Module):
    """(ref:stable_syncnet.py:172-233)."""

    def __init__(self, cin, channels, factors, attns, groups=32):
        super().__init__()
        import math as _m

        self.conv_in = nn.Conv2d(cin, channels[0], 3, padding=1)
        blocks = []
        out = channels[0]
        for i, ch in enumerate(channels):
            blocks.append(SyncResnetBlock2D(out, ch, factors[i], groups))
            out = ch
            if attns[i] == 1:
                blocks.append(SyncAttentionBlock2D(ch, groups))
        self.down_blocks = nn.ModuleList(blocks)
        self.norm_out = nn.GroupNorm(_m.gcd(groups, channels[-1]), channels[-1],
                                     eps=1e-6)

    def forward(self, x):
        h = self.conv_in(x)
        for blk in self.down_blocks:
            h = blk(h)
        return F.relu(self.norm_out(h))


class StableSyncNet(nn.Module):
    """(ref:stable_syncnet.py:28-62)."""

    def __init__(self, aud, vis):
        super().__init__()
        self.audio_encoder = DownEncoder2D(*aud)
        self.visual_encoder = DownEncoder2D(*vis)

    def forward(self, frames, mels):
        v = self.visual_encoder(frames).flatten(1)
        a = self.audio_encoder(mels).flatten(1)
        return F.normalize(v, p=2, dim=1), F.normalize(a, p=2, dim=1)


# ---------------------------------------------------------------------------
# VQGAN / CodeFormer stack (ref:basicsr/archs/vqgan_arch.py) — block-list
# naming encoder.blocks.N / generator.blocks.N matching convert_codeformer
# ---------------------------------------------------------------------------


def _vq_normalize(c, groups=32):
    import math as _m

    g = groups if c % groups == 0 else _m.gcd(groups, c)
    return nn.GroupNorm(g, c, eps=1e-6)


class VQResBlock(nn.Module):
    """(ref:vqgan_arch.py:141-165) — NOTE the shortcut is named conv_out."""

    def __init__(self, cin, cout):
        super().__init__()
        self.cin, self.cout = cin, cout
        self.norm1 = _vq_normalize(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = _vq_normalize(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_out = nn.Conv2d(cin, cout, 1)

    def forward(self, x_in):
        x = self.conv1(F.silu(self.norm1(x_in)))
        x = self.conv2(F.silu(self.norm2(x)))
        if self.cin != self.cout:
            x_in = self.conv_out(x_in)
        return x + x_in


class VQAttnBlock(nn.Module):
    """Single-head 1×1-conv attention (ref:vqgan_arch.py:167-228)."""

    def __init__(self, c):
        super().__init__()
        self.norm = _vq_normalize(c)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, ww = q.shape
        q = q.reshape(b, c, hh * ww).permute(0, 2, 1)
        k = k.reshape(b, c, hh * ww)
        w = torch.softmax(torch.bmm(q, k) * c ** -0.5, dim=2)
        v = v.reshape(b, c, hh * ww)
        out = torch.bmm(v, w.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return x + self.proj_out(out)


class VQDownsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class VQUpsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


def _vq_encoder_blocks(cin, nf, emb_dim, ch_mult, res_blocks, resolution, attns):
    """(ref:vqgan_arch.py:241-267)."""
    blocks = [nn.Conv2d(cin, nf, 3, padding=1)]
    curr = resolution
    in_mult = (1,) + tuple(ch_mult)
    for i in range(len(ch_mult)):
        bi, bo = nf * in_mult[i], nf * ch_mult[i]
        for _ in range(res_blocks):
            blocks.append(VQResBlock(bi, bo))
            bi = bo
            if curr in attns:
                blocks.append(VQAttnBlock(bi))
        if i != len(ch_mult) - 1:
            blocks.append(VQDownsample(bi))
            curr //= 2
    blocks += [VQResBlock(bi, bi), VQAttnBlock(bi), VQResBlock(bi, bi),
               _vq_normalize(bi), nn.Conv2d(bi, emb_dim, 3, padding=1)]
    return nn.ModuleList(blocks)


def _vq_generator_blocks(nf, emb_dim, ch_mult, res_blocks, img_size, attns):
    """(ref:vqgan_arch.py:290-316)."""
    bi = nf * ch_mult[-1]
    curr = img_size // 2 ** (len(ch_mult) - 1)
    blocks = [nn.Conv2d(emb_dim, bi, 3, padding=1),
              VQResBlock(bi, bi), VQAttnBlock(bi), VQResBlock(bi, bi)]
    for i in reversed(range(len(ch_mult))):
        bo = nf * ch_mult[i]
        for _ in range(res_blocks):
            blocks.append(VQResBlock(bi, bo))
            bi = bo
            if curr in attns:
                blocks.append(VQAttnBlock(bi))
        if i != 0:
            blocks.append(VQUpsample(bi))
            curr *= 2
    blocks += [_vq_normalize(bi), nn.Conv2d(bi, 3, 3, padding=1)]
    return nn.ModuleList(blocks)


class _Blocks(nn.Module):
    def __init__(self, blocks):
        super().__init__()
        self.blocks = blocks

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x


class TorchVQAutoEncoder(nn.Module):
    """(ref:vqgan_arch.py:327-393), nearest quantizer."""

    def __init__(self, img_size=32, nf=8, ch_mult=(1, 2), res_blocks=2,
                 attn_resolutions=(16,), codebook_size=16, emb_dim=16):
        super().__init__()
        self.emb_dim = emb_dim
        self.encoder = _Blocks(_vq_encoder_blocks(
            3, nf, emb_dim, ch_mult, res_blocks, img_size, attn_resolutions))
        self.generator = _Blocks(_vq_generator_blocks(
            nf, emb_dim, ch_mult, res_blocks, img_size, attn_resolutions))

        class _Quant(nn.Module):
            def __init__(self):
                super().__init__()
                self.embedding = nn.Embedding(codebook_size, emb_dim)

        self.quantize = _Quant()

    def forward(self, x):
        z = self.encoder(x)  # (b, e, h, w)
        b, e, hh, ww = z.shape
        flat = z.permute(0, 2, 3, 1).reshape(-1, e)
        emb = self.quantize.embedding.weight
        d = (flat.pow(2).sum(1, keepdim=True) + emb.pow(2).sum(1)
             - 2 * flat @ emb.t())
        idx = d.argmin(1)
        zq = emb[idx].reshape(b, hh, ww, e).permute(0, 3, 1, 2)
        zq = z + (zq - z).detach()
        return self.generator(zq)


class TorchFuseSft(nn.Module):
    """(ref:codeformer_arch.py:136-157)."""

    def __init__(self, ch):
        super().__init__()
        self.encode_enc = VQResBlock(2 * ch, ch)
        self.scale = nn.Sequential(
            nn.Conv2d(ch, ch, 3, padding=1), nn.LeakyReLU(0.2, True),
            nn.Conv2d(ch, ch, 3, padding=1))
        self.shift = nn.Sequential(
            nn.Conv2d(ch, ch, 3, padding=1), nn.LeakyReLU(0.2, True),
            nn.Conv2d(ch, ch, 3, padding=1))

    def forward(self, enc_feat, dec_feat, w=1.0):
        enc_feat = self.encode_enc(torch.cat([enc_feat, dec_feat], dim=1))
        return dec_feat + w * (dec_feat * self.scale(enc_feat) + self.shift(enc_feat))


class TorchTransformerSALayer(nn.Module):
    """(ref:codeformer_arch.py:99-134): pre-LN, pos added to q/k only."""

    def __init__(self, dim, nhead, dim_mlp):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(dim, nhead, dropout=0.0)
        self.linear1 = nn.Linear(dim, dim_mlp)
        self.linear2 = nn.Linear(dim_mlp, dim)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)

    def forward(self, tgt, query_pos):
        t2 = self.norm1(tgt)
        q = k = t2 + query_pos
        t2 = self.self_attn(q, k, value=t2)[0]
        tgt = tgt + t2
        t2 = self.norm2(tgt)
        tgt = tgt + self.linear2(F.gelu(self.linear1(t2)))
        return tgt


class TorchCodeFormer(nn.Module):
    """(ref:codeformer_arch.py:160-279) at parameterized nf/dims."""

    FUSE_ENCODER = {"512": 2, "256": 5, "128": 8, "64": 11, "32": 14, "16": 18}
    FUSE_GENERATOR = {"16": 6, "32": 9, "64": 12, "128": 15, "256": 18, "512": 21}
    CHANNEL_MULT = {"16": 8, "32": 4, "64": 4, "128": 2, "256": 2, "512": 1}

    def __init__(self, img_size=512, nf=2, ch_mult=(1, 2, 2, 4, 4, 8),
                 emb_dim=8, codebook_size=16, dim_embd=16, n_head=2,
                 n_layers=2, connect_list=("32", "64", "128", "256")):
        super().__init__()
        self.connect_list = connect_list
        self.emb_dim = emb_dim
        self.latent_hw = img_size // 2 ** (len(ch_mult) - 1)
        self.encoder = _Blocks(_vq_encoder_blocks(
            3, nf, emb_dim, ch_mult, 2, img_size, (self.latent_hw,)))
        self.generator = _Blocks(_vq_generator_blocks(
            nf, emb_dim, ch_mult, 2, img_size, (self.latent_hw,)))

        class _Quant(nn.Module):
            def __init__(self):
                super().__init__()
                self.embedding = nn.Embedding(codebook_size, emb_dim)

        self.quantize = _Quant()
        self.position_emb = nn.Parameter(torch.zeros(self.latent_hw ** 2, dim_embd))
        self.feat_emb = nn.Linear(emb_dim, dim_embd)
        self.ft_layers = nn.Sequential(*[
            TorchTransformerSALayer(dim_embd, n_head, dim_embd * 2)
            for _ in range(n_layers)])
        self.idx_pred_layer = nn.Sequential(
            nn.LayerNorm(dim_embd), nn.Linear(dim_embd, codebook_size, bias=False))
        self.fuse_convs_dict = nn.ModuleDict({
            f: TorchFuseSft(nf * self.CHANNEL_MULT[f]) for f in connect_list})

    def forward(self, x, w=0.0):
        enc_feat = {}
        out_list = [self.FUSE_ENCODER[f] for f in self.connect_list]
        for i, blk in enumerate(self.encoder.blocks):
            x = blk(x)
            if i in out_list:
                enc_feat[str(x.shape[-1])] = x.clone()
        lq_feat = x
        b = x.shape[0]
        pos = self.position_emb.unsqueeze(1).repeat(1, b, 1)
        q = self.feat_emb(lq_feat.flatten(2).permute(2, 0, 1))
        for layer in self.ft_layers:
            q = layer(q, query_pos=pos)
        logits = self.idx_pred_layer(q).permute(1, 0, 2)  # b (hw) n

        soft = F.softmax(logits, dim=2)
        _, top = torch.topk(soft, 1, dim=2)
        emb = self.quantize.embedding.weight
        quant = emb[top.squeeze(-1)].reshape(
            b, self.latent_hw, self.latent_hw, self.emb_dim
        ).permute(0, 3, 1, 2).detach()

        x = quant
        fuse_list = [self.FUSE_GENERATOR[f] for f in self.connect_list]
        for i, blk in enumerate(self.generator.blocks):
            x = blk(x)
            if i in fuse_list and w > 0:
                f_size = str(x.shape[-1])
                x = self.fuse_convs_dict[f_size](enc_feat[f_size].detach(), x, w)
        return x, logits, lq_feat


class TorchSyncNetS(nn.Module):
    """The classic SyncNet scorer S (ref:eval/syncnet/syncnet.py:18-113) —
    exact Sequential indices so state_dict keys match convert_syncnet_s."""

    def __init__(self, fc_dim=1024):
        super().__init__()
        self.netcnnaud = nn.Sequential(
            nn.Conv2d(1, 64, 3, 1, 1), nn.BatchNorm2d(64), nn.ReLU(True),
            nn.MaxPool2d((1, 1), (1, 1)),
            nn.Conv2d(64, 192, 3, 1, 1), nn.BatchNorm2d(192), nn.ReLU(True),
            nn.MaxPool2d((3, 3), (1, 2)),
            nn.Conv2d(192, 384, 3, padding=1), nn.BatchNorm2d(384), nn.ReLU(True),
            nn.Conv2d(384, 256, 3, padding=1), nn.BatchNorm2d(256), nn.ReLU(True),
            nn.Conv2d(256, 256, 3, padding=1), nn.BatchNorm2d(256), nn.ReLU(True),
            nn.MaxPool2d((3, 3), (2, 2)),
            nn.Conv2d(256, 512, (5, 4), padding=0), nn.BatchNorm2d(512), nn.ReLU(),
        )
        self.netfcaud = nn.Sequential(
            nn.Linear(512, 512), nn.BatchNorm1d(512), nn.ReLU(),
            nn.Linear(512, fc_dim))
        self.netfclip = nn.Sequential(
            nn.Linear(512, 512), nn.BatchNorm1d(512), nn.ReLU(),
            nn.Linear(512, fc_dim))
        self.netcnnlip = nn.Sequential(
            nn.Conv3d(3, 96, (5, 7, 7), (1, 2, 2), 0), nn.BatchNorm3d(96),
            nn.ReLU(True), nn.MaxPool3d((1, 3, 3), (1, 2, 2)),
            nn.Conv3d(96, 256, (1, 5, 5), (1, 2, 2), (0, 1, 1)),
            nn.BatchNorm3d(256), nn.ReLU(True),
            nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
            nn.Conv3d(256, 256, (1, 3, 3), padding=(0, 1, 1)),
            nn.BatchNorm3d(256), nn.ReLU(True),
            nn.Conv3d(256, 256, (1, 3, 3), padding=(0, 1, 1)),
            nn.BatchNorm3d(256), nn.ReLU(True),
            nn.Conv3d(256, 256, (1, 3, 3), padding=(0, 1, 1)),
            nn.BatchNorm3d(256), nn.ReLU(True),
            nn.MaxPool3d((1, 3, 3), (1, 2, 2)),
            nn.Conv3d(256, 512, (1, 6, 6), padding=0), nn.BatchNorm3d(512),
            nn.ReLU(True),
        )

    def forward_aud(self, x):
        mid = self.netcnnaud(x)
        return self.netfcaud(mid.reshape(mid.shape[0], -1))

    def forward_lip(self, x):
        mid = self.netcnnlip(x)
        return self.netfclip(mid.reshape(mid.shape[0], -1))


class TorchS3FD(nn.Module):
    """(ref:eval/detectors/s3fd/nets.py:28-120) — exact ModuleList
    indices; returns per-scale raw (conf, loc) conv outputs."""

    def __init__(self):
        super().__init__()
        R = lambda: nn.ReLU(inplace=True)
        self.vgg = nn.ModuleList([
            nn.Conv2d(3, 64, 3, 1, padding=1), R(),
            nn.Conv2d(64, 64, 3, 1, padding=1), R(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(64, 128, 3, 1, padding=1), R(),
            nn.Conv2d(128, 128, 3, 1, padding=1), R(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(128, 256, 3, 1, padding=1), R(),
            nn.Conv2d(256, 256, 3, 1, padding=1), R(),
            nn.Conv2d(256, 256, 3, 1, padding=1), R(),
            nn.MaxPool2d(2, 2, ceil_mode=True),
            nn.Conv2d(256, 512, 3, 1, padding=1), R(),
            nn.Conv2d(512, 512, 3, 1, padding=1), R(),
            nn.Conv2d(512, 512, 3, 1, padding=1), R(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(512, 512, 3, 1, padding=1), R(),
            nn.Conv2d(512, 512, 3, 1, padding=1), R(),
            nn.Conv2d(512, 512, 3, 1, padding=1), R(),
            nn.MaxPool2d(2, 2),
            nn.Conv2d(512, 1024, 3, 1, padding=6, dilation=6), R(),
            nn.Conv2d(1024, 1024, 1, 1), R(),
        ])

        class _L2(nn.Module):
            def __init__(self, c, scale):
                super().__init__()
                self.weight = nn.Parameter(torch.full((c,), float(scale)))

            def forward(self, x):
                norm = x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10
                return self.weight[None, :, None, None] * x / norm

        self.L2Norm3_3 = _L2(256, 10)
        self.L2Norm4_3 = _L2(512, 8)
        self.L2Norm5_3 = _L2(512, 5)
        self.extras = nn.ModuleList([
            nn.Conv2d(1024, 256, 1, 1),
            nn.Conv2d(256, 512, 3, 2, padding=1),
            nn.Conv2d(512, 128, 1, 1),
            nn.Conv2d(128, 256, 3, 2, padding=1),
        ])
        self.loc = nn.ModuleList([
            nn.Conv2d(c, 4, 3, 1, padding=1)
            for c in (256, 512, 512, 1024, 512, 256)])
        self.conf = nn.ModuleList([
            nn.Conv2d(c, n, 3, 1, padding=1)
            for c, n in ((256, 4), (512, 2), (512, 2), (1024, 2),
                         (512, 2), (256, 2))])

    def forward(self, x):
        sources = []
        for k in range(16):
            x = self.vgg[k](x)
        sources.append(self.L2Norm3_3(x))
        for k in range(16, 23):
            x = self.vgg[k](x)
        sources.append(self.L2Norm4_3(x))
        for k in range(23, 30):
            x = self.vgg[k](x)
        sources.append(self.L2Norm5_3(x))
        for k in range(30, len(self.vgg)):
            x = self.vgg[k](x)
        sources.append(x)
        for i, ex in enumerate(self.extras):
            x = F.relu(ex(x), inplace=True)
            if i % 2 == 1:
                sources.append(x)
        return ([c(s) for c, s in zip(self.conf, sources)],
                [l(s) for l, s in zip(self.loc, sources)])


class TorchRRDBNet(nn.Module):
    """(ref:basicsr/archs/rrdbnet_arch.py) at parameterized size."""

    def __init__(self, num_feat=16, num_block=2, num_grow_ch=8, scale=2):
        super().__init__()
        self.scale = scale

        class RDB(nn.Module):
            def __init__(self):
                super().__init__()
                nf, gc = num_feat, num_grow_ch
                self.conv1 = nn.Conv2d(nf, gc, 3, 1, 1)
                self.conv2 = nn.Conv2d(nf + gc, gc, 3, 1, 1)
                self.conv3 = nn.Conv2d(nf + 2 * gc, gc, 3, 1, 1)
                self.conv4 = nn.Conv2d(nf + 3 * gc, gc, 3, 1, 1)
                self.conv5 = nn.Conv2d(nf + 4 * gc, nf, 3, 1, 1)

            def forward(self, x):
                l = lambda t: F.leaky_relu(t, 0.2)
                x1 = l(self.conv1(x))
                x2 = l(self.conv2(torch.cat((x, x1), 1)))
                x3 = l(self.conv3(torch.cat((x, x1, x2), 1)))
                x4 = l(self.conv4(torch.cat((x, x1, x2, x3), 1)))
                x5 = self.conv5(torch.cat((x, x1, x2, x3, x4), 1))
                return x5 * 0.2 + x

        class RRDB_(nn.Module):
            def __init__(self):
                super().__init__()
                self.rdb1, self.rdb2, self.rdb3 = RDB(), RDB(), RDB()

            def forward(self, x):
                return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x

        cin = 3 * (4 if scale == 2 else 16 if scale == 1 else 1)
        self.conv_first = nn.Conv2d(cin, num_feat, 3, 1, 1)
        self.body = nn.Sequential(*[RRDB_() for _ in range(num_block)])
        self.conv_body = nn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_up1 = nn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_up2 = nn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_hr = nn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_last = nn.Conv2d(num_feat, 3, 3, 1, 1)

    def forward(self, x):
        if self.scale == 2:
            x = F.pixel_unshuffle(x, 2)
        elif self.scale == 1:
            x = F.pixel_unshuffle(x, 4)
        feat = self.conv_first(x)
        feat = feat + self.conv_body(self.body(feat))
        l = lambda t: F.leaky_relu(t, 0.2)
        feat = l(self.conv_up1(F.interpolate(feat, scale_factor=2, mode="nearest")))
        feat = l(self.conv_up2(F.interpolate(feat, scale_factor=2, mode="nearest")))
        return self.conv_last(l(self.conv_hr(feat)))


class TorchIRBlock(nn.Module):
    """(ref:basicsr/archs/arcface_arch.py:56-101)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None, use_se=False):
        super().__init__()
        self.bn0 = nn.BatchNorm2d(inplanes)
        self.conv1 = nn.Conv2d(inplanes, inplanes, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(inplanes)
        self.prelu = nn.PReLU()
        self.conv2 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.use_se = use_se

    def forward(self, x):
        residual = x
        out = self.prelu(self.bn1(self.conv1(self.bn0(x))))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.prelu(out + residual)


class TorchResNetArcFace(nn.Module):
    """(ref:basicsr/archs/arcface_arch.py:170-244), IRBlock, no SE."""

    def __init__(self, layers=(2, 2, 2, 2), feat_hw=8):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(1, 64, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.prelu = nn.PReLU()
        self.maxpool = nn.MaxPool2d(2, 2)
        self.layer1 = self._make(64, layers[0], 1)
        self.layer2 = self._make(128, layers[1], 2)
        self.layer3 = self._make(256, layers[2], 2)
        self.layer4 = self._make(512, layers[3], 2)
        self.bn4 = nn.BatchNorm2d(512)
        self.fc5 = nn.Linear(512 * feat_hw * feat_hw, 512)
        self.bn5 = nn.BatchNorm1d(512)

    def _make(self, planes, n, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))
        blocks = [TorchIRBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        for _ in range(1, n):
            blocks.append(TorchIRBlock(self.inplanes, planes))
        return nn.Sequential(*blocks)

    def forward(self, x):
        x = self.maxpool(self.prelu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.bn4(x)
        x = x.reshape(x.size(0), -1)
        return self.bn5(self.fc5(x))


def _rf_conv_bn(inp, oup, stride=1, leaky=0.0):
    return nn.Sequential(
        nn.Conv2d(inp, oup, 3, stride, 1, bias=False), nn.BatchNorm2d(oup),
        nn.LeakyReLU(leaky, inplace=True))


def _rf_conv_bn1x1(inp, oup, stride=1, leaky=0.0):
    return nn.Sequential(
        nn.Conv2d(inp, oup, 1, stride, 0, bias=False), nn.BatchNorm2d(oup),
        nn.LeakyReLU(leaky, inplace=True))


def _rf_conv_bn_no_relu(inp, oup, stride=1):
    return nn.Sequential(
        nn.Conv2d(inp, oup, 3, stride, 1, bias=False), nn.BatchNorm2d(oup))


def _rf_conv_dw(inp, oup, stride, leaky=0.1):
    return nn.Sequential(
        nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
        nn.BatchNorm2d(inp), nn.LeakyReLU(leaky, inplace=True),
        nn.Conv2d(inp, oup, 1, 1, 0, bias=False),
        nn.BatchNorm2d(oup), nn.LeakyReLU(leaky, inplace=True))


class TorchRetinaFaceMobile(nn.Module):
    """MobileNet0.25 RetinaFace (ref:facelib/detection/retinaface/
    retinaface_net.py + retinaface.py assembly) — exact key layout."""

    class _Body(nn.Module):
        def __init__(self):
            super().__init__()
            self.stage1 = nn.Sequential(
                _rf_conv_bn(3, 8, 2, leaky=0.1), _rf_conv_dw(8, 16, 1),
                _rf_conv_dw(16, 32, 2), _rf_conv_dw(32, 32, 1),
                _rf_conv_dw(32, 64, 2), _rf_conv_dw(64, 64, 1))
            self.stage2 = nn.Sequential(
                _rf_conv_dw(64, 128, 2), *[_rf_conv_dw(128, 128, 1)
                                           for _ in range(5)])
            self.stage3 = nn.Sequential(
                _rf_conv_dw(128, 256, 2), _rf_conv_dw(256, 256, 1))

    class _SSH(nn.Module):
        def __init__(self, cin, cout, leaky=0.1):
            super().__init__()
            self.conv3X3 = _rf_conv_bn_no_relu(cin, cout // 2)
            self.conv5X5_1 = _rf_conv_bn(cin, cout // 4, leaky=leaky)
            self.conv5X5_2 = _rf_conv_bn_no_relu(cout // 4, cout // 4)
            self.conv7X7_2 = _rf_conv_bn(cout // 4, cout // 4, leaky=leaky)
            self.conv7x7_3 = _rf_conv_bn_no_relu(cout // 4, cout // 4)

        def forward(self, x):
            c3 = self.conv3X3(x)
            c5_1 = self.conv5X5_1(x)
            c5 = self.conv5X5_2(c5_1)
            c7 = self.conv7x7_3(self.conv7X7_2(c5_1))
            return F.relu(torch.cat([c3, c5, c7], dim=1))

    class _FPN(nn.Module):
        def __init__(self, chans, out, leaky=0.1):
            super().__init__()
            self.output1 = _rf_conv_bn1x1(chans[0], out, leaky=leaky)
            self.output2 = _rf_conv_bn1x1(chans[1], out, leaky=leaky)
            self.output3 = _rf_conv_bn1x1(chans[2], out, leaky=leaky)
            self.merge1 = _rf_conv_bn(out, out, leaky=leaky)
            self.merge2 = _rf_conv_bn(out, out, leaky=leaky)

        def forward(self, c1, c2, c3):
            o1, o2, o3 = self.output1(c1), self.output2(c2), self.output3(c3)
            o2 = self.merge2(o2 + F.interpolate(
                o3, size=o2.shape[2:], mode="nearest"))
            o1 = self.merge1(o1 + F.interpolate(
                o2, size=o1.shape[2:], mode="nearest"))
            return o1, o2, o3

    def __init__(self, out_channel=64):
        super().__init__()
        self.body = self._Body()
        self.fpn = self._FPN((64, 128, 256), out_channel)
        self.ssh1 = self._SSH(out_channel, out_channel)
        self.ssh2 = self._SSH(out_channel, out_channel)
        self.ssh3 = self._SSH(out_channel, out_channel)
        self.ClassHead = nn.ModuleList()
        self.BboxHead = nn.ModuleList()
        self.LandmarkHead = nn.ModuleList()
        for _ in range(3):
            for lst, n in ((self.ClassHead, 4), (self.BboxHead, 8),
                           (self.LandmarkHead, 20)):
                m = nn.Module()
                m.conv1x1 = nn.Conv2d(out_channel, n, 1)
                lst.append(m)

    def forward(self, x):
        c1 = self.body.stage1(x)
        c2 = self.body.stage2(c1)
        c3 = self.body.stage3(c2)
        p1, p2, p3 = self.fpn(c1, c2, c3)
        feats = [self.ssh1(p1), self.ssh2(p2), self.ssh3(p3)]
        return [(self.ClassHead[i].conv1x1(f), self.BboxHead[i].conv1x1(f),
                 self.LandmarkHead[i].conv1x1(f))
                for i, f in enumerate(feats)]


class TorchRetinaFaceResNet50(nn.Module):
    """ResNet50 RetinaFace (ref:facelib/detection/retinaface/
    retinaface.py:69-113: torchvision resnet50 via
    IntermediateLayerGetter(layer2/3/4), FPN in (512,1024,2048)→256,
    SSH 256, 2-anchor heads; leaky=0 at 256 channels) — exact
    state_dict key layout of detection_Resnet50_Final.pth."""

    class _Body(nn.Module):
        """torchvision resnet50 backbone up to layer4 (exact naming)."""

        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make(64, 3, 1)
            self.layer2 = self._make(128, 4, 2)
            self.layer3 = self._make(256, 6, 2)
            self.layer4 = self._make(512, 3, 2)

        def _make(self, planes, n, stride):
            down = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))
            blocks = [_IQABottleneck(self.inplanes, planes, stride, down)]
            self.inplanes = planes * 4
            for _ in range(1, n):
                blocks.append(_IQABottleneck(self.inplanes, planes))
            return nn.Sequential(*blocks)

        def forward(self, x):
            x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
            c2 = self.layer2(self.layer1(x))
            c3 = self.layer3(c2)
            c4 = self.layer4(c3)
            return c2, c3, c4

    def __init__(self, out_channel=256):
        super().__init__()
        self.body = self._Body()
        self.fpn = TorchRetinaFaceMobile._FPN((512, 1024, 2048),
                                              out_channel, leaky=0.0)
        self.ssh1 = TorchRetinaFaceMobile._SSH(out_channel, out_channel,
                                               leaky=0.0)
        self.ssh2 = TorchRetinaFaceMobile._SSH(out_channel, out_channel,
                                               leaky=0.0)
        self.ssh3 = TorchRetinaFaceMobile._SSH(out_channel, out_channel,
                                               leaky=0.0)
        self.ClassHead = nn.ModuleList()
        self.BboxHead = nn.ModuleList()
        self.LandmarkHead = nn.ModuleList()
        for _ in range(3):
            for lst, n in ((self.ClassHead, 4), (self.BboxHead, 8),
                           (self.LandmarkHead, 20)):
                m = nn.Module()
                m.conv1x1 = nn.Conv2d(out_channel, n, 1)
                lst.append(m)

    def forward(self, x):
        c1, c2, c3 = self.body(x)
        p1, p2, p3 = self.fpn(c1, c2, c3)
        feats = [self.ssh1(p1), self.ssh2(p2), self.ssh3(p3)]
        return [(self.ClassHead[i].conv1x1(f), self.BboxHead[i].conv1x1(f),
                 self.LandmarkHead[i].conv1x1(f))
                for i, f in enumerate(feats)]


class _PNConvLayer(nn.Module):
    """(ref:facelib/parsing/parsenet.py:74-111)."""

    def __init__(self, cin, cout, scale="none", norm="none", relu="none"):
        super().__init__()
        bias = norm != "bn"
        self.scale, self.relu_type = scale, relu
        self.reflection_pad = nn.ReflectionPad2d(1)
        self.conv2d = nn.Conv2d(cin, cout, 3, 2 if scale == "down" else 1,
                                bias=bias)

        class _Norm(nn.Module):
            def __init__(self):
                super().__init__()
                self.norm = (nn.BatchNorm2d(cout) if norm == "bn"
                             else nn.Identity())

            def forward(self, x):
                return self.norm(x)

        self.norm = _Norm()

    def forward(self, x):
        if self.scale == "up":
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = self.conv2d(self.reflection_pad(x))
        x = self.norm(x)
        if self.relu_type == "leakyrelu":
            x = F.leaky_relu(x, 0.2)
        return x


class _PNResidual(nn.Module):
    def __init__(self, cin, cout, scale="none"):
        super().__init__()
        if scale == "none" and cin == cout:
            self.shortcut_func = nn.Identity()
        else:
            self.shortcut_func = _PNConvLayer(cin, cout, scale)
        conf = {"down": ("none", "down"), "up": ("up", "none"),
                "none": ("none", "none")}[scale]
        self.conv1 = _PNConvLayer(cin, cout, conf[0], "bn", "leakyrelu")
        self.conv2 = _PNConvLayer(cout, cout, conf[1], "bn", "none")

    def forward(self, x):
        return self.shortcut_func(x) + self.conv2(self.conv1(x))


class TorchParseNet(nn.Module):
    """(ref:facelib/parsing/parsenet.py:140-193)."""

    def __init__(self, in_size=512, out_size=512, min_feat=32, base=64,
                 parsing_ch=19, res_depth=10, ch_range=(32, 256)):
        super().__init__()
        import math as _m

        lo, hi = ch_range
        clip = lambda c: max(lo, min(c, hi))
        downs = int(_m.log2(in_size // min(in_size, min_feat)))
        ups = int(_m.log2(out_size // min(in_size, min_feat)))
        enc = [_PNConvLayer(3, base)]
        head = base
        for _ in range(downs):
            enc.append(_PNResidual(clip(head), clip(head * 2), "down"))
            head *= 2
        self.encoder = nn.Sequential(*enc)
        self.body = nn.Sequential(*[
            _PNResidual(clip(head), clip(head)) for _ in range(res_depth)])
        dec = []
        for _ in range(ups):
            dec.append(_PNResidual(clip(head), clip(head // 2), "up"))
            head //= 2
        self.decoder = nn.Sequential(*dec)
        self.out_img_conv = _PNConvLayer(clip(head), 3)
        self.out_mask_conv = _PNConvLayer(clip(head), parsing_ch)

    def forward(self, x):
        feat = self.encoder(x)
        x = feat + self.body(feat)
        x = self.decoder(x)
        return self.out_mask_conv(x), self.out_img_conv(x)


class _IQABottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return F.relu(h + r)


class TorchHyperIQA(nn.Module):
    """HyperNet + TargetNet fused forward (ref:eval/hyper_iqa.py:19-121,
    123-156, 220-330) at the released operating point
    (16, 112, 224, 112, 56, 28, 14, 7)."""

    def __init__(self):
        super().__init__()

        class _Res(nn.Module):
            def __init__(self):
                super().__init__()
                self.inplanes = 64
                self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = nn.BatchNorm2d(64)
                self.maxpool = nn.MaxPool2d(3, 2, 1)
                self.layer1 = self._make(64, 3, 1)
                self.layer2 = self._make(128, 4, 2)
                self.layer3 = self._make(256, 6, 2)
                self.layer4 = self._make(512, 3, 2)
                self.lda1_pool = nn.Sequential(
                    nn.Conv2d(256, 16, 1, bias=False), nn.AvgPool2d(7, 7))
                self.lda1_fc = nn.Linear(16 * 64, 16)
                self.lda2_pool = nn.Sequential(
                    nn.Conv2d(512, 32, 1, bias=False), nn.AvgPool2d(7, 7))
                self.lda2_fc = nn.Linear(32 * 16, 16)
                self.lda3_pool = nn.Sequential(
                    nn.Conv2d(1024, 64, 1, bias=False), nn.AvgPool2d(7, 7))
                self.lda3_fc = nn.Linear(64 * 4, 16)
                self.lda4_pool = nn.AvgPool2d(7, 7)
                self.lda4_fc = nn.Linear(2048, 224 - 48)

            def _make(self, planes, n, stride):
                down = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(planes * 4))
                blocks = [_IQABottleneck(self.inplanes, planes, stride, down)]
                self.inplanes = planes * 4
                for _ in range(1, n):
                    blocks.append(_IQABottleneck(self.inplanes, planes))
                return nn.Sequential(*blocks)

            def forward(self, x):
                x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
                x = self.layer1(x)
                l1 = self.lda1_fc(self.lda1_pool(x).reshape(x.size(0), -1))
                x = self.layer2(x)
                l2 = self.lda2_fc(self.lda2_pool(x).reshape(x.size(0), -1))
                x = self.layer3(x)
                l3 = self.lda3_fc(self.lda3_pool(x).reshape(x.size(0), -1))
                x = self.layer4(x)
                l4 = self.lda4_fc(self.lda4_pool(x).reshape(x.size(0), -1))
                return x, torch.cat((l1, l2, l3, l4), 1)

        self.res = _Res()
        self.pool = nn.AdaptiveAvgPool2d((1, 1))
        self.conv1 = nn.Sequential(
            nn.Conv2d(2048, 1024, 1), nn.ReLU(inplace=True),
            nn.Conv2d(1024, 512, 1), nn.ReLU(inplace=True),
            nn.Conv2d(512, 112, 1), nn.ReLU(inplace=True))
        self.fc1w_conv = nn.Conv2d(112, 224 * 112 // 49, 3, padding=1)
        self.fc1b_fc = nn.Linear(112, 112)
        self.fc2w_conv = nn.Conv2d(112, 112 * 56 // 49, 3, padding=1)
        self.fc2b_fc = nn.Linear(112, 56)
        self.fc3w_conv = nn.Conv2d(112, 56 * 28 // 49, 3, padding=1)
        self.fc3b_fc = nn.Linear(112, 28)
        self.fc4w_conv = nn.Conv2d(112, 28 * 14 // 49, 3, padding=1)
        self.fc4b_fc = nn.Linear(112, 14)
        self.fc5w_fc = nn.Linear(112, 14)
        self.fc5b_fc = nn.Linear(112, 1)

    def forward(self, img):
        c5, vec = self.res(img)
        hfeat = self.conv1(c5)  # (B, 112, 7, 7)
        pooled = self.pool(hfeat).squeeze(-1).squeeze(-1)
        b = img.shape[0]
        dims = [224, 112, 56, 28, 14]
        v = vec
        for i, wc in enumerate((self.fc1w_conv, self.fc2w_conv,
                                self.fc3w_conv, self.fc4w_conv)):
            w = wc(hfeat).reshape(b, dims[i + 1], dims[i])
            bias = getattr(self, f"fc{i + 1}b_fc")(pooled)
            v = torch.sigmoid(torch.einsum("boi,bi->bo", w, v) + bias)
        w5 = self.fc5w_fc(pooled)
        b5 = self.fc5b_fc(pooled)
        return (w5 * v).sum(-1, keepdim=True) + b5


class TorchVideoMAEBlock(nn.Module):
    """(ref:videomaev2_finetune.py:156-214, 261-322): qkv bias-free
    Linear + separate q_bias/v_bias (k bias pinned to zero)."""

    def __init__(self, dim, heads, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)

        class _Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(dim, dim * 3, bias=False)
                self.q_bias = nn.Parameter(torch.zeros(dim))
                self.v_bias = nn.Parameter(torch.zeros(dim))
                self.proj = nn.Linear(dim, dim)
                self.heads = heads

            def forward(self, x):
                b, n, c = x.shape
                bias = torch.cat([self.q_bias,
                                  torch.zeros_like(self.v_bias), self.v_bias])
                qkv = F.linear(x, self.qkv.weight, bias)
                qkv = qkv.reshape(b, n, 3, self.heads, c // self.heads)
                qkv = qkv.permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                o = F.scaled_dot_product_attention(q, k, v)
                o = o.transpose(1, 2).reshape(b, n, c)
                return self.proj(o)

        self.attn = _Attn()

        class _Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                hidden = int(dim * mlp_ratio)
                self.fc1 = nn.Linear(dim, hidden)
                self.fc2 = nn.Linear(hidden, dim)

            def forward(self, x):
                return self.fc2(F.gelu(self.fc1(x)))

        self.mlp = _Mlp()

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TorchVideoMAE(nn.Module):
    """Mean-pooling finetune VisionTransformer
    (ref:videomaev2_finetune.py:372-528) with sinusoid positions."""

    def __init__(self, img=32, frames=4, patch=16, tubelet=2, dim=64,
                 depth=2, heads=4, mlp_ratio=4.0):
        super().__init__()

        class _Patch(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv3d(3, dim, (tubelet, patch, patch),
                                      (tubelet, patch, patch))

        self.patch_embed = _Patch()
        n = (frames // tubelet) * (img // patch) ** 2
        pos = np.zeros((n, dim), np.float32)
        p = np.arange(n)[:, None]
        i = np.arange(dim)[None, :]
        ang = p / np.power(10000, 2 * (i // 2) / dim)
        pos[:, 0::2] = np.sin(ang[:, 0::2])
        pos[:, 1::2] = np.cos(ang[:, 1::2])
        self.register_buffer("pos_embed", torch.from_numpy(pos)[None])
        self.blocks = nn.ModuleList([
            TorchVideoMAEBlock(dim, heads, mlp_ratio) for _ in range(depth)])
        self.fc_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward_features(self, x):
        x = self.patch_embed.proj(x)          # (B, C, t, h, w)
        b, c = x.shape[:2]
        x = x.flatten(2).transpose(1, 2)      # (B, N, C)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.fc_norm(x.mean(1))


class _W2LConv(nn.Module):
    """(ref:latentsync/models/wav2lip_syncnet.py:71-90)."""

    def __init__(self, cin, cout, k, s, p, residual=False, act="leaky"):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.Conv2d(cin, cout, k, s, p), nn.BatchNorm2d(cout))
        self.residual = residual
        self.act = act

    def forward(self, x):
        out = self.conv_block(x)
        if self.residual:
            out = out + x
        return {"relu": F.relu, "leaky": lambda t: F.leaky_relu(t, 0.2),
                "silu": F.silu, "tanh": torch.tanh}[self.act](out)


class TorchWav2LipSyncNet(nn.Module):
    """(ref:latentsync/models/wav2lip_syncnet.py:8-69): act_fn defaults
    to leaky (LeakyReLU 0.2, the reference default), with explicit relu
    on the final tower blocks exactly as the reference overrides."""

    def __init__(self):
        super().__init__()
        self.visual_encoder = nn.Sequential(
            _W2LConv(15, 32, 7, 1, 3), _W2LConv(32, 64, 5, (1, 2), 1),
            _W2LConv(64, 64, 3, 1, 1, True), _W2LConv(64, 64, 3, 1, 1, True),
            _W2LConv(64, 128, 3, 2, 1),
            _W2LConv(128, 128, 3, 1, 1, True), _W2LConv(128, 128, 3, 1, 1, True),
            _W2LConv(128, 128, 3, 1, 1, True),
            _W2LConv(128, 256, 3, 3, 1),
            _W2LConv(256, 256, 3, 1, 1, True), _W2LConv(256, 256, 3, 1, 1, True),
            _W2LConv(256, 512, 3, 2, 1),
            _W2LConv(512, 512, 3, 1, 1, True), _W2LConv(512, 512, 3, 1, 1, True),
            _W2LConv(512, 1024, 3, 2, 1),
            _W2LConv(1024, 1024, 3, 1, 1, True), _W2LConv(1024, 1024, 3, 1, 1, True),
            _W2LConv(1024, 1024, 3, 2, 1, act="relu"),
            _W2LConv(1024, 1024, 3, 1, 0, act="relu"),
            _W2LConv(1024, 1024, 1, 1, 0, act="relu"),
        )
        self.audio_encoder = nn.Sequential(
            _W2LConv(1, 32, 3, 1, 1),
            _W2LConv(32, 32, 3, 1, 1, True), _W2LConv(32, 32, 3, 1, 1, True),
            _W2LConv(32, 64, 3, (3, 1), 1),
            _W2LConv(64, 64, 3, 1, 1, True), _W2LConv(64, 64, 3, 1, 1, True),
            _W2LConv(64, 128, 3, 3, 1),
            _W2LConv(128, 128, 3, 1, 1, True), _W2LConv(128, 128, 3, 1, 1, True),
            _W2LConv(128, 256, 3, (3, 2), 1),
            _W2LConv(256, 256, 3, 1, 1, True), _W2LConv(256, 256, 3, 1, 1, True),
            _W2LConv(256, 512, 3, 1, 1),
            _W2LConv(512, 512, 3, 1, 1, True), _W2LConv(512, 512, 3, 1, 1, True),
            _W2LConv(512, 1024, 3, 1, 0, act="relu"),
            _W2LConv(1024, 1024, 1, 1, 0, act="relu"),
        )

    def forward(self, frames, mels):
        v = self.visual_encoder(frames).reshape(frames.shape[0], -1)
        a = self.audio_encoder(mels).reshape(mels.shape[0], -1)
        return F.normalize(v, p=2, dim=1), F.normalize(a, p=2, dim=1)


class TorchFANConvBlock(nn.Module):
    """face_alignment ConvBlock: bn-relu-conv ×3 with a 3-way concat and
    optional bn-relu-1×1 downsample shortcut."""

    def __init__(self, cin, cout):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, cout // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout // 2)
        self.conv2 = nn.Conv2d(cout // 2, cout // 4, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout // 4)
        self.conv3 = nn.Conv2d(cout // 4, cout // 4, 3, padding=1, bias=False)
        if cin != cout:
            self.downsample = nn.Sequential(
                nn.BatchNorm2d(cin), nn.ReLU(True),
                nn.Conv2d(cin, cout, 1, bias=False))
        else:
            self.downsample = None

    def forward(self, x):
        y1 = self.conv1(F.relu(self.bn1(x)))
        y2 = self.conv2(F.relu(self.bn2(y1)))
        y3 = self.conv3(F.relu(self.bn3(y2)))
        out = torch.cat([y1, y2, y3], dim=1)
        res = x if self.downsample is None else self.downsample(x)
        return out + res


class TorchHourGlass(nn.Module):
    def __init__(self, depth=4, feat=256):
        super().__init__()
        self.depth = depth
        for lvl in range(1, depth + 1):
            setattr(self, f"b1_{lvl}", TorchFANConvBlock(feat, feat))
            setattr(self, f"b2_{lvl}", TorchFANConvBlock(feat, feat))
            setattr(self, f"b3_{lvl}", TorchFANConvBlock(feat, feat))
        self.b2_plus_1 = TorchFANConvBlock(feat, feat)

    def _forward(self, level, x):
        up1 = getattr(self, f"b1_{level}")(x)
        low = F.avg_pool2d(x, 2, 2)
        low = getattr(self, f"b2_{level}")(low)
        if level > 1:
            low = self._forward(level - 1, low)
        else:
            low = self.b2_plus_1(low)
        low = getattr(self, f"b3_{level}")(low)
        up2 = F.interpolate(low, scale_factor=2, mode="nearest")
        return up1 + up2

    def forward(self, x):
        return self._forward(self.depth, x)


class TorchFAN(nn.Module):
    """face_alignment 2DFAN (num_modules stacked hourglasses)."""

    def __init__(self, num_modules=2):
        super().__init__()
        self.num_modules = num_modules
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = TorchFANConvBlock(64, 128)
        self.conv3 = TorchFANConvBlock(128, 128)
        self.conv4 = TorchFANConvBlock(128, 256)
        for i in range(num_modules):
            setattr(self, f"m{i}", TorchHourGlass())
            setattr(self, f"top_m_{i}", TorchFANConvBlock(256, 256))
            setattr(self, f"conv_last{i}", nn.Conv2d(256, 256, 1))
            setattr(self, f"bn_end{i}", nn.BatchNorm2d(256))
            setattr(self, f"l{i}", nn.Conv2d(256, 68, 1))
            if i < num_modules - 1:
                setattr(self, f"bl{i}", nn.Conv2d(256, 256, 1))
                setattr(self, f"al{i}", nn.Conv2d(68, 256, 1))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)), True)
        x = F.avg_pool2d(self.conv2(x), 2, 2)
        x = self.conv4(self.conv3(x))
        outputs = []
        prev = x
        for i in range(self.num_modules):
            hg = getattr(self, f"m{i}")(prev)
            ll = getattr(self, f"top_m_{i}")(hg)
            ll = F.relu(getattr(self, f"bn_end{i}")(
                getattr(self, f"conv_last{i}")(ll)), True)
            heat = getattr(self, f"l{i}")(ll)
            outputs.append(heat)
            if i < self.num_modules - 1:
                prev = prev + getattr(self, f"bl{i}")(ll) + \
                    getattr(self, f"al{i}")(heat)
        return outputs


class _BNConvBNReLU(nn.Module):
    def __init__(self, cin, cout, ks=3, stride=1, padding=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, ks, stride, padding, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _BNBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if cin != cout or stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return F.relu(h + r)


class TorchBiSeNet(nn.Module):
    """(ref:facelib/parsing/bisenet.py + resnet.py): ResNet18 context
    path with ARM attention, FFM fusion, three output heads upsampled
    bilinear align_corners=True."""

    def __init__(self, num_class=19):
        super().__init__()

        class _Res(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = nn.BatchNorm2d(64)
                self.maxpool = nn.MaxPool2d(3, 2, 1)
                self.layer1 = nn.Sequential(_BNBasicBlock(64, 64), _BNBasicBlock(64, 64))
                self.layer2 = nn.Sequential(_BNBasicBlock(64, 128, 2), _BNBasicBlock(128, 128))
                self.layer3 = nn.Sequential(_BNBasicBlock(128, 256, 2), _BNBasicBlock(256, 256))
                self.layer4 = nn.Sequential(_BNBasicBlock(256, 512, 2), _BNBasicBlock(512, 512))

            def forward(self, x):
                x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
                x = self.layer1(x)
                f8 = self.layer2(x)
                f16 = self.layer3(f8)
                f32 = self.layer4(f16)
                return f8, f16, f32

        class _ARM(nn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.conv = _BNConvBNReLU(cin, cout)
                self.conv_atten = nn.Conv2d(cout, cout, 1, bias=False)
                self.bn_atten = nn.BatchNorm2d(cout)

            def forward(self, x):
                feat = self.conv(x)
                a = F.avg_pool2d(feat, feat.shape[2:])
                a = torch.sigmoid(self.bn_atten(self.conv_atten(a)))
                return feat * a

        class _CP(nn.Module):
            def __init__(self):
                super().__init__()
                self.resnet = _Res()
                self.arm16 = _ARM(256, 128)
                self.arm32 = _ARM(512, 128)
                self.conv_head32 = _BNConvBNReLU(128, 128)
                self.conv_head16 = _BNConvBNReLU(128, 128)
                self.conv_avg = _BNConvBNReLU(512, 128, 1, 1, 0)

            def forward(self, x):
                f8, f16, f32 = self.resnet(x)
                avg = self.conv_avg(F.avg_pool2d(f32, f32.shape[2:]))
                avg_up = F.interpolate(avg, f32.shape[2:], mode="nearest")
                f32s = self.arm32(f32) + avg_up
                f32u = self.conv_head32(
                    F.interpolate(f32s, f16.shape[2:], mode="nearest"))
                f16s = self.arm16(f16) + f32u
                f16u = self.conv_head16(
                    F.interpolate(f16s, f8.shape[2:], mode="nearest"))
                return f8, f16u, f32u

        class _FFM(nn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.convblk = _BNConvBNReLU(cin, cout, 1, 1, 0)
                self.conv1 = nn.Conv2d(cout, cout // 4, 1, bias=False)
                self.conv2 = nn.Conv2d(cout // 4, cout, 1, bias=False)

            def forward(self, sp, cp):
                feat = self.convblk(torch.cat([sp, cp], dim=1))
                a = F.avg_pool2d(feat, feat.shape[2:])
                a = torch.sigmoid(self.conv2(F.relu(self.conv1(a))))
                return feat * a + feat

        class _Out(nn.Module):
            def __init__(self, cin, mid, n):
                super().__init__()
                self.conv = _BNConvBNReLU(cin, mid)
                self.conv_out = nn.Conv2d(mid, n, 1, bias=False)

            def forward(self, x):
                feat = self.conv(x)
                return self.conv_out(feat), feat

        self.cp = _CP()
        self.ffm = _FFM(256, 256)
        self.conv_out = _Out(256, 256, num_class)
        self.conv_out16 = _Out(128, 64, num_class)
        self.conv_out32 = _Out(128, 64, num_class)

    def forward(self, x):
        h, w = x.shape[2:]
        f8, cp8, cp16 = self.cp(x)
        fuse = self.ffm(f8, cp8)
        out, _ = self.conv_out(fuse)
        out16, _ = self.conv_out16(cp8)
        out32, _ = self.conv_out32(cp16)
        up = lambda t: F.interpolate(t, (h, w), mode="bilinear",
                                     align_corners=True)
        return up(out), up(out16), up(out32)


class _Y5Conv(nn.Module):
    """(ref:facelib/detection/yolov5face/models/common.py Conv)."""

    def __init__(self, c1, c2, k=1, s=1, g=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class _Y5Stem(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.stem_1 = _Y5Conv(c1, c2, 3, 2)
        self.stem_2a = _Y5Conv(c2, c2 // 2, 1, 1)
        self.stem_2b = _Y5Conv(c2 // 2, c2, 3, 2)
        self.stem_2p = nn.MaxPool2d(2, 2, ceil_mode=True)
        self.stem_3 = _Y5Conv(c2 * 2, c2, 1, 1)

    def forward(self, x):
        s1 = self.stem_1(x)
        return self.stem_3(torch.cat(
            (self.stem_2b(self.stem_2a(s1)), self.stem_2p(s1)), 1))


def _y5_channel_shuffle(x, groups=2):
    b, c, h, w = x.shape
    return (x.view(b, groups, c // groups, h, w).transpose(1, 2)
            .contiguous().view(b, -1, h, w))


class _Y5Shuffle(nn.Module):
    """(ref common.py ShuffleV2Block)."""

    def __init__(self, inp, oup, stride):
        super().__init__()
        self.stride = stride
        bf = oup // 2
        if stride > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                nn.BatchNorm2d(inp),
                nn.Conv2d(inp, bf, 1, bias=False), nn.BatchNorm2d(bf),
                nn.SiLU())
        else:
            self.branch1 = nn.Sequential()
        c2in = inp if stride > 1 else bf
        self.branch2 = nn.Sequential(
            nn.Conv2d(c2in, bf, 1, bias=False), nn.BatchNorm2d(bf), nn.SiLU(),
            nn.Conv2d(bf, bf, 3, stride, 1, groups=bf, bias=False),
            nn.BatchNorm2d(bf),
            nn.Conv2d(bf, bf, 1, bias=False), nn.BatchNorm2d(bf), nn.SiLU())

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), dim=1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
        return _y5_channel_shuffle(out)


class _Y5C3(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        c_ = c2 // 2

        class _B(nn.Module):
            def __init__(self):
                super().__init__()
                self.cv1 = _Y5Conv(c_, c_, 1)
                self.cv2 = _Y5Conv(c_, c_, 3)

            def forward(self, x):
                return self.cv2(self.cv1(x))  # shortcut=False

        self.cv1 = _Y5Conv(c1, c_, 1)
        self.cv2 = _Y5Conv(c1, c_, 1)
        self.cv3 = _Y5Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(_B())

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TorchYOLOv5nFace(nn.Module):
    """yolov5n-face graph + grid/anchor decode
    (ref:facelib/detection/yolov5face/models/yolo.py:53-88)."""

    ANCHORS = [[[4, 5], [8, 10], [13, 16]],
               [[23, 29], [43, 55], [73, 105]],
               [[146, 217], [231, 300], [335, 433]]]
    STRIDES = (8, 16, 32)

    def __init__(self):
        super().__init__()
        m = {}
        m["0"] = _Y5Stem(3, 32)
        m["1"] = _Y5Shuffle(32, 128, 2)
        m["2"] = nn.Sequential(*[_Y5Shuffle(128, 128, 1) for _ in range(3)])
        m["3"] = _Y5Shuffle(128, 256, 2)
        m["4"] = nn.Sequential(*[_Y5Shuffle(256, 256, 1) for _ in range(7)])
        m["5"] = _Y5Shuffle(256, 512, 2)
        m["6"] = nn.Sequential(*[_Y5Shuffle(512, 512, 1) for _ in range(3)])
        m["7"] = _Y5Conv(512, 128, 1)
        m["10"] = _Y5C3(384, 128)
        m["11"] = _Y5Conv(128, 128, 1)
        m["14"] = _Y5C3(256, 128)
        m["15"] = _Y5Conv(128, 128, 3, 2)
        m["17"] = _Y5C3(256, 128)
        m["18"] = _Y5Conv(128, 128, 3, 2)
        m["20"] = _Y5C3(256, 128)

        class _Detect(nn.Module):
            def __init__(self):
                super().__init__()
                self.m = nn.ModuleList(
                    [nn.Conv2d(128, 48, 1) for _ in range(3)])

        m["21"] = _Detect()
        self.model = nn.ModuleDict(m)

    def forward(self, x):
        M = self.model
        y0 = M["0"](x)
        y1 = M["1"](y0)
        y2 = M["2"](y1)
        y3 = M["3"](y2)
        y4 = M["4"](y3)
        y5 = M["5"](y4)
        y6 = M["6"](y5)
        y7 = M["7"](y6)
        y8 = F.interpolate(y7, scale_factor=2, mode="nearest")
        y10 = M["10"](torch.cat([y8, y4], 1))
        y11 = M["11"](y10)
        y12 = F.interpolate(y11, scale_factor=2, mode="nearest")
        y14 = M["14"](torch.cat([y12, y2], 1))
        y15 = M["15"](y14)
        y17 = M["17"](torch.cat([y15, y11], 1))
        y18 = M["18"](y17)
        y20 = M["20"](torch.cat([y18, y7], 1))

        outs = []
        for li, feat in enumerate((y14, y17, y20)):
            p = M["21"].m[li](feat)
            bs, _, ny, nx = p.shape
            p = p.view(bs, 3, 16, ny, nx).permute(0, 1, 3, 4, 2).contiguous()
            stride = float(self.STRIDES[li])
            yv, xv = torch.meshgrid(torch.arange(ny), torch.arange(nx),
                                    indexing="ij")
            grid = torch.stack((xv, yv), 2).view(1, 1, ny, nx, 2).float()
            anchor = torch.tensor(self.ANCHORS[li], dtype=torch.float32
                                  ).view(1, 3, 1, 1, 2)
            xy = (torch.sigmoid(p[..., 0:2]) * 2.0 - 0.5 + grid) * stride
            wh = (torch.sigmoid(p[..., 2:4]) * 2.0) ** 2 * anchor
            conf = torch.sigmoid(p[..., 4:5])
            lmk = p[..., 5:15].view(bs, 3, ny, nx, 5, 2)
            lmk = lmk * anchor.unsqueeze(4) + grid.unsqueeze(4) * stride
            cls = torch.sigmoid(p[..., 15:])
            out = torch.cat([xy, wh, conf,
                             lmk.view(bs, 3, ny, nx, 10), cls], -1)
            # (bs, na, ny, nx, no) → (bs, na·ny·nx, no); our flax flattens
            # (ny, nx, na) — reorder to match
            out = out.permute(0, 2, 3, 1, 4).reshape(bs, -1, 16)
            outs.append(out)
        return torch.cat(outs, 1)


class _Y5C3n(nn.Module):
    """General C3 (ref common.py:106-117): n bottlenecks, optional
    shortcut — the yolov5l graph needs both (the yolov5n oracle above
    only uses n=1/shortcut=False)."""

    def __init__(self, c1, c2, n=1, shortcut=True):
        super().__init__()
        c_ = c2 // 2

        class _B(nn.Module):
            def __init__(self):
                super().__init__()
                self.cv1 = _Y5Conv(c_, c_, 1)
                self.cv2 = _Y5Conv(c_, c_, 3)
                self.shortcut = shortcut

            def forward(self, x):
                h = self.cv2(self.cv1(x))
                return x + h if self.shortcut else h

        self.cv1 = _Y5Conv(c1, c_, 1)
        self.cv2 = _Y5Conv(c1, c_, 1)
        self.cv3 = _Y5Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(*[_B() for _ in range(n)])

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class _Y5SPP(nn.Module):
    """(ref common.py:173-184)."""

    def __init__(self, c1, c2, k=(3, 5, 7)):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = _Y5Conv(c1, c_, 1)
        self.cv2 = _Y5Conv(c_ * (len(k) + 1), c2, 1)
        self.pool_ks = k

    def forward(self, x):
        x = self.cv1(x)
        pools = [F.max_pool2d(x, kk, 1, kk // 2) for kk in self.pool_ks]
        return self.cv2(torch.cat([x] + pools, 1))


class TorchYOLOv5lFace(nn.Module):
    """yolov5l-face graph (ref:models/yolov5l.yaml layer plan) + decode
    — exact `model.{i}` state-dict key layout of yolov5l-face.pth."""

    def __init__(self):
        super().__init__()
        m = {}
        m["0"] = _Y5Stem(3, 64)
        m["1"] = _Y5C3n(64, 128, 3, True)
        m["2"] = _Y5Conv(128, 256, 3, 2)
        m["3"] = _Y5C3n(256, 256, 9, True)
        m["4"] = _Y5Conv(256, 512, 3, 2)
        m["5"] = _Y5C3n(512, 512, 9, True)
        m["6"] = _Y5Conv(512, 1024, 3, 2)
        m["7"] = _Y5SPP(1024, 1024, (3, 5, 7))
        m["8"] = _Y5C3n(1024, 1024, 3, False)
        m["9"] = _Y5Conv(1024, 512, 1)
        m["12"] = _Y5C3n(1024, 512, 3, False)
        m["13"] = _Y5Conv(512, 256, 1)
        m["16"] = _Y5C3n(512, 256, 3, False)
        m["17"] = _Y5Conv(256, 256, 3, 2)
        m["19"] = _Y5C3n(512, 512, 3, False)
        m["20"] = _Y5Conv(512, 512, 3, 2)
        m["22"] = _Y5C3n(1024, 1024, 3, False)

        class _Detect(nn.Module):
            def __init__(self):
                super().__init__()
                self.m = nn.ModuleList(
                    [nn.Conv2d(c, 48, 1) for c in (256, 512, 1024)])

        m["23"] = _Detect()
        self.model = nn.ModuleDict(m)

    def forward(self, x):
        M = self.model
        y1 = M["1"](M["0"](x))
        y3 = M["3"](M["2"](y1))
        y5 = M["5"](M["4"](y3))
        y8 = M["8"](M["7"](M["6"](y5)))
        y9 = M["9"](y8)
        y12 = M["12"](torch.cat(
            [F.interpolate(y9, scale_factor=2, mode="nearest"), y5], 1))
        y13 = M["13"](y12)
        y16 = M["16"](torch.cat(
            [F.interpolate(y13, scale_factor=2, mode="nearest"), y3], 1))
        y19 = M["19"](torch.cat([M["17"](y16), y13], 1))
        y22 = M["22"](torch.cat([M["20"](y19), y9], 1))

        outs = []
        for li, feat in enumerate((y16, y19, y22)):
            p = M["23"].m[li](feat)
            bs, _, ny, nx = p.shape
            p = p.view(bs, 3, 16, ny, nx).permute(0, 1, 3, 4, 2).contiguous()
            stride = float(TorchYOLOv5nFace.STRIDES[li])
            yv, xv = torch.meshgrid(torch.arange(ny), torch.arange(nx),
                                    indexing="ij")
            grid = torch.stack((xv, yv), 2).view(1, 1, ny, nx, 2).float()
            anchor = torch.tensor(TorchYOLOv5nFace.ANCHORS[li],
                                  dtype=torch.float32).view(1, 3, 1, 1, 2)
            xy = (torch.sigmoid(p[..., 0:2]) * 2.0 - 0.5 + grid) * stride
            wh = (torch.sigmoid(p[..., 2:4]) * 2.0) ** 2 * anchor
            conf = torch.sigmoid(p[..., 4:5])
            lmk = p[..., 5:15].view(bs, 3, ny, nx, 5, 2)
            lmk = lmk * anchor.unsqueeze(4) + grid.unsqueeze(4) * stride
            cls = torch.sigmoid(p[..., 15:])
            out = torch.cat([xy, wh, conf,
                             lmk.view(bs, 3, ny, nx, 10), cls], -1)
            out = out.permute(0, 2, 3, 1, 4).reshape(bs, -1, 16)
            outs.append(out)
        return torch.cat(outs, 1)


class TorchWhisperDecMHA(nn.Module):
    """Whisper decoder attention (q/v/out biased, k unbiased), combined
    d^-0.5 scaling applied as d^-0.25 on q and k each."""

    def __init__(self, n_state, n_head):
        super().__init__()
        self.n_head = n_head
        self.query = nn.Linear(n_state, n_state)
        self.key = nn.Linear(n_state, n_state, bias=False)
        self.value = nn.Linear(n_state, n_state)
        self.out = nn.Linear(n_state, n_state)

    def forward(self, x, xa=None, mask=None):
        ctx = x if xa is None else xa
        q, k, v = self.query(x), self.key(ctx), self.value(ctx)
        b, t, c = q.shape
        scale = (c // self.n_head) ** -0.25
        q = q.view(b, t, self.n_head, -1).permute(0, 2, 1, 3) * scale
        k = k.view(b, k.shape[1], self.n_head, -1).permute(0, 2, 3, 1) * scale
        v = v.view(b, v.shape[1], self.n_head, -1).permute(0, 2, 1, 3)
        qk = q @ k
        if mask is not None:
            qk = qk + mask[:t, : k.shape[-1]]
        w = F.softmax(qk.float(), dim=-1).to(q.dtype)
        o = (w @ v).permute(0, 2, 1, 3).flatten(start_dim=2)
        return self.out(o)


class TorchWhisperTextDecoder(nn.Module):
    """(ref:latentsync/whisper/whisper/model.py:176-217): learned
    positions, pre-LN blocks with cross-attention, tied logits."""

    def __init__(self, n_vocab, n_ctx, n_state, n_head, n_layer):
        super().__init__()
        self.token_embedding = nn.Embedding(n_vocab, n_state)
        self.positional_embedding = nn.Parameter(torch.zeros(n_ctx, n_state))

        class Block(nn.Module):
            def __init__(self):
                super().__init__()
                self.attn = TorchWhisperDecMHA(n_state, n_head)
                self.attn_ln = nn.LayerNorm(n_state)
                self.cross_attn = TorchWhisperDecMHA(n_state, n_head)
                self.cross_attn_ln = nn.LayerNorm(n_state)
                self.mlp = nn.Sequential(
                    nn.Linear(n_state, n_state * 4), nn.GELU(),
                    nn.Linear(n_state * 4, n_state))
                self.mlp_ln = nn.LayerNorm(n_state)

            def forward(self, x, xa, mask):
                x = x + self.attn(self.attn_ln(x), mask=mask)
                x = x + self.cross_attn(self.cross_attn_ln(x), xa=xa)
                return x + self.mlp(self.mlp_ln(x))

        self.blocks = nn.ModuleList([Block() for _ in range(n_layer)])
        self.ln = nn.LayerNorm(n_state)
        mask = torch.empty(n_ctx, n_ctx).fill_(float("-inf")).triu_(1)
        self.register_buffer("mask", mask, persistent=False)

    def forward(self, tokens, xa):
        t = tokens.shape[-1]
        x = self.token_embedding(tokens) + self.positional_embedding[:t]
        for blk in self.blocks:
            x = blk(x, xa, self.mask)
        x = self.ln(x)
        return (x @ self.token_embedding.weight.T).float()
