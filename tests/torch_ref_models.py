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
