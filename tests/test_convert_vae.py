"""VAE converter: synthetic diffusers-layout AutoencoderKL state dict →
flax tree bijection (tiny geometry)."""

import numpy as np

import jax
import jax.numpy as jnp

from latentsync_tpu.config import VAEConfig
from latentsync_tpu.models.vae import AutoencoderKL
from latentsync_tpu.utils.convert import convert_vae
from latentsync_tpu.utils.params import fast_init


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def synth_vae_sd(rng, chans=(16, 32), layers=1, latent=4):
    """diffusers AutoencoderKL naming for a tiny geometry."""
    sd = {}

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    def resnet(prefix, cin, cout):
        sd[f"{prefix}.norm1.weight"] = t(cin)
        sd[f"{prefix}.norm1.bias"] = t(cin)
        sd[f"{prefix}.conv1.weight"] = t(cout, cin, 3, 3)
        sd[f"{prefix}.conv1.bias"] = t(cout)
        sd[f"{prefix}.norm2.weight"] = t(cout)
        sd[f"{prefix}.norm2.bias"] = t(cout)
        sd[f"{prefix}.conv2.weight"] = t(cout, cout, 3, 3)
        sd[f"{prefix}.conv2.bias"] = t(cout)
        if cin != cout:
            sd[f"{prefix}.conv_shortcut.weight"] = t(cout, cin, 1, 1)
            sd[f"{prefix}.conv_shortcut.bias"] = t(cout)

    def attn(prefix, c):
        sd[f"{prefix}.group_norm.weight"] = t(c)
        sd[f"{prefix}.group_norm.bias"] = t(c)
        for head in ("to_q", "to_k", "to_v"):
            sd[f"{prefix}.{head}.weight"] = t(c, c)
            sd[f"{prefix}.{head}.bias"] = t(c)
        sd[f"{prefix}.to_out.0.weight"] = t(c, c)
        sd[f"{prefix}.to_out.0.bias"] = t(c)

    # encoder
    sd["encoder.conv_in.weight"] = t(chans[0], 3, 3, 3)
    sd["encoder.conv_in.bias"] = t(chans[0])
    cin = chans[0]
    for i, ch in enumerate(chans):
        for j in range(layers):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin, ch)
            cin = ch
        if i < len(chans) - 1:
            sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = t(ch, ch, 3, 3)
            sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = t(ch)
    resnet("encoder.mid_block.resnets.0", chans[-1], chans[-1])
    attn("encoder.mid_block.attentions.0", chans[-1])
    resnet("encoder.mid_block.resnets.1", chans[-1], chans[-1])
    sd["encoder.conv_norm_out.weight"] = t(chans[-1])
    sd["encoder.conv_norm_out.bias"] = t(chans[-1])
    sd["encoder.conv_out.weight"] = t(2 * latent, chans[-1], 3, 3)
    sd["encoder.conv_out.bias"] = t(2 * latent)
    sd["quant_conv.weight"] = t(2 * latent, 2 * latent, 1, 1)
    sd["quant_conv.bias"] = t(2 * latent)
    # decoder
    rev = tuple(reversed(chans))
    sd["post_quant_conv.weight"] = t(latent, latent, 1, 1)
    sd["post_quant_conv.bias"] = t(latent)
    sd["decoder.conv_in.weight"] = t(rev[0], latent, 3, 3)
    sd["decoder.conv_in.bias"] = t(rev[0])
    resnet("decoder.mid_block.resnets.0", rev[0], rev[0])
    attn("decoder.mid_block.attentions.0", rev[0])
    resnet("decoder.mid_block.resnets.1", rev[0], rev[0])
    cin = rev[0]
    for i, ch in enumerate(rev):
        for j in range(layers + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin, ch)
            cin = ch
        if i < len(rev) - 1:
            sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = t(ch, ch, 3, 3)
            sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = t(ch)
    sd["decoder.conv_norm_out.weight"] = t(rev[-1])
    sd["decoder.conv_norm_out.bias"] = t(rev[-1])
    sd["decoder.conv_out.weight"] = t(3, rev[-1], 3, 3)
    sd["decoder.conv_out.bias"] = t(3)
    return sd


def test_vae_converter_bijection(rng):
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                    norm_num_groups=8)
    model = AutoencoderKL(cfg)
    init = fast_init(
        lambda x: model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1)),
        jnp.zeros((1, 16, 16, 3)),
    )
    sd = synth_vae_sd(rng)
    converted = convert_vae(sd)
    flat_init = flatten(init["params"])
    flat_conv = flatten(converted["params"])
    missing = set(flat_init) - set(flat_conv)
    extra = set(flat_conv) - set(flat_init)
    assert not extra, f"extra: {sorted(extra)[:6]}"
    assert not missing, f"missing: {sorted(missing)[:6]}"
    for k in flat_init:
        assert flat_init[k].shape == np.asarray(flat_conv[k]).shape, k

    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted["params"])},
        jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(0),
    )
    assert out.shape == (1, 16, 16, 3)
