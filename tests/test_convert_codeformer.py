"""CodeFormer converter: synthetic torch-layout state dict for a tiny
geometry must map bijectively onto the flax init tree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentsync_tpu.models.codeformer import (
    CodeFormer,
    encoder_block_specs,
    generator_block_specs,
)
from latentsync_tpu.utils.convert_codeformer import convert_codeformer
from latentsync_tpu.utils.params import fast_init


def synth_stack_keys(prefix, specs, rng, emb_dim):
    """Generate torch keys for one BlockStack following the reference's
    module layout (ref:vqgan_arch.py Encoder/Generator)."""
    sd = {}
    ch_in = 3 if prefix == "encoder" else emb_dim

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    for i, (kind, ch) in enumerate(specs):
        base = f"{prefix}.blocks.{i}"
        if kind in ("conv_in", "conv_out"):
            sd[f"{base}.weight"] = t(ch, ch_in, 3, 3)
            sd[f"{base}.bias"] = t(ch)
            ch_in = ch
        elif kind == "res":
            sd[f"{base}.norm1.weight"] = t(ch_in)
            sd[f"{base}.norm1.bias"] = t(ch_in)
            sd[f"{base}.conv1.weight"] = t(ch, ch_in, 3, 3)
            sd[f"{base}.conv1.bias"] = t(ch)
            sd[f"{base}.norm2.weight"] = t(ch)
            sd[f"{base}.norm2.bias"] = t(ch)
            sd[f"{base}.conv2.weight"] = t(ch, ch, 3, 3)
            sd[f"{base}.conv2.bias"] = t(ch)
            if ch != ch_in:
                sd[f"{base}.conv_out.weight"] = t(ch, ch_in, 1, 1)
                sd[f"{base}.conv_out.bias"] = t(ch)
            ch_in = ch
        elif kind == "attn":
            sd[f"{base}.norm.weight"] = t(ch)
            sd[f"{base}.norm.bias"] = t(ch)
            for head in ("q", "k", "v", "proj_out"):
                sd[f"{base}.{head}.weight"] = t(ch, ch, 1, 1)
                sd[f"{base}.{head}.bias"] = t(ch)
        elif kind in ("down", "up"):
            sd[f"{base}.conv.weight"] = t(ch, ch, 3, 3)
            sd[f"{base}.conv.bias"] = t(ch)
        elif kind == "norm":
            sd[f"{base}.weight"] = t(ch)
            sd[f"{base}.bias"] = t(ch)
    return sd


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_codeformer_converter_bijection(rng):
    class TinyCF(CodeFormer):
        FUSE_ENCODER = {"32": 2, "16": 6}
        FUSE_GENERATOR = {"16": 4, "32": 9}
        CHANNELS = {"16": 16, "32": 8}

    model = TinyCF(dim_embd=16, n_head=4, n_layers=2, codebook_size=16,
                   latent_size=256, connect_list=("32",), img_size=32,
                   nf=8, ch_mult=(1, 2), emb_dim=8)

    enc_specs = encoder_block_specs(8, (1, 2), 2, 32, (16,), 8)
    gen_specs = generator_block_specs(8, (1, 2), 2, 32, (16,), 8)
    sd = {}
    sd.update(synth_stack_keys("encoder", enc_specs, rng, 8))
    sd.update(synth_stack_keys("generator", gen_specs, rng, 8))
    sd["quantize.embedding.weight"] = rng.standard_normal((16, 8)).astype(np.float32)
    sd["position_emb"] = np.zeros((256, 16), np.float32)
    sd["feat_emb.weight"] = rng.standard_normal((16, 8)).astype(np.float32)
    sd["feat_emb.bias"] = np.zeros(16, np.float32)
    for i in range(2):
        p = f"ft_layers.{i}."
        sd[p + "self_attn.in_proj_weight"] = rng.standard_normal((48, 16)).astype(np.float32)
        sd[p + "self_attn.in_proj_bias"] = np.zeros(48, np.float32)
        sd[p + "self_attn.out_proj.weight"] = rng.standard_normal((16, 16)).astype(np.float32)
        sd[p + "self_attn.out_proj.bias"] = np.zeros(16, np.float32)
        for lin, shape in (("linear1", (32, 16)), ("linear2", (16, 32))):
            sd[p + lin + ".weight"] = rng.standard_normal(shape).astype(np.float32)
            sd[p + lin + ".bias"] = np.zeros(shape[0], np.float32)
        for norm in ("norm1", "norm2"):
            sd[p + norm + ".weight"] = np.ones(16, np.float32)
            sd[p + norm + ".bias"] = np.zeros(16, np.float32)
    sd["idx_pred_layer.0.weight"] = np.ones(16, np.float32)
    sd["idx_pred_layer.0.bias"] = np.zeros(16, np.float32)
    sd["idx_pred_layer.1.weight"] = rng.standard_normal((16, 16)).astype(np.float32)
    sd["fuse_convs_dict.32.encode_enc.norm1.weight"] = np.ones(16, np.float32)
    sd["fuse_convs_dict.32.encode_enc.norm1.bias"] = np.zeros(16, np.float32)
    sd["fuse_convs_dict.32.encode_enc.conv1.weight"] = rng.standard_normal((8, 16, 3, 3)).astype(np.float32)
    sd["fuse_convs_dict.32.encode_enc.conv1.bias"] = np.zeros(8, np.float32)
    sd["fuse_convs_dict.32.encode_enc.norm2.weight"] = np.ones(8, np.float32)
    sd["fuse_convs_dict.32.encode_enc.norm2.bias"] = np.zeros(8, np.float32)
    sd["fuse_convs_dict.32.encode_enc.conv2.weight"] = rng.standard_normal((8, 8, 3, 3)).astype(np.float32)
    sd["fuse_convs_dict.32.encode_enc.conv2.bias"] = np.zeros(8, np.float32)
    sd["fuse_convs_dict.32.encode_enc.conv_out.weight"] = rng.standard_normal((8, 16, 1, 1)).astype(np.float32)
    sd["fuse_convs_dict.32.encode_enc.conv_out.bias"] = np.zeros(8, np.float32)
    for head in ("scale", "shift"):
        for li in (0, 2):
            sd[f"fuse_convs_dict.32.{head}.{li}.weight"] = rng.standard_normal((8, 8, 3, 3)).astype(np.float32)
            sd[f"fuse_convs_dict.32.{head}.{li}.bias"] = np.zeros(8, np.float32)

    converted = convert_codeformer(sd)
    init = fast_init(
        lambda x: model.init(jax.random.PRNGKey(0), x),
        jnp.zeros((1, 32, 32, 3)),
    )
    flat_init = flatten(init["params"])
    flat_conv = flatten(converted["params"])
    missing = set(flat_init) - set(flat_conv)
    extra = set(flat_conv) - set(flat_init)
    assert not extra, f"converted keys not in model: {sorted(extra)[:6]}"
    assert not missing, f"model keys never converted: {sorted(missing)[:6]}"
    for k in flat_init:
        assert flat_init[k].shape == np.asarray(flat_conv[k]).shape, k

    # converted params must actually run
    out, logits, _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted["params"])},
        jnp.zeros((1, 32, 32, 3)), 0.5,
    )
    assert out.shape == (1, 32, 32, 3)
