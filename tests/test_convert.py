"""Weight-converter tests: torch-key → flax-path mapping must land on
real parameter paths of the initialized models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentsync_tpu.config import MotionModuleConfig, UNet3DConfig, WhisperConfig
from latentsync_tpu.models.unet3d import UNet3DConditionModel
from latentsync_tpu.models.whisper import WhisperEncoder
from latentsync_tpu.utils.convert import (
    _unet_flax_path,
    convert_whisper_encoder,
    merge_params,
)


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_unet_key_mapping_covers_all_params():
    """Generate the full torch key list for a tiny config from the known
    reference naming and check a bijection onto the flax init tree."""
    cfg = UNet3DConfig(
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        norm_num_groups=8,
        cross_attention_dim=16,
        attention_head_dim=4,
        motion_module=MotionModuleConfig(num_attention_heads=4, num_transformer_block=1),
    )
    from latentsync_tpu.utils.params import fast_init

    model = UNet3DConditionModel(cfg)
    params = fast_init(
        lambda s, t, a: model.init(jax.random.PRNGKey(0), s, t, a),
        jnp.zeros((1, 2, 8, 8, 13)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2, 10, 16)),
    )
    flat = flatten(params["params"])
    paths = set(p[:-1] for p in flat)  # module paths (minus kernel/scale/bias)

    def attn_keys(base):
        keys = [f"{base}.norm", f"{base}.proj_in", f"{base}.proj_out"]
        tb = f"{base}.transformer_blocks.0"
        keys += [f"{tb}.norm1", f"{tb}.norm2", f"{tb}.norm3"]
        for a in ("attn1", "attn2"):
            keys += [f"{tb}.{a}.to_q", f"{tb}.{a}.to_k", f"{tb}.{a}.to_v",
                     f"{tb}.{a}.to_out.0"]
        keys += [f"{tb}.ff.net.0.proj", f"{tb}.ff.net.2"]
        return keys

    def mm_keys(base):
        t = f"{base}.temporal_transformer"
        keys = [f"{t}.norm", f"{t}.proj_in", f"{t}.proj_out"]
        tb = f"{t}.transformer_blocks.0"
        for k in range(2):
            keys += [f"{tb}.attention_blocks.{k}.to_q",
                     f"{tb}.attention_blocks.{k}.to_k",
                     f"{tb}.attention_blocks.{k}.to_v",
                     f"{tb}.attention_blocks.{k}.to_out.0",
                     f"{tb}.norms.{k}"]
        keys += [f"{tb}.ff_norm", f"{tb}.ff.net.0.proj", f"{tb}.ff.net.2"]
        return keys

    def resnet_keys(base, shortcut):
        keys = [f"{base}.norm1", f"{base}.conv1", f"{base}.time_emb_proj",
                f"{base}.norm2", f"{base}.conv2"]
        if shortcut:
            keys.append(f"{base}.conv_shortcut")
        return keys

    torch_keys = ["conv_in", "conv_out", "conv_norm_out",
                  "time_embedding.linear_1", "time_embedding.linear_2"]
    # down blocks: channels (32,64,64,64), 1 layer each, shortcut when ch changes
    chans = [32, 64, 64, 64]
    prev = 32
    for i in range(4):
        b = f"down_blocks.{i}"
        torch_keys += resnet_keys(f"{b}.resnets.0", shortcut=(prev != chans[i]))
        if i < 3:
            torch_keys += attn_keys(f"{b}.attentions.0")
            torch_keys.append(f"{b}.downsamplers.0.conv")
        torch_keys += mm_keys(f"{b}.motion_modules.0")
        prev = chans[i]
    torch_keys += resnet_keys("mid_block.resnets.0", False)
    torch_keys += resnet_keys("mid_block.resnets.1", False)
    torch_keys += attn_keys("mid_block.attentions.0")
    for i in range(4):
        b = f"up_blocks.{i}"
        for j in range(2):
            torch_keys += resnet_keys(f"{b}.resnets.{j}", shortcut=True)
            if i > 0:
                torch_keys += attn_keys(f"{b}.attentions.{j}")
            torch_keys += mm_keys(f"{b}.motion_modules.{j}")
        if i < 3:
            torch_keys.append(f"{b}.upsamplers.0.conv")

    mapped = set()
    for tk in torch_keys:
        path = _unet_flax_path(tk)
        assert path is not None, f"unmapped torch key: {tk}"
        assert path in paths, f"{tk} → {path} not in flax tree"
        mapped.add(path)

    missing = paths - mapped
    assert not missing, f"flax params never targeted by mapping: {sorted(missing)[:8]}"


def test_whisper_converter_roundtrip(rng):
    """Synthesize an openai-layout state dict, convert, apply."""
    cfg = WhisperConfig(n_audio_ctx=50, n_audio_layer=2)
    d = cfg.n_audio_state

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    sd = {
        "encoder.conv1.weight": t(d, cfg.n_mels, 3),
        "encoder.conv1.bias": t(d),
        "encoder.conv2.weight": t(d, d, 3),
        "encoder.conv2.bias": t(d),
        "encoder.positional_embedding": t(cfg.n_audio_ctx, d),
        "encoder.ln_post.weight": t(d),
        "encoder.ln_post.bias": t(d),
        "decoder.token_embedding.weight": t(10, d),  # ignored
    }
    for i in range(2):
        p = f"encoder.blocks.{i}."
        sd.update({
            p + "attn.query.weight": t(d, d), p + "attn.query.bias": t(d),
            p + "attn.key.weight": t(d, d),
            p + "attn.value.weight": t(d, d), p + "attn.value.bias": t(d),
            p + "attn.out.weight": t(d, d), p + "attn.out.bias": t(d),
            p + "attn_ln.weight": t(d), p + "attn_ln.bias": t(d),
            p + "mlp.0.weight": t(4 * d, d), p + "mlp.0.bias": t(4 * d),
            p + "mlp.2.weight": t(d, 4 * d), p + "mlp.2.bias": t(d),
            p + "mlp_ln.weight": t(d), p + "mlp_ln.bias": t(d),
        })

    converted = convert_whisper_encoder(sd)
    model = WhisperEncoder(cfg)
    mel = jnp.asarray(rng.standard_normal((1, cfg.n_mels, 100)).astype(np.float32))
    init = model.init(jax.random.PRNGKey(0), mel)
    # tree structures must agree exactly
    assert jax.tree.structure(init) == jax.tree.structure(
        jax.tree.map(jnp.asarray, converted)
    )
    out = model.apply(jax.tree.map(jnp.asarray, converted), mel, include_embeddings=False)
    assert out.shape == (1, 50, cfg.n_audio_state)
    assert np.isfinite(np.asarray(out)).all()


def test_merge_params_overlay():
    init = {"a": {"w": np.zeros(3)}, "b": {"w": np.ones(2)}}
    loaded = {"a": {"w": np.full(3, 7.0)}}
    merged = merge_params(init, loaded)
    np.testing.assert_array_equal(merged["a"]["w"], 7.0)
    np.testing.assert_array_equal(merged["b"]["w"], 1.0)
