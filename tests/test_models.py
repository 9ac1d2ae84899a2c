"""UNet3D + VAE structural tests on tiny configs (CPU-sized)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentsync_tpu.config import MotionModuleConfig, UNet3DConfig, VAEConfig
from latentsync_tpu.models.unet3d import UNet3DConditionModel, timestep_embedding
from latentsync_tpu.models.vae import AutoencoderKL, scale_latents, unscale_latents


def tiny_unet_cfg(**kw):
    base = dict(
        sample_size=8,
        in_channels=13,
        out_channels=4,
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        norm_num_groups=8,
        cross_attention_dim=16,
        attention_head_dim=4,
        motion_module=MotionModuleConfig(
            num_attention_heads=4, num_transformer_block=1
        ),
    )
    base.update(kw)
    return UNet3DConfig(**base)


@pytest.fixture(scope="module")
def tiny_unet():
    from latentsync_tpu.utils.params import UNET_ZERO_PATHS, fast_init

    cfg = tiny_unet_cfg()
    model = UNet3DConditionModel(cfg)
    sample = jnp.zeros((1, 4, 8, 8, 13))
    audio = jnp.zeros((1, 4, 10, 16))
    params = fast_init(
        lambda s, t, a: model.init(jax.random.PRNGKey(0), s, t, a),
        sample, jnp.zeros((1,), jnp.int32), audio,
        zero_paths=UNET_ZERO_PATHS,
    )
    # jit: eager (op-by-op) execution compiles hundreds of tiny programs
    apply = jax.jit(lambda p, x, t, a: model.apply(p, x, t, a))
    return cfg, model, params, apply


def test_unet_output_shape(tiny_unet, rng):
    cfg, model, params, apply = tiny_unet
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 13)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((2, 4, 10, 16)).astype(np.float32))
    out = apply(params, x, jnp.asarray([10, 500]), audio)
    assert out.shape == (2, 4, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_zero_init_convs(tiny_unet, rng):
    """conv_in and conv_out are zero-init (ref:models/unet.py:92,241) →
    fresh model output is exactly zero."""
    cfg, model, params, apply = tiny_unet
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 13)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((1, 4, 10, 16)).astype(np.float32))
    out = apply(params, x, jnp.asarray([100]), audio)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_unet_audio_changes_output(tiny_unet, rng):
    """With non-zero conv weights, audio conditioning must reach the
    output (cross-attn path wired)."""
    cfg, model, params, apply = tiny_unet
    # replace zero conv params with random ones
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape).astype(np.float32)) * 0.02
        if p.ndim >= 1 else p,
        params,
    )
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 13)).astype(np.float32))
    a1 = jnp.asarray(rng.standard_normal((1, 4, 10, 16)).astype(np.float32))
    a2 = jnp.zeros_like(a1)
    o1 = apply(params, x, jnp.asarray([100]), a1)
    o2 = apply(params, x, jnp.asarray([100]), a2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_unet_no_audio_layer():
    from latentsync_tpu.utils.params import fast_init

    cfg = tiny_unet_cfg(add_audio_layer=False)
    model = UNet3DConditionModel(cfg)
    x = jnp.zeros((1, 4, 8, 8, 13))
    params = fast_init(
        lambda s, t: model.init(jax.random.PRNGKey(0), s, t, None),
        x, jnp.zeros((1,), jnp.int32),
    )
    out = jax.jit(lambda p, s, t: model.apply(p, s, t, None))(
        params, x, jnp.asarray([3]))
    assert out.shape == (1, 4, 8, 8, 4)


def test_timestep_embedding_matches_diffusers_formula():
    """cos-first layout with flip_sin_to_cos=True, freq_shift=0."""
    t = jnp.asarray([0, 1, 999])
    emb = np.asarray(timestep_embedding(t, 320))
    half = 160
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None, :]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # f32 arg reduction in sin/cos at t=999 costs ~2e-3 (torch pays the same)
    np.testing.assert_allclose(emb, expected, atol=5e-3)


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8)
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    enc = jax.jit(lambda p, x: model.apply(p, x, method="encode"))
    enc_s = jax.jit(lambda p, x, k: model.apply(p, x, k, method="encode"))
    dec = jax.jit(lambda p, z: model.apply(p, z, method="decode"))
    return cfg, model, params, enc, enc_s, dec


def test_vae_shapes(tiny_vae, rng):
    cfg, model, params, enc, enc_s, dec = tiny_vae
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    z = enc(params, x)
    assert z.shape == (2, 8, 8, 4)  # one downsample for 2 blocks
    rec = dec(params, z)
    assert rec.shape == (2, 16, 16, 3)


def test_vae_sample_vs_mode(tiny_vae, rng):
    cfg, model, params, enc, enc_s, dec = tiny_vae
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    mode = enc(params, x)
    s1 = enc_s(params, x, jax.random.PRNGKey(1))
    s2 = enc_s(params, x, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
    # samples scatter around the mode
    assert np.abs(np.asarray(s1) - np.asarray(mode)).mean() < 10.0


def test_latent_scaling_roundtrip(rng):
    cfg = VAEConfig()
    z = jnp.asarray(rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(unscale_latents(scale_latents(z, cfg), cfg)),
        np.asarray(z),
        atol=1e-6,
    )
