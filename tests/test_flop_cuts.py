"""Statistically-gated FLOP-cut paths (docs/perf_audit.md "round-3
FLOP cuts"): DeepCache-style step caching over the DDIM trajectory and
the CFG guidance interval.

Exactness contract: a cache WRITE step is bitwise the normal forward; a
cache READ step fed the true deep feature reproduces the full forward
(same ops, same order). The approximation enters only when a read step
replays a *stale* feature — that path is exercised end-to-end through
`_denoise_fn` and bounded loosely (random weights), with the real gate
being statistical (SyncNet confidence within 2%, BASELINE.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentsync_tpu.config import MotionModuleConfig, UNet3DConfig
from latentsync_tpu.models.unet3d import UNet3DConditionModel
from latentsync_tpu.utils.params import fast_init


@pytest.fixture(scope="module")
def unet_and_inputs():
    cfg = UNet3DConfig(
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=1,
        norm_num_groups=8,
        cross_attention_dim=16,
        attention_head_dim=4,
        motion_module=MotionModuleConfig(num_attention_heads=4,
                                         num_transformer_block=1),
    )
    model = UNet3DConditionModel(cfg)
    rng = np.random.default_rng(7)
    sample = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 13)), jnp.float32) * 0.3
    audio = jnp.asarray(rng.standard_normal((2, 4, 10, 16)), jnp.float32) * 0.3
    t = jnp.asarray([500, 500])
    params = fast_init(
        lambda s, tt, a: model.init(jax.random.PRNGKey(0), s, tt, a),
        sample, t, audio, seed=11,
    )
    base = np.asarray(model.apply(params, sample, t, audio))
    return model, params, sample, t, audio, base


@pytest.mark.parametrize("depth", [1, 2])
def test_deepcache_write_matches_base(unet_and_inputs, depth):
    model, params, sample, t, audio, base = unet_and_inputs
    eps, cache = model.apply(params, sample, t, audio,
                             cache_depth=depth, cache_read=False)
    assert np.array_equal(np.asarray(eps), base)
    # cached feature is the input to up block nb-depth: spatial res of
    # that block, channel width of the block above it
    assert cache.shape[0] == sample.shape[0]
    assert np.isfinite(np.asarray(cache)).all()


@pytest.mark.parametrize("depth", [1, 2])
def test_deepcache_read_true_cache_matches_base(unet_and_inputs, depth):
    """Splicing the exact deep feature back in reproduces the full
    forward — the shallow slice is the same computation."""
    model, params, sample, t, audio, base = unet_and_inputs
    _, cache = model.apply(params, sample, t, audio,
                           cache_depth=depth, cache_read=False)
    eps, passthrough = model.apply(params, sample, t, audio,
                                   deep_cache=cache, cache_depth=depth,
                                   cache_read=True)
    np.testing.assert_allclose(np.asarray(eps), base, rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(passthrough), np.asarray(cache))


@pytest.mark.parametrize("depth", [1, 2])
def test_deepcache_encoder_write_matches_base(unet_and_inputs, depth):
    """Encoder-propagation write steps are bitwise the normal forward
    and cache (deep_feature, shallow_skips)."""
    model, params, sample, t, audio, base = unet_and_inputs
    eps, cache = model.apply(params, sample, t, audio,
                             cache_depth=depth, cache_read=False,
                             cache_encoder=True)
    assert np.array_equal(np.asarray(eps), base)
    deep, skips = cache
    # conv_in + depth blocks × (layers_per_block outs + downsampler),
    # minus the last downsampler (feeds only the skipped deep trunk)
    lpb = model.config.layers_per_block
    assert len(skips) == 1 + depth * (lpb + 1) - 1
    assert deep.shape[0] == sample.shape[0]


@pytest.mark.parametrize("depth", [1, 2])
def test_deepcache_encoder_read_true_cache_matches_base(unet_and_inputs,
                                                        depth):
    """Up blocks replayed on the exact cached skips + deep feature
    reproduce the full forward."""
    model, params, sample, t, audio, base = unet_and_inputs
    _, cache = model.apply(params, sample, t, audio,
                           cache_depth=depth, cache_read=False,
                           cache_encoder=True)
    eps, passthrough = model.apply(params, sample, t, audio,
                                   deep_cache=cache, cache_depth=depth,
                                   cache_read=True, cache_encoder=True)
    np.testing.assert_allclose(np.asarray(eps), base, rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(passthrough[0]), np.asarray(cache[0]))


def test_deepcache_encoder_read_ignores_sample(unet_and_inputs):
    """The enc-read slice runs no encoder: its output depends on the
    cache and t only (the DDIM update reintroduces the current
    latents) — assert the input sample genuinely does not flow in."""
    model, params, sample, t, audio, base = unet_and_inputs
    _, cache = model.apply(params, sample, t, audio,
                           cache_depth=1, cache_read=False,
                           cache_encoder=True)
    a, _ = model.apply(params, sample, t, audio, deep_cache=cache,
                       cache_depth=1, cache_read=True, cache_encoder=True)
    b, _ = model.apply(params, sample * -3.0 + 1.0, t, audio,
                       deep_cache=cache, cache_depth=1, cache_read=True,
                       cache_encoder=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("depth", [1, 2])
def test_deepcache_subblock_write_matches_base(unet_and_inputs, depth):
    """Sub-block cut (cache_sub=k): write steps stay bitwise the normal
    forward; the cache drops the skips consumed by the skipped leading
    layers of the first executed up block."""
    model, params, sample, t, audio, base = unet_and_inputs
    lpb = model.config.layers_per_block
    sub = lpb  # deepest legal sub-block cut
    eps, cache = model.apply(params, sample, t, audio,
                             cache_depth=depth, cache_read=False,
                             cache_encoder=True, cache_sub=sub)
    assert np.array_equal(np.asarray(eps), base)
    deep, skips = cache
    assert len(skips) == 1 + depth * (lpb + 1) - 1 - sub
    assert np.isfinite(np.asarray(deep)).all()


@pytest.mark.parametrize("depth", [1, 2])
def test_deepcache_subblock_read_true_cache_matches_base(unet_and_inputs,
                                                         depth):
    """Replaying layers k.. of the first up block on the exact cached
    mid-block feature reproduces the full forward."""
    model, params, sample, t, audio, base = unet_and_inputs
    sub = model.config.layers_per_block
    _, cache = model.apply(params, sample, t, audio,
                           cache_depth=depth, cache_read=False,
                           cache_encoder=True, cache_sub=sub)
    eps, passthrough = model.apply(params, sample, t, audio,
                                   deep_cache=cache, cache_depth=depth,
                                   cache_read=True, cache_encoder=True,
                                   cache_sub=sub)
    np.testing.assert_allclose(np.asarray(eps), base, rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(passthrough[0]), np.asarray(cache[0]))


def test_deepcache_read_stale_cache_differs(unet_and_inputs):
    """A stale feature produces a *different* (but finite) output — the
    read path is live, not silently falling back to the full trunk."""
    model, params, sample, t, audio, base = unet_and_inputs
    _, cache = model.apply(params, sample, t, audio,
                           cache_depth=1, cache_read=False)
    eps, _ = model.apply(params, sample, t, audio,
                         deep_cache=cache * 1.5, cache_depth=1,
                         cache_read=True)
    eps = np.asarray(eps)
    assert np.isfinite(eps).all()
    assert not np.allclose(eps, base)


@pytest.fixture(scope="module")
def tiny_pipeline_shared():
    from latentsync_tpu.audio.features import Audio2Feature
    from latentsync_tpu.config import (DataConfig, LatentSyncConfig,
                                       VAEConfig, WhisperConfig)
    from latentsync_tpu.models.vae import AutoencoderKL
    from latentsync_tpu.pipelines.lipsync import LipsyncPipeline

    cfg = LatentSyncConfig(
        unet=UNet3DConfig(
            block_out_channels=(32, 64, 64, 64),
            layers_per_block=1,
            norm_num_groups=8,
            cross_attention_dim=16,
            attention_head_dim=4,
            motion_module=MotionModuleConfig(num_attention_heads=4,
                                             num_transformer_block=1),
        ),
        vae=VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                      norm_num_groups=4),
        whisper=WhisperConfig(n_audio_state=16, n_audio_head=4,
                              n_audio_layer=1, n_audio_ctx=1500),
        data=DataConfig(num_frames=4, resolution=32),
    )
    lat = 32 // cfg.vae.scale_factor
    unet = UNet3DConditionModel(cfg.unet)
    unet_params = fast_init(
        lambda s, t, a: unet.init(jax.random.PRNGKey(0), s, t, a),
        jnp.zeros((1, 4, lat, lat, 13)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 4, 50, 16)), seed=2,
    )
    vae = AutoencoderKL(cfg.vae)
    vae_params = fast_init(
        lambda x: vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1)),
        jnp.zeros((1, 32, 32, 3)), seed=3,
    )
    audio_encoder = Audio2Feature(cfg.whisper, num_frames=4)
    return LipsyncPipeline(unet_params, vae_params, audio_encoder, cfg,
                           dtype=jnp.float32)


def _tiny_denoise_inputs(pipe, w=2):
    lat = 32 // pipe.config.vae.scale_factor
    f = pipe.config.data.num_frames
    rng = np.random.default_rng(3)
    lat0 = jnp.asarray(rng.standard_normal((w, f, lat, lat, 4)), jnp.float32)
    mask = jnp.asarray(rng.random((w, f, lat, lat, 1)) > 0.5, jnp.float32)
    masked = jnp.asarray(rng.standard_normal((w, f, lat, lat, 4)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((w, f, lat, lat, 4)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal((w, f, 50, 16)), jnp.float32) * 0.3
    return lat0, mask, masked, ref, audio


@pytest.mark.parametrize("env", [
    {"LATENTSYNC_DEEPCACHE": "2:1"},
    {"LATENTSYNC_CFG_INTERVAL": "0.2:0.8"},
    {"LATENTSYNC_DEEPCACHE": "2:1", "LATENTSYNC_CFG_INTERVAL": "0.2:0.8"},
    {"LATENTSYNC_DEEPCACHE": "2:1:enc"},
    {"LATENTSYNC_DEEPCACHE": "2:1:enc", "LATENTSYNC_CFG_INTERVAL": "0.2:0.8"},
    {"LATENTSYNC_DEEPCACHE": "2:1:enc:1", "LATENTSYNC_CFG_INTERVAL": "0.2:0.8"},
])
def test_denoise_flop_cut_paths(tiny_pipeline_shared, monkeypatch, env):
    """The full denoise loop runs under each knob combination and lands
    near the exact trajectory on random weights."""
    pipe = tiny_pipeline_shared
    monkeypatch.delenv("LATENTSYNC_DEEPCACHE", raising=False)
    monkeypatch.delenv("LATENTSYNC_CFG_INTERVAL", raising=False)
    args = _tiny_denoise_inputs(pipe)
    ref = np.asarray(
        pipe._denoise_fn(6, 1.5, True)(pipe.unet_params, *args))

    for k, v in env.items():
        monkeypatch.setenv(k, v)
    got = np.asarray(
        pipe._denoise_fn(6, 1.5, True)(pipe.unet_params, *args))
    assert np.isfinite(got).all()
    denom = np.abs(ref).mean()
    rel = np.abs(got - ref).mean() / max(denom, 1e-9)
    # approximate path: close but not identical
    assert rel < 0.5, rel
    assert not np.array_equal(got, ref)


def test_denoise_knobs_key_the_jit_cache(tiny_pipeline_shared, monkeypatch):
    pipe = tiny_pipeline_shared
    monkeypatch.delenv("LATENTSYNC_DEEPCACHE", raising=False)
    monkeypatch.delenv("LATENTSYNC_CFG_INTERVAL", raising=False)
    f_plain = pipe._denoise_fn(6, 1.5, True)
    monkeypatch.setenv("LATENTSYNC_DEEPCACHE", "2:1")
    f_dc = pipe._denoise_fn(6, 1.5, True)
    assert f_plain is not f_dc
    monkeypatch.delenv("LATENTSYNC_DEEPCACHE", raising=False)
    assert pipe._denoise_fn(6, 1.5, True) is f_plain


def test_flop_cut_knob_parsing(monkeypatch):
    import pytest

    from latentsync_tpu.config import LatentSyncConfig
    from latentsync_tpu.pipelines.lipsync import LipsyncPipeline

    class _Stub:
        config = LatentSyncConfig()

    knobs = lambda n: LipsyncPipeline._flop_cut_knobs(_Stub(), n)  # noqa: E731

    monkeypatch.delenv("LATENTSYNC_DEEPCACHE", raising=False)
    monkeypatch.delenv("LATENTSYNC_CFG_INTERVAL", raising=False)
    assert knobs(20) == (0, 0, False, 0, 0, 20)
    monkeypatch.setenv("LATENTSYNC_DEEPCACHE", "3")
    assert knobs(20) == (3, 1, False, 0, 0, 20)
    monkeypatch.setenv("LATENTSYNC_DEEPCACHE", "2:2")
    monkeypatch.setenv("LATENTSYNC_CFG_INTERVAL", "0.25:0.75")
    assert knobs(20) == (2, 2, False, 0, 5, 15)
    monkeypatch.setenv("LATENTSYNC_DEEPCACHE", "4:1:enc:2")
    assert knobs(20) == (4, 1, True, 2, 5, 15)
    monkeypatch.setenv("LATENTSYNC_DEEPCACHE", "0")
    monkeypatch.setenv("LATENTSYNC_CFG_INTERVAL", "")
    assert knobs(20)[:2] == (0, 0)

    # ADVICE r3: typos must fail loudly, not silently run a different
    # operating point
    monkeypatch.setenv("LATENTSYNC_DEEPCACHE", "4:1:ecn:2")
    with pytest.raises(ValueError, match="third field"):
        knobs(20)
    monkeypatch.setenv("LATENTSYNC_DEEPCACHE", "4:9:enc")
    with pytest.raises(ValueError, match="depth"):
        knobs(20)
    monkeypatch.setenv("LATENTSYNC_DEEPCACHE", "4:1:enc")
    monkeypatch.setenv("LATENTSYNC_CFG_INTERVAL", "0.5")
    with pytest.raises(ValueError, match="lo:hi"):
        knobs(20)
    monkeypatch.setenv("LATENTSYNC_CFG_INTERVAL", "0.7:0.2")
    with pytest.raises(ValueError, match="lo <= hi"):
        knobs(20)
