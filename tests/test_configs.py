"""Every shipped config file loads and builds a working model
(ref:configs/ inventory: unet stage1/stage2/stage2_efficient, four
syncnet variants, audio.yaml, scheduler_config.json)."""

import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentsync_tpu.config import load_config, load_unet_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_unet_stage_configs_load():
    stage1 = load_unet_config(f"{REPO}/configs/unet_stage1.yaml")
    assert not stage1.unet.use_motion_module
    assert not stage1.run.use_syncnet
    assert not stage1.run.pixel_space_supervise

    stage2 = load_unet_config(f"{REPO}/configs/unet_stage2.yaml")
    assert stage2.unet.use_motion_module
    assert stage2.run.use_syncnet
    assert stage2.unet.block_out_channels == (320, 640, 1280, 1280)

    eff = load_unet_config(f"{REPO}/configs/unet_stage2_efficient.yaml")
    assert eff.unet.motion_module_decoder_only
    assert eff.run.trepa_loss_weight == 0
    assert "attn2." in eff.run.trainable_modules


@pytest.mark.parametrize("name,aud_in,vis_in,latent", [
    ("syncnet_16_pixel_attn", (80, 52, 1), (128, 256, 48), False),
    ("syncnet_16_pixel", (80, 52, 1), (128, 256, 48), False),
    ("syncnet_16_latent", (80, 52, 1), (32, 32, 64), True),
    ("syncnet_25_pixel", (80, 80, 1), (128, 256, 75), False),
])
def test_syncnet_variant_configs_build(name, aud_in, vis_in, latent):
    from latentsync_tpu.models.syncnet import StableSyncNet

    cfg = load_config(f"{REPO}/configs/{name}.yaml")
    assert bool(cfg.data.latent_space) == latent
    assert cfg.syncnet.audio_encoder.in_channels == aud_in[-1]
    assert cfg.syncnet.visual_encoder.in_channels == vis_in[-1]

    model = StableSyncNet(cfg.syncnet)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((2,) + aud_in), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2,) + vis_in), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), v, a)
    ve, ae = model.apply(params, v, a)
    # both towers reduce to matching unit-norm embeddings
    assert ve.shape == ae.shape
    assert ve.shape[0] == 2
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ve, np.float64), axis=-1), 1.0, atol=1e-3
    )


def test_scheduler_config_matches_ddim_defaults():
    from latentsync_tpu.config import SchedulerConfig

    with open(f"{REPO}/configs/scheduler_config.json") as f:
        ref = json.load(f)
    cfg = SchedulerConfig()
    assert cfg.beta_start == ref["beta_start"]
    assert cfg.beta_end == ref["beta_end"]
    assert cfg.beta_schedule == ref["beta_schedule"]
    assert cfg.num_train_timesteps == ref["num_train_timesteps"]
    assert cfg.steps_offset == ref["steps_offset"]
    assert cfg.set_alpha_to_one == ref["set_alpha_to_one"]


def test_audio_yaml_matches_mel_constants():
    import yaml

    from latentsync_tpu.config import AudioDSPConfig

    with open(f"{REPO}/configs/audio.yaml") as f:
        a = yaml.safe_load(f)["audio"]
    cfg = AudioDSPConfig()
    for key in ("num_mels", "n_fft", "hop_size", "win_size", "sample_rate",
                "fmin", "fmax", "preemphasis", "ref_level_db",
                "min_level_db", "max_abs_value", "rescaling_max"):
        assert getattr(cfg, key) == a[key], key
    for key in ("preemphasize", "symmetric_mels", "signal_normalization",
                "allow_clipping_in_normalization", "rescale"):
        assert getattr(cfg, key) == bool(a[key]), key
