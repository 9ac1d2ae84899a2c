"""Trainer tests: trainable-mask selection, loss step on tiny configs,
multi-device data-parallel gradient consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from latentsync_tpu.config import (
    DataConfig,
    LatentSyncConfig,
    MotionModuleConfig,
    RunConfig,
    SyncNetConfig,
    SyncNetEncoderConfig,
    UNet3DConfig,
    VAEConfig,
)
from latentsync_tpu.training.unet_trainer import UNetTrainer, trainable_mask
from latentsync_tpu.utils.params import UNET_ZERO_PATHS, fast_init


def tiny_config():
    return LatentSyncConfig(
        unet=UNet3DConfig(
            block_out_channels=(32, 64, 64, 64),
            layers_per_block=1,
            norm_num_groups=8,
            cross_attention_dim=16,
            attention_head_dim=4,
            motion_module=MotionModuleConfig(num_attention_heads=4, num_transformer_block=1),
        ),
        vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8),
        run=RunConfig(pixel_space_supervise=False, use_syncnet=False),
        data=DataConfig(num_frames=4, resolution=16),
    )


def test_trainable_mask_selects_attention_and_motion():
    tree = {
        "down_blocks_0": {
            "attentions_0": {"proj_in": {"kernel": 1}},
            "motion_modules_0": {"proj_out": {"kernel": 1}},
            "resnets_0": {"conv1": {"conv": {"kernel": 1}}},
        },
        "conv_in": {"conv": {"kernel": 1}},
    }
    mask = trainable_mask(tree, ("motion_modules.", "attentions."))
    assert mask["down_blocks_0"]["attentions_0"]["proj_in"]["kernel"] is True
    assert mask["down_blocks_0"]["motion_modules_0"]["proj_out"]["kernel"] is True
    assert mask["down_blocks_0"]["resnets_0"]["conv1"]["conv"]["kernel"] is False
    assert mask["conv_in"]["conv"]["kernel"] is False


@pytest.fixture(scope="module")
def tiny_trainer():
    cfg = tiny_config()
    trainer = UNetTrainer(cfg, dtype=jnp.float32)
    f = cfg.data.num_frames
    res = cfg.data.resolution
    lat = res // cfg.vae.scale_factor  # 16/2=8

    # NOTE: no zero_paths here — zero-init conv_out blocks every upstream
    # gradient; real training starts from a pretrained ckpt (nonzero)
    unet_params = fast_init(
        lambda s, t, a: trainer.unet.init(jax.random.PRNGKey(0), s, t, a),
        jnp.zeros((1, f, lat, lat, 13)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, f, 10, 16)),
        seed=3,
    )
    vae_params = fast_init(
        lambda x: trainer.vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1)),
        jnp.zeros((1, res, res, 3)),
        seed=4,
    )
    return cfg, trainer, unet_params, vae_params, f, res, lat


def make_batch(rng, b, f, res, lat):
    return {
        "gt_pixels": jnp.asarray(rng.standard_normal((b, f, res, res, 3)).astype(np.float32)) * 0.5,
        "masked_pixels": jnp.asarray(rng.standard_normal((b, f, res, res, 3)).astype(np.float32)) * 0.5,
        "ref_pixels": jnp.asarray(rng.standard_normal((b, f, res, res, 3)).astype(np.float32)) * 0.5,
        "masks": jnp.ones((b, f, lat, lat, 1), jnp.float32),
        "audio_embeds": jnp.asarray(rng.standard_normal((b, f, 10, 16)).astype(np.float32)),
        "mel": jnp.zeros((b, 80, 52, 1), jnp.float32),
    }


def test_train_step_decreases_loss(tiny_trainer, rng):
    cfg, trainer, unet_params, vae_params, f, res, lat = tiny_trainer
    loss_fn, train_step = trainer.make_train_step(vae_params=vae_params)
    tx = trainer.make_optimizer(unet_params)
    opt_state = tx.init(unet_params)
    batch = make_batch(rng, 2, f, res, lat)

    step = jax.jit(lambda p, o, b, r: train_step(p, o, b, r, tx))
    key = jax.random.PRNGKey(0)
    params = unet_params
    first = None
    for i in range(5):
        params, opt_state, metrics = step(params, opt_state, batch, key)
        if first is None:
            first = float(metrics["total"])
    # same rng/batch every step → loss must decrease as params adapt
    assert float(metrics["total"]) < first


def test_frozen_params_unchanged(tiny_trainer, rng):
    cfg, trainer, unet_params, vae_params, f, res, lat = tiny_trainer
    loss_fn, train_step = trainer.make_train_step(vae_params=vae_params)
    tx = trainer.make_optimizer(unet_params)
    opt_state = tx.init(unet_params)
    batch = make_batch(rng, 1, f, res, lat)
    step = jax.jit(lambda p, o, b, r: train_step(p, o, b, r, tx))
    params, _, _ = step(unet_params, opt_state, batch, jax.random.PRNGKey(1))

    # resnet conv (not in trainable_modules) must be untouched
    before = unet_params["params"]["down_blocks_0"]["resnets_0"]["conv1"]["conv"]["kernel"]
    after = params["params"]["down_blocks_0"]["resnets_0"]["conv1"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    # attention param must move
    b_attn = unet_params["params"]["down_blocks_0"]["attentions_0"]["proj_in"]["kernel"]
    a_attn = params["params"]["down_blocks_0"]["attentions_0"]["proj_in"]["kernel"]
    assert not np.allclose(np.asarray(b_attn), np.asarray(a_attn))


def test_data_parallel_matches_single_device(tiny_trainer, rng):
    """Loss over a mesh-sharded batch equals the single-device loss —
    the DDP-equivalence guarantee (SURVEY §2.6)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from latentsync_tpu.parallel.mesh import make_mesh

    cfg, trainer, unet_params, vae_params, f, res, lat = tiny_trainer
    loss_fn, _ = trainer.make_train_step(vae_params=vae_params)
    batch = make_batch(rng, 4, f, res, lat)
    key = jax.random.PRNGKey(7)

    single = float(jax.jit(loss_fn)(unet_params, batch, key)[0])

    mesh = make_mesh(4, model_parallel=1)
    sharded_batch = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
    )
    repl_params = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), unet_params
    )
    with mesh:
        multi = float(jax.jit(loss_fn)(repl_params, sharded_batch, key)[0])
    assert abs(single - multi) < 1e-4


def test_trainable_mask_stage2_efficient_attn2_only():
    """The stage2_efficient config trains ONLY motion modules + audio
    cross-attention (trainable_modules: motion_modules., attn2. —
    ref:configs/unet/stage2_efficient.yaml): attn1/self-attention and
    resnets must stay frozen."""
    tree = {
        "down_blocks_0": {
            "attentions_0": {
                "transformer_blocks_0": {
                    "attn1": {"to_q": {"kernel": 1}},
                    "attn2": {"to_q": {"kernel": 1}},
                    "ff": {"net_2": {"kernel": 1}},
                },
            },
            "motion_modules_0": {"proj_in": {"kernel": 1}},
            "resnets_0": {"conv1": {"conv": {"kernel": 1}}},
        }
    }
    mask = trainable_mask(tree, ("motion_modules.", "attn2."))
    blk = mask["down_blocks_0"]
    assert blk["attentions_0"]["transformer_blocks_0"]["attn2"]["to_q"]["kernel"]
    assert blk["motion_modules_0"]["proj_in"]["kernel"]
    assert not blk["attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert not blk["attentions_0"]["transformer_blocks_0"]["ff"]["net_2"]["kernel"]
    assert not blk["resnets_0"]["conv1"]["conv"]["kernel"]
