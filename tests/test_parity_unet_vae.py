"""Activation-level parity of the UNet3D and VAE vs independent PyTorch
implementations (tests/torch_ref_models.py) — the pattern test_whisper.py
established: random torch weights → convert_{unet,vae} → flax forward must
match the torch forward numerically at f32.

This covers the two failure classes VERDICT r01 called out: a subtly
wrong GroupNorm axis / attention reshape in the flax model, and converter
numerics (key-bijection alone can't catch a transposed kernel).

Blocks covered individually for diagnosis: ResnetBlock3D (cross-frame GN
stats, temb injection, ref:resnet.py:104-223), SpatialTransformer with
audio cross-attn (per-frame GN, ref:attention.py:23-199), TemporalModule
(across-frame attention + sinusoidal PE, ref:motion_module.py:76-313);
then the full tiny UNet and the VAE encode/decode round.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from latentsync_tpu.config import MotionModuleConfig, UNet3DConfig, VAEConfig
from latentsync_tpu.models import unet3d as fx
from latentsync_tpu.models.vae import AutoencoderKL
from latentsync_tpu.utils.convert import convert_unet, convert_vae, merge_params

from torch_ref_models import (
    ResnetBlock3D as TResnet,
    SpatialTransformer as TSpatial,
    TemporalModule as TTemporal,
    TorchUNet3D,
    TorchVAE,
    randomize_,
)


def t2j_conv(w):
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def t2j_lin(w):
    return w.detach().numpy().T


def npy(t):
    return t.detach().numpy()


def test_resnet_block3d_parity(rng):
    """Cross-frame GroupNorm stats + post-conv1 temb add + shortcut."""
    tm = randomize_(TResnet(16, 32, 24, groups=4, eps=1e-5), seed=1)
    x = torch.tensor(rng.standard_normal((2, 16, 3, 8, 8)), dtype=torch.float32)
    temb = torch.tensor(rng.standard_normal((2, 24)), dtype=torch.float32)
    with torch.no_grad():
        ref = tm(x, temb)

    fm = fx.ResnetBlock3D(32, 24, groups=4, eps=1e-5)
    params = {"params": {
        "norm1": {"scale": npy(tm.norm1.weight), "bias": npy(tm.norm1.bias)},
        "conv1": {"conv": {"kernel": t2j_conv(tm.conv1.weight), "bias": npy(tm.conv1.bias)}},
        "time_emb_proj": {"kernel": t2j_lin(tm.time_emb_proj.weight),
                          "bias": npy(tm.time_emb_proj.bias)},
        "norm2": {"scale": npy(tm.norm2.weight), "bias": npy(tm.norm2.bias)},
        "conv2": {"conv": {"kernel": t2j_conv(tm.conv2.weight), "bias": npy(tm.conv2.bias)}},
        "conv_shortcut": {"conv": {"kernel": t2j_conv(tm.conv_shortcut.weight),
                                   "bias": npy(tm.conv_shortcut.bias)}},
    }}
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    out = fm.apply(params, xj, jnp.asarray(temb.numpy()))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)), ref.numpy(),
        atol=2e-5, rtol=1e-5,
    )


def _spatial_params(tm, num_layers=1):
    blocks = {}
    for i, blk in enumerate(tm.transformer_blocks):
        def attn_p(a):
            return {
                "to_q": {"kernel": t2j_lin(a.to_q.weight)},
                "to_k": {"kernel": t2j_lin(a.to_k.weight)},
                "to_v": {"kernel": t2j_lin(a.to_v.weight)},
                "to_out_0": {"kernel": t2j_lin(a.to_out[0].weight),
                             "bias": npy(a.to_out[0].bias)},
            }

        blocks[f"transformer_blocks_{i}"] = {
            "norm1": {"scale": npy(blk.norm1.weight), "bias": npy(blk.norm1.bias)},
            "attn1": attn_p(blk.attn1),
            "norm2": {"scale": npy(blk.norm2.weight), "bias": npy(blk.norm2.bias)},
            "attn2": attn_p(blk.attn2),
            "norm3": {"scale": npy(blk.norm3.weight), "bias": npy(blk.norm3.bias)},
            "ff": {
                "net_0_proj": {"kernel": t2j_lin(blk.ff.net[0].proj.weight),
                               "bias": npy(blk.ff.net[0].proj.bias)},
                "net_2": {"kernel": t2j_lin(blk.ff.net[2].weight),
                          "bias": npy(blk.ff.net[2].bias)},
            },
        }
    return {
        "norm": {"scale": npy(tm.norm.weight), "bias": npy(tm.norm.bias)},
        "proj_in": {"kernel": t2j_conv(tm.proj_in.weight), "bias": npy(tm.proj_in.bias)},
        "proj_out": {"kernel": t2j_conv(tm.proj_out.weight), "bias": npy(tm.proj_out.bias)},
        **blocks,
    }


def test_spatial_transformer_audio_parity(rng):
    """Per-frame GN + self-attn + AUDIO cross-attn reshape (b f s d →
    (b f) s d) + GEGLU FF."""
    tm = randomize_(TSpatial(16, heads=4, dim_head=4, cross_dim=12,
                             add_audio_layer=True, groups=4), seed=2)
    x = torch.tensor(rng.standard_normal((2, 16, 3, 8, 8)), dtype=torch.float32)
    audio = torch.tensor(rng.standard_normal((2, 3, 5, 12)), dtype=torch.float32)
    with torch.no_grad():
        ref = tm(x, audio)

    fm = fx.SpatialTransformer(16, 4, 4, 12, True, norm_groups=4)
    params = {"params": _spatial_params(tm)}
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    out = fm.apply(params, xj, jnp.asarray(audio.numpy()))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)), ref.numpy(),
        atol=3e-5, rtol=1e-5,
    )


def test_temporal_module_parity(rng):
    """Across-frame attention per spatial location with interleaved
    sin/cos positional encoding; single-transpose layout optimization must
    be activation-equivalent to the reference's per-attention reshapes."""
    tm = randomize_(TTemporal(16, heads=4, groups=4), seed=3)
    x = torch.tensor(rng.standard_normal((2, 16, 4, 4, 4)), dtype=torch.float32)
    with torch.no_grad():
        ref = tm(x)

    tt = tm.temporal_transformer
    blk = tt.transformer_blocks[0]
    bp = {}
    for j in range(2):
        a = blk.attention_blocks[j]
        bp[f"transformer_blocks_0_attention_blocks_{j}"] = {"attn": {
            "to_q": {"kernel": t2j_lin(a.to_q.weight)},
            "to_k": {"kernel": t2j_lin(a.to_k.weight)},
            "to_v": {"kernel": t2j_lin(a.to_v.weight)},
            "to_out_0": {"kernel": t2j_lin(a.to_out[0].weight),
                         "bias": npy(a.to_out[0].bias)},
        }}
        bp[f"transformer_blocks_0_norms_{j}"] = {
            "scale": npy(blk.norms[j].weight), "bias": npy(blk.norms[j].bias)}
    params = {"params": {
        "norm": {"scale": npy(tt.norm.weight), "bias": npy(tt.norm.bias)},
        "proj_in": {"kernel": t2j_lin(tt.proj_in.weight), "bias": npy(tt.proj_in.bias)},
        "proj_out": {"kernel": t2j_lin(tt.proj_out.weight), "bias": npy(tt.proj_out.bias)},
        "transformer_blocks_0_ff_norm": {"scale": npy(blk.ff_norm.weight),
                                         "bias": npy(blk.ff_norm.bias)},
        "transformer_blocks_0_ff": {
            "net_0_proj": {"kernel": t2j_lin(blk.ff.net[0].proj.weight),
                           "bias": npy(blk.ff.net[0].proj.bias)},
            "net_2": {"kernel": t2j_lin(blk.ff.net[2].weight),
                      "bias": npy(blk.ff.net[2].bias)},
        },
        **bp,
    }}
    mm = MotionModuleConfig(num_attention_heads=4, num_transformer_block=1)
    fm = fx.TemporalModule(16, mm, norm_groups=4)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    out = fm.apply(params, xj)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)), ref.numpy(),
        atol=3e-5, rtol=1e-5,
    )


def test_unet3d_full_parity(rng):
    """Full tiny flagship-topology UNet through convert_unet: one forward,
    torch (B,C,F,H,W) vs flax (B,F,H,W,C)."""
    tm = randomize_(TorchUNet3D(), seed=4)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    loaded = convert_unet(sd, in_channels=13, out_channels=4,
                          cross_attention_dim=16)

    cfg = UNet3DConfig(
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        norm_num_groups=8, cross_attention_dim=16, attention_head_dim=4,
        motion_module=MotionModuleConfig(num_attention_heads=4,
                                         num_transformer_block=1),
    )
    model = fx.UNet3DConditionModel(cfg)
    sample = rng.standard_normal((2, 13, 4, 8, 8)).astype(np.float32)
    audio = rng.standard_normal((2, 4, 5, 16)).astype(np.float32)
    tvec = np.array([17, 503])

    init = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(np.transpose(sample, (0, 2, 3, 4, 1))),
        jnp.asarray(tvec), jnp.asarray(audio),
    )
    params = merge_params(init, loaded)
    # every torch weight must have landed (no silent init fallbacks)
    n_loaded = len(jax.tree.leaves(loaded))
    n_init = len(jax.tree.leaves(init))
    assert n_loaded == n_init, (n_loaded, n_init)

    with torch.no_grad():
        ref = tm(torch.tensor(sample), torch.tensor(tvec),
                 torch.tensor(audio))
    out = model.apply(
        params, jnp.asarray(np.transpose(sample, (0, 2, 3, 4, 1))),
        jnp.asarray(tvec), jnp.asarray(audio),
    )
    out_t = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out_t, ref.numpy(), atol=2e-4, rtol=1e-4)


def test_vae_parity(rng):
    """Encode moments + decode through convert_vae, incl. the asymmetric
    (0,1) downsample padding and the single-head mid attention."""
    tm = randomize_(TorchVAE(), seed=5)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    loaded = convert_vae(sd)

    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                    norm_num_groups=4)
    model = AutoencoderKL(cfg)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      jax.random.PRNGKey(1))
    params = merge_params(init, loaded)
    assert len(jax.tree.leaves(loaded)) == len(jax.tree.leaves(init))

    with torch.no_grad():
        ref_moments = tm.encode_moments(torch.tensor(x))
    mean, logvar = model.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), method="moments")
    got = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1)
    ref_m = np.transpose(ref_moments.numpy(), (0, 2, 3, 1))
    # logvar clip only differs outside [-30, 20] — random weights stay inside
    np.testing.assert_allclose(got, ref_m, atol=5e-5, rtol=1e-4)

    z = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.tensor(z))
    dec = model.apply(params, jnp.asarray(np.transpose(z, (0, 2, 3, 1))),
                      method="decode")
    np.testing.assert_allclose(
        np.transpose(np.asarray(dec), (0, 3, 1, 2)), ref_dec.numpy(),
        atol=5e-5, rtol=1e-4,
    )
