"""Model-zoo structural tests: CodeFormer/VQGAN, LPIPS/VGG, HyperIQA,
VideoViT/TREPA, SyncNetS on CPU-sized configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentsync_tpu.utils.params import fast_init


def test_codeformer_block_indices_match_reference():
    """The fuse skip indices hard-coded upstream must land on the right
    block kinds for the 512px geometry (ref:codeformer_arch.py:243-246)."""
    from latentsync_tpu.models.codeformer import (
        CodeFormer,
        encoder_block_specs,
        generator_block_specs,
    )

    enc = encoder_block_specs(64, (1, 2, 2, 4, 4, 8), 2, 512, (16,), 256)
    gen = generator_block_specs(64, (1, 2, 2, 4, 4, 8), 2, 512, (16,), 256)
    for f, idx in CodeFormer.FUSE_ENCODER.items():
        assert enc[idx][0] == "res", (f, idx, enc[idx])
        assert enc[idx][1] == 64 * CodeFormer.CHANNEL_MULT[f], (f, enc[idx])
    for f, idx in CodeFormer.FUSE_GENERATOR.items():
        assert gen[idx][0] == "res", (f, idx, gen[idx])
        assert gen[idx][1] == 64 * CodeFormer.CHANNEL_MULT[f], (f, gen[idx])
    # total block counts: 25 each for this geometry
    assert len(enc) == 25 and len(gen) == 25


def test_vqautoencoder_tiny_roundtrip(rng):
    from latentsync_tpu.models.codeformer import VQAutoEncoder

    model = VQAutoEncoder(img_size=32, nf=16, ch_mult=(1, 2), res_blocks=1,
                          attn_resolutions=(16,), codebook_size=32, emb_dim=8)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = fast_init(lambda x: model.init(jax.random.PRNGKey(0), x), x)
    rec, loss, idx = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    assert rec.shape == (1, 32, 32, 3)
    assert idx.shape == (1, 16, 16)
    assert np.isfinite(float(loss))


def test_codeformer_tiny_forward(rng):
    from latentsync_tpu.models.codeformer import CodeFormer

    # shrink via class params: small dims but real 512 geometry is too big
    # for CPU; use a scaled-down geometry with consistent fuse tables
    class TinyCF(CodeFormer):
        FUSE_ENCODER = {"32": 2, "16": 6}
        FUSE_GENERATOR = {"16": 4, "32": 9}
        CHANNELS = {"16": 16, "32": 8}

    model = TinyCF(
        dim_embd=16, n_head=4, n_layers=1, codebook_size=16, latent_size=256,
        connect_list=("32",), img_size=32, nf=8, ch_mult=(1, 2), emb_dim=8,
    )
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    params = fast_init(lambda x: model.init(jax.random.PRNGKey(0), x), x)
    out, logits, lq = jax.jit(lambda p, x: model.apply(p, x, 0.5))(params, x)
    assert out.shape == (1, 32, 32, 3)
    assert logits.shape[0] == 1 and logits.shape[-1] == 16
    assert np.isfinite(np.asarray(out)).all()


def test_adain_matches_definition(rng):
    import torch

    from latentsync_tpu.models.codeformer import adaptive_instance_norm

    c = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    s = rng.standard_normal((2, 8, 8, 4)).astype(np.float32) * 2 + 1
    mine = np.asarray(adaptive_instance_norm(jnp.asarray(c), jnp.asarray(s)))
    # torch recomputation of ref:codeformer_arch.py:11-43
    ct = torch.from_numpy(np.transpose(c, (0, 3, 1, 2)))
    st = torch.from_numpy(np.transpose(s, (0, 3, 1, 2)))

    def ms(f):
        b, ch = f.shape[:2]
        var = f.reshape(b, ch, -1).var(dim=2, unbiased=True) + 1e-5
        return f.reshape(b, ch, -1).mean(dim=2).reshape(b, ch, 1, 1), var.sqrt().reshape(b, ch, 1, 1)

    sm, ss = ms(st)
    cm, cs = ms(ct)
    ref = ((ct - cm) / cs * ss + sm).numpy().transpose(0, 2, 3, 1)
    # ours uses biased variance (N) vs torch unbiased (N-1) — tolerance
    np.testing.assert_allclose(mine, ref, atol=0.05, rtol=0.05)


def test_lpips_properties(rng):
    from latentsync_tpu.models.perceptual import LPIPS

    model = LPIPS()
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32)) * 0.3
    params = fast_init(lambda a, b: model.init(jax.random.PRNGKey(0), a, b), x, x)
    fn = jax.jit(lambda p, a, b: model.apply(p, a, b))
    same = np.asarray(fn(params, x, x))
    assert abs(float(same[0])) < 1e-6  # identical inputs → zero distance
    y = x + 0.5
    diff = np.asarray(fn(params, x, y))
    assert abs(float(diff[0])) > abs(float(same[0]))


def test_vgg16_converter_shapes(rng):
    import torch

    from latentsync_tpu.models.perceptual import VGG16Features, convert_vgg16_torchvision

    # synthetic torchvision-layout state dict
    sd = {}
    layer = 0
    in_ch = 3
    from latentsync_tpu.models.perceptual import VGG16_PLAN

    for spec in VGG16_PLAN:
        if spec == "M":
            layer += 1
            continue
        sd[f"features.{layer}.weight"] = rng.standard_normal(
            (spec, in_ch, 3, 3)).astype(np.float32) * 0.05
        sd[f"features.{layer}.bias"] = np.zeros(spec, np.float32)
        in_ch = spec
        layer += 2
    params = convert_vgg16_torchvision(sd)
    model = VGG16Features()
    x = jnp.zeros((1, 32, 32, 3))
    init = model.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(init["params"]) == jax.tree.structure(
        jax.tree.map(jnp.asarray, params))
    taps = model.apply({"params": jax.tree.map(jnp.asarray, params)}, x)
    assert len(taps) == 5


def test_frechet_distance_zero_for_identical(rng):
    from latentsync_tpu.models.perceptual import frechet_distance

    a = rng.standard_normal((200, 16)).astype(np.float64)
    assert abs(frechet_distance(a, a.copy())) < 1e-6
    b = a + 3.0
    assert frechet_distance(a, b) > 100.0


def test_hyper_iqa_forward(rng):
    from latentsync_tpu.models.hyper_iqa import HyperIQA

    model = HyperIQA()
    x = jnp.asarray(rng.standard_normal((1, 224, 224, 3)).astype(np.float32))
    params = fast_init(lambda x: model.init(jax.random.PRNGKey(0), x), x)
    score = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    assert score.shape == (1,)
    assert np.isfinite(float(score[0]))


def test_trepa_loss(rng):
    from latentsync_tpu.models.videomae import TREPALoss, VideoViTConfig

    cfg = VideoViTConfig(img_size=32, num_frames=4, patch_size=16,
                         tubelet_size=2, embed_dim=32, depth=1, num_heads=2,
                         mlp_ratio=2.0)
    trepa = TREPALoss(config=cfg)
    a = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 3)).astype(np.float32))
    same = float(jax.jit(trepa)(a, a))
    assert same < 1e-10
    b = jnp.asarray(rng.standard_normal((1, 4, 16, 16, 3)).astype(np.float32))
    assert float(jax.jit(trepa)(a, b)) > same


def test_syncnet_s_shapes(rng):
    from latentsync_tpu.eval.sync_eval import SyncNetS

    model = SyncNetS()
    lip = jnp.asarray(rng.standard_normal((2, 5, 224, 224, 3)).astype(np.float32))
    aud = jnp.asarray(rng.standard_normal((2, 13, 20, 1)).astype(np.float32))
    params = fast_init(lambda l, a: model.init(jax.random.PRNGKey(0), l, a), lip, aud)
    lf = jax.jit(lambda p, x: model.apply(p, x, method="forward_lip"))(params, lip)
    af = jax.jit(lambda p, x: model.apply(p, x, method="forward_aud"))(params, aud)
    assert lf.shape == (2, 1024) and af.shape == (2, 1024)


def test_stable_syncnet_full_geometry(rng):
    """Real operating shapes: visual (128, 256, 48), audio (80, 52, 1)
    → both towers reduce to (B, 2048) unit embeddings
    (ref:configs/syncnet/syncnet_16_pixel_attn.yaml comments)."""
    from latentsync_tpu.config import SyncNetConfig
    from latentsync_tpu.models.syncnet import StableSyncNet

    model = StableSyncNet(SyncNetConfig())
    vis = jnp.asarray(rng.standard_normal((1, 128, 256, 48)).astype(np.float32))
    aud = jnp.asarray(rng.standard_normal((1, 80, 52, 1)).astype(np.float32))
    params = fast_init(lambda v, a: model.init(jax.random.PRNGKey(0), v, a), vis, aud)
    v, a = jax.jit(lambda p, vi, au: model.apply(p, vi, au))(params, vis, aud)
    assert v.shape == (1, 2048) and a.shape == (1, 2048)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=1), 1.0, atol=1e-5)
