"""Activation-level parity of the VQGAN autoencoder vs an independent
PyTorch implementation through convert_codeformer — extends the
converter's bijection test (tests/test_convert_codeformer.py) with
numerical evidence for the block-list layout: ResBlock (shortcut named
conv_out upstream), single-head 1×1-conv AttnBlock, asymmetric-pad
Downsample, nearest VectorQuantizer straight-through, and the bare
GroupNorm blocks whose keys are rank-disambiguated.
"""

import numpy as np
import torch

import jax.numpy as jnp

from latentsync_tpu.models.codeformer import VQAutoEncoder
from latentsync_tpu.utils.convert_codeformer import convert_codeformer

from torch_ref_models import TorchVQAutoEncoder, randomize_


def test_vqgan_autoencoder_parity():
    img, nf, ch_mult, emb, K = 32, 8, (1, 2), 16, 16
    t = TorchVQAutoEncoder(img_size=img, nf=nf, ch_mult=ch_mult,
                           res_blocks=2, attn_resolutions=(16,),
                           codebook_size=K, emb_dim=emb)
    randomize_(t, seed=5)
    t.eval()

    f = VQAutoEncoder(img_size=img, nf=nf, ch_mult=ch_mult, res_blocks=2,
                      attn_resolutions=(16,), codebook_size=K, emb_dim=emb)
    params = convert_codeformer(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, img, img, 3)).astype(np.float32)

    with torch.no_grad():
        t_out = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    f_out, _, _ = f.apply(params, jnp.asarray(x))
    f_out = np.transpose(np.asarray(f_out), (0, 3, 1, 2))

    np.testing.assert_allclose(f_out, t_out, atol=5e-4, rtol=5e-4)


def test_vqgan_converter_covers_all_params():
    import jax

    t = TorchVQAutoEncoder()
    params = convert_codeformer(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )
    f = VQAutoEncoder(img_size=32, nf=8, ch_mult=(1, 2), res_blocks=2,
                      attn_resolutions=(16,), codebook_size=16, emb_dim=16)
    init = f.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    got = {"/".join(str(k) for k in p) for p, _ in
           jax.tree_util.tree_flatten_with_path(params)[0]}
    want = {"/".join(str(k) for k in p) for p, _ in
            jax.tree_util.tree_flatten_with_path(init)[0]}
    assert got == want


def test_codeformer_full_parity():
    """Full CodeFormer: encoder taps → transformer head (packed-qkv
    MultiheadAttention vs split Dense) → argmax codebook lookup →
    generator with fuse-SFT injections at w=0.5."""
    from latentsync_tpu.models.codeformer import CodeFormer
    from torch_ref_models import TorchCodeFormer

    kw = dict(img_size=512, nf=2, ch_mult=(1, 2, 2, 4, 4, 8), emb_dim=8,
              codebook_size=16, dim_embd=16, n_head=2, n_layers=2,
              connect_list=("32", "64", "128", "256"))
    t = TorchCodeFormer(**kw)
    randomize_(t, seed=11)
    t.eval()

    f = CodeFormer(dim_embd=16, n_head=2, n_layers=2, codebook_size=16,
                   latent_size=256, connect_list=kw["connect_list"],
                   img_size=512, nf=2, ch_mult=kw["ch_mult"], emb_dim=8)
    params = convert_codeformer(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32)

    with torch.no_grad():
        t_out, t_logits, t_lq = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                                  w=0.5)
    f_out, f_logits, f_lq = f.apply(params, jnp.asarray(x), w=0.5)

    np.testing.assert_allclose(
        np.asarray(f_lq), np.transpose(t_lq.numpy(), (0, 2, 3, 1)),
        atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(f_logits), t_logits.numpy(), atol=5e-4, rtol=5e-4)
    # identical code selection (argmax) — a prerequisite for output parity
    assert (np.asarray(jnp.argmax(f_logits, -1)) ==
            t_logits.numpy().argmax(-1)).all()
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_out), (0, 3, 1, 2)), t_out.numpy(),
        atol=5e-3, rtol=5e-3)


def test_rrdbnet_parity():
    """RealESRGAN RRDBNet at scale 2 (pixel-unshuffled input, both
    upsample convs) vs torch through convert_rrdbnet."""
    from latentsync_tpu.models.rrdbnet import RRDBNet, convert_rrdbnet
    from torch_ref_models import TorchRRDBNet

    t = TorchRRDBNet(num_feat=16, num_block=2, num_grow_ch=8, scale=2)
    randomize_(t, seed=17)
    t.eval()
    params = convert_rrdbnet(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )
    f = RRDBNet(num_feat=16, num_block=2, num_grow_ch=8, scale=2)

    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (1, 24, 20, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    f_out = np.transpose(np.asarray(f.apply(params, jnp.asarray(x))), (0, 3, 1, 2))
    assert f_out.shape == t_out.shape == (1, 3, 48, 40)
    # randomized (untrained) weights blow activations up to ~1e2, so the
    # comparison is rtol-dominated
    np.testing.assert_allclose(f_out, t_out, atol=5e-3, rtol=1e-3)


def test_arcface_parity():
    """ResNetArcFace identity net (IRBlock shared-prelu semantics,
    grayscale input, channel-major flatten) vs torch through
    convert_arcface incl. BatchNorm running stats."""
    from latentsync_tpu.models.rrdbnet import ArcFaceResNet18, convert_arcface
    from torch_ref_models import TorchResNetArcFace

    t = TorchResNetArcFace(layers=(1, 1, 1, 1), feat_hw=2)
    randomize_(t, seed=19)
    g = torch.Generator().manual_seed(20)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()

    variables = convert_arcface(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )
    f = ArcFaceResNet18(layers=(1, 1, 1, 1))

    rng = np.random.default_rng(5)
    # 32² grayscale → maxpool 16 → strides 1,2,2,2 → 2² final map
    x = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        t_out = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    f_out = np.asarray(f.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(f_out, t_out, atol=2e-3, rtol=2e-3)


def test_parsenet_parity():
    """ParseNet (reflection-pad ConvLayers, BN inside NormLayer wrapper,
    global body residual, clipped channel schedule) vs torch through
    convert_parsenet."""
    from latentsync_tpu.models.parsing import ParseNet, convert_parsenet
    from torch_ref_models import TorchParseNet

    t = TorchParseNet(in_size=64, out_size=64, min_feat=16, base=16,
                      res_depth=2, ch_range=(16, 64))
    randomize_(t, seed=29)
    g = torch.Generator().manual_seed(30)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()

    variables = convert_parsenet(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )
    f = ParseNet(in_size=64, out_size=64, min_feat_size=16, base_ch=16,
                 res_depth=2, ch_range=(16, 64))

    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_seg, t_img = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    f_seg, f_img = f.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_seg), (0, 3, 1, 2)), t_seg.numpy(),
        atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(
        np.transpose(np.asarray(f_img), (0, 3, 1, 2)), t_img.numpy(),
        atol=2e-3, rtol=2e-3)


def test_hyperiqa_parity():
    """HyperIQA hypernetwork (conv-generated TargetNet weights in torch
    channel-major flatten order, lda pools, sigmoid MLP) vs torch
    through convert_hyperiqa."""
    from latentsync_tpu.models.hyper_iqa import HyperIQA, convert_hyperiqa
    from torch_ref_models import TorchHyperIQA

    t = TorchHyperIQA()
    randomize_(t, seed=31, scale=0.05)
    g = torch.Generator().manual_seed(32)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()

    variables = convert_hyperiqa(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )
    f = HyperIQA()

    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    f_out = np.asarray(f.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(f_out, t_out[:, 0], atol=1e-3, rtol=1e-3)


def test_videomae_parity():
    """VideoMAEv2 video ViT (tubelet Conv3d patch embed, sinusoid
    positions, packed qkv with separate q/v biases, mean-then-fc_norm
    head) vs torch through convert_videomae."""
    from latentsync_tpu.models.videomae import (
        VideoViT,
        VideoViTConfig,
        convert_videomae,
    )
    from torch_ref_models import TorchVideoMAE

    t = TorchVideoMAE(img=32, frames=4, patch=16, tubelet=2, dim=64,
                      depth=2, heads=4)
    randomize_(t, seed=37, scale=0.05)
    t.eval()
    params = convert_videomae(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )

    cfg = VideoViTConfig(img_size=32, num_frames=4, patch_size=16,
                         tubelet_size=2, embed_dim=64, depth=2,
                         num_heads=4, mlp_ratio=4.0)
    f = VideoViT(cfg)

    rng = np.random.default_rng(9)
    x = rng.uniform(0, 1, (2, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        # torch layout (B, C, T, H, W)
        t_out = t.forward_features(
            torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))).numpy()
    f_out = np.asarray(f.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(f_out, t_out, atol=2e-4, rtol=2e-4)


def test_bisenet_parity():
    """BiSeNet face parser (ResNet18 context path, ARM/FFM attention,
    align_corners bilinear heads) vs torch through convert_bisenet —
    numerical extension of the key-bijection test."""
    from latentsync_tpu.models.parsing import BiSeNet
    from latentsync_tpu.utils.convert_eval import convert_bisenet
    from torch_ref_models import TorchBiSeNet

    t = TorchBiSeNet()
    randomize_(t, seed=47, scale=0.05)
    g = torch.Generator().manual_seed(48)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()
    variables = convert_bisenet(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )
    f = BiSeNet()

    rng = np.random.default_rng(12)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_outs = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    f_outs = f.apply(variables, jnp.asarray(x))
    for fo, to in zip(f_outs, t_outs):
        np.testing.assert_allclose(
            np.transpose(np.asarray(fo), (0, 3, 1, 2)), to.numpy(),
            atol=2e-3, rtol=2e-3)
