"""Activation-level parity of StableSyncNet vs an independent PyTorch
implementation (tests/torch_ref_models.py) through the
convert_stable_syncnet weight converter — same pattern as
tests/test_parity_unet_vae.py.

Covers the structural hazards specific to this model: interleaved
resnet/attention down_blocks indexing, the asymmetric stride-2 padding
(ref:stable_syncnet.py:104-109, incl. the [2,1]/[1,2] tuple factors of
the real configs), biased q/k/v attention, GEGLU FF key layout
(ff.net.0.proj / ff.net.2), and the final GN→ReLU→L2-normalize head.
"""

import numpy as np
import torch

import jax.numpy as jnp

from latentsync_tpu.config import SyncNetConfig, SyncNetEncoderConfig
from latentsync_tpu.models.syncnet import StableSyncNet
from latentsync_tpu.utils.convert import convert_stable_syncnet

from torch_ref_models import StableSyncNet as TStableSyncNet, randomize_


def test_stable_syncnet_parity():
    # small but structurally complete: attention block, channel change
    # (conv_shortcut), an asymmetric (1,2) factor — and factors that
    # reduce spatial to exactly 1×1, because the torch flatten is
    # channel-major while flax's is spatial-major (they only agree on a
    # 1×1 map, which every real config produces)
    aud = dict(in_channels=1, block_out_channels=(32, 64, 64),
               downsample_factors=(2, 2, 4), attn_blocks=(0, 1, 0))
    vis = dict(in_channels=6, block_out_channels=(32, 64, 64),
               downsample_factors=((1, 2), 4, 4), attn_blocks=(0, 1, 0))

    tmodel = TStableSyncNet(
        (aud["in_channels"], list(aud["block_out_channels"]),
         [list(f) if isinstance(f, tuple) else f for f in aud["downsample_factors"]],
         list(aud["attn_blocks"])),
        (vis["in_channels"], list(vis["block_out_channels"]),
         [list(f) if isinstance(f, tuple) else f for f in vis["downsample_factors"]],
         list(vis["attn_blocks"])),
    )
    randomize_(tmodel, seed=7)
    tmodel.eval()

    cfg = SyncNetConfig(
        audio_encoder=SyncNetEncoderConfig(**aud),
        visual_encoder=SyncNetEncoderConfig(**vis),
    )
    fmodel = StableSyncNet(cfg)
    params = convert_stable_syncnet(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    )

    rng = np.random.default_rng(0)
    frames = rng.standard_normal((2, 16, 32, 6)).astype(np.float32)
    mels = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)

    with torch.no_grad():
        tv, ta = tmodel(
            torch.from_numpy(np.transpose(frames, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(mels, (0, 3, 1, 2))),
        )
    fv, fa = fmodel.apply(params, jnp.asarray(frames), jnp.asarray(mels))

    np.testing.assert_allclose(np.asarray(fv), tv.numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(fa), ta.numpy(), atol=2e-4, rtol=2e-4)


def test_stable_syncnet_converter_covers_all_params():
    """Converted tree covers exactly the init tree (no silently-missing
    leaves that merge_params would paper over)."""
    import jax

    aud = dict(in_channels=1, block_out_channels=(32, 64),
               downsample_factors=(2, 2), attn_blocks=(0, 1))
    cfg = SyncNetConfig(
        audio_encoder=SyncNetEncoderConfig(**aud),
        visual_encoder=SyncNetEncoderConfig(**aud, ),
    )
    # build the matching torch model to produce a full state dict
    t = TStableSyncNet(
        (1, [32, 64], [2, 2], [0, 1]),
        (1, [32, 64], [2, 2], [0, 1]),
    )
    params = convert_stable_syncnet(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )
    f = StableSyncNet(cfg)
    init = f.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
                  jnp.zeros((1, 16, 16, 1)))
    got = {"/".join(str(k) for k in p) for p, _ in
           jax.tree_util.tree_flatten_with_path(params)[0]}
    want = {"/".join(str(k) for k in p) for p, _ in
            jax.tree_util.tree_flatten_with_path(init)[0]}
    assert got == want


def test_syncnet_s_eval_scorer_parity():
    """The classic eval SyncNet S — the model behind the headline
    'SyncNet confidence' metric — vs its torch layout through
    convert_syncnet_s (incl. BatchNorm running statistics)."""
    from latentsync_tpu.eval.sync_eval import SyncNetS
    from latentsync_tpu.utils.convert_eval import convert_syncnet_s

    from torch_ref_models import TorchSyncNetS

    t = TorchSyncNetS()
    randomize_(t, seed=9)
    # BN running stats must be valid (var > 0) and non-trivial
    g = torch.Generator().manual_seed(10)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                              torch.nn.BatchNorm3d)):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()

    variables = convert_syncnet_s(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )

    rng = np.random.default_rng(1)
    aud = rng.standard_normal((2, 13, 20, 1)).astype(np.float32)
    lip = rng.standard_normal((2, 5, 224, 224, 3)).astype(np.float32)

    f = SyncNetS()
    with torch.no_grad():
        ta = t.forward_aud(torch.from_numpy(np.transpose(aud, (0, 3, 1, 2))))
        tl = t.forward_lip(torch.from_numpy(
            np.transpose(lip, (0, 4, 1, 2, 3))))
    fa = f.apply(variables, jnp.asarray(aud), method=SyncNetS.forward_aud)
    fl = f.apply(variables, jnp.asarray(lip), method=SyncNetS.forward_lip)

    np.testing.assert_allclose(np.asarray(fa), ta.numpy(), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(fl), tl.numpy(), atol=2e-3, rtol=2e-3)


def test_s3fd_parity():
    """S3FD backbone+heads vs the exact torch layout through
    convert_s3fd — covers the atrous fc6 (dilation 6) and the single
    ceil_mode pool (odd 46-pixel input exercises it)."""
    from latentsync_tpu.models.face_detection import S3FD
    from latentsync_tpu.utils.convert_eval import convert_s3fd

    from torch_ref_models import TorchS3FD

    t = TorchS3FD()
    randomize_(t, seed=13)
    t.eval()
    params = convert_s3fd(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )

    rng = np.random.default_rng(2)
    # 184 = 8·23: odd 46×46 map at pool3 → ceil branch taken
    x = rng.standard_normal((1, 184, 184, 3)).astype(np.float32) * 50

    f = S3FD()
    with torch.no_grad():
        t_cls, t_box = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    f_cls, f_box = f.apply(params, jnp.asarray(x))

    assert len(f_cls) == len(t_cls) == 6
    for i in range(6):
        np.testing.assert_allclose(
            np.transpose(np.asarray(f_cls[i]), (0, 3, 1, 2)),
            t_cls[i].numpy(), atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(
            np.transpose(np.asarray(f_box[i]), (0, 3, 1, 2)),
            t_box[i].numpy(), atol=2e-3, rtol=2e-3)


def test_retinaface_parity():
    """MobileNet0.25 RetinaFace (depthwise stages, FPN nearest-merge,
    SSH branches, 3-scale heads) vs torch through convert_retinaface."""
    from latentsync_tpu.models.retinaface import (
        RetinaFaceMobile,
        convert_retinaface,
    )
    from torch_ref_models import TorchRetinaFaceMobile

    t = TorchRetinaFaceMobile()
    randomize_(t, seed=23)
    g = torch.Generator().manual_seed(24)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()
    variables = convert_retinaface(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )

    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 96, 128, 3)).astype(np.float32) * 20

    f = RetinaFaceMobile()
    with torch.no_grad():
        t_outs = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    f_outs = f.apply(variables, jnp.asarray(x))

    for lvl in range(3):
        for k in range(3):
            np.testing.assert_allclose(
                np.transpose(np.asarray(f_outs[lvl][k]), (0, 3, 1, 2)),
                t_outs[lvl][k].numpy(), atol=2e-3, rtol=2e-3)


def test_retinaface_resnet50_parity():
    """ResNet50 RetinaFace — the reference restoration default
    (ref:facelib/utils/face_restoration_helper.py:61) — vs torch through
    convert_retinaface_resnet50 (VERDICT r3 missing #1)."""
    from latentsync_tpu.models.retinaface import (
        RetinaFaceResNet50,
        convert_retinaface_resnet50,
    )
    from torch_ref_models import TorchRetinaFaceResNet50

    t = TorchRetinaFaceResNet50()
    randomize_(t, seed=31)
    g = torch.Generator().manual_seed(32)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()
    variables = convert_retinaface_resnet50(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 96, 128, 3)).astype(np.float32) * 20

    f = RetinaFaceResNet50()
    with torch.no_grad():
        t_outs = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    f_outs = f.apply(variables, jnp.asarray(x))

    for lvl in range(3):
        for k in range(3):
            np.testing.assert_allclose(
                np.transpose(np.asarray(f_outs[lvl][k]), (0, 3, 1, 2)),
                t_outs[lvl][k].numpy(), atol=3e-3, rtol=3e-3)


def test_wav2lip_syncnet_parity():
    """The Wav2Lip-style ablation SyncNet (21 visual / 16 audio Conv2d
    blocks with pre-activation residuals) vs torch through
    convert_wav2lip_syncnet at the real input geometry."""
    from latentsync_tpu.models.syncnet import (
        Wav2LipSyncNet,
        convert_wav2lip_syncnet,
    )
    from torch_ref_models import TorchWav2LipSyncNet

    t = TorchWav2LipSyncNet()
    randomize_(t, seed=41, scale=0.05)
    g = torch.Generator().manual_seed(42)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()
    variables = convert_wav2lip_syncnet(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )
    f = Wav2LipSyncNet()

    rng = np.random.default_rng(10)
    frames = rng.standard_normal((2, 128, 256, 15)).astype(np.float32)
    mels = rng.standard_normal((2, 80, 16, 1)).astype(np.float32)
    with torch.no_grad():
        tv, ta = t(torch.from_numpy(np.transpose(frames, (0, 3, 1, 2))),
                   torch.from_numpy(np.transpose(mels, (0, 3, 1, 2))))
    fv, fa = f.apply(variables, jnp.asarray(frames), jnp.asarray(mels))
    np.testing.assert_allclose(np.asarray(fv), tv.numpy(), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(fa), ta.numpy(), atol=2e-3, rtol=2e-3)


def test_fan_parity():
    """2D-FAN stacked hourglass landmark regressor vs the face_alignment
    torch layout through convert_fan — validates the converter NUMBERS
    (the pre-existing test only checked key bijection)."""
    from latentsync_tpu.models.face_detection import FAN2D
    from latentsync_tpu.utils.convert_eval import convert_fan
    from torch_ref_models import TorchFAN

    t = TorchFAN(num_modules=2)
    randomize_(t, seed=43, scale=0.05)
    g = torch.Generator().manual_seed(44)
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    t.eval()
    variables = convert_fan(
        {k: v.detach().numpy() for k, v in t.state_dict().items()}
    )
    f = FAN2D(num_modules=2)

    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_outs = t(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    f_outs = f.apply(variables, jnp.asarray(x))
    assert len(f_outs) == len(t_outs) == 2
    for fo, to in zip(f_outs, t_outs):
        np.testing.assert_allclose(
            np.transpose(np.asarray(fo), (0, 3, 1, 2)), to.numpy(),
            atol=2e-3, rtol=2e-3)
