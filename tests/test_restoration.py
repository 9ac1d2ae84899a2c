"""Restoration-stack tests: degradations, matlab imresize, staged
trainers (tiny), tiled upsampler, metrics, registry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_matlab_imresize_downscale_properties(rng):
    from latentsync_tpu.training.degradations import imresize_matlab

    img = rng.random((32, 32, 3))
    small = imresize_matlab(img, 0.5)
    assert small.shape == (16, 16, 3)
    # antialiased downscale preserves the mean closely
    assert abs(small.mean() - img.mean()) < 0.02
    up = imresize_matlab(img, 2.0)
    assert up.shape == (64, 64, 3)


def test_blind_degrader_produces_pair(rng):
    from latentsync_tpu.training.degradations import (
        BlindDegradationConfig,
        BlindDegrader,
    )

    deg = BlindDegrader(BlindDegradationConfig(gt_size=64, blur_kernel_size=11))
    gt_in = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    lq, gt = deg(gt_in)
    assert lq.shape == gt.shape == (64, 64, 3)
    # degradation must actually degrade
    assert np.abs(lq.astype(int) - gt.astype(int)).mean() > 1.0


def test_psnr_ssim(rng):
    from latentsync_tpu.training.metrics import psnr, ssim

    a = (rng.random((32, 32, 3)) * 255).astype(np.float32)
    assert psnr(a, a) > 80
    assert ssim(a, a) > 0.999
    b = a + rng.normal(0, 25, a.shape).astype(np.float32)
    assert psnr(a, b) < 25
    assert ssim(a, b) < ssim(a, a) - 0.01


def test_registry_build():
    from latentsync_tpu.training.registry import (
        ARCH_REGISTRY,
        build_from_options,
        register_builtin,
    )

    register_builtin()
    model = build_from_options(
        ARCH_REGISTRY,
        {"type": "VQAutoEncoder", "img_size": 32, "nf": 8,
         "ch_mult": (1, 2), "res_blocks": 1, "emb_dim": 8, "codebook_size": 8},
    )
    assert model.codebook_size == 8
    with pytest.raises(KeyError):
        build_from_options(ARCH_REGISTRY, {"type": "Nope"})


def test_vqgan_trainer_step(rng):
    from latentsync_tpu.models.codeformer import VQAutoEncoder, VQGANDiscriminator
    from latentsync_tpu.training.restoration_trainer import VQGANTrainer
    from latentsync_tpu.utils.params import fast_init
    import optax

    model = VQAutoEncoder(img_size=16, nf=8, ch_mult=(1, 2), res_blocks=1,
                          attn_resolutions=(8,), codebook_size=8, emb_dim=4)
    disc = VQGANDiscriminator(ndf=8, n_layers=2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    g_params = fast_init(lambda x: model.init(jax.random.PRNGKey(0), x), x)
    d_params = fast_init(lambda x: disc.init(jax.random.PRNGKey(1), x), x, seed=1)
    g_tx = optax.adam(1e-4)
    d_tx = optax.adam(1e-4)
    trainer = VQGANTrainer(model, disc)
    step = trainer.make_steps(g_tx, d_tx)
    g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)
    g_params, d_params, g_opt, d_opt, m = step(
        g_params, d_params, g_opt, d_opt, {"gt": x})
    for k, v in m.items():
        assert np.isfinite(float(v)), k


def test_gan_loss_modes():
    from latentsync_tpu.training.losses import gan_loss

    pred = jnp.asarray([2.0, -2.0])
    for mode in ("vanilla", "lsgan", "hinge", "wgan"):
        r = float(gan_loss(pred, True, mode))
        f = float(gan_loss(pred, False, mode))
        assert np.isfinite(r) and np.isfinite(f)
    # hinge: confident real scores → low real loss
    assert float(gan_loss(jnp.asarray([5.0]), True, "hinge")) == 0.0


def test_syncnet_detector_tracks(rng):
    from latentsync_tpu.eval.syncnet_detect import SyncNetDetector

    # static scene (random per-frame noise would cut a shot at every
    # frame, and sub-min_track shots are skipped like the reference)
    frame = (rng.random((120, 100, 3)) * 60 + 100).astype(np.uint8)
    frames = np.repeat(frame[None], 30, axis=0)
    det = SyncNetDetector(min_track=10, min_face_size=0)  # tiny test frame
    tracks = det.extract_tracks(frames)
    assert len(tracks) >= 1  # static-heuristic box persists across frames
    assert len(tracks[0].frames) == 30  # gap-filled full-length track
    crops = det.crop_track(frames, tracks[0], size=64)
    assert crops.shape[1:] == (64, 64, 3)


def test_parsenet_and_faceparser(rng):
    from latentsync_tpu.models.parsing import FaceParser, ParseNet
    from latentsync_tpu.utils.params import fast_init

    model = ParseNet()
    x = jnp.zeros((1, 64, 64, 3))
    # shapes only at reduced size via direct apply
    params = fast_init(lambda x: model.init(jax.random.PRNGKey(0), x), x)
    seg, img = model.apply(params, x)
    assert seg.shape == (1, 64, 64, 19) and img.shape == (1, 64, 64, 3)


def test_rrdbnet_upscale(rng):
    from latentsync_tpu.models.rrdbnet import RRDBNet
    from latentsync_tpu.utils.params import fast_init

    model = RRDBNet(num_feat=8, num_block=1, num_grow_ch=4, scale=2)
    x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    params = fast_init(lambda x: model.init(jax.random.PRNGKey(0), x), x)
    out = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    assert out.shape == (1, 32, 32, 3)
