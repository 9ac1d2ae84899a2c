"""Int8 conv path (LATENTSYNC_INT8=1): numerical closeness to the f32
path, unchanged param tree, and the raw quantized-conv op itself."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentsync_tpu.ops.qconv import quantized_conv2d


def test_quantized_conv2d_close_to_float():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 12)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(12) * 0.01, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = ref + b
    got = quantized_conv2d(x, k, b, (1, 1), "SAME")
    err = np.abs(np.asarray(got) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() / scale < 0.02, err.mean() / scale


def test_quantized_conv2d_per_channel_scales():
    """Channels with wildly different weight magnitudes stay accurate —
    the per-output-channel scale is doing its job."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    k = np.concatenate([
        rng.standard_normal((3, 3, 4, 2)) * 1.0,
        rng.standard_normal((3, 3, 4, 2)) * 1e-3,
    ], axis=-1).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = quantized_conv2d(x, jnp.asarray(k), None, (1, 1), "SAME")
    for c in range(4):
        r = np.asarray(ref[..., c])
        g = np.asarray(got[..., c])
        denom = max(np.abs(r).mean(), 1e-12)
        assert np.abs(g - r).mean() / denom < 0.03, c


def test_quantized_conv2d_zero_weights():
    x = jnp.ones((1, 4, 4, 3))
    k = jnp.zeros((3, 3, 3, 5))
    out = quantized_conv2d(x, k, None, (1, 1), "SAME")
    assert np.all(np.asarray(out) == 0.0)


def test_unet_int8_path(monkeypatch):
    """LATENTSYNC_INT8=1: same param tree, forward runs, output within a
    few percent of the float path (random weights)."""
    from latentsync_tpu.config import MotionModuleConfig, UNet3DConfig
    from latentsync_tpu.models.unet3d import UNet3DConditionModel
    from latentsync_tpu.utils.params import fast_init

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
    rng = np.random.default_rng(2)
    sample = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 13)), jnp.float32) * 0.3
    audio = jnp.asarray(rng.standard_normal((1, 4, 10, 16)), jnp.float32) * 0.3
    t = jnp.asarray([500])

    monkeypatch.delenv("LATENTSYNC_INT8", raising=False)
    params = fast_init(
        lambda s, tt, a: model.init(jax.random.PRNGKey(0), s, tt, a),
        sample, t, audio, seed=5,
    )
    ref = np.asarray(model.apply(params, sample, t, audio))

    monkeypatch.setenv("LATENTSYNC_INT8", "1")
    params8 = fast_init(
        lambda s, tt, a: model.init(jax.random.PRNGKey(0), s, tt, a),
        sample, t, audio, seed=5,
    )
    # identical tree: int8 routing keeps nn.Conv's {kernel, bias} layout
    assert jax.tree.structure(params8) == jax.tree.structure(params)
    got = np.asarray(model.apply(params, sample, t, audio))

    denom = np.abs(ref).mean()
    rel = np.abs(got - ref).mean() / max(denom, 1e-9)
    assert rel < 0.10, rel
    # and it actually perturbs the output (the int8 path is live)
    assert not np.allclose(got, ref)


def test_vae_int8_path(monkeypatch):
    """VAE convs route through QConv: identical tree, bounded error."""
    from latentsync_tpu.config import VAEConfig
    from latentsync_tpu.models.vae import AutoencoderKL
    from latentsync_tpu.utils.params import fast_init

    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                    norm_num_groups=4)
    vae = AutoencoderKL(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32) * 0.4

    monkeypatch.delenv("LATENTSYNC_INT8", raising=False)
    params = fast_init(
        lambda xx: vae.init(jax.random.PRNGKey(0), xx, jax.random.PRNGKey(1)),
        x, seed=7)
    z_ref = vae.apply(params, x, method="encode")
    img_ref = np.asarray(vae.apply(params, z_ref, method="decode"))

    monkeypatch.setenv("LATENTSYNC_INT8", "1")
    params8 = fast_init(
        lambda xx: vae.init(jax.random.PRNGKey(0), xx, jax.random.PRNGKey(1)),
        x, seed=7)
    assert jax.tree.structure(params8) == jax.tree.structure(params)
    z8 = vae.apply(params, x, method="encode")
    img8 = np.asarray(vae.apply(params, z8, method="decode"))

    rel = np.abs(img8 - img_ref).mean() / max(np.abs(img_ref).mean(), 1e-9)
    assert rel < 0.15, rel
    assert not np.allclose(img8, img_ref)


def test_qdense_int8_close(monkeypatch):
    from latentsync_tpu.ops.qconv import QDense

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, 7, 32)), jnp.float32)
    m = QDense(16)
    monkeypatch.delenv("LATENTSYNC_INT8_DENSE", raising=False)
    params = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(params, x))
    monkeypatch.setenv("LATENTSYNC_INT8_DENSE", "1")
    got = np.asarray(m.apply(params, x))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).mean() / max(np.abs(ref).mean(), 1e-9)
    assert 0 < rel < 0.02, rel


def test_unet_int8_dense_path(monkeypatch):
    """Both int8 gates on: tree unchanged, output within a few percent."""
    from latentsync_tpu.config import MotionModuleConfig, UNet3DConfig
    from latentsync_tpu.models.unet3d import UNet3DConditionModel
    from latentsync_tpu.utils.params import fast_init

    cfg = UNet3DConfig(
        block_out_channels=(32, 64, 64, 64), layers_per_block=1,
        norm_num_groups=8, cross_attention_dim=16, attention_head_dim=4,
        motion_module=MotionModuleConfig(num_attention_heads=4,
                                         num_transformer_block=1),
    )
    model = UNet3DConditionModel(cfg)
    rng = np.random.default_rng(5)
    sample = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 13)), jnp.float32) * 0.3
    audio = jnp.asarray(rng.standard_normal((1, 4, 10, 16)), jnp.float32) * 0.3
    t = jnp.asarray([500])

    monkeypatch.delenv("LATENTSYNC_INT8", raising=False)
    monkeypatch.delenv("LATENTSYNC_INT8_DENSE", raising=False)
    params = fast_init(
        lambda s, tt, a: model.init(jax.random.PRNGKey(0), s, tt, a),
        sample, t, audio, seed=6)
    ref = np.asarray(model.apply(params, sample, t, audio))

    monkeypatch.setenv("LATENTSYNC_INT8", "1")
    monkeypatch.setenv("LATENTSYNC_INT8_DENSE", "1")
    params8 = fast_init(
        lambda s, tt, a: model.init(jax.random.PRNGKey(0), s, tt, a),
        sample, t, audio, seed=6)
    assert jax.tree.structure(params8) == jax.tree.structure(params)
    got = np.asarray(model.apply(params, sample, t, audio))
    rel = np.abs(got - ref).mean() / max(np.abs(ref).mean(), 1e-9)
    assert rel < 0.12, rel


def test_int8_paths_have_straight_through_gradients(monkeypatch):
    """Training with the int8 flags on must produce float-path gradients
    (round() alone would zero them)."""
    from latentsync_tpu.ops.qconv import QConv, QDense

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    conv = QConv(6, (3, 3), padding=1)
    monkeypatch.delenv("LATENTSYNC_INT8", raising=False)
    params = conv.init(jax.random.PRNGKey(0), x)

    def loss_float(p):
        return jnp.sum(conv.apply(p, x) ** 2)

    g_float = jax.grad(loss_float)(params)
    monkeypatch.setenv("LATENTSYNC_INT8", "1")
    g_int8 = jax.grad(loss_float)(params)
    for a, b in zip(jax.tree.leaves(g_int8), jax.tree.leaves(g_float)):
        assert np.abs(np.asarray(a)).max() > 0
        # STE backward ~ float backward; the cotangent carries the
        # forward's quantization error, so compare loosely
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.6, atol=0.6)

    xd = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
    dense = QDense(8)
    monkeypatch.delenv("LATENTSYNC_INT8_DENSE", raising=False)
    dparams = dense.init(jax.random.PRNGKey(1), xd)

    def dloss(p):
        return jnp.sum(dense.apply(p, xd) ** 2)

    gd_float = jax.grad(dloss)(dparams)
    monkeypatch.setenv("LATENTSYNC_INT8_DENSE", "1")
    gd_int8 = jax.grad(dloss)(dparams)
    for a, b in zip(jax.tree.leaves(gd_int8), jax.tree.leaves(gd_float)):
        assert np.abs(np.asarray(a)).max() > 0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.6, atol=0.6)


def test_qmm_pallas_matches_xla_int8_scheme():
    """The fused Pallas kernel (ops/qmm) implements the SAME quantization
    scheme as the XLA dense path — identical scales, int32 accumulate —
    so in interpret mode the two agree to float rounding."""
    from latentsync_tpu.ops.qconv import _qdense_ste
    from latentsync_tpu.ops.qmm import quantized_matmul_pallas

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((48, 40)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((40, 96)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((96,)), jnp.float32)
    ref = np.asarray(_qdense_ste(x, w, b))
    got = np.asarray(quantized_matmul_pallas(x, w, b, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_qmm_pallas_ragged_edges():
    """M/N not divisible by the block sizes: edge blocks are masked."""
    from latentsync_tpu.ops.qconv import _qdense_ste
    from latentsync_tpu.ops.qmm import quantized_matmul_pallas

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((130, 24)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((24, 136)), jnp.float32)
    ref = np.asarray(_qdense_ste(x, w, None))
    got = np.asarray(quantized_matmul_pallas(x, w, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_qdense_pallas_mode(monkeypatch):
    """LATENTSYNC_INT8_DENSE=pallas routes QDense through ops/qmm with
    the straight-through backward intact."""
    from latentsync_tpu.ops.qconv import QDense

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    m = QDense(16)
    monkeypatch.delenv("LATENTSYNC_INT8_DENSE", raising=False)
    params = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(params, x))

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    # same quantization scheme as mode "1" → same forward values → the
    # straight-through backwards must agree exactly (same cotangents
    # through the same float vjp)
    monkeypatch.setenv("LATENTSYNC_INT8_DENSE", "1")
    g_xla = jax.grad(loss)(params)
    monkeypatch.setenv("LATENTSYNC_INT8_DENSE", "pallas")
    got = np.asarray(m.apply(params, x))
    rel = np.abs(got - ref).mean() / max(np.abs(ref).mean(), 1e-9)
    assert 0 < rel < 0.02, rel
    g_pallas = jax.grad(loss)(params)
    for a, b in zip(jax.tree.leaves(g_pallas), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
