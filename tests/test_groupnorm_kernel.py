"""Fused GroupNorm+SiLU Pallas kernel vs flax reference (interpret mode
on CPU; the compiled path runs on TPU)."""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from latentsync_tpu.ops.groupnorm import group_norm_silu, group_norm_silu_streaming


def test_matches_flax_groupnorm_silu(rng):
    n_samples, rows, c, groups = 3, 16, 64, 8
    x = jnp.asarray(rng.standard_normal((n_samples * rows, c)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    out = group_norm_silu(x, scale, bias, groups, rows, interpret=True)

    gn = nn.GroupNorm(groups, epsilon=1e-5)
    params = {"params": {"scale": scale, "bias": bias}}
    ref = nn.silu(gn.apply(params, x.reshape(n_samples, rows, c)))
    ref = np.asarray(ref).reshape(n_samples * rows, c)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_streaming_matches_flax_groupnorm_silu(rng):
    """Two-phase streaming kernel (large cross-frame samples that do not
    fit one VMEM block) == flax GroupNorm + SiLU."""
    n_samples, rows, c, groups = 2, 64, 32, 4
    x = jnp.asarray(rng.standard_normal((n_samples * rows, c)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    out = group_norm_silu_streaming(
        x, scale, bias, groups, rows, block_rows=16, interpret=True
    )

    gn = nn.GroupNorm(groups, epsilon=1e-5)
    params = {"params": {"scale": scale, "bias": bias}}
    ref = nn.silu(gn.apply(params, x.reshape(n_samples, rows, c)))
    ref = np.asarray(ref).reshape(n_samples * rows, c)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


def test_streaming_bf16_dtype(rng):
    x = jnp.asarray(rng.standard_normal((32, 32)).astype(np.float32)).astype(jnp.bfloat16)
    out = group_norm_silu_streaming(
        x, jnp.ones(32), jnp.zeros(32), groups=4, rows_per_sample=16,
        block_rows=8, interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    o = np.asarray(out, np.float32)
    assert np.isfinite(o).all()


def test_no_silu_and_bf16(rng):
    x = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.ones(32)
    bias = jnp.zeros(32)
    out = group_norm_silu(x, scale, bias, groups=4, rows_per_sample=8,
                          silu=False, interpret=True)
    assert out.dtype == jnp.bfloat16
    # normalized: near-zero mean, unit variance per group
    o = np.asarray(out, np.float32).reshape(8, 4, 8)
    assert abs(o.mean()) < 0.05
    assert abs(o.var() - 1.0) < 0.15


def test_pallas_gn_env_path_cpu_fallback(monkeypatch, rng):
    """LATENTSYNC_PALLAS_GN=1 routes the UNet norms through
    FusedGroupNorm; off-TPU that falls back to identical XLA math, so
    outputs must match the default path exactly."""
    import jax

    from latentsync_tpu.models.unet3d import ResnetBlock3D

    x = jnp.asarray(rng.standard_normal((1, 2, 4, 4, 8)).astype(np.float32))
    temb = jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32))
    blk = ResnetBlock3D(out_channels=8, temb_channels=16, groups=4)
    params = blk.init(jax.random.PRNGKey(0), x, temb)
    base = blk.apply(params, x, temb)
    monkeypatch.setenv("LATENTSYNC_PALLAS_GN", "1")
    alt = blk.apply(params, x, temb)
    np.testing.assert_allclose(np.asarray(alt), np.asarray(base),
                               atol=1e-5, rtol=1e-5)
