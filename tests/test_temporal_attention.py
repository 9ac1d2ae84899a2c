"""Fused temporal-attention kernel vs the reference einsum path
(interpret mode — CPU-safe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentsync_tpu.ops.temporal_attention import _head_mask, temporal_attention


def _ref(q, k, v, heads):
    b, f, hd = q.shape
    d = hd // heads
    qh = q.reshape(b, f, heads, d)
    kh = k.reshape(b, f, heads, d)
    vh = v.reshape(b, f, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / np.sqrt(d)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, f, hd)


def test_head_mask_structure():
    m = _head_mask(3, 2)  # tokens [f0h0, f0h1, f1h0, f1h1, f2h0, f2h1]
    assert m.shape == (6, 6)
    assert m[0, 0] == 0 and m[0, 2] == 0 and m[0, 4] == 0   # h0 row sees h0
    assert np.isneginf(m[0, 1]) and np.isneginf(m[0, 3])     # not h1
    assert m[1, 3] == 0 and np.isneginf(m[1, 2])


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_temporal_attention_matches_reference(dtype):
    rng = np.random.default_rng(0)
    b, f, heads, d = 64, 16, 8, 40
    q = jnp.asarray(rng.standard_normal((b, f, heads * d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, f, heads * d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, f, heads * d)), dtype)
    out = temporal_attention(q, k, v, heads, block=32, interpret=True)
    ref = _ref(q, k, v, heads)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=tol, rtol=tol
    )


def test_temporal_attention_fallback_path():
    """Non-dividing batch → XLA fallback, still correct."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((5, 4, 16)), jnp.float32)
    out = temporal_attention(q, q, q, heads=2, block=32, interpret=True)
    ref = _ref(q, q, q, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("s,d", [(1024, 40), (64, 160)])
def test_spatial_attention_matches_reference(s, d):
    from latentsync_tpu.ops.temporal_attention import spatial_attention

    rng = np.random.default_rng(2)
    b, heads = 4, 8
    q = jnp.asarray(rng.standard_normal((b, s, heads * d)), jnp.float32)
    out = spatial_attention(q, q, q, heads, interpret=True)
    qh = q.reshape(b, s, heads, d)
    from latentsync_tpu.ops.attention import dot_product_attention

    ref = dot_product_attention(qh, qh, qh).reshape(b, s, heads * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_temporal_attention_adaptive_block_d160():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((64, 16, 8 * 160)), jnp.float32)
    out = temporal_attention(q, q, q, 8, interpret=True)
    ref = _ref(q, q, q, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_attention_kernels_are_differentiable():
    """ADVICE r02 high: jax.grad through the Pallas kernels must work
    (UNet training runs attn1/motion attention under value_and_grad).
    The custom_vjp routes backward through the XLA lowering; gradients
    must match differentiating the XLA path directly."""
    from latentsync_tpu.ops.temporal_attention import spatial_attention

    rng = np.random.default_rng(7)
    b, f, heads, d = 32, 16, 4, 16
    q = jnp.asarray(rng.standard_normal((b, f, heads * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, f, heads * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, f, heads * d)), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(temporal_attention(q, k, v, heads, block=32, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, heads) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)

    s = 64
    qs = jnp.asarray(rng.standard_normal((4, s, heads * d)), jnp.float32)

    def loss_spat(q):
        return jnp.sum(spatial_attention(q, q, q, heads, interpret=True) ** 2)

    def loss_spat_ref(q):
        qh = q.reshape(4, s, heads, d)
        from latentsync_tpu.ops.attention import dot_product_attention

        return jnp.sum(dot_product_attention(qh, qh, qh).reshape(4, s, heads * d) ** 2)

    gs = jax.grad(loss_spat)(qs)
    gsr = jax.grad(loss_spat_ref)(qs)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gsr), atol=1e-4, rtol=1e-4)
