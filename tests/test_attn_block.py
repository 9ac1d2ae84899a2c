"""Unit tests for the fused self-attention block kernel (ops/attn_block).

Interpret mode on CPU vs the composed XLA lowering — the same module
composition the reference builds from torch (ref:attention.py:127-199,
motion_module.py:154-313)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentsync_tpu.ops.attn_block import (
    _fused,
    _xla_block,
    self_attention_block,
)


def _params(rng, c, inner):
    ls = jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    wq = jnp.asarray(rng.standard_normal((c, inner)) * 0.05, jnp.float32)
    wk = jnp.asarray(rng.standard_normal((c, inner)) * 0.05, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((c, inner)) * 0.05, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((inner, c)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    return ls, lb, wq, wk, wv, wo, bo


@pytest.mark.parametrize("temporal,b,s,c,heads", [
    (False, 4, 64, 32, 4),
    (True, 8, 16, 32, 4),
])
def test_fused_block_matches_composed(temporal, b, s, c, heads):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    ls, lb, wq, wk, wv, wo, bo = _params(rng, c, c)
    pe = (jnp.asarray(rng.standard_normal((s, c)) * 0.1, jnp.float32)
          if temporal else None)
    scale = 1.0 / np.sqrt(c // heads)

    got = _fused(x, ls, lb, pe, wq, wk, wv, wo, bo, heads, temporal,
                 1e-6, scale, 2, True)
    want = _xla_block(x, ls, lb, pe, wq, wk, wv, wo, bo, heads, temporal,
                      1e-6, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_public_entry_shapes_and_grad():
    rng = np.random.default_rng(1)
    b, s, c, heads = 4, 32, 64, 4
    x = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    ls, lb, wq, wk, wv, wo, bo = _params(rng, c, c)

    out = self_attention_block(x, ls, lb, wq, wk, wv, wo, bo, heads,
                               interpret=True)
    assert out.shape == x.shape

    def loss(wq):
        return jnp.sum(self_attention_block(
            x, ls, lb, wq, wk, wv, wo, bo, heads, interpret=True) ** 2)

    def loss_ref(wq):
        return jnp.sum(_xla_block(x, ls, lb, None, wq, wk, wv, wo, bo,
                                  heads, False, 1e-6,
                                  1.0 / np.sqrt(c // heads)) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(wq)),
                               np.asarray(jax.grad(loss_ref)(wq)),
                               rtol=2e-4, atol=2e-4)


def test_temporal_matches_module_semantics():
    """Fused temporal path == LN → +PE → attention-over-frames → out
    proj → residual (the motion-module block semantics)."""
    from latentsync_tpu.ops.temporal_attention import _temporal_xla

    rng = np.random.default_rng(2)
    b, f, c, heads = 8, 16, 32, 4
    x = jnp.asarray(rng.standard_normal((b, f, c)), jnp.float32)
    ls, lb, wq, wk, wv, wo, bo = _params(rng, c, c)
    pe = jnp.asarray(rng.standard_normal((f, c)) * 0.1, jnp.float32)

    got = self_attention_block(x, ls, lb, wq, wk, wv, wo, bo, heads,
                               temporal=True, pe=pe, interpret=True)

    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    var = (xc * xc).mean(-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + 1e-6) * ls + lb + pe
    q, k, v = h @ wq, h @ wk, h @ wv
    o = _temporal_xla(q, k, v, heads, 1.0 / np.sqrt(c // heads))
    want = x + (o @ wo + bo)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cross_block_matches_composed():
    """Fused audio cross-attention block (LN + Q(h)/K(ctx)/V(ctx) +
    out-proj + residual) vs the composed lowering."""
    from latentsync_tpu.ops.attn_block import (
        _cross_fused,
        _xla_cross_block,
        cross_attention_block,
    )

    rng = np.random.default_rng(3)
    b, s, c, cc, sk, heads = 4, 64, 32, 16, 10, 4
    x = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, sk, cc)), jnp.float32)
    ls, lb, wq, _, _, wo, bo = _params(rng, c, c)
    wk = jnp.asarray(rng.standard_normal((cc, c)) * 0.05, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((cc, c)) * 0.05, jnp.float32)
    scale = 1.0 / np.sqrt(c // heads)

    got = _cross_fused(x, ctx, ls, lb, wq, wk, wv, wo, bo, heads, 1e-6,
                       scale, 2, True)
    want = _xla_cross_block(x, ctx, ls, lb, wq, wk, wv, wo, bo, heads,
                            1e-6, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    out = cross_attention_block(x, ls, lb, ctx, wq, wk, wv, wo, bo, heads,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    def loss(wk):
        return jnp.sum(cross_attention_block(
            x, ls, lb, ctx, wq, wk, wv, wo, bo, heads, interpret=True) ** 2)

    def loss_ref(wk):
        return jnp.sum(_xla_cross_block(
            x, ctx, ls, lb, wq, wk, wv, wo, bo, heads, 1e-6, scale) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(wk)),
                               np.asarray(jax.grad(loss_ref)(wk)),
                               rtol=2e-4, atol=2e-4)
