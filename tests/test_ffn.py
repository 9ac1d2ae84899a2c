"""Unit tests for the fused dense-family Pallas kernels (ops/ffn.py).

Run in Pallas interpret mode on the CPU test backend; numerics are
checked against the plain XLA lowering (the same math the reference
composes with torch nn.Linear stacks, ref:attention.py:127-199).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentsync_tpu.ops.ffn import (
    _geglu_xla,
    _qkv_xla,
    geglu_ffn,
    qkv_proj,
)


def test_erf_approx_exact_at_bf16():
    from latentsync_tpu.ops.ffn import _erf_f32

    x = jnp.linspace(-6.0, 6.0, 4097, dtype=jnp.float32)
    approx_f32 = 0.5 * x * (1.0 + _erf_f32(x / np.sqrt(2.0)))
    exact_f32 = jax.nn.gelu(x, approximate=False)
    # absolute error bounded by the A&S 7.1.26 bound everywhere
    assert float(jnp.max(jnp.abs(approx_f32 - exact_f32))) < 1e-6
    # after the bf16 cast the two land within neighbouring bf16 values
    # (a <1e-6 perturbation can cross one rounding boundary)
    a = np.asarray(approx_f32.astype(jnp.bfloat16), np.float32)
    e = np.asarray(exact_f32.astype(jnp.bfloat16), np.float32)
    ulp = np.maximum(np.abs(e), 1e-4) * 2.0**-7
    assert np.all(np.abs(a - e) <= ulp)


@pytest.mark.parametrize("m,c", [(256, 64), (512, 32)])
def test_geglu_fused_matches_xla(m, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((c, 8 * c)) * 0.05, jnp.float32)
    b_up = jnp.asarray(rng.standard_normal((8 * c,)) * 0.1, jnp.float32)
    w_down = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.05, jnp.float32)
    b_down = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)

    got = geglu_ffn(x, w_up, b_up, w_down, b_down, interpret=True)
    inner = 4 * c
    want = _geglu_xla(x, w_up[:, :inner], w_up[:, inner:], b_up[:inner],
                      b_up[inner:], w_down, b_down)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_geglu_fused_multi_inner_block_accumulates():
    # shapes chosen so _pick_geglu_blocks splits the inner dim
    rng = np.random.default_rng(1)
    m, c = 512, 512
    x = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((c, 8 * c)) * 0.02, jnp.float32)
    b_up = jnp.zeros((8 * c,), jnp.float32)
    w_down = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.02, jnp.float32)
    b_down = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    got = geglu_ffn(x, w_up, b_up, w_down, b_down, interpret=True)
    inner = 4 * c
    want = _geglu_xla(x, w_up[:, :inner], w_up[:, inner:], b_up[:inner],
                      b_up[inner:], w_down, b_down)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_geglu_batched_shape_and_grad():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 32)), jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((32, 256)) * 0.05, jnp.float32)
    b_up = jnp.zeros((256,), jnp.float32)
    w_down = jnp.asarray(rng.standard_normal((128, 32)) * 0.05, jnp.float32)
    b_down = jnp.zeros((32,), jnp.float32)

    out = geglu_ffn(x, w_up, b_up, w_down, b_down, interpret=True)
    assert out.shape == x.shape

    # reverse-mode AD must route through the XLA lowering (custom_vjp)
    def loss(w):
        return jnp.sum(geglu_ffn(x, w, b_up, w_down, b_down,
                                 interpret=True) ** 2)

    g = jax.grad(loss)(w_up)
    def loss_ref(w):
        inner = 128
        return jnp.sum(_geglu_xla(x.reshape(-1, 32), w[:, :inner],
                                  w[:, inner:], b_up[:inner], b_up[inner:],
                                  w_down, b_down) ** 2)
    g_ref = jax.grad(loss_ref)(w_up)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_qkv_fused_matches_xla_and_grads():
    rng = np.random.default_rng(3)
    m, c = 256, 64
    x = jnp.asarray(rng.standard_normal((4, m // 4, c)), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
    wk = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((c, c)) * 0.05, jnp.float32)

    q, k, v = qkv_proj(x, wq, wk, wv, interpret=True)
    q2, k2, v2 = _qkv_xla(x.reshape(-1, c), wq, wk, wv)
    np.testing.assert_allclose(np.asarray(q).reshape(-1, c), np.asarray(q2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(k).reshape(-1, c), np.asarray(k2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v).reshape(-1, c), np.asarray(v2),
                               rtol=2e-5, atol=2e-5)

    def loss(w):
        q, k, v = qkv_proj(x, w, wk, wv, interpret=True)
        return jnp.sum(q * k) + jnp.sum(v)

    def loss_ref(w):
        q, k, v = _qkv_xla(x.reshape(-1, c), w, wk, wv)
        return jnp.sum(q * k) + jnp.sum(v)

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(wq)),
                               np.asarray(jax.grad(loss_ref)(wq)),
                               rtol=1e-4, atol=1e-4)


def test_geglu_int8io_prototype_accuracy():
    """int8-in/int8-out GEGLU (interpret mode): result within rowwise
    int8 quantization error of the float composition."""
    from latentsync_tpu.ops.ffn import (
        _geglu_xla,
        geglu_ffn_int8io,
        quantize_rowwise,
    )

    rng = np.random.default_rng(5)
    m, c = 256, 128
    inner = 4 * c
    x = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((c, 2 * inner)) * 0.05, jnp.float32)
    b_up = jnp.asarray(rng.standard_normal((2 * inner,)) * 0.05, jnp.float32)
    w_dn = jnp.asarray(rng.standard_normal((inner, c)) * 0.05, jnp.float32)
    b_dn = jnp.asarray(rng.standard_normal((c,)) * 0.05, jnp.float32)

    xi, xs = quantize_rowwise(x)
    oi, os_ = geglu_ffn_int8io(xi, xs, w_up, b_up, w_dn, b_dn,
                               bm=128, bi=128, interpret=True)
    got = np.asarray(oi, np.float32) * np.asarray(os_)

    want = np.asarray(_geglu_xla(
        (np.asarray(xi, np.float32) * np.asarray(xs)).astype(np.float32),
        w_up[:, :inner], w_up[:, inner:], b_up[:inner], b_up[inner:],
        w_dn, b_dn))
    # output quantization: rowwise max/127 ⇒ rel error ≤ ~1/254 of the
    # row max, plus bf16 matmul noise
    tol = np.abs(want).max(axis=-1, keepdims=True) / 127.0 + 0.02
    assert np.all(np.abs(got - want) <= tol)


def test_geglu_ln_residual_fold():
    """norm + FF + residual folded into the kernel == composed LN → FF
    → +x, forward and grad (interpret mode)."""
    from latentsync_tpu.ops.ffn import geglu_ffn

    rng = np.random.default_rng(7)
    m, c = 256, 128
    inner = 4 * c
    x = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    ls = jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.float32)
    lb = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((c, 2 * inner)) * 0.05, jnp.float32)
    b_up = jnp.asarray(rng.standard_normal((2 * inner,)) * 0.05, jnp.float32)
    w_dn = jnp.asarray(rng.standard_normal((inner, c)) * 0.05, jnp.float32)
    b_dn = jnp.asarray(rng.standard_normal((c,)) * 0.05, jnp.float32)

    def composed(x, w_up):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        xc = xf - mu
        var = (xc * xc).mean(-1, keepdims=True)
        h = xc * jax.lax.rsqrt(var + 1e-6) * ls + lb
        val = h @ w_up[:, :inner] + b_up[:inner]
        gate = h @ w_up[:, inner:] + b_up[inner:]
        return x + (val * jax.nn.gelu(gate, approximate=False)) @ w_dn + b_dn

    got = geglu_ffn(x, w_up, b_up, w_dn, b_dn, ln_scale=ls, ln_bias=lb,
                    residual=True, interpret=True)
    want = composed(x, w_up)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    g1 = jax.grad(lambda w: jnp.sum(geglu_ffn(
        x, w, b_up, w_dn, b_dn, ln_scale=ls, ln_bias=lb, residual=True,
        interpret=True) ** 2))(w_up)
    g2 = jax.grad(lambda w: jnp.sum(composed(x, w) ** 2))(w_up)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)
