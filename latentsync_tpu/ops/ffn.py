"""Fused Pallas kernels for the UNet's dense family (bf16).

Why these exist (VERDICT r3 #1: raise exact-trajectory throughput):
the per-op audit (docs/perf_audit.md) shows the dense family limited by
HBM traffic and bad XLA tilings at this model's skinny shapes, not by
FLOPs:

- GEGLU feed-forward pair (31% of forward FLOPs): XLA materializes the
  (M, 8C) up-projection and the (M, 4C) gated hidden in HBM between the
  two matmuls — at M=65536/C=320 that is ~0.5 GB of intermediate
  traffic per instance. `geglu_ffn` runs up-proj → bias → GEGLU gate →
  down-proj in ONE kernel with the hidden resident in VMEM (f32
  accumulator scratch across inner blocks); x and out cross HBM once.
- q/k/v projections: XLA's (M, 320, 320) matmul measured 0.59 ms at 12%
  MFU (W=2 shapes) — 6× the roofline; three of them re-read x. The r3
  fused (C, 3C) single-output attempt REGRESSED on relayout at the
  non-128-aligned 960-lane split (commit 25eaf9a). `qkv_proj` instead
  keeps THREE separate (M, C) outputs (native layouts, no relayout) and
  fuses only what is free: one x read, resident weights, one dispatch.

Both have XLA-lowering fallbacks (off-TPU / non-dividing shapes) and
custom_vjp rules that differentiate the XLA lowering, following the
established pattern in ops/temporal_attention.py (pallas_call has no AD
rule; the UNet trainer must still jax.grad through these).

Reference scope: these replace torch nn.Linear stacks inside
ref:latentsync/models/attention.py:127-199 (BasicTransformerBlock's
FeedForward and to_q/to_k/to_v) with TPU-shaped fusions; the math is
bitwise the same composition (erf GELU, f32 accumulation).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def fused_ffn_enabled() -> bool:
    """Default ON (exact math — a scheduling change, not a numerics
    knob); LATENTSYNC_FUSED_FFN=0 opts out. Read at trace time."""
    return os.environ.get("LATENTSYNC_FUSED_FFN", "1") != "0"


# ---------------------------------------------------------------------------
# fused GEGLU feed-forward: out = (gelu(x@Wg + bg) * (x@Wv + bv)) @ Wd + bd
# ---------------------------------------------------------------------------


def _erf_f32(x):
    """erf for the Pallas TPU kernel (Mosaic has no erf primitive):
    Abramowitz & Stegun 7.1.26 rational approximation, absolute error
    ≤ 1e-6 — after the bf16 cast the fused kernel's GELU lands within
    one bf16 ULP of the exact erf GELU everywhere
    (tests/test_ffn.py::test_erf_approx_exact_at_bf16)."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _geglu_kernel(x_ref, ls_ref, lb_ref, wv_ref, wg_ref, bv_ref, bg_ref,
                  wd_ref, bd_ref, o_ref, acc_ref, *, n_inner, has_ln,
                  residual, eps):
    j = pl.program_id(1)
    xr = x_ref[...]  # (bm, C)
    if has_ln:
        # norm-in-kernel (the pallas boundary blocks XLA from fusing the
        # preceding LayerNorm in): f32 stats, recomputed per inner step
        # (VPU-cheap next to the (bm, bi) matmuls)
        xf = xr.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        x = (xc * jax.lax.rsqrt(var + eps) * ls_ref[...]
             + lb_ref[...]).astype(xr.dtype)
    else:
        x = xr
    val = jax.lax.dot_general(
        x, wv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bv_ref[...]
    gate = jax.lax.dot_general(
        x, wg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bg_ref[...]
    # exact (erf) GELU, matching diffusers FeedForward("geglu") /
    # GEGLUFeedForward's nn.gelu(approximate=False)
    h = val * (0.5 * gate * (1.0 + _erf_f32(gate * (1.0 / math.sqrt(2.0)))))
    part = jax.lax.dot_general(
        h.astype(x.dtype), wd_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part + bd_ref[...]

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(j == n_inner - 1)
    def _emit():
        res = acc_ref[...]
        if residual:
            res = res + xr.astype(jnp.float32)
        o_ref[...] = res.astype(o_ref.dtype)


def _pick_geglu_blocks(m: int, c: int, inner: int) -> tuple[int, int]:
    """(bm, bi) under a ~12 MB VMEM budget. Weight bytes per inner step
    = 2·(C·bi) + bi·C halves (double-buffered); hidden temps are
    (bm, bi) f32; accumulator (bm, C) f32."""
    for bm in (512, 256, 128):
        if m % bm:
            continue
        for bi in (2048, 1280, 1024, 640, 512, 256):
            if inner % bi:
                continue
            weights = 3 * c * bi * 2 * 2          # double-buffered bf16
            temps = 3 * bm * bi * 4               # val/gate/part f32
            fixed = bm * c * (2 + 4)              # x bf16 + acc f32
            if weights + temps + fixed <= 12 * 2**20:
                return bm, bi
    return 0, 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def _geglu_fused(x2d, ls, lb, wv, wg, bv, bg, wd, bd, bm, bi, has_ln,
                 residual, eps, interpret):
    m, c = x2d.shape
    inner = wv.shape[1]
    n_inner = inner // bi
    grid = (m // bm, n_inner)
    return pl.pallas_call(
        functools.partial(_geglu_kernel, n_inner=n_inner, has_ln=has_ln,
                          residual=residual, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i, j: (i, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, bi), lambda i, j: (0, j)),
            pl.BlockSpec((c, bi), lambda i, j: (0, j)),
            pl.BlockSpec((1, bi), lambda i, j: (0, j)),
            pl.BlockSpec((1, bi), lambda i, j: (0, j)),
            pl.BlockSpec((bi, c), lambda i, j: (j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.float32)] if pltpu else [],
        compiler_params=(
            pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"))
            if pltpu is not None and not interpret else None
        ),
        interpret=interpret,
    )(x2d, ls.reshape(1, -1), lb.reshape(1, -1), wv, wg,
      bv.reshape(1, -1), bg.reshape(1, -1), wd, bd.reshape(1, -1))


def _geglu_xla(x2d, wv, wg, bv, bg, wd, bd):
    dt = x2d.dtype
    val = x2d @ wv.astype(dt) + bv.astype(dt)
    gate = x2d @ wg.astype(dt) + bg.astype(dt)
    h = val * jax.nn.gelu(gate, approximate=False)
    return h @ wd.astype(dt) + bd.astype(dt)


def _geglu_xla_full(x2d, ls, lb, wv, wg, bv, bg, wd, bd, has_ln, residual,
                    eps):
    h = x2d
    if has_ln:
        xf = x2d.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        h = (xc * jax.lax.rsqrt(var + eps) * ls + lb).astype(x2d.dtype)
    out = _geglu_xla(h, wv, wg, bv, bg, wd, bd)
    if residual:
        out = (x2d.astype(jnp.float32)
               + out.astype(jnp.float32)).astype(x2d.dtype)
    return out


def _geglu_fwd(x2d, ls, lb, wv, wg, bv, bg, wd, bd, bm, bi, has_ln,
               residual, eps, interpret):
    out = _geglu_fused(x2d, ls, lb, wv, wg, bv, bg, wd, bd, bm, bi,
                       has_ln, residual, eps, interpret)
    return out, (x2d, ls, lb, wv, wg, bv, bg, wd, bd)


def _geglu_bwd(bm, bi, has_ln, residual, eps, interpret, res, g):
    x2d, ls, lb, wv, wg, bv, bg, wd, bd = res
    _, vjp = jax.vjp(
        lambda x2d, ls, lb, wv, wg, bv, bg, wd, bd: _geglu_xla_full(
            x2d, ls, lb, wv, wg, bv, bg, wd, bd, has_ln, residual, eps),
        x2d, ls, lb, wv, wg, bv, bg, wd, bd)
    return vjp(g)


_geglu_fused.defvjp(_geglu_fwd, _geglu_bwd)


def geglu_ffn(x, w_up, b_up, w_down, b_down, ln_scale=None, ln_bias=None,
              residual: bool = False, eps: float = 1e-6,
              interpret: bool = False):
    """GEGLU feed-forward with the (M, 4C) hidden resident in VMEM.

    x: (..., C); w_up: (C, 8C) laid out [value | gate] (the layout of
    GEGLUFeedForward's net_0_proj / diffusers GEGLU); w_down: (4C, C).
    Splitting w_up happens at trace time and touches weight bytes only.

    ln_scale/ln_bias fold the preceding LayerNorm into the kernel and
    `residual` adds x back at emit (norm + FF + residual as one program
    — otherwise the pallas boundary forces both through HBM)."""
    c = x.shape[-1]
    inner = w_up.shape[1] // 2
    x2d = x.reshape(-1, c)
    m = x2d.shape[0]
    dt = x.dtype
    has_ln = ln_scale is not None
    ls = (ln_scale if has_ln else jnp.ones((c,))).astype(jnp.float32)
    lb = (ln_bias if has_ln else jnp.zeros((c,))).astype(jnp.float32)
    wv, wg = w_up[:, :inner], w_up[:, inner:]
    bv, bg = b_up[:inner], b_up[inner:]
    bm, bi = _pick_geglu_blocks(m, c, inner)
    usable = pltpu is not None and (interpret or _on_tpu()) and bm > 0
    if not usable:
        out = _geglu_xla_full(x2d, ls, lb, wv, wg, bv, bg, w_down, b_down,
                              has_ln, residual, eps)
        return out.reshape(x.shape[:-1] + (c,))
    out = _geglu_fused(
        x2d, ls, lb, wv.astype(dt), wg.astype(dt), bv.astype(jnp.float32),
        bg.astype(jnp.float32), w_down.astype(dt),
        b_down.astype(jnp.float32), bm, bi, has_ln, residual, eps,
        interpret)
    return out.reshape(x.shape[:-1] + (c,))


# ---------------------------------------------------------------------------
# fused q/k/v projection: three (M, C)→(M, inner) matmuls, one x read,
# three native-layout outputs (no (C, 3C) relayout — see module docstring)
# ---------------------------------------------------------------------------


def _qkv_kernel(x_ref, wq_ref, wk_ref, wv_ref, q_ref, k_ref, v_ref):
    x = x_ref[...]
    for w_ref, o_ref in ((wq_ref, q_ref), (wk_ref, k_ref), (wv_ref, v_ref)):
        o_ref[...] = jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _qkv_fused(x2d, wq, wk, wv, bm, interpret):
    m, c = x2d.shape
    inner = wq.shape[1]
    xspec = pl.BlockSpec((bm, c), lambda i: (i, 0))
    wspec = pl.BlockSpec((c, inner), lambda i: (0, 0))
    ospec = pl.BlockSpec((bm, inner), lambda i: (i, 0))
    oshape = jax.ShapeDtypeStruct((m, inner), x2d.dtype)
    return pl.pallas_call(
        _qkv_kernel,
        grid=(m // bm,),
        in_specs=[xspec, wspec, wspec, wspec],
        out_specs=[ospec, ospec, ospec],
        out_shape=[oshape, oshape, oshape],
        interpret=interpret,
    )(x2d, wq, wk, wv)


def _qkv_xla(x2d, wq, wk, wv):
    dt = x2d.dtype
    return x2d @ wq.astype(dt), x2d @ wk.astype(dt), x2d @ wv.astype(dt)


def _qkv_fwd(x2d, wq, wk, wv, bm, interpret):
    return _qkv_fused(x2d, wq, wk, wv, bm, interpret), (x2d, wq, wk, wv)


def _qkv_bwd(bm, interpret, res, g):
    x2d, wq, wk, wv = res
    _, vjp = jax.vjp(_qkv_xla, x2d, wq, wk, wv)
    return vjp(g)


_qkv_fused.defvjp(_qkv_fwd, _qkv_bwd)


def _pick_qkv_bm(m: int, c: int, inner: int) -> int:
    """x block + 3 outputs + 3 resident weights within ~12 MB."""
    weights = 3 * c * inner * 2
    for bm in (1024, 512, 256, 128):
        if m % bm:
            continue
        if weights + bm * (c + 3 * inner) * 2 * 2 <= 12 * 2**20:
            return bm
    return 0


# ---------------------------------------------------------------------------
# int8-STORED-activation GEGLU prototype (VERDICT r3 #1c): x arrives as
# int8 + rowwise scales and the result leaves as int8 + rowwise scales,
# so the op's HBM traffic is halved end to end — the audit's named
# remaining v5e dense lever ("a real dense int8 win on v5e would require
# int8 activations stored between ops", docs/perf_audit.md). Weights stay
# bf16 (they are resident across the grid; quantizing them changes
# numerics for no bandwidth win here). EXPERIMENTAL: shipped for the
# micro_probe --which ffn8 measurement and as the building block of a
# model-wide int8 activation format; not wired into the UNet.
# ---------------------------------------------------------------------------


def _geglu_i8_kernel(xi_ref, xs_ref, wv_ref, wg_ref, bv_ref, bg_ref, wd_ref,
                     bd_ref, oi_ref, os_ref, acc_ref, *, n_inner):
    j = pl.program_id(1)
    x = (xi_ref[...].astype(jnp.float32)
         * xs_ref[...]).astype(jnp.bfloat16)     # dequant in VMEM
    val = jax.lax.dot_general(
        x, wv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bv_ref[...]
    gate = jax.lax.dot_general(
        x, wg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bg_ref[...]
    h = val * (0.5 * gate * (1.0 + _erf_f32(gate * (1.0 / math.sqrt(2.0)))))
    part = jax.lax.dot_general(
        h.astype(jnp.bfloat16), wd_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = part + bd_ref[...]

    @pl.when(j > 0)
    def _acc():
        acc_ref[...] += part

    @pl.when(j == n_inner - 1)
    def _emit():
        res = acc_ref[...]
        s = jnp.max(jnp.abs(res), axis=-1, keepdims=True) / 127.0 + 1e-12
        oi_ref[...] = jnp.round(res / s).astype(jnp.int8)  # quant in VMEM
        os_ref[...] = s


@functools.partial(jax.jit, static_argnames=("bm", "bi", "interpret"))
def geglu_ffn_int8io(x_i8, x_scale, w_up, b_up, w_down, b_down,
                     bm: int = 0, bi: int = 0, interpret: bool = False):
    """int8-in/int8-out fused GEGLU: (x_i8 (M, C), x_scale (M, 1)) →
    (out_i8 (M, C), out_scale (M, 1)), rowwise symmetric quantization.
    Layouts match geglu_ffn (w_up = [value | gate])."""
    m, c = x_i8.shape
    inner = w_up.shape[1] // 2
    wv, wg = w_up[:, :inner].astype(jnp.bfloat16), \
        w_up[:, inner:].astype(jnp.bfloat16)
    bv, bg = b_up[:inner].astype(jnp.float32), \
        b_up[inner:].astype(jnp.float32)
    if not bm or not bi:
        bm, bi = _pick_geglu_blocks(m, c, inner)
    assert bm and bi, (m, c, inner)
    n_inner = inner // bi
    return pl.pallas_call(
        functools.partial(_geglu_i8_kernel, n_inner=n_inner),
        grid=(m // bm, n_inner),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i, j: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((c, bi), lambda i, j: (0, j)),
            pl.BlockSpec((c, bi), lambda i, j: (0, j)),
            pl.BlockSpec((1, bi), lambda i, j: (0, j)),
            pl.BlockSpec((1, bi), lambda i, j: (0, j)),
            pl.BlockSpec((bi, c), lambda i, j: (j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((bm, c), lambda i, j: (i, 0)),
                   pl.BlockSpec((bm, 1), lambda i, j: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((m, c), jnp.int8),
                   jax.ShapeDtypeStruct((m, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.float32)] if pltpu else [],
        compiler_params=(
            pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"))
            if pltpu is not None and not interpret else None
        ),
        interpret=interpret,
    )(x_i8, x_scale, wv, wg, bv.reshape(1, -1), bg.reshape(1, -1),
      w_down.astype(jnp.bfloat16), b_down.astype(jnp.float32).reshape(1, -1))


def quantize_rowwise(x):
    """f32/bf16 (M, C) → (int8, (M, 1) f32 scale), symmetric rowwise."""
    s = (jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
         / 127.0 + 1e-12)
    return jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8), s


def qkv_proj(x, wq, wk, wv, interpret: bool = False):
    """Self-attention q/k/v projection (no bias, matching the reference
    ref:latentsync/models/attention.py:202-236). x: (..., C) →
    three (..., inner)."""
    c = x.shape[-1]
    inner = wq.shape[1]
    x2d = x.reshape(-1, c)
    m = x2d.shape[0]
    dt = x.dtype
    bm = _pick_qkv_bm(m, c, inner)
    if pltpu is None or (not interpret and not _on_tpu()) or bm == 0:
        q, k, v = _qkv_xla(x2d, wq, wk, wv)
    else:
        q, k, v = _qkv_fused(x2d, wq.astype(dt), wk.astype(dt),
                             wv.astype(dt), bm, interpret)
    shp = x.shape[:-1] + (inner,)
    return q.reshape(shp), k.reshape(shp), v.reshape(shp)
