"""Fused self-attention block: x + OutProj(Attn(QKV(LN(x) [+ PE]))).

One Pallas program per batch block replaces the XLA chain of
LayerNorm → 3 q/k/v matmuls → attention → output projection → residual
add that the reference composes from separate torch modules
(ref:latentsync/models/attention.py:127-199 BasicTransformerBlock's
norm1+attn1, ref:motion_module.py:154-235 TemporalTransformerBlock's
norm+VersatileAttention). On TPU the chain is dominated by HBM glue,
not FLOPs (docs/perf_audit.md: q/k/v/out projections at 12-27% MFU,
LayerNorms in the 65 ms glue bucket): x crosses HBM once here, the
normalized activations / q / k / v / attention output never leave VMEM,
and the weights stay resident across the grid.

Math is identical to the composed path (f32 LayerNorm, f32 softmax
accumulation, bf16 matmul operands): not a fidelity knob. Two modes:

- spatial (heads sliced on lanes, per-head (S, S) logits in VMEM — the
  layout of ops/temporal_attention.spatial_attention)
- temporal (the (F, H) → F·H token fold with a static block-diagonal
  mask — the layout of ops/temporal_attention.temporal_attention);
  the motion module's positional encoding is folded in after the LN
  (ref:motion_module.py:221-230,262).

Backward differentiates the composed XLA lowering (custom_vjp), the
established pattern in ops/temporal_attention.py.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from .temporal_attention import spatial_attention, temporal_attention


def _head_mask_head_major(f: int, heads: int) -> np.ndarray:
    """(F·H, F·H) additive mask for the HEAD-major token fold used by
    the in-kernel fold (token = h·F + f): 0 where tokens share a head,
    -inf elsewhere. (temporal_attention._head_mask is frame-major.)"""
    h_of = np.repeat(np.arange(heads), f)
    same = h_of[:, None] == h_of[None, :]
    return np.where(same, 0.0, -np.inf).astype(np.float32)


def fused_attn_block_enabled() -> bool:
    """Default ON (exact math); LATENTSYNC_FUSED_ATTN=0 opts out.
    Read at trace time."""
    return os.environ.get("LATENTSYNC_FUSED_ATTN", "1") != "0"


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _ln(xf, ls, lb, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + eps) * ls + lb


def _kernel(x_ref, ls_ref, lb_ref, pe_ref, wq_ref, wk_ref, wv_ref, wo_ref,
            bo_ref, mask_ref, o_ref, qf_scr, kf_scr, vf_scr, os_scr, *,
            heads, temporal, eps, scale, per_head_mm):
    x = x_ref[...]                              # (blk, S, C)
    blk, s, c = x.shape
    dt = x.dtype
    h = _ln(x.astype(jnp.float32), ls_ref[...], lb_ref[...], eps).astype(dt)
    if pe_ref is not None:
        h = h + pe_ref[...].astype(dt)
    inner = wq_ref.shape[1]
    h2 = h.reshape(blk * s, c)

    def mm(a, w_ref, sl=None):
        w = w_ref[...] if sl is None else w_ref[:, sl]
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)

    d = inner // heads
    if temporal:
        # Fold (blk, S, H·D) → (blk, H·S, d) HEAD-major (token = h·S + f)
        # so ONE batched H·S×H·S logit matmul covers all heads (128 tokens
        # at the flagship F=16/H=8 — the MXU edge; cross-head logits are
        # killed by the static mask). Mosaic cannot lower the fold as a
        # vector op (reshape lane-splits H·D; concatenate rejects inputs
        # at mismatched lane offsets — r4 drive failure), so the fold is a
        # store-relayout through VMEM scratch. Two lowering strategies:
        #   per_head_mm=False: full (C, H·D) matmul, then lane-sliced
        #     per-head stores (relayout-on-store, offset 40·h → 0);
        #   per_head_mm=True: H separate (C, d) matmuls against weight
        #     lane slices (offset-40·h dot operands — the proven
        #     _spatial_kernel pattern), stores at offset 0 only.
        if per_head_mm:
            for w_ref, scr in ((wq_ref, qf_scr), (wk_ref, kf_scr),
                               (wv_ref, vf_scr)):
                for hh in range(heads):
                    ph = mm(h2, w_ref, slice(hh * d, (hh + 1) * d))
                    scr[:, hh * s:(hh + 1) * s, :] = ph.reshape(blk, s, d)
        else:
            for w_ref, scr in ((wq_ref, qf_scr), (wk_ref, kf_scr),
                               (wv_ref, vf_scr)):
                a3 = mm(h2, w_ref).reshape(blk, s, inner)
                for hh in range(heads):
                    scr[:, hh * s:(hh + 1) * s, :] = \
                        a3[:, :, hh * d:(hh + 1) * d]
        qf, kf, vf = qf_scr[...], kf_scr[...], vf_scr[...]
        logits = jax.lax.dot_general(
            qf, kf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale + mask_ref[...]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
        of = jax.lax.dot_general(
            p, vf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt)
        # Unfold (blk, H·S, d) → (blk, S, H·D): sublane-sliced reads,
        # lane-offset window stores (the proven _spatial_kernel o_ref
        # write pattern).
        for hh in range(heads):
            os_scr[:, :, hh * d:(hh + 1) * d] = of[:, hh * s:(hh + 1) * s, :]
        o = os_scr[...].reshape(blk * s, inner)
    else:
        q = mm(h2, wq_ref)
        k = mm(h2, wk_ref)
        v = mm(h2, wv_ref)
        qh = q.reshape(blk, s, inner)
        kh = k.reshape(blk, s, inner)
        vh = v.reshape(blk, s, inner)
        for hh in range(heads):
            sl = slice(hh * d, (hh + 1) * d)
            logits = jax.lax.dot_general(
                qh[..., sl], kh[..., sl], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
            os_scr[:, :, sl] = jax.lax.dot_general(
                p, vh[..., sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(dt)
        o = os_scr[...].reshape(blk * s, inner)

    res = jax.lax.dot_general(
        o, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[...]
    o_ref[...] = (x.astype(jnp.float32)
                  + res.reshape(blk, s, c)).astype(o_ref.dtype)


def _pick_block(b, s, c, inner, heads, temporal) -> int:
    """Batch block sized for Mosaic's scoped-VMEM stack. The estimate
    counts x, the f32 LN intermediate, q/k/v (plus the folded copies on
    the temporal path), f32 logits+probs, and resident weights; measured
    stack usage runs ~2x a naive liveness count (Mosaic does not reuse
    stack slots aggressively), hence the conservative 6 MB budget —
    spatial S=256/C=640 at blk=4 compiled to a 25.3 MB stack and OOMed
    the 16 MB VMEM under the old 13 MB estimate."""
    weights = (3 * c * inner + inner * c) * 2
    if weights > 8 * 2**20:
        return 0
    t = s * heads if temporal else s
    for blk in (64, 32, 16, 8, 4, 2, 1):
        if b % blk:
            continue
        xbytes = blk * s * c * (2 + 4)          # x bf16 + f32 LN copy
        qkv = 3 * blk * s * inner * 2 * (2 if temporal else 1)
        o_scr = blk * s * inner * 2             # unfold/output scratch
        logits = blk * (t * t) * 4 * 2          # logits + exp, f32
        if weights + xbytes + qkv + o_scr + logits <= 6 * 2**20:
            return blk
    return 0


def _xla_block(x, ls, lb, pe, wq, wk, wv, wo, bo, heads, temporal, eps,
               scale):
    """Composed XLA lowering — off-TPU path and the autodiff rule."""
    dt = x.dtype
    h = _ln(x.astype(jnp.float32), ls, lb, eps).astype(dt)
    if pe is not None:
        h = h + pe.astype(dt)
    q = h @ wq.astype(dt)
    k = h @ wk.astype(dt)
    v = h @ wv.astype(dt)
    # the public ops route to their own Pallas kernels on TPU (shapes the
    # mega-kernel rejects still get the r2/r3 fused attention cores) and
    # to plain XLA off-TPU; both carry their own AD rules
    o = (temporal_attention if temporal else spatial_attention)(
        q, k, v, heads, scale)
    return x + (o @ wo.astype(dt) + bo.astype(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def _fused(x, ls, lb, pe, wq, wk, wv, wo, bo, heads, temporal, eps, scale,
           blk, interpret):
    b, s, c = x.shape
    inner = wq.shape[1]
    t = s * heads if temporal else s
    mask = (jnp.asarray(_head_mask_head_major(s, heads)) if temporal
            else jnp.zeros((1, 1), jnp.float32))
    has_pe = pe is not None
    pe_in = pe if has_pe else jnp.zeros((1, 1), jnp.float32)
    per_head_mm = os.environ.get("LATENTSYNC_ATTN_PER_HEAD_MM", "0") == "1"
    d = inner // heads

    def kern(x_ref, ls_ref, lb_ref, pe_ref, wq_ref, wk_ref, wv_ref, wo_ref,
             bo_ref, mask_ref, o_ref, *scratch):
        if temporal:
            qf_scr, kf_scr, vf_scr, os_scr = scratch
        else:
            (os_scr,) = scratch
            qf_scr = kf_scr = vf_scr = None
        _kernel(x_ref, ls_ref, lb_ref, pe_ref if has_pe else None,
                wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, mask_ref, o_ref,
                qf_scr, kf_scr, vf_scr, os_scr,
                heads=heads, temporal=temporal, eps=eps, scale=scale,
                per_head_mm=per_head_mm)

    scratch_shapes = [pltpu.VMEM((blk, s, inner), x.dtype)]
    if temporal:
        scratch_shapes = [pltpu.VMEM((blk, t, d), x.dtype)
                          for _ in range(3)] + scratch_shapes

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(b // blk,),
        in_specs=[
            pl.BlockSpec((blk, s, c), lambda i: (i, 0, 0)),
            full(1, c), full(1, c),
            (full(1, s, c) if has_pe else full(1, 1)),
            full(c, inner), full(c, inner), full(c, inner),
            full(inner, c), full(1, c),
            (full(t, t) if temporal else full(1, 1)),
        ],
        out_specs=pl.BlockSpec((blk, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(x, ls.reshape(1, c), lb.reshape(1, c),
      (pe_in.reshape(1, s, c) if has_pe else pe_in.reshape(1, 1)),
      wq, wk, wv, wo, bo.reshape(1, c), mask)


def _fused_fwd(x, ls, lb, pe, wq, wk, wv, wo, bo, heads, temporal, eps,
               scale, blk, interpret):
    out = _fused(x, ls, lb, pe, wq, wk, wv, wo, bo, heads, temporal, eps,
                 scale, blk, interpret)
    return out, (x, ls, lb, pe, wq, wk, wv, wo, bo)


def _fused_bwd(heads, temporal, eps, scale, blk, interpret, res, g):
    x, ls, lb, pe, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda x, ls, lb, pe, wq, wk, wv, wo, bo: _xla_block(
            x, ls, lb, pe, wq, wk, wv, wo, bo, heads, temporal, eps, scale),
        x, ls, lb, pe, wq, wk, wv, wo, bo)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# fused cross-attention block: x + OutProj(Attn(Q(LN(x)), K(ctx), V(ctx)))
# — the audio conditioning path (ref:attention.py:167-171 norm2+attn2).
# Context is used raw (no norm), matching the reference.
# ---------------------------------------------------------------------------


def _cross_kernel(x_ref, ctx_ref, ls_ref, lb_ref, wq_ref, wk_ref, wv_ref,
                  wo_ref, bo_ref, o_ref, os_scr, *, heads, eps, scale):
    x = x_ref[...]                              # (blk, S, C)
    ctx = ctx_ref[...]                          # (blk, Sk, Cc)
    blk, s, c = x.shape
    sk = ctx.shape[1]
    dt = x.dtype
    h = _ln(x.astype(jnp.float32), ls_ref[...], lb_ref[...], eps).astype(dt)
    inner = wq_ref.shape[1]
    d = inner // heads
    h2 = h.reshape(blk * s, c)
    ctx2 = ctx.reshape(blk * sk, ctx.shape[2])

    def mm(a, w_ref):
        return jax.lax.dot_general(
            a, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)

    q = mm(h2, wq_ref).reshape(blk, s, inner)
    k = mm(ctx2, wk_ref).reshape(blk, sk, inner)
    v = mm(ctx2, wv_ref).reshape(blk, sk, inner)
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        logits = jax.lax.dot_general(
            q[..., sl], k[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
        os_scr[:, :, sl] = jax.lax.dot_general(
            p, v[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt)
    res = jax.lax.dot_general(
        os_scr[...].reshape(blk * s, inner), wo_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[...]
    o_ref[...] = (x.astype(jnp.float32)
                  + res.reshape(blk, s, c)).astype(o_ref.dtype)


def _xla_cross_block(x, ctx, ls, lb, wq, wk, wv, wo, bo, heads, eps, scale):
    """Composed XLA lowering — off-TPU path and the autodiff rule."""
    from .attention import dot_product_attention

    dt = x.dtype
    b, s, _ = x.shape
    inner = wq.shape[1]
    d = inner // heads
    h = _ln(x.astype(jnp.float32), ls, lb, eps).astype(dt)
    ctx = ctx.astype(dt)
    q = (h @ wq.astype(dt)).reshape(b, s, heads, d)
    k = (ctx @ wk.astype(dt)).reshape(b, ctx.shape[1], heads, d)
    v = (ctx @ wv.astype(dt)).reshape(b, ctx.shape[1], heads, d)
    o = dot_product_attention(q, k, v, scale=scale).reshape(b, s, inner)
    return x + (o @ wo.astype(dt) + bo.astype(dt))


def _pick_cross_block(b, s, sk, c, cc, inner, heads) -> int:
    weights = (c * inner + 2 * cc * inner + inner * c) * 2
    if weights > 8 * 2**20:
        return 0
    for blk in (64, 32, 16, 8, 4, 2, 1):
        if b % blk:
            continue
        xbytes = blk * s * c * (2 + 4) + blk * sk * cc * 2
        qkv = blk * (s + 2 * sk) * inner * 2 + blk * s * inner * 2
        logits = blk * s * sk * 4 * 2
        if weights + xbytes + qkv + logits <= 6 * 2**20:
            return blk
    return 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _cross_fused(x, ctx, ls, lb, wq, wk, wv, wo, bo, heads, eps, scale, blk,
                 interpret):
    b, s, c = x.shape
    sk, cc = ctx.shape[1:]
    inner = wq.shape[1]

    def kern(x_ref, ctx_ref, ls_ref, lb_ref, wq_ref, wk_ref, wv_ref, wo_ref,
             bo_ref, o_ref, os_scr):
        _cross_kernel(x_ref, ctx_ref, ls_ref, lb_ref, wq_ref, wk_ref,
                      wv_ref, wo_ref, bo_ref, o_ref, os_scr,
                      heads=heads, eps=eps, scale=scale)

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(b // blk,),
        in_specs=[
            pl.BlockSpec((blk, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((blk, sk, cc), lambda i: (i, 0, 0)),
            full(1, c), full(1, c),
            full(c, inner), full(cc, inner), full(cc, inner),
            full(inner, c), full(1, c),
        ],
        out_specs=pl.BlockSpec((blk, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((blk, s, inner), x.dtype)],
        interpret=interpret,
    )(x, ctx, ls.reshape(1, c), lb.reshape(1, c), wq, wk, wv, wo,
      bo.reshape(1, c))


def _cross_fwd(x, ctx, ls, lb, wq, wk, wv, wo, bo, heads, eps, scale, blk,
               interpret):
    out = _cross_fused(x, ctx, ls, lb, wq, wk, wv, wo, bo, heads, eps,
                       scale, blk, interpret)
    return out, (x, ctx, ls, lb, wq, wk, wv, wo, bo)


def _cross_bwd(heads, eps, scale, blk, interpret, res, g):
    x, ctx, ls, lb, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda x, ctx, ls, lb, wq, wk, wv, wo, bo: _xla_cross_block(
            x, ctx, ls, lb, wq, wk, wv, wo, bo, heads, eps, scale),
        x, ctx, ls, lb, wq, wk, wv, wo, bo)
    return vjp(g)


_cross_fused.defvjp(_cross_fwd, _cross_bwd)


def cross_attention_block(x, ln_scale, ln_bias, ctx, wq, wk, wv, wo, bo,
                          heads, *, eps: float = 1e-6,
                          interpret: bool = False):
    """x: (B, S, C), ctx: (B, Sk, Cc) →
    x + OutProj(Attn(Q(LN(x)), K(ctx), V(ctx))).

    The audio cross-attention block (norm2 + attn2 + residual,
    ref:attention.py:167-171,202-280) as one Pallas program; same
    fallback/AD policy as self_attention_block."""
    b, s, c = x.shape
    sk, cc = ctx.shape[1:]
    inner = wq.shape[1]
    d = inner // heads
    scale = 1.0 / math.sqrt(d)
    blk = _pick_cross_block(b, s, sk, c, cc, inner, heads)
    size_ok = 16 <= s <= 1024 and sk >= 8
    # measured SLOWER than the composed lowering at the audio shapes
    # (bench r4: exact 11.39 → 11.03 fps — Sk=50 per-head matmuls at
    # 39% lane util lose to XLA's batched GEMMs), so OPT-IN only
    # (LATENTSYNC_FUSED_XATTN=1) pending a head-batched rework
    opted_in = os.environ.get("LATENTSYNC_FUSED_XATTN", "0") == "1"
    ok = (pltpu is not None and blk > 0
          and (interpret or (opted_in and _on_tpu() and size_ok)))
    if not ok:
        return _xla_cross_block(x, ctx, ln_scale, ln_bias, wq, wk, wv, wo,
                                bo, heads, eps, scale)
    dt = x.dtype
    return _cross_fused(x, ctx.astype(dt), ln_scale.astype(jnp.float32),
                        ln_bias.astype(jnp.float32), wq.astype(dt),
                        wk.astype(dt), wv.astype(dt), wo.astype(dt),
                        bo.astype(jnp.float32), heads, eps, scale, blk,
                        interpret)


def self_attention_block(x, ln_scale, ln_bias, wq, wk, wv, wo, bo, heads,
                         *, temporal: bool = False, pe=None,
                         eps: float = 1e-6, interpret: bool = False):
    """x: (B, S, C) → x + OutProj(SelfAttn(QKV(LN(x) [+ pe]))).

    wq/wk/wv: (C, inner) unbiased; wo: (inner, C) biased — the reference
    CrossAttention param set (ref:attention.py:202-236). pe: optional
    (S, C) positional encoding added after the LN (temporal path).
    Falls back to the composed XLA lowering off-TPU / for non-dividing
    shapes; reverse-mode AD always routes through the XLA lowering."""
    b, s, c = x.shape
    inner = wq.shape[1]
    d = inner // heads
    scale = 1.0 / math.sqrt(d)
    blk = _pick_block(b, s, c, inner, heads, temporal)
    # tiny sequences fall back: the deep UNet levels (spatial S ≤ 64,
    # where fusion buys nothing) produce (blk, S, C) reshapes with small/
    # unit dims that Mosaic's infer-vector-layout rejects ("unsupported
    # shape cast" at S=1 — r4 drive), and they are served well by the
    # r2/r3 kernels in ops/temporal_attention via the XLA fallback path.
    size_ok = ((8 <= s and s * heads <= 512) if temporal
               else 16 <= s <= 1024)
    ok = (pltpu is not None and blk > 0
          and (interpret or (_on_tpu() and size_ok)))
    if not ok:
        return _xla_block(x, ln_scale, ln_bias, pe, wq, wk, wv, wo, bo,
                          heads, temporal, eps, scale)
    dt = x.dtype
    pe_c = None if pe is None else jnp.asarray(pe, jnp.float32)
    return _fused(x, ln_scale.astype(jnp.float32),
                  ln_bias.astype(jnp.float32), pe_c, wq.astype(dt),
                  wk.astype(dt), wv.astype(dt), wo.astype(dt),
                  bo.astype(jnp.float32), heads, temporal, eps, scale,
                  blk, interpret)
