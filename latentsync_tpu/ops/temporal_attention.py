"""Fused small-sequence attention Pallas kernel for the temporal path.

The motion module attends across the 16-frame axis per spatial location
(ref:latentsync/models/motion_module.py:262-276): shape (B·S, F=16,
H=8, D=40) with a huge fused batch (8192 at res 32 with 4 windows) and
a tiny sequence. XLA lowers this to batched 16×16 GEMMs with full-
tensor head transposes and an f32 logit round-trip through HBM —
measured 5.3 ms/call on v5e, 13× the HBM roofline, ~0.3% MFU.

Kernel design (MXU-shaped, zero HBM intermediates):
- Fold (F, H) into ONE token axis of length F·H — for the flagship
  config that is exactly 128, the MXU edge. The (B, F, H·D) input
  reshapes to (B, F·H, D) for free ([f][h][d] row-major contiguity).
- Per batch block: one batched 128×128×D logit matmul, add a STATIC
  block-diagonal mask (-inf where head_i ≠ head_j — cross-head logits
  are computed by the wide matmul but killed before softmax), f32
  softmax, one batched 128×128×D PV matmul. q/k/v/o cross HBM once.
- Cost: H× more logit FLOPs than mathematically needed (128² vs H·F²),
  but these are exactly the FLOPs the MXU does for free at this tile
  size; the win is eliminating 13× of HBM/relayout overhead.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _head_mask(f: int, heads: int) -> np.ndarray:
    """(F·H, F·H) additive mask: 0 where tokens share a head, -inf
    elsewhere. Token order is [f][h] (frame-major)."""
    h_of = np.tile(np.arange(heads), f)  # token i → head id
    same = h_of[:, None] == h_of[None, :]
    return np.where(same, 0.0, -np.inf).astype(np.float32)


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    q = q_ref[...]  # (BLK, FH, D) bf16/f32
    k = k_ref[...]
    v = v_ref[...]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale + mask_ref[...]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pick_block(fh: int, dim_head: int, itemsize: int) -> int:
    """Largest batch block whose double-buffered working set (q/k/v/o
    tiles + f32 logits and probs) stays within ~11 MB of the 16 MB VMEM."""
    row_bytes = fh * dim_head * itemsize * 4 + fh * fh * 4 * 2
    for blk in (64, 32, 16, 8):
        if 2 * blk * row_bytes <= 11 * 2**20:
            return blk
    return 8


def _temporal_xla(q, k, v, heads, scale):
    """Reference XLA lowering — used off-TPU and as the autodiff rule
    for the Pallas forward (mathematically identical attention)."""
    b, f, hd = q.shape
    dim_head = hd // heads
    qh = q.reshape(b, f, heads, dim_head)
    kh = k.reshape(b, f, heads, dim_head)
    vh = v.reshape(b, f, heads, dim_head)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", w, vh)
    return o.reshape(b, f, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _temporal_fused(q, k, v, heads, scale, block, interpret):
    """Pallas forward. Backward (below) differentiates the XLA lowering
    instead — pallas_call has no AD rule, and without this jax.grad
    through the UNet trainer dies on TPU (ADVICE r02 high)."""
    b, f, hd = q.shape
    dim_head = hd // heads
    fh = f * heads
    qf = q.reshape(b, fh, dim_head)
    kf = k.reshape(b, fh, dim_head)
    vf = v.reshape(b, fh, dim_head)
    mask = jnp.asarray(_head_mask(f, heads))

    spec = pl.BlockSpec((block, fh, dim_head), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        grid=(b // block,),
        in_specs=[
            spec, spec, spec,
            pl.BlockSpec((fh, fh), lambda i: (0, 0)),
        ],
        out_specs=spec,
        interpret=interpret,
    )(qf, kf, vf, mask)
    return out.reshape(b, f, hd)


def _temporal_fused_fwd(q, k, v, heads, scale, block, interpret):
    return _temporal_fused(q, k, v, heads, scale, block, interpret), (q, k, v)


def _temporal_fused_bwd(heads, scale, block, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b_, c: _temporal_xla(a, b_, c, heads, scale), q, k, v)
    return vjp(g)


_temporal_fused.defvjp(_temporal_fused_fwd, _temporal_fused_bwd)


def temporal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: float | None = None,
    block: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """q, k, v: (B, F, H·D), F small (the 16-frame window). → (B, F, H·D).

    Falls back to the XLA einsum path off-TPU or for non-dividing
    shapes; the Pallas path requires B % block == 0 (callers see B =
    batch·H·W spatial positions — always a big power-of-two here).
    Differentiable: reverse-mode AD routes through the XLA lowering."""
    b, f, hd = q.shape
    dim_head = hd // heads
    if block is None:
        block = _pick_block(f * heads, dim_head, jnp.dtype(q.dtype).itemsize)
    if scale is None:
        scale = 1.0 / math.sqrt(dim_head)
    on_tpu = False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        pass
    usable = (
        pltpu is not None
        and (interpret or on_tpu)
        and b % block == 0
        and f * heads <= 512  # logits tile stays comfortably in VMEM
    )
    if not usable:
        return _temporal_xla(q, k, v, heads, scale)
    return _temporal_fused(q, k, v, heads, scale, block, interpret)


# ---------------------------------------------------------------------------
# spatial self-attention without head transposes: grid over batch, heads
# sliced on the lane axis INSIDE the kernel (the (S, S) logits for one
# head live in VMEM; q/k/v/o cross HBM once in the model's native
# (B, S, H·D) layout — no (B,S,H,D)→(B,H,S,D) relayout round trips)
# ---------------------------------------------------------------------------


def _spatial_kernel(q_ref, k_ref, v_ref, o_ref, *, heads, dim_head, scale):
    q = q_ref[0]  # (BLK_Q, H·D)
    k = k_ref[0]  # (S, H·D) — keys/values for the whole sequence
    v = v_ref[0]
    for h in range(heads):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _spatial_xla(q, k, v, heads, scale):
    """Reference XLA/flash lowering — used off-TPU and as the autodiff
    rule for the Pallas forward."""
    b, s, hd = q.shape
    dim_head = hd // heads
    from .attention import dot_product_attention

    qh = q.reshape(b, s, heads, dim_head)
    kh = k.reshape(b, s, heads, dim_head)
    vh = v.reshape(b, s, heads, dim_head)
    return dot_product_attention(qh, kh, vh, scale=scale).reshape(b, s, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _spatial_fused(q, k, v, heads, scale, block_q, interpret):
    """Pallas forward; backward differentiates the XLA lowering (the
    per-head sliced o_ref writes in _spatial_kernel have no AD rule —
    ADVICE r02 high: jax.grad through attn1 crashed UNet training)."""
    b, s, hd = q.shape
    dim_head = hd // heads
    qspec = pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0))
    kvspec = pl.BlockSpec((1, s, hd), lambda i, j: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _spatial_kernel, heads=heads, dim_head=dim_head, scale=scale
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, s // block_q),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        interpret=interpret,
    )(q, k, v)


def _spatial_fused_fwd(q, k, v, heads, scale, block_q, interpret):
    return _spatial_fused(q, k, v, heads, scale, block_q, interpret), (q, k, v)


def _spatial_fused_bwd(heads, scale, block_q, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b_, c: _spatial_xla(a, b_, c, heads, scale), q, k, v)
    return vjp(g)


_spatial_fused.defvjp(_spatial_fused_fwd, _spatial_fused_bwd)


def spatial_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: float | None = None,
    block_q: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Self-attention on (B, S, H·D) without leaving that layout.

    For the UNet's spatial path (S = H·W tokens ≤ 1024, head dim 40).
    Falls back to the shared XLA/flash routing off-TPU.
    Differentiable: reverse-mode AD routes through the XLA lowering."""
    b, s, hd = q.shape
    dim_head = hd // heads
    if scale is None:
        scale = 1.0 / math.sqrt(dim_head)
    on_tpu = False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        pass
    if pltpu is None or (not interpret and not on_tpu) or s > 1024:
        return _spatial_xla(q, k, v, heads, scale)

    # whole-sequence q block: at S=1024/d=40 the per-step working set
    # (q/k/v/o + one (S, S) f32 logit tile per head in the unrolled head
    # loop) still fits VMEM, and fewer grid steps measured 10% faster
    # than 256-row blocking (micro_probe --which spatq: 4.76 vs 5.30 ms)
    if block_q is None:
        block_q = s
    block_q = min(block_q, s)
    if s % block_q:
        block_q = s if s <= 256 else 256
    return _spatial_fused(q, k, v, heads, scale, block_q, interpret)
