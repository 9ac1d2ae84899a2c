"""Multi-head scaled-dot-product attention for TPU.

The reference calls torch F.scaled_dot_product_attention (FlashAttention-2)
inside every spatial/audio/temporal attention layer
(ref:latentsync/models/attention.py:271, motion_module.py:300) and a
hand-rolled softmax attention in the whisper encoder
(ref:latentsync/whisper/whisper/model.py:88-100).

On TPU the sequence lengths in this workload are small (≤1500 audio,
≤1024 spatial, 16 temporal) while batch is large, so a single fused XLA
einsum-softmax-einsum already keeps the MXU busy; `dot_product_attention`
below is that path with f32 softmax accumulation. A Pallas flash kernel
(`flash_attention`) is provided for the long-sequence spatial case where
materializing (B,H,S,S) scores becomes HBM-bound.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable under the pure-CPU test mesh
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Attention over (..., S, H, D) tensors with heads as a batch dim.

    q: (..., Sq, H, D); k, v: (..., Sk, H, D). Returns (..., Sq, H, D).
    Softmax is computed in float32 regardless of input dtype (matching the
    reference's float softmax, ref:whisper/model.py:99).

    Routing: long self-attention sequences on TPU go through the fused
    Pallas flash kernel (no (S,S) logit materialization — the HBM hog of
    the XLA path); everything else uses the einsum-softmax-einsum program.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if (
        mask is None
        and q.ndim == 4
        and q.shape[1] >= 256
        and q.shape[1] == k.shape[1]
        and _pick_block(q.shape[1]) is not None
        and _on_tpu()
    ):
        return _flash_bshd(q, k, v, scale)
    dtype = q.dtype
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("...hqk,...khd->...qhd", weights, v)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pick_block(s: int) -> int | None:
    """Largest 128-multiple block ≤512 that tiles the sequence exactly."""
    for blk in (512, 256, 128):
        if s % blk == 0:
            return blk
    return None


def _flash_bshd(q, k, v, scale):
    """(B, S, H, D) attention via jax's TPU flash-attention kernel."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as tpu_flash,
    )

    qt = jnp.swapaxes(q, 1, 2)  # (B, H, S, D)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    blk = _pick_block(qt.shape[2])
    sizes = BlockSizes(block_q=blk, block_k_major=blk, block_k=blk, block_b=1)
    o = tpu_flash(qt, kt, vt, causal=False, sm_scale=scale, block_sizes=sizes)
    return jnp.swapaxes(o, 1, 2)


# ---------------------------------------------------------------------------
# single-shot spatial attention: whole (S, S) logits in VMEM, one grid
# step per (batch, head). For S ≤ 1024 the f32 logit tile is ≤ 4 MB, so
# no streaming softmax is needed — beats the generic flash kernel's
# block pipeline at this workload's shapes (S=1024, d=40).
# ---------------------------------------------------------------------------


def _oneshot_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # (S, D)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (S, S) f32 in VMEM
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def oneshot_attention(q, k, v, scale=None, interpret: bool = False):
    """q, k, v: (B, S, D) with B folding batch·heads; S ≤ 1024."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, s, d = q.shape
    spec = pl.BlockSpec((1, s, d), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_oneshot_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------------------------
# Pallas flash attention (non-causal, no mask) for large spatial self-attn
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block_k):
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    block_q, d = q.shape
    num_kv = kv_len // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 256,
) -> jnp.ndarray:
    """Streaming-softmax attention Pallas kernel.

    q, k, v: (B, S, D) where B already folds batch*heads. Non-causal,
    unmasked — exactly the shape of the UNet's spatial/temporal/audio
    attention. Falls back to the XLA path when shapes don't tile.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, sq, d = q.shape
    kv_len = k.shape[1]
    if (
        pltpu is None
        or sq % block_q != 0
        or kv_len % block_k != 0
        or d % 128 != 0
    ):
        # XLA fallback (also used on CPU test backend)
        logits = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
        return jnp.einsum("bqk,bkd->bqd", w, v)

    grid = (b, sq // block_q)
    return pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=kv_len, block_k=block_k
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, kv_len, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
    )(q, k, v)
