"""Pallas int8 matmul with fused dynamic quantization + dequant epilogue.

Why this exists: the XLA int8 dense path measured in
scripts/micro_probe (`--which int8`, docs/perf_audit.md "round-3 int8
probe") loses its MXU double-rate gain to memory traffic the graph
cannot hide — the rowwise-quantized activation tensor (M, K) int8 is
materialized in HBM, and the int32→f32 dequant epilogue on the wide
(M, 2560/5120) GEGLU outputs costs another full round trip. This kernel
keeps both inside VMEM:

  grid (M/bm, N/bn), n innermost —
    x block    (bm, K)  f32/bf16, index (i, ·) → fetched once per i
    wq block   (K, bn)  int8 (pre-quantized per out-channel)
    wsc block  (1, bn)  f32 weight scales
    out block  (bm, bn)
  in-kernel: rowwise |x| max → int8 quantize (VPU) → int8×int8 MXU dot
  (int32 accumulate) → dequant by ascale·wsc → cast to out dtype.

The activation quantize is recomputed per n-block (N/bn ≤ 4 times) —
VPU work traded for never writing xq to HBM. Weights are quantized
once per call from the live float params (param tree unchanged;
checkpoints/converters see the float kernel, same contract as
ops/qconv.py).

Numerics: identical quantization scheme to ops/qconv.QDense (symmetric
per-row activation scales, symmetric per-out-channel weight scales,
int32 accumulation) — covered by the same statistical fidelity gate
(SyncNet confidence within 2%, BASELINE.md; validation protocol:
scripts/validate_fidelity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _qmm_kernel(x_ref, wq_ref, wsc_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)                       # (bm, K)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)      # (bm, 1)
    ascale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(x / ascale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                      # (bm, bn) int32
    out = acc.astype(jnp.float32) * ascale * wsc_ref[:]    # dequant in VMEM
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def _qmm_pallas(x, wq, wsc, bm, bn, interpret):
    m, k = x.shape
    n = wq.shape[1]
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    return pl.pallas_call(
        _qmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, wq, wsc)


def _pick_blocks(m: int, k: int, n: int) -> tuple[int, int]:
    """Block sizes under a ~6 MB VMEM budget: x (bm,K) f32 + wq (K,bn)
    int8 + out (bm,bn) f32 + int32 acc. Favor wide bn (fewer redundant
    activation-quantize passes), bm to keep the MXU fed."""
    bn = min(n, 2048)
    while bn > 128:
        bm = min(m, 512)
        while bm >= 128:
            vmem = bm * k * 4 + k * bn + 2 * bm * bn * 4
            if vmem <= 6 * 1024 * 1024:
                return bm, bn
            bm //= 2
        bn //= 2
    return max(min(m, 128), 8), max(bn, 128)


def quantized_matmul_pallas(x2d: jnp.ndarray, kernel: jnp.ndarray,
                            bias=None, interpret: bool | None = None):
    """(M, K) @ (K, N) through the fused int8 kernel. x2d: float
    (bf16/f32); kernel: float (quantized here per out-channel). Returns
    x2d.dtype. Not differentiable by itself — wrap with the STE in
    ops/qconv (QDense handles that)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    w = kernel.astype(jnp.float32)
    wmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)      # (1, N)
    wscale = jnp.maximum(wmax, 1e-8) * (1.0 / 127.0)
    wq = jnp.round(w / wscale).astype(jnp.int8)
    m, k = x2d.shape
    n = w.shape[1]
    bm, bn = _pick_blocks(m, k, n)
    out = _qmm_pallas(x2d, wq, wscale, bm, bn, interpret)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
