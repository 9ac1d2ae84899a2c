"""Int8 dynamic-quantized 2D convolution for the UNet hot path.

Measured on the attached v5e (scripts/micro_probe --which int8): the
int8 MXU path runs the UNet's 3×3 convs ~1.5-1.6× faster than bf16
(conv3x3 32²×320: 1.96 → 1.23 ms; 16²×640: 1.70 → 1.12; 8²×1280:
1.71 → 1.10 — dynamic quantization included), while the dense/matmul
families are a wash or a regression (GEGLU up-proj 320→2560:
2.01 → 2.78 ms). The int8 path therefore covers ONLY the conv family —
40% of the forward's FLOPs — and leaves dense, attention, norms and the
DDIM step in bf16/f32.

Quantization scheme (chosen for the statistical fidelity gate — SyncNet
confidence within 2% of the reference, BASELINE.md — not bitwise
parity):
- weights: symmetric per-output-channel scales, computed from the live
  bf16/f32 params at trace time (param tree and checkpoint converters
  unchanged; requantization costs one pass over ~MB of weight bytes);
- activations: symmetric per-sample (per frame) scales from a dynamic
  |x| max — no calibration pass needed;
- accumulation in int32, dequant fused into the conv epilogue by XLA
  (measured: the dyn path costs ≈ nothing over pre-quantized inputs).

Enable with LATENTSYNC_INT8=1 (read at trace time). Validation protocol
once real weights drop in: convert checkpoint → run the demo clip with
LATENTSYNC_INT8=1 → scripts/eval_sync_conf on the output → gate at 2%
vs the bf16 run (docs/perf_audit.md "int8 numerics").
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def int8_enabled() -> bool:
    """Checked at trace time — set LATENTSYNC_INT8 before the first
    pipeline call (compiled programs bake the choice in)."""
    return os.environ.get("LATENTSYNC_INT8") == "1"


class QConv(nn.Module):
    """2D conv with nn.Conv's exact param layout ({kernel, bias}) that
    routes through the int8 MXU path under LATENTSYNC_INT8=1 and through
    a plain float conv otherwise — checkpoints/converters see one tree.
    Padding: int p → ((p,p),(p,p)); "SAME"/"VALID" pass through."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: object = "SAME"
    dtype: jnp.dtype = jnp.float32
    kernel_init: object = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init or nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if int8_enabled():
            return quantized_conv2d(x, kernel, bias, self.strides,
                                    self.padding)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), self.strides,
            pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


def int8_dense_mode() -> str:
    """Gate for the int8 dense matmuls, read at trace time.
    "" (off, default) — float matmul;
    "1"/"xla" — lax.dot_general int8 path (probe: square C→C
      projections win ~13%, wide GEGLU shapes lose to the HBM-side
      quantize/dequant traffic — docs/perf_audit.md int8 probe);
    "pallas" — ops/qmm fused kernel (quantize + dequant stay in VMEM)."""
    mode = os.environ.get("LATENTSYNC_INT8_DENSE", "")
    return {"1": "xla"}.get(mode, mode)


def int8_dense_enabled() -> bool:
    return int8_dense_mode() != ""


class DenseParams(nn.Module):
    """Declares an nn.Dense-identical param subtree ({kernel[, bias]})
    and returns the raw arrays — for callers that feed the params into a
    fused Pallas kernel (ops/ffn.py) instead of a per-layer matmul. The
    checkpoint tree is indistinguishable from QDense/nn.Dense."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (cin, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        return kernel, bias


def dense_with_params(x, kernel, bias, dtype):
    """The QDense forward on explicit params (same int8 routing)."""
    mode = int8_dense_mode()
    if not mode:
        y = x.astype(dtype) @ kernel.astype(dtype)
        return y + bias.astype(dtype) if bias is not None else y
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    if mode == "pallas":
        out = _qdense_pallas_ste(x2d, kernel, bias)
    else:
        out = _qdense_ste(x2d, kernel, bias)
    return out.astype(dtype).reshape(shape[:-1] + (kernel.shape[1],))


class QDense(nn.Module):
    """nn.Dense-compatible ({kernel[, bias]}) projection that runs the
    int8 MXU path under LATENTSYNC_INT8_DENSE=1: per-row (token)
    activation scales × per-output-channel weight scales, int32
    accumulation, dequant fused into the epilogue."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (cin, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        return dense_with_params(x, kernel, bias, self.dtype)


@jax.custom_vjp
def _qdense_ste(x, kernel, bias):
    """Int8 dense forward; straight-through float-matmul backward."""
    f32 = jnp.float32
    w = kernel.astype(f32)
    wmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)  # (1, out)
    wscale = jnp.maximum(wmax, 1e-8) / 127.0
    wq = jnp.round(w / wscale).astype(jnp.int8)
    xf = x.astype(f32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    ascale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / ascale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out = acc.astype(f32) * (wscale * ascale)
    if bias is not None:
        out = out + bias.astype(f32)
    return out.astype(x.dtype)


def _qdense_ste_fwd(x, kernel, bias):
    return _qdense_ste(x, kernel, bias), (x, kernel, bias)


def _qdense_ste_bwd(res, g):
    x, kernel, bias = res

    def float_dense(a, k, b):
        y = a.astype(jnp.float32) @ k.astype(jnp.float32)
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(a.dtype)

    _, vjp = jax.vjp(float_dense, x, kernel, bias)
    return vjp(g)


_qdense_ste.defvjp(_qdense_ste_fwd, _qdense_ste_bwd)


@jax.custom_vjp
def _qdense_pallas_ste(x, kernel, bias):
    """ops/qmm fused int8 forward; straight-through float backward."""
    from .qmm import quantized_matmul_pallas

    return quantized_matmul_pallas(x, kernel, bias)


def _qdense_pallas_ste_fwd(x, kernel, bias):
    return _qdense_pallas_ste(x, kernel, bias), (x, kernel, bias)


_qdense_pallas_ste.defvjp(_qdense_pallas_ste_fwd, _qdense_ste_bwd)


def quantized_conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    strides: Tuple[int, int] = (1, 1),
    padding="SAME",
) -> jnp.ndarray:
    """NHWC × HWIO int8 conv with dynamic activation quantization.

    x: (B, H, W, Cin) float; kernel: (kh, kw, Cin, Cout) float.
    Returns x.dtype. Out-channel weight scales × per-sample activation
    scales make the dequant exact per (sample, channel) pair.

    Differentiable via a straight-through estimator: the backward pass
    is the float conv's gradient (round() alone has zero gradient, which
    would silently kill training if the int8 flag is on)."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, (list, tuple)) and padding and not isinstance(padding, str):
        padding = tuple(tuple(p) for p in padding)
    return _qconv2d_ste(x, kernel, bias, tuple(strides), padding)


def _float_conv(x, kernel, bias, strides, padding):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.astype(jnp.float32), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _qconv2d_ste(x, kernel, bias, strides, padding):
    f32 = jnp.float32
    w = kernel.astype(f32)
    wmax = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True)  # (1,1,1,O)
    wscale = jnp.maximum(wmax, 1e-8) / 127.0
    wq = jnp.round(w / wscale).astype(jnp.int8)

    xf = x.astype(f32)
    amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)  # (B,1,1,1)
    ascale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / ascale), -127, 127).astype(jnp.int8)

    acc = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(f32) * (wscale.reshape(1, 1, 1, -1) * ascale)
    if bias is not None:
        out = out + bias.astype(f32)
    return out.astype(x.dtype)


def _qconv2d_ste_fwd(x, kernel, bias, strides, padding):
    return _qconv2d_ste(x, kernel, bias, strides, padding), (x, kernel, bias)


def _qconv2d_ste_bwd(strides, padding, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(
        lambda a, k, b: _float_conv(a, k, b, strides, padding), x, kernel, bias)
    return vjp(g)


_qconv2d_ste.defvjp(_qconv2d_ste_fwd, _qconv2d_ste_bwd)
