"""upfirdn2d: upsample → FIR filter → downsample (StyleGAN2 op).

TPU equivalent of the reference's CUDA extension #3
(ref:basicsr/ops/upfirdn2d/src/upfirdn2d_kernel.cu, python wrapper
ref:basicsr/ops/upfirdn2d/upfirdn2d.py). On TPU this is a single
`lax.conv_general_dilated`: zero-stuffing upsample = lhs_dilation, FIR =
depthwise conv, downsample = stride — XLA fuses all three (SURVEY §2.5
TPU-native note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad=(0, 0)) -> jnp.ndarray:
    """x: (B, H, W, C); kernel: (kh, kw) FIR filter; pad: (pad0, pad1).

    Matches the CUDA op's semantics: insert (up-1) zeros between samples,
    pad by (pad0, pad1), correlate with `kernel`, keep every `down`-th
    sample.
    """
    c = x.shape[-1]
    pad0, pad1 = pad
    # depthwise correlate = conv with the flipped kernel, grouped per channel
    k_depthwise = jnp.asarray(kernel, x.dtype)[::-1, ::-1][:, :, None, None]
    k_depthwise = jnp.tile(k_depthwise, (1, 1, 1, c))
    # lhs_dilation produces (h-1)·up+1 samples; the op's zero-stuffing
    # definition appends zeros to h·up — add the missing (up-1) as
    # trailing padding
    out = jax.lax.conv_general_dilated(
        x,
        k_depthwise,
        window_strides=(down, down),
        padding=((pad0, pad1 + up - 1), (pad0, pad1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def _make_resample_kernel(k) -> np.ndarray:
    k = np.asarray(k, np.float64)
    if k.ndim == 1:
        k = np.outer(k, k)
    return (k / k.sum()).astype(np.float32)


def upsample2d(x, kernel=(1, 3, 3, 1), factor: int = 2):
    """(ref:basicsr/ops/upfirdn2d wrapper semantics for StyleGAN2 up)."""
    k = _make_resample_kernel(kernel) * (factor**2)
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), up=factor,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample2d(x, kernel=(1, 3, 3, 1), factor: int = 2):
    k = _make_resample_kernel(kernel)
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), down=factor,
                     pad=((p + 1) // 2, p // 2))


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2,
                     scale: float = 2**0.5):
    """StyleGAN2 fused bias+LeakyReLU+scale — the reference's CUDA
    extension #2 (ref:basicsr/ops/fused_act/src/fused_bias_act_kernel.cu);
    on TPU XLA fuses this elementwise chain for free."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale
