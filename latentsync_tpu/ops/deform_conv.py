"""Modulated deformable convolution v2 (DCNv2) as gather + matmul.

TPU equivalent of the reference's CUDA extension #1
(ref:basicsr/ops/dcn/src/deform_conv_cuda_kernel.cu, autograd wrapper
ref:basicsr/ops/dcn/deform_conv.py:27) used by basicsr archs. The CUDA
kernel is an im2col with learned per-tap offsets + bilinear sampling;
here the sampling grid becomes one batched gather (vectorized bilinear
interpolation) and the contraction one einsum on the MXU — fully
differentiable through JAX autodiff, no custom backward needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """img: (H, W, C); xs/ys: (...,) sample coords. Zero outside."""
    h, w, c = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0

    def at(yi, xi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = img.reshape(h * w, c)[yi * w + xi]
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    top = v00 * (1 - fx)[..., None] + v01 * fx[..., None]
    bot = v10 * (1 - fx)[..., None] + v11 * fx[..., None]
    return top * (1 - fy)[..., None] + bot * fy[..., None]


def modulated_deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """DCNv2 forward.

    x: (B, H, W, Cin); offset: (B, Ho, Wo, 2·kh·kw) as (y, x) pairs per
    tap (torchvision/basicsr layout); mask: (B, Ho, Wo, kh·kw) modulation
    in [0, 1]; weight: (kh, kw, Cin, Cout). Returns (B, Ho, Wo, Cout).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # base sampling grid: output position → kernel tap coords
    ys = jnp.arange(ho) * stride - padding
    xs = jnp.arange(wo) * stride - padding
    ky = jnp.arange(kh) * dilation
    kx = jnp.arange(kw) * dilation
    base_y = ys[:, None, None, None] + ky[None, None, :, None]  # (Ho,1,kh,1)
    base_x = xs[None, :, None, None] + kx[None, None, None, :]  # (1,Wo,1,kw)
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh, kw)).astype(jnp.float32)
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh, kw)).astype(jnp.float32)

    off = offset.reshape(b, ho, wo, kh * kw, 2)
    off_y = off[..., 0].reshape(b, ho, wo, kh, kw)
    off_x = off[..., 1].reshape(b, ho, wo, kh, kw)
    samp_y = base_y[None] + off_y
    samp_x = base_x[None] + off_x

    def sample_one(img, sy, sx, m):
        vals = _bilinear_gather(img, sx, sy)  # (Ho, Wo, kh, kw, Cin)
        return vals * m.reshape(ho, wo, kh, kw)[..., None]

    cols = jax.vmap(sample_one)(x, samp_y, samp_x, mask)  # (B,Ho,Wo,kh,kw,Cin)
    out = jnp.einsum(
        "bhwyxc,yxco->bhwo", cols, weight,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def dcn_v2_pack(x, weight_offset, bias_offset, weight, bias=None,
                stride=1, padding=1, dilation=1):
    """ModulatedDeformConvPack-style: offsets+mask predicted from x by a
    plain conv (ref:basicsr/ops/dcn/deform_conv.py DCNv2Pack)."""
    kh, kw = weight.shape[:2]
    pred = jax.lax.conv_general_dilated(
        x, weight_offset, (stride, stride),
        ((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias_offset is not None:
        pred = pred + bias_offset
    o1, o2, m = jnp.split(pred, 3, axis=-1)
    # interleave to (y, x) pairs per tap
    b, ho, wo, _ = o1.shape
    offset = jnp.stack([o1, o2], axis=-1).reshape(b, ho, wo, 2 * kh * kw)
    mask = jax.nn.sigmoid(m)
    return modulated_deform_conv2d(
        x, offset, mask, weight, bias, stride, padding, dilation
    )
