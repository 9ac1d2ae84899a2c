"""Fused GroupNorm + SiLU Pallas kernel (SURVEY §7 target kernel).

One VMEM round trip instead of XLA's separate reduce + normalize
passes: each grid step loads one sample's (rows, C) tile, computes
per-group mean/var in f32, applies scale/shift + SiLU, and writes the
activation — the normalized f32 intermediate never exists in HBM.

Mosaic-friendly statistics: group reductions go through a one-hot
(C, groups) indicator matmul on the MXU instead of a (rows, G, C/G)
reshape (whose tiny last dim the TPU tiler rejects for C/G < 128).

Layout contract: x is (N, C) with N = batch·spatial; callers fold
(B, F, H, W) themselves — per-frame vs cross-frame statistics are a
caller-side reshape, matching the two GroupNorm semantics in the UNet.
rows_per_sample = rows belonging to one statistics sample.

Falls back to plain jnp off-TPU or for incompatible shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _group_onehot(c: int, groups: int) -> np.ndarray:
    g = np.zeros((c, groups), np.float32)
    gsize = c // groups
    for i in range(c):
        g[i, i // gsize] = 1.0
    return g


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, g_ref, o_ref, *, eps, silu, denom):
    x = x_ref[...].astype(jnp.float32)  # (rows, C)
    g = g_ref[...]  # (C, groups) one-hot
    # per-group sums over the whole sample via MXU
    s1 = jnp.dot(jnp.sum(x, axis=0, keepdims=True), g,
                 preferred_element_type=jnp.float32)  # (1, groups)
    s2 = jnp.dot(jnp.sum(x * x, axis=0, keepdims=True), g,
                 preferred_element_type=jnp.float32)
    mean_g = s1 / denom
    var_g = s2 / denom - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels: (1, groups) @ (groups, C)
    mean_c = jnp.dot(mean_g, g.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, g.T, preferred_element_type=jnp.float32)
    y = (x - mean_c) * inv_c
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    rows_per_sample: int,
    eps: float = 1e-5,
    silu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (N, C) with N a multiple of rows_per_sample; statistics are
    computed per (rows_per_sample, C/groups) slab. Returns same shape."""
    n, c = x.shape
    if (
        pltpu is None
        or n % rows_per_sample != 0
        or c % groups != 0
        or (not interpret and jax.devices()[0].platform != "tpu")
    ):
        return _reference(x, scale, bias, groups, rows_per_sample, eps, silu)

    gsize = c // groups
    denom = float(rows_per_sample * gsize)
    onehot = jnp.asarray(_group_onehot(c, groups))
    scale2 = scale.reshape(1, c)
    bias2 = bias.reshape(1, c)
    grid = (n // rows_per_sample,)
    kernel = functools.partial(_gn_silu_kernel, eps=eps, silu=silu, denom=denom)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows_per_sample, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows_per_sample, c), lambda i: (i, 0)),
        interpret=interpret,
    )(x, scale2, bias2, onehot)


def _gn_silu_streaming_kernel(
    x_ref, scale_ref, bias_ref, g_ref, o_ref, acc_ref, *, eps, silu, denom
):
    """Two-phase grid (sample, phase, block): phase 0 accumulates per-
    group Σx/Σx² into VMEM scratch, phase 1 normalizes + SiLU + writes.
    x blocks cross HBM twice (the price of not fitting one sample in
    VMEM); no f32 intermediate ever exists in HBM."""
    p = pl.program_id(1)
    b = pl.program_id(2)
    x = x_ref[...].astype(jnp.float32)  # (blk_rows, C)
    g = g_ref[...]  # (C, groups) one-hot

    @pl.when((p == 0) & (b == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(p == 0)
    def _accumulate():
        s1 = jnp.dot(jnp.sum(x, axis=0, keepdims=True), g,
                     preferred_element_type=jnp.float32)
        s2 = jnp.dot(jnp.sum(x * x, axis=0, keepdims=True), g,
                     preferred_element_type=jnp.float32)
        acc_ref[0:1] += s1
        acc_ref[1:2] += s2

    @pl.when(p == 1)
    def _normalize():
        mean_g = acc_ref[0:1] / denom
        var_g = acc_ref[1:2] / denom - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        mean_c = jnp.dot(mean_g, g.T, preferred_element_type=jnp.float32)
        inv_c = jnp.dot(inv_g, g.T, preferred_element_type=jnp.float32)
        y = (x - mean_c) * inv_c
        y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[...] = y.astype(o_ref.dtype)

    @pl.when(p == 0)
    def _keep():
        # phase-0 visits still copy the output block back; write the
        # input through so the dead store is at least well-defined
        o_ref[...] = x_ref[...]


def group_norm_silu_streaming(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    rows_per_sample: int,
    eps: float = 1e-5,
    silu: bool = True,
    block_rows: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Large-sample GN+SiLU: samples whose (rows, C) slab exceeds VMEM
    (the UNet's cross-frame statistics, rows = F·H·W up to 16384).
    Requires rows_per_sample % block_rows == 0."""
    n, c = x.shape
    if (
        pltpu is None
        or n % rows_per_sample != 0
        or rows_per_sample % block_rows != 0
        or c % groups != 0
        or (not interpret and jax.devices()[0].platform != "tpu")
    ):
        return _reference(x, scale, bias, groups, rows_per_sample, eps, silu)

    gsize = c // groups
    denom = float(rows_per_sample * gsize)
    onehot = jnp.asarray(_group_onehot(c, groups))
    nblk = rows_per_sample // block_rows
    grid = (n // rows_per_sample, 2, nblk)
    xspec = pl.BlockSpec((block_rows, c), lambda s, p, b: (s * nblk + b, 0))
    kernel = functools.partial(
        _gn_silu_streaming_kernel, eps=eps, silu=silu, denom=denom
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            xspec,
            pl.BlockSpec((1, c), lambda s, p, b: (0, 0)),
            pl.BlockSpec((1, c), lambda s, p, b: (0, 0)),
            pl.BlockSpec((c, groups), lambda s, p, b: (0, 0)),
        ],
        out_specs=xspec,
        scratch_shapes=[pltpu.VMEM((2, groups), jnp.float32)],
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c), onehot)


def group_norm_silu_auto(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    rows_per_sample: int,
    eps: float = 1e-5,
    silu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Route to the single-block kernel when one sample's f32 slab fits
    VMEM comfortably, else to the two-phase streaming kernel; plain XLA
    when neither tiles. Callers pass (N, C) rows-flattened activations."""
    n, c = x.shape
    budget = 2 * 2**20  # f32 slab budget per block
    if rows_per_sample * c * 4 <= budget:
        return group_norm_silu(
            x, scale, bias, groups, rows_per_sample, eps=eps, silu=silu,
            interpret=interpret,
        )
    blk = rows_per_sample
    while blk % 2 == 0 and blk * c * 4 > budget:
        blk //= 2
    if blk * c * 4 > budget or rows_per_sample % blk:
        return _reference(x, scale, bias, groups, rows_per_sample, eps, silu)
    return group_norm_silu_streaming(
        x, scale, bias, groups, rows_per_sample, eps=eps, silu=silu,
        block_rows=blk, interpret=interpret,
    )


def _reference(x, scale, bias, groups, rows_per_sample, eps, silu):
    n, c = x.shape
    s = n // rows_per_sample
    xf = x.astype(jnp.float32).reshape(s, rows_per_sample, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(n, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)
