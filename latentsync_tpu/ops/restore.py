"""Device-side batched face restore (inverse-warp + soft-mask composite).

TPU fast path for the paste-back stage (ref:latentsync/utils/
affine_transform.py:85-115): on a 1-core host the per-frame cv2/native
pipeline is serial; here the whole frame batch restores in one jitted
program — batched bilinear warp (one XLA gather), erosion as min-pool
(`lax.reduce_window`), Gaussian blur as two 1-D depthwise convs, fused
composite.

The erosion/blur radius is area-derived per clip (the reference derives
it per frame from the warped mask area; within a clip the face scale is
~constant, so one radius per call keeps shapes static for jit — radii
are bucketed to bound compile variants).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.face import warp_affine_batch


def _min_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k×k erosion on (B, H, W) masks, replicate borders (cv2.erode)."""
    if k <= 1:
        return x
    r = k // 2
    pads = [(0, 0), (r, k - 1 - r), (r, k - 1 - r)]
    xp = jnp.pad(x, pads, mode="edge")
    return jax.lax.reduce_window(
        xp, jnp.inf, jax.lax.min, (1, k, k), (1, 1, 1), "VALID"
    )


def _gaussian_blur(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Separable Gaussian on (B, H, W), sigma per cv2's ksize formula."""
    if ksize <= 1:
        return x
    r = ksize // 2
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    t = np.arange(-r, r + 1)
    kern = np.exp(-(t**2) / (2 * sigma**2))
    kern = (kern / kern.sum()).astype(np.float32)
    kx = jnp.asarray(kern)[None, :, None, None]  # (1, k, 1, 1) HWIO
    xp = x[..., None]  # (B, H, W, 1)
    xp = jax.lax.conv_general_dilated(
        xp, kx, (1, 1), [(0, 0), (r, r)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    ky = jnp.asarray(kern)[:, None, None, None]
    xp = jax.lax.conv_general_dilated(
        xp, ky, (1, 1), [(r, r), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return xp[..., 0]


@functools.partial(jax.jit, static_argnames=("frame_hw", "edge"))
def _restore_kernel(frames, faces, matrices, frame_hw: Tuple[int, int], edge: int):
    h, w = frame_hw
    # inputs arrive uint8 (host↔device transfer is 4× cheaper than f32 —
    # the dominant cost for 1080p frame batches); compute in f32
    frames = frames.astype(jnp.float32)
    faces = faces.astype(jnp.float32)
    warped = warp_affine_batch(faces, matrices, (h, w), fill=0.0)
    fh, fw = faces.shape[1:3]
    ones = jnp.ones(faces.shape[:1] + (fh, fw, 1), jnp.float32)
    mask = warp_affine_batch(ones, matrices, (h, w), fill=0.0)[..., 0]
    mask = _min_pool(mask, 2)
    soft = _min_pool(mask, edge * 2) if edge > 0 else mask
    soft = _gaussian_blur(soft, edge * 2 + 1) if edge > 0 else soft
    soft = soft[..., None]
    pasted = mask[..., None] * warped
    out = soft * pasted + (1.0 - soft) * frames
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def restore_frames_device(
    frames: np.ndarray,
    faces: np.ndarray,
    matrices: np.ndarray,
    chunk: int = 4,
) -> np.ndarray:
    """frames (N,H,W,3) uint8; faces (N,fh,fw,3) uint8; matrices (N,2,3)
    forward align matrices. Returns composited uint8 frames.

    matrices map frame→crop; warp_affine_batch expects a crop→frame
    (src→dst) matrix, so invert on host first.
    """
    n, h, w, _ = frames.shape
    fh, fw = faces.shape[1:3]

    # invert 2x3 on host (crop→frame direction for the batched warp)
    a = matrices[:, :, :2]
    t = matrices[:, :, 2]
    det = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    inv_a = np.stack(
        [a[:, 1, 1], -a[:, 0, 1], -a[:, 1, 0], a[:, 0, 0]], axis=-1
    ).reshape(n, 2, 2) / det[:, None, None]
    inv_t = -np.einsum("nij,nj->ni", inv_a, t)
    inv_m = np.concatenate([inv_a, inv_t[:, :, None]], axis=2)

    # area-derived edge radius, shared across the clip, bucketed to
    # multiples of 8 so serving reuses a handful of compiled programs
    scale_area = np.abs(det).mean()
    area = fh * fw / max(scale_area, 1e-9)
    edge = int(np.sqrt(area)) // 20
    edge = min(max(edge, 0), 64)
    if edge > 0:
        edge = max(8, int(round(edge / 8)) * 8)

    out = np.empty_like(frames)
    for i in range(0, n, chunk):
        sl = slice(i, min(i + chunk, n))
        m = sl.stop - sl.start
        pad = chunk - m
        fr = frames[sl]
        fc = faces[sl]
        mt = inv_m[sl].astype(np.float32)
        if pad:
            fr = np.concatenate([fr, np.repeat(fr[-1:], pad, 0)])
            fc = np.concatenate([fc, np.repeat(fc[-1:], pad, 0)])
            mt = np.concatenate([mt, np.repeat(mt[-1:], pad, 0)])
        res = _restore_kernel(
            jnp.asarray(fr), jnp.asarray(fc), jnp.asarray(mt), (h, w), edge
        )
        out[sl] = np.asarray(res)[:m]
    return out
