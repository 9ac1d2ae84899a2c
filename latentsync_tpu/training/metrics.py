"""Image metrics: PSNR / SSIM (ref:basicsr/metrics/psnr_ssim.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b, max_val: float = 255.0) -> float:
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return float(10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    t = np.arange(size) - size // 2
    k = np.exp(-(t**2) / (2 * sigma**2))
    k = k / k.sum()
    return np.outer(k, k).astype(np.float32)


def ssim(a, b, max_val: float = 255.0) -> float:
    """Single-scale SSIM with the standard 11×11 σ=1.5 Gaussian window,
    averaged over channels (matches basicsr's cv2 implementation)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 3:
        a = a[None]
        b = b[None]
    k = jnp.asarray(_gaussian_kernel())[:, :, None, None]
    c = a.shape[-1]
    k = jnp.tile(k, (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = filt(a)
    mu_b = filt(b)
    var_a = filt(a * a) - mu_a**2
    var_b = filt(b * b) - mu_b**2
    cov = filt(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return float(jnp.mean(s))
