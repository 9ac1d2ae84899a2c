"""Inception-3D (I3D, Kinetics-400) feature network for FVD.

The reference scores FVD with a TorchScript I3D
(ref:eval/fvd.py:28-44, `i3d_torchscript.pt`, `return_features=True` =
pre-softmax logits). TorchScript graphs don't convert directly, but the
underlying network is the public Inception-v1-3D ("rgb_imagenet+
kinetics") whose PyTorch ports expose a plain state dict
(Conv3d_1a_7x7 … Mixed_5c + Logits, Unit3D = conv3d+bn+relu) —
`convert_i3d` maps that naming onto this flax module, making FVD
numbers comparable with the reference once weights are converted.

TPU notes: channels-last NDHWC 3D convs (XLA lowers Conv3D straight to
the MXU), BN folded to inference-mode scale/shift, one jit for the
whole tower.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Unit3D(nn.Module):
    """conv3d + (optional) BN + (optional) relu — the I3D building block."""

    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding="SAME",
            use_bias=self.use_bias, dtype=self.dtype, name="conv3d",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=True, epsilon=1e-3, dtype=jnp.float32,
                name="bn",
            )(x)
        if self.activation:
            x = nn.relu(x)
        return x.astype(self.dtype)


class InceptionModule(nn.Module):
    """Four-branch inception block (piergiaj port naming b0/b1a/b1b/
    b2a/b2b/b3b)."""

    ch: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3b]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.ch
        b0 = Unit3D(c[0], dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(c[1], dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(c[2], (3, 3, 3), dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(c[3], dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(c[4], (3, 3, 3), dtype=self.dtype, name="b2b")(b2)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        b3 = Unit3D(c[5], dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# (name, channel spec) in network order; channel specs are the public
# Inception-v1/Kinetics-400 configuration
_MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class InceptionI3D(nn.Module):
    """(B, T, H, W, 3) video in [-1, 1] → (B, 400) pre-softmax logits
    (`return_features=True` semantics of the reference's TorchScript
    I3D) or (B, 1024) pooled Mixed_5c features with features='pool'."""

    num_classes: int = 400
    features: str = "logits"  # or "pool"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video):
        x = video.astype(self.dtype)
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype,
                   name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, dtype=self.dtype, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = InceptionModule(_MIXED["Mixed_3b"], dtype=self.dtype, name="Mixed_3b")(x)
        x = InceptionModule(_MIXED["Mixed_3c"], dtype=self.dtype, name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionModule(_MIXED[name], dtype=self.dtype, name=name)(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionModule(_MIXED["Mixed_5b"], dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionModule(_MIXED["Mixed_5c"], dtype=self.dtype, name="Mixed_5c")(x)

        # global average pool over (T', H', W') — the torch port avg-pools
        # (2,7,7) then means over remaining time; equivalent up to edge
        # windows, and exact for the FVD operating point (16, 224, 224)
        pooled = x.mean(axis=(2, 3), keepdims=False)  # (B, T', C)
        if self.features == "pool":
            return pooled.mean(axis=1)
        logits = Unit3D(
            self.num_classes, use_bn=False, activation=False, use_bias=True,
            dtype=self.dtype, name="Logits",
        )(pooled[:, :, None, None, :])[:, :, 0, 0, :]
        return logits.mean(axis=1)  # (B, 400)


# ---------------------------------------------------------------------------
# converter
# ---------------------------------------------------------------------------


def convert_i3d(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """piergiaj-style I3D state dict → InceptionI3D variables.

    torch keys: `<Block>[.<branch>].conv3d.weight` (O, I, kt, kh, kw),
    `....bn.{weight,bias,running_mean,running_var}`, plus
    `logits.conv3d.{weight,bias}`. Tolerates an optional leading
    `module.` and either `Logits`/`logits` capitalization."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(path, leaf, w):
        node = params if leaf in ("kernel", "bias", "scale") else stats
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = w

    for key, w in sd.items():
        parts = key.split(".")
        if parts[0] == "module":
            parts = parts[1:]
        block = parts[0]
        if block.lower() == "logits":
            base = ("Logits",)
            sub = parts[1:]
        elif block.startswith("Mixed"):
            base = (block, parts[1])
            sub = parts[2:]
        elif block.startswith(("Conv3d", "conv3d")):
            base = (block,)
            sub = parts[1:]
        else:
            continue
        if sub[0] == "conv3d":
            if sub[1] == "weight":
                put(base + ("conv3d",), "kernel", np.transpose(w, (2, 3, 4, 1, 0)))
            else:
                put(base + ("conv3d",), "bias", w)
        elif sub[0] == "bn":
            leaf = sub[1]
            if leaf == "weight":
                put(base + ("bn",), "scale", w)
            elif leaf == "bias":
                put(base + ("bn",), "bias", w)
            elif leaf == "running_mean":
                put(base + ("bn",), "mean", w)
            elif leaf == "running_var":
                put(base + ("bn",), "var", w)
    return {"params": params, "batch_stats": stats}
