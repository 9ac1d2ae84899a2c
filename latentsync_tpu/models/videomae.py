"""VideoMAE-style video ViT + TREPA loss.

Re-derivation of the TREPA supervision path (ref:latentsync/trepa/
loss.py:21-54: VideoMAEv2-giant features, inputs interpolated to 224²,
normalized-feature MSE) and the vendored VideoMAEv2 ViT
(ref:latentsync/trepa/third_party/VideoMAEv2/videomaev2_finetune.py).

The backbone is a standard tubelet-embedded video ViT (joint space-time
attention) in flax; `giant` matches VideoMAEv2-g dims for weight
conversion, `tiny` exists for tests and for training without the 1B-param
giant on one chip.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import dot_product_attention


@dataclass(frozen=True)
class VideoViTConfig:
    img_size: int = 224
    num_frames: int = 16
    patch_size: int = 14
    tubelet_size: int = 2
    embed_dim: int = 1408
    depth: int = 40
    num_heads: int = 16
    mlp_ratio: float = 48 / 11

    @classmethod
    def giant(cls):
        return cls()

    @classmethod
    def tiny(cls):
        return cls(patch_size=16, embed_dim=64, depth=2, num_heads=4, mlp_ratio=4.0)


def sinusoid_encoding_table(n_position: int, d_hid: int) -> np.ndarray:
    """(ref:videomaev2_finetune.py:357-368): position_angle_vec with
    sin on even dims, cos on odd dims."""
    pos = np.arange(n_position)[:, None]
    i = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (i // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        b, t, _ = x.shape
        d = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, t, 3, self.heads, d), 3, axis=2)
        o = dot_product_attention(q[:, :, 0], k[:, :, 0], v[:, :, 0])
        o = nn.Dense(self.dim, dtype=self.dtype, name="proj")(o.reshape(b, t, self.dim))
        x = x + o
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        hidden = int(self.dim * self.mlp_ratio)
        h = nn.Dense(hidden, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class VideoViT(nn.Module):
    """Tubelet-embedded joint space-time ViT; returns pooled features."""

    config: VideoViTConfig = VideoViTConfig.giant()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video):
        """video: (B, T, H, W, 3) → (B, embed_dim) mean-pooled features."""
        cfg = self.config
        b, t, h, w, c = video.shape
        x = nn.Conv(
            cfg.embed_dim,
            (cfg.tubelet_size, cfg.patch_size, cfg.patch_size),
            strides=(cfg.tubelet_size, cfg.patch_size, cfg.patch_size),
            dtype=self.dtype, name="patch_embed",
        )(video.astype(self.dtype))
        x = x.reshape(b, -1, cfg.embed_dim)
        n = x.shape[1]
        # FIXED sinusoid position table — the finetune model uses
        # use_learnable_pos_emb=False so the released checkpoint carries
        # no pos_embed parameter (ref:videomaev2_finetune.py:357-420)
        x = x + jnp.asarray(sinusoid_encoding_table(n, cfg.embed_dim),
                            self.dtype)[None]
        for i in range(cfg.depth):
            x = ViTBlock(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                         dtype=self.dtype, name=f"blocks_{i}")(x)
        # use_mean_pooling head: mean FIRST, then fc_norm
        # (ref:videomaev2_finetune.py:519-520)
        return nn.LayerNorm(dtype=jnp.float32, name="fc_norm")(x.mean(axis=1))


class TREPALoss:
    """Temporal-representation alignment loss (ref:trepa/loss.py:21-54):
    resize to 224², extract video features, normalized-feature MSE."""

    def __init__(self, params=None, config: VideoViTConfig = VideoViTConfig.tiny(),
                 dtype=jnp.float32):
        self.model = VideoViT(config, dtype=dtype)
        self.config = config
        if params is None:
            from ..utils.params import fast_init

            params = fast_init(
                lambda v: self.model.init(jax.random.PRNGKey(0), v),
                jnp.zeros((1, config.num_frames, config.img_size, config.img_size, 3)),
            )
        self.params = params

    def __call__(self, pred_video, gt_video):
        """(B, F, H, W, 3) in [-1, 1] each → scalar loss. Jit-safe."""
        cfg = self.config

        def prep(v):
            b, f, h, w, c = v.shape
            flat = v.reshape(b * f, h, w, c)
            flat = jax.image.resize(
                flat, (b * f, cfg.img_size, cfg.img_size, c), "bilinear"
            )
            vid = flat.reshape(b, f, cfg.img_size, cfg.img_size, c)
            if f < cfg.num_frames:
                reps = -(-cfg.num_frames // f)
                vid = jnp.tile(vid, (1, reps, 1, 1, 1))[:, : cfg.num_frames]
            return vid[:, : cfg.num_frames]

        fa = self.model.apply(self.params, prep(pred_video))
        fb = self.model.apply(self.params, prep(gt_video))
        fa = fa / jnp.maximum(jnp.linalg.norm(fa, axis=-1, keepdims=True), 1e-10)
        fb = fb / jnp.maximum(jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-10)
        return jnp.mean((fa - fb) ** 2)


def convert_videomae(sd):
    """vit_g_hybrid_pt_1200e_ssv2_ft.pth ({'module'} or flat) → VideoViT
    params. Torch naming (ref:videomaev2_finetune.py): patch_embed.proj,
    blocks.N.{norm1,norm2,attn.{qkv,q_bias,v_bias,proj},mlp.{fc1,fc2}},
    fc_norm; the attention qkv bias is the concat [q_bias, 0, v_bias]
    (qkv Linear itself is bias-free upstream). head/head_dropout are the
    classifier — dropped (TREPA uses forward_features only)."""
    import numpy as np

    sd = sd.get("module", sd.get("model", sd))
    params = {}
    pend_qv = {}

    def put(path, name, w):
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[name] = w

    for key, w in sd.items():
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "patch_embed":
            if leaf == "weight":  # (E, 3, t, p, p) → (t, p, p, 3, E)
                put(("patch_embed",), "kernel", np.transpose(w, (2, 3, 4, 1, 0)))
            else:
                put(("patch_embed",), "bias", w)
        elif parts[0] == "blocks":
            blk = f"blocks_{parts[1]}"
            sub = parts[2]
            if sub in ("norm1", "norm2"):
                put((blk, sub), "scale" if leaf == "weight" else "bias", w)
            elif sub == "attn":
                inner = parts[3]
                if inner == "qkv":
                    put((blk, "qkv"), "kernel", w.T)
                elif inner in ("q_bias", "v_bias"):
                    pend_qv.setdefault(blk, {})[inner] = w
                elif inner == "proj":
                    put((blk, "proj"),
                        "kernel" if leaf == "weight" else "bias",
                        w.T if leaf == "weight" else w)
            elif sub == "mlp":
                put((blk, parts[3]),
                    "kernel" if leaf == "weight" else "bias",
                    w.T if leaf == "weight" else w)
        elif parts[0] == "fc_norm":
            put(("fc_norm",), "scale" if leaf == "weight" else "bias", w)
        # head / head_dropout: classifier, unused by forward_features
    for blk, qv in pend_qv.items():
        qb, vb = qv["q_bias"], qv["v_bias"]
        put((blk, "qkv"), "bias",
            np.concatenate([qb, np.zeros_like(qb), vb]))
    return {"params": params}
