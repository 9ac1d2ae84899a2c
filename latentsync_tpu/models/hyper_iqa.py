"""HyperIQA: no-reference image quality assessment.

Re-derivation of ref:eval/hyper_iqa.py:19-343 (HyperNet + TargetNet):
a ResNet50 backbone extracts multi-scale features; local distortion
features from three stages are pooled into a target-input vector; a
hypernetwork head predicts the weights of a small per-image MLP
(TargetNet) that maps the vector to a quality score. Used by the data
pipeline's visual-quality gate at threshold 40
(ref:preprocess/filter_visual_quality.py:57, README.md:148-149).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn3")(h)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            identity = nn.BatchNorm(use_running_average=True, dtype=jnp.float32,
                                    name="ds_bn")(identity)
        return nn.relu(h + identity)


class ResNet50Backbone(nn.Module):
    """ResNet50 returning stage outputs (C2..C5)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        outs = []
        for stage, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            for b in range(blocks):
                h = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(h)
            outs.append(h)
        return outs


class HyperIQA(nn.Module):
    """(ref:eval/hyper_iqa.py HyperNet + TargetNet). Input (B, 224, 224, 3)
    ImageNet-normalized; output quality scores (B,) (higher = better,
    typical range 0-100)."""

    lda_out: int = 16
    hyper_in: int = 112
    target_in: int = 224
    target_fc1: int = 112
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c2, c3, c4, c5 = ResNet50Backbone(dtype=self.dtype, name="res")(x)

        # local distortion aware heads (lda): pool early stages to a
        # shared target-input vector (ref:hyper_iqa.py lda_x_pool/fc)
        def lda(feat, ch, pool, idx, out_dim):
            # ref ldaN_pool.0 convs are bias-free (ref:hyper_iqa.py:235-252)
            h = nn.Conv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"lda{idx}_conv")(feat)
            h = nn.avg_pool(h, (pool, pool), strides=(pool, pool))
            h = h.reshape(h.shape[0], -1)
            return nn.Dense(out_dim, dtype=self.dtype, name=f"lda{idx}_fc")(h)

        v1 = lda(c2, 16, 7, 1, self.lda_out)
        v2 = lda(c3, 32, 7, 2, self.lda_out)
        v3 = lda(c4, 64, 7, 3, self.lda_out)
        v4 = c5.mean(axis=(1, 2))
        v4 = nn.Dense(self.target_in - 3 * self.lda_out, dtype=self.dtype,
                      name="lda4_fc")(v4)
        target_vec = jnp.concatenate([v1, v2, v3, v4], axis=-1)  # (B, 224)

        # hyper head: 1×1 conv stack over C5 (torch Sequential indices
        # conv1.0/.2/.4, ref:hyper_iqa.py:50-58)
        h = nn.Conv(1024, (1, 1), dtype=self.dtype, name="conv1_0")(c5)
        h = nn.relu(h)
        h = nn.Conv(512, (1, 1), dtype=self.dtype, name="conv1_2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.hyper_in, (1, 1), dtype=self.dtype, name="conv1_4")(h)
        h = nn.relu(h)  # (B, 7, 7, hyperInChn)
        pooled = h.mean(axis=(1, 2))  # AdaptiveAvgPool2d(1)

        b = x.shape[0]
        fs2 = h.shape[1] * h.shape[2]  # feature_size² = 49

        def gen_w(name, f_in, f_out):
            """TargetNet weights come from a 3×3 CONV over the 7×7 hyper
            map, reshaped channel-major (ref:hyper_iqa.py:60-70,92-100)."""
            wmap = nn.Conv(f_in * f_out // fs2, (3, 3), padding=1,
                           dtype=self.dtype, name=name)(h)
            wmap = jnp.transpose(wmap, (0, 3, 1, 2))  # torch flatten order
            return wmap.reshape(b, f_out, f_in)

        def gen_b(name, f_out):
            return nn.Dense(f_out, dtype=self.dtype, name=name)(pooled)

        # per-image MLP 224 → 112 → 56 → 28 → 14 → 1 with sigmoid gates
        # (ref TargetNet l1-l4)
        dims = [self.target_in, 112, 56, 28, 14]
        v = target_vec
        for i in range(4):
            w = gen_w(f"fc{i + 1}w_conv", dims[i], dims[i + 1])
            bias = gen_b(f"fc{i + 1}b_fc", dims[i + 1])
            v = jax.nn.sigmoid(jnp.einsum("boi,bi->bo", w, v) + bias)
        w5 = nn.Dense(dims[4], dtype=self.dtype, name="fc5w_fc")(pooled)
        b5 = nn.Dense(1, dtype=self.dtype, name="fc5b_fc")(pooled)
        score = jnp.sum(w5 * v, axis=-1, keepdims=True) + b5
        return score[:, 0]


class HyperIQAScorer:
    """Frame scorer for the preprocess quality gate."""

    def __init__(self, params=None, dtype=jnp.float32):
        self.model = HyperIQA(dtype=dtype)
        if params is None:
            from ..utils.params import fast_init

            params = fast_init(
                lambda x: self.model.init(jax.random.PRNGKey(0), x),
                jnp.zeros((1, 224, 224, 3)),
            )
        self.params = params
        self._fn = jax.jit(lambda p, x: self.model.apply(p, x))

    def __call__(self, frame_rgb: np.ndarray) -> float:
        import cv2

        img = cv2.resize(frame_rgb, (224, 224)).astype(np.float32) / 255.0
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        img = (img - mean) / std
        return float(self._fn(self.params, jnp.asarray(img[None]))[0])


def convert_hyperiqa(sd):
    """koniq_pretrained.pkl HyperNet state dict → HyperIQA params
    (torch naming: res.* backbone incl. res.ldaN_pool.0/ldaN_fc,
    conv1.{0,2,4} hyper stack, fcNw_conv/fcNb_fc/fc5w_fc/fc5b_fc)."""
    import numpy as np

    params = {}
    stats = {}

    def put(tree, path, name, w):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[name] = w

    def put_cv(path, leaf, w):
        if leaf == "weight":
            put(params, path, "kernel", np.transpose(w, (2, 3, 1, 0)))
        else:
            put(params, path, "bias", w)

    def put_lin(path, leaf, w):
        if leaf == "weight":
            put(params, path, "kernel", w.T)
        else:
            put(params, path, "bias", w)

    def put_bn(path, leaf, w):
        if leaf == "weight":
            put(params, path, "scale", w)
        elif leaf == "bias":
            put(params, path, "bias", w)
        elif leaf == "running_mean":
            put(stats, path, "mean", w)
        elif leaf == "running_var":
            put(stats, path, "var", w)

    for key, w in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "res":
            sub = parts[1]
            if sub.startswith("lda") and sub.endswith("_pool"):
                put_cv((sub.replace("_pool", "_conv"),), leaf, w)
            elif sub.startswith("lda") and sub.endswith("_fc"):
                put_lin((sub,), leaf, w)
            elif sub in ("conv1", "bn1"):
                (put_cv if sub == "conv1" else put_bn)(("res", sub), leaf, w)
            elif sub.startswith("layer"):
                blk = f"{sub}_{parts[2]}"
                inner = parts[3]
                if inner.startswith("bn"):
                    put_bn(("res", blk, inner), leaf, w)
                elif inner.startswith("conv"):
                    put_cv(("res", blk, inner), leaf, w)
                elif inner == "downsample":
                    if parts[4] == "0":
                        put_cv(("res", blk, "ds_conv"), leaf, w)
                    else:
                        put_bn(("res", blk, "ds_bn"), leaf, w)
        elif parts[0] == "conv1":
            put_cv((f"conv1_{parts[1]}",), leaf, w)
        elif parts[0].endswith("w_conv"):
            put_cv((parts[0],), leaf, w)
        elif parts[0].endswith("b_fc") or parts[0] == "fc5w_fc":
            put_lin((parts[0],), leaf, w)
    return {"params": params, "batch_stats": stats}
