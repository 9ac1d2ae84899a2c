"""Frozen-SyncNet scoring: AV offset + sync confidence.

Re-derivation of the Chung & Zisserman scorer the reference uses as its
acceptance metric (ref:eval/syncnet/syncnet.py:18-113 model,
syncnet_eval.py:20-157 scoring): 3D-conv lip tower on 5-frame windows of
224² crops, 2D-conv tower on 20-step MFCC windows, ±vshift L2 distance
search → offset = argmin, confidence = median − min.

TPU-native: all 5-frame windows are formed by one gather and scored in
one batched jitted forward; the (T × 2·vshift+1) distance matrix is a
single vectorized norm instead of the reference's per-frame loop.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .mfcc import mfcc


class _ConvBNRelu(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = None
    padding: tuple = None
    conv_dim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        strides = self.strides or (1,) * self.conv_dim
        pad = self.padding or tuple((0, 0) for _ in range(self.conv_dim))
        x = nn.Conv(
            self.features, self.kernel, strides=strides, padding=pad,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def _maxpool(x, window, strides, padding="VALID"):
    dims = (1,) + window + (1,)
    strd = (1,) + strides + (1,)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strd,
        padding if isinstance(padding, str) else [(0, 0)] + list(padding) + [(0, 0)],
    )


class SyncNetS(nn.Module):
    """The classic SyncNet scorer (ref:eval/syncnet/syncnet.py:18).

    forward_aud: MFCC windows (B, 13, 20, 1) → (B, 1024)
    forward_lip: frame windows (B, 5, 112, 112, 3) → (B, 1024)
    (the reference feeds 224² images; its first conv stride-2 halves them
    — we accept the same 224² inputs, shape (B, 5, 224, 224, 3)).
    """

    embedding_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, lip, aud):
        return self.forward_lip(lip), self.forward_aud(aud)

    @nn.nowrap
    def _fc_names(self, prefix):
        return f"{prefix}_fc1", f"{prefix}_bn", f"{prefix}_fc2"

    def _fc(self, x, prefix):
        n1, nb, n2 = self._fc_names(prefix)
        x = nn.Dense(512, dtype=self.dtype, name=n1)(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=jnp.float32, name=nb)(x)
        x = nn.relu(x)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name=n2)(x)

    @nn.compact
    def forward_aud(self, x):
        """x: (B, 13, 20, 1) MFCC image (freq, time) channels-last."""
        x = _ConvBNRelu(64, (3, 3), (1, 1), ((1, 1), (1, 1)), name="aud_0")(x)
        x = _ConvBNRelu(192, (3, 3), (1, 1), ((1, 1), (1, 1)), name="aud_1")(x)
        x = _maxpool(x, (3, 3), (1, 2))
        x = _ConvBNRelu(384, (3, 3), (1, 1), ((1, 1), (1, 1)), name="aud_2")(x)
        x = _ConvBNRelu(256, (3, 3), (1, 1), ((1, 1), (1, 1)), name="aud_3")(x)
        x = _ConvBNRelu(256, (3, 3), (1, 1), ((1, 1), (1, 1)), name="aud_4")(x)
        x = _maxpool(x, (3, 3), (2, 2))
        x = _ConvBNRelu(512, (5, 4), (1, 1), ((0, 0), (0, 0)), name="aud_5")(x)
        x = x.reshape(x.shape[0], -1)
        return self._fc(x, "aud")

    @nn.compact
    def forward_lip(self, x):
        """x: (B, 5, H, W, 3) frame window (H=W=224)."""
        x = _ConvBNRelu(96, (5, 7, 7), (1, 2, 2), ((0, 0), (0, 0), (0, 0)),
                        conv_dim=3, name="lip_0")(x)
        x = _maxpool(x, (1, 3, 3), (1, 2, 2))
        x = _ConvBNRelu(256, (1, 5, 5), (1, 2, 2), ((0, 0), (1, 1), (1, 1)),
                        conv_dim=3, name="lip_1")(x)
        x = _maxpool(x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)])
        x = _ConvBNRelu(256, (1, 3, 3), (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
                        conv_dim=3, name="lip_2")(x)
        x = _ConvBNRelu(256, (1, 3, 3), (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
                        conv_dim=3, name="lip_3")(x)
        x = _ConvBNRelu(256, (1, 3, 3), (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
                        conv_dim=3, name="lip_4")(x)
        x = _maxpool(x, (1, 3, 3), (1, 2, 2))
        x = _ConvBNRelu(512, (1, 6, 6), (1, 1, 1), ((0, 0), (0, 0), (0, 0)),
                        conv_dim=3, name="lip_5")(x)
        x = x.reshape(x.shape[0], -1)
        return self._fc(x, "lip")


def pairwise_shift_distances(
    feat_lip: jnp.ndarray, feat_aud: jnp.ndarray, vshift: int = 15
) -> jnp.ndarray:
    """(T, 2·vshift+1) matrix of L2 distances between lip feature i and
    audio feature i+k−vshift (vectorized ref:syncnet_eval.py:20-33;
    out-of-range shifts hit zero-padding exactly like the reference)."""
    t, d = feat_lip.shape
    win = 2 * vshift + 1
    padded = jnp.pad(feat_aud, ((vshift, vshift), (0, 0)))
    idx = jnp.arange(t)[:, None] + jnp.arange(win)[None, :]
    shifted = padded[idx]  # (T, win, D)
    diff = feat_lip[:, None, :] - shifted
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 1e-12))


def offset_and_confidence(dists: jnp.ndarray, vshift: int = 15):
    """(av_offset, min_dist, confidence) from the distance matrix
    (ref:syncnet_eval.py:142-153)."""
    mean_dists = jnp.mean(dists, axis=0)  # (win,)
    minidx = jnp.argmin(mean_dists)
    min_dist = mean_dists[minidx]
    conf = jnp.median(mean_dists) - min_dist
    av_offset = vshift - minidx
    return int(av_offset), float(min_dist), float(conf)


class SyncNetEvaluator:
    """Video+audio → (av_offset, min_dist, confidence)."""

    def __init__(self, params=None, dtype=jnp.float32):
        self.model = SyncNetS(dtype=dtype)
        if params is None:
            from ..utils.params import fast_init

            params = fast_init(
                lambda l, a: self.model.init(jax.random.PRNGKey(0), l, a),
                jnp.zeros((1, 5, 224, 224, 3)),
                jnp.zeros((1, 13, 20, 1)),
            )
        self.params = params
        self._lip_fn = jax.jit(
            lambda p, x: self.model.apply(p, x, method="forward_lip")
        )
        self._aud_fn = jax.jit(
            lambda p, x: self.model.apply(p, x, method="forward_aud")
        )

    def features(self, frames: np.ndarray, audio: np.ndarray, batch_size: int = 64):
        """frames: (F, 224, 224, 3) uint8/float; audio: 16 kHz mono."""
        f = len(frames)
        cc = mfcc(audio, 16000).T  # (13, T100)
        min_len = min(f, cc.shape[1] // 4)
        last = min_len - 5
        if last <= 0:
            raise ValueError("clip too short for SyncNet scoring")

        frames = np.asarray(frames, np.float32)
        win_idx = np.arange(last)[:, None] + np.arange(5)[None, :]
        lip_wins = frames[win_idx]  # (last, 5, H, W, 3)
        aud_idx = (np.arange(last) * 4)[:, None] + np.arange(20)[None, :]
        aud_wins = cc[:, aud_idx].transpose(1, 0, 2)[..., None].astype(np.float32)

        lip_feats, aud_feats = [], []
        for i in range(0, last, batch_size):
            lw = lip_wins[i : i + batch_size]
            aw = aud_wins[i : i + batch_size]
            pad = batch_size - len(lw)
            if pad:
                lw = np.concatenate([lw, np.repeat(lw[-1:], pad, 0)])
                aw = np.concatenate([aw, np.repeat(aw[-1:], pad, 0)])
            lip_feats.append(np.asarray(self._lip_fn(self.params, jnp.asarray(lw)))[: batch_size - pad or None])
            aud_feats.append(np.asarray(self._aud_fn(self.params, jnp.asarray(aw)))[: batch_size - pad or None])
        return np.concatenate(lip_feats)[:last], np.concatenate(aud_feats)[:last]

    def evaluate_arrays(self, frames, audio, vshift: int = 15):
        lip, aud = self.features(frames, audio)
        dists = pairwise_shift_distances(jnp.asarray(lip), jnp.asarray(aud), vshift)
        return offset_and_confidence(dists, vshift)

    def evaluate(self, video_path: str, vshift: int = 15):
        """Mirror of ref:syncnet_eval.py:46-157 on a (precropped or raw)
        video file — frames resized to 224² like the reference."""
        import cv2

        from ..utils.media import read_audio, read_video

        frames = read_video(video_path, change_fps=False)
        frames = np.stack(
            [cv2.resize(fr, (224, 224)) for fr in frames]
        )
        audio = read_audio(_audio_source(video_path), 16000)
        return self.evaluate_arrays(frames, audio, vshift)


def _audio_source(video_path: str) -> str:
    """Audio for scoring: the video container (ffmpeg) or a sidecar wav
    (the no-ffmpeg backend writes one next to the mp4)."""
    import os

    from ..utils.media import HAVE_FFMPEG

    if HAVE_FFMPEG:
        return video_path
    sidecar = video_path.rsplit(".", 1)[0] + ".wav"
    if os.path.isfile(sidecar):
        return sidecar
    return video_path


def syncnet_eval(
    evaluator: SyncNetEvaluator, video_path: str, temp_dir: str = "temp"
) -> Tuple[int, float, float]:
    """Drop-in helper mirroring ref:eval/eval_sync_conf.py:25."""
    return evaluator.evaluate(video_path)
