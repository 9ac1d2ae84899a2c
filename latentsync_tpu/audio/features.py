"""Audio → per-video-frame whisper embedding chunks.

Reimplements the Audio2Feature semantics (ref:latentsync/whisper/
audio2feature.py): the lip-sync UNet consumes, per video frame, a
(50, 384) block formed from 10 consecutive 50 Hz encoder timesteps
(±2 video frames of context at 25 fps), each carrying the stacked
(n_layer+1)=5 per-layer encoder embeddings.

Exact index math preserved:
- 30 s mel chunks of 3000 frames, zero-padded, encoder over each chunk
  keeps the first (end-start)/2 encoder frames
  (ref:audio2feature.py:102-115, transcribe.py:104-126)
- per-frame slice: center = int(i*50/fps), window
  [center-4, center+6) clamped to valid range (ref:audio2feature.py:24-49)
- chunk count loop condition `int(i*50/fps) > len(features)` reproduced
  (ref:audio2feature.py:85-100)

TPU-native differences: all 30 s segments are batched into ONE encoder
call; slicing is a vectorized jnp.take gather instead of a Python loop;
the on-disk .pt cache becomes an .npz cache.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperConfig
from ..models.whisper import WhisperEncoder
from ..ops.mel import (
    WHISPER_N_FRAMES,
    pad_or_trim,
    whisper_log_mel,
)


class Audio2Feature:
    """Whisper-embedding frontend.

    Parameters mirror ref:audio2feature.py:10-22. `params` is the
    WhisperEncoder flax param tree (converted from tiny.pt or trained).
    """

    def __init__(
        self,
        config: WhisperConfig = WhisperConfig.tiny(),
        params=None,
        audio_embeds_cache_dir: Optional[str] = None,
        num_frames: int = 16,
        audio_feat_length=(2, 2),
        dtype=jnp.float32,
    ):
        self.config = config
        self.model = WhisperEncoder(config, dtype=dtype)
        if params is None:
            params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, config.n_mels, 2 * config.n_audio_ctx)),
            )
        self.params = params
        self.audio_embeds_cache_dir = audio_embeds_cache_dir
        self.num_frames = num_frames
        self.embedding_dim = config.n_audio_state
        self.audio_feat_length = tuple(audio_feat_length)
        self._encode = jax.jit(
            lambda p, mel: self.model.apply(p, mel, include_embeddings=True)[1]
        )

    # -- encoder ------------------------------------------------------------

    def _audio2feat_array(self, audio: np.ndarray) -> np.ndarray:
        """Waveform (16 kHz float) → (T50, n_layer+1, n_state) feature array."""
        mel = whisper_log_mel(jnp.asarray(audio, jnp.float32))
        num_frames = mel.shape[-1]
        segments = []
        keep = []
        seek = 0
        while seek < num_frames:
            end = min(seek + WHISPER_N_FRAMES, num_frames)
            segments.append(pad_or_trim(mel[:, seek:end], WHISPER_N_FRAMES))
            # encoder downsamples time by 2 (ref:audio2feature.py:112)
            keep.append((end - seek) // 2)
            seek += WHISPER_N_FRAMES
        batch = jnp.stack(segments)  # (S, 80, 3000) — ONE batched encoder call
        embeds = self._encode(self.params, batch)  # (S, L+1, 1500, D)
        embeds = np.asarray(embeds.astype(jnp.float32))
        embeds = embeds.transpose(0, 2, 1, 3)  # (S, 1500, L+1, D)
        parts = [e[:k] for e, k in zip(embeds, keep)]
        return np.concatenate(parts, axis=0)

    def audio2feat(self, audio_or_path) -> np.ndarray:
        """Accepts a waveform array or an audio file path (with .npz cache,
        mirroring the .pt cache at ref:audio2feature.py:117-135)."""
        if isinstance(audio_or_path, (str, os.PathLike)):
            from ..utils.media import read_audio

            path = str(audio_or_path)
            if self.audio_embeds_cache_dir:
                cache = os.path.join(
                    self.audio_embeds_cache_dir, os.path.basename(path) + ".npz"
                )
                if os.path.isfile(cache):
                    try:
                        return np.load(cache)["features"]
                    except Exception:
                        os.remove(cache)
                feat = self._audio2feat_array(read_audio(path))
                os.makedirs(self.audio_embeds_cache_dir, exist_ok=True)
                np.savez(cache, features=feat)
                return feat
            return self._audio2feat_array(read_audio(path))
        return self._audio2feat_array(np.asarray(audio_or_path))

    # -- slicing ------------------------------------------------------------

    def slice_indices(self, vid_idx: int, length: int, fps: float = 25) -> np.ndarray:
        """The 10 clamped 50 Hz indices for one video frame
        (ref:audio2feature.py:24-49)."""
        left_ctx, right_ctx = self.audio_feat_length
        center = int(vid_idx * 50 / fps)
        idx = np.arange(center - left_ctx * 2, center + (right_ctx + 1) * 2)
        return np.clip(idx, 0, length - 1)

    def get_sliced_feature(self, feature_array: np.ndarray, vid_idx: int, fps: float = 25):
        idx = self.slice_indices(vid_idx, len(feature_array), fps)
        sel = feature_array[idx]  # (10, L+1, D)
        return sel.reshape(-1, self.embedding_dim), list(idx)

    def num_chunks(self, feature_len: int, fps: float) -> int:
        """Reproduces the upstream while-loop count
        (ref:audio2feature.py:91-98): frames are emitted for i=0.. until
        int(i*50/fps) > feature_len (inclusive of that final i)."""
        i = 0
        while True:
            i += 1
            if int(i * 50 / fps) > feature_len:
                return i

    def feature2chunks(self, feature_array: np.ndarray, fps: float) -> np.ndarray:
        """(T50, L+1, D) → (num_video_frames, 10*(L+1), D) vectorized gather."""
        n = self.num_chunks(len(feature_array), fps)
        idx = np.stack(
            [self.slice_indices(i, len(feature_array), fps) for i in range(n)]
        )  # (n, 10)
        chunks = feature_array[idx]  # (n, 10, L+1, D)
        return chunks.reshape(n, -1, self.embedding_dim)

    def crop_overlap_audio_window(self, audio_feat: np.ndarray, start_index: int) -> np.ndarray:
        """Training window slice (ref:audio2feature.py:137-143):
        (num_frames, 10*(L+1), D)."""
        idx = np.stack(
            [
                self.slice_indices(i, len(audio_feat), fps=25)
                for i in range(start_index, start_index + self.num_frames)
            ]
        )
        sel = audio_feat[idx]
        return sel.reshape(self.num_frames, -1, self.embedding_dim)
