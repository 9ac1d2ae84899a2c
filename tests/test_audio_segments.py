"""Audio2Feature multi-segment semantics: the 30 s chunking must produce
a continuous 50 Hz feature stream with exact per-segment trim lengths
(ref:audio2feature.py:102-115, transcribe.py:104-126)."""

import numpy as np

import jax
import jax.numpy as jnp

from latentsync_tpu.audio.features import Audio2Feature
from latentsync_tpu.config import WhisperConfig


def tiny_a2f():
    return Audio2Feature(
        WhisperConfig(n_audio_state=16, n_audio_head=4, n_audio_layer=1)
    )


def test_segment_trim_lengths(rng):
    a2f = tiny_a2f()
    # 40 s → mel 4000 frames → segments [3000, 1000] → keep [1500, 500]
    audio = (rng.standard_normal(16000 * 40) * 0.1).astype(np.float32)
    feats = a2f.audio2feat(audio)
    assert feats.shape == (2000, 2, 16)  # (T50, n_layer+1, D)


def test_segment_boundary_continuity(rng):
    """Features for a short clip must equal the head of the features of
    the same clip zero-extended past the 30 s boundary — the encoder
    pads each segment to 30 s anyway, so trailing silence cannot change
    earlier features."""
    a2f = tiny_a2f()
    audio = (rng.standard_normal(16000 * 30) * 0.1).astype(np.float32)
    short = a2f.audio2feat(audio)
    extended = a2f.audio2feat(
        np.concatenate([audio, np.zeros(16000 * 5, np.float32)])
    )
    assert extended.shape[0] == short.shape[0] + 250
    # the last few frames differ by construction: the short clip's final
    # STFT frames draw on reflect padding, the extended clip's on real
    # continuation (the reference computes mel over the whole file too)
    n = short.shape[0] - 4
    np.testing.assert_allclose(extended[:n], short[:n], atol=1e-5, rtol=1e-4)


def test_odd_duration_trim(rng):
    # 30.5 s → mel 3050 → segments keep [1500, 25]
    audio = (rng.standard_normal(int(16000 * 30.5)) * 0.1).astype(np.float32)
    feats = tiny_a2f().audio2feat(audio)
    assert feats.shape[0] == 1525
