"""DSP golden tests: STFT framing, mel filterbank vs the reference's saved
librosa filters, whisper log-mel vs a torch-STFT recomputation."""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from latentsync_tpu.ops.mel import (
    WHISPER_HOP_LENGTH,
    WHISPER_N_FFT,
    mel_filterbank,
    wav2lip_melspectrogram_np,
    whisper_log_mel,
)
from latentsync_tpu.ops.stft import preemphasis_np, stft_magnitude


def test_mel_filterbank_matches_reference_npz(reference_dir):
    path = os.path.join(
        reference_dir, "latentsync/whisper/whisper/assets/mel_filters.npz"
    )
    if not os.path.isfile(path):
        pytest.skip("no mel_filters.npz fixture")
    with np.load(path) as f:
        golden = f["mel_80"]
    mine = mel_filterbank(16000, 400, 80)
    assert mine.shape == golden.shape
    np.testing.assert_allclose(mine, golden, atol=2e-7)


def test_stft_matches_torch(rng):
    audio = rng.standard_normal(16000).astype(np.float32)
    mine = np.asarray(stft_magnitude(jnp.asarray(audio), 400, 160))
    window = torch.hann_window(400)
    ref = torch.stft(
        torch.from_numpy(audio), 400, 160, window=window, return_complex=True
    ).abs().numpy()
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=2e-3, rtol=1e-3)


def test_whisper_log_mel_matches_torch_pipeline(rng, reference_dir):
    """End-to-end whisper mel vs a torch recomputation of
    ref:whisper/audio.py:92-125."""
    audio = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    mine = np.asarray(whisper_log_mel(jnp.asarray(audio)))

    at = torch.from_numpy(audio)
    window = torch.hann_window(WHISPER_N_FFT)
    stft = torch.stft(at, WHISPER_N_FFT, WHISPER_HOP_LENGTH, window=window, return_complex=True)
    mag = stft[:, :-1].abs() ** 2
    with np.load(
        os.path.join(reference_dir, "latentsync/whisper/whisper/assets/mel_filters.npz")
    ) as f:
        filters = torch.from_numpy(f["mel_80"])
    mel = filters @ mag
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    golden = ((log_spec + 4.0) / 4.0).numpy()

    assert mine.shape == golden.shape == (80, 200)
    np.testing.assert_allclose(mine, golden, atol=2e-3, rtol=1e-2)


def test_wav2lip_mel_shape_and_range(rng):
    """80 mel frames/sec (hop 200 @ 16k), values clipped to [-4, 4]
    (ref:configs/audio.yaml, ref:latentsync/utils/audio.py:139-153)."""
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    mel = wav2lip_melspectrogram_np(audio)
    assert mel.shape == (80, 81)  # 1 + 16000//200
    assert mel.max() <= 4.0 + 1e-5 and mel.min() >= -4.0 - 1e-5


def test_preemphasis_matches_scipy(rng):
    from scipy import signal

    audio = rng.standard_normal(1000).astype(np.float32)
    mine = preemphasis_np(audio, 0.97)
    ref = signal.lfilter([1, -0.97], [1], audio)
    np.testing.assert_allclose(mine, ref, atol=1e-6)
