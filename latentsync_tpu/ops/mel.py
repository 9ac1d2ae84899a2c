"""Mel spectrograms: whisper log-mel and Wav2Lip-style mel.

Two distinct, both load-bearing conventions (SURVEY §7 step 1):

1. Whisper log-mel (feeds the audio encoder):
   torch-STFT n_fft=400 hop=160, drop last frame, slaney mel-80,
   log10-clamp, max-8 floor, (x+4)/4 scaling
   (ref:latentsync/whisper/whisper/audio.py:92-125).

2. Wav2Lip mel (feeds SyncNet):
   preemphasis 0.97, librosa-STFT n_fft=800 hop=200 win=800, slaney mel-80
   fmin=55 fmax=7600, amp_to_db w/ -100dB floor, -20dB ref, symmetric
   normalize to [-4, 4] (ref:latentsync/utils/audio.py:59-161,
   ref:configs/audio.yaml).

The filterbank construction reproduces librosa.filters.mel(htk=False,
norm='slaney') from the published formula so we carry no librosa
dependency; a golden test compares against the reference's saved
mel_filters.npz.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioDSPConfig
from .stft import preemphasis, stft_magnitude, stft_power

# Whisper frontend constants (ref:latentsync/whisper/whisper/audio.py:13-19)
WHISPER_SAMPLE_RATE = 16000
WHISPER_N_FFT = 400
WHISPER_N_MELS = 80
WHISPER_HOP_LENGTH = 160
WHISPER_CHUNK_LENGTH = 30
WHISPER_N_SAMPLES = WHISPER_CHUNK_LENGTH * WHISPER_SAMPLE_RATE  # 480000
WHISPER_N_FRAMES = WHISPER_N_SAMPLES // WHISPER_HOP_LENGTH  # 3000


def _hz_to_mel_slaney(freq):
    """Slaney-style (librosa default, htk=False) Hz→mel."""
    freq = np.asanyarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = freq >= min_log_hz
        mels[log_t] = min_log_mel + np.log(freq[log_t] / min_log_hz) / logstep
    elif freq >= min_log_hz:
        mels = min_log_mel + np.log(freq / min_log_hz) / logstep
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asanyarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs[log_t] = min_log_hz * np.exp(logstep * (mels[log_t] - min_log_mel))
    return freqs


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular mel filterbank, slaney mel scale + slaney area norm.

    Matches librosa.filters.mel defaults; shape (n_mels, 1 + n_fft//2).
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)

    mel_min = _hz_to_mel_slaney(fmin)
    mel_max = _hz_to_mel_slaney(fmax)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    weights = np.zeros((n_mels, n_bins), dtype=np.float64)
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _whisper_filters() -> np.ndarray:
    return mel_filterbank(WHISPER_SAMPLE_RATE, WHISPER_N_FFT, WHISPER_N_MELS)


@jax.jit
def whisper_log_mel(audio: jnp.ndarray) -> jnp.ndarray:
    """Whisper log-mel spectrogram, (80, n_frames).

    n_frames = len(audio)//160 (the last STFT frame is dropped, matching
    ref:latentsync/whisper/whisper/audio.py:117).
    """
    power = stft_power(audio, WHISPER_N_FFT, WHISPER_HOP_LENGTH)[:, :-1]
    filters = jnp.asarray(_whisper_filters())
    mel = filters @ power
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


def pad_or_trim(mel: jnp.ndarray, length: int = WHISPER_N_FRAMES) -> jnp.ndarray:
    """Pad (zeros) or trim the time axis to `length`
    (ref:latentsync/whisper/whisper/audio.py:52-73)."""
    t = mel.shape[-1]
    if t > length:
        return mel[..., :length]
    if t < length:
        pad = [(0, 0)] * (mel.ndim - 1) + [(0, length - t)]
        return jnp.pad(mel, pad)
    return mel


# ---------------------------------------------------------------------------
# Wav2Lip-style mel for SyncNet
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _wav2lip_filters(cfg: AudioDSPConfig) -> np.ndarray:
    return mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.num_mels, fmin=cfg.fmin, fmax=cfg.fmax
    )


def _amp_to_db(x: jnp.ndarray, min_level_db: float) -> jnp.ndarray:
    min_level = jnp.exp(min_level_db / 20.0 * jnp.log(10.0))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def _normalize(s: jnp.ndarray, cfg: AudioDSPConfig) -> jnp.ndarray:
    # symmetric + clipping path (the configured mode, ref:configs/audio.yaml)
    scaled = (s - cfg.min_level_db) / (-cfg.min_level_db)
    if cfg.symmetric_mels:
        out = 2.0 * cfg.max_abs_value * scaled - cfg.max_abs_value
        lo, hi = -cfg.max_abs_value, cfg.max_abs_value
    else:
        out = cfg.max_abs_value * scaled
        lo, hi = 0.0, cfg.max_abs_value
    if cfg.allow_clipping_in_normalization:
        out = jnp.clip(out, lo, hi)
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def wav2lip_melspectrogram(
    audio: jnp.ndarray, cfg: AudioDSPConfig = AudioDSPConfig()
) -> jnp.ndarray:
    """Wav2Lip mel, (80, n_frames) at 80 frames/sec for 16 kHz audio
    (hop 200). Mirrors ref:latentsync/utils/audio.py:59-65."""
    if cfg.preemphasize:
        audio = preemphasis(audio, cfg.preemphasis)
    mag = stft_magnitude(audio, cfg.n_fft, cfg.hop_size, cfg.win_size)
    filters = jnp.asarray(_wav2lip_filters(cfg))
    mel = filters @ mag
    s = _amp_to_db(mel, cfg.min_level_db) - cfg.ref_level_db
    if cfg.signal_normalization:
        s = _normalize(s, cfg)
    return s


def wav2lip_melspectrogram_np(
    audio: np.ndarray, cfg: AudioDSPConfig = AudioDSPConfig()
) -> np.ndarray:
    """Host-side convenience wrapper (data pipeline / caches)."""
    return np.asarray(wav2lip_melspectrogram(jnp.asarray(audio, jnp.float32), cfg))
