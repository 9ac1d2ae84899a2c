"""Short-time Fourier transform as a jittable XLA graph.

The reference computes STFTs twice, with different conventions:
- whisper frontend: torch.stft(n_fft=400, hop=160, hann, center=True,
  reflect pad)  (ref:latentsync/whisper/whisper/audio.py:92-125)
- Wav2Lip mel for SyncNet: librosa.stft(n_fft=800, hop=200, win=800,
  center=True)  (ref:latentsync/utils/audio.py:74-78)

Both are periodic-Hann, centered, reflect-padded STFTs; we implement one
framing + rfft core in jnp. Framing is expressed as a strided gather so XLA
lowers it to cheap dynamic-slices; the rfft runs on the VPU. For the mel
path the |.|^2 and filterbank matmul fuse into a single HLO program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window — matches torch.hann_window / scipy fftbins=True."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / win_length))


def frame_signal(audio: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Center-pad (reflect) and slice audio into overlapping frames.

    Returns (num_frames, n_fft) with num_frames = 1 + len(audio)//hop.
    """
    pad = n_fft // 2
    padded = jnp.pad(audio, (pad, pad), mode="reflect")
    num_frames = 1 + audio.shape[0] // hop_length
    # Gather-based framing: indices (num_frames, n_fft)
    idx = (
        jnp.arange(num_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )
    return padded[idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def stft_magnitude(
    audio: jnp.ndarray, n_fft: int, hop_length: int, win_length: int | None = None
) -> jnp.ndarray:
    """|STFT| with centered periodic-Hann framing.

    Returns (n_fft//2 + 1, num_frames) to match torch/librosa layout.
    """
    if win_length is None:
        win_length = n_fft
    frames = frame_signal(audio, n_fft, hop_length)
    window = hann_window(win_length, dtype=audio.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * window[None, :], axis=-1)
    return jnp.abs(spec).T


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def stft_power(
    audio: jnp.ndarray, n_fft: int, hop_length: int, win_length: int | None = None
) -> jnp.ndarray:
    """Power spectrogram |STFT|^2, (n_fft//2+1, num_frames)."""
    mag = stft_magnitude(audio, n_fft, hop_length, win_length)
    return mag * mag


def preemphasis(audio: jnp.ndarray, coef: float) -> jnp.ndarray:
    """First-order preemphasis filter y[n] = x[n] - coef*x[n-1]
    (ref:latentsync/utils/audio.py:30-33, scipy.signal.lfilter([1,-k],[1],x))."""
    return jnp.concatenate([audio[:1], audio[1:] - coef * audio[:-1]])


def preemphasis_np(audio: np.ndarray, coef: float) -> np.ndarray:
    out = np.empty_like(audio)
    out[0] = audio[0]
    out[1:] = audio[1:] - coef * audio[:-1]
    return out
