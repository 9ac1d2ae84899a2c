"""Length reconciliation between audio chunks, audio samples and faces.

Serving-path toolkit mirroring ref:latentsync/utils/repeat.py: whisper
chunk lists are padded to ×16-frame windows with zero chunks, audio is
zero-padded by the same duration, faces/boxes/matrices are repeated or
truncated to match (consumed at ref:lipsync_pipeline.py:438-474).

All functions operate on numpy arrays or lists; chunk stacks are
(N, 50, D) arrays here rather than python lists of tensors.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple, Union

import numpy as np

Arr = Union[np.ndarray, list]


def repeat_to_length(array: Arr, target_length: int) -> Arr:
    """Tile to reach target length (ref:repeat.py:7-30)."""
    n = len(array)
    if n >= target_length:
        return array[:target_length]
    factor = -(-target_length // n)
    if isinstance(array, np.ndarray):
        # concatenate exactly target_length rows — np.tile materializes
        # factor*n rows before the slice, which for a video frame array
        # (125×1080p ≈ 0.8 GB) transiently doubles the allocation and
        # pins the full tile behind the returned view
        parts = [array] * (target_length // n)
        if target_length % n:
            parts.append(array[: target_length % n])
        return parts[0][:target_length] if len(parts) == 1 else np.concatenate(parts)
    return (list(array) * factor)[:target_length]


def truncate_to_length(array: Arr, target_length: int) -> Arr:
    """Truncate from the FRONT (ref:repeat.py:33-56)."""
    n = len(array)
    if n <= target_length:
        return array
    return array[n - target_length:]


def pad_chunks_end(
    chunks: np.ndarray,
    audio_samples: np.ndarray,
    audio_sample_rate: int,
    fps: float = 25,
    multiple: int = 16,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Append zero chunks until len % multiple == 0; zero-pad audio at the
    END by the same duration (ref:repeat.py pad_whisper_chunks_end
    semantics, used by the default pipeline path
    ref:lipsync_pipeline.py:443). Returns (chunks, audio, padding_sec)."""
    n = len(chunks)
    add = (multiple - n % multiple) % multiple
    pad_sec = add / fps
    if add:
        zeros = np.zeros((add,) + chunks.shape[1:], chunks.dtype)
        chunks = np.concatenate([chunks, zeros], axis=0)
        audio_samples = np.concatenate(
            [audio_samples, np.zeros(int(pad_sec * audio_sample_rate), audio_samples.dtype)]
        )
    return chunks, audio_samples, pad_sec


def pad_chunks_start(
    chunks: np.ndarray,
    audio_samples: np.ndarray,
    audio_sample_rate: int,
    fps: float = 25,
    multiple: int = 16,
) -> Tuple[np.ndarray, np.ndarray, float, int]:
    """Prepend zero chunks to ×multiple; zero-pad audio at the START
    (ref:repeat.py:81-118 pad_whisper_chunks). Returns
    (chunks, audio, padding_sec, num_prepended)."""
    n = len(chunks)
    add = (multiple - n % multiple) % multiple
    pad_sec = add / fps
    if add:
        zeros = np.zeros((add,) + chunks.shape[1:], chunks.dtype)
        chunks = np.concatenate([zeros, chunks], axis=0)
        audio_samples = np.concatenate(
            [np.zeros(int(pad_sec * audio_sample_rate), audio_samples.dtype), audio_samples]
        )
    return chunks, audio_samples, pad_sec, add


def pad_chunks_to_target(
    chunks: np.ndarray,
    audio_samples: np.ndarray,
    audio_sample_rate: int,
    target: int,
    fps: float = 25,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Pad/truncate chunks to exactly `target` frames, adjusting audio
    accordingly (ref:repeat.py pad_whisper_chunks_to_target, the
    force_video_length path ref:lipsync_pipeline.py:455)."""
    n = len(chunks)
    if n >= target:
        trimmed_sec = (n - target) / fps
        new_len = int(len(audio_samples) - trimmed_sec * audio_sample_rate)
        return chunks[:target], audio_samples[:max(new_len, 0)], 0.0
    add = target - n
    pad_sec = add / fps
    zeros = np.zeros((add,) + chunks.shape[1:], chunks.dtype)
    chunks = np.concatenate([chunks, zeros], axis=0)
    audio_samples = np.concatenate(
        [audio_samples, np.zeros(int(pad_sec * audio_sample_rate), audio_samples.dtype)]
    )
    return chunks, audio_samples, pad_sec


def add_start_silence(
    audio_samples: np.ndarray, audio_sample_rate: int, silence_duration: float = 1
) -> np.ndarray:
    """Prepend `silence_duration` seconds of zeros
    (ref:repeat.py:260-287) — serving pairs this with
    duplicate_first_frames so the model 'warms up' on a silent lead-in
    that process_video_with_trim later cuts off."""
    num = int(silence_duration * audio_sample_rate)
    return np.concatenate(
        [np.zeros(num, audio_samples.dtype), np.asarray(audio_samples)]
    )


def duplicate_first_frames(array: Arr, num_frames: int = 16) -> Arr:
    """Prepend a copy of the first `num_frames` entries
    (ref:repeat.py:290-326). Works on ndarrays and lists."""
    n = len(array)
    if n == 0:
        return array
    k = min(num_frames, n)
    if isinstance(array, np.ndarray):
        return np.concatenate([array[:k].copy(), array], axis=0)
    return list(array[:k]) + list(array)


def process_video_with_trim(
    temp_dir: str,
    video_out_path: str,
    padding_duration: float = 0,
    fps: float = 25,
    frames_to_trim: int = 16,
) -> str:
    """Cut the first 16 frames (the silent lead-in) plus trailing padding
    off temp_dir/{video.mp4,audio.wav} and mux to video_out_path
    (ref:repeat.py:329-368). Uses ffmpeg when present; otherwise trims
    with the in-repo cv2/scipy media layer."""
    import os

    from .media import (
        HAVE_FFMPEG,
        read_audio,
        read_video,
        write_audio,
        write_video,
    )

    in_video = os.path.join(temp_dir, "video.mp4")
    in_audio = os.path.join(temp_dir, "audio.wav")
    trim_sec = math.ceil(frames_to_trim / fps * 1000) / 1000

    if HAVE_FFMPEG:
        import subprocess

        trimmed_video = os.path.join(temp_dir, "trimmed_video.mp4")
        subprocess.run(
            ["ffmpeg", "-y", "-nostdin", "-v", "error", "-ss", f"{trim_sec}",
             "-i", in_video, "-c:v", "libx264", "-an", trimmed_video],
            check=True,
        )
        frames = read_video(trimmed_video, change_fps=False)
    else:
        frames = read_video(in_video, change_fps=False)[frames_to_trim:]
    if padding_duration > 0:
        keep = len(frames) - int(round(padding_duration * fps))
        frames = frames[:max(keep, 0)]

    sr = 16000
    audio = read_audio(in_audio, sr)
    start = int(trim_sec * sr)
    final_dur = len(frames) / fps
    audio = audio[start : start + int(final_dur * sr)]

    trimmed_audio = os.path.join(temp_dir, "trimmed_audio.wav")
    write_audio(trimmed_audio, audio, sr)
    # write_video muxes via ffmpeg, or writes a sidecar .wav without it
    write_video(video_out_path, frames, fps=fps, audio_path=trimmed_audio)
    return video_out_path
