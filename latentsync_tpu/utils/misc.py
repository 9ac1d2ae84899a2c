"""Misc host utilities covering the reference's small helpers.

- http download + folder cleanup (ref:latentsync/utils/download.py:6)
- persistent-disk copy (ref:latentsync/utils/persist_data.py)
- audio padding/editing (ref:latentsync/utils/edit_audio.py)
- word-timestamp video trim hook (ref:latentsync/utils/whisper.py:6 —
  the reference shells out to the whisper CLI; here a pluggable
  transcriber yields word timestamps)
- video concat (ref:job-queue-listener/src/helpers/ffmpeg.ts)
- video duration counter / fileslist writer (ref:tools/)
"""

from __future__ import annotations

import os
import shutil
import urllib.request
from typing import List, Optional, Sequence

import numpy as np


def enable_compile_cache(path: str = "/root/.jax_cache") -> str:
    """Turn on JAX's persistent compilation cache, import-order-safe.

    `os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ...)` only works
    BEFORE `import jax` — the config default is read at import time, so
    setting the env var inside main() silently leaves the cache off and
    every process cold-compiles (minutes per denoise program on a
    1-core host). jax.config.update works regardless of import order.
    Honors an already-exported JAX_COMPILATION_CACHE_DIR."""
    path = os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    return path


def download_file(url: str, dst: str, timeout: float = 60.0) -> str:
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    with urllib.request.urlopen(url, timeout=timeout) as r, open(dst, "wb") as f:
        shutil.copyfileobj(r, f)
    return dst


def clean_folder(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


def persist_copy(src: str, persistent_dir: str) -> str:
    os.makedirs(persistent_dir, exist_ok=True)
    dst = os.path.join(persistent_dir, os.path.basename(src))
    shutil.copy(src, dst)
    return dst


def pad_audio_silence(audio: np.ndarray, sample_rate: int,
                      start_sec: float = 0.0, end_sec: float = 0.0) -> np.ndarray:
    """Prepend/append silence (ref:edit_audio.py / repeat.add_start_silence)."""
    pre = np.zeros(int(start_sec * sample_rate), audio.dtype)
    post = np.zeros(int(end_sec * sample_rate), audio.dtype)
    return np.concatenate([pre, audio, post])


def concat_videos(paths: Sequence[str], out_path: str) -> str:
    """Concatenate same-geometry videos (ffmpeg concat demuxer when
    available, frame-level concat otherwise)."""
    from .media import HAVE_FFMPEG, read_video, write_video

    if HAVE_FFMPEG:
        import subprocess
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            for p in paths:
                f.write(f"file '{os.path.abspath(p)}'\n")
            listfile = f.name
        subprocess.run(
            ["ffmpeg", "-y", "-nostdin", "-v", "error", "-f", "concat",
             "-safe", "0", "-i", listfile, "-c", "copy", out_path],
            check=True, capture_output=True,
        )
        os.unlink(listfile)
        return out_path
    frames = np.concatenate([read_video(p, change_fps=False) for p in paths])
    return write_video(out_path, frames)


def trim_video_by_word_timestamps(
    video_path: str, out_path: str, transcriber=None,
    start_word: Optional[int] = None, end_word: Optional[int] = None,
) -> str:
    """Trim a video to word boundaries given a transcriber that returns
    [(word, start_sec, end_sec)] (ref:utils/whisper.py shells to the
    whisper CLI for the same purpose)."""
    from .media import read_audio, read_video, write_audio, write_video

    if transcriber is None:
        raise RuntimeError(
            "no transcriber provided: plug any word-timestamp ASR "
            "(the whisper decoder is not part of the lip-sync path)"
        )
    words = transcriber(video_path)
    t0 = words[start_word or 0][1]
    t1 = words[(end_word if end_word is not None else len(words) - 1)][2]
    frames = read_video(video_path, change_fps=False)
    fps = 25
    seg = frames[int(t0 * fps): int(t1 * fps)]
    return write_video(out_path, seg, fps=fps)


def count_video_time(video_path: str) -> float:
    """(ref:latentsync/utils/util.py:337-342, tools/count_video_time.py)."""
    from .media import video_info

    w, h, fps, n = video_info(video_path)
    return n / fps if fps else 0.0


def gather_video_paths_recursively(input_dir: str) -> List[str]:
    """(ref:util.py:321-334)."""
    out = []
    for root, _, files in os.walk(input_dir):
        for f in sorted(files):
            if f.endswith(".mp4"):
                out.append(os.path.join(root, f))
    return out


def occupy_tpu(fraction_seconds: float = 3600.0):
    """TPU-occupier equivalent of ref:tools/occupy_gpu.py — keeps the
    chip busy with a trivial loop (testing/benchmark isolation)."""
    import time

    import jax
    import jax.numpy as jnp

    x = jnp.ones((1024, 1024), jnp.bfloat16)

    @jax.jit
    def spin(x):
        return x @ x * 1e-3

    t0 = time.time()
    while time.time() - t0 < fraction_seconds:
        x = spin(x)
        jax.block_until_ready(x)
