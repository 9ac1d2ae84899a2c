"""Media I/O: video/audio read and write with backend probing.

Replaces the reference's decord/cv2/ffmpeg mix (ref:latentsync/utils/
util.py:46-210, whisper/whisper/audio.py:22-49). Two backends:

- **ffmpeg CLI** (production): rawvideo/pcm pipes, no PNG round-trips —
  the reference dumps every frame as PNG then re-encodes
  (ref:util.py:142-148); we stream raw RGB straight into libx264 and mux
  audio in the same pass.
- **cv2 + scipy** (fallback when no ffmpeg binary exists): cv2
  VideoCapture/VideoWriter for mp4 video, scipy.io.wavfile +
  resample_poly for WAV audio. Audio tracks inside containers are not
  reachable on this backend.
"""

from __future__ import annotations

import fractions
import json
import os
import shutil
import subprocess
import warnings
from typing import Optional, Tuple

import numpy as np

HAVE_FFMPEG = shutil.which("ffmpeg") is not None


def check_ffmpeg_installed() -> bool:
    return HAVE_FFMPEG


def _run(cmd, **kw):
    return subprocess.run(cmd, check=True, capture_output=True, **kw)


# ---------------------------------------------------------------------------
# probing
# ---------------------------------------------------------------------------


def probe(path: str) -> dict:
    if HAVE_FFMPEG:
        out = _run(
            [
                "ffprobe", "-v", "error", "-print_format", "json",
                "-show_streams", "-show_format", str(path),
            ]
        ).stdout
        return json.loads(out)
    import cv2

    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise IOError(f"cannot open {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    fr = fractions.Fraction(fps).limit_denominator(1001)
    return {
        "streams": [
            {
                "codec_type": "video",
                "width": w,
                "height": h,
                "r_frame_rate": f"{fr.numerator}/{fr.denominator}",
                "nb_frames": str(n),
            }
        ],
        "format": {"duration": str(n / fps if fps else 0)},
    }


def count_video_time(path: str) -> float:
    """Video duration in seconds (ref:latentsync/utils/util.py
    count_video_time; used by tools/count_*_time.py)."""
    info = probe(path)
    dur = float(info.get("format", {}).get("duration", 0) or 0)
    if dur:
        return dur
    _, _, fps, nb = video_info(path)
    return nb / fps if fps else 0.0


def gather_video_paths_recursively(input_dir: str, exts=(".mp4", ".avi", ".mov", ".mkv")):
    """Sorted recursive video listing (ref:latentsync/utils/util.py:328-341)."""
    out = []
    for root, _, files in os.walk(input_dir):
        for name in files:
            if os.path.splitext(name)[1].lower() in exts:
                out.append(os.path.join(root, name))
    return sorted(out)


def video_info(path: str) -> Tuple[int, int, float, int]:
    """(width, height, fps, nb_frames-estimate)."""
    info = probe(path)
    vs = next(s for s in info["streams"] if s["codec_type"] == "video")
    num, den = vs["r_frame_rate"].split("/")
    fps = float(num) / float(den)
    nb = int(vs.get("nb_frames", 0) or 0)
    if not nb:
        dur = float(info.get("format", {}).get("duration", 0) or 0)
        nb = int(round(dur * fps))
    return int(vs["width"]), int(vs["height"]), fps, nb


# ---------------------------------------------------------------------------
# video read
# ---------------------------------------------------------------------------


def read_video(path: str, change_fps: bool = True, fps: int = 25) -> np.ndarray:
    """Decode a video to (F, H, W, 3) uint8 RGB, optionally resampled to
    25 fps (ref:util.py:46-63 re-encodes via a temp file; we resample
    inline)."""
    w, h, src_fps, _ = video_info(path)
    resample = change_fps and abs(src_fps - fps) > 1e-3
    if HAVE_FFMPEG:
        cmd = ["ffmpeg", "-nostdin", "-v", "error", "-i", str(path)]
        if resample:
            cmd += ["-vf", f"fps={fps}"]
        cmd += ["-f", "rawvideo", "-pix_fmt", "rgb24", "-"]
        raw = _run(cmd).stdout
        frames = np.frombuffer(raw, np.uint8)
        n = frames.size // (h * w * 3)
        return frames[: n * h * w * 3].reshape(n, h, w, 3)

    import cv2

    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    video = np.stack(frames) if frames else np.zeros((0, h, w, 3), np.uint8)
    if resample and len(video):
        # nearest-frame resample (what ffmpeg's fps filter does for CFR)
        n_out = int(round(len(video) * fps / src_fps))
        idx = np.minimum(
            (np.arange(n_out) * src_fps / fps).astype(np.int64), len(video) - 1
        )
        video = video[idx]
    return video


# ---------------------------------------------------------------------------
# audio read / write
# ---------------------------------------------------------------------------


def _resample(audio: np.ndarray, src: int, dst: int) -> np.ndarray:
    if src == dst:
        return audio
    from scipy.signal import resample_poly

    g = np.gcd(src, dst)
    return resample_poly(audio, dst // g, src // g).astype(np.float32)


def read_audio(path: str, sample_rate: int = 16000) -> np.ndarray:
    """Decode audio to mono float32 in [-1, 1] at `sample_rate`
    (ref:util.py:103-112 / whisper/audio.py:22-49)."""
    if HAVE_FFMPEG:
        raw = _run(
            [
                "ffmpeg", "-nostdin", "-v", "error", "-i", str(path),
                "-f", "s16le", "-acodec", "pcm_s16le", "-ac", "1",
                "-ar", str(sample_rate), "-",
            ]
        ).stdout
        return np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0

    from scipy.io import wavfile

    if not str(path).lower().endswith(".wav"):
        # sidecar convention: write_video muxes audio as <name>.wav next
        # to the container when ffmpeg is absent — read it back the same way
        sidecar = os.path.splitext(str(path))[0] + ".wav"
        if os.path.exists(sidecar):
            path = sidecar
        else:
            raise RuntimeError(
                f"no ffmpeg binary available; cannot decode audio from {path} "
                "(only .wav supported on the cv2/scipy backend)"
            )
    sr, data = wavfile.read(str(path))
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    if audio.ndim == 2:
        audio = audio.mean(axis=1)
    return _resample(audio, sr, sample_rate)


def write_audio(path: str, samples: np.ndarray, sample_rate: int = 16000) -> None:
    if HAVE_FFMPEG and not str(path).lower().endswith(".wav"):
        pcm = np.clip(samples * 32768.0, -32768, 32767).astype("<i2").tobytes()
        _run(
            [
                "ffmpeg", "-y", "-nostdin", "-v", "error",
                "-f", "s16le", "-ar", str(sample_rate), "-ac", "1", "-i", "-",
                str(path),
            ],
            input=pcm,
        )
        return
    from scipy.io import wavfile

    pcm = np.clip(samples * 32768.0, -32768, 32767).astype(np.int16)
    wavfile.write(str(path), sample_rate, pcm)


# ---------------------------------------------------------------------------
# video write / mux
# ---------------------------------------------------------------------------


def write_video(
    path: str,
    frames: np.ndarray,
    fps: int = 25,
    crf: int = 10,
    preset: str = "medium",
    audio_path: Optional[str] = None,
) -> str:
    """Encode (F, H, W, 3) uint8 RGB to H.264 mp4, muxing audio in the
    same pass when given (vs the reference's PNG dump + second mux run,
    ref:util.py:142-208, lipsync_pipeline.py:594-604). `frames` may be a
    list/tuple of (Fi, H, W, 3) chunks encoded back-to-back — the
    pipeline passes [main, wrapped-tail] to avoid materializing one
    concatenated ~0.8 GB array."""
    if not path.lower().endswith(".mp4"):
        path = path.rsplit(".", 1)[0] + ".mp4"
    parts = list(frames) if isinstance(frames, (list, tuple)) else [frames]
    parts = [p for p in parts if len(p)]
    h, w = parts[0].shape[1:3]
    if HAVE_FFMPEG:
        cmd = [
            "ffmpeg", "-y", "-nostdin", "-v", "error",
            "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{w}x{h}",
            "-r", str(fps), "-i", "-",
        ]
        if audio_path is not None:
            cmd += ["-i", str(audio_path), "-c:a", "aac", "-shortest"]
        cmd += [
            "-c:v", "libx264", "-crf", str(crf), "-preset", preset,
            "-pix_fmt", "yuv420p", str(path),
        ]
        _run(cmd, input=b"".join(
            np.ascontiguousarray(p).tobytes() for p in parts))
        return path

    import cv2

    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for part in parts:
        for frame in part:
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()
    if audio_path is not None:
        sidecar = path.rsplit(".", 1)[0] + ".wav"
        if os.path.abspath(str(audio_path)) != os.path.abspath(sidecar):
            shutil.copy(str(audio_path), sidecar)
        warnings.warn(
            f"no ffmpeg binary: wrote audio as sidecar {sidecar} instead of muxing"
        )
    return path


class StreamingVideoWriter:
    """Encode frames on a background thread while the producer keeps
    working — the lipsync pipeline appends each chunk as its restore
    completes, so only the final chunk's encode stays on the critical
    path (the reference encodes strictly after every frame is restored,
    ref:lipsync_pipeline.py:589-604).

    ffmpeg path: frames stream into ffmpeg's stdin with audio muxed in
    the same pass (`audio_path` must exist before the first append).
    cv2 fallback: mp4v writer fed per-frame, audio copied to a sidecar
    wav like `write_video`. Appended chunks must not be mutated
    afterwards (the writer thread reads them without copying).

    `busy_s` accumulates encode-thread busy time so the pipeline's
    stage table stays per-thread-busy (overlap is provable as
    Σ(stages) − wall)."""

    def __init__(
        self,
        path: str,
        fps: int,
        frame_hw: Tuple[int, int],
        crf: int = 10,
        preset: str = "medium",
        audio_path: Optional[str] = None,
    ):
        import queue
        import threading

        if not path.lower().endswith(".mp4"):
            path = path.rsplit(".", 1)[0] + ".mp4"
        self.path = path
        self._audio_path = audio_path
        self.busy_s = 0.0
        self._err: Optional[BaseException] = None
        self._q: "queue.Queue" = queue.Queue(maxsize=4)
        h, w = frame_hw
        self._proc = None
        self._cv2_writer = None
        if HAVE_FFMPEG:
            import subprocess

            cmd = [
                "ffmpeg", "-y", "-nostdin", "-v", "error",
                "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{w}x{h}",
                "-r", str(fps), "-i", "-",
            ]
            if audio_path is not None:
                cmd += ["-i", str(audio_path), "-c:a", "aac", "-shortest"]
            cmd += [
                "-c:v", "libx264", "-crf", str(crf), "-preset", preset,
                "-pix_fmt", "yuv420p", str(path),
            ]
            self._proc = subprocess.Popen(
                cmd, stdin=subprocess.PIPE,
                stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            )
        else:
            import cv2

            self._cv2_writer = cv2.VideoWriter(
                str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
            )
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def _drain(self) -> None:
        import time

        cv2 = None
        if self._cv2_writer is not None:
            import cv2  # noqa: F811
        try:
            while True:
                chunk = self._q.get()
                if chunk is None:
                    return
                t0 = time.time()
                if self._proc is not None:
                    self._proc.stdin.write(
                        np.ascontiguousarray(chunk).tobytes()
                    )
                else:
                    for frame in chunk:
                        self._cv2_writer.write(
                            cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
                        )
                self.busy_s += time.time() - t0
        except BaseException as e:  # noqa: BLE001 — re-raised on close
            self._err = e
            # keep draining (discarding) so a producer blocked in put()
            # unblocks; close()'s None sentinel ends the thread
            while True:
                if self._q.get() is None:
                    return

    def append(self, frames: np.ndarray) -> None:
        """Queue a (Fi, H, W, 3) uint8 RGB chunk for encoding."""
        if self._err is not None:
            raise self._err
        if len(frames):
            self._q.put(frames)

    def close(self) -> str:
        """Flush, finalize the container, and return the output path."""
        self._q.put(None)
        self._thread.join()
        if self._proc is not None:
            self._proc.stdin.close()
            stderr = self._proc.stderr.read()
            if self._proc.wait() != 0:
                raise RuntimeError(
                    f"ffmpeg stream encode failed: {stderr.decode()[:500]}"
                )
        if self._cv2_writer is not None:
            self._cv2_writer.release()
            if self._audio_path is not None:
                sidecar = self.path.rsplit(".", 1)[0] + ".wav"
                if os.path.abspath(str(self._audio_path)) != os.path.abspath(
                    sidecar
                ):
                    shutil.copy(str(self._audio_path), sidecar)
                warnings.warn(
                    "no ffmpeg binary: wrote audio as sidecar "
                    f"{sidecar} instead of muxing"
                )
        if self._err is not None:
            raise self._err
        return self.path


def mux_video_audio(
    video_path: str, audio_path: str, out_path: str, trim_duration: Optional[float] = None
) -> None:
    """Remux video+audio; optionally trim `trim_duration` seconds off the
    end (padding removal, ref:lipsync_pipeline.py:599-604)."""
    if HAVE_FFMPEG:
        cmd = [
            "ffmpeg", "-y", "-nostdin", "-v", "error",
            "-i", str(video_path), "-i", str(audio_path),
            "-c:v", "libx264", "-c:a", "aac",
        ]
        if trim_duration and trim_duration > 0:
            dur = float(probe(video_path)["format"]["duration"]) - trim_duration
            cmd += ["-t", f"{max(dur, 0):.6f}"]
        cmd += [str(out_path)]
        _run(cmd)
        return
    shutil.copy(str(video_path), str(out_path))
    sidecar = str(out_path).rsplit(".", 1)[0] + ".wav"
    shutil.copy(str(audio_path), sidecar)
    warnings.warn(f"no ffmpeg binary: copied video + sidecar audio {sidecar}")
