"""Data-processing pipeline (ref:preprocess/data_processing_pipeline.py:28-65).

Stage chain, each stage writing a fresh sibling directory and skipping
already-produced outputs so reruns resume (SURVEY §5.3):

1. remove_broken   — decodability probe (ref:remove_broken_videos.py)
2. resample        — 25 fps / 16 kHz (ref:resample_fps_hz.py)
3. detect_shot     — adaptive content-change shot splitting
                     (ref:detect_shot.py:35, pyscenedetect-equivalent
                     HSV-delta detector implemented in-repo)
4. segment         — 5–10 s segments (ref:segment_videos.py)
5. affine_transform— face-align all frames to 256² crops
                     (ref:preprocess/affine_transform.py)
6. remove_incorrect— sanity filter on crop geometry
                     (ref:remove_incorrect_affined.py)
7. sync_av         — SyncNet conf ≥ 3 & |offset| ≤ 6 filter + resync
                     (ref:sync_av.py:40-63, thresholds README.md:148)
8. filter_quality  — HyperIQA ≥ 40 on 3 sampled frames
                     (ref:filter_visual_quality.py:57)

Host parallelism is a worker pool over files; model stages batch on the
TPU instead of sharding across GPUs (SURVEY §2.6).
"""

from __future__ import annotations

import math
import os
import shutil
import subprocess
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np

from ..utils.media import HAVE_FFMPEG, read_audio, read_video, video_info, write_video


def _gather(input_dir: str, exts=(".mp4", ".avi", ".mov")) -> List[str]:
    out = []
    for root, _, files in os.walk(input_dir):
        for f in sorted(files):
            if f.lower().endswith(exts):
                out.append(os.path.join(root, f))
    return out


def _out_path(path: str, input_dir: str, output_dir: str, suffix: str = "") -> str:
    rel = os.path.relpath(path, input_dir)
    base, ext = os.path.splitext(rel)
    dst = os.path.join(output_dir, base + suffix + ext)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    return dst


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------



def _sidecar(path: str) -> str:
    return os.path.splitext(path)[0] + ".wav"


def _copy_sidecar(src_video: str, dst_video: str) -> None:
    """Propagate the no-ffmpeg sidecar .wav through a stage (the cv2
    backend can't mux audio into containers; media.read_audio reads the
    sidecar back)."""
    s = _sidecar(src_video)
    if os.path.exists(s) and not os.path.exists(_sidecar(dst_video)):
        shutil.copy(s, _sidecar(dst_video))


def _slice_sidecar(src_video: str, dst_video: str, start_frame: int,
                   n_frames: int, fps: int) -> None:
    s = _sidecar(src_video)
    if not os.path.exists(s) or os.path.exists(_sidecar(dst_video)):
        return
    from scipy.io import wavfile

    rate, data = wavfile.read(s)
    a = int(start_frame / fps * rate)
    b = int((start_frame + n_frames) / fps * rate)
    wavfile.write(_sidecar(dst_video), rate, data[a:b])


def remove_broken_videos(input_dir: str, output_dir: str) -> List[str]:
    kept = []
    for path in _gather(input_dir):
        dst = _out_path(path, input_dir, output_dir)
        if os.path.exists(dst):
            kept.append(dst)
            continue
        try:
            w, h, fps, n = video_info(path)
            if n <= 0 or w <= 0:
                continue
            shutil.copy(path, dst)
            _copy_sidecar(path, dst)
            kept.append(dst)
        except Exception:
            continue
    return kept


def resample_fps_hz(input_dir: str, output_dir: str, fps: int = 25,
                    sample_rate: int = 16000) -> List[str]:
    out = []
    for path in _gather(input_dir):
        dst = _out_path(path, input_dir, output_dir)
        if os.path.exists(dst):
            out.append(dst)
            continue
        if HAVE_FFMPEG:
            subprocess.run(
                ["ffmpeg", "-y", "-nostdin", "-v", "error", "-i", path,
                 "-r", str(fps), "-ar", str(sample_rate), dst],
                check=True, capture_output=True,
            )
        else:
            frames = read_video(path, change_fps=True, fps=fps)
            write_video(dst, frames, fps=fps)
            _copy_sidecar(path, dst)
        out.append(dst)
    return out


def content_scores(frames: np.ndarray) -> np.ndarray:
    """Per-frame content score: the mean absolute per-channel HSV delta
    between consecutive frames, channels averaged — pyscenedetect
    ContentDetector's frame score with default component weights
    (hue/sat/lum 1.0 each, edges 0). scores[0] = 0.

    Frames are subsampled to ~256 px wide first, exactly like
    pyscenedetect's default auto-downscale (factor = width // 256,
    plain stride slicing) — the reference detector scores downscaled
    frames, and full-res HSV over 1080p would be ~25× the pixel work
    for no extra fidelity."""
    import cv2

    factor = max(1, frames.shape[2] // 256) if frames.ndim == 4 else 1
    scores = np.zeros(len(frames), np.float64)
    prev = None
    for i, frame in enumerate(frames):
        if factor > 1:
            frame = frame[::factor, ::factor]
        hsv = cv2.cvtColor(frame, cv2.COLOR_RGB2HSV).astype(np.int16)
        if prev is not None:
            scores[i] = np.abs(hsv - prev).mean(axis=(0, 1)).mean()
        prev = hsv
    return scores


def detect_shots(frames: np.ndarray, adaptive_threshold: float = 2.0,
                 min_content_val: float = 15.0, window_width: int = 2,
                 min_scene_len: int = 15) -> List[int]:
    """Shot-boundary detection with pyscenedetect AdaptiveDetector
    semantics — the reference preprocess runs `scenedetect
    detect-adaptive --threshold 2` (ref:preprocess/detect_shot.py:38).

    A frame i is a cut when:
    - its adaptive ratio score[i] / mean(score over the ±window_width
      surrounding frames, i excluded) ≥ adaptive_threshold,
    - its raw content score ≥ min_content_val (rejects cuts in near-
      static footage where tiny ratios explode), and
    - at least min_scene_len frames passed since the last cut.
    Frames whose surrounding window is incomplete are never cuts
    (AdaptiveDetector delays by window_width). Gradual fades produce
    flat score plateaus with ratio ≈ 1 and are NOT cut — the behavior
    the plain-threshold heuristic this replaces got wrong."""
    n = len(frames)
    scores = content_scores(frames)
    cuts: List[int] = []
    last_cut = 0
    for i in range(1, n):
        lo, hi = i - window_width, i + window_width
        if lo < 1 or hi >= n:
            continue  # incomplete surrounding window
        surround = np.concatenate([scores[lo:i], scores[i + 1:hi + 1]])
        denom = surround.mean()
        ratio = scores[i] / denom if denom > 1e-5 else (
            255.0 if scores[i] >= min_content_val else 0.0)
        if (ratio >= adaptive_threshold and scores[i] >= min_content_val
                and i - last_cut >= min_scene_len):
            cuts.append(i)
            last_cut = i
    return cuts


def split_shots(input_dir: str, output_dir: str, fps: int = 25) -> List[str]:
    out = []
    for path in _gather(input_dir):
        base_dst = _out_path(path, input_dir, output_dir, "_shot0")
        if os.path.exists(base_dst):
            out.extend(
                p for p in _gather(os.path.dirname(base_dst))
                if os.path.basename(p).startswith(
                    os.path.basename(path).rsplit(".", 1)[0] + "_shot")
            )
            continue
        frames = read_video(path, change_fps=False)
        cuts = [0] + detect_shots(frames) + [len(frames)]
        for i in range(len(cuts) - 1):
            seg = frames[cuts[i]:cuts[i + 1]]
            if len(seg) < 15:
                continue
            dst = _out_path(path, input_dir, output_dir, f"_shot{i}")
            write_video(dst, seg, fps=fps)
            _slice_sidecar(path, dst, cuts[i], len(seg), fps)
            out.append(dst)
    return out


def segment_videos(input_dir: str, output_dir: str, min_sec: float = 5.0,
                   max_sec: float = 10.0, fps: int = 25) -> List[str]:
    out = []
    for path in _gather(input_dir):
        frames = read_video(path, change_fps=False)
        n = len(frames)
        seg_len = int(max_sec * fps)
        min_len = int(min_sec * fps)
        idx = 0
        for start in range(0, n, seg_len):
            seg = frames[start:start + seg_len]
            if len(seg) < min_len:
                break
            dst = _out_path(path, input_dir, output_dir, f"_seg{idx}")
            if not os.path.exists(dst):
                write_video(dst, seg, fps=fps)
                _slice_sidecar(path, dst, start, len(seg), fps)
            out.append(dst)
            idx += 1
    return out


def affine_transform_stage(input_dir: str, output_dir: str,
                           resolution: int = 256, fps: int = 25,
                           processor=None) -> List[str]:
    from ..utils.image_processor import ImageProcessor

    processor = processor or ImageProcessor(resolution)
    out = []
    for path in _gather(input_dir):
        dst = _out_path(path, input_dir, output_dir)
        if os.path.exists(dst):
            out.append(dst)
            continue
        try:
            frames = read_video(path, change_fps=False)
            faces = []
            for frame in frames:
                face, _, _ = processor.affine_transform(frame)
                faces.append(face)
            write_video(dst, np.stack(faces), fps=fps)
            _copy_sidecar(path, dst)
            out.append(dst)
        except Exception as e:  # noqa: BLE001 — per-file isolation
            print(f"affine failed {path}: {e}")
    return out


def remove_incorrect_affined(input_dir: str, output_dir: str,
                             resolution: int = 256) -> List[str]:
    out = []
    for path in _gather(input_dir):
        dst = _out_path(path, input_dir, output_dir)
        if os.path.exists(dst):
            out.append(dst)
            continue
        try:
            w, h, _, n = video_info(path)
            if w != resolution or h != resolution or n < 25:
                continue
            shutil.copy(path, dst)
            _copy_sidecar(path, dst)
            out.append(dst)
        except Exception:
            continue
    return out


def sync_av_stage(input_dir: str, output_dir: str, evaluator=None,
                  min_conf: float = 3.0, max_offset: int = 6) -> List[str]:
    """SyncNet confidence filter + itsoffset resync (ref:sync_av.py:40-63)."""
    if evaluator is None:
        from ..eval.sync_eval import SyncNetEvaluator

        evaluator = SyncNetEvaluator()
    out = []
    for path in _gather(input_dir):
        dst = _out_path(path, input_dir, output_dir)
        if os.path.exists(dst):
            out.append(dst)
            continue
        try:
            offset, _, conf = evaluator.evaluate(path)
            if conf < min_conf or abs(offset) > max_offset:
                continue
            if offset != 0 and HAVE_FFMPEG:
                shift = offset / 25.0
                subprocess.run(
                    ["ffmpeg", "-y", "-nostdin", "-v", "error",
                     "-itsoffset", f"{shift:.4f}", "-i", path, "-i", path,
                     "-map", "0:v", "-map", "1:a", "-c:v", "copy", dst],
                    check=True, capture_output=True,
                )
            else:
                shutil.copy(path, dst)
                _copy_sidecar(path, dst)
            out.append(dst)
        except Exception as e:  # noqa: BLE001
            print(f"sync_av failed {path}: {e}")
    return out


def filter_visual_quality(input_dir: str, output_dir: str, scorer=None,
                          min_score: float = 40.0, samples: int = 3) -> List[str]:
    """HyperIQA threshold on sampled frames (ref:filter_visual_quality.py:57)."""
    out = []
    for path in _gather(input_dir):
        dst = _out_path(path, input_dir, output_dir)
        if os.path.exists(dst):
            out.append(dst)
            continue
        try:
            if scorer is not None:
                frames = read_video(path, change_fps=False)
                idx = np.linspace(0, len(frames) - 1, samples).astype(int)
                scores = [scorer(frames[i]) for i in idx]
                if float(np.mean(scores)) < min_score:
                    continue
            shutil.copy(path, dst)
            _copy_sidecar(path, dst)
            out.append(dst)
        except Exception as e:  # noqa: BLE001
            print(f"quality filter failed {path}: {e}")
    return out


@dataclass
class DataProcessingPipeline:
    """Chained resumable stages (ref:data_processing_pipeline.py:28-65)."""

    output_root: str
    resolution: int = 256
    evaluator: object = None
    quality_scorer: Optional[Callable] = None
    # reference thresholds (README.md:148-149); tunable for reduced runs
    min_sync_conf: float = 3.0
    max_av_offset: int = 6
    min_iqa: float = 40.0

    def run(self, input_dir: str) -> List[str]:
        r = self.output_root
        stages = [
            ("decodable", lambda i, o: remove_broken_videos(i, o)),
            ("resampled", lambda i, o: resample_fps_hz(i, o)),
            ("shot", lambda i, o: split_shots(i, o)),
            ("segmented", lambda i, o: segment_videos(i, o)),
            ("affine_transformed", lambda i, o: affine_transform_stage(i, o, self.resolution)),
            ("filtered_affined", lambda i, o: remove_incorrect_affined(i, o, self.resolution)),
            ("av_synced", lambda i, o: sync_av_stage(
                i, o, self.evaluator, self.min_sync_conf, self.max_av_offset)),
            ("high_visual_quality", lambda i, o: filter_visual_quality(
                i, o, self.quality_scorer, self.min_iqa)),
        ]
        cur = input_dir
        files: List[str] = []
        for name, fn in stages:
            out_dir = os.path.join(r, name)
            os.makedirs(out_dir, exist_ok=True)
            files = fn(cur, out_dir)
            print(f"stage {name}: {len(files)} files")
            cur = out_dir
        return files


def write_fileslist(files: List[str], path: str) -> None:
    """(ref:tools/write_fileslist.py)."""
    with open(path, "w") as f:
        for p in files:
            f.write(p + "\n")
