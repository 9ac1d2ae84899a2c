"""Face-track extraction for SyncNet scoring.

Re-derivation of ref:eval/syncnet_detect.py:25-251: decode frames +
audio, detect faces per frame (S3FD), split shots, build IoU tracks,
smooth boxes, export 224² face-crop clips for the scorer.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..models.face_detection import iou_tracking
from ..preprocess.pipeline import detect_shots
from ..utils.media import read_audio, read_video, write_video


@dataclass
class FaceTrack:
    frames: List[int]
    boxes: np.ndarray  # (n, 4)


class SyncNetDetector:
    """(ref:syncnet_detect.py SyncNetDetector.__call__)."""

    def __init__(self, face_detector=None, min_track: int = 50,
                 crop_scale: float = 0.4, min_face_size: float = 100.0):
        if face_detector is None:
            from ..utils.face import HaarAnchorDetector

            det = HaarAnchorDetector()

            class _BoxAdapter:
                def detect(self, img):
                    x, y, w, h = det._detect_box(img)
                    return np.array([[x, y, x + w, y + h, 1.0]], np.float32)

            face_detector = _BoxAdapter()
        self.detector = face_detector
        self.min_track = min_track
        self.crop_scale = crop_scale
        self.min_face_size = min_face_size

    def extract_tracks(self, frames: np.ndarray) -> List[FaceTrack]:
        """Shot-split + gap-tolerant IoU stitching
        (ref:eval/syncnet_detect.py:76-83, 108-148). Shots shorter than
        min_track are skipped like the reference, except that clips
        shorter than min_track in TOTAL are still tracked (so short demo
        clips remain scoreable)."""
        cuts = [0] + detect_shots(frames) + [len(frames)]
        short_clip = len(frames) <= self.min_track
        tracks: List[FaceTrack] = []
        for s in range(len(cuts) - 1):
            shot = frames[cuts[s]:cuts[s + 1]]
            if len(shot) < self.min_track and not short_clip:
                continue  # ref:81 skips sub-min_track shots
            dets = [self.detector.detect(fr) for fr in shot]
            for tr in iou_tracking(
                dets,
                min_track=min(self.min_track, max(len(shot) - 1, 1)),
                num_failed_det=25,
                min_face_size=0 if short_clip else self.min_face_size,
            ):
                boxes = np.asarray(tr["boxes"], np.float32)
                tracks.append(FaceTrack(
                    frames=[f + cuts[s] for f in tr["frames"]], boxes=boxes))
        return tracks

    def crop_track(self, frames: np.ndarray, track: FaceTrack,
                   size: int = 224) -> np.ndarray:
        """Reference crop geometry (ref:eval/syncnet_detect.py:169-206):
        median-smoothed (k=13) box size/center, constant-110 padding, and
        the asymmetric y-crop [cy−s, cy+s(1+2c)] × x-crop [cx−s(1+c),
        cx+s(1+c)] that includes the chin."""
        import cv2

        from scipy.signal import medfilt

        b = track.boxes
        s_arr = np.maximum(b[:, 3] - b[:, 1], b[:, 2] - b[:, 0]) / 2.0
        x_arr = (b[:, 0] + b[:, 2]) / 2.0
        y_arr = (b[:, 1] + b[:, 3]) / 2.0
        k = min(13, len(b) - (1 - len(b) % 2))
        if k >= 3:
            s_arr = medfilt(s_arr, kernel_size=k)
            x_arr = medfilt(x_arr, kernel_size=k)
            y_arr = medfilt(y_arr, kernel_size=k)
        cs = self.crop_scale
        crops = []
        for i, fi in enumerate(track.frames):
            bs = s_arr[i]
            bsi = int(bs * (1 + 2 * cs))
            padded = np.pad(
                frames[fi], ((bsi, bsi), (bsi, bsi), (0, 0)),
                "constant", constant_values=110,
            )
            my, mx = y_arr[i] + bsi, x_arr[i] + bsi
            face = padded[
                int(my - bs): int(my + bs * (1 + 2 * cs)),
                int(mx - bs * (1 + cs)): int(mx + bs * (1 + cs)),
            ]
            crops.append(cv2.resize(face, (size, size)))
        return np.stack(crops)

    def __call__(self, video_path: str, out_dir: Optional[str] = None):
        """Returns list of (crop_clip, track); optionally writes crop mp4s
        (ref:syncnet_detect.py writes pycrop clips)."""
        frames = read_video(video_path, change_fps=True, fps=25)
        tracks = self.extract_tracks(frames)
        results = []
        for i, track in enumerate(tracks):
            crops = self.crop_track(frames, track)
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
                write_video(os.path.join(out_dir, f"track_{i:04d}.mp4"), crops, fps=25)
            results.append((crops, track))
        return results
