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
                 crop_scale: float = 0.4):
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

    def extract_tracks(self, frames: np.ndarray) -> List[FaceTrack]:
        cuts = [0] + detect_shots(frames) + [len(frames)]
        tracks: List[FaceTrack] = []
        for s in range(len(cuts) - 1):
            shot = frames[cuts[s]:cuts[s + 1]]
            dets = [self.detector.detect(fr) for fr in shot]
            for tr in iou_tracking(dets, min_track=min(self.min_track, len(shot))):
                boxes = np.asarray(tr["boxes"], np.float32)
                # temporal median smoothing of box size/center
                if len(boxes) >= 5:
                    from scipy.signal import medfilt

                    for c in range(4):
                        boxes[:, c] = medfilt(boxes[:, c], kernel_size=5)
                tracks.append(FaceTrack(
                    frames=[f + cuts[s] for f in tr["frames"]], boxes=boxes))
        return tracks

    def crop_track(self, frames: np.ndarray, track: FaceTrack,
                   size: int = 224) -> np.ndarray:
        import cv2

        crops = []
        for fi, box in zip(track.frames, track.boxes):
            x1, y1, x2, y2 = box
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            half = max(x2 - x1, y2 - y1) / 2 * (1 + self.crop_scale)
            h, w = frames[fi].shape[:2]
            xa, xb = int(max(cx - half, 0)), int(min(cx + half, w))
            ya, yb = int(max(cy - half, 0)), int(min(cy + half, h))
            crop = frames[fi][ya:yb, xa:xb]
            crops.append(cv2.resize(crop, (size, size)))
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
