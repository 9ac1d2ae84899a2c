"""Serving artifacts: precomputed affine bundles + avatar resolution.

The reference persists `{faces, boxes, affine_matrices}` per avatar as a
.pth (ref:latentsync/pipelines/affine_transform_video.py:23-35, consumed
at ref:lipsync_pipeline.py:400-405, resolved with `_rotated`/`_darken`
variants at ref:scripts/api.py:108-125). Here the bundle is an .npz and a
first-class cached artifact.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


def generate_affine_bundle(
    processor, video_path: str, bundle_path: str, fps: int = 25
) -> str:
    """Per-frame face align over a whole video → .npz bundle
    (ref:affine_transform_video.py:8-35)."""
    from ..utils.media import read_video

    frames = read_video(video_path, change_fps=True, fps=fps)
    # batched: a model landmark source runs one bucketed device call for
    # the whole clip instead of a per-frame dispatch (image_processor.
    # affine_transform_batch); results match the sequential path exactly
    faces, boxes, matrices = processor.affine_transform_batch(frames)
    os.makedirs(os.path.dirname(bundle_path) or ".", exist_ok=True)
    np.savez_compressed(
        bundle_path,
        faces=np.asarray(faces),
        boxes=np.asarray(boxes),
        affine_matrices=np.stack(matrices),
    )
    return bundle_path


def load_affine_bundle(bundle_path: str):
    data = np.load(bundle_path, allow_pickle=True)
    return data["faces"], list(data["boxes"]), list(data["affine_matrices"])


@dataclass
class Avatar:
    video_path: str
    bundle_path: Optional[str]


class AvatarStore:
    """Avatar id → (video, precomputed bundle), with the reference's
    `_rotated`/`_darken` variant naming (ref:scripts/api.py:108-125)."""

    def __init__(self, root: str):
        self.root = root

    def resolve(self, avatar_id: str, rotated: bool = False, darken: bool = False) -> Avatar:
        suffix = ""
        if rotated:
            suffix += "_rotated"
        if darken:
            suffix += "_darken"
        base = os.path.join(self.root, avatar_id + suffix)
        video = base + ".mp4"
        if not os.path.isfile(video):
            raise FileNotFoundError(f"avatar video not found: {video}")
        bundle = base + ".npz"
        return Avatar(video_path=video, bundle_path=bundle if os.path.isfile(bundle) else None)
