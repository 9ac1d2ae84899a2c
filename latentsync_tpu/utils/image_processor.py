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

# mediapipe canonical face-mesh topology indices (numerical contracts,
# ref:image_processor.py:194-264 & the mediapipe_face_landmark_fullsize
# chart): the 68-point face-alignment subset of the 478 mesh points, and
# the polygon rings around the mouth / lower face used by the mouth/face
# mask modes.
LANDMARK_POINTS_68 = [
    162, 234, 93, 58, 172, 136, 149, 148, 152, 377, 378, 365, 397, 288,
    323, 454, 389, 71, 63, 105, 66, 107, 336, 296, 334, 293, 301, 168,
    197, 5, 4, 75, 97, 2, 326, 305, 33, 160, 158, 133, 153, 144, 362,
    385, 387, 263, 373, 380, 61, 39, 37, 0, 267, 269, 291, 405, 314, 17,
    84, 181, 78, 82, 13, 312, 308, 317, 14, 87,
]

MOUTH_SURROUND_LANDMARKS = [
    164, 165, 167, 92, 186, 57, 43, 106, 182, 83, 18, 313, 406, 335,
    273, 287, 410, 322, 391, 393,
]

FACE_SURROUND_LANDMARKS = [
    152, 377, 400, 378, 379, 365, 397, 288, 435, 433, 411, 425, 423,
    327, 326, 94, 97, 98, 203, 205, 187, 213, 215, 58, 172, 136, 150,
    149, 176, 148,
]

# nose-bridge point whose y-row splits the face for the "eye" mode
# (ref:image_processor.py:104-108)
EYE_SPLIT_LANDMARK = 195

# 68-point (iBUG face-alignment layout) equivalents for the live path
# when only a FAN detector is configured: outer-lip ring, lower-face
# ring (jawline + under-nose closure), and the mid-nose-bridge split row
MOUTH_RING_68 = list(range(48, 60))
FACE_RING_68 = list(range(2, 15)) + [35, 34, 33, 32, 31]
EYE_SPLIT_68 = 28


def landmark_mask_from_68(
    mask_mode: str, lm68: np.ndarray, resolution: int,
    mouth_dilate: float = 1.3,
) -> np.ndarray:
    """KEEP mask for the mouth/face/eye modes from 68-point landmarks.

    Live equivalent of the 478-mesh rings (ref:image_processor.py:83-108)
    for the FAN detector: the mouth ring is the outer-lip polygon dilated
    about its centroid (the mediapipe surround ring sits outside the
    lips), the face ring is the jawline closed under the nose, and the
    eye mode splits at the nose-bridge row."""
    lm68 = np.asarray(lm68, np.float64)
    mask = np.ones((resolution, resolution), np.float32)
    if mask_mode == "mouth":
        pts = lm68[MOUTH_RING_68, :2]
        c = pts.mean(0)
        pts = c + (pts - c) * mouth_dilate
        hull = cv2.convexHull(pts.astype(np.int32))
        cv2.fillConvexPoly(mask, hull, 0.0)
    elif mask_mode == "face":
        pts = lm68[FACE_RING_68, :2].astype(np.int32)
        hull = cv2.convexHull(pts)
        cv2.fillConvexPoly(mask, hull, 0.0)
    elif mask_mode == "eye":
        y = int(lm68[EYE_SPLIT_68][1])
        mask[max(y, 0):, :] = 0.0
    else:
        raise ValueError(f"unknown mask mode {mask_mode!r}")
    return mask


def mediapipe_lm478_to_lm68(lm478: np.ndarray) -> np.ndarray:
    """(478, 2+) mediapipe mesh → (68, 2) face-alignment landmarks
    (ref:image_processor.py:180-191). Accepts pixel coordinates."""
    lm478 = np.asarray(lm478)
    return lm478[LANDMARK_POINTS_68, :2].astype(np.float64)


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


_warned_fallback = False
_detector_cache = {}


def default_landmark_detector():
    """Model-based landmark detection as the default quality path
    (ref:image_processor.py:61-63 binds 2D-FAN): a FAN detector (plus
    optional S3FD face-box stage) when converted weights are present at
    $LATENTSYNC_FAN_CKPT / $LATENTSYNC_S3FD_CKPT (.npz pytrees from
    scripts/convert or .pth via convert_fan), with the Haar-box heuristic
    demoted to an explicit, warned fallback."""
    # memoized per env configuration: a model detector holds a jitted
    # forward whose compile cache lives on the FUNCTION OBJECT — building
    # a fresh detector per ImageProcessor (one per pipeline call) forced a
    # full remote recompile of the FAN buckets on EVERY clip through the
    # tunneled backend (measured: the bench e2e faces stage blew up from
    # ~2 s to 40-90 s/run). The detectors are stateless across clips.
    cache_key = tuple(os.environ.get(k, "") for k in (
        "LATENTSYNC_FAN_CKPT", "LATENTSYNC_S3FD_CKPT",
        "LATENTSYNC_NO_FALLBACK_FAN"))
    if cache_key not in _detector_cache:
        _detector_cache[cache_key] = _build_default_landmark_detector()
    return _detector_cache[cache_key]


def _build_default_landmark_detector():
    global _warned_fallback
    fan_path = os.environ.get("LATENTSYNC_FAN_CKPT", "checkpoints/2dfan4.npz")
    if os.path.isfile(fan_path):
        from ..models.face_detection import FANLandmarkDetector, S3FD, S3FDDetector
        from .checkpoint import load_pytree
        from .convert import load_torch_state_dict

        if fan_path.endswith((".pth", ".pt")):
            from .convert_eval import convert_fan

            fan_params = convert_fan(load_torch_state_dict(fan_path)[0])
        else:
            fan_params = load_pytree(fan_path)
        face_det = None
        s3fd_path = os.environ.get("LATENTSYNC_S3FD_CKPT", "checkpoints/s3fd.npz")
        if os.path.isfile(s3fd_path):
            face_det = S3FDDetector(load_pytree(s3fd_path))
        return FANLandmarkDetector(fan_params, face_detector=face_det)
    # packaged fallback: a small FAN trained on procedural faces
    # (scripts/train_landmark_fallback.py) — the zero-checkpoint quality
    # path, mirroring the reference's always-available mediapipe mesh
    # (ref:image_processor.py:181-264) without redistributing weights
    fallback_path = os.path.join(
        os.path.dirname(__file__), "assets", "landmark_fallback.npz"
    )
    if os.path.isfile(fallback_path) and not os.environ.get(
        "LATENTSYNC_NO_FALLBACK_FAN"
    ):
        from ..models.face_detection import FANLandmarkDetector, HaarBoxDetector
        from .checkpoint import load_pytree

        return FANLandmarkDetector(
            load_pytree(fallback_path), face_detector=HaarBoxDetector()
        )
    if not _warned_fallback:
        _warned_fallback = True
        import warnings

        warnings.warn(
            "no FAN landmark checkpoint found (set LATENTSYNC_FAN_CKPT); "
            "falling back to the Haar-box anchor heuristic — alignment "
            "quality will be box-level only",
            stacklevel=2,
        )
    return HaarAnchorDetector()


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
        face_mesh=None,
    ):
        """`face_mesh`: callable image → (478, 2) mesh landmarks in pixel
        coords, required by the mouth/face/eye modes (the reference binds
        mediapipe FaceMesh here, ref:image_processor.py:48-49; any
        478-point source works — e.g. precomputed arrays)."""
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
        self.face_mesh = face_mesh

    # -- geometry -----------------------------------------------------------

    def detect_anchor3(self, image_rgb: np.ndarray) -> np.ndarray:
        if self.landmark_detector is None:
            self.landmark_detector = default_landmark_detector()
        res = self.landmark_detector(image_rgb)
        res = np.asarray(res)
        if res.shape[0] == 478:  # mediapipe-style mesh (ref:image_processor.py:124-126)
            res = mediapipe_lm478_to_lm68(res)
        if res.shape[0] == 68:
            res = landmarks68_to_anchor3(self.smoother(res))
        return res

    def affine_transform(self, image_rgb: np.ndarray):
        """Frame → (face_crop_resolution², box, 2×3 matrix)
        (ref:image_processor.py:118-143)."""
        anchor3 = self.detect_anchor3(image_rgb)
        return self._warp_from_anchor3(image_rgb, anchor3)

    def _warp_from_anchor3(self, image_rgb: np.ndarray, anchor3: np.ndarray):
        face, matrix = self.restorer.align_warp_face(image_rgb, anchor3)
        box = [0, 0, face.shape[1], face.shape[0]]
        face = cv2.resize(
            face, (self.resolution, self.resolution), interpolation=cv2.INTER_LANCZOS4
        )
        return face, box, matrix

    def affine_transform_batch(self, frames):
        """Whole-clip affine pass → (faces (N, r, r, 3), boxes, matrices).

        When the landmark source exposes `detect_batch` (the FAN
        detectors), the model forward for ALL frames runs as one
        bucketed device call instead of a per-frame dispatch — on the
        tunneled TPU transport that turns N round-trips into one.
        Smoothing and warps stay per-frame in order, so results match
        the sequential path exactly."""
        det = self.landmark_detector
        if det is None:
            det = self.landmark_detector = default_landmark_detector()
        faces, boxes, matrices = [], [], []
        if hasattr(det, "detect_batch"):
            lms = det.detect_batch(frames)
            for frame, lm in zip(frames, lms):
                lm = np.asarray(lm)
                if lm.shape[0] == 478:
                    lm = mediapipe_lm478_to_lm68(lm)
                anchor3 = (landmarks68_to_anchor3(self.smoother(lm))
                           if lm.shape[0] == 68 else lm)
                face, box, matrix = self._warp_from_anchor3(frame, anchor3)
                faces.append(face)
                boxes.append(box)
                matrices.append(matrix)
        else:
            for frame in frames:
                face, box, matrix = self.affine_transform(frame)
                faces.append(face)
                boxes.append(box)
                matrices.append(matrix)
        return np.stack(faces), boxes, matrices

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

    def _landmark_mask(self, face: np.ndarray, lm: Optional[np.ndarray]) -> np.ndarray:
        """Per-frame KEEP mask for the landmark-driven modes
        (ref:image_processor.py:83-108): mouth/face fill the surround
        polygon with 0; eye zeroes everything below the nose-bridge row.

        Landmark sources, in order: explicit `lm` ((478, 2) mesh or
        (68, 2) face-alignment points), the bound `face_mesh` callable,
        or a LIVE run of the 68-point landmark detector on the crop —
        so the modes work with only the FAN checkpoint configured."""
        if lm is None:
            if self.face_mesh is not None:
                lm = np.asarray(self.face_mesh(face))
            else:
                if self.landmark_detector is None:
                    self.landmark_detector = default_landmark_detector()
                lm = np.asarray(self.landmark_detector(face))
                if lm.shape[0] < 68:
                    raise ValueError(
                        f"mask mode {self.mask!r} needs dense landmarks; the "
                        "configured detector returned only box anchors — set "
                        "LATENTSYNC_FAN_CKPT or pass landmarks478/face_mesh"
                    )
        lm = np.asarray(lm)
        if lm.shape[0] == 68:
            return landmark_mask_from_68(self.mask, lm, self.resolution)
        mask = np.ones((self.resolution, self.resolution), np.float32)
        if self.mask in ("mouth", "face"):
            ring = (MOUTH_SURROUND_LANDMARKS if self.mask == "mouth"
                    else FACE_SURROUND_LANDMARKS)
            points = lm[ring, :2].astype(np.int32)
            cv2.fillPoly(mask, pts=[points], color=0.0)
        elif self.mask == "eye":
            y = int(lm[EYE_SPLIT_LANDMARK][1])
            mask[max(y, 0):, :] = 0.0
        else:
            raise ValueError(f"unknown mask mode {self.mask!r}")
        return mask

    def keep_mask(
        self, faces: np.ndarray, landmarks478: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Compact KEEP mask (1 = keep original, 0 = regenerate):
        (1, H, W, 3) for the per-clip fix_mask/half modes, (F, H, W, 1)
        for the per-frame landmark modes. The compact form lets the
        pipeline upload ONE mask instead of F broadcast copies."""
        if self.mask == "fix_mask":
            return self.mask_image[None]
        if self.mask == "half":
            keep = np.ones((1, self.resolution, self.resolution, 3), np.float32)
            keep[:, self.resolution // 2:, :, :] = 0
            return keep
        faces = self.resize_batch(faces)
        return np.stack([
            self._landmark_mask(
                faces[i], None if landmarks478 is None else landmarks478[i]
            )
            for i in range(len(faces))
        ])[..., None]  # (F, H, W, 1)

    def prepare_masks_and_masked_images(
        self, faces: np.ndarray, landmarks478: Optional[np.ndarray] = None
    ):
        """(F, H, W, 3) uint8 → (pixel_values, masked_pixel_values, masks)
        float32. Masks use KEEP polarity (1 = keep original, 0 = mouth
        region to regenerate), exactly the mask.png convention:
        masked = pixel · mask (ref:image_processor.py:145-152), the UNet's
        mask channel receives this same map (ref:lipsync_pipeline.py:517),
        and paste-back composites decoded·(1-mask) + original·mask
        (ref:lipsync_pipeline.py:572-574 passes `1 - masks`).

        landmarks478: optional (F, 478, 2) pixel-coord mesh landmarks for
        the mouth/face/eye modes (mediapipe-compatible; any 478-point
        source)."""
        faces = self.resize_batch(faces)
        pixel_values = self.normalize(faces)
        keep = self.keep_mask(faces, landmarks478)
        masked = pixel_values * keep
        masks = keep[..., :1]
        masks = np.broadcast_to(masks, pixel_values.shape[:3] + (1,))
        return pixel_values, masked, np.ascontiguousarray(masks)

    def denormalize(self, images: np.ndarray) -> np.ndarray:
        """float [-1, 1] → uint8."""
        out = np.clip((images + 1.0) * 127.5, 0, 255)
        return out.astype(np.uint8)
