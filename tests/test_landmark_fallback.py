"""The packaged no-checkpoint landmark fallback: synthetic-face data
source, small-FAN architecture inference from checkpoint shape, Haar box
stage adapter, and the default-detector wiring.

Mirrors the reference's always-available landmark tier (mediapipe mesh,
ref:latentsync/utils/image_processor.py:181-264): here a small FAN
trained on procedural faces (scripts/train_landmark_fallback.py) whose
weights ship inside the package.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentsync_tpu.training.synthetic_faces import (
    canonical_68,
    landmark_heatmaps,
    make_batch,
    render_face,
)

ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "latentsync_tpu", "utils", "assets", "landmark_fallback.npz")


# ---------------------------------------------------------------------------
# synthetic face generator
# ---------------------------------------------------------------------------


def test_canonical_layout_is_ibug68():
    pts = canonical_68()
    assert pts.shape == (68, 2)
    # jaw runs left ear → chin → right ear, x monotone
    assert np.all(np.diff(pts[0:17, 0]) > 0)
    # chin (jaw midpoint) is the lowest jaw point
    assert pts[8, 1] == pts[0:17, 1].max()
    # eyes sit above the nose tip, which sits above the mouth
    assert pts[36:48, 1].max() < pts[33, 1] < pts[48:68, 1].min()
    # approximate left/right symmetry of the canonical face (the eye
    # arc angles are not an exact mirror pair; ~1e-3 asymmetry)
    assert np.allclose(pts[36:42, 0], -pts[[45, 44, 43, 42, 47, 46], 0],
                       atol=5e-3)


def test_render_face_shapes_and_bounds():
    rng = np.random.default_rng(0)
    img, pts = render_face(rng, 256)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    assert pts.shape == (68, 2)
    # pose sampling keeps the face inside the crop with margin
    assert pts.min() > -40 and pts.max() < 296


def test_rendered_face_is_anchored_to_landmarks():
    """The renderer draws FROM the landmarks: the open-mouth inner
    region must be dark at the inner-lip centroid, and eye sclera
    bright at the eye centroid."""
    rng = np.random.default_rng(3)
    found_open = False
    for _ in range(20):
        img, pts = render_face(rng, 256)
        eye_c = pts[36:42].mean(0).astype(int)
        inner_c = pts[60:68].mean(0).astype(int)
        mouth_h = pts[66, 1] - pts[62, 1]  # inner-lip vertical gap
        if mouth_h > 10 and 0 <= inner_c[0] < 256 and 0 <= inner_c[1] < 256:
            found_open = True
            # dark mouth interior (occluders may rarely cover it)
            if img[inner_c[1], inner_c[0]].mean() < 80:
                break
    assert found_open


def test_heatmaps_peak_at_landmarks():
    pts = np.array([[128.0, 64.0], [32.0, 200.0]] * 34, np.float32)
    heat = landmark_heatmaps(pts, size=64, stride=4.0)
    assert heat.shape == (64, 64, 68)
    iy, ix = np.unravel_index(heat[:, :, 0].argmax(), (64, 64))
    # pixel 128 → grid 128/4 - 0.5 = 31.5 → argmax at 31 or 32
    assert abs(ix - 31.5) <= 0.5 and abs(iy - 15.5) <= 0.5
    assert heat.max() <= 1.0 and heat.min() >= 0.0


def test_make_batch():
    imgs, heats, lms = make_batch(np.random.default_rng(0), 2, 128)
    assert imgs.shape == (2, 128, 128, 3) and imgs.max() <= 1.0
    assert heats.shape == (2, 32, 32, 68)
    assert lms.shape == (2, 68, 2)


# ---------------------------------------------------------------------------
# FAN architecture inference from checkpoint shape
# ---------------------------------------------------------------------------


def test_fan_detector_infers_arch_from_params(tmp_path):
    from latentsync_tpu.models.face_detection import FAN2D, FANLandmarkDetector
    from latentsync_tpu.utils.checkpoint import load_pytree, save_pytree

    model = FAN2D(num_modules=1, features=32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    path = str(tmp_path / "tiny_fan.npz")
    save_pytree(path, jax.tree.map(np.asarray, variables))

    det = FANLandmarkDetector(load_pytree(path))
    assert det.model.num_modules == 1
    assert det.model.features == 32

    img = (np.random.default_rng(0).uniform(0, 255, (200, 180, 3))
           ).astype(np.uint8)
    lm = det(img)
    assert lm.shape == (68, 2)
    assert np.isfinite(lm).all()
    # landmarks land inside the (whole-frame) crop
    assert lm[:, 0].min() >= 0 and lm[:, 0].max() <= 180
    assert lm[:, 1].min() >= 0 and lm[:, 1].max() <= 200


def test_fan_train_mode_updates_batch_stats():
    from latentsync_tpu.models.face_detection import FAN2D

    model = FAN2D(num_modules=1, features=32, train=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 3 + 1
    outs, mut = model.apply(variables, x, mutable=["batch_stats"])
    assert len(outs) == 1 and outs[0].shape == (2, 16, 16, 68)
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mut["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_haar_box_detector_protocol():
    from latentsync_tpu.models.face_detection import HaarBoxDetector

    det = HaarBoxDetector()
    img = np.zeros((240, 320, 3), np.uint8)
    rows = det.detect(img)
    assert rows.shape[0] == 1 and rows.shape[1] >= 4
    x1, y1, x2, y2 = rows[0][:4]
    assert x2 > x1 and y2 > y1


def test_device_decode_matches_numpy_decode():
    from latentsync_tpu.models.face_detection import (
        decode_heatmaps_device,
        heatmaps_to_landmarks,
    )

    heat = np.random.default_rng(0).standard_normal((3, 64, 64, 68)).astype(
        np.float32)
    dev = np.asarray(decode_heatmaps_device(jnp.asarray(heat)))
    ref = heatmaps_to_landmarks(heat)
    assert np.allclose(dev, ref, atol=1e-5), np.abs(dev - ref).max()


def _tiny_detector():
    from latentsync_tpu.models.face_detection import FAN2D, FANLandmarkDetector

    variables = FAN2D(num_modules=1, features=32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    return FANLandmarkDetector(jax.tree.map(np.asarray, variables))


def test_detect_batch_matches_per_frame_calls():
    det = _tiny_detector()  # random init, whole-frame crop
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
              for _ in range(3)]
    batched = det.detect_batch(frames)
    single = np.stack([det(f) for f in frames])
    assert batched.shape == (3, 68, 2)
    assert np.allclose(batched, single, atol=1e-4)


def test_bucketed_padding_does_not_leak():
    """Padded (zero) rows in a bucket must not change real rows: run
    the same crop as bucket-of-1 and inside a padded bucket-of-16."""
    det = _tiny_detector()
    crop = np.random.default_rng(2).integers(
        0, 255, (256, 256, 3)).astype(np.uint8)
    one = det._run_bucketed(crop[None])
    many = det._run_bucketed(np.stack([crop] * 3))
    assert np.allclose(one[0], many[0], atol=1e-4)
    assert np.allclose(many[0], many[2], atol=1e-4)


# ---------------------------------------------------------------------------
# packaged asset wiring + accuracy (skipped until the asset is trained)
# ---------------------------------------------------------------------------


needs_asset = pytest.mark.skipif(
    not os.path.isfile(ASSET), reason="packaged fallback not trained yet")


@needs_asset
def test_default_detector_is_memoized(monkeypatch):
    """One detector per env config: a fresh detector per ImageProcessor
    re-jits the FAN and forces a remote recompile per clip on the
    tunneled backend (measured 40-90 s/run in the r5 bench)."""
    import latentsync_tpu.utils.image_processor as ip

    monkeypatch.setenv("LATENTSYNC_FAN_CKPT", "/nonexistent.npz")
    monkeypatch.delenv("LATENTSYNC_NO_FALLBACK_FAN", raising=False)
    a = ip.default_landmark_detector()
    b = ip.default_landmark_detector()
    assert a is b
    monkeypatch.setenv("LATENTSYNC_NO_FALLBACK_FAN", "1")
    c = ip.default_landmark_detector()
    assert c is not a


@needs_asset
def test_default_detector_uses_packaged_fallback(monkeypatch):
    import latentsync_tpu.utils.image_processor as ip
    from latentsync_tpu.models.face_detection import FANLandmarkDetector

    monkeypatch.setenv("LATENTSYNC_FAN_CKPT", "/nonexistent.npz")
    monkeypatch.delenv("LATENTSYNC_NO_FALLBACK_FAN", raising=False)
    det = ip.default_landmark_detector()
    assert isinstance(det, FANLandmarkDetector)
    assert det.face_detector is not None


@needs_asset
def test_packaged_fallback_accuracy_on_synthetic_faces():
    """The committed asset must beat box-level accuracy by a wide margin
    on fresh synthetic faces: NME (outer-eye-corner normalized) < 0.08
    on full-frame crops. The Haar/box heuristic scores ~0.3+ here."""
    from latentsync_tpu.models.face_detection import FANLandmarkDetector
    from latentsync_tpu.utils.checkpoint import load_pytree

    det = FANLandmarkDetector(load_pytree(ASSET))
    rng = np.random.default_rng(123)  # NOT the training seed (0)
    errs = []
    for _ in range(8):
        img, gt = render_face(rng, 256)
        lm = det(img)
        inter = np.linalg.norm(gt[45] - gt[36])
        errs.append(np.linalg.norm(lm - gt, axis=-1).mean() / max(inter, 1))
    assert float(np.mean(errs)) < 0.08, errs
