"""Parity regression for the native restore kernel (native/restore.cpp).

Pins the bbox-restricted rewrite against the per-frame cv2 reference
path (AlignRestore.restore_img, ref:latentsync/utils/affine_transform.py
:85-115): interior faces, faces clipped by the frame edge (exercising
the BORDER_REPLICATE flags of the working-region passes), faces
entirely off-frame (early-out), and the copy=False in-place contract.

Interpolation differs by design (LANCZOS4 in cv2, bilinear native), so
faces are smooth gradients and the gate is a mean-absolute-difference
envelope inside the pasted region, not bitwise equality.
"""

from __future__ import annotations

import numpy as np
import pytest

from latentsync_tpu.utils.face import AlignRestore
from latentsync_tpu.utils.native import restore_frames_native

pytestmark = pytest.mark.skipif(
    restore_frames_native(
        np.zeros((1, 8, 8, 3), np.uint8),
        np.zeros((1, 4, 4, 3), np.uint8),
        np.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]),
    )
    is None,
    reason="native librestore.so unavailable",
)


def _smooth_face(fh, fw, seed):
    """Low-frequency face content so LANCZOS-vs-bilinear is negligible."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:fh, 0:fw].astype(np.float32)
    chans = []
    for _ in range(3):
        a, b, c = rng.uniform(-0.5, 0.5, 3)
        chans.append(127 + 100 * np.sin(a * xs / fw * 6 + b * ys / fh * 6 + c))
    return np.clip(np.stack(chans, -1), 0, 255).astype(np.uint8)


def _smooth_frame(h, w, seed):
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 127 + 80 * np.sin(xs / w * 4 + rng.uniform()) * np.cos(
        ys / h * 3 + rng.uniform()
    )
    return np.clip(np.stack([img] * 3, -1), 0, 255).astype(np.uint8)


def _forward_matrix(angle, scale, tx, ty):
    """Frame→crop similarity (the align convention the pipeline stores)."""
    c, s = np.cos(angle) * scale, np.sin(angle) * scale
    return np.array([[c, -s, tx], [s, c, ty]], np.float64)


def _run_case(h, w, fh, fw, mats, seed=0, tol=4.0):
    n = len(mats)
    frames = np.stack([_smooth_frame(h, w, seed + i) for i in range(n)])
    faces = np.stack([_smooth_face(fh, fw, seed + 10 + i) for i in range(n)])
    mats = np.asarray(mats, np.float64)

    out = restore_frames_native(frames, faces, mats)
    assert out is not None and out.shape == frames.shape

    ar = AlignRestore()
    for i in range(n):
        ref = ar.restore_img(frames[i], faces[i], mats[i])
        diff = np.abs(out[i].astype(np.int32) - ref.astype(np.int32))
        assert diff.mean() < tol, f"frame {i}: mean diff {diff.mean():.2f}"
        # pixels far from the pasted region must be untouched on both
        untouched = ref == frames[i]
        assert (out[i][untouched] == frames[i][untouched]).mean() > 0.98
    return frames, out


def test_interior_face_parity():
    """Face fully inside the frame — the common case; bbox pass must be
    invisible vs the full-frame cv2 composite."""
    m = _forward_matrix(0.1, 0.6, -40.0, -60.0)
    _run_case(240, 320, 96, 80, [m])


def test_batch_mixed_poses():
    mats = [
        _forward_matrix(0.0, 0.5, -30.0, -40.0),
        _forward_matrix(-0.2, 0.7, -80.0, -20.0),
        _forward_matrix(0.3, 0.45, -10.0, -70.0),
    ]
    _run_case(200, 280, 80, 64, mats)


def test_edge_clipped_face_parity():
    """Quad crosses the frame border: the bbox clamps to the edge and the
    erode/blur passes must replicate (cv2 BORDER_REPLICATE), not read 0."""
    # translation pushes the inverse-warped quad across x=0 / y=0
    m_tl = _forward_matrix(0.05, 0.6, 20.0, 25.0)
    # and across the bottom-right corner
    m_br = _forward_matrix(-0.05, 0.6, -150.0, -110.0)
    _run_case(160, 200, 96, 80, [m_tl, m_br], tol=4.5)


def test_offframe_face_untouched():
    """Face entirely off-frame: early-out leaves the frame bitwise intact."""
    m = _forward_matrix(0.0, 0.6, 600.0, 600.0)  # source far outside
    frames = np.stack([_smooth_frame(120, 160, 3)])
    faces = np.stack([_smooth_face(64, 48, 4)])
    out = restore_frames_native(frames, faces, np.array([m]))
    np.testing.assert_array_equal(out[0], frames[0])


def test_copy_false_pastes_in_place():
    m = _forward_matrix(0.0, 0.6, -30.0, -30.0)
    frames = np.stack([_smooth_frame(160, 200, 5)])
    faces = np.stack([_smooth_face(80, 64, 6)])
    scratch = frames.copy()
    out = restore_frames_native(scratch, faces, np.array([m]), copy=False)
    assert out is scratch  # same buffer, no defensive copy
    assert not np.array_equal(scratch, frames)  # actually pasted
    ref = restore_frames_native(frames, faces, np.array([m]))  # copy=True
    np.testing.assert_array_equal(out, ref)
    assert not np.array_equal(frames, ref)  # copy=True left input intact


# ---------------------------------------------------------------------------
# constant-geometry plan path
# ---------------------------------------------------------------------------


def test_plan_path_bit_identical_to_per_frame():
    """restore_frames_const_native must be BITWISE equal to the
    per-frame kernel when every frame shares one matrix — the live
    pipeline's fast path (clips have one box + one align matrix)."""
    from latentsync_tpu.utils.native import restore_frames_const_native

    rng = np.random.default_rng(7)
    h, w, fh, fw, n = 240, 320, 96, 80, 6
    frames = rng.integers(0, 256, (n, h, w, 3), np.uint8)
    faces = rng.integers(0, 256, (n, fh, fw, 3), np.uint8)
    for angle, scale, tx, ty in [
        (0.05, 0.6, -40.0, -30.0),   # interior
        (0.0, 0.45, -5.0, -3.0),     # touches frame edges (replicate flags)
        (-0.2, 0.7, -500.0, -400.0), # face pushed off-frame (empty plan)
    ]:
        mat = _forward_matrix(angle, scale, tx, ty)
        ref = restore_frames_native(frames, faces, np.tile(mat, (n, 1, 1)))
        got = restore_frames_const_native(frames, faces, mat)
        assert np.array_equal(ref, got), (angle, scale, tx, ty)


def test_plan_cache_reuses_and_stays_correct():
    """Second call with the same matrix hits the cached plan and still
    restores fresh frame content correctly."""
    from latentsync_tpu.utils.native import restore_frames_const_native

    rng = np.random.default_rng(8)
    h, w, fh, fw, n = 120, 160, 48, 40, 3
    mat = _forward_matrix(0.1, 0.5, -20.0, -10.0)
    for seed in (1, 2):
        frames = rng.integers(0, 256, (n, h, w, 3), np.uint8)
        faces = rng.integers(0, 256, (n, fh, fw, 3), np.uint8)
        ref = restore_frames_native(frames, faces, np.tile(mat, (n, 1, 1)))
        got = restore_frames_const_native(frames, faces, mat)
        assert np.array_equal(ref, got)
