"""FFHQ alignment recipe (scripts/crop_align_face equivalent)."""

import numpy as np

from latentsync_tpu.utils.ffhq_align import ffhq_align_face, ffhq_quad


def _lm68(cx=200.0, cy=200.0, s=60.0, angle=0.0):
    """Synthetic 68 landmarks: eyes at ±0.5s, mouth 0.7s below."""
    lm = np.zeros((68, 2))
    rot = np.array([[np.cos(angle), -np.sin(angle)],
                    [np.sin(angle), np.cos(angle)]])

    def put(sl, pt):
        lm[sl] = (rot @ np.asarray(pt)) * s + (cx, cy)

    put(slice(36, 42), (-0.5, -0.3))   # left eye cluster
    put(slice(42, 48), (0.5, -0.3))    # right eye cluster
    lm[48] = (rot @ np.array([-0.35, 0.45])) * s + (cx, cy)  # mouth corners
    lm[54] = (rot @ np.array([0.35, 0.45])) * s + (cx, cy)
    return lm


def test_quad_geometry_upright():
    quad, qsize = ffhq_quad(_lm68())
    assert quad.shape == (4, 2) and qsize > 0
    # square-ish, centered near the face center
    side = np.linalg.norm(quad[1] - quad[0])
    assert abs(np.linalg.norm(quad[2] - quad[1]) - side) < 1e-6
    c = quad.mean(0)
    assert abs(c[0] - 200) < 30 and abs(c[1] - 200) < 40


def test_quad_rotates_with_face():
    q0, _ = ffhq_quad(_lm68(angle=0.0))
    q45, _ = ffhq_quad(_lm68(angle=np.pi / 4))
    e0 = q0[3] - q0[0]
    e45 = q45[3] - q45[0]
    ang = np.arccos(np.dot(e0, e45) / np.linalg.norm(e0) / np.linalg.norm(e45))
    assert abs(ang - np.pi / 4) < 0.02


def test_align_face_output_and_orientation():
    """A colored marker at the eye midpoint lands in the crop's upper
    middle at the FFHQ anchor position."""
    rng = np.random.default_rng(0)
    img = (rng.uniform(60, 120, (400, 400, 3))).astype(np.uint8)
    lm = _lm68()
    eye_mid = lm[36:48].mean(0).astype(int)
    img[eye_mid[1] - 4: eye_mid[1] + 4, eye_mid[0] - 4: eye_mid[0] + 4] = (255, 0, 0)
    out = ffhq_align_face(img, lm, output_size=128, transform_size=512)
    assert out.shape == (128, 128, 3)
    reds = np.argwhere((out[:, :, 0] > 200) & (out[:, :, 1] < 100))
    assert len(reds) > 0
    y, x = reds.mean(0)
    assert abs(x - 64) < 10          # horizontally centered
    assert 30 < y < 64               # above center (eye line)
