"""Shot-boundary detector fidelity (VERDICT r02 #8): pyscenedetect
AdaptiveDetector semantics on fixtures with KNOWN cut frames —
hard cuts detected at the exact frame, gradual fades NOT cut, static
footage with sensor noise NOT cut, min_scene_len respected."""

import numpy as np
import pytest

from latentsync_tpu.preprocess.pipeline import content_scores, detect_shots


def _solid(n, color, size=48, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    base = np.full((n, size, size, 3), color, np.float32)
    if noise:
        base = base + rng.standard_normal(base.shape) * noise
    return np.clip(base, 0, 255).astype(np.uint8)


def test_hard_cuts_at_exact_frames():
    """Three shots with saturated color changes → cuts exactly at the
    first frame of each new shot."""
    clip = np.concatenate([
        _solid(40, (200, 40, 40)),
        _solid(40, (40, 200, 40)),
        _solid(40, (40, 40, 220)),
    ])
    assert detect_shots(clip) == [40, 80]


def test_gradual_fade_not_cut():
    """A 60-frame linear fade produces a flat score plateau (adaptive
    ratio ≈ 1) — the AdaptiveDetector must NOT cut, even though each
    frame-to-frame delta is nonzero."""
    a = np.array((220.0, 220.0, 220.0))
    b = np.array((20.0, 20.0, 20.0))
    frames = np.stack([
        np.full((48, 48, 3), a + (b - a) * t, np.float32)
        for t in np.linspace(0, 1, 60)
    ]).astype(np.uint8)
    assert detect_shots(frames) == []


def test_static_noise_not_cut():
    """Sensor noise on static footage: ratios hover near 1 and raw
    scores sit below min_content_val → no cuts."""
    clip = _solid(80, (128, 128, 128), noise=6.0, seed=1)
    assert detect_shots(clip) == []


def test_min_scene_len_suppresses_rapid_cuts():
    """Two real cuts 8 frames apart: only the first fires with the
    default min_scene_len=15; both fire when it is lowered."""
    clip = np.concatenate([
        _solid(30, (200, 40, 40)),
        _solid(8, (40, 200, 40)),
        _solid(30, (40, 40, 220)),
    ])
    assert detect_shots(clip) == [30]
    assert detect_shots(clip, min_scene_len=5) == [30, 38]


def test_window_edges_never_cut():
    """Frames whose ±window_width surround is incomplete are skipped
    (AdaptiveDetector delays by window_width): a cut at frame 1 of a
    clip cannot fire."""
    clip = np.concatenate([_solid(1, (200, 40, 40)), _solid(20, (40, 200, 40))])
    assert detect_shots(clip) == []


def test_content_scores_shape_and_zero_start():
    clip = _solid(5, (100, 100, 100))
    s = content_scores(clip)
    assert s.shape == (5,)
    assert s[0] == 0.0
    assert np.all(s[1:] == 0.0)


def test_cut_in_low_contrast_footage_requires_min_content():
    """A mild color step (score below min_content_val) in otherwise
    static footage is NOT a cut at reference settings, but IS one when
    the gate is lowered — pinning the min_content_val semantics."""
    clip = np.concatenate([
        _solid(30, (128, 128, 128)),
        _solid(30, (140, 140, 140)),
    ])
    s = content_scores(clip)
    assert 0 < s[30] < 15.0
    assert detect_shots(clip) == []
    assert detect_shots(clip, min_content_val=1.0) == [30]
