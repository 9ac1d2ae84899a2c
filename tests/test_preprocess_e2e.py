"""End-to-end 8-stage data pipeline on synthetic clips (no ffmpeg):
every stage produces outputs and the sidecar audio survives to the
final training-ready files (ref:preprocess/data_processing_pipeline.py)."""

import os
import shutil

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from scipy.io import wavfile


@pytest.fixture(scope="module")
def synthetic_clips(tmp_path_factory):
    src = tmp_path_factory.mktemp("raw")
    rng = np.random.default_rng(0)
    for ci in range(2):
        path = str(src / f"clip{ci}.mp4")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                             (320, 320))
        for _ in range(150):
            img = rng.uniform(0, 60, (320, 320, 3)).astype(np.uint8)
            cv2.circle(img, (160, 160), 90, (200, 170, 150), -1)
            cv2.circle(img, (130, 140), 10, (30, 30, 30), -1)
            cv2.circle(img, (190, 140), 10, (30, 30, 30), -1)
            wr.write(img)
        wr.release()
        wavfile.write(path.replace(".mp4", ".wav"), 16000,
                      (rng.standard_normal(16000 * 6) * 3000).astype(np.int16))
    return str(src)


def test_pipeline_end_to_end_with_audio(synthetic_clips, tmp_path):
    from latentsync_tpu.preprocess.pipeline import DataProcessingPipeline

    # permissive gates: random-weight evaluator/scorer cannot hit the
    # real conf>=3 / IQA>=40 thresholds — the stages themselves are the
    # subject here
    pipe = DataProcessingPipeline(
        output_root=str(tmp_path / "out"),
        min_sync_conf=-1e9, max_av_offset=10**6, min_iqa=-1e9,
    )
    files = pipe.run(synthetic_clips)
    assert len(files) == 2
    for f in files:
        assert os.path.exists(f)
        # sidecar audio must survive every stage (sync_av needs it,
        # training reads it)
        assert os.path.exists(os.path.splitext(f)[0] + ".wav")
    # resumability: a second run reuses existing outputs
    files2 = pipe.run(synthetic_clips)
    assert sorted(files2) == sorted(files)


def test_read_audio_sidecar_fallback(tmp_path):
    from latentsync_tpu.utils import media

    if media.HAVE_FFMPEG:
        pytest.skip("sidecar fallback is the no-ffmpeg path")
    wav = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
    wavfile.write(str(tmp_path / "x.wav"), 16000,
                  (wav * 32767).astype(np.int16))
    (tmp_path / "x.mp4").write_bytes(b"\x00")  # container placeholder
    out = media.read_audio(str(tmp_path / "x.mp4"))
    np.testing.assert_allclose(out, wav, atol=1e-3)
