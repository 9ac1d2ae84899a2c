"""Serving queue/API logic + eval math tests (no TPU, no network)."""

import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp


def test_local_queue_roundtrip(tmp_path):
    from latentsync_tpu.serving.worker import LocalDirQueue

    q = LocalDirQueue(str(tmp_path))
    jid = q.submit({"avatar_id": "a", "audio_path": "x.wav"})
    assert q.get(jid)["status"] == "pending"
    assert len(q.pending()) == 1
    q.update(jid, status="completed", output="out.mp4")
    assert q.pending() == []
    assert q.get(jid)["output"] == "out.mp4"


def test_worker_dependency_gating(tmp_path):
    from latentsync_tpu.serving.worker import LocalDirQueue, QueueWorker

    q = LocalDirQueue(str(tmp_path))
    dep = q.submit({"avatar_id": "a", "audio_path": "x.wav", "status": "pending"})
    child = q.submit({
        "avatar_id": "b", "audio_path": "y.wav",
        "status": "waiting-dependency", "dependencies": [dep],
    })

    handled = []
    worker = QueueWorker(q, api_url="http://invalid")
    worker.handle_job(q.get(child))
    # dependency not completed → stays waiting
    assert q.get(child)["status"] == "waiting-dependency"
    q.update(dep, status="completed")
    # now it transitions to pending and attempts the API (which fails →
    # failed status, proving the gate opened)
    worker.handle_job(q.get(child))
    assert q.get(child)["status"] == "failed"


class _FakePipeline:
    def __call__(self, video_path, audio_path, video_out_path, **kw):
        from dataclasses import dataclass

        with open(video_out_path, "w") as f:
            f.write("video")

        @dataclass
        class R:
            video_path: str
            elapsed: dict
        return R(video_out_path, {"total": 0.01})


def test_api_server_end_to_end(tmp_path):
    from latentsync_tpu.serving.api import ServingState, make_handler
    from latentsync_tpu.serving.artifacts import AvatarStore
    from http.server import ThreadingHTTPServer

    avatars = tmp_path / "avatars"
    avatars.mkdir()
    (avatars / "alice.mp4").write_text("fake")
    wav = tmp_path / "a.wav"
    wav.write_text("fake")

    state = ServingState(_FakePipeline(), AvatarStore(str(avatars)), str(tmp_path / "out"))
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/ping") as r:
            assert json.loads(r.read())["status"] == "ok"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/process",
            data=json.dumps({"avatar_id": "alice", "audio_path": str(wav)}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            job = json.loads(r.read())
        assert "job_id" in job
        for _ in range(50):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/jobs/{job['job_id']}"
            ) as r:
                status = json.loads(r.read())
            if status["status"] in ("completed", "failed"):
                break
            time.sleep(0.1)
        assert status["status"] == "completed", status
        # bad request probes
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/process", data=b"not json",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_mfcc_shape_and_energy(rng):
    from latentsync_tpu.eval.mfcc import mfcc

    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    feat = mfcc(audio, 16000)
    # 1s @ 10ms hop → ~98-100 frames, 13 ceps
    assert feat.shape[1] == 13 and 95 <= feat.shape[0] <= 101
    # first coefficient is log energy (monotonic with signal power)
    loud = mfcc(audio * 10, 16000)
    assert loud[:, 0].mean() > feat[:, 0].mean()


def test_pairwise_shift_distances_and_offset():
    from latentsync_tpu.eval.sync_eval import (
        offset_and_confidence,
        pairwise_shift_distances,
    )

    rng = np.random.default_rng(0)
    t, d, vshift = 40, 16, 15
    aud = rng.standard_normal((t, d)).astype(np.float32)
    # lip features = audio shifted by +3 frames → offset should be -3
    shift = 3
    lip = np.roll(aud, -shift, axis=0)
    dists = pairwise_shift_distances(jnp.asarray(lip), jnp.asarray(aud), vshift)
    assert dists.shape == (t, 2 * vshift + 1)
    offset, min_dist, conf = offset_and_confidence(dists, vshift)
    assert offset == -shift
    assert min_dist < 0.5 and conf > 1.0


def test_shot_detector_finds_cut():
    from latentsync_tpu.preprocess.pipeline import detect_shots

    rng = np.random.default_rng(0)
    a = (rng.random((30, 64, 64, 3)) * 30).astype(np.uint8)
    b = (rng.random((30, 64, 64, 3)) * 30 + 200).astype(np.uint8)
    frames = np.concatenate([a, b])
    cuts = detect_shots(frames)
    assert 30 in cuts


def test_avatar_store_variants(tmp_path):
    from latentsync_tpu.serving.artifacts import AvatarStore

    (tmp_path / "bob.mp4").write_text("x")
    (tmp_path / "bob_rotated.mp4").write_text("x")
    store = AvatarStore(str(tmp_path))
    assert store.resolve("bob").video_path.endswith("bob.mp4")
    assert store.resolve("bob", rotated=True).video_path.endswith("bob_rotated.mp4")
    assert store.resolve("bob").bundle_path is None
    with pytest.raises(FileNotFoundError):
        store.resolve("carol")
