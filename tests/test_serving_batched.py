"""Continuous-batched serving end-to-end: two concurrent clips through
the HTTP API with a shared WindowBatcher, tiny models on CPU."""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_pipe():
    from latentsync_tpu.audio.features import Audio2Feature
    from latentsync_tpu.config import (
        DataConfig, LatentSyncConfig, MotionModuleConfig, UNet3DConfig,
        VAEConfig, WhisperConfig,
    )
    from latentsync_tpu.models.unet3d import UNet3DConditionModel
    from latentsync_tpu.models.vae import AutoencoderKL
    from latentsync_tpu.pipelines.lipsync import LipsyncPipeline
    from latentsync_tpu.utils.params import fast_init

    cfg = LatentSyncConfig(
        unet=UNet3DConfig(
            block_out_channels=(32, 64, 64, 64), layers_per_block=1,
            norm_num_groups=8, cross_attention_dim=16, attention_head_dim=4,
            motion_module=MotionModuleConfig(num_attention_heads=4,
                                             num_transformer_block=1),
        ),
        vae=VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                      norm_num_groups=4),
        whisper=WhisperConfig(n_audio_state=16, n_audio_head=4, n_audio_layer=1),
        data=DataConfig(num_frames=4, resolution=16),
    )
    lat = 8
    unet = UNet3DConditionModel(cfg.unet)
    up = fast_init(
        lambda s, t, a: unet.init(jax.random.PRNGKey(0), s, t, a),
        jnp.zeros((1, 4, lat, lat, 13)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 4, 50, 16)), seed=2,
    )
    vae = AutoencoderKL(cfg.vae)
    vp = fast_init(
        lambda x: vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1)),
        jnp.zeros((1, 16, 16, 3)), seed=3,
    )
    return LipsyncPipeline(up, vp, Audio2Feature(cfg.whisper, num_frames=4),
                           cfg, dtype=jnp.float32)


def test_concurrent_clips_continuous_batched(tiny_pipe, tmp_path, rng):
    import cv2

    from latentsync_tpu.serving.api import ServingState, make_handler
    from latentsync_tpu.serving.artifacts import AvatarStore, generate_affine_bundle
    from latentsync_tpu.utils.image_processor import ImageProcessor
    from latentsync_tpu.utils.media import write_audio

    avatars = tmp_path / "avatars"
    avatars.mkdir()
    for name in ("a", "b"):
        p = str(avatars / f"{name}.mp4")
        frames = (rng.random((30, 64, 48, 3)) * 200 + 30).astype(np.uint8)
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 25, (48, 64))
        for fr in frames:
            w.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
        w.release()
        generate_affine_bundle(ImageProcessor(16), p, str(avatars / f"{name}.npz"))
    wav = str(tmp_path / "in.wav")
    write_audio(wav, (rng.standard_normal(16000) * 0.05).astype(np.float32))

    state = ServingState(
        tiny_pipe, AvatarStore(str(avatars)), str(tmp_path / "out"),
        continuous_batching=True, batch_windows=4, num_workers=2,
    )
    # default pipeline knobs get 20 steps; tiny model is fast enough
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        job_ids = []
        # two default-config requests plus one with per-request overrides —
        # the override must get its own (steps, guidance)-keyed batcher
        # rather than silently inheriting (20, 1.5)
        payloads = [
            {"avatar_id": "a", "audio_path": wav},
            {"avatar_id": "b", "audio_path": wav},
            {"avatar_id": "a", "audio_path": wav,
             "inference_steps": 3, "guidance_scale": 2.0},
        ]
        for payload in payloads:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/process",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                job_ids.append(json.loads(r.read())["job_id"])
        results = {}
        deadline = time.time() + 300
        while len(results) < len(job_ids) and time.time() < deadline:
            for jid in job_ids:
                if jid in results:
                    continue
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/jobs/{jid}"
                ) as r:
                    st = json.loads(r.read())
                if st["status"] in ("completed", "failed"):
                    results[jid] = st
            time.sleep(0.5)
        assert len(results) == len(job_ids), results
        for jid, st in results.items():
            assert st["status"] == "completed", st
            import os

            assert os.path.isfile(st["output"])
        # override request created a second compiled batcher config
        assert set(state._batchers) == {(20, 1.5), (3, 2.0)}
    finally:
        server.shutdown()
        for b in state._batchers.values():
            b.close()
