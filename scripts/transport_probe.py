"""Probe the host<->device transport: transfer bandwidth (both ways,
several sizes), eager-op dispatch latency, and the pipeline's real
audio-frontend / decode-fetch costs. Quantifies where the measured
e2e clip latency (bench r03: 233 s vs 15.4 s device path) goes on the
tunneled backend.

Usage: python -m scripts.transport_probe
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def p(**kw):
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def fetch_sync(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


def main():
    dev = jax.devices()[0]
    p(device=str(dev), platform=dev.platform)

    # --- h2d / d2h bandwidth at several sizes
    for mb in (1, 8, 32, 128):
        n = mb * 1024 * 1024
        host = np.random.default_rng(0).integers(0, 255, n, np.uint8)
        t0 = time.perf_counter()
        d = jnp.asarray(host)
        fetch_sync(d)
        h2d = time.perf_counter() - t0
        t0 = time.perf_counter()
        back = np.asarray(d)
        d2h = time.perf_counter() - t0
        assert back[0] == host[0]
        p(xfer_mb=mb, h2d_s=h2d, h2d_mb_s=mb / h2d, d2h_s=d2h,
          d2h_mb_s=mb / d2h)

    # --- eager dispatch latency: N tiny chained ops, one fetch
    x = jnp.ones((128, 128))
    fetch_sync(x)
    for n_ops in (1, 16, 64):
        t0 = time.perf_counter()
        y = x
        for _ in range(n_ops):
            y = y + 1.0
        fetch_sync(y)
        t = time.perf_counter() - t0
        p(eager_ops=n_ops, total_s=t, per_op_ms=t / n_ops * 1e3)

    # --- the audio frontend exactly as the pipeline runs it
    from latentsync_tpu.audio.features import Audio2Feature
    from latentsync_tpu.config import WhisperConfig

    a2f = Audio2Feature(WhisperConfig.tiny(), dtype=jnp.bfloat16)
    audio = np.random.default_rng(1).standard_normal(5 * 16000).astype(np.float32) * 0.05
    for run in range(3):
        t0 = time.perf_counter()
        feats = a2f.audio2feat(audio)
        t = time.perf_counter() - t0
        p(stage="audio2feat_5s", run=run, s=t, feat_shape=list(feats.shape))
    t0 = time.perf_counter()
    chunks = a2f.feature2chunks(feats, fps=25)
    p(stage="feature2chunks", s=time.perf_counter() - t0,
      shape=list(chunks.shape))

    # --- sub-splits of audio2feat
    from latentsync_tpu.ops.mel import WHISPER_N_FRAMES, pad_or_trim, whisper_log_mel

    t0 = time.perf_counter()
    mel = whisper_log_mel(jnp.asarray(audio))
    fetch_sync(mel)
    p(stage="whisper_log_mel", s=time.perf_counter() - t0,
      shape=list(mel.shape))
    t0 = time.perf_counter()
    seg = pad_or_trim(mel[:, :500], WHISPER_N_FRAMES)
    batch = jnp.stack([seg])
    fetch_sync(batch)
    p(stage="pad_stack", s=time.perf_counter() - t0)
    t0 = time.perf_counter()
    embeds = a2f._encode(a2f.params, batch)
    fetch_sync(embeds)
    p(stage="encoder_call", s=time.perf_counter() - t0,
      shape=list(embeds.shape))
    t0 = time.perf_counter()
    host_embeds = np.asarray(embeds.astype(jnp.float32))
    p(stage="embeds_fetch_f32", s=time.perf_counter() - t0,
      mb=host_embeds.nbytes / 1e6)


if __name__ == "__main__":
    main()
