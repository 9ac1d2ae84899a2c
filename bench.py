"""Headline benchmark: frames/sec/chip for 256px lip-sync at 20 DDIM steps.

Measures the full device-side generation path on one chip — VAE encode of
masked+reference frames, the 20-step CFG-batched UNet denoise of W
16-frame windows, and VAE decode — with random weights (FLOPs are
weight-independent). Baseline to beat: 25 fps/chip (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# the env-var-only setdefault this used to do inside main() ran AFTER
# `import jax`, so the persistent cache silently never engaged and every
# bench run cold-compiled all three denoise programs (~minutes each on
# this 1-core host); enable_compile_cache is import-order-safe
from latentsync_tpu.utils.misc import enable_compile_cache

enable_compile_cache()


def main():
    # int8 conv execution is the production inference mode (measured
    # 1.5-1.6x on the conv family, docs/perf_audit.md; fidelity gate is
    # statistical — validation protocol in the audit). LATENTSYNC_INT8=0
    # benches the pure-bf16 path.
    os.environ.setdefault("LATENTSYNC_INT8", "1")
    # DeepCache + encoder propagation are the production inference mode
    # (measured sweep in docs/perf_audit.md "Round-3 FLOP cuts":
    # 2:1:enc 17.4 / 3:1:enc 19.6 / 4:1:enc 21.6 / 5:1:enc 23.1 /
    # 4:1:enc:2 30.1 / 5:1:enc:2 34.9 fps r03; same statistical fidelity
    # gate + validation protocol as int8 — SyncNet conf within 2%;
    # `scripts/validate_fidelity.py --ladder` walks these rungs
    # fastest-first and selects the first that passes the moment real
    # weights drop). Default operating point: the MODERATE 4:1:enc rung
    # of the measured ladder (all ladder rungs include CFG 0:0.5) —
    # ADVICE r3: the aggressive sub-block read cut (4:1:enc:2) stays
    # opt-in (BENCH_TURBO=1 below, or env knobs) until the ladder has
    # passed on pretrained weights. LATENTSYNC_DEEPCACHE=0 benches the
    # exact-trajectory path, which is also always measured and reported
    # as detail.exact_fps below.
    os.environ.setdefault("LATENTSYNC_DEEPCACHE", "4:1:enc")
    os.environ.setdefault("LATENTSYNC_CFG_INTERVAL", "0:0.5")
    from latentsync_tpu.audio.features import Audio2Feature
    from latentsync_tpu.config import LatentSyncConfig, WhisperConfig
    from latentsync_tpu.models.unet3d import UNet3DConditionModel
    from latentsync_tpu.models.vae import AutoencoderKL
    from latentsync_tpu.pipelines.lipsync import LipsyncPipeline
    from latentsync_tpu.utils.params import UNET_ZERO_PATHS, cast_floating, fast_init

    dtype = jnp.bfloat16
    cfg = LatentSyncConfig()
    res = cfg.data.resolution          # 256
    f = cfg.data.num_frames            # 16
    lat = res // cfg.vae.scale_factor  # 32
    steps = cfg.run.inference_steps    # 20
    guidance = cfg.run.guidance_scale  # 1.5

    # windows per denoise call — the serving batch size
    W = int(os.environ.get("BENCH_WINDOWS", "2"))
    n_rounds = int(os.environ.get("BENCH_ROUNDS", "3"))

    unet = UNet3DConditionModel(cfg.unet, dtype=dtype)
    vae = AutoencoderKL(cfg.vae, dtype=dtype)

    unet_params = cast_floating(
        fast_init(
            lambda s, t, a: unet.init(jax.random.PRNGKey(0), s, t, a),
            jnp.zeros((1, f, lat, lat, cfg.unet.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, f, 50, cfg.unet.cross_attention_dim)),
            zero_paths=UNET_ZERO_PATHS,
        ),
        dtype,
    )
    vae_params = cast_floating(
        fast_init(
            lambda x: vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1)),
            jnp.zeros((1, res, res, 3)),
            seed=1,
        ),
        dtype,
    )

    pipe = LipsyncPipeline(
        unet_params, vae_params,
        audio_encoder=Audio2Feature(WhisperConfig.tiny()),
        config=cfg, dtype=dtype,
    )

    rng = np.random.default_rng(0)
    total = W * f
    pixels = jnp.asarray(rng.standard_normal((total, res, res, 3)), jnp.float32) * 0.3
    masked_pix = pixels * 0.5
    audio = jnp.asarray(rng.standard_normal((W, f, 50, 384)), jnp.float32)
    mask = jnp.ones((W, f, lat, lat, 1), jnp.float32)
    latents0 = jnp.broadcast_to(
        jax.random.normal(jax.random.PRNGKey(0), (1, 1, lat, lat, 4)),
        (W, f, lat, lat, 4),
    )

    def make_generate(denoise):
        def generate():
            masked_lat = pipe._vae_encode(masked_pix).reshape(W, f, lat, lat, 4)
            ref_lat = pipe._vae_encode(pixels).reshape(W, f, lat, lat, 4)
            lat_out = denoise(pipe.unet_params, latents0, mask, masked_lat,
                              ref_lat, audio)
            frames = pipe._vae_decode(lat_out.reshape(total, lat, lat, 4))
            return frames
        return generate

    def sync(x):
        # through the axon tunnel only a data FETCH synchronizes;
        # block_until_ready returns immediately (measured in r02) —
        # fetch one element to drain the execution stream
        np.asarray(jax.device_get(x.ravel()[:1]))

    def measure(generate):
        sync(generate())  # warmup / compile
        times = []
        for _ in range(n_rounds):
            t0 = time.perf_counter()
            sync(generate())
            times.append(time.perf_counter() - t0)
        return times

    times = measure(make_generate(pipe._denoise_fn(steps, guidance, True)))
    fps = total / min(times)

    # exact-trajectory fps (VERDICT r3 #1): the same path with every
    # output-changing FLOP-cut knob off — reference DDIM semantics.
    # int8 convs stay on (that is the exact-trajectory operating point
    # the perf audit tracks; LATENTSYNC_INT8=0 gives pure bf16).
    knobs = {k: os.environ.pop(k, None)
             for k in ("LATENTSYNC_DEEPCACHE", "LATENTSYNC_CFG_INTERVAL")}
    exact_times = measure(make_generate(pipe._denoise_fn(steps, guidance, True)))
    exact_fps = total / min(exact_times)

    # true reference semantics (VERDICT r4 #4): EVERY output-changing
    # knob off, including int8 weight quantization — pure bf16
    int8_knob = os.environ.pop("LATENTSYNC_INT8", None)
    bf16_times = measure(make_generate(pipe._denoise_fn(steps, guidance, True)))
    exact_bf16_fps = total / min(bf16_times)
    if int8_knob is not None:
        os.environ["LATENTSYNC_INT8"] = int8_knob

    # opt-in turbo rung (aggressive: sub-block read cut + CFG interval)
    turbo = {}
    if os.environ.get("BENCH_TURBO"):
        os.environ["LATENTSYNC_DEEPCACHE"] = "4:1:enc:2"
        os.environ["LATENTSYNC_CFG_INTERVAL"] = "0:0.5"
        tt = measure(make_generate(pipe._denoise_fn(steps, guidance, True)))
        turbo = {"turbo_fps": round(total / min(tt), 2),
                 "turbo_knobs": "deepcache=4:1:enc:2,cfg=0:0.5"}
    for k, v in knobs.items():  # restore the defaults for the e2e runs
        if v is not None:
            os.environ[k] = v

    # measured end-to-end latency per 5 s clip — full pipeline including
    # host face align, warp-restore paste-back, and mux on the demo
    # assets (VERDICT r02 weak #3: previously derived as 125/fps)
    e2e = {}
    demo_video = "/root/reference/assets/demo1_video.mp4"
    demo_audio = "/root/reference/assets/demo1_audio.wav"
    if os.path.isfile(demo_video) and not os.environ.get("BENCH_SKIP_E2E"):
        try:
            import cv2

            from latentsync_tpu.utils.media import read_audio, read_video, write_audio

            frames5 = read_video(demo_video, change_fps=True, fps=25)[:125]
            h, w_px = frames5.shape[1:3]
            clip5 = "/tmp/bench_clip5.mp4"
            vw = cv2.VideoWriter(clip5, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                                 (w_px, h))
            for fr in frames5:
                vw.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
            vw.release()
            wav5 = "/tmp/bench_clip5.wav"
            write_audio(wav5, read_audio(demo_audio, 16000)[: 5 * 16000], 16000)

            # each run is time-bounded: the tunneled transport sometimes
            # stalls on a fetch for tens of minutes (observed r03), and a
            # wedged e2e must not take the whole bench down with it
            import threading

            budget_s = float(os.environ.get("BENCH_E2E_RUN_TIMEOUT", "600"))
            n_e2e = int(os.environ.get("BENCH_E2E_RUNS", "5"))
            runs = []
            elapsed = {}
            timed_out = 0
            for i in range(n_e2e):
                result = {}

                def one_run(i=i, result=result):
                    t0 = time.perf_counter()
                    out = pipe(clip5, wav5, f"/tmp/bench_out5_{i}.mp4",
                               num_inference_steps=steps,
                               guidance_scale=guidance, window_batch=W)
                    result["t"] = time.perf_counter() - t0
                    result["elapsed"] = out.elapsed

                th = threading.Thread(target=one_run, daemon=True)
                th.start()
                th.join(budget_s if i else budget_s * 4)  # run 0 compiles
                if "t" not in result:
                    # a stalled tunnel fetch must neither wedge the bench
                    # nor end the sample — record and keep measuring
                    timed_out += 1
                    if timed_out >= 2:
                        break
                    continue
                runs.append(result["t"])
                elapsed = result["elapsed"]
            runs.sort()
            # host/device overlap proof (VERDICT r3 #5): stages are timed
            # per-stage on their own threads (faces ∥ audio; chunked
            # decode fetch ∥ host restore), so Σ(stages) > wall-clock iff
            # the overlap actually engaged on this measured run
            stage_keys = ("faces", "audio_device", "audio", "vae_encode",
                          "denoise_dispatch", "vae_decode", "restore", "write")
            stage_sum = sum(elapsed.get(k, 0.0) for k in stage_keys)
            e2e = {
                **({"p50_latency_5s_clip_s": round(runs[len(runs) // 2], 3)}
                   if runs else {}),
                "e2e_runs_s": [round(t, 3) for t in runs],
                "e2e_stage_s": {k: round(v, 3) for k, v in elapsed.items()},
                **({"e2e_stage_sum_s": round(stage_sum, 3),
                    "e2e_overlap_s": round(
                        stage_sum - elapsed["total"], 3)}
                   if elapsed else {}),
                **({"e2e_timeouts": timed_out} if timed_out else {}),
            }
        except Exception as exc:  # noqa: BLE001 — e2e is additive detail
            e2e = {"e2e_error": f"{type(exc).__name__}: {exc}"}

    stage_ms = {}
    if os.environ.get("BENCH_DETAIL"):
        # per-stage split (each stage fetch-synced; adds fetches, so the
        # headline number above is measured separately)
        t0 = time.perf_counter()
        masked_lat = pipe._vae_encode(masked_pix).reshape(W, f, lat, lat, 4)
        ref_lat = pipe._vae_encode(pixels).reshape(W, f, lat, lat, 4)
        sync(ref_lat)
        stage_ms["vae_encode"] = round((time.perf_counter() - t0) * 1e3, 1)
        t0 = time.perf_counter()
        lat_out = pipe._denoise_fn(steps, guidance, True)(
            pipe.unet_params, latents0, mask, masked_lat, ref_lat, audio)
        sync(lat_out)
        stage_ms["denoise_20steps"] = round((time.perf_counter() - t0) * 1e3, 1)
        t0 = time.perf_counter()
        frames = pipe._vae_decode(lat_out.reshape(total, lat, lat, 4))
        sync(frames)
        stage_ms["vae_decode"] = round((time.perf_counter() - t0) * 1e3, 1)
    print(json.dumps({
        "metric": "frames_per_sec_per_chip_256px_20steps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 25.0, 3),
        "detail": {
            "windows": W, "times_s": [round(t, 3) for t in times],
            "exact_fps": round(exact_fps, 2),
            "exact_times_s": [round(t, 3) for t in exact_times],
            "exact_bf16_fps": round(exact_bf16_fps, 2),
            "exact_bf16_times_s": [round(t, 3) for t in bf16_times],
            **turbo,
            "int8_convs": os.environ.get("LATENTSYNC_INT8") == "1",
            "deepcache": os.environ.get("LATENTSYNC_DEEPCACHE", ""),
            "cfg_interval": os.environ.get("LATENTSYNC_CFG_INTERVAL", ""),
            **({"stage_ms": stage_ms} if stage_ms else {}),
            **e2e,
            "device_path_5s_clip_s": round((125 / fps) * 1.0, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
