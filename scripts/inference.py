"""CLI inference — the north-star path (ref:scripts/inference.py:26-113).

python -m scripts.inference --video V --audio A --out OUT \
    [--unet-ckpt latentsync_unet.pt] [--vae-ckpt ...] [--whisper-ckpt tiny.pt]

Without checkpoints, models run with random weights (structure smoke /
benchmark mode) — the reference cannot run at all without its released
checkpoints; we degrade to a runnable pipeline either way.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_pipeline(args, dtype=jnp.bfloat16):
    from latentsync_tpu.audio.features import Audio2Feature
    from latentsync_tpu.config import LatentSyncConfig, WhisperConfig, load_unet_config
    from latentsync_tpu.models.unet3d import UNet3DConditionModel
    from latentsync_tpu.models.vae import AutoencoderKL
    from latentsync_tpu.pipelines.lipsync import LipsyncPipeline
    from latentsync_tpu.utils import convert
    from latentsync_tpu.utils.params import UNET_ZERO_PATHS, cast_floating, fast_init

    if args.unet_config:
        config = load_unet_config(args.unet_config)
    else:
        config = LatentSyncConfig()

    # whisper tiny vs small by cross-attn dim (ref:scripts/inference.py:42-47);
    # non-release dims (tiny smoke/trained-from-scratch configs) get a
    # matching-width encoder, same rule as train_unet.run_validation
    cad = config.unet.cross_attention_dim
    if cad == 384:
        whisper_cfg = WhisperConfig.tiny()
    elif cad == 768:
        whisper_cfg = WhisperConfig.small()
    else:
        whisper_cfg = WhisperConfig(
            n_audio_state=cad, n_audio_head=max(1, cad // 8), n_audio_layer=1)

    # --- whisper ---
    if args.whisper_ckpt and os.path.isfile(args.whisper_ckpt):
        whisper_cfg, whisper_params = convert.load_whisper(args.whisper_ckpt)
        whisper_params = jax.tree.map(jnp.asarray, whisper_params)
    else:
        whisper_params = None  # random init inside Audio2Feature
    audio_encoder = Audio2Feature(
        whisper_cfg, params=whisper_params,
        num_frames=config.data.num_frames,
        audio_feat_length=config.data.audio_feat_length,
        dtype=dtype,  # bf16 encoder matmuls (the reference runs fp16 on GPU)
    )

    # --- VAE ---
    vae = AutoencoderKL(config.vae, dtype=dtype)
    if args.vae_ckpt and os.path.isfile(args.vae_ckpt):
        sd, _ = convert.load_torch_state_dict(args.vae_ckpt)
        vae_params = jax.tree.map(jnp.asarray, convert.convert_vae(sd))
    else:
        vae_params = fast_init(
            lambda x: vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1)),
            jnp.zeros((1, 64, 64, 3)),
            seed=1,
        )
    vae_params = cast_floating(vae_params, dtype)

    # --- UNet ---
    unet = UNet3DConditionModel(config.unet, dtype=dtype)
    f = config.data.num_frames
    lat = config.data.resolution // config.vae.scale_factor
    if args.unet_ckpt and os.path.isdir(args.unet_ckpt):
        # an Orbax step directory written by scripts/train_unet — serve
        # our own trainer's checkpoints directly (the reference can only
        # load its torch .pt exports)
        from latentsync_tpu.utils.checkpoint import restore_host

        unet_params = jax.tree.map(
            jnp.asarray, restore_host(args.unet_ckpt)["params"])
    elif args.unet_ckpt and os.path.isfile(args.unet_ckpt):
        sd, step = convert.load_torch_state_dict(args.unet_ckpt)
        loaded = convert.convert_unet(
            sd, config.unet.in_channels, config.unet.out_channels,
            config.unet.cross_attention_dim,
        )
        init = fast_init(
            lambda s, t, a: unet.init(jax.random.PRNGKey(0), s, t, a),
            jnp.zeros((1, f, lat, lat, config.unet.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, f, 50, config.unet.cross_attention_dim)),
            zero_paths=UNET_ZERO_PATHS,
        )
        unet_params = convert.merge_params(init, loaded)
    else:
        unet_params = fast_init(
            lambda s, t, a: unet.init(jax.random.PRNGKey(0), s, t, a),
            jnp.zeros((1, f, lat, lat, config.unet.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, f, 50, config.unet.cross_attention_dim)),
            zero_paths=UNET_ZERO_PATHS,
            seed=2,
        )
    unet_params = cast_floating(unet_params, dtype)

    return LipsyncPipeline(
        unet_params=unet_params,
        vae_params=vae_params,
        audio_encoder=audio_encoder,
        config=config,
        dtype=dtype,
    )


def main():
    from latentsync_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True, dest="video_path")
    p.add_argument("--audio", required=True, dest="audio_path")
    p.add_argument("--out", required=True, dest="video_out_path")
    p.add_argument("--unet-config", default="")
    p.add_argument("--unet-ckpt", default="checkpoints/latentsync_unet.pt")
    p.add_argument("--vae-ckpt", default="checkpoints/sd-vae-ft-mse.pt")
    p.add_argument("--whisper-ckpt", default="checkpoints/whisper/tiny.pt")
    p.add_argument("--inference-steps", type=int, default=20)
    p.add_argument("--guidance-scale", type=float, default=1.5)
    p.add_argument("--seed", type=int, default=1247)
    p.add_argument("--resolution", type=int, default=0)
    p.add_argument("--data-path", default=None, help="precomputed affine bundle (.npz)")
    p.add_argument("--window-batch", type=int, default=2)
    p.add_argument("--fast", default=None, nargs="?",
                   const="int8,deepcache=4:1:enc,cfg=0:0.5",
                   help="fast inference mode (statistically gated — validate "
                        "with scripts/validate_fidelity): comma list of int8 "
                        "/ deepcache=I:d[:enc[:k]] / cfg=lo:hi. Bare --fast "
                        "selects the moderate production operating point; the "
                        "aggressive turbo rung is spelled out explicitly "
                        "(--fast int8,deepcache=4:1:enc:2,cfg=0:0.5) and "
                        "stays opt-in until validate_fidelity --ladder has "
                        "passed on pretrained weights (ADVICE r3). Omit for "
                        "the exact trajectory (env knobs still honored)")
    args = p.parse_args()

    if args.fast is not None:
        from scripts.validate_fidelity import _set_fast_env

        _set_fast_env(args.fast)
    pipe = build_pipeline(args)
    out = pipe(
        video_path=args.video_path,
        audio_path=args.audio_path,
        video_out_path=args.video_out_path,
        num_inference_steps=args.inference_steps,
        guidance_scale=args.guidance_scale,
        seed=args.seed,
        data_path=args.data_path,
        window_batch=args.window_batch,
        height=args.resolution or None,
    )
    print(json.dumps({"out": out.video_path, "frames": out.num_frames,
                      "timings": out.elapsed}))


if __name__ == "__main__":
    main()
