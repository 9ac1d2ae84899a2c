"""Avatar onboarding: video → precomputed affine bundle
(ref:scripts/prepare_video.py:11-47).

python -m scripts.prepare_video --video avatar.mp4 --avatar-id alice \
    --store /data/avatars
"""

from __future__ import annotations

import argparse
import os
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--avatar-id", required=True)
    p.add_argument("--store", default="/tmp/avatars")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--vae-ckpt", default=None,
                   help="also precompute the avatar's VAE latents "
                        "(masked+reference) so request-time prepare() "
                        "skips the encode stage entirely")
    args = p.parse_args()

    from latentsync_tpu.serving.artifacts import generate_affine_bundle
    from latentsync_tpu.utils.image_processor import ImageProcessor

    os.makedirs(args.store, exist_ok=True)
    video_dst = os.path.join(args.store, args.avatar_id + ".mp4")
    if os.path.abspath(args.video) != os.path.abspath(video_dst):
        shutil.copy(args.video, video_dst)

    processor = ImageProcessor(args.resolution)
    bundle = generate_affine_bundle(
        processor, video_dst, os.path.join(args.store, args.avatar_id + ".npz")
    )
    print(f"avatar ready: {video_dst} bundle: {bundle}")

    if args.vae_ckpt:
        import jax
        import jax.numpy as jnp

        from latentsync_tpu.audio.features import Audio2Feature
        from latentsync_tpu.config import LatentSyncConfig, WhisperConfig
        from latentsync_tpu.models.vae import AutoencoderKL
        from latentsync_tpu.pipelines.lipsync import LipsyncPipeline
        from latentsync_tpu.utils.convert import convert_vae, load_torch_state_dict
        from latentsync_tpu.utils.params import UNET_ZERO_PATHS, cast_floating, fast_init

        cfg = LatentSyncConfig()
        vae_params = cast_floating(
            convert_vae(load_torch_state_dict(args.vae_ckpt)[0]), jnp.bfloat16)
        from latentsync_tpu.models.unet3d import UNet3DConditionModel

        unet = UNet3DConditionModel(cfg.unet, dtype=jnp.bfloat16)
        unet_params = cast_floating(fast_init(
            lambda s, t, a: unet.init(jax.random.PRNGKey(0), s, t, a),
            jnp.zeros((1, 16, 32, 32, cfg.unet.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 16, 50, cfg.unet.cross_attention_dim)),
            zero_paths=UNET_ZERO_PATHS), jnp.bfloat16)
        pipe = LipsyncPipeline(
            unet_params, vae_params,
            audio_encoder=Audio2Feature(WhisperConfig.tiny()), config=cfg)
        lat = pipe.precompute_avatar_latents(bundle, height=args.resolution)
        print(f"latents precomputed: {lat}")


if __name__ == "__main__":
    main()
