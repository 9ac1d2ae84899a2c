"""Replicate cog predictor (ref:predict.py, web-demos/replicate/):
thin wrapper exposing the pipeline as a Predictor with setup/predict."""

from __future__ import annotations

import argparse
import os
import tempfile


class Predictor:
    def setup(self, unet_ckpt: str = "checkpoints/latentsync_unet.pt",
              vae_ckpt: str = "checkpoints/sd-vae-ft-mse.pt",
              whisper_ckpt: str = "checkpoints/whisper/tiny.pt",
              unet_config: str = ""):
        from scripts.inference import build_pipeline

        args = argparse.Namespace(
            unet_config=unet_config, unet_ckpt=unet_ckpt,
            vae_ckpt=vae_ckpt, whisper_ckpt=whisper_ckpt,
        )
        self.pipeline = build_pipeline(args)

    def predict(self, video: str, audio: str, guidance_scale: float = 1.5,
                inference_steps: int = 20, seed: int = 1247) -> str:
        out = os.path.join(tempfile.mkdtemp(), "out.mp4")
        result = self.pipeline(
            video_path=video, audio_path=audio, video_out_path=out,
            guidance_scale=guidance_scale,
            num_inference_steps=inference_steps, seed=seed,
        )
        return result.video_path
