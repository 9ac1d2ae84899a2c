"""Serving CLI (ref:scripts/api.py): load the pipeline once, serve HTTP.

python -m scripts.api --avatars /data/avatars [--port 8000] [ckpt flags]
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--avatars", required=True)
    p.add_argument("--out-dir", default="/tmp/lipsync_out")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--unet-config", default="")
    p.add_argument("--unet-ckpt", default="checkpoints/latentsync_unet.pt")
    p.add_argument("--vae-ckpt", default="checkpoints/sd-vae-ft-mse.pt")
    p.add_argument("--whisper-ckpt", default="checkpoints/whisper/tiny.pt")
    args = p.parse_args()

    from latentsync_tpu.serving.api import serve
    from latentsync_tpu.serving.artifacts import AvatarStore

    from .inference import build_pipeline

    pipeline = build_pipeline(args)
    serve(pipeline, AvatarStore(args.avatars), out_dir=args.out_dir,
          host=args.host, port=args.port)


if __name__ == "__main__":
    main()
