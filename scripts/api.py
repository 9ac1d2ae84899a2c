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
    p.add_argument("--continuous-batching", action="store_true",
                   help="share denoise batches across concurrent clips")
    p.add_argument("--batch-windows", type=int, default=8)
    p.add_argument("--workers", type=int, default=2)
    args = p.parse_args()

    from http.server import ThreadingHTTPServer

    from latentsync_tpu.serving.api import ServingState, make_handler
    from latentsync_tpu.serving.artifacts import AvatarStore

    from .inference import build_pipeline

    pipeline = build_pipeline(args)
    state = ServingState(
        pipeline, AvatarStore(args.avatars), args.out_dir,
        continuous_batching=args.continuous_batching,
        batch_windows=args.batch_windows, num_workers=args.workers,
    )
    server = ThreadingHTTPServer((args.host, args.port), make_handler(state))
    print(f"serving on {args.host}:{args.port} "
          f"(continuous_batching={args.continuous_batching})")
    server.serve_forever()


if __name__ == "__main__":
    main()
