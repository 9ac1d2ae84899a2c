"""Batch inference over a fileslist (ref:eval/inference_videos.py):
run lip-sync on (video, audio) pairs and optionally score each output."""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pairs", required=True,
                   help="file with lines: video_path<TAB>audio_path")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--score", action="store_true")
    p.add_argument("--unet-config", default="")
    p.add_argument("--unet-ckpt", default="checkpoints/latentsync_unet.pt")
    p.add_argument("--vae-ckpt", default="checkpoints/sd-vae-ft-mse.pt")
    p.add_argument("--whisper-ckpt", default="checkpoints/whisper/tiny.pt")
    args = p.parse_args()

    from .inference import build_pipeline

    pipe = build_pipeline(args)
    os.makedirs(args.out_dir, exist_ok=True)

    evaluator = None
    if args.score:
        from latentsync_tpu.eval.sync_eval import SyncNetEvaluator

        evaluator = SyncNetEvaluator()

    with open(args.pairs) as f:
        pairs = [line.rstrip().split("\t") for line in f if line.strip()]

    results = []
    for video, audio in pairs:
        out = os.path.join(args.out_dir, os.path.basename(video))
        r = pipe(video_path=video, audio_path=audio, video_out_path=out)
        row = {"video": video, "out": r.video_path, "frames": r.num_frames}
        if evaluator is not None:
            offset, min_dist, conf = evaluator.evaluate(r.video_path)
            row.update(av_offset=offset, confidence=round(conf, 4))
        results.append(row)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
