"""Data-processing pipeline CLI (ref:data_processing_pipeline.sh →
preprocess/data_processing_pipeline.py).

python -m scripts.data_processing_pipeline --input raw_videos/ --output data/
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--fileslist", default="")
    p.add_argument("--with-quality-gate", action="store_true",
                   help="enable the HyperIQA visual-quality stage")
    p.add_argument("--min-sync-conf", type=float, default=3.0,
                   help="SyncNet confidence gate (ref README.md:148)")
    p.add_argument("--max-av-offset", type=int, default=6)
    p.add_argument("--min-iqa", type=float, default=40.0)
    args = p.parse_args()

    from latentsync_tpu.preprocess.pipeline import (
        DataProcessingPipeline,
        write_fileslist,
    )

    scorer = None
    if args.with_quality_gate:
        from latentsync_tpu.models.hyper_iqa import HyperIQAScorer

        scorer = HyperIQAScorer()

    pipe = DataProcessingPipeline(
        output_root=args.output, resolution=args.resolution,
        quality_scorer=scorer, min_sync_conf=args.min_sync_conf,
        max_av_offset=args.max_av_offset, min_iqa=args.min_iqa,
    )
    files = pipe.run(args.input)
    if args.fileslist:
        write_fileslist(files, args.fileslist)
        print(f"wrote {len(files)} paths to {args.fileslist}")


if __name__ == "__main__":
    main()
