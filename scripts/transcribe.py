"""Transcription CLI: audio → word-timestamp JSON (and optional VTT).

In-repo replacement for the reference's external whisper CLI invocation
(ref:latentsync/utils/whisper.py:6-33, job-queue-listener/src/helpers/
whisper.ts:15-40): produces the same {"segments": [{start, end, text,
words: [{word, start, end}]}]} structure the worker helpers consume.

Requires converted whisper weights ($LATENTSYNC_WHISPER_CKPT) and the
vocab directory ($LATENTSYNC_WHISPER_VOCAB) — see docs/weights.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--audio", required=True)
    p.add_argument("--out", help="output JSON path (default: stdout)")
    p.add_argument("--vtt", help="also write a WEBVTT subtitle file here")
    p.add_argument("--language", default="en")
    p.add_argument("--model", default="tiny", choices=["tiny", "small"])
    args = p.parse_args()

    from latentsync_tpu.audio.transcribe import make_transcriber
    from latentsync_tpu.config import WhisperConfig

    cfg = WhisperConfig.tiny() if args.model == "tiny" else WhisperConfig.small()
    transcriber = make_transcriber(cfg, language=args.language)
    segments = transcriber(args.audio)
    doc = {"segments": segments}
    out = json.dumps(doc, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    else:
        print(out)

    if args.vtt:
        from latentsync_tpu.serving.helpers import (
            add_line_breaks_to_vtt,
            segments_to_vtt,
        )

        with open(args.vtt, "w") as f:
            f.write(add_line_breaks_to_vtt(segments_to_vtt(segments)))


if __name__ == "__main__":
    main()
