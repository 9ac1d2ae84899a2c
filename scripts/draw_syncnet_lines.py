"""Sync-confidence chart CLI (ref:eval/draw_syncnet_lines.py): plot
confidence curves from eval_sync_conf JSONL outputs."""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--inputs", nargs="+", required=True,
                   help="JSONL files from scripts.eval_sync_conf")
    p.add_argument("--labels", nargs="*", default=None)
    p.add_argument("--out", default="syncnet_lines.png")
    args = p.parse_args()

    from latentsync_tpu.utils.observability import plot_loss_chart

    series = []
    for i, path in enumerate(args.inputs):
        confs = []
        with open(path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "confidence" in row:
                    confs.append(row["confidence"])
        label = (args.labels[i] if args.labels and i < len(args.labels)
                 else path)
        series.append((label, list(range(len(confs))), confs))
    plot_loss_chart(args.out, *series)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
