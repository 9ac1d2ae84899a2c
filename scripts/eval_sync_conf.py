"""Sync-confidence CLI (ref:eval/eval_sync_conf.py, eval_sync_conf.sh).

python -m scripts.eval_sync_conf --video out.mp4 [--dir videos/]
    [--syncnet-ckpt sfd/syncnet_v2.model]
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", default="")
    p.add_argument("--dir", default="")
    p.add_argument("--syncnet-ckpt", default="checkpoints/auxiliary/syncnet_v2.model")
    args = p.parse_args()

    from latentsync_tpu.eval.sync_eval import SyncNetEvaluator

    params = None
    if os.path.isfile(args.syncnet_ckpt):
        from latentsync_tpu.utils.convert_eval import convert_syncnet_s
        from latentsync_tpu.utils.convert import load_torch_state_dict
        import jax, jax.numpy as jnp

        sd, _ = load_torch_state_dict(args.syncnet_ckpt)
        params = jax.tree.map(jnp.asarray, convert_syncnet_s(sd))
    evaluator = SyncNetEvaluator(params)

    videos = []
    if args.video:
        videos.append(args.video)
    if args.dir:
        videos.extend(
            os.path.join(args.dir, f) for f in sorted(os.listdir(args.dir))
            if f.endswith(".mp4")
        )
    confs = []
    for v in videos:
        offset, min_dist, conf = evaluator.evaluate(v)
        confs.append(conf)
        print(json.dumps({"video": v, "av_offset": offset,
                          "min_dist": round(min_dist, 4),
                          "confidence": round(conf, 4)}))
    if len(confs) > 1:
        print(json.dumps({"mean_confidence": sum(confs) / len(confs)}))


if __name__ == "__main__":
    main()
