"""StableSyncNet accuracy CLI (ref:eval/eval_syncnet_acc.py:13-118):
threshold cos-sim ≥ 0.5 over a validation set."""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="")
    p.add_argument("--fileslist", default="")
    p.add_argument("--data-dir", default="")
    p.add_argument("--num-samples", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=16)
    args = p.parse_args()

    import jax
    import numpy as np

    from latentsync_tpu.config import LatentSyncConfig, load_config
    from latentsync_tpu.training.data import SyncNetSampleSource
    from latentsync_tpu.training.syncnet_trainer import SyncNetTrainer

    config = load_config(args.config) if args.config else LatentSyncConfig()
    if args.fileslist or args.data_dir:
        import dataclasses

        config = dataclasses.replace(
            config, data=dataclasses.replace(
                config.data, train_fileslist=args.fileslist,
                train_data_dir=args.data_dir,
            )
        )
    trainer = SyncNetTrainer(config)
    import math

    res = config.data.resolution
    f = config.data.num_frames
    mel_t = math.ceil(f / 5 * 16)
    params = trainer.init_params(
        jax.random.PRNGKey(0), (1, res // 2, res, f * 3), (1, 80, mel_t, 1)
    )
    tx = trainer.make_optimizer()
    _, _, eval_step = trainer.make_step_fns(tx)

    source = SyncNetSampleSource(config)
    import jax.numpy as jnp

    correct = total = 0
    losses = []
    for _ in range(args.num_samples // args.batch_size):
        samples = [source.sample() for _ in range(args.batch_size)]
        batch = {k: jnp.asarray(np.stack([s[k] for s in samples]))
                 for k in ("vision", "mel", "y")}
        loss, acc = eval_step(params, batch)
        losses.append(float(loss))
        correct += float(acc) * args.batch_size
        total += args.batch_size
    print(json.dumps({"accuracy": correct / max(total, 1),
                      "loss": sum(losses) / max(len(losses), 1),
                      "samples": total}))


if __name__ == "__main__":
    main()
