"""SyncNet training CLI (ref:scripts/train_syncnet.py:39-262).

python -m scripts.train_syncnet --config configs/syncnet.yaml
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="")
    p.add_argument("--max-steps", type=int, default=0)
    p.add_argument("--output-dir", default="debug/syncnet")
    p.add_argument("--validation-steps", type=int, default=2500)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--resume", action="store_true",
                   help="restore the latest Orbax checkpoint in "
                        "--output-dir (params + optimizer state + loss "
                        "history + step) and continue")
    args = p.parse_args()

    from latentsync_tpu.config import LatentSyncConfig, load_config
    from latentsync_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from latentsync_tpu.training.data import HostDataLoader, SyncNetSampleSource
    from latentsync_tpu.training.syncnet_trainer import SyncNetTrainer
    from latentsync_tpu.utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from latentsync_tpu.utils.observability import plot_loss_chart

    config = load_config(args.config) if args.config else LatentSyncConfig()
    os.makedirs(args.output_dir, exist_ok=True)

    trainer = SyncNetTrainer(config)
    res = config.data.resolution
    f = config.data.num_frames
    import math

    mel_t = math.ceil(f / 5 * 16)
    params = trainer.init_params(
        jax.random.PRNGKey(0),
        (1, res // 2, res, f * 3),
        (1, 80, mel_t, 1),
    )
    tx = trainer.make_optimizer()
    opt_state = tx.init(params)
    loss_fn, train_step, eval_step = trainer.make_step_fns(tx)

    import math as _math

    dp = _math.gcd(max(config.data.batch_size, 1), len(jax.devices()))
    mesh = make_mesh(n_devices=dp, model_parallel=1)
    b_shard = batch_sharding(mesh)
    params = jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), params)

    source = SyncNetSampleSource(config, seed=config.run.seed)
    loader = HostDataLoader(source, batch_size=max(config.data.batch_size, 1))

    # held-out validation source (ref:configs/syncnet/*.yaml val_fileslist,
    # ref:train_syncnet.py:238-252); falls back to the current train
    # batch when no val list is configured
    val_source = None
    if getattr(config.data, "val_fileslist", ""):
        from latentsync_tpu.training.data import load_fileslist

        val_paths = load_fileslist(config.data.val_fileslist,
                                   config.data.train_data_dir)
        if val_paths:
            val_source = SyncNetSampleSource(
                config, video_paths=val_paths, seed=config.run.seed + 1)

    max_steps = args.max_steps or config.run.max_train_steps
    train_hist, val_hist = [], []
    step = 0
    if args.resume:
        ckpt = latest_checkpoint(args.output_dir)
        if ckpt:
            restored = restore_checkpoint(
                ckpt, {"params": params, "opt_state": opt_state})
            params = jax.tree.map(
                lambda x, t: jax.device_put(jnp.asarray(x), t.sharding),
                restored["params"], params)
            # NOT t.sharding: the eager tx.init template has ex-nihilo
            # leaves (adam count) committed to device 0, clashing with
            # mesh-replicated params inside jit (see train_unet.py).
            # Blanket replication is only correct while the train state
            # is dp-only; a model-parallel mesh would need per-leaf
            # shardings derived from the restored params tree.
            assert dict(mesh.shape).get("model", 1) == 1, dict(mesh.shape)
            opt_state = jax.tree.map(
                lambda x: jax.device_put(jnp.asarray(x), replicated(mesh)),
                restored["opt_state"])
            aux = restored.get("aux", {})
            train_hist = [tuple(r) for r in
                          np.asarray(aux.get("train_hist", [])).tolist()]
            val_hist = [tuple(r) for r in
                        np.asarray(aux.get("val_hist", [])).tolist()]
            step = int(os.path.basename(ckpt).split("_")[-1])
            print(json.dumps({"resumed_from": ckpt, "step": step}))
    t0 = time.time()
    with mesh:
        for batch in loader:
            dev = {k: jax.device_put(jnp.asarray(v), b_shard) for k, v in batch.items()}
            params, opt_state, metrics = train_step(params, opt_state, dev)
            step += 1
            if step % args.log_every == 0:
                loss = float(metrics["loss"])
                train_hist.append((step, loss))
                print(json.dumps({"step": step, "loss": loss,
                                  "sat_frac": float(metrics["sat_frac"]),
                                  "steps_per_sec": args.log_every / (time.time() - t0)}))
                t0 = time.time()
            if step % args.validation_steps == 0:
                if val_source is not None:
                    vb = [val_source.sample() for _ in
                          range(max(config.data.batch_size, 1))]
                    vdev = {k: jax.device_put(
                        jnp.asarray(np.stack([s[k] for s in vb])), b_shard)
                        for k in vb[0]}
                else:
                    vdev = dev
                vloss, vacc = eval_step(params, vdev)
                val_hist.append((step, float(vloss)))
                plot_loss_chart(
                    os.path.join(args.output_dir, "loss_chart.png"),
                    ("train", [s for s, _ in train_hist], [l for _, l in train_hist]),
                    ("val", [s for s, _ in val_hist], [l for _, l in val_hist]),
                )
                save_checkpoint(args.output_dir, step, params, opt_state,
                                aux={"train_hist": train_hist, "val_hist": val_hist})
            if step >= max_steps:
                break
    loader.close()
    save_checkpoint(args.output_dir, step, params, opt_state,
                    aux={"train_hist": train_hist, "val_hist": val_hist})


if __name__ == "__main__":
    main()
