"""Distributed UNet training CLI (ref:scripts/train_unet.py:60-517).

python -m scripts.train_unet --config configs/unet_stage2.yaml

Data-parallel over all local devices via one Mesh; gradients sync through
XLA's psum (no DDP/NCCL plumbing). Validation runs the full inference
pipeline on the configured demo pair and scores it with the frozen
SyncNet evaluator, mirroring ref:train_unet.py:459-494.
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
    p.add_argument("--output-dir", default="debug/unet")
    p.add_argument("--unet-ckpt", default="")
    p.add_argument("--vae-ckpt", default="")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--resume", action="store_true",
                   help="restore the latest Orbax checkpoint in "
                        "--output-dir (params + optimizer state + step) "
                        "and continue — the reference restarts from torch "
                        "weights only (ref:scripts/train_unet.py:131-143); "
                        "here optimizer state survives too")
    args = p.parse_args()

    from latentsync_tpu.config import LatentSyncConfig, load_unet_config
    from latentsync_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from latentsync_tpu.training.data import HostDataLoader, UNetSampleSource
    from latentsync_tpu.training.unet_trainer import UNetTrainer
    from latentsync_tpu.utils import convert
    from latentsync_tpu.utils.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from latentsync_tpu.utils.params import UNET_ZERO_PATHS, cast_floating, fast_init

    config = load_unet_config(args.config) if args.config else LatentSyncConfig()
    os.makedirs(args.output_dir, exist_ok=True)

    trainer = UNetTrainer(config)
    f = config.data.num_frames
    res = config.data.resolution
    lat = res // config.vae.scale_factor

    # --- params ---
    unet_init = fast_init(
        lambda s, t, a: trainer.unet.init(jax.random.PRNGKey(0), s, t, a),
        jnp.zeros((1, f, lat, lat, config.unet.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, f, 50, config.unet.cross_attention_dim)),
        zero_paths=UNET_ZERO_PATHS,
    )
    global_step = 0
    if args.unet_ckpt and os.path.isfile(args.unet_ckpt):
        sd, global_step = convert.load_torch_state_dict(args.unet_ckpt)
        loaded = convert.convert_unet(
            sd, config.unet.in_channels, config.unet.out_channels,
            config.unet.cross_attention_dim,
        )
        unet_params = convert.merge_params(unet_init, loaded)
    else:
        unet_params = unet_init
    if args.vae_ckpt and os.path.isfile(args.vae_ckpt):
        sd, _ = convert.load_torch_state_dict(args.vae_ckpt)
        vae_params = jax.tree.map(jnp.asarray, convert.convert_vae(sd))
    else:
        vae_params = fast_init(
            lambda x: trainer.vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1)),
            jnp.zeros((1, res, res, 3)), seed=1,
        )
    vae_params = cast_floating(vae_params, jnp.bfloat16)

    # --- mesh + sharding ---
    # data-parallel degree must divide the global batch
    import math as _math

    batch = max(config.data.batch_size, 1)
    dp = _math.gcd(batch, len(jax.devices()))
    mesh = make_mesh(n_devices=dp, model_parallel=1)
    b_shard = batch_sharding(mesh)
    r_shard = replicated(mesh)
    unet_params = jax.tree.map(lambda x: jax.device_put(x, r_shard), unet_params)
    vae_params = jax.tree.map(lambda x: jax.device_put(x, r_shard), vae_params)

    # --- optimizer + step ---
    tx = trainer.make_optimizer(unet_params)
    opt_state = tx.init(unet_params)
    loss_fn, train_step = trainer.make_train_step(vae_params=vae_params)
    step_jit = jax.jit(lambda p, o, b, r: train_step(p, o, b, r, tx))

    if args.resume:
        ckpt = latest_checkpoint(args.output_dir)
        if ckpt:
            restored = restore_checkpoint(
                ckpt, {"params": unet_params, "opt_state": opt_state})
            unet_params = jax.tree.map(
                lambda x, t: jax.device_put(jnp.asarray(x), t.sharding),
                restored["params"], unet_params)
            # NOT t.sharding: tx.init runs eagerly, so leaves it creates
            # ex nihilo (e.g. adam's count) sit committed on device 0 —
            # restoring onto that sharding clashes with the mesh-wide
            # params inside jit. All train state is replicated under dp.
            opt_state = jax.tree.map(
                lambda x: jax.device_put(jnp.asarray(x), r_shard),
                restored["opt_state"])
            global_step = int(os.path.basename(ckpt).split("_")[-1])
            print(json.dumps({"resumed_from": ckpt, "step": global_step}))

    # --- data ---
    source = UNetSampleSource(config, seed=config.run.seed)
    loader = HostDataLoader(source, batch_size=max(config.data.batch_size, 1))

    max_steps = args.max_steps or config.run.max_train_steps
    losses = []
    val_confs = []
    t0 = time.time()
    with mesh:
        for batch in loader:
            dev_batch = {
                k: jax.device_put(jnp.asarray(v), b_shard)
                for k, v in batch.items()
                if k in ("gt_pixels", "masked_pixels", "ref_pixels", "masks", "mel")
            }
            # audio embeds come from the whisper cache in full training;
            # zero-conditioned when absent
            if "audio_embeds" not in dev_batch:
                b = dev_batch["gt_pixels"].shape[0]
                dev_batch["audio_embeds"] = jax.device_put(
                    jnp.zeros((b, f, 50, config.unet.cross_attention_dim)), b_shard
                )
            rng = jax.random.fold_in(jax.random.PRNGKey(config.run.seed), global_step)
            unet_params, opt_state, metrics = step_jit(
                unet_params, opt_state, dev_batch, rng
            )
            global_step += 1
            if global_step % args.log_every == 0:
                loss = float(metrics["total"])
                losses.append((global_step, loss))
                dt = time.time() - t0
                print(json.dumps({"step": global_step, "loss": loss,
                                  "steps_per_sec": args.log_every / dt}))
                t0 = time.time()
            if global_step % config.run.save_ckpt_steps == 0:
                save_checkpoint(args.output_dir, global_step, unet_params, opt_state)
                conf = run_validation(unet_params, vae_params, config,
                                      args.output_dir, global_step)
                if conf is not None:
                    val_confs.append((global_step, conf))
            if global_step >= max_steps:
                break
    loader.close()
    save_checkpoint(args.output_dir, global_step, unet_params, opt_state)
    if losses or val_confs:
        try:
            from latentsync_tpu.utils.observability import plot_loss_chart

            series = [("train_loss", [s for s, _ in losses],
                       [v for _, v in losses])]
            if val_confs:
                series.append(("val_sync_conf", [s for s, _ in val_confs],
                               [v for _, v in val_confs]))
            plot_loss_chart(os.path.join(args.output_dir, "loss_chart.png"),
                            *series)
        except Exception as e:  # noqa: BLE001 — charting is best-effort
            print(f"loss chart failed: {e}")


def run_validation(unet_params, vae_params, config, output_dir, step):
    """Validation-during-training (ref:scripts/train_unet.py:459-494):
    run the FULL inference pipeline on the fixed val pair every
    checkpoint and score it with the frozen SyncNet evaluator. Skipped
    silently when val assets are absent (smoke/CI runs)."""
    vp, ap = config.data.val_video_path, config.data.val_audio_path
    if not (vp and ap and os.path.isfile(vp) and os.path.isfile(ap)):
        return None
    try:
        from latentsync_tpu.audio.features import Audio2Feature
        from latentsync_tpu.config import WhisperConfig
        from latentsync_tpu.pipelines.lipsync import LipsyncPipeline

        cad = config.unet.cross_attention_dim
        if cad == 384:
            wcfg = WhisperConfig.tiny()
        elif cad == 768:
            wcfg = WhisperConfig.small()
        else:  # non-release dims (smoke configs): match the UNet's
            wcfg = WhisperConfig(n_audio_state=cad,
                                 n_audio_head=max(1, cad // 8),
                                 n_audio_layer=1)
        pipe = LipsyncPipeline(
            unet_params, vae_params,
            audio_encoder=Audio2Feature(wcfg), config=config,
        )
        out_dir = os.path.join(output_dir, "val_videos")
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, f"step_{step:08d}.mp4")
        pipe(video_path=vp, audio_path=ap, video_out_path=out,
             num_inference_steps=config.run.inference_steps,
             guidance_scale=config.run.guidance_scale,
             seed=config.run.seed)
        conf = None
        try:
            from latentsync_tpu.eval.sync_eval import SyncNetEvaluator

            _, _, conf = SyncNetEvaluator().evaluate(out)
            conf = float(conf)
        except Exception as e:  # noqa: BLE001 — scoring needs weights
            print(f"val sync scoring skipped: {e}")
        print(json.dumps({"val_step": step, "val_video": out,
                          "val_sync_conf": conf}))
        return conf
    except Exception as e:  # noqa: BLE001 — validation must not kill training
        print(f"validation failed at step {step}: {e}")
        return None


if __name__ == "__main__":
    main()
