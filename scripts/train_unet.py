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
    p.add_argument("--syncnet-ckpt", default="",
                   help="frozen SyncNet torch checkpoint for the sync "
                        "loss (ref:scripts/train_unet.py:171-178); "
                        "random-init at matching config dims when absent")
    p.add_argument("--overfit", action="store_true",
                   help="memorization smoke: train on the FIRST batch "
                        "forever with a FIXED rng (same noise + "
                        "timesteps every step) — the eps-MSE must fall "
                        "well below the ~1.0 random-data plateau, which "
                        "makes the artifact's decreasing-loss check "
                        "falsifiable")
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

    # --- stage-2 loss stack (ref:scripts/train_unet.py:360-409): frozen
    # SyncNet cosine-BCE + LPIPS on the lower half + TREPA, all gated on
    # pixel-space supervision like the reference ---
    syncnet_params = None
    perceptual_fn = None
    trepa_fn = None
    if config.run.pixel_space_supervise:
        if config.run.use_syncnet:
            from latentsync_tpu.models.syncnet import StableSyncNet
            import math as _m

            syncnet = StableSyncNet(config.syncnet, dtype=jnp.bfloat16)
            mel_t = _m.ceil(f / 5 * 16)
            syncnet_params = fast_init(
                lambda v, a: syncnet.init(jax.random.PRNGKey(2), v, a),
                jnp.zeros((1, res // 2, res, f * 3)),
                jnp.zeros((1, 80, mel_t, 1)), seed=2,
            )
            if args.syncnet_ckpt and os.path.isfile(args.syncnet_ckpt):
                sd, _ = convert.load_torch_state_dict(args.syncnet_ckpt)
                syncnet_params = convert.merge_params(
                    syncnet_params, convert.convert_stable_syncnet(sd))
            syncnet_params = cast_floating(syncnet_params, jnp.bfloat16)
        if config.run.perceptual_loss_weight > 0:
            from latentsync_tpu.models.perceptual import LPIPS

            lpips = LPIPS(dtype=jnp.bfloat16)
            lpips_ckpt = os.environ.get("LATENTSYNC_LPIPS_CKPT", "")
            if lpips_ckpt and os.path.isfile(lpips_ckpt):
                from latentsync_tpu.models.perceptual import convert_lpips

                sd, _ = convert.load_torch_state_dict(lpips_ckpt)
                lpips_params = jax.tree.map(jnp.asarray, convert_lpips(sd))
            else:
                lpips_params = fast_init(
                    lambda a, b: lpips.init(jax.random.PRNGKey(3), a, b),
                    jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8, 8, 3)), seed=3)
            lpips_params = cast_floating(lpips_params, jnp.bfloat16)

            def perceptual_fn(x, y):
                # (B, F, H', W, 3) videos → frame batch
                bx, fx = x.shape[:2]
                fl = lambda v: v.reshape((bx * fx,) + v.shape[2:])
                return jnp.mean(lpips.apply(
                    lpips_params, fl(x).astype(jnp.bfloat16),
                    fl(y).astype(jnp.bfloat16)).astype(jnp.float32))
        if config.run.trepa_loss_weight > 0:
            from latentsync_tpu.models.videomae import TREPALoss, VideoViTConfig
            from latentsync_tpu.models.videomae import convert_videomae

            trepa_ckpt = os.environ.get("LATENTSYNC_VIDEOMAE_CKPT", "")
            if trepa_ckpt and os.path.isfile(trepa_ckpt):
                sd, _ = convert.load_torch_state_dict(trepa_ckpt)
                trepa_fn = TREPALoss(params=jax.tree.map(
                    jnp.asarray, convert_videomae(sd)),
                    config=VideoViTConfig.giant(), dtype=jnp.bfloat16)
            else:
                # random-init fallback (no release weights): a small
                # 64² ViT exercises the loss path at ~12× fewer tokens
                # than the 224² release geometry
                trepa_fn = TREPALoss(
                    config=VideoViTConfig(
                        img_size=64, patch_size=16, embed_dim=64,
                        depth=2, num_heads=4, mlp_ratio=4.0),
                    dtype=jnp.bfloat16)
    # frozen aux nets replicate over the mesh like the vae
    if syncnet_params is not None:
        syncnet_params = jax.tree.map(
            lambda x: jax.device_put(x, r_shard), syncnet_params)
    if perceptual_fn is not None:
        lpips_params = jax.tree.map(
            lambda x: jax.device_put(x, r_shard), lpips_params)
    if trepa_fn is not None:
        trepa_fn.params = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), r_shard), trepa_fn.params)

    # --- optimizer + step ---
    tx = trainer.make_optimizer(unet_params)
    opt_state = tx.init(unet_params)
    loss_fn, train_step = trainer.make_train_step(
        vae_params=vae_params, syncnet_params=syncnet_params,
        perceptual_fn=perceptual_fn, trepa_fn=trepa_fn)
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
            # Blanket replication is only correct while the mesh is
            # dp-only; model-parallel train state would need per-leaf
            # shardings derived from the restored params tree.
            assert dict(mesh.shape).get("model", 1) == 1, dict(mesh.shape)
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
    fixed_batch = None
    t0 = time.time()
    with mesh:
        for batch in loader:
            if args.overfit:
                if fixed_batch is None:
                    fixed_batch = batch
                batch = fixed_batch
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
            rng = (jax.random.PRNGKey(config.run.seed) if args.overfit
                   else jax.random.fold_in(
                       jax.random.PRNGKey(config.run.seed), global_step))
            unet_params, opt_state, metrics = step_jit(
                unet_params, opt_state, dev_batch, rng
            )
            global_step += 1
            if global_step % args.log_every == 0:
                loss = float(metrics["total"])
                losses.append((global_step, loss))
                dt = time.time() - t0
                rec = {"step": global_step, "loss": loss,
                       "steps_per_sec": args.log_every / dt}
                extra = {k: float(v) for k, v in metrics.items()
                         if k not in ("total", "recon")}
                if extra:
                    rec["loss_components"] = dict(
                        {"recon": float(metrics["recon"])}, **extra)
                print(json.dumps(rec))
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
