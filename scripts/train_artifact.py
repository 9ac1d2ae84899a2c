"""End-to-end training artifact: prove the FULL CLI loop — data → jitted
step → Orbax checkpoint → resume → validation inference — in real
processes on the virtual device mesh, and record the evidence as
TRAIN_r{N}.json (VERDICT r3 next #6).

Synthesizes tiny clips (cv2 + scipy sidecar wav), writes tiny YAML
configs, then drives `scripts.train_unet` and `scripts.train_syncnet`
as subprocesses on an 8-virtual-CPU-device mesh:

    python -m scripts.train_artifact --out TRAIN_r04.json

Checks: loss decreasing over the run (first-third mean vs last-third
mean), a step checkpoint on disk, `--resume` restoring params+opt_state
+step and continuing, and the UNet validation hook producing a scored
inference video (ref:scripts/train_unet.py:459-494 runs the same
validation inside training).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synthesize_clips(out_dir: str, n: int = 3, frames: int = 60,
                     size=(96, 80), fps: int = 25) -> list:
    """Moving-blob clips + sine-sweep sidecar wavs (the no-ffmpeg media
    backend reads audio from the sidecar)."""
    import cv2
    from scipy.io import wavfile

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    rng = np.random.default_rng(0)
    h, w = size
    for i in range(n):
        path = os.path.join(out_dir, f"clip_{i}.mp4")
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
        base = rng.integers(40, 200, (h, w, 3)).astype(np.uint8)
        for t in range(frames):
            img = base.copy()
            cx = int(w / 2 + (w / 4) * np.sin(2 * np.pi * t / frames + i))
            cy = int(h / 2 + (h / 4) * np.cos(2 * np.pi * t / frames))
            cv2.circle(img, (cx, cy), 12, (230, 180, 60), -1)
            cv2.ellipse(img, (w // 2, 2 * h // 3),
                        (10, 4 + (t % 5)), 0, 0, 360, (40, 30, 150), -1)
            wr.write(img)
        wr.release()
        dur = frames / fps
        ts = np.linspace(0, dur, int(16000 * dur), endpoint=False)
        tone = 0.3 * np.sin(2 * np.pi * (220 + 40 * i + 100 * ts) * ts)
        wavfile.write(os.path.splitext(path)[0] + ".wav", 16000,
                      (tone * 32767).astype(np.int16))
        paths.append(path)
    return paths


UNET_CFG = """
model:
  block_out_channels: [32, 64, 64, 64]
  layers_per_block: 1
  norm_num_groups: 8
  cross_attention_dim: 16
  attention_head_dim: 4
  motion_module:
    num_attention_heads: 4
    num_transformer_block: 1
vae:
  block_out_channels: [16, 32, 32, 32]
  layers_per_block: 1
  norm_num_groups: 8
data:
  num_frames: 4
  resolution: 64
  batch_size: 4
  train_data_dir: {data_dir}
  val_video_path: {val_video}
  val_audio_path: {val_audio}
run:
  pixel_space_supervise: false
  use_syncnet: false
  save_ckpt_steps: 25
  inference_steps: 3
  lr: 1.0e-3
  # from-scratch smoke: conv_out is zero-init (UNET_ZERO_PATHS), so the
  # reference trainable set (motion + attention) alone has ZERO gradient
  # (output is 0 independent of those params — stage 2 presumes stage-1
  # weights). conv_out must train for the loop to be live.
  trainable_modules: ["motion_modules.", "attentions.", "conv_out"]
"""

# memorization smoke: ALL params trainable + fixed batch/noise via
# --overfit; the eps-MSE must fall decisively below the ~1.0 plateau an
# eps-predictor sits at on ever-fresh random data — this makes the
# decreasing-loss check falsifiable (VERDICT r4 weak #1a)
UNET_OVERFIT_CFG = """
model:
  block_out_channels: [32, 64, 64, 64]
  layers_per_block: 1
  norm_num_groups: 8
  cross_attention_dim: 16
  attention_head_dim: 4
  motion_module:
    num_attention_heads: 4
    num_transformer_block: 1
vae:
  block_out_channels: [16, 32, 32, 32]
  layers_per_block: 1
  norm_num_groups: 8
data:
  num_frames: 4
  resolution: 64
  batch_size: 4
  train_data_dir: {data_dir}
run:
  pixel_space_supervise: false
  use_syncnet: false
  use_mixed_noise: false
  save_ckpt_steps: 100000
  trainable_modules: []
  lr: 2.0e-3
"""

# FULL stage-2 loss stack at tiny scale (ref:scripts/train_unet.py:360-409):
# eps-MSE + pixel-space decode + LPIPS (lower half) + TREPA + frozen
# SyncNet cosine-BCE, all through the CLI (VERDICT r4 weak #1c). f=16 so
# the mel window is the reference (80, 52) geometry.
UNET_FULLSTACK_CFG = """
model:
  block_out_channels: [16, 32, 32, 32]
  layers_per_block: 1
  norm_num_groups: 8
  cross_attention_dim: 16
  attention_head_dim: 4
  motion_module:
    num_attention_heads: 4
    num_transformer_block: 1
syncnet:
  audio_encoder:
    in_channels: 1
    block_out_channels: [4, 4, 8, 8, 16, 16, 128]
    downsample_factors: [[2, 1], 2, 2, 1, 2, 2, [2, 3]]
    attn_blocks: [0, 0, 0, 1, 1, 0, 0]
  visual_encoder:
    in_channels: 48
    block_out_channels: [4, 4, 8, 8, 16, 128]
    downsample_factors: [[1, 2], 2, 2, 2, 2, 2]
    attn_blocks: [0, 0, 0, 0, 1, 0]
vae:
  block_out_channels: [16, 32, 32, 32]
  layers_per_block: 1
  norm_num_groups: 8
data:
  num_frames: 16
  resolution: 64
  batch_size: 2
  train_data_dir: {data_dir}
run:
  pixel_space_supervise: true
  use_syncnet: true
  perceptual_loss_weight: 0.1
  trepa_loss_weight: 1.0
  sync_loss_weight: 0.05
  save_ckpt_steps: 100000
  lr: 1.0e-3
  # see UNET_CFG: zero-init conv_out must train from scratch
  trainable_modules: ["motion_modules.", "attentions.", "conv_out"]
"""

SYNCNET_CFG = """
syncnet:
  audio_encoder:
    in_channels: 1
    block_out_channels: [4, 4, 8, 8, 16, 16, 128]
    downsample_factors: [[2, 1], 2, 2, 1, 2, 2, [2, 3]]
    attn_blocks: [0, 0, 0, 1, 1, 0, 0]
  visual_encoder:
    in_channels: 48
    block_out_channels: [4, 4, 8, 8, 16, 16, 32, 128]
    downsample_factors: [[1, 2], 2, 2, 2, 2, 2, 2, 2]
    attn_blocks: [0, 0, 0, 0, 1, 1, 0, 0]
vae:
  block_out_channels: [16, 32, 32, 32]
  layers_per_block: 1
  norm_num_groups: 8
data:
  num_frames: 16
  resolution: 256
  batch_size: 4
  train_data_dir: {data_dir}
run:
  lr: 1.0e-3
  save_ckpt_steps: 100000
"""


def run_cli(module: str, argv: list, n_devices: int = 8):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_devices}"
                        ).strip()
    # the axon sitecustomize pins jax_platforms back to the TPU tunnel;
    # only a jax.config.update BEFORE backend init actually forces CPU
    shim = (
        "import jax, runpy, sys; "
        "jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = ['{module}'] + sys.argv[1:]; "
        f"runpy.run_module('{module}', run_name='__main__')"
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", shim, *argv],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(
            f"{module} {argv} failed rc={proc.returncode}:\n"
            f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}")
    records = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                records.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return records, time.time() - t0


def loss_series(records):
    return [(r["step"], r["loss"]) for r in records if "loss" in r]


def decreasing(series):
    """First-third mean vs last-third mean — robust to step noise."""
    if len(series) < 3:
        return False
    vals = [v for _, v in series]
    k = max(1, len(vals) // 3)
    return float(np.mean(vals[-k:])) < float(np.mean(vals[:k]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="TRAIN_r05.json")
    p.add_argument("--workdir", default="/tmp/train_artifact")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--resume-steps", type=int, default=10)
    p.add_argument("--overfit-steps", type=int, default=45)
    p.add_argument("--fullstack-steps", type=int, default=4)
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    data_dir = os.path.join(args.workdir, "data")
    clips = synthesize_clips(data_dir)

    report = {"steps": args.steps, "resume_steps": args.resume_steps,
              "n_devices": 8}

    # ---- UNet ----
    unet_cfg = os.path.join(args.workdir, "unet_tiny.yaml")
    with open(unet_cfg, "w") as f:
        f.write(UNET_CFG.format(
            data_dir=data_dir, val_video=clips[0],
            val_audio=os.path.splitext(clips[0])[0] + ".wav"))
    unet_out = os.path.join(args.workdir, "unet_run")
    recs, dt = run_cli("scripts.train_unet", [
        "--config", unet_cfg, "--max-steps", str(args.steps),
        "--output-dir", unet_out, "--log-every", "5"])
    series = loss_series(recs)
    vals = [r for r in recs if "val_step" in r]
    ckpts = sorted(d for d in os.listdir(unet_out) if d.startswith("step_"))
    r_recs, r_dt = run_cli("scripts.train_unet", [
        "--config", unet_cfg, "--max-steps",
        str(args.steps + args.resume_steps), "--output-dir", unet_out,
        "--log-every", "5", "--resume"])
    resumed = [r for r in r_recs if "resumed_from" in r]
    r_series = loss_series(r_recs)
    report["unet"] = {
        "wall_s": round(dt, 1), "loss": series,
        "loss_decreasing": decreasing(series),
        "checkpoints": ckpts,
        "validations": vals,
        "resume": {"wall_s": round(r_dt, 1),
                   "resumed_from": resumed[0] if resumed else None,
                   "loss": r_series},
    }
    assert ckpts, "no UNet checkpoint written"
    assert resumed and resumed[0]["step"] >= args.steps, resumed
    assert r_series and r_series[-1][0] > args.steps, r_series
    assert vals, "validation hook never ran"

    # the two checkpoint validations must have produced genuinely
    # different videos — params changed between step 25 and 50, so a
    # bit-identical pair means validation isn't consuming the updated
    # params (VERDICT r4 weak #1b)
    val_videos = sorted(
        os.path.join(unet_out, "val_videos", fn)
        for fn in os.listdir(os.path.join(unet_out, "val_videos"))
        if fn.endswith(".mp4"))
    report["unet"]["val_video_diff"] = None
    if len(val_videos) >= 2:
        from latentsync_tpu.utils.media import read_video

        a = np.asarray(read_video(val_videos[0], change_fps=False), np.float32)
        b = np.asarray(read_video(val_videos[-1], change_fps=False), np.float32)
        n = min(len(a), len(b))
        diff = float(np.mean(np.abs(a[:n] - b[:n])))
        report["unet"]["val_video_diff"] = {
            "videos": [val_videos[0], val_videos[-1]], "mean_abs": diff}
        assert diff > 0.01, (
            f"validation videos identical between checkpoints: {diff}")

    # ---- UNet overfit (falsifiable loss check) ----
    over_cfg = os.path.join(args.workdir, "unet_overfit.yaml")
    with open(over_cfg, "w") as f:
        f.write(UNET_OVERFIT_CFG.format(data_dir=data_dir))
    over_out = os.path.join(args.workdir, "unet_overfit_run")
    recs, dt = run_cli("scripts.train_unet", [
        "--config", over_cfg, "--max-steps", str(args.overfit_steps),
        "--output-dir", over_out, "--log-every", "5", "--overfit"])
    o_series = loss_series(recs)
    report["unet_overfit"] = {"wall_s": round(dt, 1), "loss": o_series}
    assert o_series, "overfit run produced no losses"
    first, last = o_series[0][1], o_series[-1][1]
    # an eps-MSE that CANNOT memorize sits at ~1.0; demand a decisive fall
    report["unet_overfit"]["final_below_plateau"] = bool(last < 0.5)
    report["unet_overfit"]["halved"] = bool(last < 0.5 * first)
    assert last < 0.5, f"overfit eps-MSE stuck at plateau: {o_series}"
    assert last < 0.5 * first, f"overfit loss did not halve: {o_series}"

    # ---- UNet full stage-2 loss stack ----
    full_cfg = os.path.join(args.workdir, "unet_fullstack.yaml")
    with open(full_cfg, "w") as f:
        f.write(UNET_FULLSTACK_CFG.format(data_dir=data_dir))
    full_out = os.path.join(args.workdir, "unet_fullstack_run")
    recs, dt = run_cli("scripts.train_unet", [
        "--config", full_cfg, "--max-steps", str(args.fullstack_steps),
        "--output-dir", full_out, "--log-every", "2"])
    f_series = loss_series(recs)
    comps = [r["loss_components"] for r in recs if "loss_components" in r]
    report["unet_fullstack"] = {"wall_s": round(dt, 1), "loss": f_series,
                                "loss_components": comps}
    assert comps, "full-stack run logged no loss components"
    for want in ("recon", "perceptual", "trepa", "sync"):
        assert want in comps[-1], f"missing loss component {want}: {comps[-1]}"
        assert np.isfinite(comps[-1][want]), (want, comps[-1])

    # ---- SyncNet ----
    sync_cfg = os.path.join(args.workdir, "syncnet_tiny.yaml")
    with open(sync_cfg, "w") as f:
        f.write(SYNCNET_CFG.format(data_dir=data_dir))
    sync_out = os.path.join(args.workdir, "syncnet_run")
    recs, dt = run_cli("scripts.train_syncnet", [
        "--config", sync_cfg, "--max-steps", str(args.steps),
        "--output-dir", sync_out, "--log-every", "5",
        "--validation-steps", "25"])
    series = loss_series(recs)
    ckpts = sorted(d for d in os.listdir(sync_out) if d.startswith("step_"))
    r_recs, r_dt = run_cli("scripts.train_syncnet", [
        "--config", sync_cfg, "--max-steps",
        str(args.steps + args.resume_steps), "--output-dir", sync_out,
        "--log-every", "5", "--resume"])
    resumed = [r for r in r_recs if "resumed_from" in r]
    r_series = loss_series(r_recs)
    sat = [(r["step"], r["sat_frac"]) for r in recs if "sat_frac" in r]
    report["syncnet"] = {
        "wall_s": round(dt, 1), "loss": series,
        "loss_decreasing": decreasing(series),
        "sat_frac": sat,
        "checkpoints": ckpts,
        "resume": {"wall_s": round(r_dt, 1),
                   "resumed_from": resumed[0] if resumed else None,
                   "loss": r_series},
    }
    assert ckpts, "no SyncNet checkpoint written"
    assert resumed and resumed[0]["step"] >= args.steps, resumed
    # the r4 failure signature: every sample pinned at the BCE clip
    # (zero gradient); demand live gradients by the end of the run
    assert sat and sat[-1][1] < 0.5, f"syncnet gradients dead: {sat}"

    report["ok"] = bool(
        report["unet"]["loss_decreasing"]
        and report["syncnet"]["loss_decreasing"]
        and report["unet_overfit"]["final_below_plateau"]
        and (report["unet"]["val_video_diff"] or {}).get("mean_abs", 1.0) > 0.01
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"train_artifact": args.out, "ok": report["ok"],
                      "unet_loss_decreasing": report["unet"]["loss_decreasing"],
                      "syncnet_loss_decreasing":
                          report["syncnet"]["loss_decreasing"],
                      "overfit_final_below_plateau":
                          report["unet_overfit"]["final_below_plateau"],
                      "val_video_diff": report["unet"]["val_video_diff"],
                      "fullstack_components":
                          report["unet_fullstack"]["loss_components"][-1]}))


if __name__ == "__main__":
    main()
