"""Static op-family tally of the flagship UNet forward.

Profile substitute for the tunneled TPU (jax.profiler cannot attach):
enumerates every op instance in UNet3DConditionModel from the config
(ref architecture: latentsync/models/unet.py + unet_blocks.py), computes
analytic FLOPs per family, and — combined with measured per-family MFU
from scripts/micro_probe — predicts the time budget per family. The
prediction is validated against the measured full-forward time.

Usage: python -m scripts.op_tally [--w 4] [--mfu conv=0.7,attn=0.17,...]
"""

import argparse
import json
import sys
from collections import defaultdict

# FLOPs are per forward at CFG-batched frame count bf = 2*W*16.


def tally(w: int = 4):
    from latentsync_tpu.config import LatentSyncConfig

    cfg = LatentSyncConfig().unet
    bf = 2 * w * 16  # frames through the 2D-folded path
    nb = 2 * w       # videos through the temporal path
    f = 16
    heads = cfg.attention_head_dim  # SD legacy: this is NUM heads
    lat = 32

    chans = cfg.block_out_channels          # (320, 640, 1280, 1280)
    res_of_level = [lat // (2 ** i) for i in range(4)]  # 32,16,8,4

    fl = defaultdict(float)

    def conv3(res, cin, cout, n=1.0):
        fl["conv3x3"] += n * 2 * bf * res * res * 9 * cin * cout

    def conv1(res, cin, cout, n=1.0):
        fl["proj_conv1x1"] += n * 2 * bf * res * res * cin * cout

    def dense(tokens, cin, cout, fam="dense_ff"):
        fl[fam] += 2 * tokens * cin * cout

    def spatial_attn(res, c):
        s = res * res
        d = c // heads
        # qkv + out projections
        dense(bf * s, c, 3 * c, "attn_proj")
        dense(bf * s, c, c, "attn_proj")
        # QK^T + PV
        fl["spatial_attn_core"] += 2 * 2 * bf * heads * s * s * d

    def audio_attn(res, c):
        s = res * res
        sk = 50
        d = c // heads
        dense(bf * s, c, c, "attn_proj")          # q
        dense(bf * sk, cfg.cross_attention_dim, 2 * c, "attn_proj")  # k,v
        dense(bf * s, c, c, "attn_proj")          # out
        fl["audio_attn_core"] += 2 * 2 * bf * heads * s * sk * d

    def ff(res, c):
        s = res * res
        dense(bf * s, c, 8 * c)   # GEGLU up (2×4c)
        dense(bf * s, 4 * c, c)   # down

    def temporal_module(res, c):
        s = res * res
        d = c // heads
        dense(nb * s * f, c, c, "attn_proj")       # proj_in
        dense(nb * s * f, c, c, "attn_proj")       # proj_out
        for _ in cfg.motion_module.attention_block_types:  # 2 temporal attns
            dense(nb * s * f, c, 3 * c, "attn_proj")
            dense(nb * s * f, c, c, "attn_proj")
            fl["temporal_attn_core"] += 2 * 2 * nb * s * heads * f * f * d
        # temporal FF (GEGLU)
        dense(nb * s * f, c, 8 * c)
        dense(nb * s * f, 4 * c, c)

    def gn(res, c, n=1.0):
        fl["groupnorm_silu"] += n * 10 * bf * res * res * c  # elementwise est.

    def resnet(res, cin, cout):
        conv3(res, cin, cout)
        conv3(res, cout, cout)
        gn(res, cin)
        gn(res, cout)
        if cin != cout:
            conv1(res, cin, cout)
        dense(bf // f, 1280, cout, "time_proj")

    def transformer(res, c):
        gn(res, c)
        conv1(res, c, c, 2)      # proj_in/out
        spatial_attn(res, c)
        audio_attn(res, c)
        ff(res, c)

    # --- down path ---
    conv3(32, cfg.in_channels, chans[0])  # conv_in (zero-init but still run)
    for i, btype in enumerate(cfg.down_block_types):
        res, c = res_of_level[i], chans[i]
        cin = chans[i - 1] if i else chans[0]
        for j in range(cfg.layers_per_block):
            resnet(res, cin if j == 0 else c, c)
            if btype.startswith("CrossAttn"):
                transformer(res, c)
            if cfg.use_motion_module:
                temporal_module(res, c)
        if i < 3:  # downsample
            conv3(res_of_level[i + 1], c, c)  # stride-2: output res
    # --- mid ---
    res, c = res_of_level[3], chans[3]
    resnet(res, c, c)
    transformer(res, c)
    resnet(res, c, c)
    # --- up path ---
    rev = list(reversed(chans))  # 1280,1280,640,320
    for i, btype in enumerate(cfg.up_block_types):
        level = 3 - i
        res, c = res_of_level[level], rev[i]
        prev_c = rev[i - 1] if i else chans[3]
        for j in range(cfg.layers_per_block + 1):
            # skip channels: last layer of the level below / same level
            res_skip = rev[i + 1] if (j == cfg.layers_per_block and i < 3) else rev[i]
            cin = (prev_c if j == 0 else c) + res_skip
            resnet(res, cin, c)
            if btype.startswith("CrossAttn"):
                transformer(res, c)
            if cfg.use_motion_module:
                temporal_module(res, c)
        if i < 3:  # upsample at CURRENT res then conv at 2× res
            conv3(res * 2, c, c)
    gn(32, chans[0])  # conv_norm_out
    conv3(32, chans[0], cfg.out_channels)  # conv_out
    return dict(fl)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=4)
    ap.add_argument(
        "--mfu", default="conv3x3=0.70,proj_conv1x1=0.6,dense_ff=0.72,"
        "attn_proj=0.65,spatial_attn_core=0.17,audio_attn_core=0.10,"
        "temporal_attn_core=0.008,groupnorm_silu=0.004,time_proj=0.1",
        help="measured per-family MFU for time prediction",
    )
    args = ap.parse_args()
    mfu = dict(kv.split("=") for kv in args.mfu.split(","))
    fl = tally(args.w)
    peak = 197e12
    total_fl = sum(fl.values())
    total_ms = 0.0
    rows = []
    for fam, v in sorted(fl.items(), key=lambda kv: -kv[1]):
        m = float(mfu.get(fam, 0.5))
        ms = v / (peak * m) * 1e3
        total_ms += ms
        rows.append((fam, v, m, ms))
    for fam, v, m, ms in rows:
        print(json.dumps({
            "family": fam, "tflop": round(v / 1e12, 3),
            "flop_share": round(v / total_fl, 3),
            "assumed_mfu": m, "pred_ms": round(ms, 2),
        }))
    print(json.dumps({
        "family": "TOTAL", "tflop": round(total_fl / 1e12, 2),
        "pred_ms": round(total_ms, 1),
        "pred_fwd_mfu": round(total_fl / (peak * total_ms / 1e3), 3),
    }))


if __name__ == "__main__":
    main()
