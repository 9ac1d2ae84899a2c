"""One-command fidelity gate for the fast inference modes.

The production fast path (int8 convs, DeepCache step caching, CFG
guidance interval — docs/perf_audit.md "Round-3 FLOP cuts") is gated
STATISTICALLY, not bitwise: BASELINE.md requires SyncNet confidence
within 2% of the exact-trajectory run. This script runs that protocol
end to end so the moment real weights drop in it is one command:

python -m scripts.validate_fidelity --video assets/demo1_video.mp4 \
    --audio assets/demo1_audio.wav \
    [--unet-ckpt ...] [--vae-ckpt ...] [--whisper-ckpt ...] \
    [--syncnet-ckpt checkpoints/auxiliary/syncnet_v2.model] \
    [--fast "int8,deepcache=2:1,cfg=0:0.5"] [--tolerance 0.02]

It renders the clip twice with identical seeds — once with every knob
off (exact trajectory) and once with the requested fast configuration —
scores both with the evaluation SyncNet (ref:eval/eval_sync_conf.py
semantics), and exits non-zero if |conf_fast - conf_exact| exceeds
tolerance * |conf_exact|.

`--ladder` instead walks the measured knob ladder from fastest to
safest (docs/perf_audit.md sweep) and selects the FIRST configuration
whose confidence passes the gate — the production operating-point
picker: render exact once, then step down until a rung passes.

Without real checkpoints the run still exercises the full protocol on
random weights, but the resulting confidences are meaningless noise —
the JSON is tagged "weights": "random" so it can never be mistaken for
a passed gate (same convention as scripts/eval_fvd.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# fastest → safest, every rung measured in docs/perf_audit.md
LADDER = [
    "int8,deepcache=5:1:enc:2,cfg=0:0.5",   # 34.9 fps/chip
    "int8,deepcache=4:1:enc:2,cfg=0:0.5",   # 30.1
    "int8,deepcache=4:1:enc:1,cfg=0:0.5",
    "int8,deepcache=4:1:enc,cfg=0:0.5",     # 21.6
    "int8,deepcache=3:1:enc,cfg=0:0.5",     # 19.6
    "int8,deepcache=2:1,cfg=0:0.5",         # 15.7
    "int8",                                  # 9.5
]


def _set_fast_env(spec: str):
    """Parse "int8,deepcache=2:1,cfg=0:0.5" into the runtime env knobs."""
    os.environ["LATENTSYNC_INT8"] = "0"
    os.environ["LATENTSYNC_DEEPCACHE"] = "0"
    os.environ["LATENTSYNC_CFG_INTERVAL"] = ""
    for part in filter(None, (p.strip() for p in spec.split(","))):
        if part == "int8":
            os.environ["LATENTSYNC_INT8"] = "1"
        elif part.startswith("deepcache="):
            os.environ["LATENTSYNC_DEEPCACHE"] = part.split("=", 1)[1]
        elif part.startswith("cfg="):
            os.environ["LATENTSYNC_CFG_INTERVAL"] = part.split("=", 1)[1]
        else:
            raise SystemExit(f"unknown fast-mode token: {part!r}")


def _clear_fast_env():
    os.environ["LATENTSYNC_INT8"] = "0"
    os.environ["LATENTSYNC_DEEPCACHE"] = "0"
    os.environ["LATENTSYNC_CFG_INTERVAL"] = ""


def main():
    from latentsync_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--audio", required=True)
    p.add_argument("--unet-config", default="")
    p.add_argument("--unet-ckpt", default="checkpoints/latentsync_unet.pt")
    p.add_argument("--vae-ckpt", default="checkpoints/sd-vae-ft-mse.pt")
    p.add_argument("--whisper-ckpt", default="checkpoints/whisper/tiny.pt")
    p.add_argument("--syncnet-ckpt",
                   default="checkpoints/auxiliary/syncnet_v2.model")
    p.add_argument("--fast", default=LADDER[0],
                   help="fast-mode spec: comma list of int8 / "
                        "deepcache=I:d[:enc[:k]] / cfg=lo:hi")
    p.add_argument("--ladder", action="store_true",
                   help="walk the measured knob ladder fastest-first and "
                        "select the first configuration that passes the "
                        "gate (ignores --fast)")
    p.add_argument("--tolerance", type=float, default=0.02,
                   help="relative SyncNet-confidence tolerance (BASELINE.md)")
    p.add_argument("--inference-steps", type=int, default=20)
    p.add_argument("--guidance-scale", type=float, default=1.5)
    p.add_argument("--seed", type=int, default=1247)
    p.add_argument("--window-batch", type=int, default=2)
    p.add_argument("--workdir", default="/tmp/validate_fidelity")
    p.add_argument("--out", default="",
                   help="also write the result JSON to this path")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    from scripts.inference import build_pipeline

    have_weights = os.path.isfile(args.unet_ckpt) and os.path.isfile(args.vae_ckpt)
    # Orbax step dirs from our trainer count as real (trained) weights
    # for the DEVIATION metrics, but the SyncNet-conf gate still demands
    # the pretrained evaluator — a tiny from-scratch model proves rung
    # ORDERING, not production fidelity
    trained_tiny = os.path.isdir(args.unet_ckpt)

    def render(mode: str, spec: str) -> str:
        # fresh pipeline per mode: the knobs are read at denoise-jit
        # build time and the int8 flag at conv trace time, so reuse
        # would leak the previous mode's compiled functions
        if spec:
            _set_fast_env(spec)
        else:
            _clear_fast_env()
        pipe = build_pipeline(args)
        out_path = os.path.join(args.workdir, f"{mode}.mp4")
        pipe(
            video_path=args.video,
            audio_path=args.audio,
            video_out_path=out_path,
            num_inference_steps=args.inference_steps,
            guidance_scale=args.guidance_scale,
            seed=args.seed,
            window_batch=args.window_batch,
        )
        del pipe
        _clear_fast_env()
        return out_path

    from latentsync_tpu.eval.sync_eval import SyncNetEvaluator

    sync_params = None
    sync_weights = "random"
    if os.path.isfile(args.syncnet_ckpt):
        import jax
        import jax.numpy as jnp

        from latentsync_tpu.utils.convert import load_torch_state_dict
        from latentsync_tpu.utils.convert_eval import convert_syncnet_s

        sd, _ = load_torch_state_dict(args.syncnet_ckpt)
        sync_params = jax.tree.map(jnp.asarray, convert_syncnet_s(sd))
        sync_weights = "pretrained"
    evaluator = SyncNetEvaluator(sync_params)
    weights = "pretrained" if (have_weights and sync_weights == "pretrained") \
        else "random"

    def conf_of(path: str) -> float:
        _offset, _min_dist, conf = evaluator.evaluate(path)
        return conf

    def pixel_delta(path_a: str, path_b: str) -> float:
        """Mean |Δ| in uint8 pixel units between two renders — the
        weight-free deviation metric: exact vs rung, same seed, so any
        difference is the knob's doing. Monotone in rung aggressiveness
        when the ladder ordering is real."""
        import numpy as np

        from latentsync_tpu.utils.media import read_video

        a = np.asarray(read_video(path_a, change_fps=False), np.float32)
        b = np.asarray(read_video(path_b, change_fps=False), np.float32)
        n = min(len(a), len(b))
        return float(np.mean(np.abs(a[:n] - b[:n])))

    exact_path = render("exact", "")
    conf_exact = conf_of(exact_path)

    def gate(spec: str, tag: str = "fast"):
        fast_path = render(tag, spec)
        conf_fast = conf_of(fast_path)
        rel = (abs(conf_fast - conf_exact) / abs(conf_exact)
               if conf_exact else float("inf"))
        return conf_fast, rel, rel <= args.tolerance, pixel_delta(
            exact_path, fast_path)

    def emit(payload: dict):
        blob = json.dumps(payload)
        print(blob)
        if args.out:
            with open(args.out, "w") as f:
                f.write(blob + "\n")

    if args.ladder:
        rungs = []
        chosen = None
        for i, spec in enumerate(LADDER):
            conf_fast, rel, passed, pix = gate(spec, tag=f"rung{i}")
            rungs.append({"spec": spec, "conf": round(conf_fast, 4),
                          "rel_delta": round(rel, 4),
                          "pixel_delta": round(pix, 4),
                          "pass": bool(passed)})
            if passed and weights == "pretrained":
                chosen = spec
                break
        emit({
            "mode": "ladder",
            "conf_exact": round(conf_exact, 4),
            "rungs": rungs,
            "selected": chosen or "exact",
            "tolerance": args.tolerance,
            "weights": "trained-tiny" if trained_tiny else weights,
            "gate": (("PASS" if chosen else "FAIL (exact only)")
                     if weights == "pretrained"
                     else "INCONCLUSIVE (SyncNet evaluator weights absent)"),
        })
        if weights == "pretrained" and chosen is None:
            sys.exit(1)
        return

    conf_fast, rel, passed, pix = gate(args.fast)
    emit({
        "fast_mode": args.fast,
        "conf_exact": round(conf_exact, 4),
        "conf_fast": round(conf_fast, 4),
        "rel_delta": round(rel, 4),
        "pixel_delta": round(pix, 4),
        "tolerance": args.tolerance,
        "weights": "trained-tiny" if trained_tiny else weights,
        "gate": ("PASS" if passed else "FAIL") if weights == "pretrained"
                else "INCONCLUSIVE (SyncNet evaluator weights absent)",
    })
    if weights == "pretrained" and not passed:
        sys.exit(1)


if __name__ == "__main__":
    main()
