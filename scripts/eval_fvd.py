"""FVD CLI (ref:eval/eval_fvd.py:26, fvd.py:28): Fréchet video distance
between generated and reference clip sets using a pluggable feature net."""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--real-dir", required=True)
    p.add_argument("--fake-dir", required=True)
    p.add_argument("--num-frames", type=int, default=16)
    p.add_argument("--size", type=int, default=224)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from latentsync_tpu.models.i3d import InceptionI3D, convert_i3d
    from latentsync_tpu.models.perceptual import compute_fvd
    from latentsync_tpu.utils.media import read_video
    from latentsync_tpu.utils.params import fast_init

    # real Kinetics-400 I3D (ref:eval/fvd.py:28-36); converted weights via
    # $LATENTSYNC_I3D_CKPT make the numbers comparable to the reference,
    # random init still yields a consistent relative metric within a run
    model = InceptionI3D()
    ckpt = os.environ.get("LATENTSYNC_I3D_CKPT", "checkpoints/i3d.npz")
    weights_source = "pretrained"
    if os.path.isfile(ckpt):
        if ckpt.endswith((".pt", ".pth")):
            from latentsync_tpu.utils.convert import load_torch_state_dict

            params = convert_i3d(load_torch_state_dict(ckpt)[0])
        else:
            from latentsync_tpu.utils.checkpoint import load_pytree

            params = load_pytree(ckpt)
    else:
        import sys

        print(
            f"WARNING: no I3D checkpoint at {ckpt!r} — using RANDOM weights. "
            "The FVD below is only a within-run relative number and is NOT "
            "comparable to Kinetics-pretrained FVD scores "
            "(set $LATENTSYNC_I3D_CKPT to a converted checkpoint).",
            file=sys.stderr,
        )
        weights_source = "random"
        params = fast_init(
            lambda v: model.init(jax.random.PRNGKey(0), v),
            jnp.zeros((1, args.num_frames, args.size, args.size, 3)),
        )
    fn = jax.jit(lambda p, v: model.apply(p, v))

    import cv2

    def features_for(directory):
        feats = []
        for name in sorted(os.listdir(directory)):
            if not name.endswith(".mp4"):
                continue
            frames = read_video(os.path.join(directory, name), change_fps=False)
            if len(frames) < args.num_frames:
                continue
            clip = frames[: args.num_frames]
            clip = np.stack([cv2.resize(f, (args.size, args.size)) for f in clip])
            clip = clip.astype(np.float32) / 127.5 - 1.0
            feats.append(np.asarray(fn(params, jnp.asarray(clip[None]))[0]))
        return np.stack(feats)

    real = features_for(args.real_dir)
    fake = features_for(args.fake_dir)
    print(json.dumps({"fvd": compute_fvd(fake, real),
                      "n_real": len(real), "n_fake": len(fake),
                      "i3d_weights": weights_source}))


if __name__ == "__main__":
    main()
