"""CodeFormer face-restoration CLI (ref:inference_codeformer.py).

python -m scripts.inference_codeformer --input img_or_dir_or_mp4 \
    --out out_dir [-w 0.5] [--ckpt codeformer.pth]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("-w", "--fidelity", type=float, default=0.5,
                   help="fidelity/quality knob w in [0,1] (ref README)")
    p.add_argument("--ckpt", default="checkpoints/codeformer.pth")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from latentsync_tpu.models.codeformer import CodeFormer
    from latentsync_tpu.utils.face_restore_helper import FaceRestoreHelper
    from latentsync_tpu.utils.params import cast_floating, fast_init

    model = CodeFormer(dtype=jnp.bfloat16)
    if os.path.isfile(args.ckpt):
        from latentsync_tpu.utils.convert import load_torch_state_dict
        from latentsync_tpu.utils.convert_codeformer import convert_codeformer

        sd, _ = load_torch_state_dict(args.ckpt)
        params = jax.tree.map(jnp.asarray, convert_codeformer(sd))
    else:
        params = fast_init(
            lambda x: model.init(jax.random.PRNGKey(0), x),
            jnp.zeros((1, 512, 512, 3)),
        )
    params = cast_floating(params, jnp.bfloat16)
    apply = jax.jit(lambda p, x, w: model.apply(p, x, w))

    helper = FaceRestoreHelper()
    os.makedirs(args.out, exist_ok=True)

    def restore_image(img_rgb):
        faces = helper.align_faces(img_rgb)
        restored = []
        for face in faces:
            x = face.crop.astype(np.float32) / 127.5 - 1.0
            y, _, _ = apply(params, jnp.asarray(x[None]), args.fidelity)
            y = np.asarray(jnp.clip((y[0].astype(jnp.float32) + 1) * 127.5, 0, 255))
            restored.append((face, y.astype(np.uint8)))
        return helper.paste_faces(img_rgb, restored)

    inputs = []
    if os.path.isdir(args.input):
        inputs = [os.path.join(args.input, f) for f in sorted(os.listdir(args.input))
                  if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    else:
        inputs = [args.input]

    for path in inputs:
        if path.lower().endswith(".mp4"):
            from latentsync_tpu.utils.media import read_video, write_video

            frames = read_video(path, change_fps=False)
            out_frames = np.stack([restore_image(fr) for fr in frames])
            write_video(os.path.join(args.out, os.path.basename(path)), out_frames)
        else:
            img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
            out = restore_image(img)
            cv2.imwrite(
                os.path.join(args.out, os.path.basename(path)),
                cv2.cvtColor(out, cv2.COLOR_RGB2BGR),
            )
            print(f"restored {path}")


if __name__ == "__main__":
    main()
