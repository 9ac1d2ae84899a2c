"""Face inpainting CLI (ref:inference_inpainting.py): CodeFormer core on
masked faces — masked pixels filled from the codebook prior (w=0)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--mask", default="", help="white = region to inpaint; "
                   "defaults to an auto mouth-region mask")
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default="checkpoints/codeformer_inpainting.pth")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from latentsync_tpu.models.codeformer import CodeFormer
    from latentsync_tpu.utils.params import cast_floating, fast_init

    model = CodeFormer(connect_list=("32", "64", "128", "256"), dtype=jnp.bfloat16)
    if os.path.isfile(args.ckpt):
        from latentsync_tpu.utils.convert import load_torch_state_dict
        from latentsync_tpu.utils.convert_codeformer import convert_codeformer

        sd, _step = load_torch_state_dict(args.ckpt)
        params = jax.tree.map(jnp.asarray, convert_codeformer(sd))
    else:
        params = fast_init(lambda x: model.init(jax.random.PRNGKey(0), x),
                           jnp.zeros((1, 512, 512, 3)))
    params = cast_floating(params, jnp.bfloat16)
    apply = jax.jit(lambda p, x: model.apply(p, x, 0.0))

    os.makedirs(args.out, exist_ok=True)
    img = cv2.cvtColor(cv2.imread(args.input), cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (512, 512))
    if args.mask and os.path.isfile(args.mask):
        mask = cv2.imread(args.mask, cv2.IMREAD_GRAYSCALE)
        mask = cv2.resize(mask, (512, 512)).astype(np.float32) / 255.0
    else:
        from latentsync_tpu.utils.image_processor import _generated_mouth_mask

        mask = 1.0 - _generated_mouth_mask(512)[:, :, 0]
    x = img.astype(np.float32) / 127.5 - 1.0
    x = x * (1.0 - mask[:, :, None])  # zero the inpaint region
    y, _, _ = apply(params, jnp.asarray(x[None]))
    y = np.asarray(jnp.clip((y[0].astype(jnp.float32) + 1) * 127.5, 0, 255))
    out = (y * mask[:, :, None] + img * (1 - mask[:, :, None])).astype(np.uint8)
    dst = os.path.join(args.out, os.path.basename(args.input))
    cv2.imwrite(dst, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    print(f"inpainted → {dst}")


if __name__ == "__main__":
    main()
