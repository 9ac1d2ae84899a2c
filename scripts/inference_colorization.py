"""Face colorization CLI (ref:inference_colorization.py): the CodeFormer
core with w=0 (full codebook prior) on grayscale inputs."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default="checkpoints/codeformer_colorization.pth")
    args = p.parse_args()

    import cv2

    from .inference_codeformer import main as _  # noqa: F401 — shared stack
    from latentsync_tpu.models.codeformer import CodeFormer
    from latentsync_tpu.utils.params import cast_floating, fast_init
    import jax
    import jax.numpy as jnp

    model = CodeFormer(connect_list=("32", "64", "128"), dtype=jnp.bfloat16)
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
    img = cv2.imread(args.input, cv2.IMREAD_GRAYSCALE)
    img = cv2.resize(img, (512, 512))
    rgb = np.repeat(img[:, :, None], 3, axis=2).astype(np.float32) / 127.5 - 1.0
    y, _, _ = apply(params, jnp.asarray(rgb[None]))
    out = np.asarray(jnp.clip((y[0].astype(jnp.float32) + 1) * 127.5, 0, 255)).astype(np.uint8)
    dst = os.path.join(args.out, os.path.basename(args.input))
    cv2.imwrite(dst, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    print(f"colorized → {dst}")


if __name__ == "__main__":
    main()
