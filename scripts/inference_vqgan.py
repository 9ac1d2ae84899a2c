"""VQGAN reconstruction CLI (ref:scripts/inference_vqgan.py): run each
image through the pretrained VQAutoEncoder and save the reconstruction
— the quick visual check that VQGAN weights converted correctly."""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test_path", "-i", required=True)
    p.add_argument("--save_root", "-o", default="./results/vqgan_rec")
    p.add_argument("--codebook_size", type=int, default=1024)
    p.add_argument("--ckpt_path", default=None)
    args = p.parse_args()

    import cv2
    import numpy as np

    import jax
    import jax.numpy as jnp

    from latentsync_tpu.models.codeformer import VQAutoEncoder
    from latentsync_tpu.utils.params import fast_init

    model = VQAutoEncoder(codebook_size=args.codebook_size)
    if args.ckpt_path and os.path.isfile(args.ckpt_path):
        if args.ckpt_path.endswith((".pth", ".pt")):
            from latentsync_tpu.utils.convert import load_torch_state_dict
            from latentsync_tpu.utils.convert_codeformer import convert_codeformer

            params = convert_codeformer(load_torch_state_dict(args.ckpt_path)[0])
        else:
            from latentsync_tpu.utils.checkpoint import load_pytree

            params = load_pytree(args.ckpt_path)
    else:
        print("WARNING: no checkpoint — reconstructions use RANDOM weights")
        params = fast_init(
            lambda x: model.init(jax.random.PRNGKey(0), x),
            jnp.zeros((1, model.img_size, model.img_size, 3)))

    @jax.jit
    def rec(params, x):
        out, _, _ = model.apply(params, x)
        return out

    os.makedirs(args.save_root, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(args.test_path, "*.[jp][pn]g"))):
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (model.img_size, model.img_size))
        x = img.astype(np.float32) / 255.0 * 2.0 - 1.0
        y = np.asarray(rec(params, jnp.asarray(x[None]))[0])
        y = np.clip((y + 1.0) * 127.5, 0, 255).astype(np.uint8)
        name = os.path.splitext(os.path.basename(path))[0] + "_rec.png"
        cv2.imwrite(os.path.join(args.save_root, name),
                    cv2.cvtColor(y, cv2.COLOR_RGB2BGR))
        print(name)
    print(f"reconstructions in {args.save_root}")


if __name__ == "__main__":
    main()
