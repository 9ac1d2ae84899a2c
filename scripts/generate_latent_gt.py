"""Generate VQGAN latent-GT code maps for CodeFormer stage-II training
(ref:scripts/generate_latent_gt.py): encode each (and its hflip) FFHQ
image through the pretrained VQGAN, quantize, and store the 16×16 code
indices per image. Saved as .npz with keys "orig/<name>" and
"hflip/<name>" (the torch reference pickles a nested dict)."""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test_path", "-i", required=True)
    p.add_argument("--save_root", "-o", required=True)
    p.add_argument("--codebook_size", type=int, default=1024)
    p.add_argument("--ckpt_path", default=None,
                   help="VQGAN checkpoint (.pth via convert_codeformer "
                        "or .npz pytree); random weights if omitted")
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
        print("WARNING: no checkpoint — latent codes use RANDOM weights")
        params = fast_init(
            lambda x: model.init(jax.random.PRNGKey(0), x),
            jnp.zeros((1, model.img_size, model.img_size, 3)))

    @jax.jit
    def codes(params, x):
        _, _, idx = model.apply(params, x)
        return idx

    os.makedirs(args.save_root, exist_ok=True)
    out = {}
    paths = sorted(glob.glob(os.path.join(args.test_path, "*.[jp][pn]g")))
    size_latent = 16
    for flip in ("orig", "hflip"):
        for path in paths:
            name = os.path.splitext(os.path.basename(path))[0]
            img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
            img = cv2.resize(img, (model.img_size, model.img_size))
            if flip == "hflip":
                img = img[:, ::-1]
            x = img.astype(np.float32) / 255.0 * 2.0 - 1.0  # (0.5,0.5) norm
            idx = np.asarray(codes(params, jnp.asarray(x[None])))
            out[f"{flip}/{name}"] = idx.reshape(size_latent, size_latent)
            print(name, flip, out[f"{flip}/{name}"].shape)

    save_path = os.path.join(
        args.save_root, f"latent_gt_code{args.codebook_size}.npz")
    np.savez(save_path, **out)
    print(f"Latent GT codes saved to {save_path}")


if __name__ == "__main__":
    main()
