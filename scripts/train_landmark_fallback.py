"""Train the packaged no-checkpoint landmark fallback.

The reference's zero-config landmark path is mediapipe's pretrained
478-point mesh (ref:latentsync/utils/image_processor.py:181-264), which
ships with the pip package. Those weights cannot be redistributed here,
so this script trains a small 2D-FAN (1 hourglass module, narrow) on
procedurally rendered faces whose iBUG-68 landmarks are known by
construction (latentsync_tpu/training/synthetic_faces.py), and the
result is committed as `latentsync_tpu/utils/assets/landmark_fallback.npz`
— picked up automatically by `default_landmark_detector` when no user
checkpoint is configured.

TPU-tunnel-aware design: the dataset is generated once on the host as
uint8 and pushed to the device in one transfer; every training step then
samples its minibatch, normalizes, and renders gaussian heatmap targets
ON DEVICE, so the (slow) host↔device link carries zero per-step traffic.

Usage:
    python scripts/train_landmark_fallback.py --steps 2000 \
        --out latentsync_tpu/utils/assets/landmark_fallback.npz
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from latentsync_tpu.models.face_detection import FAN2D
from latentsync_tpu.training.synthetic_faces import render_face
from latentsync_tpu.utils.checkpoint import save_pytree

HEAT = 64  # heatmap side (stride-4 grid of the 256px crop)


def device_heatmaps(pts: jnp.ndarray, sigma: float = 1.0) -> jnp.ndarray:
    """(B, 68, 2) pixel landmarks → (B, 64, 64, 68) gaussian targets
    (device-side mirror of synthetic_faces.landmark_heatmaps)."""
    ys, xs = jnp.mgrid[0:HEAT, 0:HEAT].astype(jnp.float32)
    p = pts / 4.0 - 0.5
    d2 = (xs[None, ..., None] - p[:, None, None, :, 0]) ** 2 + (
        ys[None, ..., None] - p[:, None, None, :, 1]
    ) ** 2
    return jnp.exp(-d2 / (2 * sigma**2))


def device_decode(heat: jnp.ndarray) -> jnp.ndarray:
    """(B, 64, 64, 68) → (B, 68, 2) argmax landmark coords in 256-px
    crop space (integer decode; eval-only NME metric)."""
    b, h, w, n = heat.shape
    idx = heat.reshape(b, h * w, n).argmax(axis=1)
    ys, xs = jnp.divmod(idx, w)
    return (jnp.stack([xs, ys], -1).astype(jnp.float32) + 0.5) * 4.0


def nme(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean landmark error normalized by outer-eye-corner distance
    (the standard iBUG NME)."""
    inter = jnp.linalg.norm(gt[:, 45] - gt[:, 36], axis=-1)
    err = jnp.linalg.norm(pred - gt, axis=-1).mean(axis=-1)
    return (err / jnp.maximum(inter, 1e-3)).mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dataset", type=int, default=4000,
                    help="unique synthetic faces (64 held out for eval)")
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--modules", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--pos-weight", type=float, default=30.0,
                    help="extra MSE weight on heatmap-positive pixels")
    ap.add_argument("--sigma", type=float, default=1.5,
                    help="gaussian target radius on the 64² grid")
    ap.add_argument("--hair-p", type=float, default=0.0,
                    help="hair-rendering probability — measured NEGATIVE "
                         "for real-photo generalization (see "
                         "synthetic_faces.render_face); shipped asset uses 0")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--out", default=os.path.join(
        "latentsync_tpu", "utils", "assets", "landmark_fallback.npz"))
    ap.add_argument("--f16", action="store_true", default=True,
                    help="save float16 weights (halves the packaged asset)")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    imgs = np.empty((args.dataset, 256, 256, 3), np.uint8)
    lms = np.empty((args.dataset, 68, 2), np.float32)
    for i in range(args.dataset):
        imgs[i], lms[i] = render_face(rng, 256, hair_p=args.hair_p)
    print(f"generated {args.dataset} faces in {time.time() - t0:.1f}s",
          flush=True)

    d_imgs = jnp.asarray(imgs)  # one transfer, stays on device as uint8
    d_lms = jnp.asarray(lms)
    n_eval = 64
    n_train = args.dataset - n_eval

    model_t = FAN2D(num_modules=args.modules, features=args.features,
                    train=True)
    model_e = FAN2D(num_modules=args.modules, features=args.features)
    variables = model_t.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, 256, 256, 3)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print(f"FAN fallback: {args.modules} module(s) x {args.features} feats, "
          f"{n_params / 1e6:.2f}M params", flush=True)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.warmup_cosine_decay_schedule(
            0.0, args.lr, min(100, args.steps // 2),
            max(args.steps, args.steps // 2 + 1), args.lr * 0.01)),
    )
    opt_state = tx.init(params)

    # the dataset arrays are ARGUMENTS, not closure captures: a closed-over
    # device array is baked into the jaxpr as a constant, and a ~786 MB
    # constant blows up the tunneled remote-compile payload (observed:
    # "Broken pipe" at first train_step)
    @jax.jit
    def train_step(params, batch_stats, opt_state, key, d_imgs, d_lms):
        idx = jax.random.randint(key, (args.batch,), n_eval, args.dataset)
        x = d_imgs[idx].astype(jnp.float32) / 255.0
        target = device_heatmaps(d_lms[idx], sigma=args.sigma)

        def loss_fn(p):
            outs, mut = model_t.apply(
                {"params": p, "batch_stats": batch_stats}, x,
                mutable=["batch_stats"])
            # positive-weighted MSE: the gaussian footprint is ~0.3% of
            # each 64² map, so plain MSE collapses to the all-zeros
            # optimum (observed: loss pinned at mean(target²)≈7.7e-4,
            # NME ~0.71 = argmax noise). Weighting the peak region pulls
            # the gradient toward localization.
            w = 1.0 + args.pos_weight * target
            loss = sum(jnp.mean(w * (o - target) ** 2) for o in outs)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    @jax.jit
    def eval_nme(params, batch_stats, d_imgs, d_lms):
        x = d_imgs[:n_eval].astype(jnp.float32) / 255.0
        heat = model_e.apply(
            {"params": params, "batch_stats": batch_stats}, x)[-1]
        return nme(device_decode(heat), d_lms[:n_eval])

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, sub, d_imgs, d_lms)
        if step % args.eval_every == 0 or step == args.steps:
            v = float(eval_nme(params, batch_stats, d_imgs, d_lms))
            print(f"step {step:5d}  loss {float(loss):.5f}  "
                  f"eval NME {v:.4f}  ({time.time() - t0:.0f}s)", flush=True)

    tree = {"params": params, "batch_stats": batch_stats}
    if args.f16:
        tree = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float16)
            if np.asarray(a).dtype == np.float32 else np.asarray(a), tree)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_pytree(args.out, tree)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"saved {args.out} ({size_mb:.1f} MB), final eval NME {v:.4f}")


if __name__ == "__main__":
    main()
