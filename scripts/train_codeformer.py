"""CodeFormer/VQGAN staged training CLI (ref:basicsr/train.py +
options/*.yml): --stage vqgan | code | joint over an FFHQ-style dir."""

from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["vqgan", "code", "joint"], required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--output-dir", default="debug/codeformer")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--img-size", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from latentsync_tpu.models.codeformer import (
        CodeFormer, VQAutoEncoder, VQGANDiscriminator,
    )
    from latentsync_tpu.training.degradations import FFHQBlindSource
    from latentsync_tpu.training.restoration_trainer import (
        CodeFormerStageII, CodeFormerStageIII, VQGANTrainer,
    )
    from latentsync_tpu.utils.checkpoint import save_checkpoint
    from latentsync_tpu.utils.params import fast_init

    source = FFHQBlindSource(args.data_dir)
    dtype = jnp.bfloat16
    disc = VQGANDiscriminator(dtype=dtype)
    d_params = fast_init(
        lambda x: disc.init(jax.random.PRNGKey(1), x),
        jnp.zeros((1, args.img_size, args.img_size, 3)), seed=1)
    g_tx = optax.adam(args.lr, b1=0.5, b2=0.9)
    d_tx = optax.adam(args.lr, b1=0.5, b2=0.9)

    if args.stage == "vqgan":
        model = VQAutoEncoder(img_size=args.img_size, dtype=dtype)
        params = fast_init(lambda x: model.init(jax.random.PRNGKey(0), x),
                           jnp.zeros((1, args.img_size, args.img_size, 3)))
        trainer = VQGANTrainer(model, disc)
        step_fn = trainer.make_steps(g_tx, d_tx)
        g_opt, d_opt = g_tx.init(params), d_tx.init(d_params)
        for step in range(1, args.max_steps + 1):
            samples = [source.sample() for _ in range(args.batch_size)]
            batch = {k: jnp.asarray(np.stack([s[k] for s in samples]))
                     for k in ("lq", "gt")}
            params, d_params, g_opt, d_opt, m = step_fn(
                params, d_params, g_opt, d_opt, batch)
            if step % 10 == 0:
                print(json.dumps({"step": step,
                                  **{k: float(v) for k, v in m.items()}}))
        save_checkpoint(args.output_dir, args.max_steps, params)
        return

    model = CodeFormer(img_size=args.img_size, dtype=dtype)
    params = fast_init(lambda x: model.init(jax.random.PRNGKey(0), x),
                       jnp.zeros((1, args.img_size, args.img_size, 3)))
    if args.stage == "code":
        trainer = CodeFormerStageII(model)
        step_fn = trainer.make_step(g_tx)
        opt = g_tx.init(params)
        for step in range(1, args.max_steps + 1):
            samples = [source.sample() for _ in range(args.batch_size)]
            batch = {k: jnp.asarray(np.stack([s[k] for s in samples]))
                     for k in ("lq", "gt")}
            params, opt, m = step_fn(params, opt, batch)
            if step % 10 == 0:
                print(json.dumps({"step": step,
                                  **{k: float(v) for k, v in m.items()}}))
    else:
        trainer = CodeFormerStageIII(model, disc)
        step_fn = trainer.make_step(g_tx, d_tx)
        g_opt, d_opt = g_tx.init(params), d_tx.init(d_params)
        for step in range(1, args.max_steps + 1):
            samples = [source.sample() for _ in range(args.batch_size)]
            batch = {k: jnp.asarray(np.stack([s[k] for s in samples]))
                     for k in ("lq", "gt")}
            params, d_params, g_opt, d_opt, m = step_fn(
                params, d_params, g_opt, d_opt, batch)
            if step % 10 == 0:
                print(json.dumps({"step": step,
                                  **{k: float(v) for k, v in m.items()}}))
    save_checkpoint(args.output_dir, args.max_steps, params)


if __name__ == "__main__":
    main()
