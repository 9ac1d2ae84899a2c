"""SyncNet trainer (ref:scripts/train_syncnet.py:39-262, SURVEY §3.3).

cosine-BCE supervision of the twin-tower StableSyncNet; data-parallel
over the mesh `data` axis; full resume carries the train/val loss history
like the reference checkpoint does (ref:train_syncnet.py:124-140).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import LatentSyncConfig
from ..models.syncnet import StableSyncNet
from .losses import cosine_bce_loss


@dataclass
class SyncNetTrainer:
    config: LatentSyncConfig
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self.model = StableSyncNet(self.config.syncnet, dtype=self.dtype)

    def init_params(self, rng, vision_shape, mel_shape):
        from ..utils.params import fast_init

        return fast_init(
            lambda v, a: self.model.init(rng, v, a),
            jnp.zeros(vision_shape), jnp.zeros(mel_shape),
        )

    def make_optimizer(self):
        run = self.config.run
        return optax.chain(
            optax.clip_by_global_norm(run.max_grad_norm),
            optax.adamw(run.lr),
        )

    def make_step_fns(self, tx):
        model = self.model

        def loss_fn(params, batch):
            v_emb, a_emb = model.apply(
                params, batch["vision"].astype(self.dtype), batch["mel"].astype(self.dtype)
            )
            losses = cosine_bce_loss(v_emb, a_emb, batch["y"])
            return jnp.mean(losses)

        @jax.jit
        def train_step(params, opt_state, batch):
            def loss_and_sat(p, b):
                v_emb, a_emb = model.apply(
                    p, b["vision"].astype(self.dtype), b["mel"].astype(self.dtype)
                )
                sims = jnp.sum(v_emb.astype(jnp.float32)
                               * a_emb.astype(jnp.float32), axis=-1)
                losses = cosine_bce_loss(v_emb, a_emb, b["y"])
                # fraction of samples pinned at the BCE clip boundary —
                # those contribute ZERO gradient (the r4 dead-training
                # failure mode was 100% saturation from collapsed
                # embeddings); surfacing it makes a recurrence visible
                # in the step logs instead of silently training on air
                eps = 1e-7
                sat = jnp.mean(
                    ((sims <= eps) | (sims >= 1.0 - eps)).astype(jnp.float32)
                )
                return jnp.mean(losses), sat

            (loss, sat_frac), grads = jax.value_and_grad(
                loss_and_sat, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss, "sat_frac": sat_frac}

        @jax.jit
        def eval_step(params, batch):
            v_emb, a_emb = model.apply(
                params, batch["vision"].astype(self.dtype), batch["mel"].astype(self.dtype)
            )
            sims = jnp.sum(v_emb.astype(jnp.float32)
                           * a_emb.astype(jnp.float32), axis=-1)
            loss = jnp.mean(cosine_bce_loss(v_emb, a_emb, batch["y"]))
            # threshold accuracy (ref:eval/eval_syncnet_acc.py: cos-sim ≥ 0.5)
            pred = (sims >= 0.5).astype(jnp.float32)
            acc = jnp.mean((pred == batch["y"]).astype(jnp.float32))
            return loss, acc

        return loss_fn, train_step, eval_step
