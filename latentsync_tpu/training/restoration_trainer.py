"""Face-restoration trainers: VQGAN stage + CodeFormer stages.

Re-derivation of the basicsr model wrappers (ref:basicsr/models/
vqgan_model.py, codeformer_model.py/_idx_/_joint_): staged training —
(I) VQGAN reconstruction + codebook + GAN, (II) code-index prediction
via cross-entropy on frozen-VQGAN codes, (III) joint generator tuning
with fuse blocks. EMA params maintained like base_model
(ref:basicsr/models/base_model.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.codeformer import CodeFormer, VQAutoEncoder, VQGANDiscriminator
from .losses import gan_loss


def ema_update(ema_params, params, decay: float = 0.999):
    return jax.tree.map(lambda e, p: e * decay + p * (1 - decay), ema_params, params)


@dataclass
class VQGANTrainer:
    """Stage I: VQ autoencoder + patch discriminator."""

    model: VQAutoEncoder
    disc: VQGANDiscriminator
    l1_weight: float = 1.0
    codebook_weight: float = 1.0
    gan_weight: float = 0.8

    def make_steps(self, g_tx, d_tx):
        def g_loss_fn(g_params, d_params, batch):
            rec, cb_loss, _ = self.model.apply(g_params, batch["gt"])
            l1 = jnp.mean(jnp.abs(rec - batch["gt"]))
            adv = gan_loss(self.disc.apply(d_params, rec), True, "hinge")
            total = (self.l1_weight * l1 + self.codebook_weight * cb_loss
                     + self.gan_weight * adv)
            return total, {"l1": l1, "codebook": cb_loss, "adv": adv}

        def d_loss_fn(d_params, g_params, batch):
            rec, _, _ = self.model.apply(g_params, batch["gt"])
            rec = jax.lax.stop_gradient(rec)
            real = gan_loss(self.disc.apply(d_params, batch["gt"]), True, "hinge")
            fake = gan_loss(self.disc.apply(d_params, rec), False, "hinge")
            return 0.5 * (real + fake), {"d_real": real, "d_fake": fake}

        @jax.jit
        def train_step(g_params, d_params, g_opt, d_opt, batch):
            (gl, gm), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                g_params, d_params, batch)
            g_updates, g_opt = g_tx.update(g_grads, g_opt, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            (dl, dm), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                d_params, g_params, batch)
            d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
            return g_params, d_params, g_opt, d_opt, {**gm, **dm, "g": gl, "d": dl}

        return train_step


@dataclass
class CodeFormerStageII:
    """Stage II: transformer code prediction — cross-entropy between the
    predicted code logits on LQ input and the frozen VQGAN's GT code
    indices (ref:basicsr/models/codeformer_idx_model.py)."""

    model: CodeFormer

    def make_step(self, tx):
        def loss_fn(params, batch):
            logits, _ = self.model.apply(params, batch["lq"], code_only=True)
            # GT indices from the (frozen, shared) encoder+quantizer on GT
            def gt_codes(p, x):
                z = self.model.apply(p, x, method=lambda m, xx: m.encoder(xx))
                _, _, idx = self.model.apply(
                    p, z, method=lambda m, zz: m.quantize(zz))
                return idx.reshape(idx.shape[0], -1)

            idx = jax.lax.stop_gradient(gt_codes(params, batch["gt"]))
            logp = jax.nn.log_softmax(logits, axis=-1)
            onehot = jax.nn.one_hot(idx, logits.shape[-1])
            ce = -jnp.mean(jnp.sum(onehot * logp, axis=-1))
            acc = jnp.mean((jnp.argmax(logits, -1) == idx).astype(jnp.float32))
            return ce, {"ce": ce, "code_acc": acc}

        @jax.jit
        def train_step(params, opt_state, batch):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return train_step


@dataclass
class CodeFormerStageIII:
    """Stage III: joint tuning with fuse blocks — L1 + code CE + GAN
    (ref:basicsr/models/codeformer_joint_model.py)."""

    model: CodeFormer
    disc: VQGANDiscriminator
    l1_weight: float = 1.0
    gan_weight: float = 1.0
    fidelity_weight: float = 1.0

    def make_step(self, g_tx, d_tx):
        def g_loss_fn(params, d_params, batch):
            out, logits, _ = self.model.apply(params, batch["lq"],
                                              self.fidelity_weight)
            l1 = jnp.mean(jnp.abs(out - batch["gt"]))
            adv = gan_loss(self.disc.apply(d_params, out), True, "hinge")
            total = self.l1_weight * l1 + self.gan_weight * adv
            return total, {"l1": l1, "adv": adv}

        def d_loss_fn(d_params, params, batch):
            out, _, _ = self.model.apply(params, batch["lq"], self.fidelity_weight)
            out = jax.lax.stop_gradient(out)
            real = gan_loss(self.disc.apply(d_params, batch["gt"]), True, "hinge")
            fake = gan_loss(self.disc.apply(d_params, out), False, "hinge")
            return 0.5 * (real + fake), {}

        @jax.jit
        def train_step(params, d_params, g_opt, d_opt, batch):
            (gl, gm), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                params, d_params, batch)
            updates, g_opt = g_tx.update(grads, g_opt, params)
            params = optax.apply_updates(params, updates)
            (dl, _), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                d_params, params, batch)
            d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
            return params, d_params, g_opt, d_opt, {**gm, "g": gl, "d": dl}

        return train_step
