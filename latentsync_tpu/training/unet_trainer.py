"""Distributed UNet trainer (ref:scripts/train_unet.py:60-517, SURVEY §3.2).

TPU-native re-architecture:
- one `train_step` jitted over a Mesh: batch shards over the `data` axis;
  gradient sync is the psum XLA emits — no DDP wrapper, no GradScaler
  (bf16 needs no loss scaling; master weights stay f32)
- selective trainability (motion_modules./attentions. only,
  ref:train_unet.py:148-158, configs/unet/stage2.yaml trainable_modules)
  via an optax.masked transform instead of requires_grad mutation
- losses: ε-MSE + (pixel-space) one-step x̂₀ → VAE.decode → LPIPS on the
  lower half + TREPA + SyncNet cosine-BCE (ref:train_unet.py:360-409)
- gradient checkpointing via jax.checkpoint on block boundaries
- mixed/shared noise (ref:train_unet.py:319-332)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import LatentSyncConfig
from ..models.unet3d import UNet3DConditionModel
from ..models.vae import AutoencoderKL, scale_latents, unscale_latents
from ..models.syncnet import StableSyncNet
from ..ops.ddim import DDIMScheduler
from .losses import cosine_bce_loss, mixed_noise


def trainable_mask(params, trainable_modules: Tuple[str, ...]):
    """True where the '/' param path contains any trainable-module
    substring (the reference matches torch module-name substrings like
    'motion_modules.' / 'attentions.'; our paths use '_' separators so
    both spellings are accepted)."""
    subs = tuple(s.rstrip(".").replace(".", "_") for s in trainable_modules)

    def mask_tree(tree, path=""):
        if isinstance(tree, dict):
            return {k: mask_tree(v, path + "/" + k) for k, v in tree.items()}
        return any(s in path for s in subs) if subs else True

    return mask_tree(params)


@dataclass
class UNetTrainer:
    config: LatentSyncConfig
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        cfg = self.config
        self.unet = UNet3DConditionModel(cfg.unet, dtype=self.dtype)
        self.vae = AutoencoderKL(cfg.vae, dtype=self.dtype)
        self.syncnet = StableSyncNet(cfg.syncnet, dtype=self.dtype) if cfg.run.use_syncnet else None
        self.scheduler = DDIMScheduler.create(cfg.scheduler)

    def make_optimizer(self, params):
        cfg = self.config.run
        mask = trainable_mask(params, cfg.trainable_modules)
        not_mask = jax.tree.map(lambda m: not m, mask)
        # optax.masked passes unmasked updates through VERBATIM (raw
        # grads would become updates) — explicitly zero the frozen set.
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.masked(optax.adamw(cfg.lr), mask),
            optax.masked(optax.set_to_zero(), not_mask),
        )

    def make_train_step(
        self,
        vae_params=None,
        syncnet_params=None,
        perceptual_fn: Optional[Callable] = None,
        trepa_fn: Optional[Callable] = None,
    ):
        """Build the jitted train step.

        batch dict (already sharded over the mesh data axis):
          gt_pixels     (B, F, H, W, 3)   in [-1, 1]
          masked_pixels (B, F, H, W, 3)
          ref_pixels    (B, F, H, W, 3)
          masks         (B, F, h, w, 1)   latent-res keep-mask
          audio_embeds  (B, F, S, D)
          mel           (B, 80, 52, 1)    wav2lip mel for syncnet
        """
        cfg = self.config
        run = cfg.run
        scheduler = self.scheduler
        unet, vae, syncnet = self.unet, self.vae, self.syncnet
        vcfg = cfg.vae
        alphas = jnp.asarray(scheduler.alphas_cumprod)

        def loss_fn(params, batch, rng):
            b, f = batch["gt_pixels"].shape[:2]
            h = batch["gt_pixels"].shape[2]
            rng_t, rng_n = jax.random.split(rng)

            def enc(px):
                flat = px.reshape((b * f,) + px.shape[2:])
                z = vae.apply(vae_params, flat.astype(self.dtype), method="encode")
                return scale_latents(z, vcfg).reshape((b, f) + z.shape[1:]).astype(jnp.float32)

            gt_latents = enc(batch["gt_pixels"])
            masked_latents = enc(batch["masked_pixels"])
            ref_latents = enc(batch["ref_pixels"])

            masks = batch["masks"]
            if masks.shape[2] != gt_latents.shape[2]:
                # datasets hand back full-res masks; the UNet's mask
                # channel lives at latent res (ref:lipsync_pipeline.py:290)
                masks = jax.image.resize(
                    masks,
                    (b, f) + gt_latents.shape[2:4] + (1,),
                    method="nearest",
                )

            t = jax.random.randint(rng_t, (b,), 0, cfg.scheduler.num_train_timesteps)
            if run.use_mixed_noise:
                noise = mixed_noise(rng_n, gt_latents.shape, run.mixed_noise_alpha)
            else:
                noise = jax.random.normal(rng_n, gt_latents.shape)
            noisy = scheduler.add_noise(gt_latents, noise, t)  # t broadcasts over (B,F,h,w,C)
            unet_in = jnp.concatenate(
                [noisy, masks, masked_latents, ref_latents], axis=-1
            ).astype(self.dtype)
            eps_pred = unet.apply(params, unet_in, t, batch["audio_embeds"].astype(self.dtype))
            eps_pred = eps_pred.astype(jnp.float32)

            losses = {}
            losses["recon"] = jnp.mean((eps_pred - noise) ** 2)
            total = run.recon_loss_weight * losses["recon"]

            if run.pixel_space_supervise:
                x0_lat = scheduler.pred_x0(eps_pred, noisy, t)
                flat = unscale_latents(x0_lat, vcfg).reshape((b * f,) + x0_lat.shape[2:])
                x0_pix = vae.apply(vae_params, flat.astype(self.dtype), method="decode")
                x0_pix = x0_pix.reshape((b, f) + x0_pix.shape[1:]).astype(jnp.float32)

                if perceptual_fn is not None:
                    # lower half only (ref:train_unet.py:372-377)
                    losses["perceptual"] = perceptual_fn(
                        x0_pix[:, :, h // 2 :], batch["gt_pixels"][:, :, h // 2 :]
                    )
                    total += run.perceptual_loss_weight * losses["perceptual"]
                if trepa_fn is not None:
                    losses["trepa"] = trepa_fn(x0_pix, batch["gt_pixels"])
                    total += run.trepa_loss_weight * losses["trepa"]
                if syncnet is not None and syncnet_params is not None:
                    # stack frames into channels, lower half crop
                    vis = x0_pix[:, :, h // 2 :]  # (B, F, H/2, W, 3)
                    vis = jnp.moveaxis(vis, 1, -2)  # (B, H/2, W, F, 3)
                    vis = vis.reshape(vis.shape[:3] + (-1,))
                    v_emb, a_emb = syncnet.apply(
                        syncnet_params, vis.astype(self.dtype), batch["mel"].astype(self.dtype)
                    )
                    y = jnp.ones((b,), jnp.float32)
                    losses["sync"] = jnp.mean(cosine_bce_loss(v_emb, a_emb, y))
                    total += run.sync_loss_weight * losses["sync"]

            losses["total"] = total
            return total, losses

        def train_step(params, opt_state, batch, rng, tx):
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return loss_fn, train_step
