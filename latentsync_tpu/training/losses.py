"""Training losses: cosine-BCE sync loss, mixed noise, one-step x̂₀.

Re-derivations of the reference's loss toolkit:
- cosine_loss: BCE over cosine similarity of SyncNet embeddings
  (ref:latentsync/utils/util.py:287-295)
- mixed noise: shared-across-frames noise blended with per-frame noise
  (ref:scripts/train_unet.py:319-332, refs arXiv 2305.10474/2308.09716)
- one_step_sampling: x̂₀ from ε for pixel-space supervision
  (ref:latentsync/utils/util.py:243-260) — lives on DDIMScheduler.pred_x0
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def cosine_bce_loss(vision_embeds, audio_embeds, labels, eps: float = 1e-7):
    """BCE(cos_sim(v, a), y) per sample. Embeddings are unit vectors so
    cos-sim is a dot product; clipping mirrors torch BCELoss input-domain
    behavior on the [-1, 1] similarity.

    The similarity is accumulated in f32 regardless of the embedding
    dtype (the f32-norms/softmax mixed-precision policy of unet3d):
    near-collapsed bf16 embeddings round cos to exactly 1.0, where the
    clip's zero gradient freezes training permanently."""
    sims = jnp.sum(vision_embeds.astype(jnp.float32)
                   * audio_embeds.astype(jnp.float32), axis=-1)
    p = jnp.clip(sims, eps, 1.0 - eps)
    y = labels.astype(jnp.float32)
    return -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))


def mixed_noise(rng, shape, alpha: float = 1.0):
    """Per-frame noise + shared-across-frames noise, variance-normalized:
    (eps_i + alpha·eps_shared) / sqrt(1 + alpha²). shape = (B, F, ...)."""
    k1, k2 = jax.random.split(rng)
    per_frame = jax.random.normal(k1, shape)
    shared_shape = (shape[0], 1) + shape[2:]
    shared = jax.random.normal(k2, shared_shape)
    return (per_frame + alpha * shared) / jnp.sqrt(1.0 + alpha**2)


def masked_l1(pred, target, mask=None):
    d = jnp.abs(pred - target)
    if mask is not None:
        return jnp.sum(d * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(d)


def charbonnier(pred, target, eps: float = 1e-12):
    """Charbonnier loss (basicsr parity, ref:basicsr/losses/losses.py)."""
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps))


def total_variation(x):
    """TV loss on (B, H, W, C) (basicsr parity)."""
    dh = jnp.mean(jnp.abs(x[:, 1:] - x[:, :-1]))
    dw = jnp.mean(jnp.abs(x[:, :, 1:] - x[:, :, :-1]))
    return dh + dw


def gan_loss(pred, target_is_real: bool, mode: str = "hinge"):
    """GAN losses (ref:basicsr/losses/losses.py GANLoss): vanilla BCE,
    lsgan MSE, hinge, wgan."""
    if mode == "vanilla":
        labels = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * labels + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    if mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean((pred - target) ** 2)
    if mode == "hinge":
        if target_is_real:
            return jnp.mean(jax.nn.relu(1.0 - pred))
        return jnp.mean(jax.nn.relu(1.0 + pred))
    if mode == "wgan":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise ValueError(f"unknown gan mode {mode}")


def r1_penalty(disc_fn, params, real, rng=None):
    """R1 gradient penalty (ref:basicsr/losses/losses.py r1_penalty)."""
    def score(x):
        return jnp.sum(disc_fn(params, x))

    grads = jax.grad(score)(real)
    return jnp.mean(jnp.sum(grads**2, axis=tuple(range(1, grads.ndim))))


def gradient_penalty_loss(disc_fn, params, real, fake, rng):
    """WGAN-GP interpolated gradient penalty
    (ref:basicsr/losses/losses.py gradient_penalty_loss): unit-norm
    target on ∇D at random interpolates of real/fake."""
    alpha_shape = (real.shape[0],) + (1,) * (real.ndim - 1)
    alpha = jax.random.uniform(rng, alpha_shape)
    interp = alpha * real + (1.0 - alpha) * fake

    def score(x):
        return jnp.sum(disc_fn(params, x))

    grads = jax.grad(score)(interp)
    norms = jnp.sqrt(
        jnp.sum(grads**2, axis=tuple(range(1, grads.ndim))) + 1e-12
    )
    return jnp.mean((norms - 1.0) ** 2)


def g_path_regularize(fake_img, latents_grad_fn, mean_path_length,
                      decay: float = 0.01, rng=None):
    """StyleGAN2 path-length regularization
    (ref:basicsr/losses/losses.py g_path_regularize): noise-weighted
    generator Jacobian norm pulled toward its running mean.

    `latents_grad_fn(noise_weighted_grad_seed)` must return
    d(sum(fake·noise))/d(latents); in JAX the caller provides it via
    jax.grad over its generator apply — kept as a callback so this
    helper stays model-agnostic."""
    noise = jax.random.normal(rng, fake_img.shape) / math.sqrt(
        fake_img.shape[1] * fake_img.shape[2]
    )
    grad = latents_grad_fn(noise)
    path_lengths = jnp.sqrt(
        jnp.mean(jnp.sum(grad**2, axis=tuple(range(1, grad.ndim))))
    )
    path_mean = mean_path_length + decay * (path_lengths - mean_path_length)
    penalty = (path_lengths - path_mean) ** 2
    return penalty, path_lengths, path_mean
