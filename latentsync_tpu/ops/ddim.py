"""DDIM scheduler as pure jittable math.

Functional re-derivation of the diffusers DDIMScheduler behavior the
reference depends on (ref:configs/scheduler_config.json: scaled_linear
betas 0.00085→0.012, 1000 train steps, steps_offset=1, clip_sample=False,
set_alpha_to_one=False, epsilon prediction; consumed at
ref:latentsync/pipelines/lipsync_pipeline.py:424,540-568 and
ref:scripts/train_unet.py:337-342).

All tables are precomputed NumPy constants; the per-step update is a pure
function of (eps, alpha_t, alpha_prev, x_t) so the whole 20-step loop can
live inside one `lax.fori_loop` under jit with latents resident in HBM.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig


def make_beta_schedule(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(
                cfg.beta_start**0.5,
                cfg.beta_end**0.5,
                cfg.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    if cfg.beta_schedule == "linear":
        return np.linspace(
            cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64
        )
    raise ValueError(f"unknown beta schedule {cfg.beta_schedule}")


@dataclass(frozen=True)
class DDIMScheduler:
    """Precomputed diffusion tables + pure step functions."""

    config: SchedulerConfig
    alphas_cumprod: np.ndarray  # (T,)
    final_alpha_cumprod: float

    @classmethod
    def create(cls, config: SchedulerConfig = SchedulerConfig()) -> "DDIMScheduler":
        betas = make_beta_schedule(config)
        alphas_cumprod = np.cumprod(1.0 - betas)
        final = 1.0 if config.set_alpha_to_one else float(alphas_cumprod[0])
        return cls(
            config=config,
            alphas_cumprod=alphas_cumprod.astype(np.float32),
            final_alpha_cumprod=final,
        )

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending inference timesteps ("leading" spacing + offset 1)."""
        t = self.config
        if t.timestep_spacing == "leading":
            ratio = t.num_train_timesteps // num_inference_steps
            steps = (np.arange(num_inference_steps) * ratio).round()[::-1]
            steps = steps + t.steps_offset
        elif t.timestep_spacing == "trailing":
            ratio = t.num_train_timesteps / num_inference_steps
            steps = np.round(np.arange(t.num_train_timesteps, 0, -ratio)) - 1
        else:
            raise ValueError(f"unknown spacing {t.timestep_spacing}")
        return steps.astype(np.int32)

    def step_tables(self, num_inference_steps: int):
        """(timesteps, alpha_t, alpha_prev) arrays for the jitted loop."""
        steps = self.timesteps(num_inference_steps)
        ratio = self.config.num_train_timesteps // num_inference_steps
        prev = steps - ratio
        alpha_t = self.alphas_cumprod[steps]
        alpha_prev = np.where(
            prev >= 0,
            self.alphas_cumprod[np.clip(prev, 0, None)],
            self.final_alpha_cumprod,
        ).astype(np.float32)
        return steps, alpha_t.astype(np.float32), alpha_prev

    # -- pure functional updates -------------------------------------------

    @staticmethod
    def step(eps, sample, alpha_t, alpha_prev, clip_sample: bool = False):
        """One deterministic (eta=0) DDIM update x_t → x_{t-1}.

        Matches diffusers' epsilon-prediction path. alpha_t/alpha_prev are
        scalars (or broadcastable) from `step_tables`.
        """
        acc = jnp.promote_types(sample.dtype, jnp.float32)
        x = sample.astype(acc)
        e = eps.astype(acc)
        beta_t = 1.0 - alpha_t
        x0 = (x - jnp.sqrt(beta_t) * e) / jnp.sqrt(alpha_t)
        if clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        dir_xt = jnp.sqrt(1.0 - alpha_prev) * e
        prev = jnp.sqrt(alpha_prev) * x0 + dir_xt
        return prev.astype(sample.dtype)

    def add_noise(self, sample, noise, timesteps):
        """Forward process q(x_t | x_0) (training;
        ref:scripts/train_unet.py:337-342)."""
        acp = jnp.asarray(self.alphas_cumprod)[timesteps]
        while acp.ndim < sample.ndim:
            acp = acp[..., None]
        return jnp.sqrt(acp) * sample + jnp.sqrt(1.0 - acp) * noise

    def pred_x0(self, eps, sample, timesteps):
        """One-step x̂₀ from ε (training pixel supervision;
        ref:latentsync/utils/util.py:243-260)."""
        acp = jnp.asarray(self.alphas_cumprod)[timesteps]
        while acp.ndim < sample.ndim:
            acp = acp[..., None]
        x0 = (sample - jnp.sqrt(1.0 - acp) * eps) / jnp.sqrt(acp)
        if self.config.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0
