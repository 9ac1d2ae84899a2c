"""Learning-rate schedules (basicsr parity, TPU-idiomatic as pure
optax-style `step -> lr` functions).

Re-derivations of ref:basicsr/models/lr_scheduler.py:
- MultiStepRestartLR (:9-40): milestone decay with optional restarts
  that reset the LR to base·restart_weight at given steps.
- CosineAnnealingRestartLR (:48-96): cosine annealing over consecutive
  periods, each restarting at base·restart_weight[i], floor eta_min.

Both are closed-form in the step index (no Python state), so they can
be passed straight to `optax.scale_by_schedule` / injected into
`optax.adamw(learning_rate=...)` and traced under jit.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def multistep_restart_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    restarts: Sequence[int] = (0,),
    restart_weights: Sequence[float] = (1.0,),
):
    """γ-decay at each milestone; at a restart step the decay count
    resets and the base is scaled by the restart weight
    (ref:lr_scheduler.py:9-40 counts milestones since the last restart)."""
    if len(restarts) != len(restart_weights):
        raise ValueError("restarts and restart_weights must pair up")
    pairs = sorted(zip(restarts, restart_weights))
    restarts = np.asarray([r for r, _ in pairs])
    weights = np.asarray([w for _, w in pairs])
    ms = np.asarray(sorted(milestones))

    def schedule(step):
        step = jnp.asarray(step)
        # index of the active restart segment
        seg = jnp.sum(step >= restarts) - 1
        seg = jnp.clip(seg, 0, len(restarts) - 1)
        seg_start = jnp.asarray(restarts)[seg]
        weight = jnp.asarray(weights)[seg]
        # milestones are absolute steps; count those passed inside the
        # active segment
        passed = jnp.sum((jnp.asarray(ms) > seg_start) & (jnp.asarray(ms) <= step))
        return base_lr * weight * (gamma ** passed)

    return schedule


def cosine_annealing_restart_lr(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] | None = None,
    eta_min: float = 1e-7,
):
    """Cosine annealing through consecutive `periods`, each starting at
    base·weight[i] and annealing to eta_min (ref:lr_scheduler.py:48-96)."""
    if restart_weights is None:
        restart_weights = [1.0] * len(periods)
    if len(periods) != len(restart_weights):
        raise ValueError("periods and restart_weights must pair up")
    starts = np.concatenate([[0], np.cumsum(periods)[:-1]])
    ends = np.cumsum(periods)

    def schedule(step):
        step = jnp.asarray(step)
        idx = jnp.sum(step >= jnp.asarray(ends))
        idx = jnp.clip(idx, 0, len(periods) - 1)
        start = jnp.asarray(starts)[idx]
        period = jnp.asarray(np.asarray(periods))[idx]
        weight = jnp.asarray(np.asarray(restart_weights))[idx]
        frac = jnp.clip((step - start) / jnp.maximum(period, 1), 0.0, 1.0)
        return eta_min + 0.5 * (base_lr * weight - eta_min) * (
            1 + jnp.cos(jnp.pi * frac)
        )

    return schedule


def warmup_wrap(schedule, warmup_steps: int, init_frac: float = 0.0):
    """Linear warmup in front of any schedule (train_unet warmup
    semantics, ref:scripts/train_unet.py optimizer setup)."""

    def wrapped(step):
        step = jnp.asarray(step)
        warm = init_frac + (1.0 - init_frac) * jnp.minimum(
            step / max(warmup_steps, 1), 1.0
        )
        return schedule(step) * jnp.where(warmup_steps > 0, warm, 1.0)

    return wrapped
