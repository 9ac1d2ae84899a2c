"""Training infrastructure: LR schedules (basicsr lr_scheduler parity),
EnlargedSampler, Prefetcher, GAN penalties."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentsync_tpu.training.loader import (
    EnlargedSampler,
    Prefetcher,
    batched_indices,
)
from latentsync_tpu.training.lr_schedules import (
    cosine_annealing_restart_lr,
    multistep_restart_lr,
    warmup_wrap,
)


def test_multistep_restart_lr_decay_and_restart():
    sched = multistep_restart_lr(
        1.0, milestones=[10, 20], gamma=0.1,
        restarts=[0, 30], restart_weights=[1.0, 0.5],
    )
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(9)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(0.1)
    assert float(sched(20)) == pytest.approx(0.01)
    # restart at 30: milestone count resets, base scaled by 0.5
    assert float(sched(30)) == pytest.approx(0.5)
    assert float(sched(100)) == pytest.approx(0.5)


def test_cosine_annealing_restart_lr():
    sched = cosine_annealing_restart_lr(
        1.0, periods=[10, 10], restart_weights=[1.0, 0.5], eta_min=0.0
    )
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(5)) == pytest.approx(0.5, abs=1e-6)   # cos midpoint
    assert float(sched(10)) == pytest.approx(0.5)            # restart ×0.5
    assert float(sched(15)) == pytest.approx(0.25, abs=1e-6)
    # clamps at the end of the last period
    assert float(sched(40)) == pytest.approx(0.0, abs=1e-6)


def test_warmup_wrap():
    sched = warmup_wrap(lambda s: jnp.asarray(2.0), warmup_steps=10)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(5)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(2.0)
    assert float(sched(50)) == pytest.approx(2.0)


def test_enlarged_sampler_shards_and_shuffles():
    samplers = [
        EnlargedSampler(10, world_size=4, rank=r, ratio=2, seed=3)
        for r in range(4)
    ]
    all_idx = []
    for s in samplers:
        idx = list(s)
        assert len(idx) == len(s) == 5  # ceil(20/4)=5 per rank
        all_idx.extend(idx)
    assert len(all_idx) == 20
    assert set(all_idx) <= set(range(10))
    # every sample appears (ratio 2 over 10 items in 20 slots)
    assert set(all_idx) == set(range(10))
    # epoch reshuffles deterministically
    s0 = EnlargedSampler(10, 4, 0, ratio=2, seed=3)
    a = list(s0)
    s0.set_epoch(1)
    b = list(s0)
    assert a != b
    s0.set_epoch(0)
    assert list(s0) == a


def test_enlarged_sampler_no_shuffle_rank_stride():
    s = EnlargedSampler(8, world_size=2, rank=1, ratio=1, shuffle=False)
    assert list(s) == [1, 3, 5, 7]


def test_prefetcher_yields_all_and_propagates_errors():
    out = list(Prefetcher(iter(range(7)), lambda i: i * i, depth=3))
    assert out == [0, 1, 4, 9, 16, 25, 36]

    def boom(i):
        if i == 2:
            raise RuntimeError("bad sample")
        return i

    pf = Prefetcher(iter(range(5)), boom)
    with pytest.raises(RuntimeError, match="bad sample"):
        list(pf)


def test_batched_indices():
    assert list(batched_indices(range(7), 3)) == [[0, 1, 2], [3, 4, 5]]
    assert list(batched_indices(range(7), 3, drop_last=False))[-1] == [6]


def test_gradient_penalty_and_path_regularize():
    from latentsync_tpu.training.losses import (
        g_path_regularize,
        gradient_penalty_loss,
    )

    def disc(params, x):
        return jnp.sum(x * params, axis=(1, 2, 3))

    params = jnp.ones((4, 4, 1)) * 2.0
    real = jnp.ones((2, 4, 4, 1))
    fake = jnp.zeros((2, 4, 4, 1))
    gp = gradient_penalty_loss(disc, params, real, fake, jax.random.PRNGKey(0))
    # ∇D = params (constant 2) → per-sample norm = sqrt(16·4) = 8 → (8-1)² = 49
    assert float(gp) == pytest.approx(49.0, rel=1e-4)

    fake_img = jnp.ones((2, 8, 8, 3))
    penalty, lengths, mean = g_path_regularize(
        fake_img, lambda noise: noise * 3.0, jnp.asarray(0.0),
        rng=jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(penalty))
    assert float(lengths) > 0
