"""DDIM scheduler math tests: beta tables, timestep spacing, the
deterministic step, and add_noise/pred_x0 roundtrips."""

import numpy as np
import jax.numpy as jnp

from latentsync_tpu.config import SchedulerConfig
from latentsync_tpu.ops.ddim import DDIMScheduler


def make():
    return DDIMScheduler.create(SchedulerConfig())


def test_alphas_cumprod_table():
    s = make()
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(s.alphas_cumprod, acp, rtol=1e-6)
    # set_alpha_to_one=False → final alpha is alphas_cumprod[0]
    assert np.isclose(s.final_alpha_cumprod, acp[0])


def test_timesteps_leading_spacing():
    s = make()
    ts = s.timesteps(20)
    # leading spacing with offset 1: 951, 901, ..., 1
    assert ts[0] == 951 and ts[-1] == 1
    assert len(ts) == 20
    assert np.all(np.diff(ts) == -50)


def test_step_tables_prev_alpha():
    s = make()
    steps, a_t, a_prev = s.step_tables(20)
    # last step's prev timestep is negative → final_alpha_cumprod
    assert np.isclose(a_prev[-1], s.final_alpha_cumprod)
    np.testing.assert_allclose(a_t, s.alphas_cumprod[steps], rtol=1e-6)
    np.testing.assert_allclose(a_prev[:-1], s.alphas_cumprod[steps[1:]], rtol=1e-6)


def test_full_denoise_recovers_x0_for_perfect_eps(rng):
    """If the model predicts the exact noise, DDIM must land on x0.

    Run in f64: at t=951 alpha_cumprod ~3e-3, so the x0 division amplifies
    f32 rounding beyond a meaningful tolerance."""
    import jax

    with jax.enable_x64(True):
        s = make()
        x0 = jnp.asarray(rng.standard_normal((1, 4, 8, 8)))
        noise = jnp.asarray(rng.standard_normal((1, 4, 8, 8)))
        steps, a_t, a_prev = s.step_tables(20)
        a_t, a_prev = a_t.astype(np.float64), a_prev.astype(np.float64)
        # start from x_T for the first inference timestep
        x = s.add_noise(x0, noise, jnp.asarray(steps[0]))
        for j in range(len(steps)):
            # perfect eps at current sample: eps = (x - sqrt(a) x0)/sqrt(1-a)
            eps = (x - jnp.sqrt(a_t[j]) * x0) / jnp.sqrt(1 - a_t[j])
            x = DDIMScheduler.step(eps, x, a_t[j], a_prev[j])
        # set_alpha_to_one=False: the trajectory terminates at alpha_cumprod[0],
        # i.e. sqrt(acp0)·x0 + sqrt(1-acp0)·eps, not exactly x0
        acp0 = s.final_alpha_cumprod
        expected = np.sqrt(acp0) * np.asarray(x0) + np.sqrt(1 - acp0) * np.asarray(noise)
        # alpha tables are stored f32; trajectory math in f64
        np.testing.assert_allclose(np.asarray(x), expected, atol=1e-5)


def test_pred_x0_inverts_add_noise(rng):
    s = make()
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 4)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 4, 4, 4)).astype(np.float32))
    t = jnp.asarray([100, 700])
    xt = s.add_noise(x0, noise, t)
    rec = s.pred_x0(noise, xt, t)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)
