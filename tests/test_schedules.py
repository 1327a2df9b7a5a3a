"""Unit tests for diffusion schedules against closed-form identities."""

import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.ops.schedules import (
    DiffusionSchedule,
    cosine_beta_schedule,
    extract,
    sigmoid_beta_schedule,
)


def test_cosine_schedule_values():
    betas = cosine_beta_schedule(1000)
    assert betas.shape == (1000,)
    assert np.all(betas >= 0) and np.all(betas <= 0.999)
    # closed form: alphas_cumprod[t] = f(t+1)/f(0) with
    # f(x) = cos((x/steps + s)/(1+s) * pi/2)^2
    s, steps = 0.008, 1001
    x = np.linspace(0, steps, steps)
    f = np.cos(((x / steps) + s) / (1 + s) * np.pi / 2) ** 2
    acum_expected = (f / f[0])[1:]
    acum = np.cumprod(1 - betas)
    # betas are clipped at 0.999, so the tail of the cumprod deviates from the
    # closed form by ~1e-9 absolute
    np.testing.assert_allclose(acum, acum_expected, rtol=1e-6, atol=1e-8)


def test_sigmoid_schedule_monotone_bounds():
    betas = sigmoid_beta_schedule(500)
    assert betas.shape == (501,)
    assert np.all(betas >= 0) and np.all(betas <= 0.999)


def test_schedule_identities():
    sched = DiffusionSchedule.create(timesteps=100)
    acum = np.asarray(sched.alphas_cumprod, np.float64)
    betas = np.asarray(sched.betas, np.float64)

    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod) ** 2, acum, rtol=1e-4, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alphas_cumprod) ** 2, 1 - acum, rtol=1e-4, atol=1e-7
    )
    # posterior mean coefficients sum: c1 + c2*sqrt(alpha_cum_t/acum_prev)… use
    # the standard identity  c1*sqrt(acum) + c2*sqrt(acum) ≈ … instead verify
    # against direct formulas
    acum_prev = np.append(1.0, acum[:-1])
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance),
        betas * (1 - acum_prev) / (1 - acum),
        rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef1),
        betas * np.sqrt(acum_prev) / (1 - acum),
        rtol=1e-4, atol=1e-7,
    )
    # step sizes default to 2*betas (reference ddpm.py:207)
    np.testing.assert_allclose(np.asarray(sched.step_sizes), 2 * betas, rtol=1e-6)


def test_q_sample_coefficient_consistency():
    """x_t = sqrt(acum)x0 + sqrt(1-acum)eps must have unit variance for unit
    x0/eps variance."""
    sched = DiffusionSchedule.create(timesteps=50)
    total = (
        np.asarray(sched.sqrt_alphas_cumprod) ** 2
        + np.asarray(sched.sqrt_one_minus_alphas_cumprod) ** 2
    )
    np.testing.assert_allclose(total, 1.0, rtol=1e-5)


def test_extract_broadcasting():
    table = jnp.arange(10.0)
    t = jnp.asarray([2, 5])
    out = extract(table, t, 3)
    assert out.shape == (2, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [2.0, 5.0])
