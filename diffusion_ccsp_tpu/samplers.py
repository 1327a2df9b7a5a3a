"""Annealed MCMC samplers (ULA / ULA+ / MALA / HMC) as scan-compatible steps.

Capability parity: reference ``networks/ddpm.py:917-1128``. The reference runs
these as host-side Python loops launching one CUDA graph per inner step; here
each sampler is a pure function over ``[B, N, P]`` state that runs inside the
``lax.scan`` reverse-diffusion chain, so the whole T=1000-step trajectory (with
all inner MCMC iterations) compiles to a single XLA computation.

Design notes / deliberate improvements over the reference:
- ULA+'s per-timestep sample counts (4/8/12/16 over quarters,
  ``ddpm.py:297-301``) become a static-length inner loop of ``max_steps``
  iterations masked by ``i < samples_per_step[t]``.
- MALA/HMC acceptance is per *graph* (energies segment-summed per problem)
  rather than the reference's accidental per-node-row acceptance
  (``ddpm.py:1032-1041`` mixes scalar energies with per-row proposal terms).
- Conditioned (container) pose rows are clamped after every inner step, not
  just after the whole ``sample_step`` (reference clamps only at
  ``ddpm.py:334``), so constraint energies always see the true container pose.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


#: score_fn(x, t) -> grad of log-prob, shape of x ([B, N, P])
ScoreFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
#: logp_fn(x, t) -> per-graph log-prob [B]
LogpFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class MCMCConfig:
    kind: str = "none"  # none | ULA | ULA+ | MALA | HMC
    samples_per_step: int = 10
    #: run the MCMC inner loop only every k-th diffusion step
    #: (reference ``ddpm.py:330-331``).
    ebm_per_steps: int = 1
    hmc_leapfrog_steps: int = 2
    hmc_damping: float = 0.0
    #: mass_diag_sqrt = mass_scale * betas (reference ``ddpm.py:316``).
    hmc_mass_scale: float = 9.0

    @property
    def needs_energy(self) -> bool:
        return self.kind in ("MALA", "HMC")


def ula_plus_samples_per_step(num_timesteps: int) -> np.ndarray:
    """4/8/12/16 inner steps over ascending-t quarters (ref ``ddpm.py:297-301``)."""
    n = num_timesteps // 4
    out = np.concatenate(
        [np.full(n, 4), np.full(n, 8), np.full(n, 12), np.full(n, 16)]
    )
    if out.shape[0] < num_timesteps:  # remainder when T % 4 != 0
        out = np.concatenate([out, np.full(num_timesteps - out.shape[0], 16)])
    return out.astype(np.int32)


def _masked_sq_sum(x: jnp.ndarray, free_mask: jnp.ndarray) -> jnp.ndarray:
    """sum over nodes/features of x**2, restricted to free (real, non-cond)
    rows -> [B]."""
    return (x * x * free_mask[..., None]).sum(axis=(-2, -1))


def ula_step(
    x: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    score_fn: ScoreFn,
    step_sizes: jnp.ndarray,
    samples_per_step: jnp.ndarray,
    max_steps: int,
    clamp_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Unadjusted Langevin: x += grad*ss + N(0, 2*ss). Ref ``ddpm.py:940-966``."""
    ss = step_sizes[t]
    std = jnp.sqrt(2.0 * ss)
    n_active = samples_per_step[t]

    def body(i, carry):
        x, key = carry
        key, sub = jax.random.split(key)
        grad = score_fn(x, t)
        noise = jax.random.normal(sub, x.shape, x.dtype) * std
        x_new = clamp_fn(x + grad * ss + noise)
        x = jnp.where(i < n_active, x_new, x)
        return (x, key)

    x, _ = jax.lax.fori_loop(0, max_steps, body, (x, key))
    return x


def mala_step(
    x: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    score_fn: ScoreFn,
    logp_fn: LogpFn,
    step_sizes: jnp.ndarray,
    num_steps: int,
    free_mask: jnp.ndarray,
    clamp_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Metropolis-adjusted Langevin with per-graph accept/reject.

    Ref ``ddpm.py:999-1047``; proposal/reversal log-densities restricted to
    free pose rows so padding and conditioned rows don't bias acceptance.

    Returns ``(x, mean_accept)`` — the mean acceptance probability over inner
    steps and graphs, the signal the reference tunes step sizes against
    (rolling acceptance tracking, ``ddpm.py:969-996``).
    """
    ss = step_sizes[t]
    std = jnp.sqrt(2.0 * ss)

    def body(i, carry):
        x, key, acc = carry
        key, k_noise, k_u = jax.random.split(key, 3)
        grad = score_fn(x, t)
        mu = x + grad * ss
        x_hat = clamp_fn(mu + jax.random.normal(k_noise, x.shape, x.dtype) * std)

        logp_x = logp_fn(x, t)
        logp_x_hat = logp_fn(x_hat, t)
        # N(mu, std) log-densities (constant terms cancel in the ratio)
        logq_reverse = -_masked_sq_sum(x - mu, free_mask) / (2.0 * std**2)
        logq_forward = -_masked_sq_sum(x_hat - mu, free_mask) / (2.0 * std**2)

        logp_accept = logp_x_hat - logp_x + logq_reverse - logq_forward
        u = jax.random.uniform(k_u, logp_accept.shape)
        accept = (jnp.log(u) < logp_accept)[:, None, None]
        x = jnp.where(accept, x_hat, x)
        acc = acc + accept.astype(x.dtype).mean()
        return (x, key, acc)

    x, _, acc = jax.lax.fori_loop(
        0, num_steps, body, (x, key, jnp.zeros((), x.dtype))
    )
    return x, acc / jnp.maximum(num_steps, 1)


def hmc_step(
    x: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    score_fn: ScoreFn,
    logp_fn: LogpFn,
    step_sizes: jnp.ndarray,
    mass_diag_sqrt: jnp.ndarray,
    num_steps: int,
    num_leapfrog: int,
    damping: float,
    free_mask: jnp.ndarray,
    clamp_fn: Callable[[jnp.ndarray], jnp.ndarray],
) -> jnp.ndarray:
    """Annealed HMC (MUHA, arXiv:2302.11552) with partial momentum refresh and
    per-graph Metropolis correction. Ref ``ddpm.py:917-937,1050-1128``.

    Returns ``(x, mean_accept)`` like :func:`mala_step`.
    """
    ss = step_sizes[t]
    m_sqrt = mass_diag_sqrt[t]
    m = m_sqrt**2

    def leapfrog(x, v):
        def lf_body(_, carry):
            x, v = carry
            v = v + 0.5 * ss * score_fn(x, t)
            x = clamp_fn(x + ss * v / m)
            v = v + 0.5 * ss * score_fn(x, t)
            return (x, v)

        return jax.lax.fori_loop(0, num_leapfrog, lf_body, (x, v))

    def body(i, carry):
        x, v, key, acc = carry
        key, k_eps, k_u = jax.random.split(key, 3)
        eps = jax.random.normal(k_eps, x.shape, x.dtype)
        v_prime = v * damping + np.sqrt(1.0 - damping**2) * eps * m_sqrt
        x_next, v_next = leapfrog(x, v_prime)

        # Gaussian momentum log-probs under N(0, m_sqrt)
        logp_v_p = -_masked_sq_sum(v_prime / m_sqrt, free_mask) / 2.0
        logp_v = -_masked_sq_sum(v_next / m_sqrt, free_mask) / 2.0
        logp_x = logp_fn(x, t)
        logp_x_hat = logp_fn(x_next, t)

        logp_accept = (logp_x_hat + logp_v) - (logp_x + logp_v_p)
        u = jax.random.uniform(k_u, logp_accept.shape)
        accept = (jnp.log(u) < logp_accept)[:, None, None]
        x = jnp.where(accept, x_next, x)
        v = jnp.where(accept, v_next, v_prime)
        acc = acc + accept.astype(x.dtype).mean()
        return (x, v, key, acc)

    key, k_v = jax.random.split(key)
    v0 = jax.random.normal(k_v, x.shape, x.dtype) * m_sqrt
    x, _, _, acc = jax.lax.fori_loop(
        0, num_steps, body, (x, v0, key, jnp.zeros((), x.dtype))
    )
    return x, acc / jnp.maximum(num_steps, 1)
