"""Diffusion noise schedules and derived coefficient tables.

Parity: reference ``networks/ddpm.py:126-226``. All coefficient arrays are
precomputed on host in float64 then cast, stored in one immutable pytree so
the whole table rides into ``jit``/``scan`` as constants — the reference's
``eval``'d ``step_sizes`` string (``ddpm.py:207``) becomes a plain array.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule (Nichol & Dhariwal). Reference ``ddpm.py:152-162``."""
    steps = timesteps + 1
    x = np.linspace(0, steps, steps, dtype=np.float64)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0.0, 0.999)


def sigmoid_beta_schedule(
    timesteps: int, start: float = -3, end: float = 3, tau: float = 1.0,
    clip_min: float = 1e-9,
) -> np.ndarray:
    """Sigmoid gamma schedule (arXiv:2301.10972). Reference ``ddpm.py:138-149``."""
    steps = timesteps + 1
    x = np.linspace(0, steps, steps, dtype=np.float64)
    v_start = 1 / (1 + np.exp(-start / tau))
    v_end = 1 / (1 + np.exp(-end / tau))
    output = 1 / (1 + np.exp(-(x * (end - start) + start) / tau))
    betas = (v_end - output) / (v_end - v_start)
    return np.clip(betas, clip_min, 0.999)


def simple_linear_schedule(t: np.ndarray, clip_min: float = 1e-9) -> np.ndarray:
    """gamma(t) = 1 - t (arXiv:2301.10972). Reference ``ddpm.py:126-131``."""
    return np.clip(1 - t, clip_min, 1.0)


class DiffusionSchedule(struct.PyTreeNode):
    """All per-timestep coefficients needed by training and sampling.

    Derivations follow reference ``ddpm.py:186-226`` exactly (cumulative alpha
    products, posterior mean/variance coefficients, log-variance clipped at
    1e-20).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    #: sqrt(1/(1-acum)) — the EBM gradient scale (reference ``ddpm.py:215``).
    sqrt_recip_one_minus_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    #: MCMC step size per timestep (default 2*betas, ref ``ddpm.py:207``).
    step_sizes: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        kind: str = "cosine",
        betas: np.ndarray | None = None,
        step_size_scale: float = 2.0,
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        if betas is None:
            if kind == "cosine":
                betas = cosine_beta_schedule(timesteps)
            elif kind == "sigmoid":
                betas = sigmoid_beta_schedule(timesteps)
            else:
                raise ValueError(f"unknown schedule kind {kind!r}")
        betas = np.asarray(betas, np.float64)

        alphas = 1.0 - betas
        acum = np.cumprod(alphas, axis=0)
        acum_prev = np.append(1.0, acum[:-1])

        posterior_variance = betas * (1.0 - acum_prev) / (1.0 - acum)

        # Keep the coefficient tables host-resident (uncommitted CPU arrays):
        # they are only ever closure constants of jitted functions, and
        # lowering embeds closure constants by *reading their value* — an
        # accelerator-resident array here forces a device->host fetch during
        # every fresh compile, which is the flaky/hanging op on tunneled TPU
        # transports. Uncommitted placement imposes no device constraint on
        # the computations that capture them.
        import jax

        try:
            _host = jax.devices("cpu")[0]
        except RuntimeError:
            _host = None

        def arr(x):
            a = np.asarray(x, dtype=dtype)
            if _host is None:
                return jnp.asarray(a)
            with jax.default_device(_host):
                return jnp.asarray(a)

        return cls(
            betas=arr(betas),
            alphas_cumprod=arr(acum),
            alphas_cumprod_prev=arr(acum_prev),
            sqrt_alphas_cumprod=arr(np.sqrt(acum)),
            sqrt_one_minus_alphas_cumprod=arr(np.sqrt(1.0 - acum)),
            log_one_minus_alphas_cumprod=arr(np.log(1.0 - acum)),
            sqrt_recip_alphas_cumprod=arr(np.sqrt(1.0 / acum)),
            sqrt_recipm1_alphas_cumprod=arr(np.sqrt(1.0 / acum - 1.0)),
            sqrt_recip_one_minus_alphas_cumprod=arr(np.sqrt(1.0 / (1.0 - acum))),
            posterior_variance=arr(posterior_variance),
            posterior_log_variance_clipped=arr(
                np.log(np.maximum(posterior_variance, 1e-20))
            ),
            posterior_mean_coef1=arr(betas * np.sqrt(acum_prev) / (1.0 - acum)),
            posterior_mean_coef2=arr((1.0 - acum_prev) * np.sqrt(alphas) / (1.0 - acum)),
            step_sizes=arr(step_size_scale * betas),
        )


def extract(table: jnp.ndarray, t: jnp.ndarray, broadcast_ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients for a batch of timesteps ``t`` and
    reshape for broadcasting against a rank-``broadcast_ndim`` tensor whose
    leading axis is the batch. Reference ``ddpm.py:108-111``.
    """
    out = table[t]
    return out.reshape(out.shape + (1,) * (broadcast_ndim - out.ndim))
