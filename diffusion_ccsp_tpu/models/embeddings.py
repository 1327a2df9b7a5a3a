"""Time-step embeddings.

Parity: reference ``networks/denoise_fn.py:38-50`` (SinusoidalPosEmb) and
``denoise_fn.py:259-264`` (Linear–Mish–Linear time MLP).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


class SinusoidalTimeEmbedding(nn.Module):
    """sin/cos positional embedding of (float) diffusion timesteps."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        # t: [...] -> [..., dim]
        half = self.dim // 2
        freq = math.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -freq)
        args = t[..., None].astype(jnp.float32) * freqs
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(nn.softplus(x))


class TimeMLP(nn.Module):
    """Sinusoidal embedding -> Linear(4h) -> Mish -> Linear(h)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = SinusoidalTimeEmbedding(self.hidden_dim)(t)
        x = nn.Dense(self.hidden_dim * 4)(x)
        x = mish(x)
        x = nn.Dense(self.hidden_dim)(x)
        return x
