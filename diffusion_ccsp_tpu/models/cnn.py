"""CNN geometry encoders for the image input mode.

Capability parity: reference ``networks/denoise_fn.py:89-177`` —
GeomEncoderImage (3 x (conv3x3 + maxpool2 + relu) -> FC(hidden)),
GeomDecoderImage (FC -> 3 x transposed conv, sigmoid), GeomAutoEncoder, and
the pretrain-then-freeze workflow (``denoise_fn.py:127-131`` /
``train_encoders.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class GeomEncoderImage(nn.Module):
    """DxD binary mask -> hidden embedding."""

    in_features: int = 64
    hidden_dim: int = 256
    num_channel: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # x: [..., D*D] or [..., D, D]
        lead = x.shape[: -1 if x.shape[-1] == self.in_features**2 else -2]
        d = self.in_features
        h = x.reshape((-1, d, d, 1))
        for _ in range(3):
            h = nn.Conv(self.num_channel, (3, 3), padding="SAME")(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.relu(h)
        h = nn.Dropout(0.5, deterministic=deterministic)(h)
        h = h.reshape((h.shape[0], -1))
        h = nn.Dense(self.hidden_dim)(h)
        return h.reshape(lead + (self.hidden_dim,))


class GeomDecoderImage(nn.Module):
    """Embedding -> DxD mask logits (sigmoid applied)."""

    out_features: int = 64
    hidden_dim: int = 256
    num_channel: int = 32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        lead = z.shape[:-1]
        fd = self.out_features // 8
        h = nn.Dense(fd * fd * self.num_channel)(z)
        h = h.reshape((-1, fd, fd, self.num_channel))
        h = nn.relu(nn.ConvTranspose(self.num_channel, (2, 2), strides=(2, 2))(h))
        h = nn.relu(nn.ConvTranspose(self.num_channel, (2, 2), strides=(2, 2))(h))
        h = nn.sigmoid(nn.ConvTranspose(1, (2, 2), strides=(2, 2))(h))
        return h.reshape(lead + (self.out_features * self.out_features,))


class GeomAutoEncoder(nn.Module):
    in_features: int = 64
    hidden_dim: int = 256
    num_channel: int = 32

    def setup(self):
        self.encoder = GeomEncoderImage(
            self.in_features, self.hidden_dim, self.num_channel
        )
        self.decoder = GeomDecoderImage(
            self.in_features, self.hidden_dim, self.num_channel
        )

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.decoder(self.encoder(x, deterministic))
