"""StructDiffusion baseline — non-compositional transformer denoiser.

Capability parity: reference ``networks/denoise_fn.py:391-451`` +
``networks/transformer.py:15-82``: each object becomes one token
[geom_emb | pose_emb + time_emb] (grasp_emb prepended in robot modes), a
sinusoidal positional encoding indexed by a per-graph permutation (the
dataset's object order is biased, ``denoise_fn.py:411-417``), then a CLIP-style
residual-attention transformer (pre-LN attention, QuickGELU MLP), final
LayerNorm, pose decoder over the trailing hidden block, containers clamped to
ground truth.

TPU-native: tokens are the padded node slots of the ConstraintGraph — the
padding mask is the attention mask, no per-graph Python loop
(reference builds sequences per graph at ``denoise_fn.py:408-430``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffusion_ccsp_tpu.graphs import ConstraintGraph
from diffusion_ccsp_tpu.models.diffuser import (
    DiffuserConfig,
    FeatureEncoder,
    PoseDecoder,
)
from diffusion_ccsp_tpu.models.embeddings import TimeMLP


def sinusoidal_position_table(max_len: int, dim: int) -> np.ndarray:
    """Classic interleaved sin/cos table (reference ``transformer.py:15-31``)."""
    pe = np.zeros((max_len, dim), np.float32)
    pos = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, dim, 2) * -(math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """x + attn(ln(x)); x + ln(mlp(x)) — the reference's (unusual) post-MLP
    LayerNorm placement (``transformer.py:70-72``)."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width
        )(nn.LayerNorm()(x), mask=mask)
        x = x + attn
        h = nn.Dense(self.width * 4)(x)
        h = quick_gelu(h)
        h = nn.Dense(self.width)(h)
        x = x + nn.LayerNorm()(h)
        return x


class StructDiffusion(nn.Module):
    """Sequence-transformer denoiser over object tokens."""

    config: DiffuserConfig
    num_layers: int = 4
    num_heads: int = 2

    @property
    def width(self) -> int:
        mult = 3 if self.config.has_grasp else 2
        return self.config.hidden_dim * mult

    @nn.compact
    def __call__(
        self,
        pose_in: jnp.ndarray,
        graph: ConstraintGraph,
        t: jnp.ndarray,
        positions: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """pose_in [B, N, P] (or single graph [N, P]); t [B] (or scalar).

        positions: optional int[B, N] permutation indices for the positional
        encoding (the reference shuffles per graph to de-bias dataset object
        order, ``denoise_fn.py:413-417``); defaults to arange.
        """
        single = pose_in.ndim == 2
        if single:
            pose_in = pose_in[None]
            graph = jax.tree.map(lambda x: x[None], graph)
            t = jnp.asarray(t)[None]

        cfg = self.config
        h = cfg.hidden_dim
        bsz, n, _ = pose_in.shape

        geom_emb = FeatureEncoder(h, name="geom_encoder")(graph.geom)
        pose_emb = FeatureEncoder(h, name="pose_encoder")(pose_in)
        t_emb = TimeMLP(h, name="time_mlp")(t)  # [B, h]
        pose_emb = pose_emb + t_emb[:, None, :]

        tokens = [geom_emb, pose_emb]
        if cfg.has_grasp:
            tokens.insert(0, FeatureEncoder(h, name="grasp_encoder")(graph.grasp))
        x = jnp.concatenate(tokens, axis=-1)  # [B, N, width]

        pe = jnp.asarray(sinusoidal_position_table(n, self.width))
        if positions is None:
            x = x + pe[None, :, :]
        else:
            x = x + pe[positions]

        x = nn.LayerNorm(name="ln_pre")(x)
        # tokens may attend only to real nodes (reference pads to max_seq_len
        # and masks padded rows/cols, denoise_fn.py:423-429)
        mask = graph.node_mask[:, None, None, :] & graph.node_mask[:, None, :, None]
        for i in range(self.num_layers):
            x = ResidualAttentionBlock(self.width, self.num_heads,
                                       name=f"block_{i}")(x, mask)
        x = nn.LayerNorm(name="ln_post")(x)

        out = PoseDecoder(h, cfg.pose_dim, name="pose_decoder")(x[..., -h:])
        out = jnp.where(graph.cond_mask[..., None], graph.pose, out)
        out = out * graph.node_mask[..., None]
        if single:
            out = out[0]
        return out
