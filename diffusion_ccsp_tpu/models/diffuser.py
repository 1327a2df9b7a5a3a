"""ConstraintDiffuser — the compositional factor-graph denoiser, TPU-native.

Capability parity: reference ``networks/denoise_fn.py:184-561``. The reference
loops over constraint types in Python with a ``.cpu()`` round-trip per type
(``denoise_fn.py:313-339,512-521``); here the whole factor graph evaluates as
one fused XLA computation over a padded edge list:

  1. encode geometry / pose / (grasp) per node with small MLPs        (MXU)
  2. gather both endpoints' embeddings per edge, concat with the
     time embedding                                                    (VPU)
  3. per-constraint-type Linear+SiLU evaluated as a static unrolled
     bank of matmuls mixed by a one-hot of ``edge_type`` — no dynamic
     shapes, no host sync                                              (MXU)
  4. shared pose decoder per endpoint                                  (MXU)
  5. masked scatter-add (segment_sum) of per-edge pose deltas onto
     nodes, normalized by sqrt(#constraints touching the node)
     (reference ``denoise_fn.py:377-389,523-524``)
  6. conditioned nodes clamped to ground-truth pose
     (reference ``denoise_fn.py:531-533``)

The EBM path computes the per-edge energy ``sum((out - pose_in[args])**2)``
(reference ``denoise_fn.py:373-375``) and its exact gradient via ``jax.grad``
instead of torch autograd (``denoise_fn.py:539-548``).

The forward below is written for a single graph; batch via ``jax.vmap`` (see
``ConstraintDiffuser.batched_apply``). All shapes are static.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffusion_ccsp_tpu.constraints import (
    ROBOT_CONSTRAINTS,
    constraint_set_for_mode,
)
from diffusion_ccsp_tpu.graphs import ConstraintGraph
from diffusion_ccsp_tpu.models.embeddings import TimeMLP


@dataclasses.dataclass(frozen=True)
class DiffuserConfig:
    """Static configuration of the denoiser.

    geom_dim/pose_dim/grasp_dim mirror the reference's ``dims`` tuples
    (``train_utils.py:265-278``): e.g. qualitative = (geom 2, pose 4),
    triangle = (geom 3, pose 4), robot = (geom 8, grasp 5, pose 5).
    """

    input_mode: str
    geom_dim: int
    pose_dim: int
    grasp_dim: int = 0
    hidden_dim: int = 256
    normalize: bool = True
    #: scale per domain when composing two trained domains
    #: (reference ``denoise_fn.py:291``).
    composing_weight: tuple[float, float] = (1.0, 1.0)

    @property
    def constraint_set(self) -> tuple[str, ...]:
        return constraint_set_for_mode(self.input_mode)

    @property
    def num_types(self) -> int:
        return len(self.constraint_set)

    @property
    def has_grasp(self) -> bool:
        return "robot" in self.input_mode

    def type_uses_grasp(self, k: int) -> bool:
        """Robot constraints take a 6*h input (grasp included); all others 5*h
        (reference ``denoise_fn.py:297-303``)."""
        return self.constraint_set[k] in ROBOT_CONSTRAINTS


class FeatureEncoder(nn.Module):
    """Linear(h/2)-SiLU-Linear(h)-SiLU, reference ``denoise_fn.py:227-251``."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim // 2)(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_dim)(x)
        return nn.silu(x)


class PoseDecoder(nn.Module):
    """Linear(h/2)-SiLU-Linear(P), reference ``denoise_fn.py:253-257``."""

    hidden_dim: int
    pose_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim // 2)(x)
        x = nn.silu(x)
        return nn.Dense(self.pose_dim)(x)


class ConstraintMLPBank(nn.Module):
    """One Linear+SiLU head per constraint type, evaluated densely.

    The bank is applied to every edge for every type as a static unrolled set
    of matmuls, then mixed with the one-hot of the edge's type. With K <= 15
    tiny matmuls this keeps the MXU busy with static shapes instead of
    serializing per-type Python iterations (reference ``denoise_fn.py:512``)
    and avoids a [E, in, out] weight gather.
    """

    num_types: int
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, edge_type: jnp.ndarray) -> jnp.ndarray:
        # x: [E, in_dim], edge_type: [E] -> [E, out_dim]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.num_types, self.in_dim, self.out_dim),
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.num_types, self.out_dim)
        )
        onehot = jax.nn.one_hot(edge_type, self.num_types, dtype=x.dtype)  # [E, K]
        out = jnp.zeros(x.shape[:-1] + (self.out_dim,), dtype=x.dtype)
        for k in range(self.num_types):
            yk = x @ w[k] + b[k]
            out = out + onehot[..., k : k + 1] * yk
        return nn.silu(out)


class ConstraintDiffuser(nn.Module):
    """The factor-graph denoiser. See module docstring."""

    config: DiffuserConfig

    def setup(self):
        cfg = self.config
        h = cfg.hidden_dim
        self.geom_encoder = FeatureEncoder(h, name="geom_encoder")
        self.pose_encoder = FeatureEncoder(h, name="pose_encoder")
        if cfg.has_grasp:
            self.grasp_encoder = FeatureEncoder(h, name="grasp_encoder")
        self.time_mlp = TimeMLP(h, name="time_mlp")
        self.pose_decoder = PoseDecoder(h, cfg.pose_dim, name="pose_decoder")

        # Edge-input width: grasp-aware types consume one extra h-block.
        # We build the edge input at the max width and give every type a
        # full-width weight matrix; for non-grasp types in a robot mode the
        # grasp block is zeroed before the matmul so those weights see a
        # constant 0 (matching the reference's narrower per-type Linear).
        in_mult = 6 if cfg.has_grasp else 5
        self.mlp_bank = ConstraintMLPBank(
            num_types=cfg.num_types,
            in_dim=in_mult * h,
            out_dim=2 * h,
            name="mlp_bank",
        )

    def __call__(
        self,
        pose_in: jnp.ndarray,
        graph: ConstraintGraph,
        t: jnp.ndarray,
        return_energy: bool = False,
    ):
        """Denoise one graph.

        Args:
          pose_in: f32[N, P] noisy pose features.
          graph:   a single (unbatched) ConstraintGraph.
          t:       scalar int timestep.
          return_energy: if True return the summed constraint energy instead
            of the aggregated pose prediction (EBM path).

        Returns:
          f32[N, P] predicted noise / pose deltas, or a scalar energy.
        """
        cfg = self.config
        h = cfg.hidden_dim

        geom_emb = self.geom_encoder(graph.geom)  # [N, h]
        pose_emb = self.pose_encoder(pose_in)  # [N, h]
        t_emb = self.time_mlp(t)  # [h]

        a1 = graph.edges[:, 0]  # [E]
        a2 = graph.edges[:, 1]
        parts = []
        if cfg.has_grasp:
            grasp_emb = self.grasp_encoder(graph.grasp)
            # grasp block participates only for grasp-aware constraint types
            uses_grasp = jnp.asarray(
                [cfg.type_uses_grasp(k) for k in range(cfg.num_types)],
                dtype=pose_in.dtype,
            )[graph.edge_type]
            parts.append(grasp_emb[a1] * uses_grasp[:, None])
        parts += [
            geom_emb[a1],
            geom_emb[a2],
            pose_emb[a1],
            pose_emb[a2],
            jnp.broadcast_to(t_emb, (a1.shape[0], h)),
        ]
        edge_in = jnp.concatenate(parts, axis=-1)  # [E, 5h or 6h]

        out = self.mlp_bank(edge_in, graph.edge_type)  # [E, 2h]
        out = out.reshape(out.shape[0], 2, h)  # [E, 2, h]
        edge_pose_out = self.pose_decoder(out)  # [E, 2, P]
        if cfg.composing_weight[0] != 1.0:
            edge_pose_out = edge_pose_out * cfg.composing_weight[0]

        emask = graph.edge_mask.astype(pose_in.dtype)

        if return_energy:
            # reference ``denoise_fn.py:373-375``: energy per edge is the
            # squared distance between predicted and current pose features of
            # both endpoints.
            args_pose = jnp.stack([pose_in[a1], pose_in[a2]], axis=1)  # [E,2,P]
            per_edge = ((edge_pose_out - args_pose) ** 2).sum(axis=(1, 2))
            return (per_edge * emask).sum()

        # masked scatter-add onto nodes + sqrt-count normalization
        n = graph.max_nodes
        flat_args = jnp.concatenate([a1, a2], axis=0)  # [2E]
        flat_out = jnp.concatenate(
            [edge_pose_out[:, 0], edge_pose_out[:, 1]], axis=0
        )  # [2E, P]
        flat_mask = jnp.concatenate([emask, emask], axis=0)  # [2E]
        agg = jax.ops.segment_sum(
            flat_out * flat_mask[:, None], flat_args, num_segments=n
        )  # [N, P]
        if cfg.normalize:
            counts = jax.ops.segment_sum(flat_mask, flat_args, num_segments=n)
            agg = agg / jnp.sqrt(jnp.maximum(counts, 1.0))[:, None]

        # conditioned nodes keep their ground-truth pose features
        # (reference ``denoise_fn.py:531-533``)
        agg = jnp.where(graph.cond_mask[:, None], graph.pose, agg)
        # padded node slots emit zeros
        return agg * graph.node_mask[:, None]


def make_denoiser(model: ConstraintDiffuser):
    """Batched denoiser: (params, pose_in[B,N,P], graph[B,...], t[B]) -> [B,N,P]."""

    def single(params, pose_in, graph, t):
        return model.apply(params, pose_in, graph, t)

    return jax.vmap(single, in_axes=(None, 0, 0, 0))


def make_energy_fn(model: ConstraintDiffuser):
    """Batched energy: (params, pose_in[B,N,P], graph, t[B]) -> energies [B]."""

    def single(params, pose_in, graph, t):
        return model.apply(params, pose_in, graph, t, return_energy=True)

    return jax.vmap(single, in_axes=(None, 0, 0, 0))


def make_energy_grad_fn(model: ConstraintDiffuser):
    """Batched (gradient, energy) of the summed constraint energy w.r.t. the
    noisy poses — the TPU equivalent of the reference's autograd EBM path
    (``denoise_fn.py:539-548``).
    """

    def single(params, pose_in, graph, t):
        e, g = jax.value_and_grad(
            lambda p: model.apply(params, p, graph, t, return_energy=True)
        )(pose_in)
        return g, e

    return jax.vmap(single, in_axes=(None, 0, 0, 0))
