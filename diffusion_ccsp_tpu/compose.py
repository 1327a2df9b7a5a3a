"""Cross-domain model composition: robot_box x qualitative.

Capability parity: reference composed inference — a robot packing model and a
qualitative relation model, trained separately, solve jointly by summing
their per-constraint denoiser outputs over one constraint graph
(``denoise_fn.py:286-291,487-503``; wiring in ``solve_csp.py`` via the
``robot_qualitative`` processed dataset, ``datasets.py:38-44``).

``compose_params`` transplants the two trained parameter trees into one
``robot_qualitative`` ConstraintDiffuser:
- domain-1 slots (geom/grasp/pose encoders, time MLP, pose decoder, gin/gfree
  MLP heads) come from the robot model;
- domain-2 slots (``*_2`` encoders and decoder, qualitative MLP heads) come
  from the qualitative model. The qualitative heads' 5h-wide kernels embed
  into the composed bank's 6h-wide kernels with a zero grasp block (the
  grasp embedding is zeroed for qualitative edges in the forward, so the
  extra rows are never activated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.constraints import (
    QUALITATIVE_CONSTRAINTS,
    ROBOT_CONSTRAINTS,
)
from diffusion_ccsp_tpu.models.diffuser import ConstraintDiffuser, DiffuserConfig


def robot_qualitative_config(
    hidden_dim: int = 256,
    composing_weight: tuple[float, float] = (1.0, 1.0),
    **kw,
) -> DiffuserConfig:
    return DiffuserConfig(
        input_mode="robot_qualitative",
        geom_dim=8,
        pose_dim=5,
        grasp_dim=5,
        hidden_dim=hidden_dim,
        composing_weight=composing_weight,
        **kw,
    )


def compose_params(robot_params, qualitative_params, hidden_dim: int = 256):
    """Build the composed model's parameter tree from two trained models.

    Args:
      robot_params: params of a robot_box ConstraintDiffuser (6h-wide bank,
        2 types).
      qualitative_params: params of a qualitative ConstraintDiffuser (5h-wide
        bank, 13 types).
    """
    rp = robot_params["params"]
    qp = qualitative_params["params"]
    h = hidden_dim

    n_robot = len(ROBOT_CONSTRAINTS)
    n_qual = len(QUALITATIVE_CONSTRAINTS)
    rk = rp["mlp_bank"]["kernel"]  # [2, 6h, 2h]
    rb = rp["mlp_bank"]["bias"]  # [2, 2h]
    qk = qp["mlp_bank"]["kernel"]  # [13, 5h, 2h]
    qb = qp["mlp_bank"]["bias"]

    assert rk.shape[0] == n_robot and qk.shape[0] == n_qual
    assert rk.shape[1] == 6 * h and qk.shape[1] == 5 * h

    # embed qualitative kernels after a zero grasp block
    qk_wide = jnp.concatenate(
        [jnp.zeros((n_qual, h, qk.shape[2]), qk.dtype), qk], axis=1
    )
    kernel = jnp.concatenate([rk, qk_wide], axis=0)  # [15, 6h, 2h]
    bias = jnp.concatenate([rb, qb], axis=0)

    params = {
        "geom_encoder": rp["geom_encoder"],
        "grasp_encoder": rp["grasp_encoder"],
        "pose_encoder": rp["pose_encoder"],
        "time_mlp": rp["time_mlp"],
        "pose_decoder": rp["pose_decoder"],
        "geom_encoder_2": qp["geom_encoder"],
        "pose_encoder_2": qp["pose_encoder"],
        "time_mlp_2": qp["time_mlp"],
        "pose_decoder_2": qp["pose_decoder"],
        "mlp_bank": {"kernel": kernel, "bias": bias},
    }
    return {"params": params}
