"""Diffusion-CCSP-TPU: a TPU-native framework for compositional diffusion-based
continuous constraint solving.

Re-designed from scratch for JAX/XLA/Pallas on TPU, with the capability surface
of the CoRL-2023 Diffusion-CCSP system (reference: zt-yang/diffusion-ccsp):
factor-graph constraint denoisers, annealed-MCMC samplers, procedural CCSP
world generation, on-device constraint checking, and data-parallel training
over a `jax.sharding.Mesh`.

Package layout
--------------
- ``ops``       low-level math: diffusion schedules, segment ops, 2-D geometry
- ``models``    Flax modules: ConstraintDiffuser, StructDiffusion baseline, CNN encoders
- ``envs``      procedural CCSP worlds, constraint extraction, host-side oracles
- ``train``     trainer, data pipeline
- ``eval``      top-1 / top-k evaluation protocol
- ``parallel``  mesh construction, sharded train/sample steps
- ``utils``     EMA, checkpointing, timing
"""

__version__ = "0.1.0"

from diffusion_ccsp_tpu.constraints import (
    PUZZLE_CONSTRAINTS,
    ROBOT_CONSTRAINTS,
    STABILITY_CONSTRAINTS,
    QUALITATIVE_CONSTRAINTS,
    ROBOT_QUALITATIVE_CONSTRAINTS,
    constraint_set_for_mode,
)
from diffusion_ccsp_tpu.graphs import ConstraintGraph
