"""Padded, dense constraint-graph representation.

The reference batches CCSP instances as ragged disjoint graphs through
torch-geometric (``datasets.py:27-117``); every forward pass then loops over
constraint types in Python with a CPU round-trip (``denoise_fn.py:313-339``).
On TPU that design is hostile: ragged shapes defeat XLA tiling and the loop
serializes the MXU.

Here a problem is a fixed-shape record — ``max_nodes`` object slots and
``max_edges`` constraint slots with boolean masks — so everything is
``vmap``-able, shardable along a batch axis, and compiled exactly once per
(max_nodes, max_edges) bucket.

Conventions
-----------
- node 0 is the container (tray / shelf / box); it is "conditioned": its pose
  features are clamped to ground truth at every diffusion step (reference
  ``ddpm.py:274,334``).
- padded edge slots point at node 0 with type 0 and ``edge_mask=False``.
- all pose/geom features are *normalized* exactly as the reference transforms
  do (``networks/data_transforms.py:26-200``): tray-relative sizes and
  half-extent-relative positions.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

from diffusion_ccsp_tpu.constraints import constraint_set_for_mode


class ConstraintGraph(struct.PyTreeNode):
    """A (possibly batched) padded constraint graph.

    Shapes below use ``N = max_nodes``, ``E = max_edges``; every array may
    carry arbitrary leading batch dimensions (all fields agree on them).

    Attributes:
      geom:       f32[..., N, G]  normalized geometry features.
      pose:       f32[..., N, P]  normalized ground-truth pose features.
      grasp:      f32[..., N, Q]  grasp features (Q=0 outside robot modes).
      edges:      i32[..., E, 2]  (arg1, arg2) node indices per constraint.
      edge_type:  i32[..., E]     index into the mode's constraint vocabulary.
      node_mask:  bool[..., N]    True for real nodes.
      cond_mask:  bool[..., N]    True for conditioned (pose-frozen) nodes.
      edge_mask:  bool[..., E]    True for real constraint edges.
      world_dims: f32[..., 2]     (w_tray, l_tray) for denormalization.
    """

    geom: jnp.ndarray
    pose: jnp.ndarray
    grasp: jnp.ndarray
    edges: jnp.ndarray
    edge_type: jnp.ndarray
    node_mask: jnp.ndarray
    cond_mask: jnp.ndarray
    edge_mask: jnp.ndarray
    world_dims: jnp.ndarray

    @property
    def max_nodes(self) -> int:
        return self.geom.shape[-2]

    @property
    def max_edges(self) -> int:
        return self.edge_type.shape[-1]

    @property
    def pose_dim(self) -> int:
        return self.pose.shape[-1]

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.geom.shape[:-2]

    def num_nodes(self) -> jnp.ndarray:
        """Number of real nodes per graph."""
        return self.node_mask.sum(axis=-1)

    def num_edges(self) -> jnp.ndarray:
        return self.edge_mask.sum(axis=-1)


def build_graph(
    geom: Sequence[Sequence[float]],
    pose: Sequence[Sequence[float]],
    constraints: Sequence[tuple[str, int, int]],
    input_mode: str,
    max_nodes: int,
    max_edges: int,
    world_dims: tuple[float, float],
    grasp: Sequence[Sequence[float]] | None = None,
    conditioned: Sequence[int] = (0,),
) -> ConstraintGraph:
    """Build one padded graph (numpy, host side) from per-object features and
    named constraints. Named constraints are looked up in the mode vocabulary.
    """
    n = len(geom)
    if n > max_nodes:
        raise ValueError(f"{n} nodes > max_nodes={max_nodes}")
    vocab = constraint_set_for_mode(input_mode)
    e = len(constraints)
    if e > max_edges:
        raise ValueError(f"{e} edges > max_edges={max_edges}")

    gd = len(geom[0])
    pd = len(pose[0])
    qd = 0 if grasp is None else len(grasp[0])

    geom_a = np.zeros((max_nodes, gd), np.float32)
    pose_a = np.zeros((max_nodes, pd), np.float32)
    grasp_a = np.zeros((max_nodes, qd), np.float32)
    geom_a[:n] = np.asarray(geom, np.float32)
    pose_a[:n] = np.asarray(pose, np.float32)
    if grasp is not None:
        grasp_a[:n] = np.asarray(grasp, np.float32)

    edges_a = np.zeros((max_edges, 2), np.int32)
    etype_a = np.zeros((max_edges,), np.int32)
    emask_a = np.zeros((max_edges,), bool)
    for k, (name, i, j) in enumerate(constraints):
        edges_a[k] = (i, j)
        etype_a[k] = vocab.index(name)
        emask_a[k] = True

    nmask_a = np.zeros((max_nodes,), bool)
    nmask_a[:n] = True
    cmask_a = np.zeros((max_nodes,), bool)
    for c in conditioned:
        cmask_a[c] = True

    # NOTE: fields stay host-side numpy — a jnp.asarray here would device-put
    # nine arrays per scene (fatal for data generation throughput); batching
    # code transfers whole batches at once.
    return ConstraintGraph(
        geom=geom_a,
        pose=pose_a,
        grasp=grasp_a,
        edges=edges_a,
        edge_type=etype_a,
        node_mask=nmask_a,
        cond_mask=cmask_a,
        edge_mask=emask_a,
        world_dims=np.asarray(world_dims, np.float32),
    )


def stack_graphs(graphs: Sequence[ConstraintGraph]) -> ConstraintGraph:
    """Stack equally-shaped graphs along a new leading batch axis (host-side
    when the leaves are numpy)."""
    import jax

    def stack(*xs):
        if all(isinstance(x, np.ndarray) for x in xs):
            return np.stack(xs, axis=0)
        return jnp.stack(xs, axis=0)

    return jax.tree.map(stack, *graphs)
