"""Device-mesh construction and sharding helpers.

The reference has no distributed execution at all (single GPU, SURVEY.md §2.5).
Here scaling is first-class: a 1-D ``dp`` mesh axis shards the problem batch
(training graphs, or candidate assignments at inference); parameters are
replicated; XLA inserts the gradient ``psum`` over ICI from the sharding
annotations alone. Multi-host extends the same mesh via
``jax.distributed.initialize`` without code changes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX (one process per host; all hosts then see
    the global device set and every mesh in this module spans hosts).

    Thin wrapper over ``jax.distributed.initialize`` so multi-host runs need
    no code changes beyond calling this before first device use — collectives
    ride ICI within a slice and DCN across slices automatically (SURVEY.md
    §2.5 north star). No-ops when JAX coordinates are absent and no arguments
    are given (single-host).
    """
    import os

    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Shard every leaf along its leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
