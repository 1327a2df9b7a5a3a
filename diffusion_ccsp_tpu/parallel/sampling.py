"""Sharded candidate fan-out: solve each CCSP with K parallel diffusion
chains across the device mesh and keep the best sample per problem.

This is the TPU-native replacement for the reference's sequential ``tries``
re-noise loop (``ddpm.py:591-604``) at scale (SURVEY.md §2.5): K candidate
assignments per problem are tiled candidate-major over the ``dp`` mesh axis,
the whole (B*K)-chain reverse diffusion runs sharded, the on-device checker
scores every candidate, and per-problem selection (first satisfied candidate,
ties broken by constraint energy) happens with XLA-inserted collectives —
one [B] success vector and one [B, N, P] pose tensor leave the device.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
from diffusion_ccsp_tpu.graphs import ConstraintGraph
from diffusion_ccsp_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
)


def make_sharded_solver(
    diffusion: GaussianDiffusion,
    satisfied_fn: Callable,
    mesh,
    candidates: int,
):
    """Build a jitted sharded solver.

    Args:
      satisfied_fn: (graph_single, pose[N, P]) -> (ok, aux); vmapped inside.
      candidates: K chains per problem. B*K must divide the mesh size.

    Returns fn(params, graphs[B], key) -> (success[B], best_pose[B, N, P],
    num_satisfied[B]).
    """
    rep = replicated_sharding(mesh)
    shard = batch_sharding(mesh)

    def solve(params, graphs: ConstraintGraph, key):
        b = graphs.batch_shape[0]
        # candidate-major tiling: [K*B] with candidate k of problem p at
        # index k*B + p, so the leading axis shards evenly over devices
        tiled = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                jnp.tile(x, (candidates,) + (1,) * (x.ndim - 1)), shard
            ),
            graphs,
        )
        out = diffusion.sample(params, tiled, key)
        out = jnp.clip(out, -1.0, 1.0)
        ok, _ = jax.vmap(satisfied_fn)(tiled, out)

        # constraint energy at t=0 as the tie-breaker score
        energy = diffusion._energy(
            params, out, tiled, jnp.zeros(out.shape[0], jnp.int32)
        )

        okk = ok.reshape(candidates, b)
        ek = energy.reshape(candidates, b)
        outk = out.reshape((candidates, b) + out.shape[1:])

        # prefer satisfied candidates; among them the lowest energy
        score = jnp.where(okk, ek, jnp.inf)
        any_ok = okk.any(axis=0)
        pick = jnp.where(
            any_ok, jnp.argmin(score, axis=0), jnp.argmin(ek, axis=0)
        )
        best = jnp.take_along_axis(
            outk, pick[None, :, None, None], axis=0
        )[0]
        return any_ok, best, okk.sum(axis=0)

    return jax.jit(
        solve,
        in_shardings=(rep, rep, rep),
        out_shardings=(rep, rep, rep),
    )
