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
    ranked: bool = False,
):
    """Build a jitted sharded solver.

    Args:
      satisfied_fn: (graph_single, pose[N, P]) -> (ok, aux); vmapped inside.
      candidates: K chains per problem. B*K must divide the mesh size.
      ranked: return the FULL candidate pool per problem, ordered
        device-satisfied-first then energy-ascending, instead of only the
        argmin pick. This feeds the oracle-cascade selection (VERDICT r4
        item 5): oracle-gated modes walk the host IK/settle oracle down the
        ranked list until one passes, so a single host-oracle rejection no
        longer wastes the other K-1 candidates. Analogous to the reference's
        re-noise retry loop (``ddpm.py:591-604``) but with all retries
        presampled in one sharded launch.

    Returns fn(params, graphs[B], key) ->
      ranked=False: (success[B], best_pose[B, N, P], num_satisfied[B])
      ranked=True:  (ok_ranked[B, K], poses_ranked[B, K, N, P],
                     num_satisfied[B])
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
        n_sat = okk.sum(axis=0)

        if ranked:
            # satisfied first (energy ascending), then unsatisfied (energy
            # ascending): subtracting a large constant from satisfied
            # candidates' scores orders the two groups in one argsort
            big = jnp.asarray(1e9, ek.dtype)
            score = jnp.where(okk, ek - big, ek)
            order = jnp.argsort(score, axis=0)  # [K, B]
            ok_r = jnp.take_along_axis(okk, order, axis=0)
            poses_r = jnp.take_along_axis(
                outk, order[..., None, None], axis=0
            )
            return (
                ok_r.transpose(1, 0),
                poses_r.transpose(1, 0, 2, 3),
                n_sat,
            )

        # prefer satisfied candidates; among them the lowest energy
        score = jnp.where(okk, ek, jnp.inf)
        any_ok = okk.any(axis=0)
        pick = jnp.where(
            any_ok, jnp.argmin(score, axis=0), jnp.argmin(ek, axis=0)
        )
        best = jnp.take_along_axis(
            outk, pick[None, :, None, None], axis=0
        )[0]
        return any_ok, best, n_sat

    return jax.jit(
        solve,
        in_shardings=(rep, rep, rep),
        out_shardings=(rep, rep, rep),
    )
