"""Evaluation: constraint-satisfaction rate, top-1 / top-k over re-noise tries.

Capability parity: reference ``networks/ddpm.py:558-843`` (Trainer.evaluate +
summarize_success_rate). The reference reconstructs a trimesh world per graph
per try and runs FCL on the host (`ddpm.py:633-713`); here the whole protocol —
k re-noise rounds × B problems × full reverse diffusion × constraint check —
runs on device, with a single scalar per problem coming back to the host.

Success semantics match ``worlds.py:734-764``: a sample succeeds iff the scene
is collision-free (tiles + tray walls) and every given constraint edge is
geometrically re-derivable.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
from diffusion_ccsp_tpu.graphs import ConstraintGraph
from diffusion_ccsp_tpu.ops.geometry2d import qualitative_graph_satisfied


@dataclasses.dataclass
class EvalResult:
    success: np.ndarray  # bool [num_problems, tries]
    sample_seconds: list  # wall clock per try-round
    num_problems: int

    @property
    def top1(self) -> float:
        return float(self.success[:, 0].mean())

    @property
    def topk(self) -> float:
        return float(self.success.any(axis=1).mean())

    def seconds_per_graph(self) -> float:
        total = sum(self.sample_seconds)
        rounds = len(self.sample_seconds)
        return total / (rounds * self.num_problems)

    def summary(self) -> dict:
        return {
            "success_rate": self.top1,
            "success_rate_topk": self.topk,
            "tries": int(self.success.shape[1]),
            "sec_per_graph_per_try": self.seconds_per_graph(),
        }


def make_sample_and_check(diffusion: GaussianDiffusion):
    """One jitted function: full reverse chain + on-device satisfaction."""

    def fn(params, graph: ConstraintGraph, key):
        out = diffusion.sample(params, graph, key)
        out = jnp.clip(out, -1.0, 1.0)  # reference ddpm.py:620
        ok, _ = jax.vmap(qualitative_graph_satisfied, in_axes=(0, 0, None))(
            graph, out, 1.0
        )
        return ok, out

    return jax.jit(fn)


def evaluate_qualitative(
    diffusion: GaussianDiffusion,
    params: Any,
    test_graphs: ConstraintGraph,
    key: jax.Array,
    tries: int = 10,
) -> EvalResult:
    """Run the top-1/top-k protocol on a stacked batch of test problems.

    Reference protocol (``ddpm.py:591-604``): k independent re-noise rounds
    per problem; top-1 counts round 0, top-k counts any round.
    """
    fn = make_sample_and_check(diffusion)
    b = test_graphs.batch_shape[0]
    success = np.zeros((b, tries), dtype=bool)
    times = []
    for k in range(tries):
        key, sub = jax.random.split(key)
        t0 = time.time()
        ok, _ = fn(params, test_graphs, sub)
        ok = np.asarray(jax.device_get(ok))
        times.append(time.time() - t0)
        success[:, k] = ok
    return EvalResult(success=success, sample_seconds=times, num_problems=b)
