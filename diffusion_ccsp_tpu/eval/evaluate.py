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


def satisfied_fn_for_mode(input_mode: str):
    """Per-graph on-device success oracle for each task family.

    Success semantics follow the reference per mode (SURVEY.md §0): 2-D modes
    are fully decided on device; stability additionally runs the host-side
    static-equilibrium check for survivors
    (``envs/stability.check_stability_solution``).
    """
    if "robot" in input_mode and "qualitative" in input_mode:
        from diffusion_ccsp_tpu.ops.geometry3d import (
            robot_qualitative_graph_satisfied,
        )

        return robot_qualitative_graph_satisfied
    if "robot" in input_mode:
        from diffusion_ccsp_tpu.ops.geometry3d import robot_graph_satisfied

        return robot_graph_satisfied
    if "stability" in input_mode:
        from diffusion_ccsp_tpu.ops.geometry2d import (
            stability_graph_satisfied_geometric,
        )

        return stability_graph_satisfied_geometric
    if "diffuse_pairwise" in input_mode:
        from diffusion_ccsp_tpu.ops.geometry2d import (
            diffuse_pairwise_graph_satisfied,
        )

        def tri(graph, pose):
            return diffuse_pairwise_graph_satisfied(graph, pose)

        return tri

    def qual(graph, pose):
        return qualitative_graph_satisfied(graph, pose)

    return qual


@dataclasses.dataclass
class EvalResult:
    success: np.ndarray  # bool [num_problems, tries]
    sample_seconds: list  # wall clock per sampling launch
    num_problems: int
    #: diffusion chains run per launch (num_problems, or num_problems*tries
    #: when tries are fused into one batch)
    samples_per_launch: int = 0

    def __post_init__(self):
        if self.samples_per_launch == 0:
            self.samples_per_launch = self.num_problems

    @property
    def top1(self) -> float:
        return float(self.success[:, 0].mean())

    @property
    def topk(self) -> float:
        return float(self.success.any(axis=1).mean())

    def seconds_per_graph(self) -> float:
        """Wall clock per problem-sample (one full reverse chain)."""
        total = sum(self.sample_seconds)
        launches = len(self.sample_seconds)
        return total / (launches * self.samples_per_launch)

    def summary(self) -> dict:
        return {
            "success_rate": self.top1,
            "success_rate_topk": self.topk,
            "tries": int(self.success.shape[1]),
            "sec_per_graph_per_try": self.seconds_per_graph(),
        }


def make_sample_and_check(
    diffusion: GaussianDiffusion, input_mode: str | None = None,
    return_edge_sat: bool = False,
    sampler: str = "ddpm",
    ddim_steps: int = 100,
):
    """One jitted function: full reverse chain + on-device satisfaction.

    With ``return_edge_sat`` the per-edge satisfaction vector also returns —
    the failure-mode signal the reference logs per problem
    (``ddpm.py:727-755`` all_failure_modes). ``sampler='ddim'`` swaps in the
    strided DDIM chain (not in the reference; 10-20x fewer denoiser evals).
    """
    mode = input_mode or diffusion.model.config.input_mode
    satisfied = satisfied_fn_for_mode(mode)

    def fn(params, graph: ConstraintGraph, key):
        if sampler == "ddim":
            out = diffusion.sample_ddim(params, graph, key,
                                        num_steps=ddim_steps)
        else:
            out = diffusion.sample(params, graph, key)
        out = jnp.clip(out, -1.0, 1.0)  # reference ddpm.py:620
        ok, aux = jax.vmap(satisfied)(graph, out)
        if return_edge_sat:
            return ok, out, aux
        return ok, out

    return jax.jit(fn)


def failure_modes(
    graph: ConstraintGraph, edge_sat: np.ndarray, input_mode: str
) -> list[list[tuple]]:
    """Decode per-edge satisfaction into named violated constraints per
    problem (reference failure-mode capture, ``ddpm.py:727-755``)."""
    from diffusion_ccsp_tpu.constraints import constraint_set_for_mode

    vocab = constraint_set_for_mode(input_mode)
    edges = np.asarray(graph.edges)
    etype = np.asarray(graph.edge_type)
    emask = np.asarray(graph.edge_mask)
    out = []
    for b in range(edges.shape[0]):
        bad = []
        for k in range(edges.shape[1]):
            if emask[b, k] and not edge_sat[b, k]:
                bad.append(
                    (vocab[int(etype[b, k])], int(edges[b, k, 0]),
                     int(edges[b, k, 1]))
                )
        out.append(bad)
    return out


def evaluate_model(
    diffusion: GaussianDiffusion,
    params: Any,
    test_graphs: ConstraintGraph,
    key: jax.Array,
    tries: int = 10,
    parallel_tries: bool = False,
    input_mode: str | None = None,
    sampler: str = "ddpm",
    ddim_steps: int = 100,
) -> EvalResult:
    """Run the top-1/top-k protocol on a stacked batch of test problems.

    Reference protocol (``ddpm.py:591-604``): k independent re-noise rounds
    per problem; top-1 counts round 0, top-k counts any round. The reference
    runs rounds sequentially; with ``parallel_tries`` all k rounds become one
    fused batch of B*k diffusion chains — same samples statistically, k-times
    the arithmetic intensity (candidate fan-out per SURVEY.md §2.5).
    """
    b = test_graphs.batch_shape[0]
    if parallel_tries:
        tiled = jax.tree.map(
            lambda x: jnp.repeat(x, tries, axis=0), test_graphs
        )  # problem-major: [p0 t0..tk-1, p1 t0..tk-1, ...]
        fn = make_sample_and_check(diffusion, input_mode, sampler=sampler,
                                   ddim_steps=ddim_steps)
        key, sub = jax.random.split(key)
        t0 = time.time()
        ok, _ = fn(params, tiled, sub)
        ok = np.asarray(jax.device_get(ok))
        dt = time.time() - t0
        return EvalResult(
            success=ok.reshape(b, tries),
            sample_seconds=[dt],
            num_problems=b,
            samples_per_launch=b * tries,
        )

    fn = make_sample_and_check(diffusion, input_mode, sampler=sampler,
                               ddim_steps=ddim_steps)
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


#: backwards-compatible alias (the qualitative mode was the first slice)
evaluate_qualitative = evaluate_model
