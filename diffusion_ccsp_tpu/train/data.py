"""Dataset generation and loading: pre-packed numpy shards of padded graphs.

Capability parity: reference ``datasets.py:27-124`` (GraphDataset over
torch-geometric ``.pt`` files). Here a dataset is a single ``.npz`` of stacked
padded arrays — a layout that feeds the TPU input pipeline with zero
per-batch Python collation: a batch is a pure take() along axis 0.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.envs.worlds import (
    qualitative_scene_to_graph,
    sample_qualitative_scene,
)
from diffusion_ccsp_tpu.graphs import ConstraintGraph


#: per-mode static spec: feature dims and default padded-graph bucket shapes
MODE_SPECS: dict[str, dict] = {
    "qualitative": dict(
        geom_dim=2, pose_dim=4, grasp_dim=0, max_nodes=8, max_edges=64,
        counts=(2, 6),
    ),
    "diffuse_pairwise": dict(
        geom_dim=3, pose_dim=4, grasp_dim=0, max_nodes=8, max_edges=32,
        counts=(2, 7),  # reference test sets go to 7 (solve_csp.py:39-58)
    ),
    "diffuse_pairwise_image": dict(
        geom_dim=3, pose_dim=4, grasp_dim=0, max_nodes=8, max_edges=32,
        counts=(2, 7),
    ),
    "stability_flat": dict(
        geom_dim=2, pose_dim=4, grasp_dim=0, max_nodes=8, max_edges=48,
        counts=(4, 7),
    ),
    "robot_box": dict(
        geom_dim=8, pose_dim=5, grasp_dim=5, max_nodes=8, max_edges=32,
        counts=(3, 6),
    ),
    "robot_qualitative": dict(
        geom_dim=8, pose_dim=5, grasp_dim=5, max_nodes=8, max_edges=64,
        counts=(3, 6),
    ),
}


def mode_samplers(input_mode: str):
    """(scene_sampler, scene_to_graph) for an input mode."""
    if input_mode in ("qualitative",):
        return sample_qualitative_scene, qualitative_scene_to_graph
    if input_mode.startswith("diffuse_pairwise"):
        from diffusion_ccsp_tpu.envs.triangles import (
            sample_triangle_scene,
            triangle_scene_to_graph,
        )

        return sample_triangle_scene, triangle_scene_to_graph
    if "stability" in input_mode:
        from diffusion_ccsp_tpu.envs.stability import (
            sample_stability_scene,
            stability_scene_to_graph,
        )

        return sample_stability_scene, stability_scene_to_graph
    if input_mode == "robot_box":
        from diffusion_ccsp_tpu.envs.robot import (
            robot_scene_to_graph,
            sample_robot_scene,
        )

        return sample_robot_scene, robot_scene_to_graph
    if input_mode == "robot_qualitative":
        from diffusion_ccsp_tpu.envs.robot import (
            robot_qualitative_scene_to_graph,
            sample_robot_scene,
        )

        return sample_robot_scene, robot_qualitative_scene_to_graph
    raise ValueError(input_mode)


def generate_dataset(
    path: str,
    input_mode: str,
    num_scenes: int,
    seed: int = 0,
    max_nodes: int | None = None,
    max_edges: int | None = None,
    min_num_objects: int | None = None,
    max_num_objects: int | None = None,
) -> str:
    """Sample scenes for any input mode and write one npz shard with
    object-count balancing (reference collector quota logic,
    ``envs/data_collectors.py:136-143``)."""
    spec = MODE_SPECS[input_mode]
    max_nodes = max_nodes or spec["max_nodes"]
    max_edges = max_edges or spec["max_edges"]
    lo, hi = spec["counts"]
    lo = min_num_objects if min_num_objects is not None else lo
    hi = max_num_objects if max_num_objects is not None else hi
    sampler, to_graph = mode_samplers(input_mode)

    rng = np.random.default_rng(seed)
    counts = list(range(lo, hi + 1))
    per_graph = []
    for i in range(num_scenes):
        c = counts[i % len(counts)]
        scene = sampler(rng, min_num_objects=c, max_num_objects=c)
        per_graph.append(to_graph(scene, max_nodes, max_edges))

    stacked = {
        f: np.stack([np.asarray(getattr(g, f)) for g in per_graph])
        for f in _FIELDS
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, input_mode=input_mode, **stacked)
    return path

_FIELDS = (
    "geom", "pose", "grasp", "edges", "edge_type",
    "node_mask", "cond_mask", "edge_mask", "world_dims",
)


def graphs_to_arrays(graphs: ConstraintGraph) -> dict[str, np.ndarray]:
    return {f: np.asarray(getattr(graphs, f)) for f in _FIELDS}


def arrays_to_graphs(arrays: dict[str, np.ndarray]) -> ConstraintGraph:
    return ConstraintGraph(**{f: arrays[f] for f in _FIELDS})


def generate_qualitative_dataset(
    path: str,
    num_scenes: int,
    seed: int = 0,
    max_nodes: int = 8,
    max_edges: int = 64,
    min_num_objects: int = 2,
    max_num_objects: int = 6,
    balance_counts: bool = True,
) -> str:
    """Sample scenes and write one ``.npz`` shard.

    Object-count balancing mirrors the reference collector's quota bumping
    (``envs/data_collectors.py:136-143``): scenes are drawn per object count
    round-robin so each count is equally represented.
    """
    rng = np.random.default_rng(seed)
    per_graph = []
    counts = list(range(min_num_objects, max_num_objects + 1))
    for i in range(num_scenes):
        if balance_counts:
            c = counts[i % len(counts)]
            scene = sample_qualitative_scene(
                rng, min_num_objects=c, max_num_objects=c
            )
        else:
            scene = sample_qualitative_scene(
                rng, min_num_objects=min_num_objects,
                max_num_objects=max_num_objects,
            )
        per_graph.append(qualitative_scene_to_graph(scene, max_nodes, max_edges))

    stacked = {
        f: np.stack([np.asarray(getattr(g, f)) for g in per_graph])
        for f in _FIELDS
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, input_mode="qualitative", **stacked)
    return path


@dataclasses.dataclass
class GraphDataset:
    """In-memory padded-graph dataset with infinite shuffled batch iteration."""

    arrays: dict[str, np.ndarray]
    input_mode: str = "qualitative"

    @classmethod
    def load(cls, path: str) -> "GraphDataset":
        with np.load(path, allow_pickle=False) as z:
            arrays = {f: z[f] for f in _FIELDS}
            mode = str(z["input_mode"]) if "input_mode" in z else "qualitative"
        return cls(arrays=arrays, input_mode=mode)

    @classmethod
    def from_graphs(cls, graphs: ConstraintGraph, input_mode: str) -> "GraphDataset":
        return cls(arrays=graphs_to_arrays(graphs), input_mode=input_mode)

    def __len__(self) -> int:
        return self.arrays["geom"].shape[0]

    def take(self, idx: np.ndarray) -> ConstraintGraph:
        return ConstraintGraph(**{f: jnp.asarray(self.arrays[f][idx]) for f in _FIELDS})

    def batches(
        self, batch_size: int, seed: int = 0, drop_remainder: bool = True
    ) -> Iterator[ConstraintGraph]:
        """Infinite shuffled epochs (reference cycles its DataLoader,
        ``ddpm.py:53-56``)."""
        rng = np.random.default_rng(seed)
        n = len(self)
        while True:
            perm = rng.permutation(n)
            for s in range(0, n - batch_size + 1, batch_size):
                yield self.take(perm[s : s + batch_size])
