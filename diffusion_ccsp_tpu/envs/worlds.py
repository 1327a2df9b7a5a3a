"""CCSP world sampling and graph construction (host side, numpy).

Capability parity: reference ``envs/worlds.py`` RandomSplitWorld /
RandomSplitQualitativeWorld — procedural scenes whose tiles come from a BSP
split of the tray (collision-free by construction), turned directly into
normalized, padded ``ConstraintGraph`` records (the reference detours through
trimesh scenes + JSON + torch-geometric ``.pt`` files,
``worlds.py:147-358`` / ``datasets.py:79-117``).

Feature layout (qualitative mode, reference ``data_transforms.py:101-109``):
  geom = (w/W, l/L)
  pose = (x/(W/2), y/(L/2), cos yaw, sin yaw)
  container row: geom=(1, 1), pose=(0, 0, 0, 0), conditioned.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from diffusion_ccsp_tpu.constraints import QUALITATIVE_CONSTRAINTS
from diffusion_ccsp_tpu.envs.builders import sample_tray_splitting, shrink_regions
from diffusion_ccsp_tpu.envs.qualitative import (
    extract_qualitative_constraints,
    randomize_unordered_constraints,
)
from diffusion_ccsp_tpu.graphs import ConstraintGraph, build_graph, stack_graphs


@dataclasses.dataclass
class QualitativeScene:
    """A sampled scene: ground-truth placements + generated constraint set."""

    world_dims: tuple[float, float]
    centers: np.ndarray  # [n, 2] tiles only
    extents: np.ndarray  # [n, 2]
    yaws: np.ndarray  # [n]
    constraints: list  # [(name, i, j)] with graph indices (container=0)

    @property
    def num_tiles(self) -> int:
        return len(self.centers)


def sample_qualitative_scene(
    rng: np.random.Generator,
    w: float = 3.0,
    l: float = 2.0,
    min_num_objects: int = 2,
    max_num_objects: int = 6,
    randomize_order: bool = True,
) -> QualitativeScene:
    """Sample one RandomSplitQualitativeWorld scene.

    Reference ``worlds.py:642-649,715-733``: BSP split with
    min_offset_perc=0, then constraint extraction; 'in' and pairwise 'cfree'
    edges come from ``generate_constraints`` (``worlds.py:127-145``).
    """
    while True:
        regions = sample_tray_splitting(
            rng, w, l, min_num_regions=min_num_objects,
            max_num_regions=max_num_objects,
        )
        centers, extents = shrink_regions(rng, regions, w, l, min_offset_perc=0.0)
        if min_num_objects <= len(centers) <= max_num_objects:
            break
    n = len(centers)
    yaws = np.zeros(n)

    constraints = [("in", i, 0) for i in range(1, n + 1)]
    for i in range(1, n):
        for j in range(i + 1, n + 1):
            constraints.append(("cfree", i, j))
    qual = extract_qualitative_constraints(centers, extents, yaws)
    if randomize_order:
        qual = randomize_unordered_constraints(rng, qual)
    constraints += qual

    return QualitativeScene(
        world_dims=(w, l), centers=centers, extents=extents, yaws=yaws,
        constraints=constraints,
    )


def qualitative_scene_to_graph(
    scene: QualitativeScene, max_nodes: int, max_edges: int
) -> ConstraintGraph:
    """Normalize and pad one scene into a ConstraintGraph."""
    w, l = scene.world_dims
    geom = [[1.0, 1.0]]
    pose = [[0.0, 0.0, 0.0, 0.0]]
    for k in range(scene.num_tiles):
        geom.append([scene.extents[k, 0] / w, scene.extents[k, 1] / l])
        pose.append(
            [
                scene.centers[k, 0] / (w / 2),
                scene.centers[k, 1] / (l / 2),
                np.cos(scene.yaws[k]),
                np.sin(scene.yaws[k]),
            ]
        )
    constraints = [c for c in scene.constraints if len(c) == 3]
    # drop overflow edges rather than failing: large scenes can exceed the
    # bucket; truncation order keeps in/cfree first (they were added first)
    constraints = constraints[:max_edges]
    return build_graph(
        geom, pose, constraints, "qualitative", max_nodes, max_edges, (w, l)
    )


def sample_qualitative_batch(
    rng: np.random.Generator,
    batch_size: int,
    max_nodes: int = 8,
    max_edges: int = 64,
    **scene_kwargs,
) -> ConstraintGraph:
    """Sample a batch of scenes as one stacked ConstraintGraph."""
    graphs = []
    for _ in range(batch_size):
        scene = sample_qualitative_scene(rng, **scene_kwargs)
        graphs.append(qualitative_scene_to_graph(scene, max_nodes, max_edges))
    return stack_graphs(graphs)
