"""Stability mode tests: sampler invariants (stable by construction, bridges,
intermediate stability), equilibrium analysis on hand-built cases, and the
geometric + equilibrium oracle on ground truth vs. perturbations."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_ccsp_tpu.envs.stability import (
    check_stability_solution,
    check_static_equilibrium,
    sample_stability_batch,
    sample_stability_scene,
    stability_scene_to_graph,
)
from diffusion_ccsp_tpu.ops.geometry2d import stability_graph_satisfied_geometric

FLOOR = -1.0


def test_equilibrium_simple_tower():
    # box on floor, box centered on top -> stable
    centers = np.asarray([[0.0, FLOOR + 0.25], [0.0, FLOOR + 0.75]])
    extents = np.asarray([[1.0, 0.5], [0.5, 0.5]])
    assert check_static_equilibrium(centers, extents, [(1, 0), (2, 1)], FLOOR)


def test_equilibrium_overhang_falls():
    # top box's CoM beyond the support edge -> unstable
    centers = np.asarray([[0.0, FLOOR + 0.25], [0.9, FLOOR + 0.75]])
    extents = np.asarray([[1.0, 0.5], [0.5, 0.5]])
    assert not check_static_equilibrium(centers, extents, [(1, 0), (2, 1)], FLOOR)


def test_equilibrium_bridge():
    # bridge across two towers -> stable; loaded off-center near one edge is
    # still stable while supported span covers the CoM
    centers = np.asarray(
        [[-0.6, FLOOR + 0.25], [0.6, FLOOR + 0.25], [0.0, FLOOR + 0.75]]
    )
    extents = np.asarray([[0.4, 0.5], [0.4, 0.5], [1.6, 0.5]])
    assert check_static_equilibrium(
        centers, extents, [(1, 0), (2, 0), (3, 1), (3, 2)], FLOOR
    )


def test_equilibrium_toppling_carried_load():
    # lower box stable alone, but carried load shifts aggregate CoM off its
    # floor contact -> only detectable with load accumulation
    centers = np.asarray([[0.0, FLOOR + 0.25], [0.55, FLOOR + 0.75]])
    extents = np.asarray([[1.2, 0.5], [1.2, 0.5]])
    # top box CoM at 0.55 is inside lower's span [-0.6, 0.6] so both "span"
    # checks pass individually; with 5x mass the aggregate shifts hard right
    heavy_extents = np.asarray([[0.4, 0.5], [2.4, 1.0]])
    heavy_centers = np.asarray([[0.0, FLOOR + 0.25], [1.15, FLOOR + 1.0]])
    assert not check_static_equilibrium(
        heavy_centers, heavy_extents, [(1, 0), (2, 1)], FLOOR
    )


def test_sampler_produces_valid_graphs():
    rng = np.random.default_rng(0)
    bridges = 0
    for _ in range(10):
        scene = sample_stability_scene(rng)
        assert 4 <= scene.num_tiles <= 7
        # every tile has at least one support
        supported = {i for i, _ in scene.supports}
        assert supported == set(range(1, scene.num_tiles + 1))
        # bridge = tile with two or more physical supports
        from collections import Counter

        c = Counter(i for i, j in scene.supports if j != 0)
        bridges += any(v >= 2 for v in c.values())
    assert bridges >= 3  # bridges are sampled with high probability


def test_ground_truth_passes_oracle():
    rng = np.random.default_rng(1)
    for _ in range(10):
        scene = sample_stability_scene(rng)
        graph = stability_scene_to_graph(scene, max_nodes=8, max_edges=48)
        ok, sat = stability_graph_satisfied_geometric(graph, graph.pose)
        n_real = int(np.asarray(graph.edge_mask).sum())
        unsat = [
            (int(np.asarray(graph.edge_type)[k]),
             tuple(np.asarray(graph.edges)[k]))
            for k in range(n_real)
            if not np.asarray(sat)[k]
        ]
        assert bool(ok), f"ground truth failed geometric check: {unsat}"
        assert check_stability_solution(graph, graph.pose)


def test_perturbed_structure_fails():
    rng = np.random.default_rng(2)
    scene = sample_stability_scene(rng)
    graph = stability_scene_to_graph(scene, max_nodes=8, max_edges=48)
    pose = np.asarray(graph.pose).copy()
    # lift every tile by half the shelf: breaks floor contact / supports
    pose[1:, 1] += 0.5
    assert not check_stability_solution(graph, jnp.asarray(pose))


def test_batch_shapes():
    rng = np.random.default_rng(3)
    graphs = sample_stability_batch(rng, 3)
    assert graphs.geom.shape == (3, 8, 2)
    assert graphs.pose.shape == (3, 8, 4)


def test_3d_box_splitting_sampler():
    """Layered 3-D packing sampler (reference builders.py:79-279): bottom
    regions, a bridge spanning 2-3 mutually close boxes, per-region tops."""
    import numpy as np

    from diffusion_ccsp_tpu.envs.builders import sample_3d_box_splitting

    rng = np.random.default_rng(0)
    found_bridge = 0
    for _ in range(5):
        regions = sample_3d_box_splitting(rng, 3.0, 2.0, 1.0, 6, 10)
        assert regions is not None
        assert 6 <= len(regions) <= 10
        zs = sorted({round(r[2], 6) for r in regions})
        assert len(zs) >= 2  # at least two layers
        for (x, y, z, rw, rl, rh) in regions:
            assert rw > 0 and rl > 0 and rh > 0
            assert x >= -1e-9 and y >= -1e-9
            assert x + rw <= 3.0 + 1e-9 and y + rl <= 2.0 + 1e-9
            assert z + rh <= 1.0 + 1e-9
        # a raised box resting on bottom boxes (the bridge) exists
        bottom_tops = {
            round(r[2] + r[5], 6) for r in regions if r[2] == 0.0
        }
        raised = [r for r in regions if r[2] > 0]
        if raised:
            found_bridge += 1
    assert found_bridge >= 4
