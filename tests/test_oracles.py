"""Host-side eval oracles: LP stability + IK pick-and-place on top of the
device geometry check (reference ddpm.py:653-669 oracle wiring)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_ccsp_tpu.graphs import stack_graphs


def test_stability_oracle_ground_truth_passes():
    from diffusion_ccsp_tpu.envs.stability import (
        sample_stability_scene,
        stability_scene_to_graph,
    )
    from diffusion_ccsp_tpu.eval.oracles import make_stability_oracle

    rng = np.random.default_rng(0)
    gs = [
        stability_scene_to_graph(
            sample_stability_scene(rng, min_num_objects=4, max_num_objects=6),
            8, 48,
        )
        for _ in range(8)
    ]
    graphs = stack_graphs(gs)
    oracle = make_stability_oracle()
    ok, fails = oracle(graphs, np.asarray(graphs.pose),
                       np.ones(8, bool))
    assert ok.all(), fails


def test_stability_oracle_settle_semantics():
    """Reference protocol (demo_utils.py:1101-1161): samples are simulated
    before checking — a box floating above its support *drops back* and still
    succeeds; a box moved off its support settles to the floor and fails the
    support-structure comparison."""
    import jax

    from diffusion_ccsp_tpu.envs.stability import (
        sample_stability_scene,
        stability_scene_to_graph,
    )
    from diffusion_ccsp_tpu.eval.oracles import make_stability_oracle

    rng = np.random.default_rng(1)
    g = stability_scene_to_graph(
        sample_stability_scene(rng, min_num_objects=4, max_num_objects=5),
        8, 48,
    )
    graphs = stack_graphs([g])
    oracle = make_stability_oracle()
    assert getattr(oracle, "supersedes", False)

    # small float above the support: settles back, still a success
    pose = np.asarray(graphs.pose).copy()
    pose[0, 1, 1] += 0.05
    ok, fails = oracle(graphs, pose, np.zeros(1, bool))
    assert ok[0], fails

    # find a tile resting on another tile and slide it far sideways: its
    # declared support no longer holds after settling
    etypes = np.asarray(graphs.edge_type[0])
    emask = np.asarray(graphs.edge_mask[0])
    edges = np.asarray(graphs.edges[0])
    stacked = [
        int(edges[k, 0]) for k in range(len(etypes))
        if emask[k] and etypes[k] == 1 and edges[k, 1] != 0
    ]
    if stacked:
        pose2 = np.asarray(graphs.pose).copy()
        pose2[0, stacked[0], 0] = 0.95  # near the right wall
        ok2, fails2 = oracle(graphs, pose2, np.zeros(1, bool))
        assert not ok2[0]
        assert fails2[0] in (
            "support_structure", "collision", "topple", "within"
        )


def test_robot_oracle_ground_truth_mostly_passes():
    from diffusion_ccsp_tpu.envs.robot import (
        sample_robot_scene,
        robot_scene_to_graph,
    )
    from diffusion_ccsp_tpu.eval.oracles import make_robot_oracle

    rng = np.random.default_rng(0)
    gs = [
        robot_scene_to_graph(
            sample_robot_scene(rng, min_num_objects=3, max_num_objects=4),
            8, 32,
        )
        for _ in range(4)
    ]
    graphs = stack_graphs(gs)
    oracle = make_robot_oracle(plan_paths=False)
    assert getattr(oracle, "supersedes", False)
    ok, fails = oracle(graphs, np.asarray(graphs.pose), np.ones(4, bool))
    # ground-truth scenes were constructed grasp-feasible; IK for the
    # synthetic workspace must find solutions for most of them
    assert ok.sum() >= 3, fails


def test_oracle_for_mode_dispatch():
    from diffusion_ccsp_tpu.eval.oracles import oracle_for_mode

    assert oracle_for_mode("qualitative") is None
    assert oracle_for_mode("diffuse_pairwise") is None
    assert oracle_for_mode("stability_flat") is not None
    assert oracle_for_mode("robot_box") is not None
