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


def test_stability_oracle_rejects_floating_box():
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
    pose = np.asarray(graphs.pose).copy()
    # lift tile 1 off its support: equilibrium must fail (declared support
    # without contact is a violated spec)
    pose[0, 1, 1] += 0.6
    oracle = make_stability_oracle()
    ok, fails = oracle(graphs, pose, np.ones(1, bool))
    assert not ok[0]
    assert fails[0] in ("contact", "equilibrium")


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
