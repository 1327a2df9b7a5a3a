"""Eval-layer tests: per-mode oracle dispatch, failure-mode decoding, and the
protocol on modes other than qualitative."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
from diffusion_ccsp_tpu.envs.stability import sample_stability_batch
from diffusion_ccsp_tpu.envs.triangles import sample_triangle_batch
from diffusion_ccsp_tpu.eval.evaluate import (
    evaluate_model,
    failure_modes,
    make_sample_and_check,
    satisfied_fn_for_mode,
)
from diffusion_ccsp_tpu.models.diffuser import ConstraintDiffuser, DiffuserConfig
from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule


def _mini(mode, geom_dim, pose_dim, graphs, grasp_dim=0):
    cfg = DiffuserConfig(input_mode=mode, geom_dim=geom_dim,
                         pose_dim=pose_dim, grasp_dim=grasp_dim, hidden_dim=16)
    model = ConstraintDiffuser(cfg)
    single = jax.tree.map(lambda x: jnp.asarray(x)[0], graphs)
    params = model.init(jax.random.PRNGKey(0), single.pose, single,
                        jnp.asarray(0))
    return GaussianDiffusion(model, DiffusionSchedule.create(timesteps=4)), params


def test_dispatch_selects_correct_oracle():
    assert satisfied_fn_for_mode("qualitative").__name__ == "qual"
    assert satisfied_fn_for_mode("robot_box").__name__ == "robot_graph_satisfied"
    assert (satisfied_fn_for_mode("robot_qualitative").__name__
            == "robot_qualitative_graph_satisfied")
    assert (satisfied_fn_for_mode("stability_flat").__name__
            == "stability_graph_satisfied_geometric")


def test_protocol_on_triangles():
    rng = np.random.default_rng(0)
    graphs = sample_triangle_batch(rng, 3)
    diffusion, params = _mini("diffuse_pairwise", 3, 4, graphs)
    res = evaluate_model(diffusion, params, graphs, jax.random.PRNGKey(1),
                         tries=2)
    assert res.success.shape == (3, 2)


def test_protocol_on_stability():
    rng = np.random.default_rng(1)
    graphs = sample_stability_batch(rng, 3)
    diffusion, params = _mini("stability_flat", 2, 4, graphs)
    res = evaluate_model(diffusion, params, graphs, jax.random.PRNGKey(2),
                         tries=2)
    assert res.success.shape == (3, 2)


def test_failure_modes_decoding():
    rng = np.random.default_rng(2)
    graphs = sample_triangle_batch(rng, 2, min_num_objects=3,
                                   max_num_objects=3)
    diffusion, params = _mini("diffuse_pairwise", 3, 4, graphs)
    fn = make_sample_and_check(diffusion, return_edge_sat=True)
    ok, out, edge_sat, _ = fn(params, jax.tree.map(jnp.asarray, graphs),
                           jax.random.PRNGKey(3))
    modes = failure_modes(graphs, np.asarray(edge_sat), "diffuse_pairwise")
    assert len(modes) == 2
    for b in range(2):
        if bool(ok[b]):
            assert modes[b] == []
        else:
            assert len(modes[b]) > 0
            for name, i, j in modes[b]:
                assert name in ("in", "cfree")
