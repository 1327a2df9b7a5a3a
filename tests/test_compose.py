"""Cross-domain composition tests: the composed robot_qualitative model must
reproduce each source model's outputs on its own constraint types, the
composed oracle must accept ground truth, and a full sampling chain runs."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.compose import compose_params, robot_qualitative_config
from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
from diffusion_ccsp_tpu.envs.robot import (
    robot_qualitative_scene_to_graph,
    sample_robot_scene,
)
from diffusion_ccsp_tpu.graphs import stack_graphs
from diffusion_ccsp_tpu.models.diffuser import ConstraintDiffuser, DiffuserConfig
from diffusion_ccsp_tpu.ops.geometry3d import robot_qualitative_graph_satisfied
from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule

H = 32


def build_models():
    robot_cfg = DiffuserConfig(
        input_mode="robot_box", geom_dim=8, pose_dim=5, grasp_dim=5,
        hidden_dim=H,
    )
    qual_cfg = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=H
    )
    comp_cfg = robot_qualitative_config(hidden_dim=H)
    return (
        ConstraintDiffuser(robot_cfg),
        ConstraintDiffuser(qual_cfg),
        ConstraintDiffuser(comp_cfg),
    )


def composed_graphs(n=2, seed=0):
    rng = np.random.default_rng(seed)
    gs = []
    for _ in range(n):
        scene = sample_robot_scene(rng)
        gs.append(robot_qualitative_scene_to_graph(scene, 8, 64))
    return stack_graphs(gs)


def test_composed_params_and_forward():
    robot_m, qual_m, comp_m = build_models()
    graphs = composed_graphs()

    # init source models on appropriately shaped data
    from diffusion_ccsp_tpu.envs.robot import sample_robot_batch
    from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch

    rng = np.random.default_rng(1)
    rg = sample_robot_batch(rng, 1)
    qg = sample_qualitative_batch(rng, 1)
    rp = robot_m.init(
        jax.random.PRNGKey(0), rg.pose, rg, jnp.zeros(1, jnp.int32)
    )
    qp = qual_m.init(
        jax.random.PRNGKey(1), qg.pose, qg, jnp.zeros(1, jnp.int32)
    )

    cp = compose_params(rp, qp, hidden_dim=H)
    t = jnp.zeros(2, jnp.int32)
    out = comp_m.apply(cp, graphs.pose, graphs, t)
    assert out.shape == graphs.pose.shape
    assert np.isfinite(np.asarray(out)).all()

    # robot-only edges: composed output == robot model output on the same
    # graph restricted to robot edges
    robot_only = graphs.replace(edge_mask=graphs.edge_mask & (graphs.edge_type < 2))
    out_comp = comp_m.apply(cp, graphs.pose, robot_only, t)
    out_robot = robot_m.apply(rp, graphs.pose, robot_only, t)
    np.testing.assert_allclose(
        np.asarray(out_comp), np.asarray(out_robot), atol=1e-5
    )


def test_composed_oracle_accepts_ground_truth():
    graphs = composed_graphs(3, seed=2)
    for b in range(3):
        g = jax.tree.map(lambda x: x[b], graphs)
        ok, sat = robot_qualitative_graph_satisfied(g, g.pose)
        n_real = int(np.asarray(g.edge_mask).sum())
        unsat = [
            (int(np.asarray(g.edge_type)[k]), tuple(np.asarray(g.edges)[k]))
            for k in range(n_real) if not np.asarray(sat)[k]
        ]
        assert bool(ok), f"composed ground truth failed: {unsat}"


def test_composed_sampling_runs():
    _, _, comp_m = build_models()
    graphs = composed_graphs()
    params = comp_m.init(
        jax.random.PRNGKey(3), graphs.pose, graphs, jnp.zeros(2, jnp.int32)
    )
    sched = DiffusionSchedule.create(timesteps=8)
    diff = GaussianDiffusion(comp_m, sched)
    out = diff.sample(params, graphs, jax.random.PRNGKey(4))
    assert np.isfinite(np.asarray(out)).all()


def test_composed_qualitative_edges_match_source_model():
    """Domain-2 routing parity (VERDICT r3 item 3's semantics check): on a
    composed graph restricted to QUALITATIVE edges, the composed model's
    per-node pose deltas must equal the source qualitative model run on the
    equivalent 2-D graph — geom = robot geom[:, :2] (w/w0, l/l0), pose =
    robot pose[:, (0,1,3,4)] = (x, y, cs, sn), with the z slot zero
    (reference domain-2 slice/decoder, denoise_fn.py:487-503,369-371)."""
    robot_m, qual_m, comp_m = build_models()
    graphs = composed_graphs(2, seed=5)

    from diffusion_ccsp_tpu.envs.robot import sample_robot_batch
    from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch

    rng = np.random.default_rng(1)
    rg = sample_robot_batch(rng, 1)
    qg = sample_qualitative_batch(rng, 1)
    rp = robot_m.init(
        jax.random.PRNGKey(0), rg.pose, rg, jnp.zeros(1, jnp.int32)
    )
    qp = qual_m.init(
        jax.random.PRNGKey(1), qg.pose, qg, jnp.zeros(1, jnp.int32)
    )
    cp = compose_params(rp, qp, hidden_dim=H)
    t = jnp.full((2,), 3, jnp.int32)

    # composed graph with only qualitative edges active
    qual_only = graphs.replace(
        edge_mask=graphs.edge_mask & (graphs.edge_type >= 2)
    )
    pose_in = jnp.asarray(
        np.random.default_rng(7).normal(size=graphs.pose.shape), jnp.float32
    )
    out_c = comp_m.apply(cp, pose_in, qual_only, t)

    # the equivalent pure-qualitative graph: 2-D slices of geometry/pose,
    # edge types shifted out of the composed vocabulary (robot types 0-1)
    sl = jnp.asarray([0, 1, 3, 4])
    qual_graph = qual_only.replace(
        geom=qual_only.geom[..., :2],
        pose=qual_only.pose[..., sl],
        grasp=jnp.zeros(qual_only.grasp.shape[:2] + (0,)),
        edge_type=jnp.maximum(qual_only.edge_type - 2, 0),
    )
    out_q = qual_m.apply(qp, pose_in[..., sl], qual_graph, t)

    free = np.asarray(graphs.node_mask) & ~np.asarray(graphs.cond_mask)
    c = np.asarray(out_c)
    q = np.asarray(out_q)
    np.testing.assert_allclose(c[free][:, [0, 1, 3, 4]], q[free], atol=1e-5)
    np.testing.assert_allclose(c[free][:, 2], 0.0, atol=1e-6)


def test_annealed_composing_weights_interpolate():
    """composing_weight_final: at t=T-1 the forward equals the static-initial
    config; at t=0 it equals the static-final config (round-5 anneal knob)."""
    T = 1000
    graphs = composed_graphs()
    base = robot_qualitative_config(hidden_dim=H)
    model = ConstraintDiffuser(base)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(jax.random.PRNGKey(0), single.pose, single,
                        jnp.asarray(0))

    w_hi, w_lo = (1.0, 0.7), (1.0, 0.1)
    annealed = ConstraintDiffuser(robot_qualitative_config(
        hidden_dim=H, composing_weight=w_hi, composing_weight_final=w_lo,
        anneal_timesteps=T,
    ))
    static_hi = ConstraintDiffuser(robot_qualitative_config(
        hidden_dim=H, composing_weight=w_hi))
    static_lo = ConstraintDiffuser(robot_qualitative_config(
        hidden_dim=H, composing_weight=w_lo))

    pose_in = jax.random.normal(jax.random.PRNGKey(1), graphs.pose.shape)
    t_start = jnp.full((2,), T - 1, jnp.int32)
    t_end = jnp.zeros((2,), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(annealed.apply(params, pose_in, graphs, t_start)),
        np.asarray(static_hi.apply(params, pose_in, graphs, t_start)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(annealed.apply(params, pose_in, graphs, t_end)),
        np.asarray(static_lo.apply(params, pose_in, graphs, t_end)),
        atol=1e-5,
    )
    # midway differs from both endpoints
    t_mid = jnp.full((2,), T // 2, jnp.int32)
    mid = np.asarray(annealed.apply(params, pose_in, graphs, t_mid))
    hi = np.asarray(static_hi.apply(params, pose_in, graphs, t_mid))
    assert np.abs(mid - hi).max() > 1e-6


def test_type_weights_scale_outputs_per_type():
    """type_weights = all-ones matches the unweighted forward; zeroing all
    qualitative types reproduces composing_weight (1, 0)."""
    graphs = composed_graphs()
    base = robot_qualitative_config(hidden_dim=H)
    model = ConstraintDiffuser(base)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(jax.random.PRNGKey(0), single.pose, single,
                        jnp.asarray(0))
    pose_in = jax.random.normal(jax.random.PRNGKey(1), graphs.pose.shape)
    t = jnp.full((2,), 5, jnp.int32)

    n_types = len(base.constraint_set)
    ones = ConstraintDiffuser(robot_qualitative_config(
        hidden_dim=H, type_weights=(1.0,) * n_types))
    np.testing.assert_allclose(
        np.asarray(ones.apply(params, pose_in, graphs, t)),
        np.asarray(model.apply(params, pose_in, graphs, t)),
        atol=1e-6,
    )
    zero_qual = ConstraintDiffuser(robot_qualitative_config(
        hidden_dim=H, type_weights=(1.0, 1.0) + (0.0,) * (n_types - 2)))
    w10 = ConstraintDiffuser(robot_qualitative_config(
        hidden_dim=H, composing_weight=(1.0, 0.0)))
    np.testing.assert_allclose(
        np.asarray(zero_qual.apply(params, pose_in, graphs, t)),
        np.asarray(w10.apply(params, pose_in, graphs, t)),
        atol=1e-6,
    )


def test_domain_norm_reduces_to_shared_norm_on_single_domain():
    """Per-domain renormalization must equal the reference's shared
    sqrt-count normalization whenever every edge is one domain, and differ
    (finite) on genuinely mixed graphs."""
    graphs = composed_graphs()
    base = robot_qualitative_config(hidden_dim=H)
    model = ConstraintDiffuser(base)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(jax.random.PRNGKey(0), single.pose, single,
                        jnp.asarray(0))
    model_dn = ConstraintDiffuser(
        robot_qualitative_config(hidden_dim=H, domain_norm=True)
    )
    pose_in = jax.random.normal(jax.random.PRNGKey(1), graphs.pose.shape)
    t = jnp.full((2,), 5, jnp.int32)

    # all-domain-2 graph: force every edge type into the qualitative range
    g2 = graphs.replace(edge_type=jnp.maximum(graphs.edge_type, 2))
    np.testing.assert_allclose(
        np.asarray(model_dn.apply(params, pose_in, g2, t)),
        np.asarray(model.apply(params, pose_in, g2, t)),
        atol=1e-5,
    )
    # mixed graph: differs but finite
    out_dn = np.asarray(model_dn.apply(params, pose_in, graphs, t))
    out_sh = np.asarray(model.apply(params, pose_in, graphs, t))
    assert np.isfinite(out_dn).all()
    assert np.abs(out_dn - out_sh).max() > 1e-6
