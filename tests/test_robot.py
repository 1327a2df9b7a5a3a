"""Robot packing mode: scene sampling, grasp feasibility by construction,
on-device gin/gfree checking, and denoiser forward with grasp encoder."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
from diffusion_ccsp_tpu.envs.robot import sample_robot_batch, sample_robot_scene, robot_scene_to_graph
from diffusion_ccsp_tpu.models.diffuser import ConstraintDiffuser, DiffuserConfig
from diffusion_ccsp_tpu.ops.geometry3d import robot_graph_satisfied
from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule


def test_scene_sampling():
    rng = np.random.default_rng(0)
    for _ in range(5):
        scene = sample_robot_scene(rng)
        assert 3 <= scene.num_objects <= 6
        assert all(0 <= s <= 4 for s in scene.grasp_sides)


def test_ground_truth_satisfied():
    rng = np.random.default_rng(1)
    for _ in range(10):
        scene = sample_robot_scene(rng)
        graph = robot_scene_to_graph(scene, max_nodes=8, max_edges=32)
        ok, sat = robot_graph_satisfied(graph, graph.pose)
        n_real = int(np.asarray(graph.edge_mask).sum())
        unsat = [
            (int(np.asarray(graph.edge_type)[k]),
             tuple(np.asarray(graph.edges)[k]))
            for k in range(n_real) if not np.asarray(sat)[k]
        ]
        assert bool(ok), f"ground-truth robot scene failed: {unsat}"


def test_collapsed_scene_fails():
    rng = np.random.default_rng(2)
    scene = sample_robot_scene(rng, min_num_objects=4)
    graph = robot_scene_to_graph(scene, max_nodes=8, max_edges=32)
    pose = np.asarray(graph.pose).copy()
    pose[1:, :2] = 0.0  # all objects at the container center
    ok, _ = robot_graph_satisfied(graph, jnp.asarray(pose))
    assert not bool(ok)


def test_robot_diffuser_trains():
    rng = np.random.default_rng(3)
    graphs = sample_robot_batch(rng, 4)
    cfg = DiffuserConfig(
        input_mode="robot_box", geom_dim=8, pose_dim=5, grasp_dim=5,
        hidden_dim=32,
    )
    model = ConstraintDiffuser(cfg)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(
        jax.random.PRNGKey(0), single.pose, single, jnp.asarray(0)
    )
    sched = DiffusionSchedule.create(timesteps=8)
    diff = GaussianDiffusion(model, sched)
    loss, grads = jax.value_and_grad(diff.loss)(
        params, graphs, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    # grasp encoder receives gradient (it feeds the gin/gfree MLPs)
    import flax

    flat = flax.traverse_util.flatten_dict(grads["params"])
    g_grasp = sum(
        float(jnp.abs(v).sum()) for k, v in flat.items() if "grasp" in k[0]
    )
    assert g_grasp > 0

    out = model.apply(params, graphs.pose, graphs, jnp.zeros(4, jnp.int32))
    assert out.shape == graphs.pose.shape


def test_sampling_chain_robot():
    rng = np.random.default_rng(4)
    graphs = sample_robot_batch(rng, 2)
    cfg = DiffuserConfig(
        input_mode="robot_box", geom_dim=8, pose_dim=5, grasp_dim=5,
        hidden_dim=32,
    )
    model = ConstraintDiffuser(cfg)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(
        jax.random.PRNGKey(0), single.pose, single, jnp.asarray(0)
    )
    sched = DiffusionSchedule.create(timesteps=8)
    diff = GaussianDiffusion(model, sched)
    out = diff.sample(params, graphs, jax.random.PRNGKey(5))
    assert out.shape == graphs.pose.shape
    assert np.isfinite(np.asarray(out)).all()


# --------------------------------------------------------------------------- #
# ShapeSettingWorld: shape menu + shake augmentation (reference
# worlds.py:459-483, 548-579)
# --------------------------------------------------------------------------- #


def test_shape_menu_and_constrained_placement():
    import numpy as np

    from diffusion_ccsp_tpu.envs.worlds import (
        SHAPE_MENU,
        ShapeScene,
        add_shape,
        sample_shape_scene,
        shape_polygon,
    )

    rng = np.random.default_rng(0)
    for shape in SHAPE_MENU:
        poly = shape_polygon(shape, 0.5, rng)
        assert poly.shape[1] == 2 and len(poly) >= 3

    sc = sample_shape_scene(rng, num_shapes=4)
    assert sc.num_tiles >= 2
    # placed shapes are mutually collision-free
    from diffusion_ccsp_tpu.native import convex_collisions

    col = convex_collisions(sc.world_polygons())
    np.fill_diagonal(col, False)
    assert not col.any()

    sc2 = ShapeScene((3.0, 3.0), [], [], np.zeros((0, 2)), np.zeros(0))
    assert add_shape(sc2, rng, "square", 0.5, constraints=[("RightIn",)])
    assert sc2.centers[0, 0] > 0


def test_shake_scene_augmentation():
    import numpy as np

    from diffusion_ccsp_tpu.envs.worlds import (
        sample_qualitative_scene,
        shake_scene,
    )

    rng = np.random.default_rng(1)
    sc = sample_qualitative_scene(rng, min_num_objects=3, max_num_objects=4)
    variants = list(shake_scene(sc, rng, num=6, delta=0.15))
    assert len(variants) == 6
    for v in variants:
        d = np.abs(v.centers - sc.centers)
        assert d.max() <= 0.15 + 1e-9
        assert d.max() > 0  # actually perturbed
