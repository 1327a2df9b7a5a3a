"""StructDiffusion baseline: shapes, masking, and trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
from diffusion_ccsp_tpu.models.diffuser import DiffuserConfig
from diffusion_ccsp_tpu.models.transformer import StructDiffusion
from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule


def test_struct_diffusion_forward():
    rng = np.random.default_rng(0)
    graphs = sample_qualitative_batch(rng, 3, max_nodes=8, max_edges=64)
    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=32)
    model = StructDiffusion(cfg)
    pose_in = jax.random.normal(jax.random.PRNGKey(0), graphs.pose.shape)
    t = jnp.asarray([3, 50, 99])
    params = model.init(jax.random.PRNGKey(1), pose_in, graphs, t)
    out = model.apply(params, pose_in, graphs, t)
    assert out.shape == graphs.pose.shape
    out = np.asarray(out)
    cond = np.asarray(graphs.cond_mask)
    nmask = np.asarray(graphs.node_mask)
    np.testing.assert_allclose(out[cond], np.asarray(graphs.pose)[cond],
                               atol=1e-5)
    np.testing.assert_allclose(out[~nmask], 0.0, atol=1e-6)


def test_struct_diffusion_padding_invariance():
    """Garbage features in padded node slots must not leak through attention."""
    rng = np.random.default_rng(1)
    graphs = sample_qualitative_batch(rng, 2, max_nodes=8, max_edges=64,
                                      min_num_objects=3, max_num_objects=3)
    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=32)
    model = StructDiffusion(cfg)
    pose_in = jax.random.normal(jax.random.PRNGKey(2), graphs.pose.shape)
    t = jnp.asarray([7, 7])
    params = model.init(jax.random.PRNGKey(3), pose_in, graphs, t)
    out1 = model.apply(params, pose_in, graphs, t)

    geom2 = np.asarray(graphs.geom).copy()
    geom2[:, 5:] = 99.0  # padded slots (4 real nodes: 1 container + 3 tiles)
    g2 = graphs.replace(geom=jnp.asarray(geom2))
    out2 = model.apply(params, pose_in, g2, t)
    real = np.asarray(graphs.node_mask)
    np.testing.assert_allclose(
        np.asarray(out1)[real], np.asarray(out2)[real], atol=1e-5
    )


def test_struct_diffusion_trains():
    rng = np.random.default_rng(2)
    graphs = sample_qualitative_batch(rng, 8, max_nodes=8, max_edges=64)
    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=32)
    model = StructDiffusion(cfg)
    sched = DiffusionSchedule.create(timesteps=8)
    diff = GaussianDiffusion(model, sched)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(jax.random.PRNGKey(4), single.pose, single,
                        jnp.asarray(0))
    loss, grads = jax.value_and_grad(diff.loss)(params, graphs,
                                                jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(lambda a, x: a + float(jnp.abs(x).sum()), grads, 0.0)
    assert gnorm > 0
