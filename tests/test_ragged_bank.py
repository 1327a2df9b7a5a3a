"""The ragged (sorted ragged_dot) and dense (one-hot) edge-MLP strategies must
be numerically equivalent — dense is the golden implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
from diffusion_ccsp_tpu.models.diffuser import (
    ConstraintDiffuser,
    ConstraintMLPBank,
    DiffuserConfig,
)


def test_bank_strategies_agree():
    K, IN, OUT = 5, 16, 12
    bank_d = ConstraintMLPBank(K, IN, OUT, strategy="dense")
    bank_r = ConstraintMLPBank(K, IN, OUT, strategy="ragged")
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 20, IN))
    types = jax.random.randint(jax.random.PRNGKey(1), (3, 20), 0, K)
    params = bank_d.init(jax.random.PRNGKey(2), x, types)
    yd = bank_d.apply(params, x, types)
    yr = bank_r.apply(params, x, types)
    np.testing.assert_allclose(np.asarray(yd), np.asarray(yr), atol=1e-5)


def test_full_model_strategies_agree():
    rng = np.random.default_rng(0)
    graphs = sample_qualitative_batch(rng, 4, max_nodes=8, max_edges=64)
    cfg_d = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=32,
        matmul_strategy="dense",
    )
    cfg_r = dataclass_replace(cfg_d, matmul_strategy="ragged")
    m_d = ConstraintDiffuser(cfg_d)
    m_r = ConstraintDiffuser(cfg_r)
    pose_in = jax.random.normal(jax.random.PRNGKey(3), graphs.pose.shape)
    t = jnp.asarray([0, 10, 50, 99])
    params = m_d.init(jax.random.PRNGKey(4), pose_in, graphs, t)
    out_d = m_d.apply(params, pose_in, graphs, t)
    out_r = m_r.apply(params, pose_in, graphs, t)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_r), atol=1e-5)

    e_d = m_d.apply(params, pose_in, graphs, t, return_energy=True)
    e_r = m_r.apply(params, pose_in, graphs, t, return_energy=True)
    np.testing.assert_allclose(np.asarray(e_d), np.asarray(e_r), rtol=1e-4)


def dataclass_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)
