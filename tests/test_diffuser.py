"""Tests for the ConstraintDiffuser model: shapes, masking semantics,
permutation invariance of the scatter aggregation, and EBM energy/gradient
consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_ccsp_tpu.graphs import build_graph, stack_graphs
from diffusion_ccsp_tpu.models.diffuser import (
    ConstraintDiffuser,
    DiffuserConfig,
    make_denoiser,
    make_energy_grad_fn,
)

N, E = 8, 24


def qualitative_graph(n_tiles=3, seed=0, max_nodes=N, max_edges=E):
    rng = np.random.default_rng(seed)
    n = n_tiles + 1
    geom = rng.uniform(0.1, 0.5, (n, 2)).tolist()
    geom[0] = [1.0, 1.0]
    pose = rng.uniform(-0.5, 0.5, (n, 4)).tolist()
    pose[0] = [0.0, 0.0, 0.0, 0.0]
    cons = [("in", i, 0) for i in range(1, n)]
    for i in range(1, n):
        for j in range(i + 1, n):
            cons.append(("cfree", i, j))
    cons.append(("close-to", 1, 2))
    return build_graph(
        geom, pose, cons, "qualitative", max_nodes, max_edges, (3.0, 2.0)
    )


@pytest.fixture(scope="module")
def model_and_params():
    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=32)
    model = ConstraintDiffuser(cfg)
    g = qualitative_graph()
    pose_in = jnp.zeros((N, 4))
    params = model.init(jax.random.PRNGKey(0), pose_in, g, jnp.asarray(5))
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    g = qualitative_graph()
    pose_in = jax.random.normal(jax.random.PRNGKey(1), (N, 4))
    out = model.apply(params, pose_in, g, jnp.asarray(3))
    assert out.shape == (N, 4)
    out_np = np.asarray(out)
    # conditioned node returns its ground-truth pose
    np.testing.assert_allclose(out_np[0], np.asarray(g.pose)[0], atol=1e-6)
    # padded nodes emit zeros
    np.testing.assert_allclose(out_np[4:], 0.0, atol=1e-6)


def test_padding_edge_invariance(model_and_params):
    """Adding more padded (masked) edge slots must not change the output."""
    model, params = model_and_params
    g1 = qualitative_graph(max_edges=E)
    pose_in = jax.random.normal(jax.random.PRNGKey(2), (N, 4))
    out1 = model.apply(params, pose_in, g1, jnp.asarray(7))

    # same graph, garbage in padded edge slots (mask still False)
    edges = np.asarray(g1.edges).copy()
    etype = np.asarray(g1.edge_type).copy()
    n_real = int(np.asarray(g1.edge_mask).sum())
    edges[n_real:] = [1, 2]
    etype[n_real:] = 5
    g2 = g1.replace(edges=jnp.asarray(edges), edge_type=jnp.asarray(etype))
    out2 = model.apply(params, pose_in, g2, jnp.asarray(7))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_edge_permutation_invariance(model_and_params):
    """Scatter-add aggregation is invariant to edge ordering
    (reference semantics: denoise_fn.py:377-389)."""
    model, params = model_and_params
    g1 = qualitative_graph()
    n_real = int(np.asarray(g1.edge_mask).sum())
    perm = np.random.default_rng(3).permutation(n_real)
    full_perm = np.concatenate([perm, np.arange(n_real, E)])
    g2 = g1.replace(
        edges=g1.edges[full_perm],
        edge_type=g1.edge_type[full_perm],
        edge_mask=g1.edge_mask[full_perm],
    )
    pose_in = jax.random.normal(jax.random.PRNGKey(4), (N, 4))
    out1 = model.apply(params, pose_in, g1, jnp.asarray(11))
    out2 = model.apply(params, pose_in, g2, jnp.asarray(11))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_sqrt_count_normalization(model_and_params):
    """A node touched by k constraints aggregates sum/sqrt(k)
    (reference denoise_fn.py:523-524)."""
    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=32, normalize=False)
    model_nonorm = ConstraintDiffuser(cfg)
    model, params = model_and_params
    g = qualitative_graph()
    pose_in = jax.random.normal(jax.random.PRNGKey(5), (N, 4))
    out_norm = model.apply(params, pose_in, g, jnp.asarray(2))
    out_raw = model_nonorm.apply(params, pose_in, g, jnp.asarray(2))

    counts = np.zeros(N)
    edges = np.asarray(g.edges)
    for k in range(E):
        if np.asarray(g.edge_mask)[k]:
            counts[edges[k, 0]] += 1
            counts[edges[k, 1]] += 1
    free = ~np.asarray(g.cond_mask) & np.asarray(g.node_mask)
    for i in range(N):
        if free[i] and counts[i] > 0:
            np.testing.assert_allclose(
                np.asarray(out_norm)[i],
                np.asarray(out_raw)[i] / np.sqrt(counts[i]),
                rtol=1e-5,
            )


def test_energy_grad_consistency(model_and_params):
    """jax.grad of the energy must match finite differences."""
    model, params = model_and_params
    g = qualitative_graph()
    pose_in = jax.random.normal(jax.random.PRNGKey(6), (N, 4))
    t = jnp.asarray(9)

    energy_fn = lambda p: model.apply(params, p, g, t, return_energy=True)
    grad = jax.grad(energy_fn)(pose_in)
    eps = 1e-3
    for idx in [(1, 0), (2, 3), (3, 1)]:
        d = np.zeros((N, 4), np.float32)
        d[idx] = eps
        fd = (energy_fn(pose_in + d) - energy_fn(pose_in - d)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(grad)[idx], fd, rtol=2e-2, atol=1e-3)


def test_batched_apply(model_and_params):
    model, params = model_and_params
    graphs = stack_graphs([qualitative_graph(n, seed=n) for n in (2, 3, 4)])
    denoiser = make_denoiser(model)
    pose_in = jax.random.normal(jax.random.PRNGKey(7), (3, N, 4))
    t = jnp.asarray([1, 500, 999])
    out = denoiser(params, pose_in, graphs, t)
    assert out.shape == (3, N, 4)
    # batched result matches per-graph result
    for b in range(3):
        single = model.apply(
            params,
            pose_in[b],
            jax.tree.map(lambda x: x[b], graphs),
            t[b],
        )
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(single),
                                   atol=1e-5)
