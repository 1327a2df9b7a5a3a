"""Fused Pallas edge kernel vs the dense golden path.

The kernel runs in interpreter mode on CPU (``interpret=True`` is selected
automatically off-TPU); numerics must match the dense one-hot-mix strategy,
which is the golden reference implementation of the factor-graph edge stage
(reference semantics ``denoise_fn.py:313-389``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
from diffusion_ccsp_tpu.models.diffuser import (
    ConstraintDiffuser,
    DiffuserConfig,
)
from diffusion_ccsp_tpu.ops.edge_kernel import (
    TILE,
    make_padded_dispatch,
)
from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule


def _setup(use_pallas: bool, rng):
    cfg = DiffuserConfig(
        input_mode="qualitative",
        geom_dim=2,
        pose_dim=4,
        hidden_dim=64,
        matmul_strategy="dense" if not use_pallas else "ragged",
        use_pallas=use_pallas,
    )
    model = ConstraintDiffuser(cfg)
    graphs = sample_qualitative_batch(rng, 5, max_nodes=8, max_edges=24)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(
        jax.random.PRNGKey(0), single.pose, single, jnp.asarray(0)
    )
    return model, params, graphs


def test_padded_dispatch_layout(rng):
    graphs = sample_qualitative_batch(rng, 5, max_nodes=8, max_edges=24)
    num_types = 13
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask, num_types, 8
    )
    assert d.rows % TILE == 0
    # every real edge appears exactly once, with the right type tile
    et = np.asarray(graphs.edge_type).reshape(-1)
    em = np.asarray(graphs.edge_mask).reshape(-1)
    mask = np.asarray(d.mask).astype(bool)
    assert mask.sum() == em.sum()
    tile_of_row = np.repeat(np.asarray(d.tile_type), TILE)
    a1 = np.asarray(d.a1).reshape(-1)
    a2 = np.asarray(d.a2).reshape(-1)
    edges = np.asarray(graphs.edges)
    b_of = np.asarray(d.bidx).reshape(-1)
    # reconstruct each real row's (graph, endpoints) and check the tile type
    # matches that edge's constraint type
    seen = set()
    flat_edges = {}
    for b in range(edges.shape[0]):
        for j in range(edges.shape[1]):
            if em[b * edges.shape[1] + j]:
                key = (b, edges[b, j, 0] + b * 8, edges[b, j, 1] + b * 8,
                       et[b * edges.shape[1] + j])
                flat_edges.setdefault(key, 0)
                flat_edges[key] += 1
    for r in np.nonzero(mask)[0]:
        key = (b_of[r], a1[r], a2[r], tile_of_row[r])
        assert key in flat_edges, key
        seen.add(key)
        flat_edges[key] -= 1
    assert all(v == 0 for v in flat_edges.values())


def test_pallas_forward_matches_dense(rng):
    model_d, params, graphs = _setup(False, rng)
    cfg_p = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        use_pallas=True,
    )
    model_p = ConstraintDiffuser(cfg_p)

    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.arange(5) * 100
    ref = model_d.apply(params, pose_in, graphs, t)

    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask,
        cfg_p.num_types, graphs.max_nodes,
    )
    out = model_p.apply(params, pose_in, graphs, t, dispatch=d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2,
                               rtol=2e-2)


def test_pallas_energy_matches_dense(rng):
    model_d, params, graphs = _setup(False, rng)
    cfg_p = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        use_pallas=True, compute_dtype="float32",
    )
    model_p = ConstraintDiffuser(cfg_p)

    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.arange(5) * 100
    ref = model_d.apply(params, pose_in, graphs, t, return_energy=True)
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask,
        cfg_p.num_types, graphs.max_nodes,
    )
    out = model_p.apply(
        params, pose_in, graphs, t, return_energy=True, dispatch=d
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4)


def test_pallas_full_sampling_chain(rng):
    """End-to-end: a short DDPM chain through GaussianDiffusion with
    use_pallas produces the same trajectory as the ragged path (identical
    params and keys, f32 compute)."""
    cfg_r = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
    )
    cfg_p = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        use_pallas=True, compute_dtype="float32",
    )
    graphs = sample_qualitative_batch(rng, 4, max_nodes=8, max_edges=24)
    model_r = ConstraintDiffuser(cfg_r)
    model_p = ConstraintDiffuser(cfg_p)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model_r.init(
        jax.random.PRNGKey(0), single.pose, single, jnp.asarray(0)
    )
    sched = DiffusionSchedule.create(timesteps=8)
    out_r = GaussianDiffusion(model_r, sched).sample(
        params, graphs, jax.random.PRNGKey(7)
    )
    out_p = GaussianDiffusion(model_p, sched).sample(
        params, graphs, jax.random.PRNGKey(7)
    )
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_r), atol=1e-4, rtol=1e-4
    )


def test_pallas_rejects_grasp_modes(rng):
    cfg = DiffuserConfig(
        input_mode="robot_box", geom_dim=8, pose_dim=5, grasp_dim=5,
        hidden_dim=64, use_pallas=True,
    )
    from diffusion_ccsp_tpu.envs.robot import sample_robot_batch

    graphs = sample_robot_batch(rng, 2, max_nodes=8, max_edges=24)
    model = ConstraintDiffuser(cfg)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(
        jax.random.PRNGKey(0), single.pose, single, jnp.asarray(0)
    )
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask,
        cfg.num_types, graphs.max_nodes,
    )
    with pytest.raises(NotImplementedError):
        model.apply(
            params, graphs.pose, graphs, jnp.zeros(2, jnp.int32), dispatch=d
        )


def test_sorted_xla_forward_matches_dense(rng):
    """The pure-XLA sorted backend (use_kernel=False) matches the golden
    dense path bit-for-bit-ish in f32."""
    model_d, params, graphs = _setup(False, rng)
    cfg_s = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        matmul_strategy="sorted", compute_dtype="float32",
    )
    model_s = ConstraintDiffuser(cfg_s)
    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.arange(5) * 100
    ref = model_d.apply(params, pose_in, graphs, t)
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask,
        cfg_s.num_types, graphs.max_nodes, use_kernel=False,
    )
    out = model_s.apply(params, pose_in, graphs, t, dispatch=d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


def test_sorted_xla_energy_grad(rng):
    """The sorted XLA backend is differentiable: the EBM gradient path works
    through it and matches the dense-path gradients (the Pallas kernel gets
    the same property from its custom VJP, tested below)."""
    from diffusion_ccsp_tpu.models.diffuser import make_energy_grad_fn

    model_d, params, graphs = _setup(False, rng)
    cfg_s = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        matmul_strategy="sorted", compute_dtype="float32",
    )
    model_s = ConstraintDiffuser(cfg_s)
    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.arange(5) * 100
    g_ref, e_ref = make_energy_grad_fn(model_d)(params, pose_in, graphs, t)
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask,
        cfg_s.num_types, graphs.max_nodes, use_kernel=False,
    )
    g, e = make_energy_grad_fn(model_s)(
        params, pose_in, graphs, t, dispatch=d
    )
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4,
                               rtol=1e-4)


def test_sorted_dispatch_through_gaussian_diffusion(rng):
    """matmul_strategy='sorted' routes _dispatch to the padded layout with
    use_kernel=False and samples identically to the ragged chain."""
    cfg_r = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
    )
    cfg_s = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        matmul_strategy="sorted", compute_dtype="float32",
    )
    graphs = sample_qualitative_batch(rng, 4, max_nodes=8, max_edges=24)
    model_r = ConstraintDiffuser(cfg_r)
    model_s = ConstraintDiffuser(cfg_s)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model_r.init(
        jax.random.PRNGKey(0), single.pose, single, jnp.asarray(0)
    )
    sched = DiffusionSchedule.create(timesteps=8)
    out_r = GaussianDiffusion(model_r, sched).sample(
        params, graphs, jax.random.PRNGKey(7)
    )
    out_s = GaussianDiffusion(model_s, sched).sample(
        params, graphs, jax.random.PRNGKey(7)
    )
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_r), atol=1e-4, rtol=1e-4
    )


def test_chunked_dispatch_matches_dense(rng):
    """Chunked kernel layout (fan-out-scale batches): forward matches the
    dense golden path when the batch is split across kernel chunks,
    including a batch size that does NOT divide evenly into chunks."""
    model_d, params, _ = _setup(False, rng)
    cfg_p = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        use_pallas=True, compute_dtype="float32",
    )
    model_p = ConstraintDiffuser(cfg_p)

    graphs = sample_qualitative_batch(rng, 7, max_nodes=8, max_edges=24)
    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.arange(7) * 100
    ref = model_d.apply(params, pose_in, graphs, t)

    for chunk in (2, 3, 7):  # 7 % 2 != 0, 7 % 3 != 0 (phantom padding), ==B
        d = make_padded_dispatch(
            graphs.edges, graphs.edge_type, graphs.edge_mask,
            cfg_p.num_types, graphs.max_nodes, chunk_graphs=chunk,
        )
        if chunk < 7:
            assert d.idx_packed.ndim == 4, chunk
            assert d.chunk_graphs == chunk
        out = model_p.apply(params, pose_in, graphs, t, dispatch=d)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2,
            err_msg=f"chunk={chunk}",
        )


def test_chunked_dispatch_global_ids(rng):
    """Global a1/a2/bidx/mask of a chunked dispatch cover exactly the real
    edges (phantom padding carries mask 0), and node_counts equals the
    unchunked dispatch's."""
    graphs = sample_qualitative_batch(rng, 7, max_nodes=8, max_edges=24)
    d0 = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask, 13, 8
    )
    dc = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask, 13, 8,
        chunk_graphs=3,
    )
    assert float(dc.mask.sum()) == float(d0.mask.sum())
    np.testing.assert_array_equal(
        np.asarray(dc.node_counts), np.asarray(d0.node_counts)
    )
    m = np.asarray(dc.mask).astype(bool)
    a1 = np.asarray(dc.a1).reshape(-1)
    a2 = np.asarray(dc.a2).reshape(-1)
    b = np.asarray(dc.bidx).reshape(-1)
    assert a1[m].max() < 7 * 8 and a2[m].max() < 7 * 8
    assert b[m].max() < 7
    # masked (padding/phantom) rows are pinned to id 0
    assert a1[~m].max() == 0 and b[~m].max() == 0


def test_auto_chunk_graphs():
    from diffusion_ccsp_tpu.ops.edge_kernel import auto_chunk_graphs

    assert auto_chunk_graphs(100, 8) is None  # 800 rows fit the target
    assert auto_chunk_graphs(1000, 8) == 125  # 8 balanced chunks of 125
    assert auto_chunk_graphs(5000, 8) == 125  # 40 balanced chunks
    assert auto_chunk_graphs(10, 2048) == 1  # degenerate: one graph/chunk
    # advisor finding: a batch one graph past a chunk multiple must NOT get
    # a nearly all-phantom trailing chunk (129 -> 2 chunks of 65, not 128+1)
    bc = auto_chunk_graphs(129, 8)
    assert bc == 65 and -(-129 // bc) == 2
    # every chunking covers the batch with <= 1 row of imbalance
    for bsz in (129, 257, 1000, 4999):
        bc = auto_chunk_graphs(bsz, 8)
        n_chunks = -(-bsz // bc)
        assert n_chunks * bc >= bsz and (n_chunks - 1) * bc < bsz
        assert bc * 8 <= 1024 + 8  # node table stays near the target


def test_diff_edge_bank_gradient_parity(rng):
    """custom-VJP gradients through the Pallas kernel (interpret mode on
    CPU) match autodiff through the dense golden path for EVERY input:
    pose_in (the energy-sampling case), geometry, time embedding, and the
    weight bank (the training case, exercised for completeness)."""
    model_d, params, graphs = _setup(False, rng)
    cfg_p = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        use_pallas=True, compute_dtype="float32",
    )
    model_p = ConstraintDiffuser(cfg_p)
    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.arange(5) * 100
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask,
        cfg_p.num_types, graphs.max_nodes,
    )

    def energy_d(p, x):
        return model_d.apply(p, x, graphs, t, return_energy=True).sum()

    def energy_p(p, x):
        return model_p.apply(
            p, x, graphs, t, return_energy=True, dispatch=d
        ).sum()

    # pose gradients: the quantity every MCMC step needs
    g_ref = jax.grad(energy_d, argnums=1)(params, pose_in)
    g_pal = jax.grad(energy_p, argnums=1)(params, pose_in)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), atol=1e-4, rtol=1e-4
    )

    # parameter gradients (incl. the edge-bank kernel/bias cotangents the
    # custom bwd computes explicitly)
    gp_ref = jax.grad(energy_d, argnums=0)(params, pose_in)
    gp_pal = jax.grad(energy_p, argnums=0)(params, pose_in)
    flat_ref = jax.tree.leaves_with_path(gp_ref)
    flat_pal = dict(jax.tree.leaves_with_path(gp_pal))
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_pal[path]), np.asarray(leaf),
            atol=2e-3, rtol=2e-3, err_msg=str(path),
        )


def test_diff_edge_bank_gradient_parity_chunked(rng):
    """Same parity through the CHUNKED kernel layout (the fan-out regime):
    the backward walks per-chunk ragged matmuls."""
    model_d, params, graphs = _setup(False, rng)
    cfg_p = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        use_pallas=True, compute_dtype="float32",
    )
    model_p = ConstraintDiffuser(cfg_p)
    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.arange(5) * 100
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask,
        cfg_p.num_types, graphs.max_nodes, chunk_graphs=2,  # 5 graphs -> 3 chunks
    )

    def energy_d(x):
        return model_d.apply(params, x, graphs, t, return_energy=True).sum()

    def energy_p(x):
        return model_p.apply(
            params, x, graphs, t, return_energy=True, dispatch=d
        ).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(energy_p)(pose_in)),
        np.asarray(jax.grad(energy_d)(pose_in)),
        atol=1e-4, rtol=1e-4,
    )


def test_pallas_mcmc_chain_matches_sorted(rng):
    """A short MALA chain (grad + energy every inner step) through
    use_pallas matches the differentiable sorted-XLA path trajectory."""
    from diffusion_ccsp_tpu.samplers import MCMCConfig

    graphs = sample_qualitative_batch(rng, 3, max_nodes=8, max_edges=24)
    kw = dict(input_mode="qualitative", geom_dim=2, pose_dim=4,
              hidden_dim=64, compute_dtype="float32")
    cfg_s = DiffuserConfig(matmul_strategy="sorted", **kw)
    cfg_p = DiffuserConfig(use_pallas=True, **kw)
    model_s, model_p = ConstraintDiffuser(cfg_s), ConstraintDiffuser(cfg_p)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model_s.init(
        jax.random.PRNGKey(0), single.pose, single, jnp.asarray(0)
    )
    sched = DiffusionSchedule.create(timesteps=6)
    mcmc = MCMCConfig(kind="MALA", samples_per_step=2)
    out_s = GaussianDiffusion(model_s, sched, mcmc=mcmc,
                              energy_based=True).sample(
        params, graphs, jax.random.PRNGKey(5)
    )
    out_p = GaussianDiffusion(model_p, sched, mcmc=mcmc,
                              energy_based=True).sample(
        params, graphs, jax.random.PRNGKey(5)
    )
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_s), atol=1e-4, rtol=1e-4
    )


def test_phantom_tiles_are_sentinel_marked(rng):
    """Masked edge slots sort into the sentinel tail group (tile_type == K):
    with E_max far above the real edge count, most tiles must be skippable,
    and every real edge must live in a tile of its own type (< K)."""
    graphs = sample_qualitative_batch(rng, 20, max_nodes=8, max_edges=64)
    K = 13
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask, K, 8
    )
    tt = np.asarray(d.tile_type)
    mask = np.asarray(d.mask).astype(bool).reshape(-1, TILE)
    real_edges = int(np.asarray(graphs.edge_mask).sum())
    # every real row sits in a typed tile
    typed = tt < K
    assert mask[~typed].sum() == 0
    assert mask[typed].sum() == real_edges
    # compute tiles ~ per-type ceil (at most one partial tile per type),
    # strictly below the static bound — the rest is skipped
    n_compute = int(typed.sum())
    assert n_compute <= -(-real_edges // TILE) + K
    assert (tt >= K).sum() >= tt.size - n_compute > 0


def test_edge_bank_v2_matches_dense(rng):
    """Split-bank kernel v2 (chain-constant geom contribution + pose-only
    gathers + fused decoder) must match the dense golden forward under a
    UNIFORM timestep (the sampling-chain contract; f32 compute)."""
    from diffusion_ccsp_tpu.ops.edge_kernel import compute_edge_const

    model_d, params, graphs = _setup(False, rng)
    cfg_p = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        use_pallas=True, compute_dtype="float32",
    )
    model_p = ConstraintDiffuser(cfg_p)

    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.full((5,), 300, jnp.int32)
    ref = model_d.apply(params, pose_in, graphs, t)

    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask,
        cfg_p.num_types, graphs.max_nodes,
    )
    geom_emb = model_p.apply(
        params, graphs, method=ConstraintDiffuser.encode_geometry
    )
    gc = compute_edge_const(
        d, geom_emb, params["params"]["mlp_bank"]["kernel"], "float32"
    )
    d = d.replace(edge_const=gc)
    out = model_p.apply(params, pose_in, graphs, t, dispatch=d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_edge_bank_v2_chunked_matches_dense(rng):
    from diffusion_ccsp_tpu.ops.edge_kernel import compute_edge_const

    model_d, params, graphs = _setup(False, rng)
    cfg_p = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        use_pallas=True, compute_dtype="float32",
    )
    model_p = ConstraintDiffuser(cfg_p)
    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.full((5,), 77, jnp.int32)
    ref = model_d.apply(params, pose_in, graphs, t)
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask,
        cfg_p.num_types, graphs.max_nodes, chunk_graphs=2,
    )
    geom_emb = model_p.apply(
        params, graphs, method=ConstraintDiffuser.encode_geometry
    )
    gc = compute_edge_const(
        d, geom_emb, params["params"]["mlp_bank"]["kernel"], "float32"
    )
    d = d.replace(edge_const=gc)
    out = model_p.apply(params, pose_in, graphs, t, dispatch=d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_v2_auto_attached_in_sampling_chain(rng):
    """GaussianDiffusion.sample on a use_pallas noise model attaches
    edge_const automatically (v2 path) and must reproduce the sorted-XLA
    chain trajectory exactly (f32)."""
    cfg_p = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        use_pallas=True, compute_dtype="float32",
    )
    cfg_s = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        matmul_strategy="sorted", compute_dtype="float32",
    )
    model_p, model_s = ConstraintDiffuser(cfg_p), ConstraintDiffuser(cfg_s)
    graphs = sample_qualitative_batch(rng, 4, max_nodes=8, max_edges=24)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model_p.init(
        jax.random.PRNGKey(0), single.pose, single, jnp.asarray(0)
    )
    sched = DiffusionSchedule.create(timesteps=6)
    out_p = GaussianDiffusion(model_p, sched).sample(
        params, graphs, jax.random.PRNGKey(3)
    )
    out_s = GaussianDiffusion(model_s, sched).sample(
        params, graphs, jax.random.PRNGKey(3)
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               atol=1e-4, rtol=1e-4)


def test_sorted_split_bank_matches_dense_and_grads(rng):
    """Sorted-XLA split path (edge_const attached): forward parity under
    uniform t AND pose-gradient parity of the energy — the MCMC thesis rows
    differentiate through this path."""
    from diffusion_ccsp_tpu.ops.edge_kernel import compute_edge_const

    model_d, params, graphs = _setup(False, rng)
    cfg_s = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        matmul_strategy="sorted", compute_dtype="float32",
    )
    model_s = ConstraintDiffuser(cfg_s)
    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.full((5,), 123, jnp.int32)
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask,
        cfg_s.num_types, graphs.max_nodes, use_kernel=False,
    )
    geom_emb = model_s.apply(
        params, graphs, method=ConstraintDiffuser.encode_geometry
    )
    gc = compute_edge_const(
        d, geom_emb, params["params"]["mlp_bank"]["kernel"], "float32"
    )
    ds = d.replace(edge_const=gc)

    ref = model_d.apply(params, pose_in, graphs, t)
    out = model_s.apply(params, pose_in, graphs, t, dispatch=ds)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)

    def e_ref(x):
        return model_d.apply(params, x, graphs, t, return_energy=True).sum()

    def e_split(x):
        return model_s.apply(params, x, graphs, t, return_energy=True,
                             dispatch=ds).sum()

    g_ref = jax.grad(e_ref)(pose_in)
    g_split = jax.grad(e_split)(pose_in)
    np.testing.assert_allclose(np.asarray(g_split), np.asarray(g_ref),
                               atol=1e-3, rtol=1e-3)


def test_type_weights_on_sorted_layout_match_ragged(rng):
    """Inference-time per-type output weights must act identically on the
    ragged and sorted/split layouts (the k=100 eval rows use sorted)."""
    from diffusion_ccsp_tpu.ops.edge_kernel import compute_edge_const

    _, params, graphs = _setup(False, rng)
    tw = (1.0, 1.4) + (0.7,) * 11  # qualitative has 13 types
    cfg_r = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        matmul_strategy="ragged", type_weights=tw,
    )
    cfg_s = DiffuserConfig(
        input_mode="qualitative", geom_dim=2, pose_dim=4, hidden_dim=64,
        matmul_strategy="sorted", compute_dtype="float32", type_weights=tw,
    )
    model_r, model_s = ConstraintDiffuser(cfg_r), ConstraintDiffuser(cfg_s)
    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.full((5,), 50, jnp.int32)
    ref = model_r.apply(params, pose_in, graphs, t)

    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask,
        cfg_s.num_types, graphs.max_nodes, use_kernel=False,
    )
    geom_emb = model_s.apply(
        params, graphs, method=ConstraintDiffuser.encode_geometry
    )
    gc = compute_edge_const(
        d, geom_emb, params["params"]["mlp_bank"]["kernel"], "float32"
    )
    out = model_s.apply(params, pose_in, graphs, t,
                        dispatch=d.replace(edge_const=gc))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_type_weights_energy_semantics(rng):
    """On the energy path, type weights scale each edge's ENERGY
    CONTRIBUTION (not the raw output — that shifts the minimum): all-ones
    matches unweighted, a uniform weight w scales the energy by exactly w,
    and ragged/sorted agree."""
    from diffusion_ccsp_tpu.ops.edge_kernel import compute_edge_const

    _, params, graphs = _setup(False, rng)
    pose_in = jnp.asarray(
        rng.normal(size=graphs.pose.shape), dtype=jnp.float32
    )
    t = jnp.full((5,), 60, jnp.int32)

    def en(cfg, dispatch=None):
        m = ConstraintDiffuser(cfg)
        return np.asarray(
            m.apply(params, pose_in, graphs, t, return_energy=True,
                    dispatch=dispatch)
        )

    base = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                          hidden_dim=64)
    e0 = en(base)
    ones = dataclasses_replace(base, type_weights=(1.0,) * 13)
    np.testing.assert_allclose(en(ones), e0, rtol=1e-5)
    doubled = dataclasses_replace(base, type_weights=(2.0,) * 13)
    np.testing.assert_allclose(en(doubled), 2.0 * e0, rtol=1e-5)

    # sorted split path agrees with ragged under non-uniform weights
    tw = (1.0, 1.6) + (0.8,) * 11
    cfg_r = dataclasses_replace(base, type_weights=tw)
    cfg_s = dataclasses_replace(
        base, type_weights=tw, matmul_strategy="sorted",
        compute_dtype="float32",
    )
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask, 13,
        graphs.max_nodes, use_kernel=False,
    )
    m_s = ConstraintDiffuser(cfg_s)
    geom_emb = m_s.apply(
        params, graphs, method=ConstraintDiffuser.encode_geometry
    )
    gc = compute_edge_const(
        d, geom_emb, params["params"]["mlp_bank"]["kernel"], "float32"
    )
    np.testing.assert_allclose(
        en(cfg_s, dispatch=d.replace(edge_const=gc)), en(cfg_r),
        rtol=1e-4, atol=1e-4,
    )


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_edge_to_row_inverse_and_scatter_free_agg(rng):
    """``edge_to_row`` must invert the type sort (chunked and unchunked),
    and the scatter-free take+one-hot-einsum aggregation must match the
    flat segment_sum it replaced exactly (precision='highest')."""
    graphs = sample_qualitative_batch(rng, 7, max_nodes=8, max_edges=24)
    num_types = 13
    bsz, e = graphs.edge_type.shape
    for chunk in (None, 3):
        d = make_padded_dispatch(
            graphs.edges, graphs.edge_type, graphs.edge_mask, num_types, 8,
            chunk_graphs=chunk,
        )
        assert d.edge_to_row is not None
        assert d.edge_to_row.shape == (bsz * e,)
        # inverse property: the sorted row at edge_to_row[j] must carry
        # source edge j's endpoints (real edges only; check via global a1)
        boff = np.arange(bsz)[:, None] * 8
        flat_a1 = np.asarray(graphs.edges[..., 0] + boff).reshape(-1)
        em = np.asarray(graphs.edge_mask).reshape(-1)
        rows_a1 = np.asarray(d.a1).reshape(-1)
        e2r = np.asarray(d.edge_to_row)
        np.testing.assert_array_equal(
            rows_a1[e2r[em]], flat_a1[em]
        )

    # aggregation parity: random per-edge outputs through both reductions
    d = make_padded_dispatch(
        graphs.edges, graphs.edge_type, graphs.edge_mask, num_types, 8
    )
    p = 4
    out = jax.random.normal(jax.random.PRNGKey(1), (d.rows, 2, p))
    a1 = d.a1.reshape(-1)
    a2 = d.a2.reshape(-1)
    flat_args = jnp.concatenate([a1, a2])
    flat_out = jnp.concatenate([out[:, 0], out[:, 1]], axis=0)
    fm = jnp.concatenate([d.mask, d.mask])
    ref = jax.ops.segment_sum(
        flat_out * fm[:, None], flat_args, num_segments=bsz * 8
    ).reshape(bsz, 8, p)

    oo = out.reshape(-1, 2 * p)[d.edge_to_row].reshape(bsz, e, 2, p)
    emf = graphs.edge_mask.astype(out.dtype)
    oh1 = jax.nn.one_hot(graphs.edges[..., 0], 8, dtype=out.dtype)
    oh2 = jax.nn.one_hot(graphs.edges[..., 1], 8, dtype=out.dtype)
    agg = jnp.einsum(
        "ben,bep->bnp", oh1 * emf[..., None], oo[:, :, 0],
        precision="highest",
    ) + jnp.einsum(
        "ben,bep->bnp", oh2 * emf[..., None], oo[:, :, 1],
        precision="highest",
    )
    np.testing.assert_allclose(np.asarray(agg), np.asarray(ref), atol=1e-5)
