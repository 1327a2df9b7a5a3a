"""Tests for the diffusion process: q_sample statistics, conditioning
invariants through the full reverse chain, and all MCMC sampler variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion, conditional_noise
from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
from diffusion_ccsp_tpu.models.diffuser import ConstraintDiffuser, DiffuserConfig
from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
from diffusion_ccsp_tpu.samplers import MCMCConfig, ula_plus_samples_per_step

T = 8  # tiny chain for tests
N, E = 8, 64


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    graphs = sample_qualitative_batch(rng, 4, max_nodes=N, max_edges=E)
    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=32)
    model = ConstraintDiffuser(cfg)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(
        jax.random.PRNGKey(0), single.pose, single, jnp.asarray(0)
    )
    sched = DiffusionSchedule.create(timesteps=T)
    return model, params, sched, graphs


def test_conditional_noise_zeroed(setup):
    _, _, _, graphs = setup
    noise = conditional_noise(jax.random.PRNGKey(1), graphs, graphs.pose.shape)
    noise = np.asarray(noise)
    cond = np.asarray(graphs.cond_mask)
    nmask = np.asarray(graphs.node_mask)
    assert np.all(noise[cond] == 0)
    assert np.all(noise[~nmask] == 0)
    assert np.any(noise[nmask & ~cond] != 0)


def test_loss_finite_and_grad_nonzero(setup):
    model, params, sched, graphs = setup
    diff = GaussianDiffusion(model, sched)
    loss, grads = jax.value_and_grad(diff.loss)(
        params, graphs, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads, 0.0
    )
    assert gnorm > 0


def test_q_sample_preserves_conditioned(setup):
    model, params, sched, graphs = setup
    diff = GaussianDiffusion(model, sched)
    x0 = graphs.pose
    noise = conditional_noise(jax.random.PRNGKey(3), graphs, x0.shape)
    t = jnp.asarray([0, 3, 5, 7])
    xt = diff.q_sample(x0, graphs, t, noise)
    cond = np.asarray(graphs.cond_mask)
    np.testing.assert_allclose(
        np.asarray(xt)[cond], np.asarray(x0)[cond], atol=1e-6
    )


@pytest.mark.parametrize("kind", ["none", "ULA", "ULA+", "MALA", "HMC"])
def test_sample_chain_invariants(setup, kind):
    model, params, sched, graphs = setup
    mcmc = MCMCConfig(kind=kind, samples_per_step=2)
    diff = GaussianDiffusion(model, sched, mcmc=mcmc)
    out = diff.sample(params, graphs, jax.random.PRNGKey(4))
    out = np.asarray(out)
    assert out.shape == graphs.pose.shape
    assert np.isfinite(out).all()
    cond = np.asarray(graphs.cond_mask)
    # conditioned rows hold ground truth through the whole chain
    np.testing.assert_allclose(out[cond], np.asarray(graphs.pose)[cond], atol=1e-6)


def test_sample_history(setup):
    model, params, sched, graphs = setup
    diff = GaussianDiffusion(model, sched)
    out, hist = diff.sample(
        params, graphs, jax.random.PRNGKey(5), return_history=True
    )
    assert hist.shape == (T,) + graphs.pose.shape
    np.testing.assert_allclose(np.asarray(hist[-1]), np.asarray(out), atol=1e-6)


def test_ula_plus_schedule():
    s = ula_plus_samples_per_step(1000)
    assert s.shape == (1000,)
    assert s[0] == 4 and s[499] == 8 and s[999] == 16
    assert s.max() == 16


def test_sampling_deterministic_given_key(setup):
    model, params, sched, graphs = setup
    diff = GaussianDiffusion(model, sched)
    o1 = diff.sample(params, graphs, jax.random.PRNGKey(6))
    o2 = diff.sample(params, graphs, jax.random.PRNGKey(6))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=0)
    o3 = diff.sample(params, graphs, jax.random.PRNGKey(7))
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 1e-4


def test_mala_sample_reports_acceptance():
    """MALA/HMC chains report mean Metropolis acceptance in (0, 1] — the
    signal the reference tunes step sizes against (ddpm.py:969-996)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
    from diffusion_ccsp_tpu.samplers import MCMCConfig

    rng = np.random.default_rng(5)
    graphs = sample_qualitative_batch(rng, 2, max_nodes=8, max_edges=64)
    graphs = jax.tree.map(jnp.asarray, graphs)
    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=16)
    model = ConstraintDiffuser(cfg)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(jax.random.PRNGKey(0), single.pose, single,
                        jnp.asarray(0))

    def acc_at(scale_kwargs):
        diff = GaussianDiffusion(
            model, DiffusionSchedule.create(timesteps=6, **scale_kwargs),
            mcmc=MCMCConfig(kind="MALA", samples_per_step=2),
        )
        out, acc = diff.sample(params, graphs, jax.random.PRNGKey(1),
                               return_acceptance=True)
        assert out.shape == graphs.pose.shape
        return float(acc)

    # tiny steps -> near-certain acceptance; the huge default 2*betas scale
    # -> (near-)total rejection (the round-2 MALA-collapse signature)
    assert acc_at({"step_size_scale": 1e-6}) > 0.9
    assert acc_at({}) < 0.2


def test_sample_segmented_matches_single_scan():
    """sample_segmented threads the same keys through the same body, so the
    trajectory matches sample() to compiler-partitioning noise (last-ulp
    reassociation between one big scan and several jitted segment scans) for
    any segment count — segmentation only changes device-launch boundaries
    (the round-3 fused-MCMC fault fix)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
    from diffusion_ccsp_tpu.samplers import MCMCConfig

    rng = np.random.default_rng(0)
    graphs = sample_qualitative_batch(rng, 3, max_nodes=8, max_edges=24)
    graphs = jax.tree.map(jnp.asarray, graphs)
    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=16)
    model = ConstraintDiffuser(cfg)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(jax.random.PRNGKey(0), single.pose, single,
                        jnp.asarray(0))
    sched = DiffusionSchedule.create(timesteps=8)

    plain = GaussianDiffusion(model, sched)
    ref = plain.sample(params, graphs, jax.random.PRNGKey(3))
    for k in (2, 4):
        seg = plain.sample_segmented(params, graphs, jax.random.PRNGKey(3),
                                     num_segments=k)
        np.testing.assert_allclose(np.asarray(seg), np.asarray(ref),
                                   rtol=1e-5, atol=1e-3)

    # with an MCMC refinement in the loop (the case that faulted fused)
    ebm = GaussianDiffusion(model, sched,
                            mcmc=MCMCConfig(kind="MALA", samples_per_step=2),
                            energy_based=True)
    r, acc_r = ebm.sample(params, graphs, jax.random.PRNGKey(5),
                          return_acceptance=True)
    s, acc_s = ebm.sample_segmented(params, graphs, jax.random.PRNGKey(5),
                                    num_segments=4, return_acceptance=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(float(acc_s), float(acc_r), atol=1e-5)
