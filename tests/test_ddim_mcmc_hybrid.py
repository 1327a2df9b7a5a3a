"""Closed-form correctness of the DDIM x MCMC hybrid sampler.

Same analytic-Gaussian machinery as test_ddim_gaussian.py: with the exact
optimal noise prediction (and exact annealed energy) for a N(MU, S^2) target,
the hybrid strided chain + per-level MCMC refinement must still recover the
target — the MCMC steps have the true annealed distribution as their invariant
measure at every strided level, so refinement can only tighten, not bias.
Also pins segmented-launch equivalence (same keys -> same trajectory).
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion, free_mask
from diffusion_ccsp_tpu.samplers import MCMCConfig
from tests.test_ddim_gaussian import MU, S, analytic_setup, _free_stats


def _with_analytic_energy(diffusion):
    """Install exact annealed energy/grad for the MALA path: for the Gaussian
    target, grad log q_t(x) = -(x - sqrt(a) MU)/var with var = a S^2 + 1 - a;
    the sampler convention (diffusion.py:209-232) is
    score = -eps_pred * sqrt(1/(1-a)) and logp = -energy * sqrt(1/(1-a))."""
    sched = diffusion.schedule
    acp = jnp.asarray(sched.alphas_cumprod)
    exact_eps = diffusion._denoise

    def energy_grad(params, x, graph, tb, dispatch=None, geom_emb=None):
        return exact_eps(params, x, graph, tb), None

    def energy(params, x, graph, tb, dispatch=None, geom_emb=None):
        a = acp[tb][:, None, None]
        var = a * S**2 + (1.0 - a)
        logq = -((x - jnp.sqrt(a) * MU) ** 2) / (2.0 * var)
        fm = free_mask(graph)[..., None]
        per_graph = (logq * fm).sum(axis=(-2, -1))
        coeff = jnp.sqrt(1.0 / (1.0 - a[:, 0, 0]))
        return -per_graph / coeff

    diffusion._energy_grad = energy_grad
    diffusion._energy = energy
    return diffusion


def test_hybrid_ula_recovers_gaussian_target():
    diffusion, params, graphs = analytic_setup()
    diffusion.mcmc = MCMCConfig(kind="ULA", samples_per_step=4)
    diffusion._samples_per_step = jnp.full(
        (diffusion.schedule.num_timesteps,), 4, jnp.int32
    )
    diffusion._max_mcmc_steps = 4
    out = diffusion.sample_ddim_mcmc(params, graphs, jax.random.PRNGKey(5),
                                     num_steps=50, eta=1.0)
    mean, std = _free_stats(graphs, out)
    assert abs(mean - MU) < 0.02, mean
    assert abs(std - S) < 0.04, std


def test_hybrid_mala_recovers_gaussian_target_with_high_acceptance():
    diffusion, params, graphs = analytic_setup()
    diffusion.mcmc = MCMCConfig(kind="MALA", samples_per_step=4)
    diffusion._samples_per_step = jnp.full(
        (diffusion.schedule.num_timesteps,), 4, jnp.int32
    )
    diffusion._max_mcmc_steps = 4
    diffusion.energy_based = True
    _with_analytic_energy(diffusion)
    out, acc = diffusion.sample_ddim_mcmc(
        params, graphs, jax.random.PRNGKey(6), num_steps=50, eta=1.0,
        return_acceptance=True,
    )
    mean, std = _free_stats(graphs, out)
    assert abs(mean - MU) < 0.02, mean
    assert abs(std - S) < 0.04, std
    # exact score + small steps -> acceptance near 1
    assert float(acc) > 0.5, float(acc)


def test_hybrid_segmented_matches_single_launch():
    """num_segments only splits launches; keys thread through the carry, so
    the trajectory must be bitwise-equal up to compiler partitioning noise."""
    diffusion, params, graphs = analytic_setup(batch=32)
    diffusion.mcmc = MCMCConfig(kind="ULA", samples_per_step=2)
    diffusion._samples_per_step = jnp.full(
        (diffusion.schedule.num_timesteps,), 2, jnp.int32
    )
    diffusion._max_mcmc_steps = 2
    out1 = diffusion.sample_ddim_mcmc(params, graphs, jax.random.PRNGKey(7),
                                      num_steps=50, eta=1.0, num_segments=1)
    out5 = diffusion.sample_ddim_mcmc(params, graphs, jax.random.PRNGKey(7),
                                      num_steps=50, eta=1.0, num_segments=5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out5),
                               atol=1e-5, rtol=1e-5)
