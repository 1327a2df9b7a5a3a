"""Closed-form distributional correctness of the samplers.

With the denoiser replaced by the EXACT optimal noise-prediction for a known
Gaussian data distribution N(mu, s^2) per free coordinate, both the full DDPM
chain and the strided DDIM chain must reproduce that distribution: for a
Gaussian target the DDIM update is the exact affine pushforward at ANY stride,
so mean/std recover to sampling error.

This pins the round-3 DDIM failure mode: the protocol rows collapsed because
the chain was initialised at 0.5*N(0,1) (correct for the stochastic DDPM
chain, reference ddpm.py:273, whose per-step noise re-inflates the marginal)
— but the eta=0 DDIM map is deterministic, so a half-scale init pushes
forward to a half-scale (under-dispersed) output distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.diffusion import GaussianDiffusion, free_mask
from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
from diffusion_ccsp_tpu.models.diffuser import ConstraintDiffuser, DiffuserConfig
from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule

MU, S = 0.3, 0.2


def analytic_setup(timesteps=1000, batch=256):
    rng = np.random.default_rng(0)
    graphs = sample_qualitative_batch(rng, batch, max_nodes=8, max_edges=64)
    graphs = jax.tree.map(jnp.asarray, graphs)
    cfg = DiffuserConfig(input_mode="qualitative", geom_dim=2, pose_dim=4,
                         hidden_dim=32)
    model = ConstraintDiffuser(cfg)
    single = jax.tree.map(lambda x: x[0], graphs)
    params = model.init(jax.random.PRNGKey(0), single.pose, single,
                        jnp.asarray(0))
    sched = DiffusionSchedule.create(timesteps=timesteps)
    diffusion = GaussianDiffusion(model, sched)
    acp = jnp.asarray(sched.alphas_cumprod)

    def exact_eps(params, x, graph, tb, dispatch=None, geom_emb=None):
        # optimal E[eps | x_t] for x0 ~ N(MU, S^2) iid per coordinate:
        #   q_t = N(sqrt(a) MU, a S^2 + 1 - a)
        #   E[x0|x_t] = MU + sqrt(a) S^2 / (a S^2 + 1 - a) * (x_t - sqrt(a) MU)
        a = acp[tb][:, None, None]
        ra = jnp.sqrt(a)
        var = a * S**2 + (1.0 - a)
        x0 = MU + ra * S**2 / var * (x - ra * MU)
        return (x - ra * x0) / jnp.sqrt(1.0 - a)

    diffusion._denoise = exact_eps
    return diffusion, params, graphs


def _free_stats(graphs, out):
    free = np.asarray(free_mask(graphs))
    vals = np.asarray(out)[free]
    return vals.mean(), vals.std()


def test_ddpm_recovers_gaussian_target():
    diffusion, params, graphs = analytic_setup()
    out = diffusion.sample(params, graphs, jax.random.PRNGKey(1))
    mean, std = _free_stats(graphs, out)
    assert abs(mean - MU) < 0.02, mean
    assert abs(std - S) < 0.02, std


def test_ddim_recovers_gaussian_target():
    """eta=0, 50 strided steps: exact for a Gaussian target — catches any
    init-scale or update-coefficient error in sample_ddim."""
    diffusion, params, graphs = analytic_setup()
    out = diffusion.sample_ddim(params, graphs, jax.random.PRNGKey(2),
                                num_steps=50, eta=0.0)
    mean, std = _free_stats(graphs, out)
    assert abs(mean - MU) < 0.02, mean
    assert abs(std - S) < 0.03, std


def test_ddim_eta1_recovers_gaussian_target():
    """Fully stochastic DDIM (eta=1 ~ DDPM-like) must also match."""
    diffusion, params, graphs = analytic_setup()
    out = diffusion.sample_ddim(params, graphs, jax.random.PRNGKey(3),
                                num_steps=50, eta=1.0)
    mean, std = _free_stats(graphs, out)
    assert abs(mean - MU) < 0.02, mean
    assert abs(std - S) < 0.03, std


def test_ddim_strided_is_bounded_under_model_error():
    """A strided chain amplifies eps-model error by 1/sqrt(acum_t) in the
    x0 reconstruction (~1e4 at t~999, cosine schedule); with the default
    x0 clip the chain must stay bounded even with a systematically wrong
    model. (Unclipped, this configuration diverges to |x| >> 100 — the
    round-3 DDIM rows' second failure mode.)"""
    diffusion, params, graphs = analytic_setup(batch=32)
    exact = diffusion._denoise

    def noisy_eps(params, x, graph, tb, dispatch=None, geom_emb=None):
        return exact(params, x, graph, tb) + 0.05 * jnp.sin(3.0 * x)

    diffusion._denoise = noisy_eps
    for eta in (0.0, 1.0):
        out = diffusion.sample_ddim(params, graphs, jax.random.PRNGKey(4),
                                    num_steps=50, eta=eta)
        free = np.asarray(free_mask(graphs))
        vals = np.asarray(out)[free]
        assert np.isfinite(vals).all()
        assert np.abs(vals).max() < 3.0, np.abs(vals).max()
