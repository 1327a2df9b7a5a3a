"""Gaussian diffusion over constraint-graph pose features.

Capability parity: reference ``networks/ddpm.py:168-389`` (GaussianDiffusion).
TPU-native design:

- the T-step reverse chain is a single ``lax.scan`` over precomputed schedule
  arrays — one XLA computation instead of 1000 host-dispatched iterations
  (reference ``ddpm.py:325-336``);
- annealed MCMC refinement (ULA/ULA+/MALA/HMC) runs as masked fixed-length
  ``fori_loop``s inside the scan body (see ``samplers.py``);
- conditioning is ``jnp.where(cond_mask, gt, x)`` in the scan body
  (reference re-clamps via fancy indexing at ``ddpm.py:274,334``);
- training draws an independent timestep per graph in the batch rather than
  one shared t per batch (reference ``ddpm.py:388`` uses torch.Size([1]) —
  per-graph t is a strict variance reduction at identical cost on TPU);
- the loss averages over *free* pose entries (real, non-conditioned nodes).
  The reference's MSE (``ddpm.py:363-385``) also includes conditioned rows,
  which contribute a parameter-independent constant; gradients agree.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_ccsp_tpu.graphs import ConstraintGraph
from diffusion_ccsp_tpu.models.diffuser import (
    ConstraintDiffuser,
    make_denoiser,
    make_dispatch,
    make_energy_fn,
    make_energy_grad_fn,
)
from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule, extract
from diffusion_ccsp_tpu.samplers import (
    MCMCConfig,
    hmc_step,
    mala_step,
    ula_plus_samples_per_step,
    ula_step,
)


def free_mask(graph: ConstraintGraph) -> jnp.ndarray:
    """bool[..., N]: rows whose pose features actually diffuse."""
    return graph.node_mask & ~graph.cond_mask


def conditional_noise(
    key: jax.Array, graph: ConstraintGraph, shape: tuple[int, ...]
) -> jnp.ndarray:
    """Gaussian noise zeroed on conditioned and padded rows
    (reference ``ddpm.py:114-117``)."""
    noise = jax.random.normal(key, shape)
    return noise * free_mask(graph)[..., None]


class GaussianDiffusion:
    """Static wrapper bundling model, schedule, and sampler configuration.

    Parameters are passed explicitly to every method (functional style); this
    object holds only static configuration and jit-compiled closures.
    """

    def __init__(
        self,
        model: ConstraintDiffuser,
        schedule: DiffusionSchedule,
        mcmc: MCMCConfig = MCMCConfig(),
        loss_type: str = "l2",
        energy_based: bool | None = None,
    ):
        self.model = model
        self.schedule = schedule
        self.mcmc = mcmc
        self.loss_type = loss_type
        # MALA/HMC require the energy formulation (reference forces
        # energy_wrapper for them, ``train_utils.py:115-116``).
        self.energy_based = (
            mcmc.needs_energy if energy_based is None else energy_based
        )

        self._denoise = make_denoiser(model)
        self._energy = make_energy_fn(model)
        self._energy_grad = make_energy_grad_fn(model)
        if mcmc.kind == "ULA+":
            self._samples_per_step = jnp.asarray(
                ula_plus_samples_per_step(schedule.num_timesteps)
            )
            self._max_mcmc_steps = int(
                ula_plus_samples_per_step(schedule.num_timesteps).max()
            )
        else:
            self._samples_per_step = jnp.full(
                (schedule.num_timesteps,), mcmc.samples_per_step, jnp.int32
            )
            self._max_mcmc_steps = mcmc.samples_per_step
        self._seg_jit_cache: dict = {}

    # ------------------------------------------------------------------ #
    # training
    # ------------------------------------------------------------------ #

    def q_sample(
        self,
        x0: jnp.ndarray,
        graph: ConstraintGraph,
        t: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """Forward-noise x0 to step t; conditioned rows stay at ground truth
        (reference ``ddpm.py:353-361``)."""
        sched = self.schedule
        xt = (
            extract(sched.sqrt_alphas_cumprod, t, x0.ndim) * x0
            + extract(sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * noise
        )
        return jnp.where(graph.cond_mask[..., None], x0, xt)

    def loss(
        self, params: Any, graph: ConstraintGraph, key: jax.Array
    ) -> jnp.ndarray:
        """Noise-prediction loss over a batched graph (leading axis B).

        Reference ``ddpm.py:363-389``.
        """
        sched = self.schedule
        b = graph.batch_shape[0]
        k_t, k_noise = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)

        x0 = graph.pose
        noise = conditional_noise(k_noise, graph, x0.shape)
        xt = self.q_sample(x0, graph, t, noise)

        if self.energy_based:
            pred, _ = self._energy_grad(params, xt, graph, t)
        else:
            pred = self._denoise(params, xt, graph, t)

        fmask = free_mask(graph)[..., None]
        diff = (noise - pred) * fmask
        denom = jnp.maximum(fmask.sum() * x0.shape[-1], 1)
        if self.loss_type == "l1":
            return jnp.abs(diff).sum() / denom
        return (diff**2).sum() / denom

    # ------------------------------------------------------------------ #
    # sampling
    # ------------------------------------------------------------------ #

    def _geom_emb(self, params, graph: ConstraintGraph):
        """Precompute geometry embeddings once per sampling chain when they
        are expensive (image mode: rasterizer + CNN; the reference caches
        image embeddings into batch.x at eval, ``denoise_fn.py:469-478``)."""
        if isinstance(self.model, ConstraintDiffuser) and self.model.config.use_image:
            return self.model.apply(
                params, graph, method=ConstraintDiffuser.encode_geometry
            )
        return None

    def _dispatch(self, graph: ConstraintGraph):
        """Precompute the MoE edge dispatch once per graph batch; the edge
        types never change across the sampling chain, so this hoists a sort
        out of every scan step."""
        if not isinstance(self.model, ConstraintDiffuser):
            return None
        cfg = self.model.config
        # the tile-aligned sorted layout (no per-step sort/unsort in the
        # scan) covers single-domain, non-grasp configs. Two backends:
        # the Pallas kernel (custom VJP — Pallas forward, XLA backward over
        # the same sorted layout, so energy-based sampling differentiates
        # through it) and the pure-XLA sorted path
        # (`matmul_strategy='sorted'`).
        sorted_ok = not cfg.has_grasp and not cfg.has_second_domain
        if sorted_ok and (
            cfg.use_pallas or cfg.matmul_strategy == "sorted"
        ):
            from diffusion_ccsp_tpu.ops.edge_kernel import (
                auto_chunk_graphs,
                make_padded_dispatch,
            )

            use_kernel = cfg.use_pallas
            # large batches (candidate fan-out / fused tries) chunk the
            # kernel's node table so the one-hot gather width stays ~1k rows
            # regardless of B; the XLA sorted path needs no chunking.
            # CCSP_CHUNK_TARGET_ROWS sweeps the gather-width / padding-tile
            # tradeoff (gather FLOPs scale with the width, per-chunk type
            # padding scales against it) without a code change.
            import os as _os

            target = int(_os.environ.get("CCSP_CHUNK_TARGET_ROWS", "1024"))
            chunk = (
                auto_chunk_graphs(graph.pose.shape[0], graph.max_nodes,
                                  target_rows=target)
                if use_kernel else None
            )
            return make_padded_dispatch(
                graph.edges, graph.edge_type, graph.edge_mask,
                cfg.num_types, graph.max_nodes, use_kernel=use_kernel,
                chunk_graphs=chunk,
            )
        if cfg.matmul_strategy == "ragged" or not sorted_ok:
            # grasp / second-domain configs have no sorted layout; fall back
            # to ragged dispatch rather than silently routing the bank to the
            # O(K) dense one-hot path (advisor finding, round 2)
            return make_dispatch(graph.edge_type, cfg.num_types)
        return None

    def _attach_edge_const(self, params, graph: ConstraintGraph, dispatch,
                           geom_emb):
        """Attach the chain-constant geometry contribution for the
        split-bank kernel v2 (ops/edge_kernel.py, round-5 roofline fix).
        Only the no-grad noise-prediction sampling path rides v2 — the
        energy/EBM path differentiates through ``diff_edge_bank``'s custom
        VJP, so it keeps the v1 layout."""
        from diffusion_ccsp_tpu.ops.edge_kernel import (
            PaddedDispatch,
            compute_edge_const,
        )

        if not isinstance(dispatch, PaddedDispatch):
            return dispatch
        if dispatch.use_kernel and self.energy_based:
            # the v2 kernel is no-grad; energy models on the kernel keep
            # diff_edge_bank's custom VJP (v1 layout)
            return dispatch
        if geom_emb is None:
            geom_emb = self.model.apply(
                params, graph, method=ConstraintDiffuser.encode_geometry
            )
        w = params["params"]["mlp_bank"]["kernel"]
        gc = compute_edge_const(
            dispatch, geom_emb, w, self.model.config.compute_dtype
        )
        return dispatch.replace(edge_const=gc)

    def _score_and_logp_fns(self, params, graph: ConstraintGraph, dispatch=None,
                            geom_emb=None):
        """Annealed score / per-graph log-prob closures.

        gradient = -denoise(x, t) * sqrt(1/(1-acum_t)) (ref ``ddpm.py:279-283``)
        logp     = -energy(x, t)  * sqrt(1/(1-acum_t)) (ref ``ddpm.py:285-289``)
        """
        sched = self.schedule

        def score_fn(x, t):
            tb = jnp.full(x.shape[:1], t)
            coeff = sched.sqrt_recip_one_minus_alphas_cumprod[t]
            if self.energy_based:
                g, _ = self._energy_grad(params, x, graph, tb, dispatch, geom_emb)
            else:
                g = self._denoise(params, x, graph, tb, dispatch, geom_emb)
            return -g * coeff

        def logp_fn(x, t):
            tb = jnp.full(x.shape[:1], t)
            coeff = sched.sqrt_recip_one_minus_alphas_cumprod[t]
            return -self._energy(params, x, graph, tb, dispatch, geom_emb) * coeff

        return score_fn, logp_fn

    def p_sample_step(
        self,
        params: Any,
        graph: ConstraintGraph,
        x: jnp.ndarray,
        t: jnp.ndarray,
        key: jax.Array,
        clip_denoised: bool = False,
        dispatch=None,
        geom_emb=None,
    ) -> jnp.ndarray:
        """One reverse step x_t -> x_{t-1} (reference ``ddpm.py:230-258``)."""
        sched = self.schedule
        tb = jnp.full(x.shape[:1], t)
        if self.energy_based:
            noise_pred, _ = self._energy_grad(params, x, graph, tb, dispatch,
                                              geom_emb)
        else:
            noise_pred = self._denoise(params, x, graph, tb, dispatch, geom_emb)

        x0_hat = (
            sched.sqrt_recip_alphas_cumprod[t] * x
            - sched.sqrt_recipm1_alphas_cumprod[t] * noise_pred
        )
        if clip_denoised:
            x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
        mean = (
            sched.posterior_mean_coef1[t] * x0_hat
            + sched.posterior_mean_coef2[t] * x
        )
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        return mean + nonzero * jnp.exp(0.5 * sched.posterior_log_variance_clipped[t]) * noise

    def sample(
        self,
        params: Any,
        graph: ConstraintGraph,
        key: jax.Array,
        return_history: bool = False,
        clip_denoised: bool = False,
        return_acceptance: bool = False,
        step_sizes: jnp.ndarray | None = None,
    ):
        """Full reverse chain as one ``lax.scan`` (reference ``ddpm.py:260-340``).

        Args:
          graph: batched ConstraintGraph (leading axis B).
        Returns:
          f32[B, N, P] final pose features (clamp to [-1,1] is the caller's
          choice, as in reference eval ``ddpm.py:620``), optionally with the
          per-step history stacked on axis 0. With ``return_acceptance`` a
          scalar mean Metropolis acceptance over the whole chain is appended
          (MALA/HMC only; the signal the reference tunes step sizes against,
          ``ddpm.py:969-996``). ``step_sizes`` overrides the schedule's MCMC
          step-size table ([T] array) — passing it as a runtime argument lets
          a tuner sweep scales under ONE compiled executable.
        """
        clamp_fn, fmask, body = self._chain_body(
            params, graph, clip_denoised, step_sizes, return_history
        )
        sched = self.schedule
        mcmc = self.mcmc
        gt = graph.pose

        k_init, k_scan = jax.random.split(key)
        x = 0.5 * jax.random.normal(k_init, gt.shape, gt.dtype)
        x = x * fmask[..., None]
        x = clamp_fn(x)

        ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
        (x, _, acc_sum), hist = jax.lax.scan(
            body, (x, k_scan, jnp.zeros((), gt.dtype)), ts
        )
        extras = []
        if return_history:
            extras.append(hist)
        if return_acceptance:
            n_mcmc = max(sched.num_timesteps // max(mcmc.ebm_per_steps, 1), 1)
            extras.append(acc_sum / n_mcmc)
        if extras:
            return (x, *extras)
        return x

    def _chain_body(self, params, graph: ConstraintGraph, clip_denoised,
                    step_sizes, return_history):
        """Preamble + per-step body shared by ``sample`` (one scan) and
        ``sample_segmented`` (several shorter scans carrying the state)."""
        sched = self.schedule
        mcmc = self.mcmc
        gt = graph.pose
        cond = graph.cond_mask[..., None]
        fmask = free_mask(graph)

        def clamp_fn(x):
            return jnp.where(cond, gt, x)

        dispatch = self._dispatch(graph)
        geom_emb = self._geom_emb(params, graph)
        dispatch = self._attach_edge_const(params, graph, dispatch, geom_emb)
        score_fn, logp_fn = self._score_and_logp_fns(
            params, graph, dispatch, geom_emb
        )
        mcmc_step_sizes = (
            sched.step_sizes if step_sizes is None else step_sizes
        )

        def body(carry, t):
            x, key, acc_sum = carry
            key, k_step, k_mcmc = jax.random.split(key, 3)
            x = self.p_sample_step(
                params, graph, x, t, k_step, clip_denoised, dispatch, geom_emb
            )
            x = clamp_fn(x)

            if mcmc.kind != "none":

                def run_mcmc(x):
                    if mcmc.kind in ("ULA", "ULA+"):
                        x = ula_step(
                            x, t, k_mcmc, score_fn, mcmc_step_sizes,
                            self._samples_per_step, self._max_mcmc_steps,
                            clamp_fn,
                        )
                        return x, jnp.zeros((), x.dtype)
                    if mcmc.kind == "MALA":
                        return mala_step(
                            x, t, k_mcmc, score_fn, logp_fn, mcmc_step_sizes,
                            mcmc.samples_per_step, fmask, clamp_fn,
                        )
                    if mcmc.kind == "HMC":
                        return hmc_step(
                            x, t, k_mcmc, score_fn, logp_fn, mcmc_step_sizes,
                            mcmc.hmc_mass_scale * sched.betas,
                            mcmc.samples_per_step, mcmc.hmc_leapfrog_steps,
                            mcmc.hmc_damping, fmask, clamp_fn,
                        )
                    raise ValueError(mcmc.kind)

                if mcmc.ebm_per_steps > 1:
                    x, acc = jax.lax.cond(
                        t % mcmc.ebm_per_steps == 0, run_mcmc,
                        lambda x: (x, jnp.zeros((), x.dtype)), x
                    )
                else:
                    x, acc = run_mcmc(x)
                x = clamp_fn(x)
                acc_sum = acc_sum + acc

            out = x if return_history else None
            return (x, key, acc_sum), out

        return clamp_fn, fmask, body

    def sample_segmented(
        self,
        params: Any,
        graph: ConstraintGraph,
        key: jax.Array,
        num_segments: int = 4,
        clip_denoised: bool = False,
        return_acceptance: bool = False,
        step_sizes: jnp.ndarray | None = None,
    ):
        """The reverse chain as ``num_segments`` sequential launches.

        Statistically identical to ``sample`` (same body, same keys threaded
        through the carry) but each launch scans only T/num_segments steps,
        so no single device RPC exceeds the tunnel transport's deadline —
        the round-3 fused-MCMC "UNAVAILABLE: TPU device error" envelope
        tracked launch wall-clock, not memory (see repro_mcmc_fault.py).
        One compiled executable serves every segment: the timestep slice is
        a runtime argument of the jitted segment scan.
        """
        T = self.schedule.num_timesteps
        assert T % num_segments == 0, (T, num_segments)
        L = T // num_segments
        # params and graph ride as jit ARGUMENTS (as in the fully-jitted
        # sample() path): closing over them would (a) fancy-index host-numpy
        # leaves with tracers in the ragged bank and (b) embed megabyte
        # literals into the segment HLO, which crashed the XLA compiler
        # (Check failed: MinorToMajorOnlyInLayout on a literal shape). The
        # per-step body is rebuilt inside the trace; the chain-constant
        # dispatch/embedding precomputes compile once per segment shape.
        gt = graph.pose

        # Memoize the jitted segment scan on the instance (advisor r4):
        # without this every sample_segmented call builds a fresh jax.jit
        # closure, so tries=10 re-traces the segment body 10 times and only
        # the persistent XLA cache saves the compile. Keyed like
        # eval/evaluate._FN_CACHE; step_sizes (a chain-constant array) is
        # identified by id() — callers pass one fixed array per run.
        seg_key = (clip_denoised,
                   None if step_sizes is None else id(step_sizes))
        seg_jit = self._seg_jit_cache.get(seg_key)
        if seg_jit is None:
            def seg_fn(params, graph, carry, ts):
                clamp_fn, fmask, body = self._chain_body(
                    params, graph, clip_denoised, step_sizes,
                    return_history=False,
                )
                return jax.lax.scan(body, carry, ts)[0]

            seg_jit = jax.jit(seg_fn)
            self._seg_jit_cache[seg_key] = seg_jit

        cond = graph.cond_mask[..., None]
        fmask0 = free_mask(graph)
        k_init, k_scan = jax.random.split(key)
        x = 0.5 * jax.random.normal(k_init, gt.shape, gt.dtype)
        x = jnp.where(cond, gt, x * fmask0[..., None])

        carry = (x, k_scan, jnp.zeros((), gt.dtype))
        for s in range(num_segments):
            ts = jnp.arange(T - 1 - s * L, T - 1 - (s + 1) * L, -1)
            carry = seg_jit(params, graph, carry, ts)
            # force a launch boundary: keep every device RPC short
            jax.block_until_ready(carry[0])
        x, _, acc_sum = carry
        if return_acceptance:
            mcmc = self.mcmc
            n_mcmc = max(T // max(mcmc.ebm_per_steps, 1), 1)
            return x, acc_sum / n_mcmc
        return x

    def sample_ddim(
        self,
        params: Any,
        graph: ConstraintGraph,
        key: jax.Array,
        num_steps: int = 50,
        eta: float = 1.0,
        clip_denoised: bool = True,
    ) -> jnp.ndarray:
        """DDIM sampling over a strided subset of the training timesteps
        (Song et al. 2021). Not present in the reference (full-T DDPM only);
        10-20x fewer denoiser evaluations at comparable satisfaction —
        sampler acceleration is first-class here.

        Defaults are the measured-best protocol config on trained models:
        ``clip_denoised=True`` is REQUIRED for stability at strides > 1 —
        the x0 reconstruction amplifies model error by 1/sqrt(acum_t)
        (~1e4 at t~999 under the cosine schedule); the full-T chains cancel
        it between adjacent steps, a strided chain compounds it into
        divergence (observed: std 53 at K=100 unclipped vs 0.55 clipped).
        Poses are normalized to [-1, 1], so the clip loses nothing.
        ``eta=1.0`` (stochastic, DDPM-like per-step noise on the strided
        grid) measurably beats eta=0 on constraint satisfaction.
        """
        sched = self.schedule
        T = sched.num_timesteps
        stride = max(T // num_steps, 1)
        ts = jnp.arange(T - 1, -1, -stride)  # descending, e.g. 999, 979, ...
        ts_prev = jnp.concatenate([ts[1:], jnp.asarray([-1])])

        gt = graph.pose
        cond = graph.cond_mask[..., None]
        fmask = free_mask(graph)

        def clamp_fn(x):
            return jnp.where(cond, gt, x)

        dispatch = self._dispatch(graph)
        geom_emb = self._geom_emb(params, graph)
        dispatch = self._attach_edge_const(params, graph, dispatch, geom_emb)

        k_init, k_scan = jax.random.split(key)
        # full-scale init: q_T ~ N(0, I) under the cosine schedule. The DDPM
        # chain uses the reference's 0.5 init (ddpm.py:273) because per-step
        # noise re-inflates the marginal, but the eta=0 DDIM map is a
        # deterministic pushforward of THIS distribution — a 0.5 init
        # contracts every output scale by half (see test_ddim_gaussian.py;
        # it zeroed the round-3 DDIM protocol rows).
        x = jax.random.normal(k_init, gt.shape, gt.dtype)
        x = clamp_fn(x * fmask[..., None])

        def body(carry, t_pair):
            x, key = carry
            t, t_prev = t_pair
            key, k_noise = jax.random.split(key)
            tb = jnp.full(x.shape[:1], t)
            if self.energy_based:
                noise_pred, _ = self._energy_grad(
                    params, x, graph, tb, dispatch, geom_emb
                )
            else:
                noise_pred = self._denoise(
                    params, x, graph, tb, dispatch, geom_emb
                )

            a_t = sched.alphas_cumprod[t]
            a_prev = jnp.where(
                t_prev >= 0, sched.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0
            )
            x0_hat = (x - jnp.sqrt(1 - a_t) * noise_pred) / jnp.sqrt(a_t)
            if clip_denoised:
                x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
            sigma = (
                eta
                * jnp.sqrt((1 - a_prev) / (1 - a_t))
                * jnp.sqrt(1 - a_t / a_prev)
            )
            dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma**2, 0.0)) * noise_pred
            noise = jax.random.normal(k_noise, x.shape, x.dtype)
            x = jnp.sqrt(a_prev) * x0_hat + dir_xt + sigma * noise
            x = clamp_fn(x)
            return (x, key), None

        (x, _), _ = jax.lax.scan(body, (x, k_scan), (ts, ts_prev))
        return x

    def sample_ddim_mcmc(
        self,
        params: Any,
        graph: ConstraintGraph,
        key: jax.Array,
        num_steps: int = 50,
        eta: float = 1.0,
        clip_denoised: bool = True,
        step_sizes: jnp.ndarray | None = None,
        num_segments: int = 1,
        return_acceptance: bool = False,
    ):
        """DDIM strided chain + annealed-MCMC refinement on the strided grid.

        The round-4 results left a gap: tuned MALA doubles dense-count
        satisfaction but costs a full T=1000 chain with ``samples_per_step``
        extra evals per step, while the k=100 CoRL budget
        (``solve_csp.py:67-69``) was only affordable with plain DDIM-50.
        This hybrid runs the (measured DDPM-par) clipped eta=1 DDIM chain and
        applies the MCMC inner loop (``mcmc.kind``: MALA/HMC/ULA) at each
        strided noise level — ~(1+samples_per_step)*num_steps denoiser evals
        instead of (1+samples_per_step)*T, a ~20x cheaper tuned-MCMC sampler
        at the same annealing endpoints. Not in the reference (host-loop
        full-T MCMC only, ``ddpm.py:325-336``).

        ``num_segments`` splits the strided chain into sequential launches
        (same tunnel-deadline mitigation as ``sample_segmented``).
        """
        sched = self.schedule
        mcmc = self.mcmc
        assert mcmc.kind != "none", "hybrid sampler needs an MCMC kind"
        T = sched.num_timesteps
        stride = max(T // num_steps, 1)
        ts_np = np.arange(T - 1, -1, -stride)
        ts_prev_np = np.concatenate([ts_np[1:], np.asarray([-1])])
        n_mcmc = int((ts_prev_np >= 0).sum())

        gt = graph.pose
        cond = graph.cond_mask[..., None]
        fmask = free_mask(graph)
        mcmc_step_sizes = (
            sched.step_sizes if step_sizes is None else step_sizes
        )

        seg_key = ("ddim_mcmc", num_steps, eta, clip_denoised,
                   None if step_sizes is None else id(step_sizes))
        seg_jit = self._seg_jit_cache.get(seg_key)
        if seg_jit is None:
            def seg_fn(params, graph, carry, t_pairs):
                dispatch = self._dispatch(graph)
                geom_emb = self._geom_emb(params, graph)
                dispatch = self._attach_edge_const(
                    params, graph, dispatch, geom_emb
                )
                score_fn, logp_fn = self._score_and_logp_fns(
                    params, graph, dispatch, geom_emb
                )
                gt_ = graph.pose
                cond_ = graph.cond_mask[..., None]
                fmask_ = free_mask(graph)

                def clamp_fn(x):
                    return jnp.where(cond_, gt_, x)

                def body(carry, t_pair):
                    x, key, acc_sum = carry
                    t, t_prev = t_pair
                    key, k_noise, k_mcmc = jax.random.split(key, 3)
                    tb = jnp.full(x.shape[:1], t)
                    if self.energy_based:
                        noise_pred, _ = self._energy_grad(
                            params, x, graph, tb, dispatch, geom_emb
                        )
                    else:
                        noise_pred = self._denoise(
                            params, x, graph, tb, dispatch, geom_emb
                        )
                    a_t = sched.alphas_cumprod[t]
                    a_prev = jnp.where(
                        t_prev >= 0,
                        sched.alphas_cumprod[jnp.maximum(t_prev, 0)],
                        1.0,
                    )
                    x0_hat = (x - jnp.sqrt(1 - a_t) * noise_pred) / jnp.sqrt(a_t)
                    if clip_denoised:
                        x0_hat = jnp.clip(x0_hat, -1.0, 1.0)
                    sigma = (
                        eta
                        * jnp.sqrt((1 - a_prev) / (1 - a_t))
                        * jnp.sqrt(1 - a_t / a_prev)
                    )
                    dir_xt = jnp.sqrt(
                        jnp.maximum(1 - a_prev - sigma**2, 0.0)
                    ) * noise_pred
                    noise = jax.random.normal(k_noise, x.shape, x.dtype)
                    x = jnp.sqrt(a_prev) * x0_hat + dir_xt + sigma * noise
                    x = clamp_fn(x)

                    # MCMC refinement at the level we just stepped TO
                    def run_mcmc(x):
                        tp = jnp.maximum(t_prev, 0)
                        if mcmc.kind in ("ULA", "ULA+"):
                            x = ula_step(
                                x, tp, k_mcmc, score_fn, mcmc_step_sizes,
                                self._samples_per_step, self._max_mcmc_steps,
                                clamp_fn,
                            )
                            return x, jnp.zeros((), x.dtype)
                        if mcmc.kind == "MALA":
                            return mala_step(
                                x, tp, k_mcmc, score_fn, logp_fn,
                                mcmc_step_sizes, mcmc.samples_per_step,
                                fmask_, clamp_fn,
                            )
                        if mcmc.kind == "HMC":
                            return hmc_step(
                                x, tp, k_mcmc, score_fn, logp_fn,
                                mcmc_step_sizes,
                                mcmc.hmc_mass_scale * sched.betas,
                                mcmc.samples_per_step,
                                mcmc.hmc_leapfrog_steps,
                                mcmc.hmc_damping, fmask_, clamp_fn,
                            )
                        raise ValueError(mcmc.kind)

                    x, acc = jax.lax.cond(
                        t_prev >= 0, run_mcmc,
                        lambda x: (x, jnp.zeros((), x.dtype)), x
                    )
                    x = clamp_fn(x)
                    return (x, key, acc_sum + acc), None

                return jax.lax.scan(body, carry, t_pairs)[0]

            seg_jit = jax.jit(seg_fn)
            self._seg_jit_cache[seg_key] = seg_jit

        k_init, k_scan = jax.random.split(key)
        # full-scale init: see sample_ddim (the 0.5 DDPM init contracts the
        # deterministic pushforward; test_ddim_gaussian.py)
        x = jax.random.normal(k_init, gt.shape, gt.dtype)
        x = jnp.where(cond, gt, x * fmask[..., None])

        carry = (x, k_scan, jnp.zeros((), gt.dtype))
        n = len(ts_np)
        seg = max(1, n // max(num_segments, 1))
        for s in range(0, n, seg):
            t_pairs = (jnp.asarray(ts_np[s:s + seg]),
                       jnp.asarray(ts_prev_np[s:s + seg]))
            carry = seg_jit(params, graph, carry, t_pairs)
            if num_segments > 1:
                # force a launch boundary: keep every device RPC short
                jax.block_until_ready(carry[0])
        x, _, acc_sum = carry
        if return_acceptance:
            return x, acc_sum / max(n_mcmc, 1)
        return x
