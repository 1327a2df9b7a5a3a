"""Evaluate a trained Diffusion-CCSP checkpoint: constraint-satisfaction rate
top-1 / top-k per object count, any input mode.

Capability parity: reference ``solve_csp.py`` (evaluate pretrained checkpoints
over test sets of 100 problems per object count, k re-noise rounds).

Example:
  python solve_ccsp.py --results_dir results/qual_v1 --milestone 3 --tries 10
"""

from __future__ import annotations


import os

# persistent compilation cache: repeated CLI runs (and watchdog retries)
# reuse compiled executables instead of re-hitting the remote compiler
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")




import argparse
import json
import os

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", default="results")
    p.add_argument("--milestone", type=int, default=1)
    p.add_argument("--tries", type=int, default=10)
    p.add_argument("--problems_per_count", type=int, default=100)
    p.add_argument("--min_objects", type=int, default=None)
    p.add_argument("--max_objects", type=int, default=None)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--sampler", default="ddpm",
                   choices=["ddpm", "ddim", "ddim_mcmc"])
    p.add_argument("--ddim_steps", type=int, default=100)
    p.add_argument("--ddim_eta", type=float, default=1.0,
                   help="DDIM stochasticity (0 = deterministic; 1 = "
                        "DDPM-like per-step noise on the strided grid)")
    p.add_argument("--rejection_baseline", action="store_true",
                   help="also run the rejection-sampling baseline")
    p.add_argument("--json_out", default=None)
    p.add_argument("--resume", action="store_true",
                   help="skip object counts already present in the output "
                        "JSON (reference resume_eval, ddpm.py:571-586)")
    p.add_argument("--oracle", default="auto",
                   choices=["auto", "device", "full"],
                   help="success oracle: 'full' adds the host-side LP "
                        "equilibrium (stability) / IK pick-and-place (robot) "
                        "verdicts on top of the device geometry (reference "
                        "ddpm.py:653-669); 'auto' = full for those modes")
    p.add_argument("--dynamics", action="store_true",
                   help="stability oracle also confirms with the native "
                        "2-D dynamics stepper")
    p.add_argument("--plan_paths", action="store_true",
                   help="robot oracle also plans RRT joint paths (slow)")
    p.add_argument("--candidates", type=int, default=0,
                   help="K>0: also run the sharded candidate fan-out and "
                        "report selected-sample success (the TPU answer to "
                        "the reference's re-noise tries, ddpm.py:591-604)")
    p.add_argument("--mcmc", default=None,
                   choices=["none", "ULA", "ULA+", "MALA", "HMC"],
                   help="override the sampler's annealed-MCMC refinement at "
                        "inference (reference EBM inference, ddpm.py:277-320)")
    p.add_argument("--mcmc_steps", type=int, default=None,
                   help="MCMC inner steps per diffusion step")
    p.add_argument("--step_size_scale", type=float, default=None,
                   help="MCMC step sizes = scale * betas (reference "
                        "step_sizes='2*self.betas', ddpm.py:207)")
    p.add_argument("--type_weights", type=float, nargs="+", default=None,
                   help="per-constraint-type output weights at inference "
                        "(len = the mode's constraint vocabulary; e.g. "
                        "up-weight cfree on dense triangle packs)")
    p.add_argument("--no_warmup", action="store_true",
                   help="skip the timing-warmup launch (halves the cost of "
                        "expensive k=100 MCMC rows; try-0 wall-clock then "
                        "includes compile, so timing columns are indicative "
                        "only)")
    p.add_argument("--no_failures", action="store_true",
                   help="skip failure-mode collection")
    p.add_argument("--parallel_tries", action="store_true",
                   help="fuse all k re-noise tries into ONE batched launch "
                        "of B*k diffusion chains (same samples statistically; "
                        "k-times the arithmetic intensity per launch)")
    p.add_argument("--launch_segments", type=int, default=0,
                   help="split each DDPM chain launch into this many "
                        "sequential device RPCs (sample_segmented) — keeps "
                        "long fused-MCMC launches under the tunnel "
                        "transport's deadline (round-3 fault envelope)")
    p.add_argument("--compute_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="override the edge-bank matmul dtype at inference")
    p.add_argument("--use_pallas", action="store_true",
                   help="run the fused Pallas edge kernel on the sampling path")
    p.add_argument("--matmul_strategy", default=None,
                   choices=["ragged", "dense", "sorted"],
                   help="override the edge-bank dispatch strategy at "
                        "inference ('sorted' = chain-constant tile-aligned "
                        "layout, no per-step sort/unsort)")
    return p.parse_args(argv)


def main(argv=None):
    import faulthandler
    import signal

    # live stack dumps without killing the process: kill -USR1 <pid>
    faulthandler.register(signal.SIGUSR1)
    import jax

    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.eval.evaluate import evaluate_model
    from diffusion_ccsp_tpu.graphs import stack_graphs
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
    from diffusion_ccsp_tpu.samplers import MCMCConfig
    from diffusion_ccsp_tpu.train.data import (
        GraphDataset,
        MODE_SPECS,
        graphs_to_arrays,
        mode_samplers,
    )
    from diffusion_ccsp_tpu.train.trainer import TrainConfig, Trainer

    args = get_args(argv)
    with open(os.path.join(args.results_dir, "config.json")) as f:
        saved = json.load(f)

    model_dict = dict(saved["model"])
    if args.compute_dtype is not None:
        model_dict["compute_dtype"] = args.compute_dtype
    if args.use_pallas:
        model_dict["use_pallas"] = True
    if args.matmul_strategy is not None:
        model_dict["matmul_strategy"] = args.matmul_strategy
    if args.type_weights is not None:
        model_dict["type_weights"] = list(args.type_weights)
    cfg = DiffuserConfig.from_dict(model_dict)
    mode = cfg.input_mode
    spec = MODE_SPECS[mode]
    if saved.get("model_class") == "StructDiffusion":
        from diffusion_ccsp_tpu.models.transformer import StructDiffusion

        model = StructDiffusion(cfg)
    else:
        model = ConstraintDiffuser(cfg)
    sched_kwargs = {}
    if args.step_size_scale is not None:
        sched_kwargs["step_size_scale"] = args.step_size_scale
    sched = DiffusionSchedule.create(
        timesteps=saved["timesteps"], **sched_kwargs
    )
    mcmc_cfg = dict(saved["mcmc"])
    # a model TRAINED energy-parameterized (saved kind MALA/HMC forces the
    # energy wrapper, reference train_utils.py:115-116) must keep using the
    # energy gradient as its denoiser even when sampling plain DDPM
    # (--mcmc none) — otherwise the raw forward output is misinterpreted
    # (the round-2 mislabeled-DDPM-row failure mode)
    energy_trained = mcmc_cfg.get("kind") in ("MALA", "HMC")
    if args.mcmc is not None:
        mcmc_cfg["kind"] = args.mcmc
    if args.mcmc_steps is not None:
        mcmc_cfg["samples_per_step"] = args.mcmc_steps
    mcmc = MCMCConfig(**mcmc_cfg)
    diffusion = GaussianDiffusion(
        model, sched, mcmc=mcmc,
        energy_based=energy_trained or mcmc.needs_energy,
    )

    rng = np.random.default_rng(args.seed)
    sampler, to_graph = mode_samplers(mode)

    def sample_test_set(count, n):
        gs = []
        for _ in range(n):
            scene = sampler(rng, min_num_objects=count, max_num_objects=count)
            gs.append(to_graph(scene, spec["max_nodes"], spec["max_edges"]))
        # keep host-side numpy: jit device-puts whole batches; a premature
        # jnp.asarray would force per-array device round-trips
        return stack_graphs(gs)

    dummy = sample_test_set(spec["counts"][0], 1)
    trainer = Trainer(
        diffusion,
        GraphDataset(arrays=graphs_to_arrays(dummy), input_mode=mode),
        TrainConfig(**saved["train"]),
        results_dir=args.results_dir,
    )
    state = trainer.load(args.milestone)
    params = state.ema_params if args.use_ema else state.params
    # trainer.loaded_step is host-side — an int(state.step) here would be a
    # device readback, the op that wedges on flaky tunnel transports
    print(f"loaded milestone {args.milestone} at step {trainer.loaded_step}",
          flush=True)

    lo = args.min_objects if args.min_objects is not None else spec["counts"][0]
    hi = args.max_objects if args.max_objects is not None else spec["counts"][1]

    out_path = args.json_out or os.path.join(
        args.results_dir, f"denoised_t={args.milestone}.json"
    )
    log = {}
    if args.resume and os.path.exists(out_path):
        with open(out_path) as f:
            log = json.load(f)
        print(f"resuming; have counts {sorted(log)}", flush=True)

    # success oracle (reference ddpm.py:653-669: PyBullet physics for
    # stability, IK pick-and-place for robot; device geometry for 2-D modes)
    oracle_fn = None
    if args.oracle != "device":
        from diffusion_ccsp_tpu.eval.oracles import oracle_for_mode

        oracle_fn = oracle_for_mode(
            mode, dynamics=args.dynamics, plan_paths=args.plan_paths
        )
        if args.oracle == "full" and oracle_fn is None:
            print("note: device geometry IS the full oracle for this mode",
                  flush=True)

    solver = None
    if args.candidates > 0:
        from diffusion_ccsp_tpu.eval.evaluate import satisfied_fn_for_mode
        from diffusion_ccsp_tpu.parallel.mesh import make_mesh
        from diffusion_ccsp_tpu.parallel.sampling import make_sharded_solver

        mesh = make_mesh()
        # oracle-gated modes get the ranked pool for cascade selection
        solver = make_sharded_solver(
            diffusion, satisfied_fn_for_mode(mode), mesh, args.candidates,
            ranked=oracle_fn is not None,
        )

    key = jax.random.PRNGKey(args.seed)
    for count in range(lo, hi + 1):
        # split BEFORE the resume skip so the key chain advances identically
        # whether or not a count was already evaluated (advisor r4, same
        # pattern as solve_compose)
        key, sub = jax.random.split(key)
        if args.resume and str(count) in log:
            continue
        test_graphs = sample_test_set(count, args.problems_per_count)
        res = evaluate_model(diffusion, params, test_graphs, sub,
                             tries=args.tries, sampler=args.sampler,
                             ddim_steps=args.ddim_steps,
                             ddim_eta=args.ddim_eta,
                             segments=args.launch_segments,
                             parallel_tries=args.parallel_tries,
                             oracle_fn=oracle_fn,
                             collect_failures=not args.no_failures,
                             warmup=not args.no_warmup)
        log[str(count)] = res.summary()
        if args.parallel_tries:
            log[str(count)]["parallel_tries"] = True
        if args.use_pallas or args.matmul_strategy or args.compute_dtype:
            log[str(count)]["compute_path"] = {
                "matmul_strategy": cfg.matmul_strategy,
                "use_pallas": cfg.use_pallas,
                "compute_dtype": cfg.compute_dtype,
            }
        if res.mean_acceptance is not None:
            print(f"  mcmc acceptance {res.mean_acceptance:.3f}", flush=True)
        log[str(count)]["oracle"] = (
            "full" if oracle_fn is not None else "device"
        )
        if mcmc.kind != "none":
            log[str(count)]["mcmc"] = mcmc.kind
            log[str(count)]["mcmc_steps"] = mcmc.samples_per_step
        if args.type_weights is not None:
            log[str(count)]["type_weights"] = list(args.type_weights)
        print(f"{count} objects: top1={res.top1:.3f} "
              f"top{args.tries}={res.topk:.3f} "
              f"{res.seconds_per_graph()*1000:.2f} ms/graph/try", flush=True)
        if "failure_constraint_hist" in log[str(count)]:
            print("  failure modes:", log[str(count)]["failure_constraint_hist"],
                  log[str(count)].get("oracle_failure_hist", {}), flush=True)

        if solver is not None:
            import jax.numpy as jnp

            key, sub = jax.random.split(key)
            dev_graphs = jax.tree.map(jnp.asarray, test_graphs)
            if oracle_fn is not None:
                # oracle-cascade (VERDICT r4 item 5): walk the host oracle
                # down the device-ranked candidate list until one passes —
                # amortized 1-2 oracle calls per problem, K worst case;
                # round-4's single-pick selection wasted the other K-1
                # candidates on every oracle rejection (.21 selected vs .36
                # top-10 at robot count 5)
                ok_r, poses_r, n_sat = solver(params, dev_graphs, sub)
                ok_r = np.asarray(ok_r)          # [B, K]
                poses_r = np.asarray(poses_r)    # [B, K, N, P]
                b = ok_r.shape[0]
                sel_ok = np.zeros(b, bool)
                oracle_calls = np.zeros(b, np.int32)
                unresolved = np.arange(b)
                for j in range(args.candidates):
                    if unresolved.size == 0:
                        break
                    sub_graphs = jax.tree.map(
                        lambda x: np.asarray(x)[unresolved], test_graphs
                    )
                    ok_j, _ = oracle_fn(
                        sub_graphs, poses_r[unresolved, j], ok_r[unresolved, j]
                    )
                    ok_j = np.asarray(ok_j, bool)
                    oracle_calls[unresolved] += 1
                    sel_ok[unresolved[ok_j]] = True
                    unresolved = unresolved[~ok_j]
                log[str(count)]["mean_oracle_calls"] = float(
                    oracle_calls.mean()
                )
                log[str(count)]["selection"] = "oracle_cascade"
            else:
                sel_ok, sel_pose, n_sat = solver(params, dev_graphs, sub)
                sel_ok = np.asarray(sel_ok)
            log[str(count)]["candidates"] = args.candidates
            log[str(count)]["selected_success"] = float(sel_ok.mean())
            log[str(count)]["mean_satisfied_candidates"] = float(
                np.asarray(n_sat).mean()
            )
            print(f"  candidates K={args.candidates}: "
                  f"selected={sel_ok.mean():.3f} "
                  f"(mean satisfied/problem "
                  f"{np.asarray(n_sat).mean():.1f})", flush=True)

        if args.rejection_baseline:
            # all four families (reference per-mode handling,
            # demo_utils.py:1322-1465; robot at :1326-1330, stability at
            # :1331-1336 — round-2 gap closed)
            from diffusion_ccsp_tpu.eval.rejection import rejection_baseline

            key, sub = jax.random.split(key)
            base = rejection_baseline(
                jax.tree.map(jax.numpy.asarray, test_graphs), sub,
                tries=args.tries, input_mode=mode,
            )
            log[str(count)]["rejection_top1"] = float(base[:, 0].mean())
            log[str(count)]["rejection_topk"] = float(base.any(axis=1).mean())
            print("  rejection baseline: "
                  f"top1={log[str(count)]['rejection_top1']:.3f} "
                  f"top{args.tries}={log[str(count)]['rejection_topk']:.3f}",
                  flush=True)

        # incremental write after every count (reference writes the log JSON
        # inside the loop, ddpm.py:784-785)
        with open(out_path, "w") as f:
            json.dump(log, f, indent=2)

    with open(out_path, "w") as f:
        json.dump(log, f, indent=2)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
