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
    p.add_argument("--sampler", default="ddpm", choices=["ddpm", "ddim"])
    p.add_argument("--ddim_steps", type=int, default=100)
    p.add_argument("--rejection_baseline", action="store_true",
                   help="also run the rejection-sampling baseline")
    p.add_argument("--json_out", default=None)
    p.add_argument("--resume", action="store_true",
                   help="skip object counts already present in the output "
                        "JSON (reference resume_eval, ddpm.py:571-586)")
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

    cfg = DiffuserConfig.from_dict(saved["model"])
    mode = cfg.input_mode
    spec = MODE_SPECS[mode]
    model = ConstraintDiffuser(cfg)
    sched = DiffusionSchedule.create(timesteps=saved["timesteps"])
    mcmc = MCMCConfig(**saved["mcmc"])
    diffusion = GaussianDiffusion(model, sched, mcmc=mcmc)

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
    print(f"loaded milestone {args.milestone} at step {int(state.step)}",
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

    key = jax.random.PRNGKey(args.seed)
    for count in range(lo, hi + 1):
        if args.resume and str(count) in log:
            continue
        test_graphs = sample_test_set(count, args.problems_per_count)
        key, sub = jax.random.split(key)
        res = evaluate_model(diffusion, params, test_graphs, sub,
                             tries=args.tries, sampler=args.sampler,
                             ddim_steps=args.ddim_steps)
        log[str(count)] = res.summary()
        print(f"{count} objects: top1={res.top1:.3f} "
              f"top{args.tries}={res.topk:.3f} "
              f"{res.seconds_per_graph()*1000:.2f} ms/graph/try", flush=True)

        if args.rejection_baseline and (
            mode == "qualitative" or "diffuse_pairwise" in mode
        ):
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
