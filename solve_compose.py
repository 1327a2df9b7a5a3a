"""Composed robot x qualitative inference from two separately trained models.

Capability parity: reference composed inference (``solve_csp.py`` with the
``robot_qualitative`` processed dataset; model wiring at
``denoise_fn.py:286-291,487-503``): a robot_box model and a qualitative model
solve packing problems with qualitative spatial constraints jointly by
summing their per-constraint denoiser outputs.

Example:
  python solve_compose.py --robot_dir results/robot_v1 --robot_milestone 2 \
      --qual_dir results/qual_v2 --qual_milestone 6 --tries 10
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
    p.add_argument("--robot_dir", required=True)
    p.add_argument("--robot_milestone", type=int, required=True)
    p.add_argument("--qual_dir", required=True)
    p.add_argument("--qual_milestone", type=int, required=True)
    p.add_argument("--tries", type=int, default=10)
    p.add_argument("--problems_per_count", type=int, default=50)
    p.add_argument("--min_objects", type=int, default=3)
    p.add_argument("--max_objects", type=int, default=6)
    p.add_argument("--composing_weight", type=float, nargs=2, default=[1.0, 1.0])
    p.add_argument("--composing_weight_final", type=float, nargs=2,
                   default=None,
                   help="annealed composition (round-5): per-domain weights "
                        "interpolate linearly in t from --composing_weight "
                        "at the chain start to THESE values at t=0 "
                        "(e.g. 1.0 0.3 -> 1.0 0.02: qualitative factor "
                        "steers early, packing factor finishes)")
    p.add_argument("--type_weights", type=float, nargs="+", default=None,
                   help="static per-constraint-type output weights "
                        "(len = 2 robot + 13 qualitative types)")
    p.add_argument("--domain_norm", action="store_true",
                   help="per-domain sqrt-count output renormalization "
                        "(round-5: stops O(n) qualitative edges drowning "
                        "the O(1) packing edges at dense counts)")
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--oracle", default="full", choices=["device", "full"])
    p.add_argument("--json_out", default=None)
    p.add_argument("--parallel_tries", action="store_true",
                   help="fuse all k re-noise tries into one launch")
    p.add_argument("--resume", action="store_true",
                   help="skip object counts already present in the output "
                        "JSON (reference resume_eval, ddpm.py:571-586)")
    return p.parse_args(argv)


def _restore(results_dir, milestone):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(results_dir, f"model-{milestone}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)["params"]


def main(argv=None):
    import jax

    from diffusion_ccsp_tpu.compose import (
        compose_params,
        robot_qualitative_config,
    )
    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.envs.robot import (
        robot_qualitative_scene_to_graph,
        sample_robot_scene,
    )
    from diffusion_ccsp_tpu.eval.evaluate import evaluate_model
    from diffusion_ccsp_tpu.graphs import stack_graphs
    from diffusion_ccsp_tpu.models.diffuser import ConstraintDiffuser
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
    from diffusion_ccsp_tpu.train.data import MODE_SPECS

    args = get_args(argv)
    robot_params = _restore(args.robot_dir, args.robot_milestone)
    qual_params = _restore(args.qual_dir, args.qual_milestone)
    params = compose_params(
        {"params": robot_params["params"]},
        {"params": qual_params["params"]},
        hidden_dim=args.hidden_dim,
    )
    print("composed robot + qualitative parameters", flush=True)

    cfg = robot_qualitative_config(
        hidden_dim=args.hidden_dim,
        composing_weight=tuple(args.composing_weight),
        composing_weight_final=(
            tuple(args.composing_weight_final)
            if args.composing_weight_final is not None else None
        ),
        anneal_timesteps=args.timesteps,
        type_weights=(
            tuple(args.type_weights) if args.type_weights is not None
            else None
        ),
        domain_norm=args.domain_norm,
    )
    model = ConstraintDiffuser(cfg)
    diffusion = GaussianDiffusion(
        model, DiffusionSchedule.create(timesteps=args.timesteps)
    )

    oracle_fn = None
    if args.oracle == "full":
        from diffusion_ccsp_tpu.eval.oracles import make_robot_oracle

        # composed success = robot AND qualitative constraints (reference
        # ddpm.py:708-711); the host oracle adds IK + settle on top
        oracle_fn = make_robot_oracle()

    spec = MODE_SPECS["robot_qualitative"]
    rng = np.random.default_rng(args.seed)
    out = args.json_out or os.path.join(
        args.robot_dir, "composed_robot_qualitative.json"
    )
    log = {}
    if args.resume and os.path.exists(out):
        with open(out) as f:
            log = json.load(f)
        print(f"resuming; have counts {sorted(log)}", flush=True)
    key = jax.random.PRNGKey(args.seed)
    for count in range(args.min_objects, args.max_objects + 1):
        # the RNG must walk the same scene sequence whether or not a count
        # is skipped, so resumed runs see identical test sets
        gs = []
        for _ in range(args.problems_per_count):
            scene = sample_robot_scene(
                rng, min_num_objects=count, max_num_objects=count
            )
            gs.append(
                robot_qualitative_scene_to_graph(
                    scene, spec["max_nodes"], spec["max_edges"]
                )
            )
        # split BEFORE the resume skip so the key chain advances identically
        # whether or not a count was already evaluated (advisor r4)
        key, sub = jax.random.split(key)
        if str(count) in log:
            continue
        test = stack_graphs(gs)
        res = evaluate_model(diffusion, params, test, sub, tries=args.tries,
                             parallel_tries=args.parallel_tries,
                             oracle_fn=oracle_fn, collect_failures=True)
        log[str(count)] = res.summary()
        log[str(count)]["composing_weight"] = list(args.composing_weight)
        if args.composing_weight_final is not None:
            log[str(count)]["composing_weight_final"] = list(
                args.composing_weight_final
            )
        if args.type_weights is not None:
            log[str(count)]["type_weights"] = list(args.type_weights)
        if args.domain_norm:
            log[str(count)]["domain_norm"] = True
        print(f"{count} objects (composed): top1={res.top1:.3f} "
              f"top{args.tries}={res.topk:.3f}", flush=True)
        # incremental write after every count (reference ddpm.py:784-785)
        with open(out, "w") as f:
            json.dump(log, f, indent=2)

    with open(out, "w") as f:
        json.dump(log, f, indent=2)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
