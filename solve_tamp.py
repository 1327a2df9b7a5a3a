"""TAMP suite evaluation: placement-order variants of solved robot scenes.

Capability parity: reference ``demo_utils.py:1241-1272`` (50 shuffled
placement-order copies of a solution, the `_all_n=N_i=K` datasets) evaluated
via ``solve_csp.py:89-105`` with tries=(1, 0) — one diffusion sample per
variant, success = the solver places the same objects under a permuted
order. Here each suite is one stacked batch of 50 graphs solved in a single
on-device launch; success uses the full robot oracle (device geometry + IK
pick-and-place + settle).

Example:
  python solve_tamp.py --results_dir results/robot_v2 --milestone 1 \
      --scenes_per_count 5 --variants 50
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import argparse
import json

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", default="results/robot_v2")
    p.add_argument("--milestone", type=int, default=1)
    p.add_argument("--scenes_per_count", type=int, default=5)
    p.add_argument("--variants", type=int, default=50)
    p.add_argument("--min_objects", type=int, default=3)
    p.add_argument("--max_objects", type=int, default=6)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--oracle", default="full", choices=["device", "full"])
    p.add_argument("--json_out", default=None)
    return p.parse_args(argv)


def main(argv=None):
    import jax

    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.envs.robot import (
        make_tamp_test_suite,
        sample_robot_scene,
    )
    from diffusion_ccsp_tpu.eval.evaluate import make_sample_and_check
    from diffusion_ccsp_tpu.graphs import stack_graphs
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
    from diffusion_ccsp_tpu.samplers import MCMCConfig
    from diffusion_ccsp_tpu.train.data import MODE_SPECS, GraphDataset, graphs_to_arrays
    from diffusion_ccsp_tpu.train.trainer import TrainConfig, Trainer

    args = get_args(argv)
    with open(os.path.join(args.results_dir, "config.json")) as f:
        saved = json.load(f)
    cfg = DiffuserConfig.from_dict(saved["model"])
    assert "robot" in cfg.input_mode, "TAMP suites are robot-mode"
    spec = MODE_SPECS[cfg.input_mode]
    model = ConstraintDiffuser(cfg)
    sched = DiffusionSchedule.create(timesteps=saved["timesteps"])
    diffusion = GaussianDiffusion(model, sched, mcmc=MCMCConfig(**saved["mcmc"]))

    rng = np.random.default_rng(args.seed)
    scene = sample_robot_scene(rng, min_num_objects=3, max_num_objects=3)
    from diffusion_ccsp_tpu.envs.robot import robot_scene_to_graph

    dummy = stack_graphs(
        [robot_scene_to_graph(scene, spec["max_nodes"], spec["max_edges"])]
    )
    trainer = Trainer(
        diffusion,
        GraphDataset(arrays=graphs_to_arrays(dummy), input_mode=cfg.input_mode),
        TrainConfig(**saved["train"]),
        results_dir=args.results_dir,
    )
    state = trainer.load(args.milestone)
    params = state.params
    print(f"loaded milestone {args.milestone} at step {trainer.loaded_step}",
          flush=True)

    oracle_fn = None
    if args.oracle == "full":
        from diffusion_ccsp_tpu.eval.oracles import make_robot_oracle

        oracle_fn = make_robot_oracle()

    fn = make_sample_and_check(diffusion)
    key = jax.random.PRNGKey(args.seed)
    log = {}
    for count in range(args.min_objects, args.max_objects + 1):
        rates = []
        for s in range(args.scenes_per_count):
            scene = sample_robot_scene(
                rng, min_num_objects=count, max_num_objects=count
            )
            suite = make_tamp_test_suite(
                scene, rng, n_variants=args.variants,
                max_nodes=spec["max_nodes"], max_edges=spec["max_edges"],
            )
            graphs = stack_graphs(suite)
            key, sub = jax.random.split(key)
            ok, out, _ = fn(params, graphs, sub)
            ok = np.asarray(ok)
            if oracle_fn is not None:
                ok, _ = oracle_fn(graphs, np.asarray(out), ok)
            rates.append(float(ok.mean()))
        log[str(count)] = {
            "tamp_success_rate": float(np.mean(rates)),
            "per_scene": rates,
            "variants": args.variants,
            "oracle": args.oracle,
        }
        print(
            f"{count} objects: TAMP success {np.mean(rates):.3f} over "
            f"{args.scenes_per_count} suites x {args.variants} variants",
            flush=True,
        )

    out_path = args.json_out or os.path.join(
        args.results_dir, f"tamp_t={args.milestone}.json"
    )
    with open(out_path, "w") as f:
        json.dump(log, f, indent=2)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
