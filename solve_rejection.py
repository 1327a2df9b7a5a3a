"""Standalone rejection-sampling baseline rows (VERDICT r4 item 6).

Capability parity: reference ``solve_csp_rejection.py`` /
``run_rejection_sampling_baseline`` (``demo_utils.py:1275-1499``) — the
model-free baseline every results table is read against: per-object uniform
pose sampling with an in-budget collision/constraint check, k restart
rounds per problem. Here the whole loop runs on device
(``eval/rejection.py`` lax.while/scan solvers, vmapped over problems), and
oracle-gated modes (robot/stability) apply the same host oracle as the model
protocol rows on top of the device verdict.

Test sets are generated with the same seed convention as ``solve_ccsp.py``
(default_rng(seed), counts ascending), so rows are comparable
problem-for-problem with the model rows at seed 1234.

Example:
  python solve_rejection.py --input_mode qualitative \
      --json_out results/rejection_qualitative.json
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import argparse
import json
import time

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_mode", default="qualitative",
                   choices=["qualitative", "diffuse_pairwise",
                            "stability_flat", "robot_box"])
    p.add_argument("--problems_per_count", type=int, default=100)
    p.add_argument("--tries", type=int, default=10)
    p.add_argument("--budget", type=int, default=50,
                   help="pose proposals per object before giving up "
                        "(reference demo_utils.py:1341)")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--oracle", default="full", choices=["device", "full"],
                   help="'full' applies the host IK/settle/LP oracle on "
                        "robot/stability modes, as the model rows do")
    p.add_argument("--json_out", default=None)
    p.add_argument("--resume", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    import jax

    from diffusion_ccsp_tpu.eval.rejection import (
        make_rejection_solver,
        make_robot_rejection_solver,
        make_stability_rejection_solver,
        make_triangle_rejection_solver,
    )
    from diffusion_ccsp_tpu.graphs import stack_graphs
    from diffusion_ccsp_tpu.train.data import MODE_SPECS, mode_samplers

    args = get_args(argv)
    mode = args.input_mode
    spec = MODE_SPECS[mode]
    sampler, to_graph = mode_samplers(mode)
    rng = np.random.default_rng(args.seed)

    if "diffuse_pairwise" in mode:
        solver = make_triangle_rejection_solver(args.budget)
    elif "robot" in mode:
        solver = make_robot_rejection_solver(args.budget)
    elif "stability" in mode:
        solver = make_stability_rejection_solver(args.budget)
    else:
        solver = make_rejection_solver(args.budget)

    oracle_fn = None
    if args.oracle == "full" and (
        "robot" in mode or "stability" in mode
    ):
        from diffusion_ccsp_tpu.eval.oracles import oracle_for_mode

        oracle_fn = oracle_for_mode(mode)

    out_path = args.json_out or f"results/rejection_{mode}.json"
    log = {}
    if args.resume and os.path.exists(out_path):
        with open(out_path) as f:
            log = json.load(f)
        print(f"resuming; have counts {sorted(log)}", flush=True)

    key = jax.random.PRNGKey(args.seed)
    lo, hi = spec["counts"]
    for count in range(lo, hi + 1):
        key, sub = jax.random.split(key)
        if str(count) in log:
            continue
        gs = [
            to_graph(sampler(rng, min_num_objects=count,
                             max_num_objects=count),
                     spec["max_nodes"], spec["max_edges"])
            for _ in range(args.problems_per_count)
        ]
        graphs = jax.tree.map(jax.numpy.asarray, stack_graphs(gs))
        b = args.problems_per_count

        # warmup launch excluded from timing (compile)
        k0 = jax.random.split(jax.random.fold_in(sub, 999), b)
        jax.block_until_ready(solver(graphs, k0)[0])

        succ = np.zeros((b, args.tries), bool)
        oracle_sec = 0.0
        t0 = time.time()
        for k in range(args.tries):
            keys = jax.random.split(jax.random.fold_in(sub, k), b)
            ok, pose = solver(graphs, keys)
            ok = np.asarray(ok)
            if oracle_fn is not None:
                to0 = time.time()
                ok, _ = oracle_fn(graphs, np.asarray(pose), ok)
                oracle_sec += time.time() - to0
            succ[:, k] = np.asarray(ok, bool)
        dt = time.time() - t0

        row = {
            "success_rate_top1": float(succ[:, 0].mean()),
            f"success_rate_top{args.tries}": float(succ.any(axis=1).mean()),
            "sec_per_graph_per_try": (dt - oracle_sec) / (b * args.tries),
            "oracle_sec": oracle_sec,
            "budget": args.budget,
            "baseline": "rejection",
            "oracle": "full" if oracle_fn is not None else "device",
        }
        log[str(count)] = row
        print(f"{count} objects: rejection top1="
              f"{row['success_rate_top1']:.3f} "
              f"top{args.tries}={row[f'success_rate_top{args.tries}']:.3f} "
              f"{row['sec_per_graph_per_try']*1000:.2f} ms/graph/try",
              flush=True)
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(log, f, indent=2)

    with open(out_path, "w") as f:
        json.dump(log, f, indent=2)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
