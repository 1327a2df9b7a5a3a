"""Decompose the fused qualitative protocol launch (VERDICT r3 weak #1).

bench.py's batch-100 chain does 3.65 ms/graph and the x20 fan-out 3.87, yet
the committed qual_v4 fast rows sit at 10.7-18.5 ms/graph/try at B*k=1000 —
and grow with object count even though every shape is static. The only
data-dependent quantity is the sorted dispatch's real-tile count, but the
model FLOPs say the chain should be ~25x faster, so something else owns the
time. This script measures, on the real checkpoint and the real 1000-chain
protocol batch:

  1. the full sample+check launch (what the protocol times),
  2. the sampling chain alone (no satisfaction check),
  3. a denoiser-only T-step loop (no p_sample update, no clamp, no RNG),
  4. the same chain at T=100 (fixed-overhead vs per-step scaling),
  5. per-count tile counts of the dispatch (the data-dependent term).

Writes one JSON to results/chain_profile.json.

Usage (TPU): python _profile_chain.py --results_dir results/qual_v4
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import argparse
import json
import time


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", default="results/qual_v4")
    p.add_argument("--milestone", type=int, default=1)
    p.add_argument("--counts", type=int, nargs="+", default=[2, 6])
    p.add_argument("--batch", type=int, default=1000)
    p.add_argument("--use_pallas", action="store_true", default=True)
    p.add_argument("--json_out", default="results/chain_profile.json")
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.eval.evaluate import make_sample_and_check
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
    model_dict["use_pallas"] = True
    model_dict["compute_dtype"] = "bfloat16"
    cfg = DiffuserConfig.from_dict(model_dict)
    mode = cfg.input_mode
    spec = MODE_SPECS[mode]
    model = ConstraintDiffuser(cfg)
    sched = DiffusionSchedule.create(timesteps=saved["timesteps"])
    diffusion = GaussianDiffusion(model, sched, mcmc=MCMCConfig(kind="none"))

    rng = np.random.default_rng(11)
    sampler, to_graph = mode_samplers(mode)

    dummy_graphs = stack_graphs([
        to_graph(sampler(rng, min_num_objects=3, max_num_objects=3),
                 spec["max_nodes"], spec["max_edges"])
    ])
    trainer = Trainer(
        diffusion,
        GraphDataset(arrays=graphs_to_arrays(dummy_graphs), input_mode=mode),
        TrainConfig(**saved["train"]),
        results_dir=args.results_dir,
    )
    state = trainer.load(args.milestone)
    params = state.params
    print(f"loaded m={args.milestone}", flush=True)

    def timed(f, *a, reps=3):
        out = f(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = f(*a)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return min(ts)

    report = {"batch": args.batch, "rows": {}}
    sched100 = DiffusionSchedule.create(timesteps=100)
    diff100 = GaussianDiffusion(model, sched100, mcmc=MCMCConfig(kind="none"))

    for count in args.counts:
        gs = [
            to_graph(sampler(rng, min_num_objects=count,
                             max_num_objects=count),
                     spec["max_nodes"], spec["max_edges"])
            for _ in range(args.batch)
        ]
        graphs = jax.tree.map(jnp.asarray, stack_graphs(gs))
        row = {}
        row["real_edges_per_graph"] = float(
            np.asarray(graphs.edge_mask).sum() / args.batch
        )
        d = diffusion._dispatch(graphs)
        if d is not None and hasattr(d, "tile_type"):
            row["dispatch_tiles"] = int(np.asarray(d.tile_type).size)
            row["dispatch_chunks"] = (
                int(d.idx_packed.shape[0]) if d.idx_packed.ndim == 4 else 1
            )

        # 1. full protocol launch (sample + satisfied check)
        fn = make_sample_and_check(diffusion, mode)
        row["full_launch_sec"] = timed(
            lambda: fn(params, graphs, jax.random.PRNGKey(0))[0]
        )

        # 2. chain only
        chain = jax.jit(lambda p, g, k: diffusion.sample(p, g, k))
        row["chain_only_sec"] = timed(
            lambda: chain(params, graphs, jax.random.PRNGKey(0))
        )

        # 3. denoiser-only loop: T evaluations of the denoiser on a carried x
        def den_loop(p, g):
            dsp = diffusion._dispatch(g)

            def body(i, x):
                tb = jnp.full(x.shape[:1], 500, jnp.int32)
                return diffusion._denoise(p, x, g, tb, dsp, None)

            return jax.lax.fori_loop(
                0, sched.num_timesteps, body, g.pose
            )

        dl = jax.jit(den_loop)
        row["denoiser_only_sec"] = timed(
            lambda: dl(params, graphs)
        )

        # 4. T=100 chain: separates per-step cost from fixed launch overhead
        chain100 = jax.jit(lambda p, g, k: diff100.sample(p, g, k))
        row["chain_T100_sec"] = timed(
            lambda: chain100(params, graphs, jax.random.PRNGKey(0))
        )

        row["ms_per_graph_full"] = row["full_launch_sec"] / args.batch * 1e3
        report["rows"][str(count)] = row
        print(count, json.dumps(row), flush=True)
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2)

    print("wrote", args.json_out, flush=True)


if __name__ == "__main__":
    main()
