"""Minimal repro / bisect for the round-3 fused-MCMC device fault.

Round-3 empirical envelope (ROUND3.md): 1000 fused MALA/HMC/ULA chains fault
with "UNAVAILABLE: TPU device error" on sorted+bf16, and qual-MALA faults
even on ragged-f32 — while plain-DDPM 1000-chain launches run fine, and the
same MCMC chains run fine at batch 100. Because the fault reproduces on
pure-XLA paths, it cannot be a Mosaic/Pallas kernel bug.

Hypothesis tested here: the fault tracks LAUNCH WALL-CLOCK, not memory or a
kernel: MCMC multiplies the per-step cost (samples_per_step inner steps, each
a value_and_grad) so a fused 1000-chain launch crosses the tunnel transport's
RPC deadline, which surfaces as a device error. The bisect sweeps batch size
at fixed chain config, records wall clock for the launches that succeed and
the failure for those that don't; if faults switch on at a roughly constant
wall-time threshold (rather than a memory threshold), the transport deadline
is the cause and chain segmentation (several shorter launches carrying the
scan state) is the principled fix — see --segments.

Usage (TPU):
  python repro_mcmc_fault.py --results_dir results/qual_ebm_v2 --milestone 1
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import argparse
import json
import time
import traceback


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", default="results/qual_ebm_v2")
    p.add_argument("--milestone", type=int, default=1)
    p.add_argument("--mcmc", default="MALA")
    p.add_argument("--batches", type=int, nargs="+",
                   default=[100, 200, 400, 700, 1000])
    p.add_argument("--strategy", default="sorted")
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--timesteps_cap", type=int, default=1000)
    p.add_argument("--segments", type=int, default=0,
                   help="if >0, ALSO try the largest batch with the chain "
                        "split into this many sequential launches")
    p.add_argument("--json_out", default="results/mcmc_fault_repro.json")
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
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
    model_dict["compute_dtype"] = args.compute_dtype
    if args.strategy == "pallas":
        model_dict["use_pallas"] = True
    else:
        model_dict["use_pallas"] = False
        model_dict["matmul_strategy"] = args.strategy
    cfg = DiffuserConfig.from_dict(model_dict)
    mode = cfg.input_mode
    spec = MODE_SPECS[mode]
    model = ConstraintDiffuser(cfg)
    sched = DiffusionSchedule.create(timesteps=saved["timesteps"])
    mcmc_cfg = dict(saved["mcmc"])
    mcmc_cfg["kind"] = args.mcmc
    mcmc = MCMCConfig(**mcmc_cfg)
    diffusion = GaussianDiffusion(model, sched, mcmc=mcmc, energy_based=True)

    rng = np.random.default_rng(7)
    sampler, to_graph = mode_samplers(mode)
    count = spec["counts"][0] + 2

    def make_batch(n):
        gs = [
            to_graph(
                sampler(rng, min_num_objects=count, max_num_objects=count),
                spec["max_nodes"], spec["max_edges"],
            )
            for _ in range(n)
        ]
        return stack_graphs(gs)

    dummy = make_batch(1)
    trainer = Trainer(
        diffusion,
        GraphDataset(arrays=graphs_to_arrays(dummy), input_mode=mode),
        TrainConfig(**saved["train"]),
        results_dir=args.results_dir,
    )
    state = trainer.load(args.milestone)
    params = state.params
    print(f"loaded {args.results_dir} m={args.milestone}; "
          f"mcmc={args.mcmc} strategy={args.strategy}", flush=True)

    fn = jax.jit(lambda p, g, k: diffusion.sample(p, g, k))

    report = {"config": vars(args), "rows": []}
    for nb in args.batches:
        graphs = make_batch(nb)
        row = {"batch": nb}
        try:
            # time to a VALUE FETCH, not block_until_ready — on this
            # tunneled backend block_until_ready can return long before the
            # result is materialized, faking millisecond chains
            t0 = time.time()
            out = fn(params, graphs, jax.random.PRNGKey(0))
            np.asarray(out[:1])
            row["compile_plus_run_sec"] = time.time() - t0
            t0 = time.time()
            out = fn(params, graphs, jax.random.PRNGKey(nb + 1))
            np.asarray(out[:1])
            row["run_sec"] = time.time() - t0
            row["ok"] = True
            print(f"batch {nb}: OK run={row['run_sec']:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — fault classification is the point
            row["ok"] = False
            row["error"] = f"{type(e).__name__}: {str(e)[:400]}"
            print(f"batch {nb}: FAULT {row['error'][:120]}", flush=True)
            traceback.print_exc()
        report["rows"].append(row)
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2)

    if args.segments > 0:
        nb = max(args.batches)
        graphs = make_batch(nb)
        row = {"batch": nb, "segments": args.segments}
        try:
            t0 = time.time()
            out = diffusion.sample_segmented(
                params, graphs, jax.random.PRNGKey(2),
                num_segments=args.segments,
            )
            np.asarray(out[:1])
            row["run_sec_incl_compile"] = time.time() - t0
            row["ok"] = True
            print(f"segmented x{args.segments} batch {nb}: OK "
                  f"{row['run_sec_incl_compile']:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            row["ok"] = False
            row["error"] = f"{type(e).__name__}: {str(e)[:400]}"
            print(f"segmented: FAULT {row['error'][:120]}", flush=True)
        report["rows"].append(row)
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2)

    print("wrote", args.json_out, flush=True)


if __name__ == "__main__":
    main()
