"""Tune MALA/HMC step sizes by Metropolis acceptance rate.

Capability parity: the reference tunes MALA step sizes against a rolling
acceptance-rate tracker printed during sampling (``networks/ddpm.py:969-996``,
tuned values in the comment at ``ddpm.py:307-309``). Here the whole procedure
is automated: the chain reports its mean acceptance as a scalar output, the
step-size table is a *runtime argument* of one compiled executable, and the
tuner bisects the scale to a target acceptance (default 0.574, the classic
MALA optimum; the reference's hand-tuned values sit in the 0.55-0.65 band).

Example:
  python tune_mcmc.py --results_dir results/qual_ebm_v2 --milestone 1 \
      --mcmc MALA --count 5
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import argparse
import json


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", required=True)
    p.add_argument("--milestone", type=int, default=1)
    p.add_argument("--mcmc", default="MALA", choices=["MALA", "HMC"])
    p.add_argument("--mcmc_steps", type=int, default=None)
    p.add_argument("--count", type=int, default=5,
                   help="objects per probe problem")
    p.add_argument("--problems", type=int, default=50)
    p.add_argument("--target", type=float, default=0.574)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--coarse", type=float, nargs="*",
                   default=[1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 3e-2, 1e-1])
    p.add_argument("--bisect_iters", type=int, default=4)
    p.add_argument("--json_out", default=None)
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.eval.evaluate import satisfied_fn_for_mode
    from diffusion_ccsp_tpu.graphs import stack_graphs
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
    from diffusion_ccsp_tpu.samplers import MCMCConfig
    from diffusion_ccsp_tpu.train.data import MODE_SPECS, mode_samplers

    args = get_args(argv)
    with open(os.path.join(args.results_dir, "config.json")) as f:
        saved = json.load(f)
    cfg = DiffuserConfig.from_dict(saved["model"])
    mode = cfg.input_mode
    spec = MODE_SPECS[mode]
    model = ConstraintDiffuser(cfg)
    sched = DiffusionSchedule.create(timesteps=saved["timesteps"])
    mcmc_cfg = dict(saved["mcmc"])
    mcmc_cfg["kind"] = args.mcmc
    if args.mcmc_steps is not None:
        mcmc_cfg["samples_per_step"] = args.mcmc_steps
    diffusion = GaussianDiffusion(model, sched, mcmc=MCMCConfig(**mcmc_cfg))

    import orbax.checkpoint as ocp

    path = os.path.abspath(
        os.path.join(args.results_dir, f"model-{args.milestone}")
    )
    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(path)["params"]
    print(f"loaded {path}", flush=True)

    rng = np.random.default_rng(args.seed)
    sampler, to_graph = mode_samplers(mode)
    gs = [
        to_graph(
            sampler(rng, min_num_objects=args.count,
                    max_num_objects=args.count),
            spec["max_nodes"], spec["max_edges"],
        )
        for _ in range(args.problems)
    ]
    graphs = stack_graphs(gs)
    satisfied = satisfied_fn_for_mode(mode)

    def probe_fn(params, graphs, key, step_sizes):
        out, acc = diffusion.sample(
            params, graphs, key, return_acceptance=True,
            step_sizes=step_sizes,
        )
        out = jnp.clip(out, -1.0, 1.0)
        ok, _ = jax.vmap(satisfied)(graphs, out)
        return acc, ok

    probe = jax.jit(probe_fn)
    betas = np.asarray(sched.betas)
    key = jax.random.PRNGKey(args.seed)

    def measure(scale):
        nonlocal key
        key, sub = jax.random.split(key)
        acc, ok = probe(params, graphs, sub,
                        jnp.asarray(scale * betas, jnp.float32))
        return float(acc), float(np.asarray(ok).mean())

    table = []
    for s in args.coarse:
        acc, succ = measure(s)
        table.append({"scale": s, "acceptance": acc, "device_success": succ})
        print(f"scale {s:.2e}: acceptance {acc:.3f}  success {succ:.3f}",
              flush=True)

    # extend the grid upward until the target acceptance is bracketed — a
    # coarse grid whose largest scale still accepts everything would
    # otherwise silently "tune" to its own edge instead of the knee
    s = max(args.coarse)
    for _ in range(8):
        top = max(table, key=lambda r: r["scale"])
        if top["acceptance"] < args.target:
            break
        s *= 3.0
        acc, succ = measure(s)
        table.append({"scale": s, "acceptance": acc, "device_success": succ})
        print(f"scale {s:.2e}: acceptance {acc:.3f}  success {succ:.3f}"
              " (extend)", flush=True)

    # acceptance decreases monotonically in scale -> bisect on log-scale to
    # the target, bracketing with the coarse grid
    above = [r for r in table if r["acceptance"] >= args.target]
    below = [r for r in table if r["acceptance"] < args.target]
    if above and below:
        lo = max(above, key=lambda r: r["scale"])["scale"]
        hi = min(below, key=lambda r: r["scale"])["scale"]
        for _ in range(args.bisect_iters):
            mid = float(np.sqrt(lo * hi))
            acc, succ = measure(mid)
            table.append(
                {"scale": mid, "acceptance": acc, "device_success": succ}
            )
            print(f"scale {mid:.2e}: acceptance {acc:.3f}  success {succ:.3f}"
                  " (bisect)", flush=True)
            if acc >= args.target:
                lo = mid
            else:
                hi = mid

    best = min(table, key=lambda r: abs(r["acceptance"] - args.target))
    # among scales within 0.1 of target acceptance, prefer highest success
    near = [r for r in table if abs(r["acceptance"] - args.target) < 0.1]
    if near:
        best = max(near, key=lambda r: r["device_success"])
    out = {
        "mcmc": args.mcmc,
        "count": args.count,
        "target_acceptance": args.target,
        "recommended_scale": best["scale"],
        "recommended_acceptance": best["acceptance"],
        "recommended_device_success": best["device_success"],
        "table": sorted(table, key=lambda r: r["scale"]),
    }
    out_path = args.json_out or os.path.join(
        args.results_dir, f"mcmc_tuning_{args.mcmc}.json"
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"recommended step_size_scale: {best['scale']:.3e} "
          f"(acceptance {best['acceptance']:.3f}, "
          f"success {best['device_success']:.3f})", flush=True)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
