"""Render the denoising history of a trained model as a gif with a
satisfaction progress bar.

Capability parity: reference ``ddpm.py:845-904`` (render_success — gif/mp4 of
the reverse chain with a green/red progress bar).

Example:
  python render_history.py --results_dir results/qual_v2 --milestone 6 \
      --num_objects 4 --out renders/denoise.gif
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import argparse
import json

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", default="results/qual_v2")
    p.add_argument("--milestone", type=int, default=6)
    p.add_argument("--num_objects", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from diffusion_ccsp_tpu.diffusion import GaussianDiffusion
    from diffusion_ccsp_tpu.envs.render import render_denoising_gif
    from diffusion_ccsp_tpu.eval.evaluate import satisfied_fn_for_mode
    from diffusion_ccsp_tpu.graphs import stack_graphs
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )
    from diffusion_ccsp_tpu.ops.schedules import DiffusionSchedule
    from diffusion_ccsp_tpu.train.data import MODE_SPECS, mode_samplers

    with open(os.path.join(args.results_dir, "config.json")) as f:
        saved = json.load(f)
    cfg = DiffuserConfig.from_dict(saved["model"])
    model = ConstraintDiffuser(cfg)
    diffusion = GaussianDiffusion(
        model, DiffusionSchedule.create(timesteps=saved["timesteps"])
    )

    import orbax.checkpoint as ocp

    path = os.path.abspath(
        os.path.join(args.results_dir, f"model-{args.milestone}")
    )
    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(path)["params"]

    spec = MODE_SPECS[cfg.input_mode]
    sampler, to_graph = mode_samplers(cfg.input_mode)
    rng = np.random.default_rng(args.seed)
    scene = sampler(
        rng, min_num_objects=args.num_objects, max_num_objects=args.num_objects
    )
    graphs = stack_graphs(
        [to_graph(scene, spec["max_nodes"], spec["max_edges"])]
    )

    out, hist = diffusion.sample(
        params, jax.tree.map(jnp.asarray, graphs), jax.random.PRNGKey(args.seed),
        return_history=True,
    )
    hist = np.asarray(hist)[:, 0]  # [T, N, P]

    sat = satisfied_fn_for_mode(cfg.input_mode)
    graph0 = jax.tree.map(lambda x: x[0], graphs)

    def sat_fn(graph, pose):
        ok, _ = sat(graph, jnp.asarray(pose))
        return bool(ok)

    out_path = args.out or os.path.join(
        args.results_dir, f"denoise_m{args.milestone}_n{args.num_objects}.gif"
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    render_denoising_gif(
        graph0, hist, sat_fn, out_path, input_mode=cfg.input_mode
    )
    final_ok = sat_fn(graph0, np.clip(hist[-1], -1, 1))
    print(f"wrote {out_path} (final satisfied: {final_ok})", flush=True)


if __name__ == "__main__":
    main()
