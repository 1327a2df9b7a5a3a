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


def composed_energy_grid(model, params, graph_single, t: int, node: int,
                         grid: int = 41):
    """Energy field of a node under ALL of its constraint edges at once (the
    factor-graph sum — reference ``composed_energy_fn``,
    ``visualize_energy.py:434-462``)."""
    return energy_grid(model, params, graph_single, t, node, grid)


def ula_over_field(model, params, graph_single, t: int, node: int,
                   key, n_chains: int = 64, n_steps: int = 80,
                   step_size: float = 4e-3):
    """Run ULA on the summed constraint energy over the node's (x, y) —
    the reference's composed-constraint sampling diagnostic
    (``visualize_energy.py:561-578``). Returns [n_steps+1, n_chains, 2]."""
    import jax
    import jax.numpy as jnp

    base = jnp.asarray(graph_single.pose)

    def energy_of(xy):
        pose = base.at[node, 0].set(xy[0]).at[node, 1].set(xy[1])
        return model.apply(
            params, pose, graph_single, jnp.asarray(t), return_energy=True
        )

    grad_fn = jax.vmap(jax.grad(energy_of))

    def body(carry, k):
        x, = carry
        noise = jax.random.normal(k, x.shape) * np.sqrt(2 * step_size)
        x = x - grad_fn(x) * step_size + noise
        x = jnp.clip(x, -1.0, 1.0)
        return (x,), x

    k0, k_scan = jax.random.split(key)
    x0 = jax.random.uniform(k0, (n_chains, 2), minval=-1.0, maxval=1.0)
    keys = jax.random.split(k_scan, n_steps)
    (xf,), traj = jax.lax.scan(body, (x0,), keys)
    return np.concatenate([np.asarray(x0)[None], np.asarray(traj)], axis=0)


def plot_composed_field(xs, ys, energies, traj, png_name, title=""):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 5))
    c = ax.contourf(xs, ys, energies, levels=30, cmap="viridis")
    fig.colorbar(c, ax=ax)
    ax.plot(traj[0, :, 0], traj[0, :, 1], ".", color="#cccccc", ms=3,
            label="init")
    ax.plot(traj[-1, :, 0], traj[-1, :, 1], ".", color="red", ms=4,
            label="ULA samples")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_title(title)
    ax.set_aspect("equal")
    fig.savefig(png_name, dpi=100, bbox_inches="tight")
    plt.close(fig)


def write_gallery(out_dir: str, pngs: list, title: str):
    """Minimal HTML gallery (reference writes HTML galleries of the fields,
    ``visualize_energy.py:93-131``)."""
    rows = "\n".join(
        f'<div style="display:inline-block;margin:4px;text-align:center">'
        f'<img src="{os.path.basename(p)}" width="320"><br>'
        f"{os.path.basename(p)}</div>"
        for p in pngs
    )
    html = f"<html><body><h2>{title}</h2>\n{rows}\n</body></html>"
    path = os.path.join(out_dir, "index.html")
    with open(path, "w") as f:
        f.write(html)
    return path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", default="results/qual_v1")
    p.add_argument("--milestone", type=int, default=1)
    p.add_argument("--constraint", default="left-of")
    p.add_argument("--t", type=int, default=100)
    p.add_argument("--node", type=int, default=1)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--all_constraints", action="store_true",
                   help="one field per constraint in the vocabulary + an "
                        "HTML gallery (reference per-constraint grids)")
    p.add_argument("--composed", default=None,
                   help="comma-separated constraints all applied to the probe "
                        "node (vs two anchors); plots the summed energy field "
                        "and ULA samples over it (reference composed_energy_fn"
                        ", visualize_energy.py:434-462,561-578)")
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
    # the dense one-hot edge bank is the only strategy that composes with
    # vmap-over-pose-grid + grad (ragged_dot cannot vmap over a non-leading
    # dim); on a 4-node probe graph the O(K) dense path is trivially cheap
    model_dict = dict(saved["model"])
    model_dict["matmul_strategy"] = "dense"
    model_dict["use_pallas"] = False
    cfg = DiffuserConfig.from_dict(model_dict)
    model = ConstraintDiffuser(cfg)

    import orbax.checkpoint as ocp

    path = os.path.abspath(
        os.path.join(args.results_dir, f"model-{args.milestone}")
    )
    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(path)["params"]

    out_dir = args.out_dir or os.path.join(args.results_dir, "energy_fields")
    os.makedirs(out_dir, exist_ok=True)

    def probe_graph(constraints):
        """Probe scene: node 1 is the free tile; nodes 2-3 are anchors."""
        return build_graph(
            geom=[[1.0, 1.0], [0.15, 0.15], [0.15, 0.15], [0.15, 0.15]],
            pose=[[0, 0, 0, 0], [0, 0, 1, 0], [0.5, 0.0, 1, 0],
                  [-0.5, 0.3, 1, 0]],
            constraints=constraints,
            input_mode=cfg.input_mode,
            max_nodes=4,
            max_edges=8,
            world_dims=(3.0, 2.0),
        )

    pngs = []

    if args.composed:
        names = [c.strip() for c in args.composed.split(",")]
        anchors = [2, 3]
        constraints = [
            (c, args.node, anchors[i % len(anchors)])
            for i, c in enumerate(names)
        ]
        graph = probe_graph(constraints)
        xs, ys, e, g = composed_energy_grid(
            model, params, graph, args.t, args.node
        )
        traj = ula_over_field(
            model, params, graph, args.t, args.node,
            jax.random.PRNGKey(args.seed),
        )
        png = os.path.join(
            out_dir, f"composed_{'+'.join(names)}_t={args.t}.png"
        )
        plot_composed_field(
            xs, ys, e, traj, png,
            title=f"composed {'+'.join(names)} @ t={args.t} (ULA samples)",
        )
        pngs.append(png)
        print("wrote", png, flush=True)
    elif args.all_constraints:
        from diffusion_ccsp_tpu.constraints import constraint_set_for_mode

        vocab = [
            c for c in constraint_set_for_mode(cfg.input_mode)
            if c not in ("in",)
        ]
        for name in vocab:
            graph = probe_graph([(name, args.node, 2)])
            xs, ys, e, g = energy_grid(
                model, params, graph, args.t, args.node
            )
            png = os.path.join(
                out_dir, f"{name}_t={args.t}_node={args.node}.png"
            )
            plot_energy_field(
                xs, ys, e, g, png,
                title=f"{name} energy at t={args.t}",
            )
            pngs.append(png)
            print("wrote", png, flush=True)
    else:
        graph = probe_graph([(args.constraint, args.node, 2)])
        xs, ys, e, g = energy_grid(model, params, graph, args.t, args.node)
        png = os.path.join(
            out_dir, f"{args.constraint}_t={args.t}_node={args.node}.png"
        )
        plot_energy_field(
            xs, ys, e, g, png,
            title=f"{args.constraint} energy at t={args.t} (node {args.node})",
        )
        pngs.append(png)
        print("wrote", png, flush=True)

    gallery = write_gallery(
        out_dir, sorted(set(pngs)),
        f"{os.path.basename(args.results_dir)} energy fields "
        f"(milestone {args.milestone})",
    )
    print("gallery:", gallery, flush=True)


if __name__ == "__main__":
    main()
