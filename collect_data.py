"""Procedural dataset collection CLI for all task families.

Capability parity: reference ``envs/data_collectors.py:184-269`` (argparse
collector with object-count balancing) and the numbered data scripts
(``3-panda-box-data.py``, ``5-panda-stability-data.py``). One command per
input mode; scenes are verified by construction (BSP / equilibrium / grasp
feasibility) instead of post-hoc simulation filtering.

Examples:
  python collect_data.py --input_mode qualitative --num 30000
  python collect_data.py --input_mode stability_flat --num 5000
  python collect_data.py --input_mode robot_box --num 5000 --stats
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_mode", default="qualitative",
                   choices=["qualitative", "diffuse_pairwise",
                            "stability_flat", "robot_box",
                            "robot_qualitative"])
    p.add_argument("--num", type=int, default=10_000)
    p.add_argument("--min_objects", type=int, default=None)
    p.add_argument("--max_objects", type=int, default=None)
    p.add_argument("--max_nodes", type=int, default=8)
    p.add_argument("--max_edges", type=int, default=64)
    p.add_argument("--data_dir", default="data")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--stats", action="store_true",
                   help="print dataset statistics after collection")
    p.add_argument("--render", type=int, default=0,
                   help="save N example scene renders")
    p.add_argument("--collage", type=int, default=0,
                   help="save a dataset-monitor collage of N scenes "
                        "(reference envs/robot_data_monitor.py)")
    return p.parse_args(argv)


def _mode_tools(mode):
    """(sampler, to_graph, default counts) from the central MODE_SPECS
    registry (train/data.py)."""
    from diffusion_ccsp_tpu.train.data import MODE_SPECS, mode_samplers

    sampler, to_graph = mode_samplers(mode)
    return sampler, to_graph, MODE_SPECS[mode]["counts"]


def collect(args) -> str:
    from diffusion_ccsp_tpu.train.data import _FIELDS

    sampler, to_graph, (lo, hi) = _mode_tools(args.input_mode)
    lo = args.min_objects if args.min_objects is not None else lo
    hi = args.max_objects if args.max_objects is not None else hi

    rng = np.random.default_rng(args.seed)
    counts = list(range(lo, hi + 1))
    graphs = []
    t0 = time.time()
    for i in range(args.num):
        c = counts[i % len(counts)]  # object-count balancing
        scene = sampler(rng, min_num_objects=c, max_num_objects=c)
        graphs.append(to_graph(scene, args.max_nodes, args.max_edges))
        if (i + 1) % 5000 == 0:
            rate = (i + 1) / (time.time() - t0)
            print(f"{i+1}/{args.num} scenes ({rate:.0f}/s)", flush=True)

    stacked = {
        f: np.stack([np.asarray(getattr(g, f)) for g in graphs])
        for f in _FIELDS
    }
    os.makedirs(args.data_dir, exist_ok=True)
    path = os.path.join(
        args.data_dir, f"{args.input_mode}({args.num})_train.npz"
    )
    np.savez_compressed(path, input_mode=args.input_mode, **stacked)
    print("wrote", path, flush=True)

    if args.stats:
        print_stats(stacked, args.input_mode)
    if args.render:
        from diffusion_ccsp_tpu.envs.render import render_graph
        from diffusion_ccsp_tpu.train.data import arrays_to_graphs
        import jax

        out_dir = os.path.join(args.data_dir, f"{args.input_mode}_renders")
        os.makedirs(out_dir, exist_ok=True)
        gs = arrays_to_graphs(stacked)
        for k in range(min(args.render, args.num)):
            g = jax.tree.map(lambda x: x[k], gs)
            render_graph(
                g, input_mode=args.input_mode,
                png_name=os.path.join(out_dir, f"scene_{k}.png"),
            )
        print("renders in", out_dir, flush=True)
    if args.collage:
        from diffusion_ccsp_tpu.envs.render import render_graph, save_collage
        from diffusion_ccsp_tpu.train.data import arrays_to_graphs
        import jax

        gs = arrays_to_graphs(stacked)
        n = min(args.collage, args.num)
        imgs, titles = [], []
        for k in range(n):
            g = jax.tree.map(lambda x: x[k], gs)
            imgs.append(render_graph(g, input_mode=args.input_mode, array=True))
            titles.append(f"n={int(np.asarray(g.node_mask).sum()) - 1}")
        collage_png = os.path.join(
            args.data_dir, f"{args.input_mode}_collage.png"
        )
        save_collage(imgs, collage_png, titles=titles)
        print("collage at", collage_png, flush=True)
    return path


def print_stats(stacked: dict, input_mode: str):
    """Dataset statistics (reference ``datasets.py:134-334`` visualize/
    check_data_distribution)."""
    from diffusion_ccsp_tpu.constraints import constraint_set_for_mode

    vocab = constraint_set_for_mode(input_mode)
    nodes = stacked["node_mask"].sum(axis=1) - stacked["cond_mask"].sum(axis=1)
    print("\nobject-count distribution:")
    for c in sorted(set(nodes.tolist())):
        print(f"  {int(c)} objects: {(nodes == c).sum()}")
    print("constraint-type histogram:")
    et = stacked["edge_type"][stacked["edge_mask"]]
    for k, name in enumerate(vocab):
        print(f"  {name:14s} {(et == k).sum()}")
    print("edges per graph: mean "
          f"{stacked['edge_mask'].sum(axis=1).mean():.1f}, "
          f"max {stacked['edge_mask'].sum(axis=1).max()}")


if __name__ == "__main__":
    collect(get_args())
