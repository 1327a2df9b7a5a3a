"""Rejection-sampling baseline: sequential per-object uniform pose sampling.

Capability parity: reference ``solve_csp_rejection.py`` +
``demo_utils.py:1322-1465`` (rejection_sample_given_solution_json /
sample_pose_in_tray): objects are placed one at a time; each object draws up
to ``budget`` uniform poses until it is collision-free w.r.t. the already
placed objects and inside the tray; after all objects are placed the full
constraint set is checked.

TPU-native: the whole procedure is one jitted computation — a static scan
over node slots with a fixed ``budget``-draw inner loop per object (first
feasible draw wins via argmax on the feasibility mask), vmapped over the
problem batch. The reference loops in Python with one FCL world per attempt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffusion_ccsp_tpu.graphs import ConstraintGraph
from diffusion_ccsp_tpu.ops.geometry2d import (
    qualitative_graph_satisfied,
    rect_corners,
    convex_overlap,
    tray_wall_rects,
)


def _rejection_place_single(graph: ConstraintGraph, key: jax.Array, budget: int):
    """Place all tiles of one qualitative graph sequentially. Returns pose
    features [N, P] (cs=1, sn=0: the baseline samples positions only, like
    ``sample_pose_in_tray`` which draws (x, y) uniform in the tray)."""
    n = graph.max_nodes
    w = graph.world_dims[0]
    l = graph.world_dims[1]
    extents = graph.geom[:, :2] * jnp.stack([w, l])  # true tile sizes

    wall_c, wall_e = tray_wall_rects(graph.world_dims)
    wall_corners = rect_corners(wall_c, wall_e, jnp.zeros(wall_c.shape[:-1]))

    def place_one(carry, i):
        centers, placed_mask, key = carry
        key, sub = jax.random.split(key)
        # budget candidate centers, uniform in the tray
        cand = jax.random.uniform(sub, (budget, 2), minval=-0.5, maxval=0.5)
        cand = cand * jnp.stack([w, l])
        my_ext = jnp.broadcast_to(extents[i], (budget, 2))
        cand_corners = rect_corners(cand, my_ext, jnp.zeros(budget))  # [B,4,2]

        # collision with already-placed tiles
        placed_corners = rect_corners(
            centers, extents, jnp.zeros(n)
        )  # [N, 4, 2]
        cc = jnp.repeat(cand_corners[:, None], n, 1).reshape(budget * n, 4, 2)
        pc = jnp.broadcast_to(placed_corners[None], (budget, n, 4, 2)).reshape(
            budget * n, 4, 2
        )
        hit = convex_overlap(cc, pc).reshape(budget, n)
        hit = (hit & placed_mask[None, :]).any(axis=1)  # [budget]

        # wall overlap (containment)
        wc = jnp.broadcast_to(wall_corners[None], (budget, 4, 4, 2)).reshape(
            budget * 4, 4, 2
        )
        cc4 = jnp.repeat(cand_corners[:, None], 4, 1).reshape(budget * 4, 4, 2)
        wall_hit = convex_overlap(cc4, wc).reshape(budget, 4).any(axis=1)

        feasible = ~hit & ~wall_hit
        pick = jnp.argmax(feasible)  # first feasible (argmax of bool)
        found = feasible.any()
        new_center = jnp.where(found, cand[pick], cand[0])

        is_tile = graph.node_mask[i] & ~graph.cond_mask[i]
        centers = centers.at[i].set(jnp.where(is_tile, new_center, centers[i]))
        placed_mask = placed_mask.at[i].set(placed_mask[i] | is_tile)
        return (centers, placed_mask, key), found | ~is_tile

    centers0 = jnp.zeros((n, 2))
    # nothing is an obstacle initially: the container is the tray itself
    # (containment is enforced through the walls), padded slots are ignored
    placed0 = jnp.zeros((n,), bool)
    (centers, _, _), placed_ok = jax.lax.scan(
        place_one, (centers0, placed0, key), jnp.arange(n)
    )

    pose = jnp.concatenate(
        [
            centers / jnp.stack([w / 2, l / 2]),
            jnp.ones((n, 1)),  # cs
            jnp.zeros((n, 1)),  # sn
        ],
        axis=-1,
    )
    pose = jnp.where(graph.cond_mask[:, None], graph.pose, pose)
    return pose, placed_ok.all()


def make_rejection_solver(budget: int = 50):
    """Batched jitted qualitative rejection solver.

    Returns fn(graphs, key) -> (ok [B], poses [B, N, P]).
    """

    def single(graph, key):
        pose, placed = _rejection_place_single(graph, key, budget)
        ok, _ = qualitative_graph_satisfied(graph, pose)
        return ok & placed, pose

    return jax.jit(jax.vmap(single, in_axes=(0, 0)))


def _rejection_place_triangles(graph: ConstraintGraph, key: jax.Array,
                               budget: int):
    """Sequential rejection placement for triangle-mode graphs: per object,
    draw up to ``budget`` uniform (x, y, yaw) candidates until the rotated
    triangle avoids all placed triangles and the tray walls (reference
    ``demo_utils.py:1322-1465`` rotates triangle vertices per draw)."""
    from diffusion_ccsp_tpu.ops.geometry2d import (
        polygons_hit_walls,
        triangle_vertices_from_features,
    )

    n = graph.max_nodes
    w = graph.world_dims[0]
    l = graph.world_dims[1]

    def tri_of(pose_row, i):
        pose = jnp.zeros((1, 4)).at[0].set(pose_row)
        geom = graph.geom[i][None]
        return triangle_vertices_from_features(geom, pose, graph.world_dims)[0]

    def place_one(carry, i):
        poses, placed_tris, placed_mask, key = carry
        key, k_xy, k_rot = jax.random.split(key, 3)
        xy = jax.random.uniform(k_xy, (budget, 2), minval=-1.0, maxval=1.0)
        yaw = jax.random.uniform(k_rot, (budget,), minval=-jnp.pi, maxval=jnp.pi)
        cand_pose = jnp.stack(
            [xy[:, 0], xy[:, 1], jnp.cos(yaw), jnp.sin(yaw)], -1
        )  # [budget, 4]

        cand_tris = jax.vmap(lambda p: tri_of(p, i))(cand_pose)  # [budget,3,2]
        # vs placed triangles
        cc = jnp.repeat(cand_tris[:, None], n, 1).reshape(budget * n, 3, 2)
        pp = jnp.broadcast_to(placed_tris[None], (budget, n, 3, 2)).reshape(
            budget * n, 3, 2
        )
        hit = convex_overlap(cc, pp).reshape(budget, n)
        hit = (hit & placed_mask[None, :]).any(axis=1)
        wall_hit = jax.vmap(
            lambda t: polygons_hit_walls(
                t[None], jnp.ones(1, bool), graph.world_dims
            )[0]
        )(cand_tris)

        feasible = ~hit & ~wall_hit
        pick = jnp.argmax(feasible)
        found = feasible.any()
        is_tile = graph.node_mask[i] & ~graph.cond_mask[i]
        new_pose = jnp.where(found, cand_pose[pick], cand_pose[0])
        poses = poses.at[i].set(jnp.where(is_tile, new_pose, poses[i]))
        placed_tris = placed_tris.at[i].set(
            jnp.where(is_tile, cand_tris[pick], placed_tris[i])
        )
        placed_mask = placed_mask.at[i].set(placed_mask[i] | is_tile)
        return (poses, placed_tris, placed_mask, key), found | ~is_tile

    poses0 = jnp.where(
        graph.cond_mask[:, None], graph.pose, jnp.zeros((n, 4))
    )
    tris0 = jnp.zeros((n, 3, 2))
    (poses, _, _, key), placed_ok = jax.lax.scan(
        place_one, (poses0, tris0, jnp.zeros(n, bool), key), jnp.arange(n)
    )
    return poses, placed_ok.all()


def make_triangle_rejection_solver(budget: int = 50):
    """Batched jitted triangle-mode rejection solver."""
    from diffusion_ccsp_tpu.ops.geometry2d import (
        diffuse_pairwise_graph_satisfied,
    )

    def single(graph, key):
        pose, placed = _rejection_place_triangles(graph, key, budget)
        ok, _ = diffuse_pairwise_graph_satisfied(graph, pose)
        return ok & placed, pose

    return jax.jit(jax.vmap(single, in_axes=(0, 0)))


def rejection_baseline(
    graphs: ConstraintGraph, key: jax.Array, tries: int = 10, budget: int = 50,
    input_mode: str = "qualitative",
):
    """Run the baseline with k restart rounds (reference loops tries x 10,
    ``demo_utils.py:1275-1320``). Returns success bool[B, tries]."""
    import numpy as np

    if "diffuse_pairwise" in input_mode:
        solver = make_triangle_rejection_solver(budget)
    else:
        solver = make_rejection_solver(budget)
    b = graphs.batch_shape[0]
    out = np.zeros((b, tries), bool)
    for k in range(tries):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, b)
        ok, _ = solver(graphs, keys)
        out[:, k] = np.asarray(ok)
    return out
