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


def _rejection_place_robot(graph: ConstraintGraph, key: jax.Array,
                           budget: int):
    """Sequential rejection placement for robot_box graphs (reference
    ``demo_utils.py:1326-1330,1484-1499``: uniform (x, y, yaw) in the tray,
    z resting on the floor, goal-pose pairwise collision check). Grippers are
    ignored during placement, exactly like the reference baseline; the final
    success verdict re-checks the full grasp-aware oracle."""
    n = graph.max_nodes
    geom = graph.geom
    w0, l0, h0 = geom[0, 3], geom[0, 4], geom[0, 5]
    extents = jnp.stack(
        [geom[:, 0] * w0, geom[:, 1] * l0, geom[:, 2] * h0], -1
    )  # [N, 3]

    def place_one(carry, i):
        centers, yaws, placed_mask, key = carry
        key, k_xy, k_rot = jax.random.split(key, 3)
        xy = jax.random.uniform(k_xy, (budget, 2), minval=-0.5, maxval=0.5)
        xy = xy * jnp.stack([w0, l0])
        # yaw in {0, pi/2} with equal probability — the reference's rotation
        # set for robot_box (``sample_pose_in_tray``, demo_utils.py:1495-1498)
        yaw = jnp.where(
            jax.random.bernoulli(k_rot, 0.5, (budget,)), jnp.pi / 2, 0.0
        )
        z = extents[i, 2] / 2.0  # rest on the tray floor

        cand_corners = rect_corners(
            xy, jnp.broadcast_to(extents[i, :2], (budget, 2)), yaw
        )
        placed_corners = rect_corners(centers[:, :2], extents[:, :2], yaws)
        cc = jnp.repeat(cand_corners[:, None], n, 1).reshape(budget * n, 4, 2)
        pc = jnp.broadcast_to(placed_corners[None], (budget, n, 4, 2)).reshape(
            budget * n, 4, 2
        )
        foot_hit = convex_overlap(cc, pc).reshape(budget, n)
        # z-interval overlap with each placed box
        z_lo, z_hi = z - extents[i, 2] / 2, z + extents[i, 2] / 2
        p_lo = centers[:, 2] - extents[:, 2] / 2
        p_hi = centers[:, 2] + extents[:, 2] / 2
        z_hit = (z_lo < p_hi - 1e-9) & (z_hi > p_lo + 1e-9)  # [N]
        hit = (foot_hit & z_hit[None, :] & placed_mask[None, :]).any(axis=1)

        # containment: rotated footprint inside the tray
        foot_in = (
            (jnp.abs(cand_corners[..., 0]) <= w0 / 2)
            & (jnp.abs(cand_corners[..., 1]) <= l0 / 2)
        ).all(axis=-1)

        feasible = ~hit & foot_in
        pick = jnp.argmax(feasible)
        found = feasible.any()
        is_obj = graph.node_mask[i] & ~graph.cond_mask[i]
        new_center = jnp.concatenate(
            [jnp.where(found, xy[pick], xy[0]), z[None]]
        )
        centers = centers.at[i].set(
            jnp.where(is_obj, new_center, centers[i])
        )
        yaws = yaws.at[i].set(jnp.where(is_obj, yaw[pick], yaws[i]))
        placed_mask = placed_mask.at[i].set(placed_mask[i] | is_obj)
        return (centers, yaws, placed_mask, key), found | ~is_obj

    centers0 = jnp.zeros((n, 3))
    yaws0 = jnp.zeros((n,))
    (centers, yaws, _, _), placed_ok = jax.lax.scan(
        place_one, (centers0, yaws0, jnp.zeros(n, bool), key), jnp.arange(n)
    )
    pose = jnp.stack(
        [
            centers[:, 0] / (w0 / 2),
            centers[:, 1] / (l0 / 2),
            centers[:, 2] / h0,
            jnp.cos(yaws),
            jnp.sin(yaws),
        ],
        -1,
    )
    pose = jnp.where(graph.cond_mask[:, None], graph.pose, pose)
    return pose, placed_ok.all()


def make_robot_rejection_solver(budget: int = 50):
    """Batched jitted robot_box rejection solver; success = the same
    grasp-aware device oracle the learned model is scored with (stricter than
    the reference baseline's placed-means-success accounting — comparable
    numbers require the same verdict)."""
    from diffusion_ccsp_tpu.ops.geometry3d import robot_graph_satisfied

    def single(graph, key):
        pose, placed = _rejection_place_robot(graph, key, budget)
        ok, _ = robot_graph_satisfied(graph, pose)
        return ok & placed, pose

    return jax.jit(jax.vmap(single, in_axes=(0, 0)))


def _rejection_place_stability(graph: ConstraintGraph, key: jax.Array,
                               budget: int):
    """Sequential rejection placement for stability_flat graphs (reference
    ``demo_utils.py:1331-1336``: uniform pose in the vertical shelf, yaw in
    {0, pi/2} via extent swap, collision check against placed tiles)."""
    n = graph.max_nodes
    w = graph.world_dims[0]
    l = graph.world_dims[1]
    extents = graph.geom[:, :2] * jnp.stack([w, l])

    def place_one(carry, i):
        centers, swaps, placed_mask, key = carry
        key, k_xy, k_sw = jax.random.split(key, 3)
        swap = jax.random.bernoulli(k_sw, 0.5, (budget,))
        ext = jnp.where(
            swap[:, None], extents[i, ::-1], extents[i]
        )  # [budget, 2]
        lim = jnp.maximum(
            jnp.stack([w, l]) / 2 - ext / 2, 0.0
        )
        xy = jax.random.uniform(k_xy, (budget, 2), minval=-1.0, maxval=1.0)
        xy = xy * lim

        cand_corners = rect_corners(xy, ext, jnp.zeros(budget))
        placed_ext = jnp.where(
            swaps[:, None], extents[:, ::-1], extents
        )
        placed_corners = rect_corners(centers, placed_ext, jnp.zeros(n))
        cc = jnp.repeat(cand_corners[:, None], n, 1).reshape(budget * n, 4, 2)
        pc = jnp.broadcast_to(placed_corners[None], (budget, n, 4, 2)).reshape(
            budget * n, 4, 2
        )
        hit = convex_overlap(cc, pc).reshape(budget, n)
        hit = (hit & placed_mask[None, :]).any(axis=1)

        feasible = ~hit
        pick = jnp.argmax(feasible)
        found = feasible.any()
        is_tile = graph.node_mask[i] & ~graph.cond_mask[i]
        centers = centers.at[i].set(
            jnp.where(is_tile, xy[pick], centers[i])
        )
        swaps = swaps.at[i].set(jnp.where(is_tile, swap[pick], swaps[i]))
        placed_mask = placed_mask.at[i].set(placed_mask[i] | is_tile)
        return (centers, swaps, placed_mask, key), found | ~is_tile

    centers0 = jnp.zeros((n, 2))
    swaps0 = jnp.zeros((n,), bool)
    (centers, swaps, _, _), placed_ok = jax.lax.scan(
        place_one, (centers0, swaps0, jnp.zeros(n, bool), key), jnp.arange(n)
    )
    # yaw pi/2 encodes the extent swap: pose = (x, y, cs, sn)
    cs = jnp.where(swaps, 0.0, 1.0)
    sn = jnp.where(swaps, 1.0, 0.0)
    pose = jnp.stack(
        [centers[:, 0] / (w / 2), centers[:, 1] / (l / 2), cs, sn], -1
    )
    pose = jnp.where(graph.cond_mask[:, None], graph.pose, pose)
    return pose, placed_ok.all()


def make_stability_rejection_solver(budget: int = 50):
    """Batched jitted stability_flat rejection solver; success = the mode's
    geometric device oracle (given support edges must hold — random placement
    must realize the declared structure, same verdict as the learned model)."""
    from diffusion_ccsp_tpu.ops.geometry2d import (
        stability_graph_satisfied_geometric,
    )

    def single(graph, key):
        pose, placed = _rejection_place_stability(graph, key, budget)
        ok, _ = stability_graph_satisfied_geometric(graph, pose)
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
    elif "robot" in input_mode:
        solver = make_robot_rejection_solver(budget)
    elif "stability" in input_mode:
        solver = make_stability_rejection_solver(budget)
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
