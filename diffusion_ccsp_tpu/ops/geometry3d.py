"""On-device 3-D geometry for the robot packing mode (yaw-only OBBs).

Capability parity: reference robot-mode collision checking
(``demo_utils.py:887-920`` check_pairwise_collisions — objects at goal poses
plus the floating gripper at the grasp pose, via PyBullet) and containment
(``gin`` constraints). All object and gripper bodies are boxes rotated only
about z, so 3-D collision factorizes exactly into a 2-D rotated-rectangle SAT
on the footprint and a z-interval overlap — fully vectorized on device.

The gripper is the synthetic grasp model of ``envs/robot.py``: a box attached
outside one of the object's 5 graspable faces (x+/x-/y+/y-/z+). The reference
takes grasps from an unavailable external database
(``packing_models`` submodule, SURVEY.md §1); the synthetic model preserves
the capability — grasp-side-aware feasibility — with procedural assets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffusion_ccsp_tpu.ops.geometry2d import convex_overlap, rect_corners

# synthetic Panda-like gripper body: depth beyond the grasped face, and
# cross-section extent (square)
GRIPPER_DEPTH = 0.5
GRIPPER_CROSS = 0.35

# grasp side order of the one-hot (reference get_ont_hot_grasp_side usage in
# data_transforms.py:244-248): x+, x-, y+, y-, z+ (top)
GRASP_SIDES = ("x+", "x-", "y+", "y-", "z+")


def gripper_box_local(extents: jnp.ndarray, grasp_onehot: jnp.ndarray):
    """Gripper OBB in the object's local frame.

    extents [..., 3] (w, l, h), grasp_onehot [..., 5] ->
    (center [..., 3], gdims [..., 3]).
    """
    w, l, h = extents[..., 0], extents[..., 1], extents[..., 2]
    gd, gc = GRIPPER_DEPTH, GRIPPER_CROSS

    # per-side center offsets and gripper dims
    cx = jnp.stack(
        [w / 2 + gd / 2, -(w / 2 + gd / 2), jnp.zeros_like(w),
         jnp.zeros_like(w), jnp.zeros_like(w)], -1
    )
    cy = jnp.stack(
        [jnp.zeros_like(w), jnp.zeros_like(w), l / 2 + gd / 2,
         -(l / 2 + gd / 2), jnp.zeros_like(w)], -1
    )
    # side grasps are top-aligned (the hand closes near the top edge of the
    # face — maximizes clearance over shorter neighbors; z+ grasps center)
    side_cz = h / 2 - gc / 2
    cz = jnp.stack([side_cz] * 4 + [h / 2 + gd / 2], -1)
    dx = jnp.stack([jnp.full_like(w, gd)] * 2 + [jnp.full_like(w, gc)] * 3, -1)
    dy = jnp.stack([jnp.full_like(w, gc)] * 2 + [jnp.full_like(w, gd)] * 2
                   + [jnp.full_like(w, gc)], -1)
    dz = jnp.stack([jnp.full_like(w, gc)] * 4 + [jnp.full_like(w, gd)], -1)

    center = jnp.stack(
        [
            (cx * grasp_onehot).sum(-1),
            (cy * grasp_onehot).sum(-1),
            (cz * grasp_onehot).sum(-1),
        ],
        -1,
    )
    gdims = jnp.stack(
        [
            (dx * grasp_onehot).sum(-1),
            (dy * grasp_onehot).sum(-1),
            (dz * grasp_onehot).sum(-1),
        ],
        -1,
    )
    return center, gdims


def obb_overlap_3d(
    c1, e1, yaw1, c2, e2, yaw2, eps: float = 1e-6
) -> jnp.ndarray:
    """Overlap of yaw-only 3-D OBBs: 2-D SAT on footprints AND z-interval
    overlap. All args batched [..., 3] / [...]."""
    foot = convex_overlap(
        rect_corners(c1[..., :2], e1[..., :2], yaw1),
        rect_corners(c2[..., :2], e2[..., :2], yaw2),
        eps,
    )
    z_lo = jnp.maximum(c1[..., 2] - e1[..., 2] / 2, c2[..., 2] - e2[..., 2] / 2)
    z_hi = jnp.minimum(c1[..., 2] + e1[..., 2] / 2, c2[..., 2] + e2[..., 2] / 2)
    return foot & (z_hi - z_lo > eps)


def robot_scene_from_features(graph, pose_features: jnp.ndarray):
    """Denormalize robot-mode features.

    Layout (reference ``data_transforms.py:203-269`` / ``train_utils.py:267``):
    geom = (w/w0, l/l0, h/h0, w0, l0, h0, x0, y0); grasp = 5-dim one-hot;
    pose = (x/(w0/2), y/(l0/2), z/h0, cs, sn).

    Returns (centers [N,3], extents [N,3], yaw [N], grasp_onehot [N,5],
    container_dims (w0, l0, h0)).
    """
    geom = graph.geom
    w0 = geom[0, 3]
    l0 = geom[0, 4]
    h0 = geom[0, 5]
    extents = jnp.stack(
        [geom[:, 0] * w0, geom[:, 1] * l0, geom[:, 2] * h0], -1
    )
    p = pose_features
    centers = jnp.stack(
        [p[:, 0] * w0 / 2, p[:, 1] * l0 / 2, p[:, 2] * h0], -1
    )
    cs, sn = p[:, 3], p[:, 4]
    nrm = jnp.maximum(jnp.sqrt(cs**2 + sn**2), 1e-9)
    yaw = jnp.arctan2(sn / nrm, cs / nrm)
    return centers, extents, yaw, graph.grasp, (w0, l0, h0)


def _robot_geometry(graph, pose_features: jnp.ndarray):
    """Success check for one robot_box graph.

    gin(i, 0):  object i inside the container volume AND its gripper (at the
                place pose) stays clear of the container walls — the
                grasp-aware containment the reference verifies in PyBullet;
    gfree(i,j): objects i, j and both grippers mutually collision-free
                (reference ``demo_utils.py:887-920``).

    Returns (ok bool, per-edge satisfaction bool[E], named sub-checks dict).
    """
    centers, extents, yaw, grasp, (w0, l0, h0) = robot_scene_from_features(
        graph, pose_features
    )
    n = centers.shape[0]
    tiles = graph.node_mask & ~graph.cond_mask

    # containment: rotated footprint corners inside [-w0/2, w0/2] x [-l0/2, l0/2],
    # z-extent within [0, h0]
    corners = rect_corners(centers[:, :2], extents[:, :2], yaw)  # [N,4,2]
    foot_in = (
        (jnp.abs(corners[..., 0]) <= w0 / 2 + 1e-6)
        & (jnp.abs(corners[..., 1]) <= l0 / 2 + 1e-6)
    ).all(axis=-1)
    z_in = (centers[:, 2] - extents[:, 2] / 2 >= -1e-6) & (
        centers[:, 2] + extents[:, 2] / 2 <= h0 + 1e-6
    )
    obj_in = foot_in & z_in

    # gripper bodies at place poses (rotate local offset by yaw)
    g_center_l, g_dims = gripper_box_local(extents, grasp)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    rot = jnp.stack(
        [jnp.stack([cy, -sy], -1), jnp.stack([sy, cy], -1)], -2
    )  # [N,2,2]
    g_off_xy = jnp.einsum("nij,nj->ni", rot, g_center_l[:, :2])
    g_center = jnp.concatenate(
        [centers[:, :2] + g_off_xy, (centers[:, 2:3] + g_center_l[:, 2:3])], -1
    )

    # gripper vs container walls: top grasps exit through the open top, so a
    # gripper is wall-free iff its footprint stays inside OR it is entirely
    # above the wall height h0
    g_corners = rect_corners(g_center[:, :2], g_dims[:, :2], yaw)
    g_foot_in = (
        (jnp.abs(g_corners[..., 0]) <= w0 / 2 + 1e-6)
        & (jnp.abs(g_corners[..., 1]) <= l0 / 2 + 1e-6)
    ).all(axis=-1)
    g_above = g_center[:, 2] - g_dims[:, 2] / 2 >= h0 - 1e-6
    grip_ok = g_foot_in | g_above

    gin_ok = obj_in & grip_ok

    # pairwise: objects and grippers of distinct objects
    def pair_overlap(c1, e1, c2, e2):
        cc1 = jnp.repeat(c1[:, None], n, 1).reshape(n * n, 3)
        ee1 = jnp.repeat(e1[:, None], n, 1).reshape(n * n, 3)
        yy1 = jnp.repeat(yaw[:, None], n, 1).reshape(n * n)
        cc2 = jnp.repeat(c2[None, :], n, 0).reshape(n * n, 3)
        ee2 = jnp.repeat(e2[None, :], n, 0).reshape(n * n, 3)
        yy2 = jnp.repeat(yaw[None, :], n, 0).reshape(n * n)
        return obb_overlap_3d(cc1, ee1, yy1, cc2, ee2, yy2).reshape(n, n)

    pair_mask = tiles[:, None] & tiles[None, :] & ~jnp.eye(n, dtype=bool)
    oo = pair_overlap(centers, extents, centers, extents) & pair_mask
    go = pair_overlap(g_center, g_dims, centers, extents) & pair_mask
    gg = pair_overlap(g_center, g_dims, g_center, g_dims) & pair_mask
    pair_free = ~(oo | go | go.T | gg)

    a = graph.edges[:, 0]
    b = graph.edges[:, 1]
    per_type = jnp.stack(
        [
            gin_ok[a],  # gin
            pair_free[a, b],  # gfree
        ],
        axis=-1,
    )
    sat = jnp.take_along_axis(
        per_type, jnp.minimum(graph.edge_type, 1)[:, None], axis=-1
    )[:, 0]
    sat = sat | ~graph.edge_mask
    ok = sat.all() & ~(oo.any())
    subchecks = {
        # named sub-verdicts for the failure breakdown (VERDICT r2 item 7:
        # the blanket 'geometry' bucket hid which device check the model
        # actually fails)
        "obj_containment": (obj_in | ~tiles).all(),
        "gripper_wall": (grip_ok | ~tiles).all(),
        "obj_obj_overlap": ~oo.any(),
        "gripper_obj_overlap": ~(go | go.T).any(),
        "gripper_gripper_overlap": ~gg.any(),
    }
    return ok, sat, subchecks


def robot_graph_satisfied(graph, pose_features: jnp.ndarray):
    """Success check for one robot_box graph (see ``_robot_geometry``).

    Returns (ok bool, per-edge satisfaction bool[E]).
    """
    ok, sat, _ = _robot_geometry(graph, pose_features)
    return ok, sat


def robot_geometry_breakdown(graph, pose_features: jnp.ndarray):
    """Named sub-check verdicts (each True = that check passes)."""
    _, _, subchecks = _robot_geometry(graph, pose_features)
    return subchecks


batched_robot_satisfied = jax.vmap(robot_graph_satisfied, in_axes=(0, 0))
batched_robot_breakdown = jax.vmap(robot_geometry_breakdown, in_axes=(0, 0))


def robot_qualitative_graph_satisfied(graph, pose_features: jnp.ndarray):
    """Composed success check (reference ``ddpm.py:704-711``): the robot
    (gin/gfree) constraints hold in 3-D AND every qualitative edge holds on
    the 2-D footprint scene. Edge types 0-1 are robot, 2+ index the
    qualitative vocabulary."""
    from diffusion_ccsp_tpu.ops.geometry2d import (
        Scene2D,
        check_qualitative_edges,
    )

    is_robot = graph.edge_type < 2
    robot_graph = graph.replace(edge_mask=graph.edge_mask & is_robot)
    ok_robot, sat_robot = robot_graph_satisfied(robot_graph, pose_features)

    centers, extents, yaw, _, (w0, l0, h0) = robot_scene_from_features(
        graph, pose_features
    )
    scene2d = Scene2D(
        center=centers[:, :2],
        extents=extents[:, :2],
        yaw=yaw,
        node_mask=graph.node_mask & ~graph.cond_mask,
        world_dims=jnp.stack([w0, l0]),
    )
    sat_qual = check_qualitative_edges(
        scene2d,
        graph.edges,
        jnp.maximum(graph.edge_type - 2, 0),
        graph.edge_mask & ~is_robot,
    )
    sat = jnp.where(is_robot, sat_robot, sat_qual)
    return ok_robot & sat_qual.all(), sat


batched_robot_qualitative_satisfied = jax.vmap(
    robot_qualitative_graph_satisfied, in_axes=(0, 0)
)
