"""Robot 3-D packing worlds (robot_box mode): procedural box assets with
grasp-side selection.

Capability parity: reference ``envs/robot_worlds.py`` (TableToBoxWorld:
random container, 3-D assets fitted into BSP regions with fitted yaw) and
``3-panda-box-data.py`` (grasp-feasible placement data). The reference pulls
assets and a grasp database from the unavailable ``packing_models`` submodule
(SURVEY.md §1 'external dependencies'); here assets are procedural cuboids
and grasps are the 5-sided synthetic model of ``ops/geometry3d.py`` —
capability (grasp-aware packing constraints) preserved without external data.

A scene: a container (w0 x l0 footprint, wall height h0, open top), boxes
resting on the floor in BSP regions, each with a grasp side chosen so the
gripper at the *place pose* collides with nothing (the data-level counterpart
of the reference's exist_cfree_ik filter, ``demo_utils.py:607-640``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from diffusion_ccsp_tpu.envs.builders import sample_tray_splitting, shrink_regions
from diffusion_ccsp_tpu.graphs import ConstraintGraph, build_graph, stack_graphs
from diffusion_ccsp_tpu.ops.geometry3d import (
    GRASP_SIDES,
    GRIPPER_CROSS,
    GRIPPER_DEPTH,
)


@dataclasses.dataclass
class RobotScene:
    container: tuple[float, float, float]  # (w0, l0, h0)
    centers: np.ndarray  # [n, 3]
    extents: np.ndarray  # [n, 3]
    yaws: np.ndarray  # [n]
    grasp_sides: list  # [n] index into GRASP_SIDES

    @property
    def num_objects(self) -> int:
        return len(self.centers)


#: world->local grasp-side index map for yaw = pi/2 (rotating the local
#: frame ccw by pi/2 sends local x+ to world y+, local y- to world x+, ...)
_SIDE_LOCAL_FOR_QUARTER_TURN = {0: 3, 1: 2, 2: 0, 3: 1, 4: 4}


def _gripper_aabb(center, extent, side):
    """Axis-aligned gripper box for yaw=0 objects. Side grasps are
    top-aligned (match ``ops/geometry3d.gripper_box_local``)."""
    gd, gc = GRIPPER_DEPTH, GRIPPER_CROSS
    cx, cy, cz = center
    w, l, h = extent
    sz = cz + h / 2 - gc / 2  # top-aligned side-grasp height
    if side == 0:  # x+
        return (cx + w / 2 + gd / 2, cy, sz), (gd, gc, gc)
    if side == 1:  # x-
        return (cx - w / 2 - gd / 2, cy, sz), (gd, gc, gc)
    if side == 2:  # y+
        return (cx, cy + l / 2 + gd / 2, sz), (gc, gd, gc)
    if side == 3:  # y-
        return (cx, cy - l / 2 - gd / 2, sz), (gc, gd, gc)
    return (cx, cy, cz + h / 2 + gd / 2), (gc, gc, gd)  # z+


def _aabbs_overlap(c1, e1, c2, e2, eps=1e-6):
    return all(
        abs(c1[k] - c2[k]) < (e1[k] + e2[k]) / 2 - eps for k in range(3)
    )


def sample_robot_scene(
    rng: np.random.Generator,
    w0: float = 3.0,
    l0: float = 2.0,
    h0: float = 1.0,
    min_num_objects: int = 3,
    max_num_objects: int = 6,
    max_attempts: int = 100,
    yaw_prob: float = 0.5,
    stack_prob: float = 0.3,
) -> RobotScene:
    """BSP-split the container footprint, drop a box in each region, then
    pick a collision-free grasp side per object (retry the scene if some
    object admits no feasible grasp).

    Fitted yaw (reference ``envs/robot_worlds.py:60-100``: assets are fitted
    into regions with orientation options): with prob ``yaw_prob`` a box is
    stored with its footprint transposed and yaw = pi/2 — the *world* scene is
    identical but the object's local frame is rotated, so the model must
    produce non-zero rotations. With prob ``stack_prob`` the scene is a
    two/three-layer packing from the 3-D splitting sampler (reference
    ``envs/builders.py:79-279``).
    """
    want_stacked = rng.random() < stack_prob
    for attempt in range(max_attempts):
        # sticky stacking intent: a failed stacked attempt retries stacked
        # (up to half the budget) instead of re-rolling, so the delivered
        # stacked fraction tracks ``stack_prob``
        stacked = want_stacked and attempt < max_attempts // 2
        n_bottom = (
            max(min_num_objects - 1, 2) if stacked else min_num_objects
        )
        regions = sample_tray_splitting(
            rng, w0, l0, min_num_regions=n_bottom,
            max_num_regions=max_num_objects - 1 if stacked else max_num_objects,
        )
        centers2d, extents2d = shrink_regions(
            rng, regions, w0, l0, min_offset_perc=0.1
        )
        n = len(centers2d)
        if stacked:
            if not (n_bottom <= n <= max_num_objects - 1):
                continue
        elif not (min_num_objects <= n <= max_num_objects):
            continue
        if stacked:
            # two-layer packing: stack 1-2 smaller boxes onto *tall* bottom
            # boxes (top-aligned side grasps then clear the shorter
            # neighbors) — the layered structure of the reference's 3-D
            # splitting data (``envs/builders.py:79-279``) at packing-task
            # object counts
            n_top = int(
                rng.integers(
                    max(min_num_objects - n, 1),
                    max(max_num_objects - n, 1) + 1,
                )
            )
            supports = rng.permutation(n)[:n_top]
            heights = rng.uniform(0.28, 0.4 * h0, n)
            heights[supports] = rng.uniform(0.6, 0.75 * h0, len(supports))
        else:
            heights = rng.uniform(0.3, 0.8 * h0, n)
        eff_centers = np.concatenate(
            [centers2d, (heights / 2)[:, None]], axis=1
        )
        eff_extents = np.concatenate([extents2d, heights[:, None]], axis=1)

        if stacked:
            tops_c, tops_e = [], []
            for j in supports:
                bw, bl, bh = eff_extents[j]
                tw = rng.uniform(0.5, 0.95) * bw
                tl = rng.uniform(0.5, 0.95) * bl
                th = rng.uniform(0.2, max(h0 - bh - 0.05, 0.21))
                if bh + th > h0:
                    continue
                ox = rng.uniform(-0.5, 0.5) * (bw - tw)
                oy = rng.uniform(-0.5, 0.5) * (bl - tl)
                tops_c.append(
                    (eff_centers[j, 0] + ox, eff_centers[j, 1] + oy,
                     bh + th / 2)
                )
                tops_e.append((tw, tl, th))
            if tops_c:
                eff_centers = np.concatenate(
                    [eff_centers, np.asarray(tops_c)]
                )
                eff_extents = np.concatenate(
                    [eff_extents, np.asarray(tops_e)]
                )
            n = len(eff_centers)
            if not (min_num_objects <= n <= max_num_objects):
                continue

        # choose grasp sides in the world (effective) frame: gripper must not
        # hit walls, other objects, or previously assigned grippers (the
        # on-device gfree check includes gripper-gripper clearance)
        sides_world = []
        chosen_grippers = []
        ok_scene = True
        for i in range(n):
            feasible = []
            for s in range(5):
                gc, ge = _gripper_aabb(eff_centers[i], eff_extents[i], s)
                # walls: footprint must stay inside unless fully above h0
                inside = (
                    abs(gc[0]) + ge[0] / 2 <= w0 / 2
                    and abs(gc[1]) + ge[1] / 2 <= l0 / 2
                )
                above = gc[2] - ge[2] / 2 >= h0
                if not (inside or above):
                    continue
                clash = any(
                    _aabbs_overlap(gc, ge, eff_centers[j], eff_extents[j])
                    for j in range(n)
                    if j != i
                ) or any(
                    _aabbs_overlap(gc, ge, oc, oe)
                    for oc, oe in chosen_grippers
                )
                if not clash:
                    feasible.append(s)
            if not feasible:
                ok_scene = False
                break
            s = int(rng.choice(feasible))
            sides_world.append(s)
            chosen_grippers.append(
                _gripper_aabb(eff_centers[i], eff_extents[i], s)
            )
        if not ok_scene:
            continue

        # fitted yaw: transpose the stored footprint and rotate the local
        # frame by pi/2; the world scene (and the grasp side in world frame)
        # is unchanged, so feasibility is preserved exactly
        yaws = np.zeros(n)
        extents = eff_extents.copy()
        sides = list(sides_world)
        for i in range(n):
            if rng.random() < yaw_prob:
                yaws[i] = np.pi / 2
                extents[i, 0], extents[i, 1] = eff_extents[i, 1], eff_extents[i, 0]
                sides[i] = _SIDE_LOCAL_FOR_QUARTER_TURN[sides_world[i]]
        return RobotScene(
            container=(w0, l0, h0),
            centers=eff_centers,
            extents=extents,
            yaws=yaws,
            grasp_sides=sides,
        )
    raise RuntimeError("failed to sample a graspable packing scene")


def robot_scene_to_graph(
    scene: RobotScene, max_nodes: int, max_edges: int
) -> ConstraintGraph:
    """Features per reference ``data_transforms.py:203-269``:
    geom = (w/w0, l/l0, h/h0, w0, l0, h0, x0, y0) with the container at the
    origin; grasp = 5-dim one-hot; pose = (x/(w0/2), y/(l0/2), z/h0, cs, sn).
    Constraints: gin(i, 0) for all objects, gfree pairs
    (``data_transforms.py:262-266``)."""
    w0, l0, h0 = scene.container
    geom = [[1.0, 1.0, 1.0, w0, l0, h0, 0.0, 0.0]]
    grasp = [[0.0] * 5]
    pose = [[0.0, 0.0, 0.0, 1.0, 0.0]]
    for k in range(scene.num_objects):
        w, l, h = scene.extents[k]
        x, y, z = scene.centers[k]
        geom.append([w / w0, l / l0, h / h0, w0, l0, h0, 0.0, 0.0])
        onehot = [0.0] * 5
        onehot[scene.grasp_sides[k]] = 1.0
        grasp.append(onehot)
        pose.append(
            [
                x / (w0 / 2),
                y / (l0 / 2),
                z / h0,
                np.cos(scene.yaws[k]),
                np.sin(scene.yaws[k]),
            ]
        )
    n = scene.num_objects
    constraints = [("gin", i, 0) for i in range(1, n + 1)]
    for i in range(1, n):
        for j in range(i + 1, n + 1):
            constraints.append(("gfree", j, i))
    return build_graph(
        geom, pose, constraints, "robot_box", max_nodes, max_edges,
        (w0, l0), grasp=grasp,
    )


def robot_qualitative_scene_to_graph(
    scene: RobotScene, max_nodes: int, max_edges: int
) -> ConstraintGraph:
    """Composed-task graph: robot gin/gfree edges plus qualitative relations
    extracted from the 2-D footprints (reference create_qualitative_data,
    ``3-panda-box-data.py:471-534``)."""
    from diffusion_ccsp_tpu.envs.qualitative import (
        extract_qualitative_constraints,
    )

    base = robot_scene_to_graph(scene, max_nodes, max_edges)
    quals = extract_qualitative_constraints(
        scene.centers[:, :2], scene.extents[:, :2], scene.yaws
    )
    # re-encode every edge under the composed vocabulary
    w0, l0, h0 = scene.container
    n = scene.num_objects
    constraints = [("gin", i, 0) for i in range(1, n + 1)]
    for i in range(1, n):
        for j in range(i + 1, n + 1):
            constraints.append(("gfree", j, i))
    constraints += [c for c in quals if c[0] not in ("in", "cfree")]
    constraints = constraints[:max_edges]

    geom = np.asarray(base.geom).tolist()
    grasp = np.asarray(base.grasp).tolist()
    pose = np.asarray(base.pose).tolist()
    nn = scene.num_objects + 1
    return build_graph(
        geom[:nn], pose[:nn], constraints, "robot_qualitative",
        max_nodes, max_edges, (w0, l0), grasp=grasp[:nn],
    )


def make_tamp_test_suite(
    scene: RobotScene,
    rng: np.random.Generator,
    n_variants: int = 50,
    max_nodes: int = 8,
    max_edges: int = 32,
) -> list[ConstraintGraph]:
    """Placement-order variants of one solved scene for integrated
    task-and-motion-planning evaluation.

    Capability parity: reference ``demo_utils.py:1241-1272`` — 50 shuffled
    placement-order copies of a solution, evaluated with tries=(1, 0)
    (``solve_csp.py:89-105``). Object identity is permuted (node relabeling);
    the constraint set is regenerated under the new order, so each variant
    asks the solver to place the same objects in a different sequence.
    """
    variants = []
    n = scene.num_objects
    for _ in range(n_variants):
        perm = rng.permutation(n)
        sub = RobotScene(
            container=scene.container,
            centers=scene.centers[perm],
            extents=scene.extents[perm],
            yaws=scene.yaws[perm],
            grasp_sides=[scene.grasp_sides[p] for p in perm],
        )
        variants.append(robot_scene_to_graph(sub, max_nodes, max_edges))
    return variants


def sample_robot_batch(
    rng: np.random.Generator,
    batch_size: int,
    max_nodes: int = 8,
    max_edges: int = 32,
    **scene_kwargs,
) -> ConstraintGraph:
    graphs = []
    for _ in range(batch_size):
        scene = sample_robot_scene(rng, **scene_kwargs)
        graphs.append(robot_scene_to_graph(scene, max_nodes, max_edges))
    return stack_graphs(graphs)
