"""Stability (stacking) worlds: layered scene sampling and a static-equilibrium
oracle.

Capability parity: reference Task 3 — ``5-panda-stability-data.py`` (stacking
scenes from the 3-D box splitting sampler, PyBullet-filtered for stability,
support structure, bridges, and feasible assembly order) and
``demo_utils.py:826-885,987-1235`` (the stability success oracle: simulate,
check nothing fell, support structure matches, intermediate stability under
disassembly order).

TPU-native redesign: the world is an (x horizontal, y vertical) shelf; scenes
are built layer by layer so the support structure is known by construction
(the reference reverse-engineers it from contact normals,
``demo_utils.py:1032-1098``); stability is judged by *static equilibrium
analysis* — aggregate center-of-mass of each support subtree must lie within
the span of its contacts — a deterministic, differentiable-friendly check
that replaces the 600-step dynamics rollout (``demo_utils.py:837-842``).
Bridges (a box resting on two towers, required in reference training data by
``check_exist_bridges``) are sampled explicitly.

Feature layout (reference ``data_transforms.py:272-303``): geom = (w/W, l/L);
pose = (x/(W/2), y/(L/2), sin yaw, cos yaw); under 'flat' canonicalization a
box with w > l is stored transposed with yaw += pi/2. We keep yaw = 0 at
generation (axis-aligned stacks) and store pose as (x, y, cs, sn) — the
framework-wide order; the sn/cs flip of the reference row format is a
serialization detail, not a semantic one.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from diffusion_ccsp_tpu.graphs import ConstraintGraph, build_graph, stack_graphs

CONTACT_TOL = 0.02  # vertical gap below which boxes are in supporting contact


@dataclasses.dataclass
class StabilityScene:
    world_dims: tuple[float, float]  # (W shelf width, L shelf height)
    centers: np.ndarray  # [n, 2] (x, y), shelf-centered coords, floor at -L/2
    extents: np.ndarray  # [n, 2] (w, l)
    supports: list  # [(i, j)] graph indices, i rests on j (0 = shelf floor)
    order: list  # assembly order of tiles (graph indices, bottom-up)

    @property
    def num_tiles(self) -> int:
        return len(self.centers)


def _contact_interval(
    i: int, j: int, centers: np.ndarray, extents: np.ndarray
) -> tuple[float, float] | None:
    """Horizontal overlap of box i and its support j (1-based; j=0 floor)."""
    xi, wi = centers[i - 1, 0], extents[i - 1, 0]
    if j == 0:
        return xi - wi / 2, xi + wi / 2
    xj, wj = centers[j - 1, 0], extents[j - 1, 0]
    lo = max(xi - wi / 2, xj - wj / 2)
    hi = min(xi + wi / 2, xj + wj / 2)
    if hi <= lo:
        return None
    return lo, hi


def check_static_equilibrium(
    centers: np.ndarray,
    extents: np.ndarray,
    supports: list[tuple[int, int]],
    floor_y: float,
) -> bool:
    """Exact static stability of an axis-aligned stack via contact-force LP
    feasibility.

    Model: frictionless vertical contacts; each contact patch exerts two
    non-negative point forces at its interval endpoints (sufficient for any
    distributed pressure profile by convexity). The structure is stable iff
    forces exist satisfying per-box vertical force balance and torque
    balance. This is the standard rigid-body feasibility formulation - exact
    where the reference's 600-step PyBullet rollout (``demo_utils.py:837-842``)
    is an approximation, and orders of magnitude cheaper.
    """
    from scipy.optimize import linprog

    n = len(centers)
    if n == 0:
        return True
    mass = extents[:, 0] * extents[:, 1]  # uniform density, g = 1

    # variables: 2 per contact (force at lo endpoint, force at hi endpoint)
    contacts = []
    for i, j in supports:
        iv = _contact_interval(i, j, centers, extents)
        if iv is None:
            return False  # declared support without geometric overlap
        contacts.append((i, j, iv[0], iv[1]))

    supported = {i for i, _, _, _ in contacts}
    if supported != set(range(1, n + 1)):
        return False  # some box has no support at all

    nv = 2 * len(contacts)
    a_eq = np.zeros((2 * n, nv))
    b_eq = np.zeros(2 * n)
    for bi in range(1, n + 1):
        b_eq[2 * (bi - 1)] = mass[bi - 1]  # sum(F_up) - sum(F_down) = m g
        b_eq[2 * (bi - 1) + 1] = mass[bi - 1] * centers[bi - 1, 0]  # torques
    for k, (i, j, lo, hi) in enumerate(contacts):
        for col, x in ((2 * k, lo), (2 * k + 1, hi)):
            # upward force on box i
            a_eq[2 * (i - 1), col] += 1.0
            a_eq[2 * (i - 1) + 1, col] += x
            # reaction (downward) on box j
            if j != 0:
                a_eq[2 * (j - 1), col] -= 1.0
                a_eq[2 * (j - 1) + 1, col] -= x

    res = linprog(
        c=np.zeros(nv),
        A_eq=a_eq,
        b_eq=b_eq,
        bounds=[(0, None)] * nv,
        method="highs",
    )
    return bool(res.success)



def sample_stability_scene(
    rng: np.random.Generator,
    w: float = 3.0,
    l: float = 2.0,
    min_num_objects: int = 4,
    max_num_objects: int = 7,
    max_attempts: int = 200,
) -> StabilityScene:
    """Sample a stable layered stack with at least one bridge when object
    count allows (reference requires bridges in training data,
    ``5-panda-stability-data.py:132-139``)."""
    for _ in range(max_attempts):
        scene = _try_sample_stack(rng, w, l, min_num_objects, max_num_objects)
        if scene is None:
            continue
        floor = -l / 2
        if check_static_equilibrium(
            scene.centers, scene.extents, scene.supports, floor
        ):
            # intermediate stability: every assembly prefix must be stable
            ok = True
            for k in range(1, scene.num_tiles):
                pre = set(scene.order[:k])
                sub_sup = [
                    (i, j) for i, j in scene.supports
                    if i in pre and (j == 0 or j in pre)
                ]
                idx = sorted(pre)
                remap = {g: r + 1 for r, g in enumerate(idx)}
                sub_centers = scene.centers[[g - 1 for g in idx]]
                sub_extents = scene.extents[[g - 1 for g in idx]]
                sub_sup = [(remap[i], 0 if j == 0 else remap[j]) for i, j in sub_sup]
                if not check_static_equilibrium(
                    sub_centers, sub_extents, sub_sup, floor
                ):
                    ok = False
                    break
            if ok:
                return scene
    raise RuntimeError("failed to sample a stable stack")


def _try_sample_stack(rng, w, l, min_n, max_n):
    floor = -l / 2
    target = int(rng.integers(min_n, max_n + 1))

    centers, extents, supports, order = [], [], [], []

    def add_box(x, y_bottom, bw, bh, sups):
        centers.append((x, y_bottom + bh / 2))
        extents.append((bw, bh))
        idx = len(centers)
        for j in sups:
            supports.append((idx, j))
        order.append(idx)
        return idx

    # --- bottom layer: segments on the floor with random gaps
    n_bottom = int(rng.integers(2, min(4, target) + 1))
    seg_edges = np.sort(rng.uniform(-w / 2 + 0.1, w / 2 - 0.1, 2 * n_bottom))
    bottom_ids = []
    bottom_tops = []
    heights = []
    for k in range(n_bottom):
        x0, x1 = seg_edges[2 * k], seg_edges[2 * k + 1]
        bw = x1 - x0
        if bw < 0.25:
            continue
        heights.append(rng.uniform(0.3, 0.7))
    # bridges need two adjacent towers of equal height; force a matching pair
    # most of the time (reference data requires bridges,
    # 5-panda-stability-data.py:132-139)
    if len(heights) >= 2 and rng.random() < 0.85:
        k = int(rng.integers(0, len(heights) - 1))
        heights[k + 1] = heights[k]
    hk = 0
    for k in range(n_bottom):
        x0, x1 = seg_edges[2 * k], seg_edges[2 * k + 1]
        bw = x1 - x0
        if bw < 0.25:
            continue
        bh = heights[hk]
        hk += 1
        i = add_box((x0 + x1) / 2, floor, bw, bh, [0])
        bottom_ids.append(i)
        bottom_tops.append(floor + bh)
    if len(bottom_ids) < 2 and target > 2:
        return None

    # --- bridge: a box spanning two adjacent bottom boxes of similar height
    remaining = target - len(bottom_ids)
    placed_ids = list(bottom_ids)
    if remaining > 0 and len(bottom_ids) >= 2:
        for k in range(len(bottom_ids) - 1):
            a, b = bottom_ids[k], bottom_ids[k + 1]
            ta, tb = bottom_tops[k], bottom_tops[k + 1]
            if abs(ta - tb) > CONTACT_TOL / 2:
                continue
            xa, wa = centers[a - 1][0], extents[a - 1][0]
            xb, wb = centers[b - 1][0], extents[b - 1][0]
            span_l = xa - wa / 2 + 0.02
            span_r = xb + wb / 2 - 0.02
            bw = span_r - span_l
            if bw < 0.3 or bw > w:
                continue
            bh = rng.uniform(0.25, 0.5)
            top = max(ta, tb)
            i = add_box((span_l + span_r) / 2, top, bw, bh, [a, b])
            placed_ids.append(i)
            remaining -= 1
            break

    # --- further single-support boxes on top of anything placed
    guard = 0
    while remaining > 0 and guard < 50:
        guard += 1
        j = int(rng.choice(placed_ids))
        xj, yj = centers[j - 1]
        wj, hj = extents[j - 1]
        top = yj + hj / 2
        bw = rng.uniform(0.25, max(wj * 0.9, 0.26))
        if bw > wj:
            bw = wj * 0.9
        bh = rng.uniform(0.25, 0.5)
        if top + bh > l / 2:  # height limit: stay inside the shelf
            continue
        # center offset keeping CoM well inside the support
        off = rng.uniform(-0.5, 0.5) * max(wj - bw, 0) * 0.8
        nx = xj + off
        # reject overlap with anything already placed (axis-aligned AABB test
        # with a small separation margin so cfree edges hold strictly)
        clash = False
        for (px, py), (pw, ph) in zip(centers, extents):
            if (
                abs(nx - px) < (bw + pw) / 2 + 0.02
                and abs((top + bh / 2) - py) < (bh + ph) / 2 - CONTACT_TOL / 2
            ):
                clash = True
                break
        if clash:
            continue
        i = add_box(nx, top, bw, bh, [j])
        placed_ids.append(i)
        remaining -= 1

    if len(centers) < min_n:
        return None
    # any box poking above the shelf?
    for (x, y), (bw, bh) in zip(centers, extents):
        if y + bh / 2 > l / 2 + 1e-9 or abs(x) + bw / 2 > w / 2 + 1e-9:
            return None
    return StabilityScene(
        world_dims=(w, l),
        centers=np.asarray(centers),
        extents=np.asarray(extents),
        supports=supports,
        order=order,
    )


def stability_scene_to_graph(
    scene: StabilityScene, max_nodes: int, max_edges: int
) -> ConstraintGraph:
    """Constraint edges per reference ``data_transforms.py:296-303``:
    within(i, 0) for every tile, supportedby pairs, cfree for the rest."""
    w, l = scene.world_dims
    geom = [[1.0, 1.0]]
    pose = [[0.0, 0.0, 0.0, 0.0]]
    for k in range(scene.num_tiles):
        geom.append([scene.extents[k, 0] / w, scene.extents[k, 1] / l])
        pose.append(
            [
                scene.centers[k, 0] / (w / 2),
                scene.centers[k, 1] / (l / 2),
                1.0,  # cs (yaw = 0)
                0.0,  # sn
            ]
        )
    n = scene.num_tiles
    constraints = [("within", i, 0) for i in range(1, n + 1)]
    sup_set = set()
    for i, j in scene.supports:
        constraints.append(("supportedby", i, j))
        sup_set.add((i, j))
        sup_set.add((j, i))
    for i in range(1, n):
        for j in range(i + 1, n + 1):
            if (i, j) not in sup_set:
                constraints.append(("cfree", i, j))
    return build_graph(
        geom, pose, constraints, "stability_flat", max_nodes, max_edges, (w, l)
    )


def check_stability_solution(graph, pose_features, dynamics: bool = False) -> bool:
    """Full stability oracle for one generated solution: device-side geometric
    predicates (given edges hold, collision-free, within shelf) plus the
    host-side static-equilibrium verdict with supports taken from the graph's
    ``supportedby`` edges (the spec the sample must realize — reference
    ``ddpm.py:653-661``).
    """
    import jax.numpy as jnp

    from diffusion_ccsp_tpu.ops.geometry2d import (
        stability_graph_satisfied_geometric,
    )

    pose_features = jnp.asarray(pose_features)
    ok_geom, _ = stability_graph_satisfied_geometric(graph, pose_features)
    if not bool(ok_geom):
        return False

    # reconstruct effective AABBs on host
    w = float(np.asarray(graph.world_dims)[0])
    l = float(np.asarray(graph.world_dims)[1])
    geom = np.asarray(graph.geom)
    pose = np.asarray(pose_features)
    nmask = np.asarray(graph.node_mask)
    cmask = np.asarray(graph.cond_mask)
    tiles = [i for i in range(len(geom)) if nmask[i] and not cmask[i]]

    cs, sn = pose[:, 2], pose[:, 3]
    norm = np.maximum(np.sqrt(cs**2 + sn**2), 1e-9)
    yaw = np.arctan2(sn / norm, cs / norm)
    # exact AABB of the rotated box (any yaw)
    true_ext = geom[:, :2] * np.asarray([w, l])
    ac, as_ = np.abs(np.cos(yaw)), np.abs(np.sin(yaw))
    ext = np.stack(
        [true_ext[:, 0] * ac + true_ext[:, 1] * as_,
         true_ext[:, 0] * as_ + true_ext[:, 1] * ac], -1
    )
    centers = pose[:, :2] * np.asarray([w / 2, l / 2])

    remap = {g: k + 1 for k, g in enumerate(tiles)}
    sub_centers = centers[tiles]
    sub_extents = ext[tiles]
    supports = []
    edges = np.asarray(graph.edges)
    etypes = np.asarray(graph.edge_type)
    emask = np.asarray(graph.edge_mask)
    for k in range(len(etypes)):
        if emask[k] and etypes[k] == 1:  # supportedby
            i, j = int(edges[k, 0]), int(edges[k, 1])
            supports.append((remap[i], 0 if j == 0 else remap[j]))
    if not check_static_equilibrium(sub_centers, sub_extents, supports, -l / 2):
        return False
    if dynamics:
        # dynamics-grade confirmation via the native impulse stepper — the
        # PyBullet role in the reference oracle (demo_utils.py:837-842)
        from diffusion_ccsp_tpu.native import check_stable_dynamics

        return check_stable_dynamics(
            sub_centers, sub_extents, floor_y=-l / 2, tol=0.05
        )
    return True


def sample_stability_batch(
    rng: np.random.Generator,
    batch_size: int,
    max_nodes: int = 8,
    max_edges: int = 48,
    **scene_kwargs,
) -> ConstraintGraph:
    graphs = []
    for _ in range(batch_size):
        scene = sample_stability_scene(rng, **scene_kwargs)
        graphs.append(stability_scene_to_graph(scene, max_nodes, max_edges))
    return stack_graphs(graphs)
