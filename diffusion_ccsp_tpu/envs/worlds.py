"""CCSP world sampling and graph construction (host side, numpy).

Capability parity: reference ``envs/worlds.py`` RandomSplitWorld /
RandomSplitQualitativeWorld — procedural scenes whose tiles come from a BSP
split of the tray (collision-free by construction), turned directly into
normalized, padded ``ConstraintGraph`` records (the reference detours through
trimesh scenes + JSON + torch-geometric ``.pt`` files,
``worlds.py:147-358`` / ``datasets.py:79-117``).

Feature layout (qualitative mode, reference ``data_transforms.py:101-109``):
  geom = (w/W, l/L)
  pose = (x/(W/2), y/(L/2), cos yaw, sin yaw)
  container row: geom=(1, 1), pose=(0, 0, 0, 0), conditioned.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from diffusion_ccsp_tpu.constraints import QUALITATIVE_CONSTRAINTS
from diffusion_ccsp_tpu.envs.builders import sample_tray_splitting, shrink_regions
from diffusion_ccsp_tpu.envs.qualitative import (
    extract_qualitative_constraints,
    randomize_unordered_constraints,
)
from diffusion_ccsp_tpu.graphs import ConstraintGraph, build_graph, stack_graphs


@dataclasses.dataclass
class QualitativeScene:
    """A sampled scene: ground-truth placements + generated constraint set."""

    world_dims: tuple[float, float]
    centers: np.ndarray  # [n, 2] tiles only
    extents: np.ndarray  # [n, 2]
    yaws: np.ndarray  # [n]
    constraints: list  # [(name, i, j)] with graph indices (container=0)

    @property
    def num_tiles(self) -> int:
        return len(self.centers)


def sample_qualitative_scene(
    rng: np.random.Generator,
    w: float = 3.0,
    l: float = 2.0,
    min_num_objects: int = 2,
    max_num_objects: int = 6,
    randomize_order: bool = True,
) -> QualitativeScene:
    """Sample one RandomSplitQualitativeWorld scene.

    Reference ``worlds.py:642-649,715-733``: BSP split with
    min_offset_perc=0, then constraint extraction; 'in' and pairwise 'cfree'
    edges come from ``generate_constraints`` (``worlds.py:127-145``).
    """
    while True:
        regions = sample_tray_splitting(
            rng, w, l, min_num_regions=min_num_objects,
            max_num_regions=max_num_objects,
        )
        centers, extents = shrink_regions(rng, regions, w, l, min_offset_perc=0.0)
        if min_num_objects <= len(centers) <= max_num_objects:
            break
    n = len(centers)
    yaws = np.zeros(n)

    constraints = [("in", i, 0) for i in range(1, n + 1)]
    for i in range(1, n):
        for j in range(i + 1, n + 1):
            constraints.append(("cfree", i, j))
    qual = extract_qualitative_constraints(centers, extents, yaws)
    if randomize_order:
        qual = randomize_unordered_constraints(rng, qual)
    constraints += qual

    return QualitativeScene(
        world_dims=(w, l), centers=centers, extents=extents, yaws=yaws,
        constraints=constraints,
    )


def qualitative_scene_to_graph(
    scene: QualitativeScene, max_nodes: int, max_edges: int
) -> ConstraintGraph:
    """Normalize and pad one scene into a ConstraintGraph."""
    w, l = scene.world_dims
    geom = [[1.0, 1.0]]
    pose = [[0.0, 0.0, 0.0, 0.0]]
    for k in range(scene.num_tiles):
        geom.append([scene.extents[k, 0] / w, scene.extents[k, 1] / l])
        pose.append(
            [
                scene.centers[k, 0] / (w / 2),
                scene.centers[k, 1] / (l / 2),
                np.cos(scene.yaws[k]),
                np.sin(scene.yaws[k]),
            ]
        )
    constraints = [c for c in scene.constraints if len(c) == 3]
    # drop overflow edges rather than failing: large scenes can exceed the
    # bucket; truncation order keeps in/cfree first (they were added first)
    constraints = constraints[:max_edges]
    return build_graph(
        geom, pose, constraints, "qualitative", max_nodes, max_edges, (w, l)
    )


def sample_qualitative_batch(
    rng: np.random.Generator,
    batch_size: int,
    max_nodes: int = 8,
    max_edges: int = 64,
    **scene_kwargs,
) -> ConstraintGraph:
    """Sample a batch of scenes as one stacked ConstraintGraph."""
    graphs = []
    for _ in range(batch_size):
        scene = sample_qualitative_scene(rng, **scene_kwargs)
        graphs.append(qualitative_scene_to_graph(scene, max_nodes, max_edges))
    return stack_graphs(graphs)


# --------------------------------------------------------------------------- #
# ShapeSettingWorld: shape menu + constraint-guided placement + shake aug
# --------------------------------------------------------------------------- #

#: reference ShapeSettingWorld shape vocabulary (``worlds.py:459-483``
#: add_shape; mesh builders in ``mesh_utils.py:116-206``). Shapes are convex
#: polygons in the 2-D plane; 'circle' is a regular 16-gon.
SHAPE_MENU = ("square", "box", "circle", "triangle", "parallelogram")


def shape_polygon(
    shape: str, size, rng: np.random.Generator | None = None
) -> np.ndarray:
    """Canonical (origin-centered) convex polygon for one menu shape.

    size: scalar for square/circle/triangle, (w, l) for box/parallelogram.
    """
    rng = rng or np.random.default_rng(0)
    if shape == "square":
        s = float(size) / 2
        return np.asarray([[s, s], [-s, s], [-s, -s], [s, -s]])
    if shape == "box":
        w, l = (size if np.ndim(size) else (size, size * 0.6))
        return np.asarray(
            [[w / 2, l / 2], [-w / 2, l / 2], [-w / 2, -l / 2],
             [w / 2, -l / 2]]
        )
    if shape == "circle":
        r = float(size) / 2
        ang = np.linspace(0, 2 * np.pi, 16, endpoint=False)
        return np.stack([r * np.cos(ang), r * np.sin(ang)], -1)
    if shape == "triangle":
        s = float(size)
        tri = np.asarray(
            [[0.0, s / np.sqrt(3)], [-s / 2, -s / (2 * np.sqrt(3))],
             [s / 2, -s / (2 * np.sqrt(3))]]
        )
        return tri
    if shape == "parallelogram":
        w, l = (size if np.ndim(size) else (size, size * 0.5))
        skew = w * 0.3
        return np.asarray(
            [[w / 2 + skew / 2, l / 2], [-w / 2 + skew / 2, l / 2],
             [-w / 2 - skew / 2, -l / 2], [w / 2 - skew / 2, -l / 2]]
        )
    raise ValueError(f"unknown shape {shape!r}")


@dataclasses.dataclass
class ShapeScene:
    """A tray scene of mixed convex shapes (ShapeSettingWorld role)."""

    world_dims: tuple[float, float]
    shapes: list  # shape names
    polygons: list  # [k] canonical [V, 2] polygons
    centers: np.ndarray  # [n, 2]
    yaws: np.ndarray

    @property
    def num_tiles(self) -> int:
        return len(self.polygons)

    def world_polygons(self) -> list:
        out = []
        for poly, c, yaw in zip(self.polygons, self.centers, self.yaws):
            cs, sn = np.cos(yaw), np.sin(yaw)
            rot = np.asarray([[cs, -sn], [sn, cs]])
            out.append(poly @ rot.T + c)
        return out


def _placement_from_constraints(
    rng: np.random.Generator, w: float, l: float, radius: float,
    constraints: list,
) -> tuple[float, float]:
    """Constraint-guided placement (reference transform_by_constraints used
    by ``add_shape``, ``worlds.py:470-471``): sample (x, y) uniform in the
    region the unary constraints allow."""
    x_lo, x_hi = -w / 2 + radius, w / 2 - radius
    y_lo, y_hi = -l / 2 + radius, l / 2 - radius
    for c in constraints:
        name = c[0] if isinstance(c, (tuple, list)) else c
        name = name.lower().replace("_", "-")
        if name in ("left-in", "leftin"):
            x_hi = min(x_hi, -radius)
        elif name in ("right-in", "rightin"):
            x_lo = max(x_lo, radius)
        elif name in ("bottom-in", "bottomin"):
            y_hi = min(y_hi, -radius)
        elif name in ("top-in", "topin"):
            y_lo = max(y_lo, radius)
        elif name in ("center-in", "centerin"):
            x_lo, x_hi = -0.3 * radius - 0.1, 0.3 * radius + 0.1
            y_lo, y_hi = x_lo, x_hi
    if x_lo > x_hi or y_lo > y_hi:
        raise ValueError("constraints admit no placement")
    return float(rng.uniform(x_lo, x_hi)), float(rng.uniform(y_lo, y_hi))


def add_shape(
    scene: ShapeScene,
    rng: np.random.Generator,
    shape: str,
    size,
    constraints: list = (),
    yaw: float | None = None,
    max_attempts: int = 100,
) -> bool:
    """Place one shape collision-free under unary placement constraints
    (reference ``ShapeSettingWorld.add_shape``, ``worlds.py:459-483``).
    Returns False when no collision-free placement was found."""
    from diffusion_ccsp_tpu.native import convex_collisions

    w, l = scene.world_dims
    poly = shape_polygon(shape, size, rng)
    radius = float(np.linalg.norm(poly, axis=1).max())
    existing = scene.world_polygons()
    for _ in range(max_attempts):
        x, y = _placement_from_constraints(rng, w, l, radius, list(constraints))
        th = rng.uniform(-np.pi, np.pi) if yaw is None else yaw
        cs, sn = np.cos(th), np.sin(th)
        cand = poly @ np.asarray([[cs, -sn], [sn, cs]]).T + (x, y)
        if existing:
            col = convex_collisions(existing + [cand])
            if col[-1, :-1].any():
                continue
        scene.shapes.append(shape)
        scene.polygons.append(poly)
        scene.centers = np.concatenate(
            [scene.centers.reshape(-1, 2), [[x, y]]]
        )
        scene.yaws = np.concatenate([scene.yaws, [th]])
        return True
    return False


def sample_shape_scene(
    rng: np.random.Generator,
    w: float = 3.0,
    l: float = 3.0,
    num_shapes: int = 4,
    menu: tuple = SHAPE_MENU,
) -> ShapeScene:
    """A tray of random menu shapes (reference ShapeSettingWorld
    ``sample_scene``, ``worlds.py:520-546``)."""
    scene = ShapeScene(
        (w, l), [], [], np.zeros((0, 2)), np.zeros(0)
    )
    guard = 0
    while scene.num_tiles < num_shapes and guard < num_shapes * 10:
        guard += 1
        shape = str(rng.choice(menu))
        size = float(rng.uniform(0.3, 0.8))
        add_shape(scene, rng, shape, size)
    return scene


def shake_scene(
    scene, rng: np.random.Generator, num: int = 10, delta: float = 0.2,
    collision_free: bool = False,
):
    """Yield ``num`` pose-perturbed copies of a scene (reference
    ``shake_scenes_gen``, ``worlds.py:548-579``: each movable tile's (x, y)
    moves by U(-delta, delta)). Works for any scene dataclass exposing
    ``centers``/``extents``-or-``polygons``. With ``collision_free`` the
    perturbation resamples until tiles stay separated (up to 20 tries)."""
    from diffusion_ccsp_tpu.native import convex_collisions

    for _ in range(num):
        for _try in range(20):
            new = dataclasses.replace(
                scene,
                centers=scene.centers
                + rng.uniform(-delta, delta, scene.centers.shape),
            )
            if not collision_free:
                break
            if hasattr(new, "world_polygons"):
                polys = new.world_polygons()
            else:
                polys = []
                for c, e, yaw in zip(new.centers, new.extents, new.yaws):
                    cs, sn = np.cos(yaw), np.sin(yaw)
                    rot = np.asarray([[cs, -sn], [sn, cs]])
                    hw, hl = e[0] / 2, e[1] / 2
                    local = np.asarray(
                        [[hw, hl], [-hw, hl], [-hw, -hl], [hw, -hl]]
                    )
                    polys.append(local @ rot.T + c)
            col = convex_collisions(polys)
            np.fill_diagonal(col, False)
            if not col.any():
                break
        yield new
