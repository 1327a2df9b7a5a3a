"""Triangle CCSP worlds (diffuse_pairwise mode): Delaunay scene sampling and
the canonical P1 triangle encoding.

Capability parity: reference ``envs/builders.py:450-490``
(get_triangles_splitting_gen), ``envs/worlds.py:830-1070``
(TriangularRandomSplitWorld, get_rotation / P1 encoding). The reference
hand-rolls Bowyer-Watson triangulation (``builders.py:290-447``); we use
``scipy.spatial.Delaunay`` — same math, maintained implementation.

P1 encoding: vertices are reordered (vertex opposite the shortest side first,
then middle, then longest — ``mesh_utils.py:303-308``), the triangle is
expressed in a canonical frame with P1 at the origin and P2 on the +x axis:
geom = (l12, x3, y3), pose = (x1, y1, cs, sn) with the rotation convention of
``worlds.py:973-1020`` (cs = cos phi, sn = -sin phi for actual-edge angle phi;
reconstruction applies R = [[cs, sn], [-sn, cs]]).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy.spatial import Delaunay

from diffusion_ccsp_tpu.graphs import ConstraintGraph, build_graph, stack_graphs


def _side_lengths(tri: np.ndarray) -> np.ndarray:
    """Lengths (l1, l2, l3) with l_k opposite vertex k
    (reference ``builders.py:453-465``)."""
    p1, p2, p3 = tri
    l3 = np.linalg.norm(p1 - p2)
    l1 = np.linalg.norm(p2 - p3)
    l2 = np.linalg.norm(p3 - p1)
    return np.asarray([l1, l2, l3])


def _move_points_closer(rng, tri: np.ndarray) -> np.ndarray:
    """Shrink each vertex toward the midpoint of the other two by a random
    factor in [0.7, 1] (reference ``builders.py:467-469``)."""
    out = np.empty_like(tri)
    for k in range(3):
        middle = np.mean([tri[m] for m in range(3) if m != k], axis=0)
        out[k] = middle + (tri[k] - middle) * (1 - 0.3 * rng.random())
    return out


def sample_triangle_scene_raw(
    rng: np.random.Generator, w: float, l: float, num_points: int
) -> list[np.ndarray]:
    """One Delaunay pass: random interior points -> shrunk triangles, with the
    reference's degenerate filters (area < 1%% of tray, sliver ratio < 0.1).

    The triangulation frame includes the 4 tray corners (reference
    ``builders.py:303-306`` seeds Delaunay2D with the corner frame and exports
    frame triangles too, :431-434) so the triangles tile the *entire* tray —
    scenes are dense packings, not sparse scatters.
    """
    interior = rng.random((max(num_points, 1), 2)) - 0.5
    corners = np.asarray(
        [[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]]
    )
    pts = np.concatenate([corners, interior]) * np.asarray([w, l])
    try:
        dt = Delaunay(pts)
    except Exception:
        return []
    tris = []
    for simplex in dt.simplices:
        tri = pts[simplex]
        tri = _move_points_closer(rng, tri)
        lengths = _side_lengths(tri)
        p = lengths.sum() / 2
        area_sq = p * np.prod(np.maximum(p - lengths, 0))
        area = np.sqrt(max(area_sq, 0))
        if area < 0.01 * w * l or (area / lengths).min() < 0.1:
            continue
        tris.append(tri)
    return tris


def canonical_p1(tri: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Canonicalize one triangle.

    Returns (extent = [l12, x3, y3], center = [x1, y1, cs, sn]) per the P1
    convention (reference ``worlds.py:973-1020``).
    """
    lengths = _side_lengths(tri)
    order = [int(np.argmin(lengths))]
    order.append([i for i in range(3) if i not in (np.argmin(lengths), np.argmax(lengths))][0])
    order.append(int(np.argmax(lengths)))
    p1, p2_0, p3_0 = tri[order[0]], tri[order[1]], tri[order[2]]

    v2 = p2_0 - p1
    l12 = np.linalg.norm(v2)
    # actual-edge angle phi; stored cs = cos phi, sn = -sin phi
    cs = v2[0] / l12
    sn = -v2[1] / l12
    # canonical third vertex: rotate v3 by R(-phi) = [[cs, -sn], [sn, cs]]
    # with our (cs, sn) values (note sn already carries the minus sign)
    v3 = p3_0 - p1
    x3 = cs * v3[0] - sn * v3[1]
    y3 = sn * v3[0] + cs * v3[1]
    extent = np.asarray([l12, x3, y3])
    center = np.asarray([p1[0], p1[1], cs, sn])
    return extent, center


def reconstruct_p1(extent: np.ndarray, center: np.ndarray) -> np.ndarray:
    """Inverse of canonical_p1 (reference ``worlds.py:1104-1129``)."""
    l12, x3, y3 = extent
    x1, y1, cs, sn = center
    norm = np.sqrt(cs**2 + sn**2)
    cs, sn = cs / norm, sn / norm
    p1 = np.asarray([x1, y1])
    v2 = np.asarray([cs * l12, -sn * l12])
    v3 = np.asarray([cs * x3 + sn * y3, -sn * x3 + cs * y3])
    return np.stack([p1, p1 + v2, p1 + v3])


@dataclasses.dataclass
class TriangleScene:
    world_dims: tuple[float, float]
    triangles: list  # [n] of [3, 2] world-frame vertex arrays
    extents: np.ndarray  # [n, 3] canonical (l12, x3, y3)
    centers: np.ndarray  # [n, 4] (x1, y1, cs, sn)

    @property
    def num_tiles(self) -> int:
        return len(self.triangles)


def sample_triangle_scene(
    rng: np.random.Generator,
    w: float = 3.0,
    l: float = 3.0,
    min_num_objects: int = 2,
    max_num_objects: int = 6,
) -> TriangleScene:
    """Sample one TriangularRandomSplitWorld scene (reference
    ``worlds.py:848-871``: adjust the point count until the triangle count
    fits, or randomly subsample)."""
    k = -4
    while True:
        tris = sample_triangle_scene_raw(
            rng, w, l, max(max_num_objects + k, 1)
        )
        if len(tris) > max_num_objects:
            if rng.random() > 0.5:
                idx = rng.choice(len(tris), min_num_objects, replace=False)
                tris = [tris[i] for i in idx]
            else:
                k -= 1
                continue
        if min_num_objects <= len(tris) <= max_num_objects:
            break
        k += 1

    extents, centers = [], []
    for tri in tris:
        e, c = canonical_p1(tri)
        extents.append(e)
        centers.append(c)
    return TriangleScene(
        world_dims=(w, l),
        triangles=tris,
        extents=np.asarray(extents),
        centers=np.asarray(centers),
    )


def triangle_scene_to_graph(
    scene: TriangleScene, max_nodes: int, max_edges: int
) -> ConstraintGraph:
    """Normalize and pad one scene (feature layout:
    reference ``data_transforms.py:112-127``)."""
    w, l = scene.world_dims
    geom = [[1.0, 1.0, 0.0]]  # container: (w/W, l/L, 0)
    pose = [[0.0, 0.0, 0.0, 0.0]]
    for k in range(scene.num_tiles):
        l12, x3, y3 = scene.extents[k]
        x1, y1, cs, sn = scene.centers[k]
        geom.append([l12 / w, x3 / w, y3 / l])
        pose.append([x1 / (w / 2), y1 / (l / 2), cs, sn])

    n = scene.num_tiles
    constraints = [("in", i, 0) for i in range(1, n + 1)]
    for i in range(1, n):
        for j in range(i + 1, n + 1):
            constraints.append(("cfree", i, j))
    return build_graph(
        geom, pose, constraints, "diffuse_pairwise", max_nodes, max_edges,
        (w, l),
    )


def sample_triangle_batch(
    rng: np.random.Generator,
    batch_size: int,
    max_nodes: int = 8,
    max_edges: int = 32,
    **scene_kwargs,
) -> ConstraintGraph:
    graphs = []
    for _ in range(batch_size):
        scene = sample_triangle_scene(rng, **scene_kwargs)
        graphs.append(triangle_scene_to_graph(scene, max_nodes, max_edges))
    return stack_graphs(graphs)
