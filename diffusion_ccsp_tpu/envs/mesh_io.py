"""Wavefront OBJ mesh building and export — no trimesh required.

Capability parity: the reference exports triangle tiles as extruded OBJ
prisms for the simulator (``envs/worlds.py:1169-1184``) and builds/saves
tray, box, triangle and parallelogram meshes with trimesh
(``envs/mesh_utils.py:116-206, 347-368``, mesh save/view). OBJ is a plain
text format, so we write it directly: convex 2-D footprints are extruded to
prisms (fan-triangulated caps + side quads), boxes get the standard 12-tri
cube, and whole scenes/worlds export as multi-group OBJ files.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "save_obj",
    "load_obj",
    "extrude_polygon",
    "box_mesh",
    "tray_meshes",
    "triangle_scene_to_obj",
    "world3d_to_obj",
]


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray,
             groups: list[tuple[str, int]] | None = None) -> None:
    """Write a triangle mesh (or several named groups) to a .obj file.

    Args:
      vertices: [V, 3] float.
      faces: [F, 3] int, 0-based.
      groups: optional [(name, start_face), ...] in ascending start order;
        a ``g name`` line is emitted before each group's first face.
    """
    vertices = np.asarray(vertices, float)
    faces = np.asarray(faces, int)
    lines = [f"v {x:.6g} {y:.6g} {z:.6g}" for x, y, z in vertices]
    starts: dict[int, list[str]] = {}
    for n, s in groups or []:  # two groups may share a start (zero-face group)
        starts.setdefault(s, []).append(n)
    for i, (a, b, c) in enumerate(faces):
        for name in starts.get(i, ()):
            lines.append(f"g {name}")
        lines.append(f"f {a + 1} {b + 1} {c + 1}")  # OBJ is 1-based
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def load_obj(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ reader (v/f triangle lines only) for round-trip tests."""
    verts, faces = [], []
    with open(path) as fh:
        for line in fh:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(v) for v in t[1:4]])
            elif t[0] == "f":
                # face indices may carry /vt/vn suffixes
                idx = [int(tok.split("/")[0]) - 1 for tok in t[1:]]
                for k in range(1, len(idx) - 1):  # fan-triangulate n-gons
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, float), np.asarray(faces, int)


def extrude_polygon(poly2d: np.ndarray, height: float,
                    z0: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """Extrude a convex CCW 2-D polygon into a closed prism.

    Reference role: triangle tiles become prisms for the simulator
    (``worlds.py:1169-1184``). Returns ([2n, 3] verts, [4(n-2)+... , 3] tris):
    bottom ring then top ring; caps are fan-triangulated (valid because the
    footprints here are convex), sides are quads split into two triangles.
    """
    poly2d = np.asarray(poly2d, float)
    n = len(poly2d)
    if n < 3:
        raise ValueError("polygon needs >= 3 vertices")
    # enforce CCW so outward normals are consistent (scalar 2-D cross —
    # np.cross on 2-vectors is deprecated in NumPy 2.0)
    def cross2(a, b):
        return float(a[0] * b[1] - a[1] * b[0])

    area2 = sum(
        cross2(poly2d[i] - poly2d[0], poly2d[(i + 1) % n] - poly2d[0])
        for i in range(1, n - 1)
    )
    if area2 < 0:
        poly2d = poly2d[::-1].copy()
    bot = np.column_stack([poly2d, np.full(n, z0)])
    top = np.column_stack([poly2d, np.full(n, z0 + height)])
    verts = np.vstack([bot, top])
    faces = []
    for k in range(1, n - 1):  # bottom cap, wound downward
        faces.append([0, k + 1, k])
    for k in range(1, n - 1):  # top cap, wound upward
        faces.append([n, n + k, n + k + 1])
    for i in range(n):  # sides
        j = (i + 1) % n
        faces.append([i, j, n + j])
        faces.append([i, n + j, n + i])
    return verts, np.asarray(faces, int)


def box_mesh(extents, center=(0.0, 0.0, 0.0),
             yaw: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """Axis-extruded box (12 triangles) at a world pose with z-yaw."""
    ex, ey, ez = [float(v) / 2 for v in extents]
    corners = np.array(
        [[sx * ex, sy * ey] for sx, sy in [(-1, -1), (1, -1), (1, 1), (-1, 1)]]
    )
    c, s = np.cos(yaw), np.sin(yaw)
    corners = corners @ np.array([[c, s], [-s, c]])
    verts, faces = extrude_polygon(corners, 2 * ez, z0=-ez)
    return verts + np.asarray(center, float), faces


def tray_meshes(w: float, l: float, wall_t: float, wall_h: float):
    """Tray = floor slab + 4 walls, as in reference ``mesh_utils.py:116-164``.

    Returns a list of (name, verts, faces).
    """
    out = [("tray_floor", *box_mesh([w, l, wall_t], [0, 0, -wall_t / 2]))]
    half_w, half_l, hz = w / 2, l / 2, wall_h / 2
    sides = [
        ("wall_left", [wall_t, l + 2 * wall_t, wall_h], [-half_w - wall_t / 2, 0, hz]),
        ("wall_right", [wall_t, l + 2 * wall_t, wall_h], [half_w + wall_t / 2, 0, hz]),
        ("wall_bottom", [w, wall_t, wall_h], [0, -half_l - wall_t / 2, hz]),
        ("wall_top", [w, wall_t, wall_h], [0, half_l + wall_t / 2, hz]),
    ]
    for name, ext, ctr in sides:
        out.append((name, *box_mesh(ext, ctr)))
    return out


def _merge(named_meshes) -> tuple[np.ndarray, np.ndarray, list]:
    verts_all, faces_all, groups = [], [], []
    off = 0
    nfaces = 0
    for name, v, f in named_meshes:
        groups.append((name, nfaces))
        verts_all.append(v)
        faces_all.append(np.asarray(f) + off)
        off += len(v)
        nfaces += len(f)
    return np.vstack(verts_all), np.vstack(faces_all), groups


def triangle_scene_to_obj(scene, path: str, height: float = 0.25,
                          with_tray: bool = True) -> None:
    """Export a ``TriangleScene`` as extruded prisms (+ optional tray).

    Reference: ``TriangularRandomSplitWorld`` OBJ export for pybullet
    (``worlds.py:1169-1184``).
    """
    meshes = []
    if with_tray:
        w, l = scene.world_dims
        meshes.extend(tray_meshes(w, l, wall_t=0.1, wall_h=height * 2))
    for i, tri in enumerate(scene.triangles):
        v, f = extrude_polygon(np.asarray(tri), height)
        meshes.append((f"tile_{i}", v, f))
    verts, faces, groups = _merge(meshes)
    save_obj(path, verts, faces, groups)


def world3d_to_obj(world, path: str) -> None:
    """Export every box body of a ``simulation.World3D`` as one OBJ."""
    meshes = []
    for body in world.bodies:
        v, f = box_mesh(body.extents, body.state.position, body.state.yaw)
        meshes.append((body.name, v, f))
    verts, faces, groups = _merge(meshes)
    save_obj(path, verts, faces, groups)
