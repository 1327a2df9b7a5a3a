"""Perspective RGB-D camera and point-cloud capture for the simulation layer.

Capability parity: reference ``pybullet_engine/camera.py:20-173`` (intrinsics/
extrinsics, ``take_picture``, deprojection) and ``world.py:388-876``
(``BulletWorld`` camera render, point-cloud/mesh extraction via open3d). The
reference delegates rendering to Bullet's OpenGL and deprojection to open3d;
here both are a self-contained vectorized numpy software rasterizer over the
quasi-static world's box bodies — no GL context, deterministic, CI-safe.

Conventions: camera looks down +z in camera frame (OpenCV-style); pixel (0,0)
is top-left; depth is camera-space z (not ray length), background = +inf.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_BOX_FACES = np.asarray(
    [
        [0, 2, 1], [0, 3, 2],  # -z
        [4, 5, 6], [4, 6, 7],  # +z
        [0, 1, 5], [0, 5, 4],  # -y
        [2, 3, 7], [2, 7, 6],  # +y
        [1, 2, 6], [1, 6, 5],  # +x
        [3, 0, 4], [3, 4, 7],  # -x
    ],
    int,
)


def _box_vertices(extents: np.ndarray) -> np.ndarray:
    """[8, 3] corners of an axis-aligned box centered at the origin."""
    w, l, h = np.asarray(extents, float) / 2.0
    return np.asarray(
        [
            [-w, -l, -h], [w, -l, -h], [w, l, -h], [-w, l, -h],
            [-w, -l, h], [w, -l, h], [w, l, h], [-w, l, h],
        ]
    )


@dataclasses.dataclass
class Camera:
    """Pinhole camera (reference ``camera.py:20-62`` builds the same
    intrinsics from fov + image size and extrinsics from eye/target/up)."""

    eye: np.ndarray
    target: np.ndarray
    up: np.ndarray = dataclasses.field(
        default_factory=lambda: np.asarray([0.0, 0.0, 1.0])
    )
    fov_deg: float = 60.0
    width: int = 160
    height: int = 120

    @property
    def intrinsics(self) -> np.ndarray:
        """[3, 3] K with square pixels; fy from the vertical fov."""
        fy = (self.height / 2.0) / np.tan(np.deg2rad(self.fov_deg) / 2.0)
        fx = fy
        return np.asarray(
            [
                [fx, 0.0, self.width / 2.0],
                [0.0, fy, self.height / 2.0],
                [0.0, 0.0, 1.0],
            ]
        )

    @property
    def extrinsics(self) -> np.ndarray:
        """[4, 4] world -> camera transform (look-at; +z forward, +y down)."""
        eye = np.asarray(self.eye, float)
        fwd = np.asarray(self.target, float) - eye
        fwd = fwd / max(np.linalg.norm(fwd), 1e-12)
        right = np.cross(fwd, np.asarray(self.up, float))
        right = right / max(np.linalg.norm(right), 1e-12)
        down = np.cross(fwd, right)
        rot = np.stack([right, down, fwd])  # rows = camera axes in world
        t = -rot @ eye
        out = np.eye(4)
        out[:3, :3] = rot
        out[:3, 3] = t
        return out


def _world_triangles(world) -> tuple[np.ndarray, np.ndarray]:
    """Gather all body triangles -> (tris [T, 3, 3] world-frame, colors
    [T, 3])."""
    tris = []
    colors = []
    for b in world.bodies:
        v = _box_vertices(b.extents)
        c, s = np.cos(b.state.yaw), np.sin(b.state.yaw)
        rot = np.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        v = v @ rot.T + b.state.position
        tris.append(v[_BOX_FACES])
        colors.append(np.tile(np.asarray(b.color[:3], float), (12, 1)))
    if not tris:
        return np.zeros((0, 3, 3)), np.zeros((0, 3))
    return np.concatenate(tris), np.concatenate(colors)


def render_rgbd(world, camera: Camera, light_dir=(0.3, 0.2, -1.0)):
    """Z-buffered rasterization of the world's boxes.

    Returns (rgb uint8 [H, W, 3], depth float [H, W]; background depth=inf).
    Lambert-shaded by face normal against a fixed directional light — the
    role of the reference's Bullet GL render (``world.py:585-630``).
    """
    h_img, w_img = camera.height, camera.width
    rgb = np.zeros((h_img, w_img, 3), np.uint8)
    depth = np.full((h_img, w_img), np.inf)

    tris, colors = _world_triangles(world)
    if len(tris) == 0:
        return rgb, depth

    ext = camera.extrinsics
    k_mat = camera.intrinsics
    cam = tris @ ext[:3, :3].T + ext[:3, 3]  # [T, 3, 3] camera-frame

    # backface cull + shade with world-frame normals
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    normal = np.cross(e1, e2)
    nrm = np.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / np.maximum(nrm, 1e-12)
    light = -np.asarray(light_dir, float)
    light = light / np.linalg.norm(light)
    shade = 0.35 + 0.65 * np.clip(normal @ light, 0.0, 1.0)
    shaded = np.clip(colors * shade[:, None], 0.0, 1.0)

    near = 1e-3
    for t in range(len(cam)):
        pts = cam[t]
        if (pts[:, 2] <= near).any():
            continue  # skip triangles crossing the near plane
        proj = pts @ k_mat.T
        uv = proj[:, :2] / proj[:, 2:3]  # pixel coords
        lo = np.maximum(np.floor(uv.min(axis=0)).astype(int), 0)
        hi = np.minimum(
            np.ceil(uv.max(axis=0)).astype(int) + 1,
            [w_img, h_img],
        )
        if (hi <= lo).any():
            continue
        xs = np.arange(lo[0], hi[0])
        ys = np.arange(lo[1], hi[1])
        px, py = np.meshgrid(xs + 0.5, ys + 0.5)
        # barycentric in pixel space
        a, b, c = uv[0], uv[1], uv[2]
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if abs(det) < 1e-12:
            continue
        w0 = ((b[1] - c[1]) * (px - c[0]) + (c[0] - b[0]) * (py - c[1])) / det
        w1 = ((c[1] - a[1]) * (px - c[0]) + (a[0] - c[0]) * (py - c[1])) / det
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        # perspective-correct depth: interpolate 1/z
        inv_z = w0 / pts[0, 2] + w1 / pts[1, 2] + w2 / pts[2, 2]
        z = 1.0 / np.maximum(inv_z, 1e-12)
        zbuf = depth[lo[1]:hi[1], lo[0]:hi[0]]
        write = inside & (z < zbuf)
        if not write.any():
            continue
        zbuf[write] = z[write]
        patch = rgb[lo[1]:hi[1], lo[0]:hi[0]]
        patch[write] = (shaded[t] * 255).astype(np.uint8)
    return rgb, depth


def depth_to_point_cloud(
    depth: np.ndarray, camera: Camera, rgb: np.ndarray | None = None,
    max_points: int | None = None, rng=None,
):
    """Deproject a depth image to a world-frame point cloud (reference
    ``world.py:736-790`` via open3d). Returns points [P, 3] (and colors
    [P, 3] float in [0, 1] when ``rgb`` is given)."""
    h_img, w_img = depth.shape
    k_mat = camera.intrinsics
    ext = camera.extrinsics
    vs, us = np.nonzero(np.isfinite(depth))
    z = depth[vs, us]
    x = (us + 0.5 - k_mat[0, 2]) * z / k_mat[0, 0]
    y = (vs + 0.5 - k_mat[1, 2]) * z / k_mat[1, 1]
    pts_cam = np.stack([x, y, z], -1)
    rot = ext[:3, :3]
    pts = (pts_cam - ext[:3, 3]) @ rot  # inverse of world->cam
    cols = None
    if rgb is not None:
        cols = rgb[vs, us].astype(float) / 255.0
    if max_points is not None and len(pts) > max_points:
        rng = rng or np.random.default_rng(0)
        idx = rng.choice(len(pts), max_points, replace=False)
        pts = pts[idx]
        cols = cols[idx] if cols is not None else None
    if cols is not None:
        return pts, cols
    return pts
